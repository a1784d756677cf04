#!/bin/bash
# Resume of chip_campaign.sh: steps that failed on 2026-08-18 because
# `python benchmarks/chip_*.py` lacked the repo root on sys.path (fixed
# in the scripts), plus the tail steps that never ran.  Waits for any
# still-running banded_gs step before touching the chip.
set -u
cd /root/repo
LOG=benchmarks/chip_campaign_r03.log
stamp() { date -u +"%Y-%m-%dT%H:%M:%SZ"; }
run_step() {  # run_step <timeout_s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  echo "=== [$(stamp)] $label ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- [$(stamp)] $label exit=$rc ---" | tee -a "$LOG"
}

# Wait for a still-running banded_gs from the first campaign attempt.
while [ -n "${BANDED_PID:-}" ] && kill -0 "$BANDED_PID" 2>/dev/null; do
  sleep 20
done

echo "######## campaign resume $(stamp) ########" | tee -a "$LOG"

run_step 1800 "dsweep 180x63 + 1080x300" python benchmarks/chip_dsweep.py 0 1
run_step 2400 "dsweep 2160x600" python benchmarks/chip_dsweep.py 3
run_step 2400 "dsweep 2880x800" python benchmarks/chip_dsweep.py 4
if ls .cache/annulus_v1_4320x1200_sp5_star1.npz >/dev/null 2>&1; then
  run_step 3000 "dsweep 4320x1200 (15M nodes)" python benchmarks/chip_dsweep.py 5
fi
run_step 2400 "dsweep3d 128x128x64" python benchmarks/chip_dsweep3d.py
run_step 1800 "chip_locate" python benchmarks/chip_locate.py
run_step 3600 "bench.py" python bench.py

echo "######## campaign resume end $(stamp) ########" | tee -a "$LOG"
