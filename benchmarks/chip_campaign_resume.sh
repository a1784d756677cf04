#!/bin/bash
# Resume of chip_campaign.sh after the 2026-08-18 13:52Z interruption:
# parity, dsweep 180x63/1080x300/2160x600 completed; everything from the
# 2880x800 dsweep onwards still needs the chip.
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

echo "######## campaign resume $(stamp) ########" | tee -a "$LOG"

if ! timeout 240 python -c "import jax; print(jax.devices()[0].platform)" \
    2>/dev/null | grep -qE "tpu|axon"; then
  echo "[$(stamp)] TPU unreachable - aborting resume" | tee -a "$LOG"
  exit 1
fi
echo "[$(stamp)] TPU reachable" | tee -a "$LOG"

run_step 2400 "dsweep 2880x800" python benchmarks/chip_dsweep.py 4
if ls .cache/annulus_v1_4320x1200_sp5_star1.npz >/dev/null 2>&1; then
  run_step 3000 "dsweep 4320x1200 (15M nodes)" python benchmarks/chip_dsweep.py 5
fi
run_step 2400 "dsweep3d 128x128x64" python benchmarks/chip_dsweep3d.py
run_step 2400 "banded_gs" python benchmarks/chip_banded_gs.py
run_step 1800 "chip_locate" python benchmarks/chip_locate.py
run_step 3600 "bench.py" python bench.py

echo "######## campaign resume end $(stamp) ########" | tee -a "$LOG"
