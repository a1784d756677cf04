#!/bin/bash
# One-shot on-chip measurement campaign for the round-3 pending items.
# Run from /root/repo when the axon tunnel is up:
#     bash benchmarks/chip_campaign.sh
# Each step is individually time-bounded so a wedged step can't eat the
# whole tunnel-uptime window; everything appends to LOG so partial
# progress survives another outage.
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

echo "######## campaign start $(stamp) ########" | tee -a "$LOG"

# 0. Confirm the tunnel is actually up before burning timeouts.
if ! timeout 240 python -c "import jax; print(jax.devices()[0].platform)" \
    2>/dev/null | grep -qE "tpu|axon"; then
  echo "[$(stamp)] TPU unreachable - aborting campaign" | tee -a "$LOG"
  exit 1
fi
echo "[$(stamp)] TPU reachable" | tee -a "$LOG"

# 1. On-chip parity (regenerates the r03 artifact incl. the dir-sweep line).
echo "=== [$(stamp)] tpu_parity ===" | tee -a "$LOG"
{ echo "# regenerated $(stamp) by benchmarks/chip_campaign.sh";
  timeout 2400 python tests/test_tpu_parity.py 2>&1; } \
  | tee benchmarks/tpu_parity_r03.log | tee -a "$LOG"
echo "--- [$(stamp)] tpu_parity done ---" | tee -a "$LOG"

# 2. 2-D directional sweeps vs auto paths: small + production + large.
run_step 1800 "dsweep 180x63 + 1080x300" python benchmarks/chip_dsweep.py 0 1
run_step 2400 "dsweep 2160x600" python benchmarks/chip_dsweep.py 3
run_step 2400 "dsweep 2880x800" python benchmarks/chip_dsweep.py 4
# reference's 6-thread config
run_step 1200 "dsweep 270x63" python benchmarks/chip_dsweep.py 6
# 12.9M / 12M / 20.9M-node configs only if their grid caches were
# pre-built (host build would otherwise eat the whole timeout)
if ls .cache/annulus_v1_4320x1200_sp5_star1.npz >/dev/null 2>&1; then
  run_step 3000 "dsweep 4320x1200 (12.9M nodes)" python benchmarks/chip_dsweep.py 5
fi
if ls .cache/annulus_v1_5760x1600_sp5_star1.npz >/dev/null 2>&1; then
  run_step 3000 "dsweep 5760x1600 (12M nodes)" python benchmarks/chip_dsweep.py 7
fi
if ls .cache/annulus_v1_8640x2400_sp5_star1.npz >/dev/null 2>&1; then
  run_step 3600 "dsweep 8640x2400 (20.9M nodes, lane-blocked kernel)" \
    python benchmarks/chip_dsweep.py 8
fi

# 3. 3-D sweep engine vs the pallas Jacobi kernel (1M-node wedge).
run_step 2400 "dsweep3d 128x128x64" python benchmarks/chip_dsweep3d.py

# 4. Banded GS vs Jacobi on the production Delaunay.
run_step 2400 "banded_gs" python benchmarks/chip_banded_gs.py

# 5. Location layer on the production mesh (station solves + batched
#    catalogue search + GN refinement).
run_step 1800 "chip_locate" python benchmarks/chip_locate.py

# 6. Driver bench (records probe trail incl. sweep-first ordering).
run_step 3600 "bench.py" python bench.py

echo "######## campaign end $(stamp) ########" | tee -a "$LOG"
