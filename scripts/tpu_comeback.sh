#!/bin/bash
# Hardware validation queue for the round-3d vtx work (the gated+clean
# kernel never ran on the real chip -- the axon tunnel went down
# mid-bring-up). Run phases as SEPARATE bounded foreground commands
# (never background tasks a harness might SIGKILL mid-claim/dispatch --
# that wedges the device grant; see CLAUDE.md):
#
#   bash scripts/tpu_comeback.sh probe     # ~1 min
#   bash scripts/tpu_comeback.sh parity    # ~6 min (3 configs)
#   bash scripts/tpu_comeback.sh perf      # ~8 min (1024 slots 8 + 4)
#   bash scripts/tpu_comeback.sh stage     # ~4 min (dma/setup splits)
#   bash scripts/tpu_comeback.sh g128      # ~4 min (moderate mesh)
#   bash scripts/tpu_comeback.sh bench     # ~8 min (vtx vs packed)
#   bash scripts/tpu_comeback.sh variants  # ~10 min (NEXT.md queue 1-3:
#                                          #  recompute_p/fcache/concat_lhs
#                                          #  trip-body bake-off at 1024)
#   bash scripts/tpu_comeback.sh suite     # ~40 min (full TPU pytest)
#
# Round-5 phases (resident-stream fused kernel, VERDICT r4 item 3):
#   bash scripts/tpu_comeback.sh resident  # ~10 min (parity g48 + perf
#                                          #  g128 b8/b32 + g104)
#   bash scripts/tpu_comeback.sh bench128  # ~6 min (VF_BENCH_GRID=128
#                                          #  headline; target >=100 Mpix/s)
#
# No argument = everything in order (only safe when nothing can kill us).
set -x
cd /root/repo
PHASE="${1:-all}"

run_probe() { timeout 120 python -c "import jax; print(jax.devices())"; }
run_parity() {
  timeout 500 python scripts/dev_vtx.py 48 96 64 6 1 || return 1
  timeout 500 python scripts/dev_vtx.py 12 96 64 16 1 || return 1
  timeout 500 python scripts/dev_vtx.py 33 117 83 8 2 || return 1
}
run_perf() {
  timeout 560 python scripts/dev_vtx_perf.py 1024 800 600 8 4 6
  timeout 560 python scripts/dev_vtx_perf.py 1024 800 600 4 4 6
}
run_stage() {
  VF_VTX_STAGE=dma timeout 500 python scripts/dev_vtx_perf.py 1024 800 600 8 4 4
  VF_VTX_STAGE=setup timeout 500 python scripts/dev_vtx_perf.py 1024 800 600 8 4 4
}
run_g128() { timeout 560 python scripts/dev_vtx_perf.py 128 800 600 12 8 6; }
run_bench() {
  VF_DENSE=vtx timeout 560 python bench.py
  timeout 560 python bench.py
}
run_suite() {
  mkdir -p diag_out
  timeout 3000 python -m pytest tests/ -q 2>&1 | tee diag_out/r5_suite.log
}
run_resident() {
  mkdir -p diag_out
  # parity at the measured FS-policy config, then perf at the target regime
  { timeout 560 python scripts/dev_packed_fused.py 48 800 600 4 4 \
      && timeout 560 python scripts/dev_packed_fused.py 128 800 600 8 6 \
      && timeout 560 python scripts/dev_packed_fused.py 128 800 600 32 6 \
      && timeout 560 python scripts/dev_packed_fused.py 104 800 600 8 4; \
  } 2>&1 | tee diag_out/r5_resident.log
}
run_bench128() {
  mkdir -p diag_out
  { VF_BENCH_GRID=128 timeout 560 python bench.py \
      && VF_BENCH_GRID=128 VF_BENCH_BATCH=8 timeout 560 python bench.py \
      && VF_BENCH_GRID=128 VF_DENSE=packed timeout 560 python bench.py; \
  } 2>&1 | tee diag_out/r5_bench_g128.log
}
run_variants() {
  # identity at a parity config, then the grid=1024 bake-off
  timeout 560 python scripts/dev_vtx_variants.py 48 96 64 6 1 || return 1
  timeout 580 python scripts/dev_vtx_variants.py 1024 800 600 4 4 4
}
run_rows() {
  # blank BASELINE.md rows (VERDICT r3 items 4/6), one bounded run each
  timeout 580 python scripts/dev_baseline_rows.py dem
  timeout 580 python scripts/dev_baseline_rows.py 4k
  timeout 580 python scripts/dev_baseline_rows.py sweep
  timeout 580 python scripts/dev_epilogue_split.py 1024 800 600 4 4
  timeout 580 python scripts/dev_epilogue_split.py 128 800 600 16 4
}

case "$PHASE" in
  probe)  run_probe ;;
  parity) run_parity ;;
  perf)   run_perf ;;
  stage)  run_stage ;;
  g128)   run_g128 ;;
  bench)  run_bench ;;
  variants) run_variants ;;
  rows)   run_rows ;;
  suite)  run_suite ;;
  resident) run_resident ;;
  bench128) run_bench128 ;;
  all)    run_probe && run_resident && run_bench128 && run_rows \
            && run_bench && run_suite ;;
  *) echo "unknown phase $PHASE"; exit 2 ;;
esac
