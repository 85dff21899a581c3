#!/bin/bash
# Hardware validation queue for the round-3d vtx work (gated+clean
# kernel never ran on the real chip -- the axon tunnel went down
# mid-bring-up). Run top to bottom; each phase gates the next.
set -x
cd /root/repo

echo "=== device probe ==="
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

echo "=== parity: gated+clean kernel ==="
timeout 900 python scripts/dev_vtx.py 48 96 64 6 1 || exit 1
timeout 900 python scripts/dev_vtx.py 12 96 64 16 1 || exit 1
timeout 900 python scripts/dev_vtx.py 33 117 83 8 2 || exit 1

echo "=== perf: north star grid=1024 ==="
timeout 1500 python scripts/dev_vtx_perf.py 1024 800 600 8 4 6
timeout 1500 python scripts/dev_vtx_perf.py 1024 800 600 4 4 6

echo "=== stage splits (same executable, data-only knobs) ==="
VF_VTX_STAGE=dma timeout 900 python scripts/dev_vtx_perf.py 1024 800 600 8 4 4
VF_VTX_STAGE=setup timeout 900 python scripts/dev_vtx_perf.py 1024 800 600 8 4 4

echo "=== perf: moderate mesh grid=128 ==="
timeout 900 python scripts/dev_vtx_perf.py 128 800 600 12 8 6

echo "=== bench: vtx vs packed ==="
VF_DENSE=vtx timeout 1800 python bench.py
timeout 1800 python bench.py

echo "=== full suite on TPU (incl. vtx kernel parity + goldens) ==="
timeout 3000 python -m pytest tests/ -q --timeout=1200 2>/dev/null \
  || timeout 3000 python -m pytest tests/ -q
