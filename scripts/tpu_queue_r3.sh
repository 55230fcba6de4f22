#!/bin/bash
# Round-3 TPU work queue — run top-to-bottom when the axon relay returns.
# Each step is independently timeboxed; results append to /tmp/tpu_r3.log.
cd /root/repo
L=/tmp/tpu_r3.log
echo "=== tpu_queue_r3 $(date -Is) ===" | tee -a $L

# 0. liveness
timeout 300 python -c "import jax; print(jax.devices())" >> $L 2>&1 || {
  echo "TPU still down" | tee -a $L; exit 1; }

# 1. headline bench (tight culling live; compile ~3-8 min fresh)
timeout 900 python bench.py >> $L 2>&1

# 2. component profile
timeout 900 python scripts/profile_bench.py >> $L 2>&1

# 3. sort-cost A/Bs
GSCREAM_SORT_LEX=1 timeout 600 python bench.py >> $L 2>&1
GSCREAM_ATTRS_GATHER=1 timeout 600 python bench.py >> $L 2>&1
GSCREAM_REORDER_GATHER=1 timeout 600 python bench.py >> $L 2>&1
GSCREAM_TIGHT_CULL=0 timeout 600 python bench.py >> $L 2>&1

# 4. sort-cost matrix (operand/size scaling of lax.sort + alternatives)
timeout 900 python scripts/sort_matrix.py >> $L 2>&1

# 5. backward micro-profile
BWD_PARTS=1 timeout 900 python scripts/profile_bench.py >> $L 2>&1

# 6. chunk-size sweep (bwd kernel VMEM/overhead tradeoff)
GSCREAM_CHUNK_B=1024 timeout 600 python bench.py >> $L 2>&1
GSCREAM_CHUNK_B=768 timeout 600 python bench.py >> $L 2>&1

# 7. MXU power-polynomial offload (kernels are VPU-bound)
GSCREAM_MXU_POWER=1 timeout 600 python bench.py >> $L 2>&1

tail -80 $L
