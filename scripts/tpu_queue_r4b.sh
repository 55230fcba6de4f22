#!/bin/bash
# Round-4b TPU queue: validate + A/B the column-major gradient flow and
# the Pallas emission pipeline, then re-profile.  Run AFTER the flagship
# frees the chip.  Results append to /tmp/tpu_r4b.log.
cd /root/repo
L=/tmp/tpu_r4b.log
echo "=== tpu_queue_r4b $(date -Is) ===" | tee -a $L

# 0. liveness
timeout 300 python -c "import jax; print(jax.devices())" >> $L 2>&1 || {
  echo "TPU down" | tee -a $L; exit 1; }

# 1. Mosaic compile check: the five new kernels at bench-tier shapes
timeout 1800 python scripts/compile_check_r4.py >> $L 2>&1 \
  || echo "COMPILE CHECK FAILED" | tee -a $L

# 2. reorder A/B at the r4 baseline emission (xla)
GSCREAM_REORDER=gather timeout 1200 python bench.py >> $L 2>&1
GSCREAM_REORDER=cm     timeout 1200 python bench.py >> $L 2>&1

# 3. emission A/B under the winning reorder (assume cm; correct later)
GSCREAM_EMIT=pallas GSCREAM_REORDER=cm timeout 1200 python bench.py >> $L 2>&1

# 4. component profile under the winner
GSCREAM_EMIT=pallas timeout 1200 python scripts/profile_bench.py >> $L 2>&1
GSCREAM_EMIT=pallas BWD_PARTS=1 timeout 1200 python scripts/profile_bench.py >> $L 2>&1

# 5. MXU power offload on top (kernels are VPU-bound)
GSCREAM_EMIT=pallas GSCREAM_MXU_POWER=1 timeout 1200 python bench.py >> $L 2>&1

# 6. trained-scene figure at the new defaults
GSCREAM_EMIT=pallas timeout 1200 python bench.py --ply output/synth_spin30k >> $L 2>&1

# 7. XLA trace under the winner (VERDICT r3 item 7)
GSCREAM_EMIT=pallas GSCREAM_TRACE=results/trace_r4 timeout 900 python bench.py >> $L 2>&1

# 8. band path at full size (tpu_queue_r4 step 6 never got chip time)
GSCREAM_EMIT=pallas timeout 1800 python scripts/band_hw_check.py 2 >> $L 2>&1

grep -h '"metric"' $L | tail -12
