#!/bin/bash
# Round-4 TPU work queue — raw-mode/packed-grad A/B + profile + band path.
# Each step independently timeboxed; results append to /tmp/tpu_r4.log.
cd /root/repo
L=/tmp/tpu_r4.log
echo "=== tpu_queue_r4 $(date -Is) ===" | tee -a $L

# 0. liveness
timeout 300 python -c "import jax; print(jax.devices())" >> $L 2>&1 || {
  echo "TPU down" | tee -a $L; exit 1; }

# 1. headline bench — r4 defaults (raw-mode kernels + packed grad rows)
timeout 1200 python bench.py >> $L 2>&1

# 2. A/B: legacy precomputed-coefficient packing
GSCREAM_KERNEL_COEFF=0 timeout 900 python bench.py >> $L 2>&1

# 3. component profile + backward micro-profile (r4 defaults)
timeout 1200 python scripts/profile_bench.py >> $L 2>&1
BWD_PARTS=1 timeout 1200 python scripts/profile_bench.py >> $L 2>&1

# 4. reorder mode revisit (packed grad rows changed the relayout cost)
GSCREAM_REORDER=sort timeout 900 python bench.py >> $L 2>&1

# 5. backward chunk sweep — gbuf is 8x smaller now, bigger chunks may fit
GSCREAM_CHUNK_B=768 timeout 900 python bench.py >> $L 2>&1
GSCREAM_CHUNK_B=1024 timeout 900 python bench.py >> $L 2>&1

# 6. band path on real hardware (VERDICT r3 item 5)
timeout 1800 python scripts/band_hw_check.py 2 4 >> $L 2>&1

# 7. XLA trace capture (VERDICT r3 item 7)
GSCREAM_TRACE=results/trace_r4 timeout 900 python bench.py >> $L 2>&1

tail -120 $L
