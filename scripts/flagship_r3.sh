#!/bin/bash
# Round-3 flagship: finish the 30k run (resume from the round-2 25k
# checkpoint under the r3 perf config), render + evaluate, then a fresh
# timed 30k run if time allows. Run AFTER scripts/tpu_queue_r3.sh.
set -x
cd /root/repo
L=/tmp/flagship_r3.log
echo "=== flagship_r3 $(date -Is) ===" | tee -a $L

# 1. tail of the round-2 flagship (25k -> 30k) + renders + spiral + eval
timeout 5400 python train.py --source_path data/synth_spin \
    --model_path output/synth_spin30k --iterations 30000 \
    --ref_image_path data/synth_spin/images_4/frame_069.png \
    --ref_depth_path data/synth_spin/marigold_output/depth_npy/frame_069_pred.npy \
    --voxel_size 0.005 --update_init_factor 16 \
    --checkpoint_interval 1000 --render_spiral \
    --start_checkpoint output/synth_spin30k/ckpt >> $L 2>&1

# 2. re-bench after the run (cache warm)
timeout 900 python bench.py >> $L 2>&1

tail -30 $L
