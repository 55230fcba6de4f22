"""Experiment driver: loop the 10 SPIN-NeRF scenes (reference scripts/run.py).

Builds the per-scene train.py command with the paper's hyperparameters
(reference scripts/run.py:14-80): voxel_size 0.005, update_init_factor 16,
30k iterations, the refs/<scene>_out.png inpainted reference view and
refs/<scene>_out_pred.npy reference depth, cross-attention from 15k with
EMA 0.03.  Logs tee to log_training/.
"""
import os
import subprocess
import sys
import time

SCENES = ["1", "2", "3", "4", "7", "9", "10", "12", "book", "trash"]


def main():
    data_root = sys.argv[1] if len(sys.argv) > 1 else "data/spinnerf"
    refs_root = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/refs"
    out_root = sys.argv[3] if len(sys.argv) > 3 else "output"
    os.makedirs("log_training", exist_ok=True)

    for scene in SCENES:
        src = os.path.join(data_root, scene)
        if not os.path.isdir(src):
            print(f"[skip] {scene}: no data at {src}")
            continue
        stamp = time.strftime("%Y%m%d_%H%M%S")
        model_path = os.path.join(out_root, f"{scene}_{stamp}")
        cmd = [
            sys.executable, "train.py",
            "--source_path", src,
            "--model_path", model_path,
            "--specified_ply_path",
            os.path.join(src, "sparse/0/points3D.ply"),
            "--ref_image_path",
            os.path.join(refs_root, f"{scene}_out.png"),
            "--ref_depth_path",
            os.path.join(refs_root, f"{scene}_out_pred.npy"),
            "--voxel_size", "0.005",
            "--update_init_factor", "16",
            "--iterations", "30000",
            "--start_crossattn_from", "15000",
            "--crossattn_feat_update_ema", "0.03",
            "--render_spiral",
            "--checkpoint_interval", "5000",
        ] + sys.argv[4:]   # extra train.py flags pass through verbatim
        log = os.path.join("log_training", f"{scene}_{stamp}.log")
        print(" ".join(cmd), "->", log)
        with open(log, "w") as f:
            subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           check=False)


if __name__ == "__main__":
    main()
