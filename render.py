"""Render-only entry: load a trained model directory, render the splits.

The reference evaluates trained models without retraining — ``Scene`` with
``load_iteration`` restores ``point_cloud.ply`` + the MLP checkpoints and
``render_sets`` produces renders/gt/depth/FPS (reference
scene/__init__.py:85-104 load path; train.py:850-884 render_sets).  This
CLI is that workflow:

    python render.py --model_path output/scene --source_path data/scene \
        [--iteration 30000] [--skip_train] [--skip_test] [--spiral]

It reads ``<model>/point_cloud/iteration_<N>/{point_cloud.ply,
mlp_checkpoints.npz}`` and the scene's cameras, writes render sets under
``<model>/<split>/`` (renders/gt/errors/depth, per_view_count.json, spiral
``video.mp4``), logs FPS, and — with ``--eval`` — runs the standalone
metric evaluation on the artifacts it just wrote (evaluate.py protocol,
incl. ``images_4/test_label`` masked metrics).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--source_path", required=True)
    p.add_argument("--iteration", type=int, default=-1,
                   help="-1 = highest iteration_<N> dir present")
    p.add_argument("--resolution", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--spiral", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--instance_capacity", type=int, default=1 << 20)
    return p.parse_args()


def find_iteration(model_path: str, it: int) -> int:
    base = os.path.join(model_path, "point_cloud")
    its = [int(d.split("_")[-1]) for d in os.listdir(base)
           if d.startswith("iteration_")]
    if not its:
        raise SystemExit(f"no point_cloud/iteration_* under {model_path}")
    return max(its) if it < 0 else it


def main():
    if os.environ.get("GSCREAM_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["GSCREAM_PLATFORM"])
    args = parse_args()
    from gscream_tpu.precision import enable_compile_cache, \
        ensure_fp32_matmuls
    enable_compile_cache()
    ensure_fp32_matmuls()

    import jax

    from gscream_tpu.config import ModelConfig, RunConfig, load_config
    from gscream_tpu.data.dataset import load_spinnerf_scene
    from gscream_tpu.model.io import load_anchors_ply, load_mlps_npz
    from gscream_tpu.model.scaffold import ScaffoldConfig, init_scaffold
    from gscream_tpu.train.render_sets import render_set

    # config: prefer the run's persisted cfg.json (the reference re-evals
    # cfg_args, arguments/__init__.py:243-263)
    cfg_path = os.path.join(args.model_path, "cfg.json")
    if os.path.exists(cfg_path):
        run = load_config(cfg_path)
        m = run.model
    else:
        run = RunConfig(model=ModelConfig())
        m = run.model
    cfg = ScaffoldConfig(
        feat_dim=m.feat_dim, n_offsets=m.n_offsets,
        voxel_size=m.voxel_size, capacity=m.anchor_capacity,
        attn_heads=run.optim.attn_head_num,
        attn_head_dim=run.optim.attn_head_dim,
        use_feat_bank=m.use_feat_bank)

    it = find_iteration(args.model_path, args.iteration)
    ply_dir = os.path.join(args.model_path, "point_cloud",
                           f"iteration_{it}")
    params, alive = load_anchors_ply(
        os.path.join(ply_dir, "point_cloud.ply"), cfg)

    sd = load_spinnerf_scene(args.source_path,
                             resolution=args.resolution)
    scaffold = init_scaffold(
        jax.random.PRNGKey(0), sd.points[:max(len(sd.points) // 2, 8)],
        cfg)._replace(params=params, alive=alive)
    mlp_path = os.path.join(ply_dir, "mlp_checkpoints.npz")
    if os.path.exists(mlp_path):
        scaffold = scaffold._replace(
            mlps=load_mlps_npz(mlp_path, scaffold.mlps))
    else:
        print(f"WARNING: {mlp_path} missing — decoder MLPs are random",
              file=sys.stderr)

    splits = []
    if not args.skip_test:
        splits.append(("test", sd.test_views))
    if not args.skip_train:
        splits.append(("train", sd.train_views))
    for name, views in splits:
        if not views:
            continue
        # keep index alignment: a view with a missing PNG contributes a
        # None slot, never a shifted gt
        gts = [v.image for v in views]
        res = render_set(args.model_path, name,
                         [v.camera for v in views], scaffold, cfg,
                         capacity=args.instance_capacity,
                         gt_images=gts if any(
                             g is not None for g in gts) else None)
        print(f"{name}: {len(views)} views, FPS {res['fps']:.2f}")
    if args.spiral and sd.spiral_c2ws is not None:
        from gscream_tpu.cameras import make_camera_from_c2w
        cams = [make_camera_from_c2w(c2w, sd.fov_x, sd.fov_y, sd.width,
                                     sd.height, sd.cx_ndc, sd.cy_ndc)
                for c2w in sd.spiral_c2ws]
        res = render_set(args.model_path, "spiral", cams, scaffold, cfg,
                         capacity=args.instance_capacity)
        print(f"spiral: FPS {res['fps']:.2f}")

    if args.eval and not args.skip_test:
        from evaluate import evaluate_dir
        r = evaluate_dir(os.path.join(args.model_path, "test"),
                         source_path=args.source_path)
        print("eval:", json.dumps(r["summary"]))


if __name__ == "__main__":
    main()
