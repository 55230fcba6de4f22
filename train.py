"""Train → render → evaluate driver for one scene (reference train.py).

Usage (SPIN-NeRF layout, mirroring reference scripts/run.py flags):

    python train.py --source_path data/spinnerf/book \\
        --model_path output/book \\
        --specified_ply_path data/spinnerf/book/sparse/0/points3D.ply \\
        --ref_image_path refs/book_out.png \\
        --ref_depth_path refs/book_out_pred.npy \\
        --voxel_size 0.005 --update_init_factor 16 --iterations 30000

Synthetic smoke run (no dataset needed):

    python train.py --synthetic --iterations 200 --model_path /tmp/out
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_path", default="")
    p.add_argument("--model_path", default="output/run")
    p.add_argument("--specified_ply_path", default="")
    p.add_argument("--ref_image_path", default="")
    p.add_argument("--ref_depth_path", default="")
    p.add_argument("--iterations", type=int, default=30000)
    p.add_argument("--voxel_size", type=float, default=0.005)
    p.add_argument("--update_init_factor", type=int, default=16)
    p.add_argument("--feat_dim", type=int, default=32)
    p.add_argument("--n_offsets", type=int, default=10)
    p.add_argument("--use_feat_bank", action="store_true",
                   help="view-adaptive multi-res feature mixing "
                        "(gaussian_model.py:109-115; reference default off)")
    p.add_argument("--start_crossattn_from", type=int, default=15000)
    p.add_argument("--crossattn_feat_update_ema", type=float, default=0.03)
    # loss weights (reference scripts/run.py:47-57 paper values)
    from gscream_tpu.config import OptimConfig as d
    for name in ("refer_rgb_lr", "refer_rgb_lr_fg", "other_rgb_lr",
                 "other_rgb_lr_fg", "refer_depth_lr", "refer_depth_lr_fg",
                 "refer_depth_lr_smooth", "other_depth_lr",
                 "other_depth_lr_smooth", "crossattn_lr_init",
                 "crossattn_lr_final", "enable_crossattn_refview",
                 "enable_crossattn_otherview"):
        p.add_argument(f"--{name}", type=float, default=getattr(d, name))
    p.add_argument("--loss_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="RGB loss-head precision (bf16 fast path keeps "
                        "depth fit + render path fp32; parity-gated in "
                        "tests/test_bf16_losses.py)")
    p.add_argument("-r", "--resolution", type=int, default=-1,
                   help="image downscale: 1/2/4/8 divide the stored "
                        "frames, -1 auto-limits width to 1600px "
                        "(reference utils/camera_utils.py:19-58)")
    p.add_argument("--anchor_capacity", type=int, default=1 << 17)
    p.add_argument("--instance_capacity", type=int, default=1 << 20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="train on a generated synthetic scene (no data)")
    p.add_argument("--skip_render", action="store_true")
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--save_iterations", type=int, nargs="*", default=None)
    p.add_argument("--pretrained_ply", default="",
                   help="warm-start anchors from a saved point_cloud.ply "
                        "(the reference's --warmup two-phase retrain)")
    p.add_argument("--render_spiral", action="store_true",
                   help="also render the 120-pose spiral path")
    p.add_argument("--start_checkpoint", default="",
                   help="resume from an orbax checkpoint dir (the working "
                        "version of the reference's broken "
                        "--start_checkpoint, train.py:618-620)")
    p.add_argument("--checkpoint_interval", type=int, default=0,
                   help="autosave the full train state every N iterations")
    # multi-host bring-up (SURVEY §7 step 7): start one process per host
    # with identical flags; see gscream_tpu/parallel/distributed.py
    p.add_argument("--dist_coordinator", default="",
                   help="host:port of process 0 (enables multi-host mode)")
    p.add_argument("--dist_nprocs", type=int, default=1)
    p.add_argument("--dist_pid", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel mesh axis (views per step); with "
                        "--mesh_tiles routes training through the full "
                        "SPMD sharded step. 0 = auto when distributed "
                        "(all devices), off otherwise")
    p.add_argument("--mesh_tiles", type=int, default=0,
                   help="tile-row bands the rasterizer is sharded over")
    return p.parse_args()



def _enable_compile_cache():
    from gscream_tpu.precision import enable_compile_cache, \
        ensure_fp32_matmuls
    enable_compile_cache()
    ensure_fp32_matmuls()


def main():
    # subprocess-friendly backend pin (the axon sitecustomize registers
    # the TPU plugin before user code, so JAX_PLATFORMS in the env is
    # ignored; jax.config.update in-process still works) — lets
    # scripts/run.py drive CPU smoke runs: GSCREAM_PLATFORM=cpu
    if os.environ.get("GSCREAM_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["GSCREAM_PLATFORM"])
    _enable_compile_cache()
    args = parse_args()
    if args.dist_coordinator:
        # must run before any other jax call registers the backend
        from gscream_tpu.parallel.distributed import (init_distributed,
                                                      process_info)
        init_distributed(args.dist_coordinator, args.dist_nprocs,
                         args.dist_pid)
        print("distributed:", process_info())
    from gscream_tpu.config import ModelConfig, OptimConfig, RunConfig, \
        save_config
    from gscream_tpu.train.loop import get_logger, train_scene
    from gscream_tpu.model.scaffold import ScaffoldConfig
    from gscream_tpu.model.io import save_anchors_ply

    run = RunConfig(
        model=ModelConfig(
            feat_dim=args.feat_dim, n_offsets=args.n_offsets,
            voxel_size=args.voxel_size,
            update_init_factor=args.update_init_factor,
            source_path=args.source_path, model_path=args.model_path,
            specified_ply_path=args.specified_ply_path,
            ref_image_path=args.ref_image_path,
            ref_depth_path=args.ref_depth_path,
            anchor_capacity=args.anchor_capacity,
            instance_capacity=args.instance_capacity,
            use_feat_bank=args.use_feat_bank),
        optim=OptimConfig(
            iterations=args.iterations,
            start_crossattn_from=args.start_crossattn_from,
            crossattn_feat_update_ema=args.crossattn_feat_update_ema,
            refer_rgb_lr=args.refer_rgb_lr,
            refer_rgb_lr_fg=args.refer_rgb_lr_fg,
            other_rgb_lr=args.other_rgb_lr,
            other_rgb_lr_fg=args.other_rgb_lr_fg,
            refer_depth_lr=args.refer_depth_lr,
            refer_depth_lr_fg=args.refer_depth_lr_fg,
            refer_depth_lr_smooth=args.refer_depth_lr_smooth,
            other_depth_lr=args.other_depth_lr,
            other_depth_lr_smooth=args.other_depth_lr_smooth,
            crossattn_lr_init=args.crossattn_lr_init,
            crossattn_lr_final=args.crossattn_lr_final,
            enable_crossattn_refview=args.enable_crossattn_refview,
            enable_crossattn_otherview=args.enable_crossattn_otherview,
            loss_dtype=args.loss_dtype),
        seed=args.seed)
    os.makedirs(args.model_path, exist_ok=True)
    save_config(run, os.path.join(args.model_path, "cfg.json"))
    logger = get_logger(args.model_path)
    # run code-backup (reference saveRuntimeCode, train.py:1053-1064)
    from gscream_tpu.utils.snapshot import save_runtime_code
    try:
        save_runtime_code(args.model_path)
    except Exception as e:           # never let bookkeeping kill a run
        logger.warning("code snapshot failed: %s", e)

    if args.synthetic:
        from gscream_tpu.data.synthetic import make_scene
        scene = make_scene(n_views=6, n_gauss=300, width=128, height=128,
                           seed=args.seed)
        views = scene.views
        ref_index = scene.ref_index
        points = scene.points
        ref_image = ref_depth = None
        extent = 1.0
        test_views = views[:2]
    elif os.path.exists(os.path.join(args.source_path,
                                     "transforms_train.json")):
        # NeRF-synthetic layout (reference sceneLoadTypeCallbacks
        # "Blender", dataset_readers.py:471-474)
        from gscream_tpu.data.blender import load_blender_scene
        sd = load_blender_scene(args.source_path,
                                white_background=False,
                                ply_path=args.specified_ply_path)
        views = sd.train_views
        ref_index = 0
        points = sd.points
        extent = sd.cameras_extent
        test_views = sd.test_views
        ref_image = ref_depth = None
    else:
        from gscream_tpu.data.dataset import load_spinnerf_scene
        sd = load_spinnerf_scene(args.source_path,
                                 args.specified_ply_path,
                                 resolution=args.resolution)
        views = sd.train_views
        ref_index = next((i for i, v in enumerate(views)
                          if v.name == sd.ref_name), 0)
        points = sd.points
        extent = sd.cameras_extent
        test_views = sd.test_views
        ref_image = ref_depth = None
        # the substituted reference artifacts are stored at the dataset's
        # native resolution — resize them through the same paths the
        # views took so -r / the >1600px auto policy can't desync shapes
        vh, vw = sd.height, sd.width
        if args.ref_image_path:
            import imageio.v2 as imageio
            from gscream_tpu.data.dataset import _resize_image
            ref_image = (np.asarray(
                imageio.imread(args.ref_image_path), np.float32)
                / 255.0)[:, :, :3].transpose(2, 0, 1)
            if ref_image.shape[1:] != (vh, vw):
                ref_image = _resize_image(ref_image, (vh, vw))
        if args.ref_depth_path:
            from gscream_tpu.data.dataset import _resize_nearest
            ref_depth = np.load(args.ref_depth_path).astype(
                np.float32)[None]
            if ref_depth.shape[1:] != (vh, vw):
                ref_depth = _resize_nearest(ref_depth, (vh, vw))

    logger.info("training %d views, %d points, %d iters",
                len(views), len(points), args.iterations)

    # load-time scene artifacts: input.ply + cameras.json (reference
    # Scene.__init__, scene/__init__.py:62-78 — test cams then train cams)
    from gscream_tpu.model.io import write_scene_artifacts
    try:
        write_scene_artifacts(args.model_path,
                              list(test_views) + list(views), points)
    except Exception as e:           # never let bookkeeping kill a run
        logger.warning("scene artifacts not written: %s", e)

    # in-training eval at test_iterations (reference training_report,
    # train.py:655-695)
    def eval_callback(it, ts, aux, mlog=None):
        if it not in run.test_iterations or not test_views:
            return
        import jax.numpy as jnp
        from gscream_tpu.ops.losses import psnr
        from gscream_tpu.train.render_sets import make_render_fn
        from gscream_tpu.model.scaffold import ScaffoldConfig as SC
        cfg_l = SC(feat_dim=run.model.feat_dim,
                   n_offsets=run.model.n_offsets,
                   voxel_size=run.model.voxel_size,
                   capacity=run.model.anchor_capacity,
                   attn_heads=run.optim.attn_head_num,
                   attn_head_dim=run.optim.attn_head_dim,
                   use_feat_bank=run.model.use_feat_bank)
        cam0 = test_views[0].camera
        rf = make_render_fn(ts.scaffold, cfg_l, cam0.width, cam0.height,
                            args.instance_capacity)
        # full split, like the reference's training_report (train.py:655-695)
        vals = []
        for vi, v in enumerate(test_views):
            if v.image is None:
                continue
            out, _ = rf(ts.scaffold.params, ts.scaffold.mlps, v.camera)
            render_chw = out.color.transpose(2, 0, 1)
            vals.append(float(psnr(render_chw, jnp.asarray(v.image))))
            if mlog is not None and vi < 5:
                # TB image grids: render / GT / error for the first views
                # (reference training_report images, train.py:668-683)
                rnp = np.asarray(render_chw)
                gnp = np.asarray(v.image)
                mlog.log_images(it, {
                    f"test_view_{vi}/render": rnp,
                    f"test_view_{vi}/errormap": np.repeat(
                        np.abs(rnp - gnp).mean(0, keepdims=True), 3, 0),
                    **({f"test_view_{vi}/ground_truth": gnp}
                       if it == run.test_iterations[0] else {}),
                })
        if vals:
            logger.info("[ITER %d] test PSNR %.3f", it,
                        sum(vals) / len(vals))
            if mlog is not None:
                mlog.log(it, {"test_psnr": sum(vals) / len(vals)})

    # SPMD mesh: explicit --mesh_data/--mesh_tiles, or every device of a
    # --dist_* multi-process run (VERDICT r2 item 2: the --dist_ flags must
    # actually shard training, not just initialize the runtime)
    mesh = None
    if args.mesh_data or args.mesh_tiles:
        from gscream_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=max(args.mesh_data, 1),
                         tiles=max(args.mesh_tiles, 1))
    elif args.dist_coordinator:
        from gscream_tpu.parallel.mesh import auto_mesh
        mesh = auto_mesh()
    if mesh is not None:
        logger.info("SPMD mesh: data=%d tiles=%d over %d devices",
                    mesh.shape["data"], mesh.shape["tiles"],
                    mesh.devices.size)

    ts, log = train_scene(
        views, ref_index, points, run, out_dir=args.model_path,
        ref_image=ref_image, ref_depth=ref_depth,
        spatial_lr_scale=extent, capacity=args.instance_capacity,
        iterations=args.iterations, logger=logger,
        callback=eval_callback, pretrained_ply=args.pretrained_ply,
        start_checkpoint=args.start_checkpoint,
        checkpoint_interval=args.checkpoint_interval, mesh=mesh)

    m = run.model
    cfg = ScaffoldConfig(
        feat_dim=m.feat_dim, n_offsets=m.n_offsets,
        voxel_size=m.voxel_size, capacity=m.anchor_capacity,
        attn_heads=run.optim.attn_head_num,
        attn_head_dim=run.optim.attn_head_dim,
        use_feat_bank=m.use_feat_bank)
    ply_dir = os.path.join(args.model_path, "point_cloud",
                           f"iteration_{args.iterations}")
    save_anchors_ply(os.path.join(ply_dir, "point_cloud.ply"),
                     ts.scaffold, cfg)
    from gscream_tpu.model.io import save_checkpoint, save_mlps_npz
    # per-MLP decoder checkpoint beside the cloud (the reference's
    # save_mlp_checkpoints, gaussian_model.py:975-988)
    save_mlps_npz(os.path.join(ply_dir, "mlp_checkpoints.npz"),
                  ts.scaffold.mlps)
    save_checkpoint(os.path.join(args.model_path, "checkpoint"), ts)

    if not args.skip_render and test_views:
        from gscream_tpu.train.render_sets import render_set
        # index-aligned gts (None slots for missing PNGs, never shifted)
        test_gts = [v.image for v in test_views]
        res = render_set(args.model_path, "test",
                         [v.camera for v in test_views], ts.scaffold, cfg,
                         capacity=args.instance_capacity,
                         gt_images=test_gts if any(
                             g is not None for g in test_gts) else None)
        logger.info("test FPS: %.2f", res["fps"])
        if args.render_spiral and not args.synthetic:
            from gscream_tpu.cameras import make_camera_from_c2w
            sd_spiral = getattr(sd, "spiral_c2ws", None)
            if sd_spiral is not None:
                spiral_cams = [make_camera_from_c2w(
                    c2w, sd.fov_x, sd.fov_y, sd.width, sd.height,
                    sd.cx_ndc, sd.cy_ndc) for c2w in sd_spiral]
                sres = render_set(args.model_path, "spiral", spiral_cams,
                                  ts.scaffold, cfg,
                                  capacity=args.instance_capacity)
                logger.info("spiral FPS: %.2f", sres["fps"])
        if not args.skip_eval:
            from evaluate import load_test_label_masks
            from gscream_tpu.train.evaluate import evaluate_pairs, \
                write_results
            # pair render i with test view i; skip views without a GT
            # image (index-aligned — a missing PNG never shifts pairs)
            idxs = [i for i, v in enumerate(test_views)
                    if v.image is not None and i < len(res["renders"])]
            if idxs:
                gts = [test_views[i].image for i in idxs]
                renders = [res["renders"][i] for i in idxs]
                # reference masked-eval protocol: images_4/test_label
                # masks, 1-indexed by test position, LANCZOS-resized to
                # the render size (train.py:895-899); views' masks only
                # as fallback
                h, w = gts[0].shape[1:]
                masks = (load_test_label_masks(args.source_path,
                                               len(test_views), (w, h))
                         if args.source_path else None)
                masks = ([masks[i] for i in idxs] if masks is not None
                         else [test_views[i].mask for i in idxs])
                results = evaluate_pairs(renders, gts, masks,
                                         names=[f"{i:05d}" for i in idxs])
                write_results(args.model_path, results)
                logger.info("eval: %s", json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
