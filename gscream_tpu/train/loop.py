"""Training orchestration: the host-side loop around the jitted step.

Functional port of the reference ``training()`` driver (train.py:333-620):
random camera order (reshuffled each epoch), reference-view substitution of
the inpainted image + depth, phase switch to cross-attention at
``start_crossattn_from``, densification every ``update_interval`` between
``update_from`` and ``update_until``, periodic eval/save, logging.

Host-side randomness (camera order, patch boxes) is derived per iteration
from ``(seed, it)`` — a pure function of the iteration index — so a
checkpoint restore resumes the exact random stream of an uninterrupted run
(the reference's ``capture``/``restore`` pair, gaussian_model.py:203-237,
loses this state and is broken besides).  Device-side randomness lives in
the train state's PRNG key, which the checkpoint carries.
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..model.densify import adjust_anchors
from ..model.scaffold import ScaffoldConfig, init_scaffold, n_alive
from .state import TrainState, init_train_state
from .step import train_step


def capacity_tier(n: int) -> int:
    """Smallest static instance capacity holding ``n``, on a 12.5%
    (pow2/8) granularity grid.

    Power-of-two tiers waste up to 2× on the capacity-shaped costs (the
    two multi-operand sorts, instance pack, segment reducer all run over
    ``capacity`` rows regardless of the live count); an eighth-steps grid
    caps the waste at 12.5% while keeping recompiles rare.  Tiers are
    multiples of 1024, so every kernel's packed-row/lane alignment
    (cap % 8, reducer blocks) holds.
    """
    n = max(int(n), 1)
    g = max(1024, 1 << max(int(n - 1).bit_length() - 3, 0))
    return -(-n // g) * g


def get_logger(out_dir: str) -> logging.Logger:
    """Reference get_logger (train.py:994-1010): file + console."""
    logger = logging.getLogger("gscream_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    os.makedirs(out_dir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(out_dir, "outputs.log"))
    fh.setLevel(logging.INFO)
    ch = logging.StreamHandler()
    ch.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh.setFormatter(fmt)
    ch.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(ch)
    return logger


def mask_bbox(mask: np.ndarray):
    """Bounding box of a binary mask (train.py:56-64 cal_box)."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return 0, 0, mask.shape[0], mask.shape[1]
    return ys.min(), xs.min(), ys.max() + 1, xs.max() + 1


def sample_patch_in_mask_region(rng, mask: np.ndarray, patch_size: int,
                                small_ratio: float, max_h: int, max_w: int):
    """train.py:173-190: random patch_size box overlapping the mask bbox."""
    y0, x0, y1, x1 = mask_bbox(mask)
    cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
    ny0 = max(0, cy - patch_size / 2)
    nx0 = max(0, cx - patch_size / 2)
    ny1 = min(cy + patch_size / 2, max_h - 1)
    nx1 = min(cx + patch_size / 2, max_w - 1)
    sw = small_ratio * (x1 - x0)
    sh = small_ratio * (y1 - y0)
    off_y = rng.uniform(0, max(patch_size - sh, 0))
    off_x = rng.uniform(0, max(patch_size - sw, 0))
    min_y = max(0, int(ny0 + off_y))
    min_x = max(0, int(nx0 + off_x))
    max_y = min(int(min_y + patch_size), max_h - 1)
    max_x = min(int(min_x + patch_size), max_w - 1)
    return min_y, max_y, min_x, max_x


def random_box_mask(rng, mask: np.ndarray, enlarge_ratio: float,
                    small_ratio: float, h: int, w: int) -> np.ndarray:
    """train.py:103-126 get_random_mask: random sub-box of the enlarged
    mask bbox, as a dense (H,W) {0,1} map (ref-view fg depth term)."""
    y0, x0, y1, x1 = mask_bbox(mask)
    bh, bw = y1 - y0, x1 - x0
    cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
    nh, nw = enlarge_ratio * bh, enlarge_ratio * bw
    ny0 = max(0, cy - nh / 2)
    nx0 = max(0, cx - nw / 2)
    sh, sw = small_ratio * bh, small_ratio * bw
    off_y = rng.uniform(0, max(nh - sh, 0))
    off_x = rng.uniform(0, max(nw - sw, 0))
    min_y = max(0, int(ny0 + off_y))
    min_x = max(0, int(nx0 + off_x))
    max_y = min(int(min_y + sh), h - 1)
    max_x = min(int(min_x + sw), w - 1)
    out = np.zeros((h, w), np.float32)
    out[min_y:max_y, min_x:max_x] = 1.0
    return out


@dataclass
class TrainLog:
    losses: List[float] = field(default_factory=list)
    iter_times: List[float] = field(default_factory=list)
    events: List[Dict] = field(default_factory=list)


class NonFiniteLossError(RuntimeError):
    pass


def dump_nonfinite(out_dir: str, rec: Dict, logger) -> None:
    """Post-mortem for a NaN/inf loss: checkpoint the pre-step state and
    the step's host-side inputs, then abort (the reference's analogue is
    the CUDA snapshot dump, dgr/__init__.py:87-95 + detect_anomaly)."""
    it = rec["it"]
    path = os.path.join(out_dir, f"nonfinite_it{it}")
    try:
        from ..model.io import save_checkpoint
        save_checkpoint(path + "_ckpt", rec["ts_prev"])
        np.savez(path + "_inputs.npz",
                 it=it, view=rec["vi"],
                 fg_box=np.asarray(rec["fg_box"]),
                 cross_box=np.asarray(rec["cross_box"]),
                 use_cross=rec["use_cross"],
                 num_instances=int(rec["aux"].num_instances),
                 n_active=int(rec["aux"].n_active))
    except Exception as e:    # the dump must never mask the real error
        logger.warning("non-finite dump failed: %s", e)
    logger.error("non-finite loss at iter %d (view %d) — state dumped "
                 "to %s_*", it, rec["vi"], path)
    raise NonFiniteLossError(f"loss became non-finite at iteration {it}")


def train_scene(views, ref_index: int, points: np.ndarray, run: RunConfig,
                out_dir: str = "",
                ref_image: Optional[np.ndarray] = None,
                ref_depth: Optional[np.ndarray] = None,
                spatial_lr_scale: float = 1.0,
                capacity: int = 1 << 20,
                interpret: Optional[bool] = None,
                iterations: Optional[int] = None,
                callback: Optional[Callable] = None,
                logger: Optional[logging.Logger] = None,
                pretrained_ply: str = "",
                start_checkpoint: str = "",
                checkpoint_interval: int = 0,
                mesh=None):
    """Train one scene.  ``views`` is a list of objects with
    ``.camera/.image/.mask/.depth/.name``; the reference view's image/depth
    are substituted by the provided inpainted artifacts (train.py:354-365,
    425-430).  Returns (TrainState, TrainLog).

    ``mesh``: an optional ``jax.sharding.Mesh`` with (data, tiles) axes —
    training then runs through the full SPMD sharded step
    (:func:`gscream_tpu.parallel.shard.make_sharded_train_step`): each
    iteration consumes ``data``-many views from the shuffled camera stream
    (B=1 is step-equivalent to the single-device path,
    tests/test_sharded.py::test_trajectory_matches_single_device), tile-row
    bands shard the rasterizer over ``tiles``.  All orchestration —
    overflow tiers, densification, checkpoints, logging — is identical.
    With B>1 ``iterations`` counts optimizer steps (each a B-view batch);
    host-side sampling for slot j of step ``it`` is keyed by its stream
    position ``(it-1)·B+j+1`` so the view/rng streams are the
    single-device ones, consumed B at a time."""
    from ..precision import ensure_fp32_matmuls
    ensure_fp32_matmuls()
    m, opt = run.model, run.optim
    cfg = ScaffoldConfig(
        feat_dim=m.feat_dim, n_offsets=m.n_offsets,
        voxel_size=m.voxel_size, update_depth=m.update_depth,
        update_init_factor=m.update_init_factor,
        update_hierachy_factor=m.update_hierachy_factor,
        capacity=m.anchor_capacity,
        attn_heads=opt.attn_head_num, attn_head_dim=opt.attn_head_dim,
        use_feat_bank=m.use_feat_bank)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    iters = iterations if iterations is not None else opt.iterations

    scaffold = init_scaffold(jax.random.PRNGKey(run.seed), points, cfg)
    if pretrained_ply:
        # two-phase retrain from a saved anchor cloud (the reference's
        # --warmup path, train.py:1077-1080)
        from ..model.io import load_anchors_ply
        params, alive = load_anchors_ply(pretrained_ply, cfg)
        scaffold = scaffold._replace(params=params, alive=alive)
        logger_ = logger or get_logger(out_dir or ".")
        logger_.info("warm-started %d anchors from %s",
                     int(jnp.sum(alive)), pretrained_ply)
    ts = init_train_state(scaffold, cfg, jax.random.PRNGKey(run.seed + 1))
    log = TrainLog()
    if logger is None:
        logger = get_logger(out_dir or ".")
    from .metrics_log import MetricsLogger
    mlog = MetricsLogger(out_dir or ".",
                         wandb_project=os.environ.get(
                             "GSCREAM_WANDB_PROJECT", ""))

    start_it = 1
    if start_checkpoint:
        # full-state restore (params + Adam moments + densify stats + RNG
        # + step) — the working version of the reference's broken
        # --start_checkpoint path (train.py:618-620)
        from ..model.io import load_checkpoint
        ts = load_checkpoint(start_checkpoint, ts)
        start_it = int(ts.step) + 1
        meta_path = start_checkpoint + "_meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            capacity = int(meta.get("capacity", capacity))
        logger.info("resumed from %s at iteration %d (capacity %d)",
                    start_checkpoint, start_it, capacity)

    ref_view = views[ref_index]
    h, w = ref_view.camera.height, ref_view.camera.width

    # device-resident per-view tensors
    dev_views = []
    for i, v in enumerate(views):
        img = v.image
        dep = v.depth
        if i == ref_index:
            if ref_image is not None:
                img = ref_image
            if ref_depth is not None:
                dep = ref_depth
        dev_views.append(dict(
            camera=v.camera,
            image=jnp.asarray(img),
            mask=jnp.asarray(v.mask if v.mask is not None
                             else np.zeros((1, h, w), np.float32)),
            depth=jnp.asarray(dep if dep is not None
                              else np.zeros((1, h, w), np.float32)),
            mask_np=(v.mask[0] if v.mask is not None
                     else np.zeros((h, w), np.float32)),
            is_ref=(i == ref_index),
        ))

    # callbacks may take (it, ts, aux) or (it, ts, aux, mlog) — the
    # latter receives the metrics logger for TB image grids; resolved
    # once (signature reflection has no place on the per-iteration path)
    callback_wants_mlog = False
    if callback is not None:
        import inspect
        callback_wants_mlog = (
            len(inspect.signature(callback).parameters) >= 4)

    zero_box = jnp.zeros(4, jnp.int32)
    zero_fg = jnp.zeros((h, w), jnp.float32)   # cached non-ref fg box
    t_start = time.time()
    cap_state = {"cap": capacity}
    phase2_any = (opt.enable_crossattn_refview > 0
                  or opt.enable_crossattn_otherview > 0)

    mesh_B = 0
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS
        from ..parallel.shard import make_sharded_train_step
        mesh_B = mesh.shape[DATA_AXIS]
        sharded_cache: Dict[int, Callable] = {}

        def sharded_step_for(cap: int):
            if cap not in sharded_cache:
                sharded_cache[cap] = make_sharded_train_step(
                    mesh, cfg, opt, cap, w, h, interpret,
                    white_bg=m.white_background,
                    spatial_lr_scale=spatial_lr_scale)
            return sharded_cache[cap]

    n_views = len(dev_views)
    order_cache: Dict[int, List[int]] = {}

    def view_for(it: int) -> int:
        """Camera order: per-epoch permutation derived from (seed, epoch) —
        a pure function of the iteration, so resume replays it exactly."""
        epoch, pos = divmod(it - 1, n_views)
        if epoch not in order_cache:
            order_cache.clear()
            r = np.random.default_rng(
                np.random.SeedSequence([run.seed, 77, epoch]))
            order_cache[epoch] = list(r.permutation(n_views))
        return order_cache[epoch][pos]

    def sample_slot(p: int, phase_it: Optional[int] = None) -> Dict:
        """Host-side sampling for stream position ``p`` (stored so an
        overflow rollback re-runs the step with identical inputs; all
        randomness is derived from (seed, p) for exact resume).

        ``phase_it``: the OPTIMIZER-step clock the phase windows
        (start_crossattn_from / start_stat / update_until) are read on —
        the same clock densify/eval/checkpoint boundaries use.  Defaults
        to ``p`` (single-device: identical); a B>1 batch passes the
        step index so all B slots agree with the schedule."""
        it_ = p if phase_it is None else phase_it
        rng = np.random.default_rng(np.random.SeedSequence([run.seed, p]))
        vi = view_for(p)
        v = dev_views[vi]
        # per-view cross-attn gating: the reference enables ref/other
        # views independently (train.py:445-447)
        use_cross = (it_ > opt.start_crossattn_from
                     and (opt.enable_crossattn_refview > 0 if v["is_ref"]
                          else opt.enable_crossattn_otherview > 0))
        # after the first run_crossattn the reference's _anchor_feat is
        # permanently detached (gaussian_model.py:556) — main Adam stops
        # updating feat for the rest of training on every view
        feat_frozen = it_ > opt.start_crossattn_from and phase2_any
        accumulate = opt.start_stat < it_ < opt.update_until
        if v["is_ref"]:
            fg_box = random_box_mask(rng, v["mask_np"], 1.5, 0.8, h, w)
        else:
            # non-ref views carry no fg box; prepare() substitutes a
            # CACHED device zeros array instead of uploading an (H, W)
            # zero image every iteration (2+ MB of H2D per step — one
            # full RPC behind the TPU relay)
            fg_box = None
        if use_cross and opt.enable_edge_samping > 0:
            box = sample_patch_in_mask_region(
                rng, v["mask_np"], 256, opt.sampling_2D_small_ratio, h, w)
            cross_box = np.array(box, np.int32)
        else:
            cross_box = None
        return dict(vi=vi, fg_box=fg_box, cross_box=cross_box,
                    use_cross=use_cross, feat_frozen=feat_frozen,
                    accumulate=accumulate)

    def prepare(it: int) -> Dict:
        if mesh_B:
            return prepare_sharded(it)
        s = sample_slot(it)
        return dict(it=it, vi=s["vi"],
                    fg_box=(jnp.asarray(s["fg_box"])
                            if s["fg_box"] is not None else zero_fg),
                    cross_box=(jnp.asarray(s["cross_box"])
                               if s["cross_box"] is not None else zero_box),
                    use_cross=s["use_cross"], feat_frozen=s["feat_frozen"],
                    accumulate=s["accumulate"])

    def prepare_sharded(it: int) -> Dict:
        """B view slots (stream positions (it-1)B+1 .. itB) stacked into
        the 12-tuple batch of
        :func:`gscream_tpu.parallel.shard.make_sharded_train_step`.
        Phase flags are read on the optimizer-step clock ``it`` (the
        clock the densify/eval/checkpoint boundaries use), so every slot
        agrees with the schedule; per-view crossattn participation rides
        the batch's ``cross_enable``."""
        from ..parallel.shard import sharded_view_batch
        slots = [sample_slot((it - 1) * mesh_B + j + 1, phase_it=it)
                 for j in range(mesh_B)]
        vs = [dev_views[s["vi"]] for s in slots]
        use_cross = any(s["use_cross"] for s in slots)
        batch = sharded_view_batch(
            vs, fg_boxes=[s["fg_box"] if s["fg_box"] is not None
                          else np.zeros((h, w), np.float32)
                          for s in slots],
            is_ref=[v["is_ref"] for v in vs],
            cross_boxes=[s["cross_box"] if s["cross_box"] is not None
                         else np.zeros(4, np.int32) for s in slots],
            cross_enable=[1.0 if s["use_cross"] else 0.0 for s in slots])
        return dict(it=it, vi=slots[0]["vi"],
                    vis=[s["vi"] for s in slots], batch=batch,
                    fg_box=batch[9], cross_box=batch[10],
                    use_cross=use_cross,
                    feat_frozen=slots[0]["feat_frozen"],
                    accumulate=slots[0]["accumulate"])

    def launch(rec: Dict, ts_in: TrainState) -> Dict:
        if mesh_B:
            t0 = time.time()
            step = sharded_step_for(cap_state["cap"])
            ts_new, aux = step(ts_in, rec["batch"],
                               use_crossattn=rec["use_cross"],
                               feat_frozen=rec["feat_frozen"],
                               accumulate=rec["accumulate"])
            rec["ts_prev"], rec["ts_new"], rec["aux"] = ts_in, ts_new, aux
            rec["dispatch_s"] = time.time() - t0
            return rec
        v = dev_views[rec["vi"]]
        t0 = time.time()
        ts_new, aux = train_step(
            ts_in, v["camera"], v["image"], v["mask"], v["depth"],
            rec["fg_box"], rec["cross_box"], cfg=cfg, opt=opt,
            is_ref=v["is_ref"], use_crossattn=rec["use_cross"],
            capacity=cap_state["cap"], interpret=interpret, width=w,
            height=h, accumulate=rec["accumulate"],
            white_bg=m.white_background,
            spatial_lr_scale=spatial_lr_scale,
            feat_frozen=rec["feat_frozen"])
        rec["ts_prev"], rec["ts_new"], rec["aux"] = ts_in, ts_new, aux
        rec["dispatch_s"] = time.time() - t0
        return rec

    def resolve(rec: Dict) -> Dict:
        """Exact overflow semantics (SURVEY §7 hard part 2, matching the
        reference's resize-and-rerun contract, rasterize_points.cu:27-33):
        the instance count of EVERY step is checked; a step that overflowed
        its capacity tier is re-run from its pre-step state at the raised
        tier before its update is accepted, so no step ever trains on a
        truncated instance list.

        All host-facing scalars arrive in ONE fetch of ``aux.packed``
        (each scalar fetch is a full round trip behind the TPU relay)."""
        rec["vals"] = np.asarray(rec["aux"].packed)
        n_inst = int(rec["vals"][2])
        while n_inst > cap_state["cap"]:
            # 25% headroom above the observed count: densification keeps
            # emission growing between tier checks, so a bare-minimum
            # tier would recompile every few hundred iterations
            new_cap = max(capacity_tier(n_inst + n_inst // 4),
                          capacity_tier(cap_state["cap"] + 1))
            logger.warning(
                "iter %d: instance overflow %d > %d — re-running this "
                "step at capacity tier %d (recompiles once)",
                rec["it"], n_inst, cap_state["cap"], new_cap)
            cap_state["cap"] = new_cap
            rec = launch(rec, rec["ts_prev"])
            rec["vals"] = np.asarray(rec["aux"].packed)
            n_inst = int(rec["vals"][2])
        rec["n_inst"] = n_inst
        return rec

    def commit(rec: Dict) -> TrainState:
        it, aux = rec["it"], rec["aux"]
        # scalars come from resolve()'s single packed fetch of an
        # already-finished step — real losses are logged every iteration
        # without stalling the device pipeline or issuing extra RPCs
        loss = float(rec["vals"][0])
        if not np.isfinite(loss):
            # failure detection (SURVEY §5): the reference dumps kernel
            # args on CUDA failure (dgr/__init__.py:87-95); here the
            # pre-step state is checkpointed for post-mortem and the run
            # aborts loudly instead of training on garbage
            dump_nonfinite(out_dir or ".", rec, logger)
        log.losses.append(loss)
        log.iter_times.append(rec["dispatch_s"])
        ts_new = rec["ts_new"]
        if it % 100 == 0 or it == iters:
            anchors = int(n_alive(ts_new.scaffold))
            logger.info(
                "iter %d/%d loss %.5f anchors %d instances %d "
                "(%.1f it/s)", it, iters, loss, anchors, rec["n_inst"],
                it / max(time.time() - t_start, 1e-9))
            mlog.log(it, {"loss": loss, "l1": float(rec["vals"][1]),
                          "iter_time": rec["dispatch_s"],
                          "total_points": anchors,
                          "instances": rec["n_inst"]})
        if callback is not None:
            if callback_wants_mlog:
                callback(it, ts_new, aux, mlog)
            else:
                callback(it, ts_new, aux)
        return ts_new

    def save_ckpt(it: int):
        from ..model.io import save_checkpoint
        path = os.path.join(out_dir or ".", "ckpt")
        save_checkpoint(path, ts)
        with open(path + "_meta.json", "w") as f:
            json.dump({"iteration": it, "capacity": cap_state["cap"]}, f)
        logger.info("checkpoint saved at iter %d -> %s", it, path)

    # pipeline depth: outstanding steps kept in flight.  The device
    # executes queued steps back-to-back; the host resolves the oldest.
    # Depth 1 (the pre-r5 behavior) pays one host↔device round trip per
    # step — ruinous behind the axon TPU relay, where per-execute+fetch
    # latency rivals the step itself (the r5 profile ran the same jitted
    # step at 90 ms 10-deep while the depth-1 loop logged ~220 ms).
    # Each extra slot costs one speculative TrainState on device.
    depth = max(int(os.environ.get("GSCREAM_PIPELINE", "3")), 1)
    pending: List[Dict] = []

    def drain_one():
        nonlocal ts
        rec0 = pending.pop(0)
        old_tip = rec0["ts_new"]
        rec0 = resolve(rec0)
        ts = commit(rec0)
        if rec0["ts_new"] is not old_tip:
            # the resolved step was re-run at a higher tier: queued
            # successors consumed discarded states — re-launch the
            # chain in order from the corrected state
            chain = ts
            for r in pending:
                launch(r, chain)
                chain = r["ts_new"]

    def drain_all():
        while pending:
            drain_one()

    for it in range(start_it, iters + 1):
        rec = prepare(it)
        rec = launch(rec, pending[-1]["ts_new"] if pending else ts)
        pending.append(rec)
        while len(pending) > depth:
            drain_one()

        # densification boundary (train.py:599-606; strictly below
        # update_until — the reference nests adjust_anchor under
        # ``iteration < opt.update_until``): drain the pipeline so the
        # grow/prune transform sees the committed state
        densify_now = (opt.update_from < it < opt.update_until
                       and it % opt.update_interval == 0)
        if densify_now or it == iters:
            drain_all()
        if densify_now:
            key = jax.random.fold_in(jax.random.PRNGKey(run.seed + 2), it)
            moments = (ts.m[0], ts.v[0])
            sc, stats, (m0, v0) = adjust_anchors(
                ts.scaffold, ts.stats, moments, key, cfg,
                check_interval=opt.update_interval,
                success_threshold=opt.success_threshold,
                grad_threshold=opt.densify_grad_threshold,
                min_opacity=opt.min_opacity)
            ts = ts._replace(scaffold=sc, stats=stats,
                             m=(m0, ts.m[1]), v=(v0, ts.v[1]))
        # periodic autosave at a committed iteration boundary
        if checkpoint_interval and it % checkpoint_interval == 0:
            drain_all()
            save_ckpt(it)
    if checkpoint_interval and iters % checkpoint_interval != 0 \
            and iters >= start_it:
        save_ckpt(iters)
    mlog.close()
    return ts, log
