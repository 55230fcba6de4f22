"""SPIN-NeRF / COLMAP scene reader.

Port of the reference data layer (``scene/dataset_readers.py`` +
``scene/__init__.py`` + ``utils/camera_utils.py``) with its SPIN-NeRF
conventions:

* images are ``images_4/*.png`` quarter-res frames; frames with COLMAP
  index ≥ 40 are the *training* split, < 40 the test split
  (``dataset_readers.py:117,342-344``);
* the reference (inpainted) view is train frame ``all_names[40+29]``
  (``train.py:348``);
* object masks come from ``lama_input/<name>_mask.png`` (train) or
  ``images_4/mask_test/<name>.png`` (test), binarized at > 0
  (``dataset_readers.py:175-180``, ``camera_utils.py``);
* monocular depth from ``marigold_output/depth_npy/<name>_pred.npy``
  (``dataset_readers.py:186-190``);
* principal point enters the projection as NDC offsets
  ``(c - S/2)/S·2`` (``dataset_readers.py:168-169``);
* the initial cloud comes from ``specified_ply_path`` with colors/normals
  zeroed (``fetchPly_modi``, ``dataset_readers.py:229-237``);
* cameras extent ("spatial_lr_scale") = 1.1 × the diagonal radius of the
  camera centers (``getNerfppNorm``).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..cameras import Camera, focal2fov, make_camera, qvec2rotmat, \
    world_to_view
from .colmap import read_model
from .ply import read_ply_xyz
from .spiral import get_spiral


@dataclass
class View:
    camera: Camera
    image: Optional[np.ndarray]      # (3,H,W) float32 in [0,1]
    mask: Optional[np.ndarray]       # (1,H,W) float32 {0,1}
    depth: Optional[np.ndarray]      # (1,H,W) float32
    name: str
    is_train: bool


@dataclass
class SceneData:
    train_views: List[View]
    test_views: List[View]
    points: np.ndarray               # (N,3) init cloud
    cameras_extent: float
    ref_name: str
    spiral_c2ws: Optional[np.ndarray] = None   # (120,4,4)
    fov_x: float = 0.0
    fov_y: float = 0.0
    cx_ndc: float = 0.0
    cy_ndc: float = 0.0
    width: int = 0
    height: int = 0


def _load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), np.float32) / 255.0
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, 2)
    return img[:, :, :3].transpose(2, 0, 1)


def _load_mask(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    m = np.asarray(imageio.imread(path), np.float32)
    if m.ndim == 3:
        m = m[:, :, 0]
    return (m > 0).astype(np.float32)[None]


def cameras_extent(w2cs: List[np.ndarray]) -> float:
    """getNerfppNorm: 1.1 × max distance from the mean camera center."""
    centers = np.stack([np.linalg.inv(m.astype(np.float64))[:3, 3]
                        for m in w2cs])
    avg = centers.mean(0)
    diag = np.linalg.norm(centers - avg, axis=1).max()
    return float(diag * 1.1)


def load_spinnerf_scene(source_path: str,
                        specified_ply_path: str = "",
                        load_images: bool = True,
                        n_spiral: int = 120,
                        resolution: int = -1) -> SceneData:
    """Read one SPIN-NeRF scene laid out as the reference expects.

    ``resolution`` is the reference's ``-r`` flag applied to the loaded
    ``images_4`` frames: 1/2/4/8 divide the stored size, -1 (default)
    auto-downscales only frames wider than 1600 px
    (utils/camera_utils.py:19-58 policy).
    """
    cams, images, points = read_model(
        os.path.join(source_path, "sparse/0"))

    img_dir = os.path.join(source_path, "images_4")
    all_jpg = [n for n in sorted(os.listdir(os.path.join(
        source_path, "images"))) if n.endswith("jpg")] if os.path.isdir(
        os.path.join(source_path, "images")) else []
    train_names = {n[:-4] for n in all_jpg[40:]}

    intr = cams[min(cams)]
    W, H = intr.width, intr.height
    if intr.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
        focal, cx_pix, cy_pix = intr.params[0], intr.params[1], intr.params[2]
        fov_x = focal2fov(focal, W)
        fov_y = focal2fov(focal, H)
    elif intr.model == "PINHOLE":
        fov_x = focal2fov(intr.params[0], W)
        fov_y = focal2fov(intr.params[1], H)
        cx_pix, cy_pix = intr.params[2], intr.params[3]
    else:
        raise ValueError(f"unsupported COLMAP model {intr.model}")
    cx = (cx_pix - W / 2) / W * 2
    cy = (cy_pix - H / 2) / H * 2

    ordered = sorted(images.values(), key=lambda im: im.name)
    train_views, test_views, w2cs, c2ws_train = [], [], [], []
    for im in ordered:
        base = os.path.splitext(os.path.basename(im.name))[0]
        is_train = (base in train_names) if train_names else False
        R = qvec2rotmat(im.qvec).T
        T = im.tvec
        img_path = os.path.join(img_dir, base + ".png")
        image = mask = depth = None
        wh = None
        if load_images and os.path.exists(img_path):
            image = _load_image(img_path)
            th, tw = _target_resolution(image.shape[2], image.shape[1],
                                        resolution)
            if (th, tw) != image.shape[1:]:
                image = _resize_image(image, (th, tw))
            wh = (image.shape[2], image.shape[1])
            mask_train = os.path.join(source_path, "lama_input",
                                      base + "_mask.png")
            mask_test = os.path.join(img_dir, "mask_test", base + ".png")
            mpath = mask_train if os.path.exists(mask_train) else mask_test
            if os.path.exists(mpath):
                mask = _load_mask(mpath)
                if mask.shape[1:] != image.shape[1:]:
                    mask = _resize_nearest(mask, image.shape[1:])
            dpath = os.path.join(source_path, "marigold_output/depth_npy",
                                 base + "_pred.npy")
            # MiDaS .pfm alternative (the reference's load_midas branch,
            # dataset_readers.py:192-197)
            ppath = os.path.join(source_path, "midas_output",
                                 base + "-dpt_beit_large_512.pfm")
            if os.path.exists(dpath):
                depth = np.load(dpath).astype(np.float32)[None]
            elif os.path.exists(ppath):
                from .pfm import read_pfm
                depth = read_pfm(ppath)[None]
            if depth is not None and depth.shape[1:] != image.shape[1:]:
                depth = _resize_nearest(depth, image.shape[1:])
        vw, vh = wh if wh else (W // 4, H // 4)
        cam = make_camera(R, T, fov_x, fov_y, vw, vh, cx, cy)
        view = View(camera=cam, image=image, mask=mask, depth=depth,
                    name=base, is_train=is_train)
        (train_views if is_train else test_views).append(view)
        w2cs.append(np.asarray(cam.w2c))
        if is_train:
            c2w = np.linalg.inv(np.asarray(cam.w2c, np.float64))
            c2ws_train.append(c2w[:3, :4])

    if specified_ply_path and not os.path.exists(specified_ply_path):
        # the reference converts points3D.bin on demand when the ply is
        # absent (scene/__init__.py fetchPly path) — mirror that, but
        # LOUDLY: a mistyped path must not silently change the init cloud
        import sys
        print(f"WARNING: specified_ply_path {specified_ply_path!r} does "
              "not exist — falling back to the COLMAP points3D cloud",
              file=sys.stderr)
    if specified_ply_path and os.path.exists(specified_ply_path):
        pts = read_ply_xyz(specified_ply_path)
    elif points is not None:
        pts = np.asarray(points[0], np.float32)
    else:
        raise FileNotFoundError("no initial point cloud")

    extent = cameras_extent(w2cs)

    # reference view: 30th training frame (train.py:348, all_names[40+29])
    ref_name = (sorted(v.name for v in train_views)[29]
                if len(train_views) > 29 else
                (train_views[0].name if train_views else ""))

    spiral = None
    pb_path = os.path.join(source_path, "poses_bounds.npy")
    if c2ws_train and os.path.exists(pb_path):
        pb = np.load(pb_path)
        near_fars = pb[40:][:, -2:]
        spiral = get_spiral(np.stack(c2ws_train), near_fars,
                            rads_scale=0.4, n_views=n_spiral)

    vw = train_views[0].camera.width if train_views else W // 4
    vh = train_views[0].camera.height if train_views else H // 4
    return SceneData(train_views=train_views, test_views=test_views,
                     points=pts, cameras_extent=extent, ref_name=ref_name,
                     spiral_c2ws=spiral, fov_x=fov_x, fov_y=fov_y,
                     cx_ndc=cx, cy_ndc=cy, width=vw, height=vh)


def _resize_nearest(arr: np.ndarray, hw) -> np.ndarray:
    """(C,H,W) nearest resize without external deps."""
    c, h, w = arr.shape
    th, tw = hw
    yi = (np.arange(th) * h / th).astype(int).clip(0, h - 1)
    xi = (np.arange(tw) * w / tw).astype(int).clip(0, w - 1)
    return arr[:, yi][:, :, xi]


def _resize_image(img: np.ndarray, hw) -> np.ndarray:
    """(3,H,W) float resize via PIL (the reference's PILtoTorch path,
    utils/camera_utils.py + general_utils.py:23-31)."""
    from PIL import Image
    th, tw = hw
    u8 = (np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
    r = Image.fromarray(u8).resize((tw, th), Image.LANCZOS)
    return (np.asarray(r, np.float32) / 255.0).transpose(2, 0, 1)


def _target_resolution(w: int, h: int, resolution: int,
                       _warned=[False]) -> tuple:
    """The reference's ``-r`` policy (utils/camera_utils.py:19-58).

    ``resolution`` in {1,2,4,8}: divide by it.  ``-1`` (default): leave
    images alone unless width exceeds 1600 px, then downscale to 1600
    (with the reference's one-time warning).
    """
    if resolution in (1, 2, 4, 8):
        scale = float(resolution)
    else:
        if w > 1600:
            if not _warned[0]:
                print("[ INFO ] Encountered quite large input images "
                      "(>1.6K pixels width), rescaling to 1.6K.\n If this "
                      "is not desired, please explicitly specify '--resolution/-r' as 1")
                _warned[0] = True
            scale = w / 1600.0
        else:
            scale = 1.0
    return round(h / scale), round(w / scale)
