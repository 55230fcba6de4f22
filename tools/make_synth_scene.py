"""Build a synthetic SPIN-NeRF-layout scene at real data shapes.

The environment has no network access, so no real SPIN-NeRF capture can be
downloaded; this tool manufactures a scene with the exact on-disk layout the
reference's data loader consumes (``scene/dataset_readers.py:117-190``,
``train.py:348``) so the FULL pipeline — COLMAP binary parsing, images_4
loading, LaMa masks, Marigold depths, two-phase training, densification,
render_sets, spiral video path, metric eval — runs end-to-end on
real-shaped data:

* ``sparse/0/{cameras,images,points3D}.bin``  — COLMAP binary model
* ``images/frame_NNN.jpg``                    — name stubs (split source:
  sorted names [40:] are the training split, dataset_readers.py:117)
* ``images_4/frame_NNN.png``                  — quarter-res frames 1008x567
* ``images_4/mask_test/frame_NNN.png``        — test-split object masks
* ``lama_input/frame_NNN_mask.png``           — train-split object masks
* ``marigold_output/depth_npy/frame_NNN_pred.npy`` — mono depth (affine-
  distorted + noised true depth, since Marigold is affine-invariant)
* ``poses_bounds.npy``                        — LLFF bounds for the spiral

Scene content: a room (floor, two walls with procedural texture, a table)
plus a removable ball on the table.  Train frames show the ball and carry
its mask; the reference view (30th train frame) and every test frame are
object-free renders — simulating a perfect LaMa inpainting and SPIN-NeRF's
"captured twice" ground truth.  Images are rendered with the repo's own
tile rasterizer (oracle-verified against the sequential reference
implementation in tests/test_rasterize_tiled.py).
"""
from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH4, HEIGHT4 = 1008, 567
FOCAL4 = 800.0
N_FRAMES = 84            # 40 test + 44 train (ref view = train idx 29)
NEAR, FAR = 3.0, 14.0


# ---------------------------------------------------------------------------
# scene content

def _surface(rng, n, point_fn, color_fn, scale=0.028, opacity=0.92):
    u = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    pts = point_fn(u)
    col = color_fn(pts)
    return dict(
        xyz=pts.astype(np.float32),
        color=np.clip(col, 0, 1).astype(np.float32),
        scale=np.full((n, 3), scale, np.float32),
        opacity=np.full((n,), opacity, np.float32),
    )


def _checker(p, axes, period, c0, c1):
    k = np.floor(p[:, axes[0]] / period) + np.floor(p[:, axes[1]] / period)
    t = (k % 2)[:, None]
    return np.asarray(c0) * (1 - t) + np.asarray(c1) * t


def _noise_color(rng, p, base, amp=0.15):
    return np.asarray(base) + amp * np.sin(
        7.1 * p[:, :1] + 3.3 * p[:, 1:2] + 5.7 * p[:, 2:3]
        + rng.normal(0, 0.2, (p.shape[0], 1)))


def build_scene(rng):
    """Returns (static gaussians dict, object gaussians dict).

    World: y up, scene in front of the cameras along +z (3DGS camera frame
    is x-right / y-down / z-forward; colors stay in [0,1]).
    """
    parts = []
    # the room is CLOSED for every forward-facing camera ray (floor, back
    # wall, both side walls, ceiling): real SPIN-NeRF photos cover every
    # pixel, and an uncovered (background-colored) region puts a hard
    # floor under the RGB loss that no amount of training can cross
    # floor y=0, x in [-4.5,4.5], z in [1.5,11]
    parts.append(_surface(
        rng, 46000,
        lambda u: np.stack([u[:, 0] * 9 - 4.5, np.zeros(len(u)),
                            u[:, 1] * 9.5 + 1.5], 1),
        lambda p: _checker(p, (0, 2), 0.8, [0.72, 0.62, 0.50],
                           [0.35, 0.28, 0.22])))
    # back wall z=11, x in [-4.5,4.5], y in [0,5.2]
    parts.append(_surface(
        rng, 40000,
        lambda u: np.stack([u[:, 0] * 9 - 4.5, u[:, 1] * 5.2,
                            np.full(len(u), 11.0)], 1),
        lambda p: _noise_color(rng, p, [0.55, 0.62, 0.72])))
    # left wall x=-4
    parts.append(_surface(
        rng, 28000,
        lambda u: np.stack([np.full(len(u), -4.0), u[:, 1] * 5.2,
                            u[:, 0] * 9.5 + 1.5], 1),
        lambda p: _noise_color(rng, p, [0.68, 0.55, 0.45])))
    # right wall x=+4
    parts.append(_surface(
        rng, 28000,
        lambda u: np.stack([np.full(len(u), 4.0), u[:, 1] * 5.2,
                            u[:, 0] * 9.5 + 1.5], 1),
        lambda p: _noise_color(rng, p, [0.48, 0.58, 0.50])))
    # ceiling y=5.0, x in [-4.5,4.5], z in [1.5,11]
    parts.append(_surface(
        rng, 34000,
        lambda u: np.stack([u[:, 0] * 9 - 4.5, np.full(len(u), 5.0),
                            u[:, 1] * 9.5 + 1.5], 1),
        lambda p: _noise_color(rng, p, [0.80, 0.80, 0.78], amp=0.06)))
    # table: box top y=1.0, x in [-1,1], z in [5.5,7]
    parts.append(_surface(
        rng, 16000,
        lambda u: np.stack([u[:, 0] * 2 - 1, np.full(len(u), 1.0),
                            u[:, 1] * 1.5 + 5.5], 1),
        lambda p: _checker(p, (0, 2), 0.25, [0.45, 0.30, 0.18],
                           [0.55, 0.38, 0.24]),
        scale=0.022))
    # table legs + skirt (vertical strips)
    parts.append(_surface(
        rng, 9000,
        lambda u: np.stack([
            np.sign(u[:, 0] - 0.5) * 0.95 + 0.05 * (u[:, 0] - 0.5),
            u[:, 1] * 1.0,
            np.where(u[:, 0] * 7919 % 1 > 0.5, 5.55, 6.95)], 1),
        lambda p: np.full((p.shape[0], 3), 0.30) * [1.0, 0.75, 0.55],
        scale=0.03))
    # scattered boxes on the floor for parallax
    for bx, bz, col in [(-2.5, 4.5, [0.25, 0.45, 0.3]),
                        (2.3, 8.5, [0.5, 0.25, 0.3]),
                        (-1.8, 9.5, [0.3, 0.3, 0.55])]:
        parts.append(_surface(
            rng, 6000,
            lambda u, bx=bx, bz=bz: np.stack([
                bx + (u[:, 0] - 0.5) * 0.9,
                u[:, 1] * 0.7,
                bz + (np.floor(u[:, 0] * 9973) % 2 - 0.5) * 0.9], 1),
            lambda p, col=col: _noise_color(rng, p, col, amp=0.05),
            scale=0.03))

    static = {k: np.concatenate([p[k] for p in parts])
              for k in parts[0]}

    # removable object: a striped ball on the table
    n_obj = 14000
    u = rng.uniform(0, 1, (n_obj, 2)).astype(np.float32)
    theta = np.arccos(1 - 2 * u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    r = 0.42
    center = np.array([0.0, 1.0 + r, 6.2], np.float32)
    pts = center + r * np.stack([
        np.sin(theta) * np.cos(phi), np.cos(theta),
        np.sin(theta) * np.sin(phi)], 1)
    stripe = ((np.floor((pts[:, 1] - center[1]) / 0.12) % 2)[:, None])
    col = np.asarray([0.85, 0.2, 0.15]) * (1 - stripe) \
        + np.asarray([0.95, 0.85, 0.2]) * stripe
    obj = dict(xyz=pts.astype(np.float32),
               color=np.clip(col, 0, 1).astype(np.float32),
               scale=np.full((n_obj, 3), 0.02, np.float32),
               opacity=np.full((n_obj,), 0.95, np.float32))
    return static, obj


# ---------------------------------------------------------------------------
# cameras

def look_at_w2c(eye, target, up=(0.0, 1.0, 0.0)):
    """3DGS camera frame (x right, y down, z forward) w2c (R, t)."""
    f = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    f /= np.linalg.norm(f)
    d0 = -np.asarray(up, np.float64)
    r = np.cross(d0, f)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)
    c2w_rot = np.stack([r, d, f], axis=1)          # columns
    R_w2c = c2w_rot.T
    t_w2c = -R_w2c @ np.asarray(eye, np.float64)
    return R_w2c, t_w2c


def rotmat2qvec(R):
    """w2c rotation matrix → COLMAP qvec (w,x,y,z)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1],
         R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]]]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0] + (q[0] == 0))


def _eye_at(t):
    ang = (t - 0.5) * 2.0 * np.pi * 0.9
    return np.array([1.1 * np.sin(ang),
                     1.15 + 0.35 * np.sin(2.3 * ang),
                     0.45 * (1 - np.cos(ang))])


def camera_path(n=N_FRAMES):
    """Forward-facing LLFF-style sweep; returns list of (R_w2c, t_w2c).

    SPIN-NeRF captures the SAME forward-facing trajectory twice — once
    with the object (train frames, sorted indices >= 40) and once without
    (the 40 test frames) — so the first 40 poses here revisit the train
    sweep with a small hand-held jitter rather than occupying a disjoint
    half of the arc (dataset_readers.py:117 split semantics; a disjoint
    split makes test views unconstrained novel views, which is not the
    benchmark).
    """
    target = np.array([0.0, 1.1, 6.5])
    n_train = n - 40
    train_ts = [i / (n_train - 1) for i in range(n_train)]
    rng = np.random.default_rng(123)
    out = []
    for i in range(40):                        # test pass (object-free)
        t = train_ts[int(round(i * (n_train - 1) / 39))]
        eye = _eye_at(t) + rng.normal(0, 0.015, 3)
        out.append(look_at_w2c(eye, target))
    for t in train_ts:                         # train pass (with object)
        out.append(look_at_w2c(_eye_at(t), target))
    return out


# ---------------------------------------------------------------------------
# COLMAP binary writers (format: colmap.github.io/format.html)

def write_cameras_bin(path, width, height, focal, cx, cy):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, width, height))  # SIMPLE_PINHOLE
        f.write(struct.pack("<3d", focal, cx, cy))


def write_images_bin(path, poses, names):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(poses)))
        for i, ((R, t), name) in enumerate(zip(poses, names)):
            q = rotmat2qvec(R)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))          # no 2D points

def write_points3d_bin(path, xyz, rgb):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i, (p, c) in enumerate(zip(xyz, rgb)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", *c))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))          # empty track


# ---------------------------------------------------------------------------
# rendering

def make_renderer():
    import jax
    import jax.numpy as jnp
    from gscream_tpu.precision import enable_compile_cache, \
        ensure_fp32_matmuls
    enable_compile_cache()
    ensure_fp32_matmuls()
    from gscream_tpu.cameras import make_camera
    from gscream_tpu.ops.rasterize_tiled import render_tiled

    fov_x = 2 * np.arctan(WIDTH4 / (2 * FOCAL4))
    fov_y = 2 * np.arctan(HEIGHT4 / (2 * FOCAL4))

    @jax.jit
    def _render(means, scales, colors, opacity, cam):
        n = means.shape[0]
        rots = jnp.zeros((n, 4)).at[:, 0].set(1.0)
        unc = jnp.zeros((n,))
        bg = jnp.ones((3,))                        # white background
        out, aux = render_tiled(means, scales, rots, colors, opacity, unc,
                                cam, bg, capacity=2 ** 21)
        return (out.color, out.depth, out.final_t, aux["num_instances"])

    def render(gauss, R_w2c, t_w2c):
        # make_camera wants the camera-to-world rotation (= R_w2c.T)
        cam = make_camera(R_w2c.T, t_w2c, fov_x, fov_y, WIDTH4, HEIGHT4)
        c, d, ft, n_inst = _render(
            jnp.asarray(gauss["xyz"]), jnp.asarray(gauss["scale"]),
            jnp.asarray(gauss["color"]), jnp.asarray(gauss["opacity"]), cam)
        assert int(n_inst) < 2 ** 21, "capacity overflow in GT render"
        cov = 1.0 - np.asarray(ft)
        depth = np.asarray(d) / np.maximum(cov, 1e-6)
        return np.clip(np.asarray(c), 0, 1), depth, cov

    return render


def _dilate(mask, it=6):
    m = mask.astype(bool)
    for _ in range(it):
        mm = m.copy()
        mm[1:] |= m[:-1]
        mm[:-1] |= m[1:]
        mm[:, 1:] |= m[:, :-1]
        mm[:, :-1] |= m[:, 1:]
        m = mm
    return m


def main():
    # in-process backend pin (axon sitecustomize ignores JAX_PLATFORMS;
    # with the relay down the default backend hangs at init)
    if os.environ.get("GSCREAM_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["GSCREAM_PLATFORM"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "synth_spin"))
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import imageio.v2 as imageio
    rng = np.random.default_rng(args.seed)
    root = args.out
    for d in ["sparse/0", "images", "images_4/mask_test",
              "images_4/test_label", "lama_input",
              "marigold_output/depth_npy"]:
        os.makedirs(os.path.join(root, d), exist_ok=True)

    static, obj = build_scene(rng)
    full = {k: np.concatenate([static[k], obj[k]]) for k in static}
    poses = camera_path()
    names = [f"frame_{i:03d}.jpg" for i in range(len(poses))]
    bases = [n[:-4] for n in names]
    train_idx = set(range(40, len(poses)))
    ref_base = sorted(bases[i] for i in train_idx)[29]

    render = make_renderer()
    pb = np.zeros((len(poses), 17), np.float32)
    pb[:, -2:] = [NEAR, FAR]
    np.save(os.path.join(root, "poses_bounds.npy"), pb)

    for i, ((R, t), base) in enumerate(zip(poses, bases)):
        is_train = i in train_idx
        use_object = is_train and base != ref_base
        gauss = full if use_object else static
        color, depth, cov = render(gauss, R, t)
        # object mask from the object-only footprint
        _, _, obj_cov = render(obj, R, t)
        m = _dilate(obj_cov > 0.5)
        imageio.imwrite(os.path.join(root, "images_4", base + ".png"),
                        (color * 255).astype(np.uint8))
        open(os.path.join(root, "images", names[i]), "wb").close()  # stub
        mask_png = (m * 255).astype(np.uint8)
        if is_train:
            imageio.imwrite(os.path.join(
                root, "lama_input", base + "_mask.png"), mask_png)
        else:
            imageio.imwrite(os.path.join(
                root, "images_4", "mask_test", base + ".png"), mask_png)
            # the reference's masked-eval masks: 1-indexed by test-split
            # position (readImages, /root/reference/train.py:895-898)
            imageio.imwrite(os.path.join(
                root, "images_4", "test_label",
                "out_%05d.png" % (1 + i)), mask_png)
        # affine-invariant mono depth: random per-view scale/shift + noise
        a = rng.uniform(0.8, 1.3)
        b = rng.uniform(-0.5, 0.5)
        mono = a * depth + b + rng.normal(0, 0.03, depth.shape)
        np.save(os.path.join(root, "marigold_output/depth_npy",
                             base + "_pred.npy"),
                mono.astype(np.float32))
        if i % 10 == 0:
            print(f"[{i + 1}/{len(poses)}] {base} "
                  f"{'train' if is_train else 'test'}"
                  f"{' (ref, inpainted)' if base == ref_base else ''}")

    # COLMAP model (full-res intrinsics; images_4 is the quarter-res copy)
    W, H = WIDTH4 * 4, HEIGHT4 * 4
    write_cameras_bin(os.path.join(root, "sparse/0/cameras.bin"),
                      W, H, FOCAL4 * 4, W / 2, H / 2)
    write_images_bin(os.path.join(root, "sparse/0/images.bin"), poses, names)
    sel = rng.choice(len(static["xyz"]), 30000, replace=False)
    pts = static["xyz"][sel] + rng.normal(0, 0.01, (30000, 3))
    rgb = (static["color"][sel] * 255).astype(np.uint8)
    write_points3d_bin(os.path.join(root, "sparse/0/points3D.bin"), pts, rgb)
    print("scene written to", root, " ref view:", ref_base)


if __name__ == "__main__":
    main()
