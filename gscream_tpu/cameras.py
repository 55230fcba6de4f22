"""Camera model and projection matrices (pure JAX / numpy).

Reproduces the reference's camera conventions exactly so that projected
gaussian centers, depths and covariances are bit-comparable:

* world-to-view from COLMAP ``(R, T)`` — reference
  ``utils/graphics_utils.py:38-48`` (``getWorld2View2``);
* off-center perspective projection with principal-point offsets expressed
  directly as NDC matrix entries ``P[0,2]=cx, P[1,2]=cy`` — reference
  ``utils/graphics_utils.py:51-74`` (``getProjectionMatrix``), with
  ``cx = (cx_pix - W/2)/W * 2`` — reference ``scene/dataset_readers.py:168-169``;
* NDC-to-pixel mapping ``((v+1)*S - 1)/2`` — reference
  ``cuda_rasterizer/auxiliary.h:40-43`` (``ndc2Pix``);
* znear=0.01, zfar=100 — reference ``scene/cameras.py:59-60``.

Matrices here are stored in *math* convention (column vectors,
``p' = M @ p``).  The reference stores them transposed for its row-vector
torch code; the underlying transform is identical.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: int) -> float:
    """Reference utils/graphics_utils.py:76-77."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    """Reference utils/graphics_utils.py:79-80."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, T: np.ndarray,
                  translate: Optional[np.ndarray] = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world→camera matrix.

    ``R`` is the camera-to-world rotation (COLMAP ``qvec2rotmat(q).T`` as the
    reference stores it), ``T`` the world→camera translation.  The optional
    ``translate``/``scale`` recentering matches reference
    ``getWorld2View2`` (utils/graphics_utils.py:38-48).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = T
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fov_x: float, fov_y: float,
                      cx_ndc: float = 0.0, cy_ndc: float = 0.0) -> np.ndarray:
    """Off-center perspective projection, math convention (p' = P @ p).

    Matches reference ``getProjectionMatrix`` (utils/graphics_utils.py:51-74):
    note the reference writes the principal-point NDC offsets straight into
    ``P[0,2]``/``P[1,2]`` and uses ``P[2,2]=(n+f)/(f-n)``, ``P[2,3]=-fn/(f-n)``,
    ``P[3,2]=1`` (z forward positive).
    """
    tan_x = math.tan(fov_x / 2.0)
    tan_y = math.tan(fov_y / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[0, 2] = cx_ndc
    P[1, 2] = cy_ndc
    P[2, 2] = (znear + zfar) / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@jax.tree_util.register_pytree_node_class
class Camera(NamedTuple):
    """A single pinhole camera as a JAX pytree.

    Array fields are jnp arrays so a Camera can cross a jit boundary;
    ``width``/``height`` are *static* aux data (shapes for XLA), so two
    cameras of the same resolution share one compilation.
    """
    w2c: jnp.ndarray          # (4,4) world→camera
    full_proj: jnp.ndarray    # (4,4) proj @ w2c : world→clip
    cam_center: jnp.ndarray   # (3,)  camera position in world space
    tan_fovx: jnp.ndarray     # scalar
    tan_fovy: jnp.ndarray     # scalar
    width: int
    height: int

    def tree_flatten(self):
        children = (self.w2c, self.full_proj, self.cam_center,
                    self.tan_fovx, self.tan_fovy)
        return children, (self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, width=aux[0], height=aux[1])

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)


def make_camera(R: np.ndarray, T: np.ndarray, fov_x: float, fov_y: float,
                width: int, height: int,
                cx_ndc: float = 0.0, cy_ndc: float = 0.0,
                znear: float = ZNEAR, zfar: float = ZFAR,
                translate: Optional[np.ndarray] = None,
                scale: float = 1.0) -> Camera:
    w2c = world_to_view(R, T, translate, scale)
    proj = projection_matrix(znear, zfar, fov_x, fov_y, cx_ndc, cy_ndc)
    full = (proj.astype(np.float64) @ w2c.astype(np.float64)).astype(np.float32)
    c2w = np.linalg.inv(w2c.astype(np.float64))
    center = c2w[:3, 3].astype(np.float32)
    return Camera(
        w2c=jnp.asarray(w2c),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(center),
        tan_fovx=jnp.float32(math.tan(fov_x / 2.0)),
        tan_fovy=jnp.float32(math.tan(fov_y / 2.0)),
        width=int(width),
        height=int(height),
    )


def make_camera_from_c2w(c2w: np.ndarray, fov_x: float, fov_y: float,
                         width: int, height: int,
                         cx_ndc: float = 0.0, cy_ndc: float = 0.0) -> Camera:
    """Camera from a 4x4 camera-to-world matrix (spiral render paths).

    Matches reference ``Camera_spiral`` (scene/cameras.py:72-133), which
    inverts the c2w directly.
    """
    c2w = np.asarray(c2w, dtype=np.float64)
    if c2w.shape == (3, 4):
        c2w = np.concatenate([c2w, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    w2c = np.linalg.inv(c2w).astype(np.float32)
    proj = projection_matrix(ZNEAR, ZFAR, fov_x, fov_y, cx_ndc, cy_ndc)
    full = (proj.astype(np.float64) @ w2c.astype(np.float64)).astype(np.float32)
    return Camera(
        w2c=jnp.asarray(w2c),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(c2w[:3, 3].astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(fov_x / 2.0)),
        tan_fovy=jnp.float32(math.tan(fov_y / 2.0)),
        width=int(width),
        height=int(height),
    )


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reference auxiliary.h:40-43."""
    return ((v + 1.0) * size - 1.0) * 0.5


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    """COLMAP quaternion (w,x,y,z) → rotation matrix.

    Reference scene/colmap_loader.py (qvec2rotmat).
    """
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → COLMAP quaternion (w,x,y,z)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
    ]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec
