"""Visualization helpers (reference utils/visualize_utils.py:9-152)."""
import numpy as np
import pytest

from gscream_tpu.utils.visualize import (add_label_centered,
                                         depth_to_cam_points,
                                         normals_from_cam_points, to_image,
                                         to_jet, to_rgb8, visualize_normal)


def test_to_rgb8_range_and_gain():
    x = np.linspace(-2.0, 3.0, 100, dtype=np.float32).reshape(10, 10)
    u = to_rgb8(x)
    assert u.dtype == np.uint8 and u.min() == 0 and u.max() == 255
    # explicit window: values clip outside it
    u2 = to_rgb8(x, x_min=0.0, x_max=1.0)
    assert u2[0, 0] == 0 and u2[-1, -1] == 255
    # degenerate range guarded by the 1e-3 clip (no div-by-zero)
    assert to_rgb8(np.zeros((4, 4))).max() == 0


def test_jet_endpoints():
    j = to_jet(np.array([[0.0, 0.5, 1.0]]), x_min=0.0, x_max=1.0)
    assert j.shape == (1, 3, 3)
    r, g, b = j[0, 0]
    assert b >= 100 and r < 50 and g < 50   # low end: dark blue (~128)
    r, g, b = j[0, 2]
    assert r >= 100 and b < 50 and g < 50   # high end: dark red (~128)
    r, g, b = j[0, 1]
    assert g > 200                          # middle: green-dominated


def test_to_image_modes_and_mask():
    x = np.random.default_rng(0).uniform(0, 1, (1, 8, 8)).astype(np.float32)
    img = to_image(x)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    mask = np.zeros((8, 8), np.float32)
    img_m = to_image(x, mask=mask)
    assert img_m.max() == 0
    jet = to_image(x, mode="jet")
    assert jet.shape == (8, 8, 3)
    with pytest.raises(ValueError):
        to_image(np.zeros((2, 4, 4)))
    with pytest.raises(ValueError):
        to_image(x, mode="bogus")


def test_label_alignment():
    img = np.zeros((64, 128, 3), np.uint8)
    top = add_label_centered(img, "hi", alignment="top")
    assert top.shape == img.shape and top.sum() > 0
    with pytest.raises(ValueError):
        add_label_centered(img, "hi", alignment="center")


def test_normals_flat_plane():
    """A constant-depth plane unprojects to a fronto-parallel sheet whose
    normals all face the camera (−z)."""
    depth = np.full((16, 16), 2.0, np.float32)
    pos = depth_to_cam_points(depth, focal=(20.0, 20.0), princpt=(8.0, 8.0))
    assert pos.shape == (3, 16, 16)
    np.testing.assert_allclose(pos[2], depth)
    n = normals_from_cam_points(pos)
    # reference sign convention: -cross(d/dy, d/dx) → +z for a
    # fronto-parallel sheet (visualize_utils.py:136-137)
    interior = n[:, 2:-2, 2:-2]
    np.testing.assert_allclose(interior[2], 1.0, atol=1e-3)
    np.testing.assert_allclose(interior[:2], 0.0, atol=1e-3)
    img = visualize_normal(depth, (20.0, 20.0), (8.0, 8.0))
    assert img.shape == (16, 16, 3)
