"""Rotation matrix builder tests (reference src/main.cpp:97-142)."""

import math

import numpy as np

from image_lens_reproject_tpu.models.rotation import (
    is_identity,
    rotation_matrix,
    rotation_matrix_degrees,
)


def test_zero_rotation_is_identity():
    rm = rotation_matrix(0.0, 0.0, 0.0)
    np.testing.assert_array_equal(rm, np.eye(3, dtype=np.float32))
    assert is_identity(rm)


def test_pan_90_maps_forward_to_minus_x():
    # R_y(pi/2) applied to the forward ray (0,0,-1): x' = sin(pan)*z = -1.
    rm = rotation_matrix_degrees(90.0, 0.0, 0.0)
    v = rm @ np.array([0.0, 0.0, -1.0], dtype=np.float32)
    np.testing.assert_allclose(v, [-1.0, 0.0, 0.0], atol=1e-6)


def test_pitch_90_maps_forward_to_up():
    # R_x(pi/2) applied to (0,0,-1): y' = -sin(pitch)*z = +1.
    rm = rotation_matrix_degrees(0.0, 90.0, 0.0)
    v = rm @ np.array([0.0, 0.0, -1.0], dtype=np.float32)
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_roll_rotates_about_z():
    rm = rotation_matrix_degrees(0.0, 0.0, 90.0)
    v = rm @ np.array([1.0, 0.0, 0.0], dtype=np.float32)
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_composition_order_y_x_z():
    # R = R_y(pan) @ R_x(pitch) @ R_z(roll) exactly (src/main.cpp:137-140).
    pan, pitch, roll = 0.3, -0.7, 1.1
    cy, sy = math.cos(pan), math.sin(pan)
    cx, sx = math.cos(pitch), math.sin(pitch)
    cz, sz = math.cos(roll), math.sin(roll)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    expected = ry @ rx @ rz
    np.testing.assert_allclose(rotation_matrix(pan, pitch, roll), expected, atol=1e-6)


def test_orthonormal():
    rm = rotation_matrix(0.5, 1.2, -0.4).astype(np.float64)
    np.testing.assert_allclose(rm @ rm.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(rm), 1.0, atol=1e-6)
