"""Unit tests for the math layer (ops/vecmath.py, ops/quat.py,
ops/sampling.py) against NumPy closed forms — the reference has no tests
(SURVEY.md section 4); these cover its `maths.rs` semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.ops import quat as q
from mirror_maze_tpu.ops import sampling, vecmath as vm


def test_dot_cross_norm(rng):
    a = rng.normal(size=(17, 3)).astype(np.float32)
    b = rng.normal(size=(17, 3)).astype(np.float32)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(a * b, -1), rtol=1e-6)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vm.norm(a), np.linalg.norm(a, axis=-1), rtol=1e-6)
    n = np.asarray(vm.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_reflect_is_involution_and_preserves_norm(rng):
    d = rng.normal(size=(9, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rng.normal(size=(9, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = np.asarray(vm.reflect(d, n))
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vm.reflect(r, n)), d, rtol=1e-4, atol=1e-5)


def test_hamilton_identity_and_norm(rng):
    ident = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    a = rng.normal(size=(4,)).astype(np.float32)
    a /= np.linalg.norm(a)
    np.testing.assert_allclose(np.asarray(q.hamilton(a, ident)), a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q.hamilton(ident, a)), a, rtol=1e-6)
    b = rng.normal(size=(4,)).astype(np.float32)
    b /= np.linalg.norm(b)
    ab = np.asarray(q.hamilton(a, b))
    assert abs(np.linalg.norm(ab) - 1.0) < 1e-5


def _rotmat_from_quat_conjugated(qv):
    """Rotation matrix equivalent of the reference's (q^-1 v q) convention."""
    x, y, z, w = [float(v) for v in qv]
    # (q^-1 v q) is rotation by angle -2*acos(w) about axis (x,y,z) in the
    # standard (q v q^-1) convention; build it directly from sandwich products.
    def rot(v):
        return np.asarray(q.rotate(jnp.asarray(v, jnp.float32), jnp.asarray(qv)))
    return np.stack([rot([1.0, 0, 0]), rot([0, 1.0, 0]), rot([0, 0, 1.0])], axis=1)


def test_rotate_is_orthonormal(rng):
    v = rng.normal(size=(4,)).astype(np.float32)
    v /= np.linalg.norm(v)
    m = _rotmat_from_quat_conjugated(v)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(m) - 1.0) < 1e-4


def test_from_look_dir_reference_convention():
    """The reference rotates with (q^-1 v q) (`maths.rs:175-178`), which is
    rotation by MINUS the quaternion angle: the forward ray (0,0,1) maps to
    the look direction mirrored across the default axis (x negated for a
    yaw), and the conjugate maps it to the look direction exactly. Both are
    asserted so the quirk stays locked to reference behavior
    (`main.rs:740`: look (0.1, 0, 1))."""
    look = jnp.array([0.1, 0.0, 1.0], jnp.float32)
    look_n = np.asarray(look / jnp.linalg.norm(look))
    quat = q.from_look_dir(look)
    fwd = np.asarray(q.rotate(jnp.array([0.0, 0.0, 1.0], jnp.float32), quat))
    np.testing.assert_allclose(
        fwd, look_n * np.array([-1.0, 1.0, 1.0]), rtol=1e-5, atol=1e-6
    )
    fwd_conj = np.asarray(
        q.rotate(jnp.array([0.0, 0.0, 1.0], jnp.float32), q.conjugate(quat))
    )
    np.testing.assert_allclose(fwd_conj, look_n, rtol=1e-5, atol=1e-6)


def test_update_angle_matches_fresh_quaternion():
    """update_angle(q, theta) (`maths.rs:159-162`) must equal a quaternion
    with the same axis and half-angle theta."""
    look = jnp.array([0.3, 0.0, 1.0], jnp.float32)
    quat = np.asarray(q.from_look_dir(look))
    axis = quat[:3] / np.linalg.norm(quat[:3])
    theta = 0.7
    updated = np.asarray(q.update_angle(jnp.asarray(quat), jnp.float32(theta)))
    expected = np.concatenate([axis * np.sin(theta), [np.cos(theta)]])
    np.testing.assert_allclose(updated, expected.astype(np.float32), rtol=1e-5)
    np.testing.assert_allclose(
        float(q.half_theta_of(jnp.asarray(updated))), theta, rtol=1e-5
    )


def test_unit_sphere_uniform():
    key = jax.random.PRNGKey(0)
    v = np.asarray(sampling.unit_sphere(key, (4096,)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, rtol=1e-5)
    # Mean of uniform sphere points ~ 0 within 3 sigma (sigma ~ 1/sqrt(3N)).
    assert np.all(np.abs(v.mean(0)) < 3.0 / np.sqrt(3 * 4096))


def test_ray_jitter_bounds():
    key = jax.random.PRNGKey(1)
    j = np.asarray(sampling.ray_jitter(key, (1000,), 0.001))
    assert j.shape == (1000, 3)
    assert np.all(j[:, 2] == 0.0)
    assert np.all(np.abs(j[:, :2]) <= 0.001)


@pytest.mark.parametrize("shape", [(3,), (5, 3), (2, 4, 3)])
def test_batched_shapes(shape, rng):
    a = rng.normal(size=shape).astype(np.float32)
    assert vm.norm(a).shape == shape[:-1]
    assert vm.normalize(a).shape == shape


def test_morton_shared_interleave_known_values_and_dtypes():
    """ops/morton.py is the single interleave behind BOTH Morton orders
    (chunk-window sort, plane-tile clustering): known codes, and numpy
    uint64 vs jax uint32 agreement on 16-bit coordinates."""
    import jax.numpy as jnp
    import numpy as np

    from mirror_maze_tpu.ops.morton import morton2

    x = np.array([0, 1, 0, 3, 65535], dtype=np.uint64)
    y = np.array([0, 0, 1, 5, 65535], dtype=np.uint64)
    codes = morton2(x, y)
    assert codes.tolist() == [0, 1, 2, 0b100111, (1 << 32) - 1]

    jx = jnp.asarray(x, jnp.uint32)
    jy = jnp.asarray(y, jnp.uint32)
    jcodes = np.asarray(morton2(jx, jy)).astype(np.uint64)
    assert np.array_equal(jcodes, codes)


def test_from_look_dir_parallel_to_forward_is_identity():
    """A look direction exactly along the reference forward (0,0,1) has a
    zero rotation axis; from_look_dir must return the exact identity
    quaternion, not the NaN an unguarded normalize(0) produces (past
    bug: `--look 0,0,1` rendered black)."""
    from mirror_maze_tpu.ops import quat as quat_ops

    q = np.asarray(quat_ops.from_look_dir(jnp.float32([0.0, 0.0, 1.0])))
    assert np.array_equal(q, [0.0, 0.0, 0.0, 1.0])
    # Scaled parallel looks too.
    q2 = np.asarray(quat_ops.from_look_dir(jnp.float32([0.0, 0.0, 7.5])))
    assert np.array_equal(q2, [0.0, 0.0, 0.0, 1.0])
    # And the near-parallel case still matches the reference convention.
    q3 = np.asarray(quat_ops.from_look_dir(jnp.float32([0.1, 0.0, 1.0])))
    assert np.all(np.isfinite(q3)) and abs(q3[1]) > 0.01
