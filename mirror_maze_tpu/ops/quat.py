"""Quaternion ops, layout (x, y, z, w), batched over leading axes.

TPU-native replacement for the reference's CPU quaternion code
(`maths.rs:139-178`) and its Metal twin (`shaders.metal:159-172`). The
rotation convention is copied exactly: the reference rotates a vector v by
computing ``(q^-1 * v * q).xyz`` (see quat_mult, `maths.rs:175-178`), where
``*`` is the Hamilton product (their ``quat_dot``, `maths.rs:169-173`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import cross, dot, norm, normalize


def hamilton(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (x, y, z, w) layout (`maths.rs:169-173`)."""
    v1, w1 = q1[..., :3], q1[..., 3]
    v2, w2 = q2[..., :3], q2[..., 3]
    s = w1 * w2 - dot(v1, v2)
    v = cross(v1, v2) + w1[..., None] * v2 + w2[..., None] * v1
    return jnp.concatenate([v, s[..., None]], axis=-1)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (`maths.rs:165-167`)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def rotate(vec: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate a 3-vector by quaternion q using the reference convention
    ``(q^-1 * v * q).xyz`` (`maths.rs:175-178`, `shaders.metal:169-172`)."""
    v4 = jnp.concatenate([vec, jnp.zeros_like(vec[..., :1])], axis=-1)
    r = hamilton(hamilton(conjugate(q), v4), q)
    return r[..., :3]


def from_look_dir(look: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from a camera look direction (`maths.rs:139-156`).

    Rotation from the default forward (0,0,1) toward the (normalized) look
    direction. The reference computes the rotation axis via a cross product
    and the half angle as ``asin(|axis|) / 2`` — including its quirk of
    halving asin's result rather than the full angle; replicated verbatim so
    camera orientation matches.
    """
    default = jnp.array([0.0, 0.0, 1.0], dtype=look.dtype)
    look_n = normalize(look)
    axis = cross(jnp.broadcast_to(default, look_n.shape), look_n)
    # A look exactly along the reference forward has a zero rotation
    # axis; plain normalize() would emit a NaN quaternion (0/0) that
    # poisons every ray. Guard the denominator so the parallel case
    # yields the exact identity quaternion instead (the step's
    # finite-guard already recovers yaw from an axis-less quat).
    mag = norm(axis)
    axis_n = axis / jnp.where(mag > 0, mag, 1.0)[..., None]
    half_theta = jnp.arcsin(mag) / 2.0
    s = jnp.sin(half_theta)[..., None]
    c = jnp.cos(half_theta)[..., None]
    return jnp.concatenate([axis_n * s, c], axis=-1)


def aim(look: jnp.ndarray) -> jnp.ndarray:
    """Exact roll-free look-at quaternion (extension; no reference twin).

    `from_look_dir` replicates the reference's asin-based construction
    (`maths.rs:139-156`), which folds directions beyond 90 degrees back
    toward the forward axis — unusable for a 360-degree camera orbit.
    This builds the exact rotation instead: pitch about local x to the
    look's elevation, then yaw about world y to its azimuth (hamilton
    composes left-to-right under the reference's ``q^-1 v q`` rotate
    convention). ``rotate((0,0,1), aim(v)) == normalize(v)`` for every v,
    and the camera right axis stays horizontal (no roll). Degenerate
    straight-up/down looks keep a well-defined (zero) azimuth, and a
    ZERO look vector yields the identity quaternion rather than NaN
    (e.g. a waypoint path holding position via duplicate points).
    """
    mag = norm(look)[..., None]
    look_n = jnp.where(
        mag > 0,
        look / jnp.where(mag > 0, mag, 1.0),
        jnp.zeros_like(look).at[..., 2].set(1.0),
    )
    lx = look_n[..., 0]
    ly = look_n[..., 1]
    lz = look_n[..., 2]
    yaw = jnp.arctan2(-lx, lz)
    pitch = jnp.arcsin(jnp.clip(ly, -1.0, 1.0))
    zeros = jnp.zeros_like(yaw)
    q_pitch = jnp.stack(
        [jnp.sin(pitch / 2), zeros, zeros, jnp.cos(pitch / 2)], axis=-1
    )
    q_yaw = jnp.stack(
        [zeros, jnp.sin(yaw / 2), zeros, jnp.cos(yaw / 2)], axis=-1
    )
    return hamilton(q_pitch, q_yaw)


def update_angle(q: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Re-aim an existing yaw quaternion at a new half-angle theta
    (`maths.rs:159-162`). Keeps the rotation axis, changes the angle.

    Numerical deviation from the reference (deliberate): the reference
    rescales the vector part by sin(theta)/sin(acos(w)), which is
    ill-conditioned near w = +-1 — in float32, cos(theta) rounds to exactly
    1.0 for theta < ~3.4e-4 while xyz != 0, so the NEXT update divides by
    sin(acos(1)) = 0 and produces an INF quaternion that slips past the
    reference's NaN-only guard (`main.rs:828-844`) and catapults the camera
    out of the world (movement scales with |q|^2). For a unit quaternion
    sin(acos(w)) == |xyz|, so we use |xyz| directly: algebraically
    identical, drift-free in norm, and only degenerate when the quaternion
    genuinely has no axis (caught by the step's finite-guard)."""
    xyz = q[..., :3]
    mag = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    ratio = jnp.sin(theta) / mag
    return jnp.concatenate(
        [xyz * ratio[..., None], jnp.cos(theta)[..., None]], axis=-1
    )


def half_theta_of(q: jnp.ndarray) -> jnp.ndarray:
    """The yaw half-angle tracked by the reference host loop (`main.rs:741`)."""
    return jnp.arccos(q[..., 3])
