"""Tracer semantics tests against the Metal kernel's shading rules
(`shaders.metal:286-340`): emission pickup, throughput, mirror tint and
budget, back-face handling, bounce budget, and tone mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirror_maze_tpu.config import TracerConfig
from mirror_maze_tpu.render.scenebuf import upload_scene
from mirror_maze_tpu.render.tracer import tone_map, trace_paths
from mirror_maze_tpu.scene.builder import Scene


def _scene(planes):
    """planes: list of dicts(origin, v, u, color, mirror, emission)."""
    return upload_scene(Scene(
        origin=np.array([p["origin"] for p in planes], np.float32),
        v=np.array([p["v"] for p in planes], np.float32),
        u=np.array([p["u"] for p in planes], np.float32),
        color=np.array([p["color"] for p in planes], np.float32),
        is_mirror=np.array([p.get("mirror", False) for p in planes], bool),
        emission=np.array([p.get("emission", [0, 0, 0, 0]) for p in planes],
                          np.float32),
        grid=np.zeros((1, 1), np.uint8),
    ))


KEY = jax.random.PRNGKey(0)


def _trace_one(dev, o, d, cfg):
    light = trace_paths(
        dev, jnp.array([o], jnp.float32), jnp.array([d], jnp.float32), KEY, cfg
    )
    return np.asarray(light)[0]


def test_direct_emissive_hit():
    """First hit on an emissive diffuse plane adds emission.rgb * strength
    (throughput 1), regardless of what happens after."""
    dev = _scene([dict(origin=[-5, -5, 5], v=[10, 0, 0], u=[0, 10, 0],
                       color=[0.0, 0.0, 0.0],
                       emission=[1.0, 0.8, 0.3, 2.0])])
    cfg = TracerConfig(bounce_limit=1, mirror_limit=1)
    light = _trace_one(dev, [0, 0, 0], [0, 0, 1], cfg)
    np.testing.assert_allclose(light, [2.0, 1.6, 0.6], rtol=1e-5)


def test_throughput_attenuates_second_emitter():
    """Diffuse wall (albedo a) then guaranteed second hit on a surrounding
    emissive sphere-substitute: light = a * em (geometry forces the second
    hit: the wall sits inside a huge emissive box face)."""
    dev = _scene([
        dict(origin=[-0.5, -0.5, 2], v=[1, 0, 0], u=[0, 1, 0],
             color=[0.5, 0.25, 1.0]),
        # big emissive plane behind the ray origin, facing everything
        dict(origin=[-500, -500, -10], v=[1000, 0, 0], u=[0, 1000, 0],
             color=[0, 0, 0], emission=[1.0, 1.0, 1.0, 3.0]),
    ])
    cfg = TracerConfig(bounce_limit=2, mirror_limit=1)
    # average many samples: scattered direction is random but any direction
    # from the wall either re-hits the wall (black, then dies) or reaches
    # the emissive backplane. Use many rays for a statistical check.
    n = 512
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    light = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    # every path that reached the plane contributes exactly albedo*3
    reached = light[:, 2] > 0
    assert reached.mean() > 0.3
    expected = np.tile(np.array([0.5, 0.25, 1.0]) * 3.0, (int(reached.sum()), 1))
    np.testing.assert_allclose(light[reached], expected, rtol=1e-4)


def test_mirror_reflection_and_tint():
    """Mirror front-face: reflect + flat 0.005*albedo tint, NOT scaled by
    throughput (`shaders.metal:327`), then hit an emitter via the bounce."""
    dev = _scene([
        # mirror at z=5, normal cross(v,u): v=(1,0,0) u=(0,1,0) -> n=(0,0,-1)?
        # cross(v,u) = (1,0,0)x(0,1,0) = (0,0,1). dot(d,n)=1 -> side=-1:
        # back-face! Swap u,v so the front faces the incoming ray.
        dict(origin=[-5, -5, 5], v=[0, 10, 0], u=[10, 0, 0],
             color=[0.8, 0.9, 1.0], mirror=True),
        # emitter at z=-5 behind the origin; mirror sends the ray back.
        dict(origin=[-5, -5, -5], v=[10, 0, 0], u=[0, 10, 0],
             color=[0, 0, 0], emission=[2.0, 2.0, 2.0, 1.0]),
    ])
    cfg = TracerConfig(bounce_limit=1, mirror_limit=5)
    light = _trace_one(dev, [0, 0, 0], [0, 0, 1], cfg)
    expected = np.array([0.8, 0.9, 1.0]) * 0.005 + np.array([2.0, 2.0, 2.0])
    np.testing.assert_allclose(light, expected, rtol=1e-5)


def test_mirror_backface_scatters_diffusely():
    """Mirror BACK faces shade as diffuse (`shaders.metal:311`:
    materials false OR beam_side == -1)."""
    dev = _scene([
        dict(origin=[-5, -5, 5], v=[10, 0, 0], u=[0, 10, 0],
             color=[0.0, 0.0, 0.0], mirror=True,
             emission=[1.0, 1.0, 1.0, 4.0]),
    ])
    # cross(v,u) = +z; ray dir +z has dot>0 -> side=-1 -> back-face diffuse:
    # emission picked up even though it's a mirror.
    cfg = TracerConfig(bounce_limit=1, mirror_limit=5)
    light = _trace_one(dev, [0, 0, 0], [0, 0, 1], cfg)
    np.testing.assert_allclose(light, [4.0, 4.0, 4.0], rtol=1e-5)


def test_mirror_limit_kills_ray():
    """Two parallel mirrors facing each other: the ray dies when
    mirror_hits reaches mirror_limit WITHOUT picking up the final tint
    (`shaders.metal:331-334`)."""
    dev = _scene([
        dict(origin=[-5, -5, 5], v=[0, 10, 0], u=[10, 0, 0],
             color=[1.0, 0.0, 0.0], mirror=True),   # faces -z
        dict(origin=[-5, -5, -5], v=[10, 0, 0], u=[0, 10, 0],
             color=[1.0, 0.0, 0.0], mirror=True),   # faces +z
    ])
    for limit in (1, 3, 7):
        cfg = TracerConfig(bounce_limit=1, mirror_limit=limit)
        light = _trace_one(dev, [0, 0, 0], [0, 0, 1], cfg)
        # tint added on each mirror hit except the limit-th.
        np.testing.assert_allclose(
            light, [0.005 * (limit - 1), 0, 0], rtol=1e-4, atol=1e-7
        )


def test_miss_is_black_by_default():
    dev = _scene([dict(origin=[100, 100, 100], v=[1, 0, 0], u=[0, 1, 0],
                       color=[1, 1, 1])])
    cfg = TracerConfig()
    light = _trace_one(dev, [0, 0, 0], [0, 0, -1], cfg)
    np.testing.assert_allclose(light, [0, 0, 0])


def test_sky_strength_configurable():
    """With sky_strength=1 a primary miss adds sky_color * factor^0."""
    dev = _scene([dict(origin=[100, 100, 100], v=[1, 0, 0], u=[0, 1, 0],
                       color=[1, 1, 1])])
    cfg = TracerConfig(sky_strength=1.0)
    light = _trace_one(dev, [0, 0, 0], [0, 0, -1], cfg)
    np.testing.assert_allclose(light, [0.3, 0.6, 0.8], rtol=1e-5)


def test_bounce_budget_counts_diffuse_only():
    """Mirror hits extend the path (`shaders.metal:306`): with
    bounce_limit=1 but mirror_limit large, a mirror chain still reaches an
    emitter; with mirror_limit=1 it cannot."""
    dev = _scene([
        dict(origin=[-5, -5, 5], v=[0, 10, 0], u=[10, 0, 0],
             color=[0, 0, 0], mirror=True),
        dict(origin=[-5, -5, -5], v=[10, 0, 0], u=[0, 10, 0],
             color=[0, 0, 0], emission=[1, 1, 1, 1.0]),
    ])
    lit = _trace_one(dev, [0, 0, 0.0], [0, 0, 1],
                     TracerConfig(bounce_limit=1, mirror_limit=5))
    dark = _trace_one(dev, [0, 0, 0.0], [0, 0, 1],
                      TracerConfig(bounce_limit=1, mirror_limit=1))
    assert lit[0] == pytest.approx(1.0, rel=1e-5)
    assert dark[0] == pytest.approx(0.0, abs=1e-7)


def test_tone_map():
    x = jnp.array([[4.0, -1.0, 0.25]])
    np.testing.assert_allclose(np.asarray(tone_map(x)), [[2.0, 0.0, 0.5]])
