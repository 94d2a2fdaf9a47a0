"""The path tracer: fixed-shape masked bounce loop (pure-JAX reference path).

Reimplements the Metal megakernel's bounce loop (`shaders.metal:286-340`) as
a TPU-shaped wavefront: the reference's data-dependent trip count
(``for n in 0..bounce_limit + mirror_hits``, extended by every mirror hit)
becomes a static ``max_segments = bounce_limit + mirror_limit`` loop over
the whole ray front with per-ray liveness masks — the compiler-friendly
recast named in SURVEY.md section 7.

Shading semantics copied exactly from the reference:
- front-face test: side = -sign(dot(dir, normal)) (`shaders.metal:309-310`);
- diffuse surfaces AND mirror back-faces: accumulate
  emission.rgb * emission.a * throughput, multiply throughput by albedo,
  scatter along normal*side + random unit vector (`shaders.metal:311-323`);
- mirror front faces: count the hit; under the budget, add the flat
  0.005 * albedo tint (NOT modulated by throughput — `shaders.metal:327`)
  and reflect; at the budget the ray dies without scattering
  (`shaders.metal:331-334`);
- miss: sky term sky_color * lighting_factor^(n - mirror_hits), which the
  reference multiplies by 0.0 (`shaders.metal:337`); kept as a configurable
  sky_strength (default 0, bit-matching the reference).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import TracerConfig
from ..ops.sampling import unit_sphere
from ..ops.vecmath import dot, normalize, reflect
from .intersect import BIG, nearest_hit_brute
from .scenebuf import DeviceScene

NearestFn = Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]


def trace_paths(
    scene: DeviceScene,
    ori: jnp.ndarray,   # [R, 3]
    dirs: jnp.ndarray,  # [R, 3]
    key: jax.Array,
    cfg: TracerConfig,
    nearest_fn: NearestFn | None = None,
    seed_row: jnp.ndarray | None = None,  # [R] float32 in [0, 1)
) -> jnp.ndarray:
    """Trace one wavefront of rays; returns incoming light [R, 3].

    ``seed_row`` optionally mixes a per-ray value (e.g. a noise-texture
    sample, `shaders.metal:288-300`) into the scatter RNG stream — the
    same noise_rng contract as the pallas kernel's seed_row, so the
    spatially-correlated grain mechanism exists on every backend (the
    bit-level streams still differ: threefry here, PCG there)."""
    if nearest_fn is None:
        nearest_fn = lambda o, d: nearest_hit_brute(scene, o, d, cfg.t_min)

    n_rays = ori.shape[0]
    sky = jnp.asarray(cfg.sky_color, dtype=jnp.float32)
    ray_keys = None
    if seed_row is not None:
        # Key = base ⊕ ray-index ⊕ noise-sample. The ray index MUST be
        # folded in too (matching the pallas kernel's _pcg_init, which
        # seeds from the linear ray id before adding the noise offset):
        # keying on the noise value alone would give every ray sharing a
        # texel — in particular all spp samples of one pixel, and with an
        # 8-bit PNG whole swathes of the screen — bit-identical scatter
        # streams, collapsing the sample mean to ~1 effective sample.
        seed_ints = (seed_row * jnp.float32(1 << 24)).astype(jnp.int32)
        idx_ints = jnp.arange(n_rays, dtype=jnp.int32)
        ray_keys = jax.vmap(
            lambda i, s: jax.random.fold_in(jax.random.fold_in(key, i), s)
        )(idx_ints, seed_ints)

    n_planes = scene.num_planes
    n_sph = scene.num_spheres
    if n_sph:
        # Primitive-indexed property tables over planes ++ spheres
        # (nearest_fn reports sphere i as index n_planes + i). Loop
        # invariant; hoisted by XLA. Statically absent for sphere-free
        # scenes, whose traced program is unchanged.
        albedo_all = jnp.concatenate([scene.color, scene.sph_color], 0)
        em_all = jnp.concatenate([scene.emission, scene.sph_emission], 0)
        mir_all = jnp.concatenate([scene.is_mirror, scene.sph_is_mirror], 0)
    # Dielectrics (Scene.ior; see scene/builder.py): statically absent
    # when the scene has none (DeviceScene.ior/sph_ior are None), so
    # glass-free scenes — every generated maze — trace the identical
    # program (and RNG stream) as before the feature.
    # Procedural textures (Scene.tex_*): statically absent when the
    # scene is untextured (DeviceScene.tex is None), like the glass
    # stage below.
    has_tex = scene.tex is not None
    if has_tex:
        tex_all = (
            jnp.concatenate([scene.tex, scene.sph_tex], 0)
            if n_sph else scene.tex
        )

    has_glass = scene.ior is not None or scene.sph_ior is not None
    if has_glass:
        ior_p = (
            scene.ior if scene.ior is not None
            else jnp.zeros((n_planes,), jnp.float32)
        )
        if n_sph:
            ior_s = (
                scene.sph_ior if scene.sph_ior is not None
                else jnp.zeros((n_sph,), jnp.float32)
            )
            ior_all = jnp.concatenate([ior_p, ior_s], 0)
        else:
            ior_all = ior_p

    def body(it, st):
        o, d, thr, light, mh, dc, alive = st
        t, idx = nearest_fn(o, d)
        hit = alive & (t < BIG)

        if n_sph:
            albedo = albedo_all[idx]
            em = em_all[idx]
            mir = mir_all[idx]
            # Sphere normals are position-dependent: (hit - c) * 1/r,
            # the same arithmetic the pallas kernel applies after its
            # one-hot select. Gathers are clipped so each side reads a
            # valid row; the where picks the meaningful one.
            si = idx - n_planes
            is_s = si >= 0
            sc = scene.sph_center[jnp.clip(si, 0, n_sph - 1)]
            inv_r = scene.sph_inv_r[jnp.clip(si, 0, n_sph - 1)]
            hit_p = o + d * t[..., None]
            n = jnp.where(
                is_s[..., None],
                (hit_p - sc) * inv_r[..., None],
                scene.normal[jnp.minimum(idx, n_planes - 1)],
            )
        else:
            n = scene.normal[idx]
            albedo = scene.color[idx]
            em = scene.emission[idx]
            mir = scene.is_mirror[idx]
        if has_tex:
            # Checker albedo swap (mirrors the pallas kernel's texture
            # stage term-for-term; see Scene.tex_kind semantics).
            tx = tex_all[idx]                           # [R, 5]
            tk = tx[:, 0]
            tsc = tx[:, 1]
            c2 = tx[:, 2:5]
            hit_t = o + d * t[..., None]
            pidx = jnp.minimum(idx, n_planes - 1)
            s1t = dot(hit_t, scene.w1[pidx]) - scene.b1[pidx]
            s2t = dot(hit_t, scene.w2[pidx]) - scene.b2[pidx]
            f1 = jnp.floor(s1t * tsc) + jnp.floor(s2t * tsc)
            f2 = (jnp.floor(hit_t[..., 0] / tsc)
                  + jnp.floor(hit_t[..., 1] / tsc)
                  + jnp.floor(hit_t[..., 2] / tsc))
            f = jnp.where(tk > 1.5, f2, f1)
            odd = (f - 2.0 * jnp.floor(f * 0.5)) > 0.5
            use2 = (tk > 0.0) & odd
            albedo = jnp.where(use2[..., None], c2, albedo)

        side = -jnp.sign(dot(d, n))

        # Branch masks (`shaders.metal:311, 324`): diffuse material or any
        # back-face scatters diffusely; only mirror front-faces reflect.
        diffuse = hit & (~mir | (side == -1.0))
        mirror = hit & mir & (side != -1.0)

        if has_glass:
            # Dielectric interaction: Snell refraction with optional
            # Schlick-Fresnel reflection (TracerConfig.fresnel); counts
            # against the specular (mirror) budget; tints throughput by
            # albedo; neither emits nor diffuses. ior > 0 wins over
            # is_mirror (Scene.ior contract).
            glass = hit & (ior_all[idx] > 0.0)
            diffuse = diffuse & ~glass
            mirror = mirror & ~glass
            spec = mirror | glass
        else:
            spec = mirror

        mh_new = mh + spec.astype(jnp.int32)
        mirror_live = mirror & (mh_new < cfg.mirror_limit)
        advance = diffuse | mirror_live
        if has_glass:
            glass_live = glass & (mh_new < cfg.mirror_limit)
            advance = advance | glass_live

        # Diffuse scatter (`shaders.metal:311-323`).
        if ray_keys is None:
            rnd = unit_sphere(jax.random.fold_in(key, it), (n_rays,))
        else:
            it_keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                ray_keys, it
            )
            rnd = jax.vmap(lambda k: unit_sphere(k, ()))(it_keys)
        scat = normalize(rnd + n * side[..., None])
        light = jnp.where(
            diffuse[..., None], light + em[..., :3] * em[..., 3:4] * thr, light
        )
        thr = jnp.where(diffuse[..., None], thr * albedo, thr)

        # Mirror reflect + flat tint (`shaders.metal:324-330`).
        light = jnp.where(
            mirror_live[..., None], light + albedo * cfg.mirror_tint, light
        )
        refl = normalize(reflect(d, n))

        if has_glass:
            # Snell refraction on the UNIT direction (d is near-unit —
            # camera jitter 0.001 on segment 0, exactly unit after —
            # but eta-scaling demands a true unit vector). n_eff faces
            # against the ray; entering (side > 0, ray opposes the
            # stored normal) refracts at 1/ior, exiting at ior. The
            # arithmetic below is mirrored term-for-term by the pallas
            # kernel's glass stage (pallas_tracer.py segment()).
            ior_r = ior_all[idx]
            dhat = normalize(d)
            n_eff = n * side[..., None]
            cos_i = jnp.clip(-dot(dhat, n_eff), 0.0, 1.0)
            eta = jnp.where(side > 0.0, 1.0 / jnp.maximum(ior_r, 1e-6),
                            ior_r)
            sin2t = eta * eta * (1.0 - cos_i * cos_i)
            tir = sin2t > 1.0
            if cfg.fresnel:
                # Schlick's approximation; total internal reflection
                # forces reflect_p = 1.
                r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
                f5 = (1.0 - cos_i) ** 5
                reflect_p = jnp.where(tir, 1.0, r0 + (1.0 - r0) * f5)
                if ray_keys is None:
                    u3 = jax.random.uniform(
                        jax.random.fold_in(jax.random.fold_in(key, it), 1),
                        (n_rays,),
                    )
                else:
                    u3 = jax.vmap(
                        lambda k: jax.random.uniform(
                            jax.random.fold_in(k, 1), ()
                        )
                    )(it_keys)
                do_refl = u3 < reflect_p
            else:
                # Deterministic seam (cross-backend exactness tests):
                # refract unless total internal reflection.
                do_refl = tir
            refr = (
                eta[..., None] * dhat
                + (eta * cos_i
                   - jnp.sqrt(jnp.maximum(1.0 - sin2t, 0.0)))[..., None]
                * n_eff
            )
            grefl = reflect(dhat, n)
            gdir = normalize(jnp.where(do_refl[..., None], grefl, refr))
            thr = jnp.where(glass_live[..., None], thr * albedo, thr)

        # Miss: sky term (`shaders.metal:336-339`), default strength 0.
        miss = alive & ~hit
        sky_term = (
            sky
            * (cfg.lighting_factor ** (it - mh).astype(jnp.float32))[..., None]
            * cfg.sky_strength
        )
        light = jnp.where(miss[..., None], light + sky_term, light)

        o = jnp.where(advance[..., None], o + d * t[..., None], o)
        d = jnp.where(
            diffuse[..., None], scat, jnp.where(mirror_live[..., None], refl, d)
        )
        if has_glass:
            d = jnp.where(glass_live[..., None], gdir, d)

        dc_new = dc + diffuse.astype(jnp.int32)
        # Loop-liveness recast of `n < bounce_limit + mirror_hits`
        # (`shaders.metal:306`): the non-mirror segment budget.
        alive = alive & ~miss & ~(spec & (mh_new >= cfg.mirror_limit)) & (dc_new < cfg.bounce_limit)
        return o, d, thr, light, mh_new, dc_new, alive

    init = (
        ori,
        dirs,
        jnp.ones((n_rays, 3), dtype=jnp.float32),    # throughput ("color")
        jnp.zeros((n_rays, 3), dtype=jnp.float32),   # incoming light
        jnp.zeros((n_rays,), dtype=jnp.int32),       # mirror_hits
        jnp.zeros((n_rays,), dtype=jnp.int32),       # diffuse/miss segments
        jnp.ones((n_rays,), dtype=bool),             # alive
    )
    _, _, _, light, _, _, _ = jax.lax.fori_loop(0, cfg.max_segments, body, init)
    return light


def tone_map(light: jnp.ndarray) -> jnp.ndarray:
    """Per-sample gamma before averaging (`shaders.metal:344`):
    sqrt(max(light, 0)), applied to each sample, then the mean."""
    return jnp.sqrt(jnp.maximum(light, 0.0))
