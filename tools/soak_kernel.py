"""Kernel exactness soak (PERF.md "Kernel exactness soak"): pallas vs
the jnp reference tracer over many random quad-soup scenes (every odd
seed also carries a random SPHERE group — the kernel's mode-3 path —
every third seed converts a random subset of its plane rows to
TRIANGLES, Scene.kind == 3 — the kernel's mode-4 barycentric path —
every fifth seed makes a random subset of planes/spheres GLASS,
Scene.ior > 0 — the kernel's mode-5/6/7 dielectric groups, soaked on
the deterministic fresnel=False seam — and every seed ending in 2 or 7
TEXTURES a random subset, Scene.tex_kind > 0 — the doubled
split-precision property block).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python tools/soak_kernel.py \
        [n_scenes] [--tpu]

Default (CPU): the exact TPU-semantics interpreter — agreement gate is
EXACT (1e-4 absolute per-ray luminance, >=99% of rays per scene; the
known slack class is grazing-edge/nearest-t ties).

--tpu: the same generator's scenes on REAL hardware (Mosaic), compared
against the jnp tracer computed ON THE CPU BACKEND of the same process
(the exact reference — the jnp tracer run on the TPU drifts itself:
XLA-TPU matmuls truncate f32 inputs to bf16). Hardware residuals, both
measured (PERF.md "hardware numerics on arbitrary scenes"):
- value error ~2^-17 relative on selected properties (the
  split-precision one-hot select; before it, plain f32 props returned
  bf16(property) — a systematic ~1e-3..1e-2 luminance error);
- 0-2 per-mille of rays take a DIFFERENT (valid) path: the hit-test
  matmul's bf16-truncated geometry flips accept decisions whose margin
  is below ~2^-9 relative in t, or below ~2^-9 * |x.w| absolutely in
  the edge coordinates. Generated mazes sit far from both margins;
  random soups are built to crowd them.
Gate: >=97% of rays within 1e-3, per scene. rows_per_block draws from
{8, 16} — hardware requires multiples of 8 (wide (8, B/8) ray-state
layout). 1024 rays/scene (one hardware block — padding makes fewer
free). Each scene is a fresh compile (~4 s + tunnel latency over the
axon link), so hardware soaks default to fewer scenes.
"""
import sys

argv = [a for a in sys.argv[1:]]
USE_TPU = "--tpu" in argv
if USE_TPU:
    argv.remove("--tpu")

import jax

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mmx_jax_cache")

import jax.numpy as jnp
import numpy as np
from mirror_maze_tpu.config import TracerConfig
from mirror_maze_tpu.render import upload_scene
from mirror_maze_tpu.render.tracer import trace_paths
from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
from mirror_maze_tpu.scene.builder import Scene

KEY = jax.random.PRNGKey(0)
fails = []
N = int(argv[0]) if argv else (12 if USE_TPU else 40)
TOL = 1e-3 if USE_TPU else 1e-4
GATE = 0.97 if USE_TPU else 0.99
ROWS = [8, 16] if USE_TPU else [1, 2, 4]
NR = 1024 if USE_TPU else 130
CPU = jax.devices("cpu")[0] if USE_TPU else None
for seed in range(N):
    r = np.random.default_rng(1000 + seed)
    n = int(r.integers(15, 300))
    origin = r.uniform(-20, 20, (n, 3))
    v = r.normal(size=(n, 3)) * r.uniform(0.5, 4)
    u = r.normal(size=(n, 3)) * r.uniform(0.5, 4)
    if n > 8:
        v[:: max(7, n // 4)] = 0.0
        u[3] = v[3] * r.uniform(0.5, 3)
    em = np.concatenate(
        [r.uniform(0, 1, (n, 3)),
         (r.random((n, 1)) < 0.4) * r.uniform(0, 3, (n, 1))], axis=1)
    # Half the scenes carry a random sphere group (the pallas mode-3
    # path, incl. multi-tile once s > PLANE_TILE) — soaked with the
    # same gates as the quads.
    s = int(r.integers(1, 160)) if seed % 2 else 0
    sph = dict(
        sph_center=r.uniform(-20, 20, (s, 3)).astype(np.float32),
        sph_radius=r.uniform(0.3, 2.0, s).astype(np.float32),
        sph_color=r.uniform(0, 1, (s, 3)).astype(np.float32),
        sph_is_mirror=r.random(s) < 0.3,
        sph_emission=np.concatenate(
            [r.uniform(0, 1, (s, 3)),
             (r.random((s, 1)) < 0.4) * r.uniform(0, 3, (s, 1))],
            axis=1).astype(np.float32),
    ) if s else {}
    # Every third seed turns a random subset of plane rows into
    # TRIANGLES (kind 3, the pallas mode-4 barycentric group) — soups
    # then mix mode-0 quads and mode-4 triangles in one kernel.
    kind = np.zeros(n, np.uint8)
    if seed % 3 == 0:
        kind[r.random(n) < float(r.uniform(0.2, 0.8))] = 3
    # Every seed ending in 4 or 9 makes a random subset of its planes
    # AND spheres GLASS (the pallas mode-5/6/7 dielectric groups) —
    # traced with fresnel=False, the deterministic refraction seam, so
    # the exactness gates still apply through multi-interface paths.
    ior = np.zeros(n, np.float32)
    # Seeds ending in 7 are BOTH glass and textured, covering the
    # combined path (glass tint through a checker albedo, the ior row
    # alongside the doubled property block).
    glass_seed = seed % 5 == 4 or seed % 10 == 7
    if glass_seed:
        ior[r.random(n) < 0.4] = r.uniform(1.1, 2.0)
        if s:
            sph["sph_ior"] = np.where(
                r.random(s) < 0.5, r.uniform(1.1, 2.0, s), 0.0
            ).astype(np.float32)
    # Every seed ending in 2 or 7 TEXTURES a random subset (UV/world
    # checkers on planes, world checkers on spheres — the doubled
    # split-precision property block). Textures draw no RNG, so the
    # deterministic gates apply unchanged.
    tex = {}
    if seed % 5 == 2 or seed % 10 == 7:
        tex = dict(
            tex_kind=r.integers(0, 3, n).astype(np.uint8),
            tex_scale=r.uniform(0.5, 3.0, n).astype(np.float32),
            tex_color2=r.uniform(0, 1, (n, 3)).astype(np.float32),
        )
        if s:
            tex.update(
                sph_tex_kind=(2 * (r.random(s) < 0.5)).astype(np.uint8),
                sph_tex_scale=r.uniform(0.5, 3.0, s).astype(np.float32),
                sph_tex_color2=r.uniform(0, 1, (s, 3)).astype(np.float32),
            )
    scene = Scene(
        origin=origin.astype(np.float32), v=v.astype(np.float32),
        u=u.astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        is_mirror=r.random(n) < float(r.uniform(0, 0.5)),
        emission=em.astype(np.float32), grid=np.zeros((1, 1), np.uint8),
        kind=kind, ior=ior,
        **sph, **tex)
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=int(r.integers(1, 4)),
                       fresnel=False)
    rr = np.random.default_rng(seed)
    o = jnp.asarray(rr.uniform(-25, 25, (NR, 3)).astype(np.float32))
    d = rr.normal(size=(NR, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    anchor = jnp.asarray(rr.uniform(-5, 5, (3,)).astype(np.float32))
    rows = int(r.choice(ROWS))
    if USE_TPU:
        dev_c = jax.device_put(dev, CPU)
        with jax.default_device(CPU):
            lj = np.asarray(trace_paths(
                dev_c, jax.device_put(o, CPU), jax.device_put(d, CPU),
                jax.device_put(KEY, CPU), cfg))
    else:
        lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(seed), cfg, rows_per_block=rows,
        tables=dev.mxu_tables, anchor=anchor))
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = (per_ray < TOL).mean()
    status = "OK" if agree >= GATE else "FAIL"
    if status == "FAIL":
        fails.append((seed, n, rows, float(agree)))
    print(f"seed {seed:2d} n={n:3d} s={s:3d} rows={rows:2d} "
          f"agree={agree:.4f} max={per_ray.max():.2e} {status}", flush=True)
print(f"backend={jax.default_backend()} rays={NR} tol={TOL} gate={GATE} "
      f"FAILURES:", fails)
