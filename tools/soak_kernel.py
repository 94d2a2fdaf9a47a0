"""Kernel exactness soak (PERF.md "Kernel exactness soak"): pallas vs
jnp over many random scenes on the exact TPU-semantics interpreter.
Run: PYTHONPATH=/root/repo python tools/soak_kernel.py [n_scenes]
One-off soak: pallas-vs-jnp exact agreement over many random scenes."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from mirror_maze_tpu.config import TracerConfig
from mirror_maze_tpu.render import upload_scene
from mirror_maze_tpu.render.tracer import trace_paths
from mirror_maze_tpu.render.pallas_tracer import trace_paths_pallas
from mirror_maze_tpu.scene.builder import Scene

KEY = jax.random.PRNGKey(0)
fails = []
import sys
N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
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
    scene = Scene(
        origin=origin.astype(np.float32), v=v.astype(np.float32),
        u=u.astype(np.float32),
        color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        is_mirror=r.random(n) < float(r.uniform(0, 0.5)),
        emission=em.astype(np.float32), grid=np.zeros((1, 1), np.uint8))
    dev = upload_scene(scene)
    cfg = TracerConfig(bounce_limit=1, mirror_limit=int(r.integers(1, 4)))
    rr = np.random.default_rng(seed)
    nr = 130
    o = jnp.asarray(rr.uniform(-25, 25, (nr, 3)).astype(np.float32))
    d = rr.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    anchor = jnp.asarray(rr.uniform(-5, 5, (3,)).astype(np.float32))
    rows = int(r.choice([1, 2, 4]))
    lj = np.asarray(trace_paths(dev, o, d, KEY, cfg))
    lp = np.asarray(trace_paths_pallas(
        dev.plane_table, o, d, jnp.int32(seed), cfg, rows_per_block=rows,
        tables=dev.mxu_tables, anchor=anchor))
    per_ray = np.abs(lj - lp).max(axis=1)
    agree = (per_ray < 1e-4).mean()
    status = "OK" if agree >= 0.99 else "FAIL"
    if status == "FAIL":
        fails.append((seed, n, rows, float(agree)))
    print(f"seed {seed:2d} n={n:3d} rows={rows} agree={agree:.4f} {status}",
          flush=True)
print("FAILURES:", fails)
