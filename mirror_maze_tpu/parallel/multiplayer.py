"""Multiplayer: one process per player, positions exchanged over DCN.

The reference SHIPS the vestige of this feature without building it:
`Cargo.toml` declares `local-ip-address 0.6.3` which no code imports
(SURVEY.md section 2, "never imported — vestige of planned
multiplayer"). Here it is, the TPU-native way: each player is a
`jax.distributed` process stepping its OWN single-chip engine in the
shared deterministic world (same seed -> bit-identical geometry on
every process, no scene traffic at all); the only wire traffic is a
[3]-vector position `all_gather` per frame over the global mesh
(DCN/ICI — the `local-ip-address` role, done with collectives instead
of sockets). Remote players render as colored sphere avatars: sphere
centers are ARRAYS of the jitted step's scene argument, so moving them
per frame recompiles nothing.

Scope (a complete, tested capability — not a stub):
- avatars ride the jnp sphere intersector (`render/intersect.py
  sphere_ts`), so the engine must run `intersector="brute"` or
  `"exact"` — the pallas kernel bakes sphere MXU operands at upload
  (scenebuf.py) and would render avatars at their parked positions;
  `make_multiplayer_engine` enforces this.
- avatars do not collide (players pass through each other): the
  collision fold uses the leaf boxes captured at upload, which hold the
  avatars' far-outside park positions by construction.

Driven end-to-end by the 2-process DCN test
(tests/test_multihost.py::test_two_player_multiplayer) and the
`examples/multiplayer_demo.py` launcher.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..render.scenebuf import DeviceScene

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

# Park position for avatar spheres before the first exchange: far
# outside any closed world, so an un-updated avatar can never shadow
# real geometry (and its collision leaf box never triggers).
PARK = 1.0e6

# Default per-player avatar albedos (cycled).
PLAYER_COLORS = (
    (0.9, 0.25, 0.2),
    (0.2, 0.55, 0.9),
    (0.3, 0.85, 0.35),
    (0.95, 0.8, 0.25),
)


def avatar_scene(scene, n_players: int, me: int, radius: float = 1.0,
                 colors=PLAYER_COLORS):
    """Append n_players - 1 avatar spheres (every player but ``me``) to a
    host Scene, parked at PARK. Avatar i keeps player i's color on every
    process, so "the red player" is red in everyone's view."""
    others = [i for i in range(n_players) if i != me]
    a = len(others)
    if a == 0:
        return scene, []
    centers = np.full((a, 3), PARK, np.float32)
    col = np.array([colors[i % len(colors)] for i in others], np.float32)
    s = scene.num_spheres

    def cat(old, new):
        return np.concatenate([np.asarray(old), new], axis=0)

    return dataclasses.replace(
        scene,
        sph_center=cat(scene.sph_center, centers),
        sph_radius=cat(scene.sph_radius, np.full(a, radius, np.float32)),
        sph_color=cat(scene.sph_color, col),
        sph_is_mirror=cat(scene.sph_is_mirror, np.zeros(a, bool)),
        sph_emission=cat(scene.sph_emission, np.zeros((a, 4), np.float32)),
        sph_ior=cat(scene.sph_ior, np.zeros(a, np.float32)),
        sph_tex_kind=cat(scene.sph_tex_kind, np.zeros(a, np.uint8)),
        sph_tex_scale=cat(scene.sph_tex_scale, np.ones(a, np.float32)),
        sph_tex_color2=cat(scene.sph_tex_color2, np.zeros((a, 3), np.float32)),
    ), list(range(s, s + a))


def update_avatars(dev: DeviceScene, slots, centers: jnp.ndarray) -> DeviceScene:
    """Move the avatar spheres at ``slots`` to ``centers`` [A, 3].

    Updates the two center-derived fields the jnp sphere test consumes
    (sph_center and sph_c2r2 = |c|^2 - r^2); radius/inv_r/color are
    static. Pure array surgery on the scene PYTREE ARGUMENT — the same
    jitted step serves every frame.
    """
    if not slots:
        return dev
    idx = jnp.asarray(slots, jnp.int32)
    new_center = dev.sph_center.at[idx].set(centers)
    r = dev.sph_radius[idx]
    c2r2 = jnp.sum(centers * centers, axis=-1) - r * r
    return dev._replace(
        sph_center=new_center,
        sph_c2r2=dev.sph_c2r2.at[idx].set(c2r2),
    )


def make_position_exchange(mesh: Mesh):
    """Jitted all_gather of every player's [3] position over the global
    ``("player",)`` mesh: exchange(global [P, 3] with my row local)
    -> replicated [P, 3]. The per-frame wire traffic of the whole
    multiplayer feature."""
    gathered = jax.jit(
        shard_map(
            lambda c: jax.lax.all_gather(c[0], "player"),
            mesh=mesh, in_specs=P("player"), out_specs=P(),
            check_vma=False,
        )
    )

    def exchange(my_center) -> np.ndarray:
        mine = jnp.asarray(my_center, jnp.float32)[None]
        glob = jax.make_array_from_single_device_arrays(
            (mesh.size, 3),
            NamedSharding(mesh, P("player")),
            [jax.device_put(mine, jax.local_devices()[0])],
        )
        out = gathered(glob)
        return np.asarray(out.addressable_shards[0].data)

    return exchange


def make_multiplayer_engine(cfg: EngineConfig, mesh: Mesh, me: int,
                            scene=None, radius: float = 1.0):
    """Build (dev_scene, init_fn, step_fn) for one player process.

    step_fn(state, inputs) -> (state, frame): exchanges positions over
    the mesh, moves the remote avatars, and runs the standard donated
    single-chip step with the updated scene as an ARGUMENT. Camera
    semantics, progressive refresh, and the present pipeline are the
    single-chip engine's, untouched — multiplayer adds one [P, 3]
    collective and one sphere-row update per frame.
    """
    from ..render import upload_scene
    from ..runtime.state import init_state
    from ..runtime.step import derive_traversal_bounds, make_step_fn
    from ..scene import build_scene

    if cfg.intersector == "pallas":
        raise ValueError(
            "multiplayer avatars need intersector='brute' or 'exact': the "
            "pallas kernel bakes sphere MXU operands at upload, so moved "
            "avatars would render at their parked positions"
        )
    n_players = mesh.size
    host_scene = scene if scene is not None else build_scene(cfg.maze)
    host_scene, slots = avatar_scene(host_scene, n_players, me, radius)
    dev = upload_scene(host_scene)
    exchange = make_position_exchange(mesh)
    md, ml = derive_traversal_bounds(dev, cfg, None, None)
    step_pure = make_step_fn(cfg, md, ml)
    step_jit = jax.jit(step_pure, donate_argnums=(1,))
    others = [i for i in range(n_players) if i != me]

    def init_fn(seed: int = 0):
        return init_state(cfg, seed)

    def step_fn(state, inputs):
        positions = exchange(state.cam_center)       # [P, 3] replicated
        dev2 = update_avatars(dev, slots, jnp.asarray(positions[others]))
        return step_jit(dev2, state, inputs)

    return dev, init_fn, step_fn
