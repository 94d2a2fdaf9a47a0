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
- avatars run on EVERY backend, including the flagship pallas kernel:
  the jnp intersectors read `sph_center`/`sph_c2r2` directly, and for
  `intersector="pallas"` the step re-derives the kernel's sphere MXU
  operand groups from those same arrays IN-JIT each frame
  (scenebuf.make_sphere_refresh — upload-time packing alone would pin
  avatars at their park positions), so moved centers reach the kernel
  with no recompile and no host repack.
- avatars do not collide (players pass through each other): the
  collision fold uses the leaf boxes captured at upload, which hold the
  avatars' far-outside park positions by construction.
- CPU-test caveat (CLAUDE.md): the INTERPRETED pallas path deadlocks
  under multi-process (jax.distributed) shard_map, so multi-process CPU
  tests drive brute/exact; the pallas multiplayer path is exercised
  single-process under interpret (tests/test_multiplayer.py) and is
  unaffected on real chips (Mosaic, no callbacks).

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

# Named per-player avatar albedos; players beyond these get distinct
# golden-angle hues (player_color).
PLAYER_COLORS = (
    (0.9, 0.25, 0.2),
    (0.2, 0.55, 0.9),
    (0.3, 0.85, 0.35),
    (0.95, 0.8, 0.25),
)


def player_color(i: int, colors=PLAYER_COLORS) -> tuple:
    """Player i's avatar albedo: the named palette first, then
    golden-angle hues — every player count gets DISTINCT colors
    (cycling a 4-entry palette gave players 0 and 4 the same avatar)."""
    if i < len(colors):
        return tuple(colors[i])
    import colorsys

    h = (i * 0.6180339887498949) % 1.0
    return colorsys.hsv_to_rgb(h, 0.65, 0.9)


def avatar_scene(scene, n_players: int, me: int, radius: float = 1.0,
                 colors=PLAYER_COLORS, glow: float = 0.0):
    """Append n_players - 1 avatar spheres (every player but ``me``) to a
    host Scene, parked at PARK. Avatar i keeps player i's color on every
    process, so "the red player" is red in everyone's view. ``glow`` > 0
    makes avatars softly EMISSIVE in their own color (emission strength
    = glow) so players stay visible in the maze's dark corridors —
    0 (default) keeps them passive diffuse spheres."""
    others = [i for i in range(n_players) if i != me]
    a = len(others)
    if a == 0:
        return scene, []
    centers = np.full((a, 3), PARK, np.float32)
    col = np.array([player_color(i, colors) for i in others], np.float32)
    emission = np.concatenate(
        [col, np.full((a, 1), float(glow), np.float32)], axis=1
    )
    s = scene.num_spheres

    def cat(old, new):
        return np.concatenate([np.asarray(old), new], axis=0)

    return dataclasses.replace(
        scene,
        sph_center=cat(scene.sph_center, centers),
        sph_radius=cat(scene.sph_radius, np.full(a, radius, np.float32)),
        sph_color=cat(scene.sph_color, col),
        sph_is_mirror=cat(scene.sph_is_mirror, np.zeros(a, bool)),
        sph_emission=cat(scene.sph_emission, emission),
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
    -> the LOCAL DEVICE's replicated [P, 3] shard, as a device array —
    it feeds straight into the jitted step with no host round trip
    (np.asarray it for host consumers). The per-frame wire traffic of
    the whole multiplayer feature."""
    gathered = jax.jit(
        shard_map(
            lambda c: jax.lax.all_gather(c[0], "player"),
            mesh=mesh, in_specs=P("player"), out_specs=P(),
            check_vma=False,
        )
    )

    def exchange(my_center) -> jnp.ndarray:
        mine = jnp.asarray(my_center, jnp.float32)[None]
        glob = jax.make_array_from_single_device_arrays(
            (mesh.size, 3),
            NamedSharding(mesh, P("player")),
            [jax.device_put(mine, jax.local_devices()[0])],
        )
        out = gathered(glob)
        return out.addressable_shards[0].data

    return exchange


def make_multiplayer_engine(cfg: EngineConfig, mesh: Mesh, me: int,
                            scene=None, radius: float = 1.0,
                            glow: float = 0.25, noise=None):
    """Build (dev_scene, init_fn, step_fn) for one player process.

    step_fn(state, inputs) -> (state, frame) is ONE device launch per
    frame: the position ``all_gather`` composes INTO the jitted fused
    step (a shard_map over the global ``("player",)`` mesh wrapping
    avatar-row surgery, the pallas-only in-jit sphere-operand repack,
    and the whole donated engine step). Multiplayer is locked to
    per-frame stepping — the one cadence that cannot amortize launches
    — so a separate exchange dispatch cost a full tunnel round trip
    (~25-40 ms remote, PERF.md rule 2) every frame; fusing removes it.

    Mesh-program mechanics: scene/state/inputs enter with replicated
    specs (``P()``) — each process supplies its OWN local values via a
    zero-copy global wrap (`_to_global`; check_vma=False, no transfer,
    no resharding: every value is consumed on the device that produced
    it). Inside the body, ``lax.all_gather(cam_center, "player")``
    collects each device's row — the per-frame wire traffic. The
    returned state/frame are unwrapped back to plain local arrays, so
    drivers (terminal loop, HTTP server, watchdog, checkpoints) see the
    exact same state surface as the single-player engine. The
    per-process programs differ only in constants (my avatar slots /
    ``others`` rows); the op and collective sequence is identical on
    every process, as multi-process jit requires. One exception keeps
    the CPU validation path alive: interpreted pallas inside a
    multi-process shard_map deadlocks (documented io_callback livelock),
    so that combination alone uses the round-4 two-launch form.

    Camera semantics, progressive refresh, and the present pipeline are
    the single-chip engine's, untouched. ``glow`` gives avatars a soft
    self-emission in their own color (avatar_scene) so players read in
    dark corridors; 0 for passive spheres.
    """
    from ..render import upload_scene
    from ..render.scenebuf import make_sphere_refresh
    from ..runtime.state import init_state
    from ..runtime.step import derive_traversal_bounds, make_step_fn
    from ..scene import build_scene

    n_players = mesh.size
    host_scene = scene if scene is not None else build_scene(cfg.maze)
    host_scene, slots = avatar_scene(host_scene, n_players, me, radius,
                                     glow=glow)
    # ``noise`` (e.g. the reference texture for noise_rng configs) rides
    # into the one upload here — callers must not pre-upload.
    dev = upload_scene(host_scene, noise=noise)
    md, ml = derive_traversal_bounds(dev, cfg, None, None)
    base_step = make_step_fn(cfg, md, ml)
    refresh = (
        make_sphere_refresh(dev)
        if cfg.intersector == "pallas" and slots else None
    )
    others = np.asarray(
        [i for i in range(n_players) if i != me], np.int32
    )

    repl = NamedSharding(mesh, P())
    my_dev = jax.local_devices()[0]

    def _to_global(tree):
        """Zero-copy wrap of a LOCAL pytree as global arrays on the
        mesh (metadata only — the data stays where it is). P() is a
        per-process claim, not a transfer: with check_vma=False each
        device computes on its own values (the multiplayer point —
        states differ per player)."""
        return jax.tree.map(
            lambda x: jax.make_array_from_single_device_arrays(
                jnp.shape(x), repl,
                [jax.device_put(jnp.asarray(x), my_dev)],
            ),
            tree,
        )

    def _to_local(tree):
        """Unwrap global outputs to plain single-device arrays (metadata
        only), restoring the single-player state/frame surface."""
        return jax.tree.map(
            lambda x: x.addressable_shards[0].data, tree
        )

    def body(scene_, state, inputs):
        # The per-frame wire traffic of the whole feature: one [P, 3]
        # camera-position all_gather riding the same launch as the step.
        positions = jax.lax.all_gather(state.cam_center, "player")
        if slots:
            scene_ = update_avatars(scene_, slots, positions[others])
        if refresh is not None:
            scene_ = refresh(scene_)
        return base_step(scene_, state, inputs)

    # The CPU TPU-semantics INTERPRETER's io_callback machinery deadlocks
    # when an interpreted pallas call runs inside a MULTI-PROCESS
    # shard_map (CLAUDE.md/PERF.md; the first step hangs in the buffer
    # allocator). Real chips compile via Mosaic (no callbacks) and are
    # unaffected, as is any single-process mesh. Where the deadlock
    # would bite — multi-process CPU with the pallas kernel OR the
    # fused pallas present in the step — fall back to the two-launch
    # form (separate exchange + local jitted step), trading one tunnel
    # round trip for liveness on the CPU validation path only.
    step_has_pallas = (
        cfg.intersector == "pallas" or cfg.screen.pallas_present
    )
    fuse = not (
        n_players > 1 and step_has_pallas
        and jax.default_backend() == "cpu"
    )

    def init_fn(seed: int = 0):
        return init_state(cfg, seed)

    if fuse:
        step_glob = jax.jit(
            shard_map(
                body, mesh=mesh, in_specs=(P(), P(), P()),
                out_specs=(P(), P()), check_vma=False,
            ),
            donate_argnums=(1,),
        )
        g_scene = _to_global(dev)   # static across frames: wrap once

        def step_fn(state, inputs):
            try:
                out_state, frame = step_glob(
                    g_scene, _to_global(state), _to_global(inputs)
                )
            except Exception as e:  # noqa: BLE001 — annotate the death
                if n_players > 1:
                    raise RuntimeError(
                        "multiplayer step failed — most likely a peer "
                        "left the session (the per-frame exchange is a "
                        "collective); the session is over for everyone"
                    ) from e
                raise
            return _to_local(out_state), _to_local(frame)
    else:
        exchange = make_position_exchange(mesh)

        def fused_local(scene_, positions, state, inputs):
            if slots:
                scene_ = update_avatars(scene_, slots, positions[others])
            if refresh is not None:
                scene_ = refresh(scene_)
            return base_step(scene_, state, inputs)

        step_local = jax.jit(fused_local, donate_argnums=(2,))

        def step_fn(state, inputs):
            try:
                positions = exchange(state.cam_center)  # [P, 3] device
                return step_local(dev, positions, state, inputs)
            except Exception as e:  # noqa: BLE001 — annotate the death
                raise RuntimeError(
                    "multiplayer step failed — most likely a peer left "
                    "the session (the per-frame exchange is a "
                    "collective); the session is over for everyone"
                ) from e

    return dev, init_fn, step_fn
