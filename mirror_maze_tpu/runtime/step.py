"""The per-frame step: ONE jitted, donated device program.

Reimplements the reference's 60 Hz host frame loop (`main.rs:767-894`) as a
single pure function state x inputs -> state x frame, so XLA fuses camera
integration, collision, scheduling, tracing, accumulation, and blur into one
dispatch and the state never leaves HBM. Order of operations within a frame
matches the reference:

1. pop the next chunk window from the queue (`main.rs:778-784`);
2. integrate WASD movement in the camera frame via quaternion rotation
   (`main.rs:786-815`) and revert on collision (`main.rs:817-826`);
3. apply the mouse yaw update with the NaN "Help!" guard, regenerating the
   chunk queue on successful rotation (`main.rs:828-842`) — the regenerated
   queue takes effect NEXT frame, as in the reference, because this frame's
   chunks were already popped;
4. trace the popped chunks and write them into the screen (`main.rs:860-886`);
5. feedback blur + 8-bit quantization (the present pass, `main.rs:888-894`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..ops import quat as quat_ops
from ..render.accumulate import (
    cm_to_spatial,
    feedback_blur_cm,
    present_stage,
    scatter_chunk_rows,
    to_display,
)
from ..render.pipeline import make_nearest_fn, render_pixels
from ..render.scenebuf import DeviceScene
from ..render.scheduler import (
    chunk_origin_xy,
    chunk_pixels,
    sort_window_morton,
    take_chunks,
)
from ..scene.collision import collides
from .state import EngineState, FrameInputs


def integrate_movement(
    cfg: EngineConfig, center: jnp.ndarray, quat: jnp.ndarray, keys: jnp.ndarray
) -> jnp.ndarray:
    """WASD integration (`main.rs:786-815`): per-key displacement of
    speed/fps rotated into the camera frame; A/S subtract, D/W add."""
    step = cfg.camera.move_speed / cfg.screen.fps
    right = quat_ops.rotate(jnp.array([step, 0.0, 0.0], jnp.float32), quat)
    fwd = quat_ops.rotate(jnp.array([0.0, 0.0, step], jnp.float32), quat)
    a, s, d, w = keys[0], keys[1], keys[2], keys[3]
    delta = (
        -right * a - fwd * s + right * d + fwd * w
    )
    return center + delta


def resolve_collision(
    cfg: EngineConfig,
    scene: DeviceScene,
    new_center: jnp.ndarray,
    old_center: jnp.ndarray,
) -> jnp.ndarray:
    """Revert the whole move on any hit (`main.rs:817-826`)."""
    half = jnp.asarray(cfg.camera.player_half_extent, dtype=jnp.float32)
    hit = collides(
        scene.leaf_min, scene.leaf_max, new_center - half, new_center + half
    )
    return jnp.where(hit, old_center, new_center)


def rotation_update(
    quat: jnp.ndarray,
    half_theta: jnp.ndarray,
    perm: jnp.ndarray,
    cursor: jnp.ndarray,
    key: jnp.ndarray,
    inputs: FrameInputs,
    cfg: EngineConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mouse yaw update (`main.rs:828-842`, `main.rs:922-925`).

    half_theta -= dx * sensitivity, wrapped into [0, pi); the quaternion is
    re-aimed via update_angle with the reference's NaN guard (keep the old
    quaternion if the update degenerates). On successful rotation the chunk
    queue is regenerated so the whole view re-renders.

    Pure-scalar core shared by the single-chip step and the tile-sharded
    engine (parallel/shard.py) — any change here applies to both.

    Returns (quat, half_theta, perm, cursor, key).
    """
    new_half = jnp.mod(
        half_theta - inputs.mouse_dx * cfg.camera.mouse_sensitivity,
        jnp.pi,
    )
    candidate = quat_ops.update_angle(quat, new_half)
    # The reference guards only NaN (`main.rs:830-835`); we also reject
    # inf/denormal blowups (see ops/quat.py update_angle) — a non-finite
    # quaternion must never reach the movement integrator.
    ok = jnp.all(jnp.isfinite(candidate))
    rotated = inputs.rot_updated & ok

    quat_out = jnp.where(rotated, candidate, quat)
    half_out = jnp.where(inputs.rot_updated, new_half, half_theta)

    rkey, key = jax.random.split(key)
    # Regenerate ONLY on rotation frames: the permutation is a
    # random-bits + full sort over every screen chunk (519k ids at 4K),
    # far too expensive to compute-and-discard every idle/walking frame.
    # The key split stays unconditional, so streams (and goldens) are
    # identical to the old compute-always/select formulation.
    perm_out = jax.lax.cond(
        rotated,
        lambda p: jax.random.permutation(rkey, p.shape[0]).astype(jnp.int32),
        lambda p: p,
        perm,
    )
    cursor_out = jnp.where(rotated, jnp.int32(0), cursor)
    return quat_out, half_out, perm_out, cursor_out, key


def apply_rotation(
    state: EngineState, inputs: FrameInputs, cfg: EngineConfig
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """rotation_update over an EngineState."""
    return rotation_update(
        state.quat, state.half_theta, state.perm, state.cursor, state.key,
        inputs, cfg,
    )


def make_step_fn(
    cfg: EngineConfig,
    max_depth: int = 32,
    max_leaf: int = 4,
) -> Callable[[DeviceScene, EngineState, FrameInputs], tuple[EngineState, jnp.ndarray]]:
    """Build the PURE frame-step function (scene, state, inputs) ->
    (state, display_frame). Jit-free: callers decide how to stage it."""
    n_chunks = cfg.screen.effective_chunks_per_frame

    def step(scene: DeviceScene, state: EngineState, inputs: FrameInputs):
        # For the pallas backend, render_pixels dispatches to the fused
        # kernel itself — passing a nearest_fn would silently override it.
        nearest_fn = (
            None
            if cfg.intersector == "pallas"
            else make_nearest_fn(scene, cfg, max_depth, max_leaf)
        )
        frame = state.frame + 1

        # 1. Pop this frame's chunk window (pre-rotation queue, as in the
        # reference where random_pixels runs before the event-driven reset).
        ids, cursor_next = take_chunks(state.perm, state.cursor, n_chunks)
        if cfg.screen.sort_chunk_window:
            ids = sort_window_morton(ids, cfg.screen)
        perm_in = state.perm
        if cfg.screen.adaptive_refresh:
            # Detail-guided epoch order (scheduler.adaptive_reorder):
            # reorders only when this pop wrapped into a new epoch.
            from ..render.scheduler import adaptive_reorder

            perm_in = adaptive_reorder(
                state.perm, state.cursor, cursor_next, state.screen
            )

        # 2. Movement + collision.
        moved = integrate_movement(cfg, state.cam_center, state.quat, inputs.keys)
        center = resolve_collision(cfg, scene, moved, state.cam_center)

        # 3. Rotation (+ queue regeneration for NEXT frame).
        quat, half_theta, perm, cursor_rot, key = apply_rotation(
            state._replace(cursor=cursor_next, perm=perm_in), inputs, cfg
        )

        # 4. Trace the popped chunks.
        fkey = jax.random.fold_in(key, frame)
        pixels = chunk_pixels(chunk_origin_xy(ids, cfg.screen), cfg.screen.chunk_width)
        cam = state._replace(cam_center=center, quat=quat).camera(cfg)
        colors = render_pixels(scene, cam, pixels, fkey, cfg, nearest_fn)
        # Chunk-major row scatter: 16x fewer indices than per-pixel
        # (0.09 vs 1.49 ms at 1080p, render/accumulate.py).
        screen = scatter_chunk_rows(state.screen, ids, colors)

        # 5. Present: feedback blur + quantization (`shaders.metal:214-225`)
        # computed in chunk-major space (bit-identical to the spatial
        # blur, no 25 MB transposes); by default the fused pallas kernel
        # (render/present.py), else the XLA form (feedback_blur_cm). The
        # spatial view is built only for display.
        from ..render.present import present

        screen = present_stage(
            screen, cfg.screen,
            lambda scr, quantize: present(scr, cfg.screen, quantize=quantize),
            lambda scr: feedback_blur_cm(scr, cfg.screen),
        )
        spatial = cm_to_spatial(screen, cfg.screen)

        new_state = EngineState(
            cam_center=center,
            quat=quat,
            half_theta=half_theta,
            screen=screen,
            perm=perm,
            cursor=cursor_rot,
            key=key,
            frame=frame,
        )
        return new_state, to_display(spatial)

    return step


def make_scan_step_fn(
    cfg: EngineConfig,
    n_frames: int,
    max_depth: int = 32,
    max_leaf: int = 4,
) -> Callable[[DeviceScene, EngineState, FrameInputs], tuple[EngineState, jnp.ndarray]]:
    """Multi-frame step: runs ``n_frames`` engine steps in ONE device
    program via lax.scan, returning (final_state, last_display_frame).

    ``inputs`` is a FrameInputs pytree with a leading [n_frames] axis.
    This is the TPU-native answer to dispatch latency: the reference
    pays one Metal command-buffer commit per frame (`main.rs:893-894`);
    here any scripted/benchmark run keeps the WHOLE frame loop in HBM
    and pays one launch per n_frames (essential over remote-dispatch
    links, where each launch costs tens of ms of round-trip latency).
    Only the final frame is materialized — intermediate displays are
    never written to HBM.
    """
    step = make_step_fn(cfg, max_depth, max_leaf)

    def run(scene: DeviceScene, state: EngineState, inputs: FrameInputs):
        def body(st, inp):
            new_st, _ = step(scene, st, inp)
            return new_st, None

        final, _ = jax.lax.scan(body, state, inputs)
        return final, to_display(cm_to_spatial(final.screen, cfg.screen))

    return run


def derive_traversal_bounds(
    scene: DeviceScene, cfg: EngineConfig,
    max_depth: int | None, max_leaf: int | None,
) -> tuple[int, int]:
    """Fill None traversal bounds from the CONCRETE scene's built BVH
    (scene/bvh.py traversal_bounds) — a fixed max_leaf drops primitives
    in large SAH leaves and a fixed max_depth corrupts the stack. Only
    the "bvh" intersector traverses, so other backends keep cheap
    defaults without fetching the arrays."""
    if max_depth is not None and max_leaf is not None:
        return max_depth, max_leaf
    if cfg.intersector != "bvh":
        return max_depth or 32, max_leaf or 4
    from ..scene.bvh import traversal_bounds

    d, l = traversal_bounds(scene.bvh_left_first, scene.bvh_count)
    return (max_depth or d), (max_leaf or l)


def make_scan_step(
    scene: DeviceScene,
    cfg: EngineConfig,
    n_frames: int,
    max_depth: int | None = None,
    max_leaf: int | None = None,
) -> Callable[[EngineState, FrameInputs], tuple[EngineState, jnp.ndarray]]:
    """Jitted multi-frame step bound to a scene (state donated)."""
    max_depth, max_leaf = derive_traversal_bounds(
        scene, cfg, max_depth, max_leaf
    )
    fn = jax.jit(
        make_scan_step_fn(cfg, n_frames, max_depth, max_leaf),
        donate_argnums=(1,),
    )
    return lambda state, inputs: fn(scene, state, inputs)


def stack_inputs(frames: list[FrameInputs]) -> FrameInputs:
    """Stack per-frame inputs into the [n]-leading pytree scan expects."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def repeat_input(inp: FrameInputs, n: int) -> FrameInputs:
    """Broadcast one FrameInputs to a [n]-leading pytree."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), inp
    )


def make_step(
    scene: DeviceScene,
    cfg: EngineConfig,
    max_depth: int | None = None,
    max_leaf: int | None = None,
) -> Callable[[EngineState, FrameInputs], tuple[EngineState, jnp.ndarray]]:
    """Jitted frame step bound to a scene. The state buffers are donated
    (screen/perm updated in place — no HBM copies per frame).

    The scene is passed as a jit ARGUMENT, not closed over: closed-over
    device arrays are embedded as HLO constants, which forces a
    device->host fetch per array at lowering time (pathological over the
    axon TPU tunnel) and bloats the executable. Traversal bounds default
    to exact values derived from the scene's BVH (derive_traversal_bounds).
    """
    max_depth, max_leaf = derive_traversal_bounds(
        scene, cfg, max_depth, max_leaf
    )
    step_jit = jax.jit(
        make_step_fn(cfg, max_depth, max_leaf), donate_argnums=(1,)
    )
    return lambda state, inputs: step_jit(scene, state, inputs)
