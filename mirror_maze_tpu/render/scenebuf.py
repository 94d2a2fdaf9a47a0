"""Device-resident scene buffers.

The reference uploads its scene into six Metal buffers once at init
(`main.rs:723-730`: pixel-chunks, mirrors, materials, emissions, BVH nodes,
BVH indices) and never touches them from the host again. The TPU equivalent
is this NamedTuple-of-arrays pytree: built once on host, placed in HBM, and
closed over / threaded through jitted functions thereafter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.builder import Scene
from ..scene.bvh import BVH, build_bvh


class DeviceScene(NamedTuple):
    """All per-plane and BVH arrays as device arrays (a JAX pytree)."""

    # Plane soup + precomputed intersection constants (see SceneDerived).
    normal: jnp.ndarray     # [N, 3]
    d: jnp.ndarray          # [N]
    w1: jnp.ndarray         # [N, 3]
    b1: jnp.ndarray         # [N]
    w2: jnp.ndarray         # [N, 3]
    b2: jnp.ndarray         # [N]
    color: jnp.ndarray      # [N, 3]
    is_mirror: jnp.ndarray  # [N] bool
    emission: jnp.ndarray   # [N, 4]
    valid: jnp.ndarray      # [N] bool
    # Triangle flag (Scene.kind == 3): the jnp intersectors switch the
    # in-primitive acceptance from the quad's per-edge [0, 1] test to
    # the barycentric s1 >= 0, s2 >= 0, s1 + s2 <= 1 (the pallas kernel
    # carries the same split statically as its mode-4 group).
    is_tri: jnp.ndarray     # [N] bool
    # Flat BVH (`main.rs:74-81` layout: interior count==0, children adjacent).
    bvh_min: jnp.ndarray        # [M, 3]
    bvh_max: jnp.ndarray        # [M, 3]
    bvh_left_first: jnp.ndarray  # [M] int32
    bvh_count: jnp.ndarray      # [M] int32
    bvh_prim: jnp.ndarray       # [N] int32
    # Leaf AABBs for the collision query (scene/collision.py).
    leaf_min: jnp.ndarray   # [L, 3]
    leaf_max: jnp.ndarray   # [L, 3]
    # Sphere primitives (Scene.sph_*; zero-length for generated mazes).
    # sph_c2r2 = |center|^2 - radius^2 is precomputed ONCE here so the
    # jnp tracers and the pallas kernel consume the identical f32
    # constant (their hit tests agree bit-for-bit where the arithmetic
    # order matches).
    sph_center: jnp.ndarray     # [S, 3]
    sph_radius: jnp.ndarray     # [S]
    sph_inv_r: jnp.ndarray      # [S] 1 / radius
    sph_c2r2: jnp.ndarray       # [S] |center|^2 - radius^2
    sph_color: jnp.ndarray      # [S, 3]
    sph_is_mirror: jnp.ndarray  # [S] bool
    sph_emission: jnp.ndarray   # [S, 4]
    # Dielectric indices of refraction (Scene.ior/sph_ior; 0 = opaque).
    # None — a STATIC pytree marker, like the mxu_tables group
    # structure — when the scene has no glass primitives at all, so the
    # tracers' glass stage is statically absent and glass-free scenes
    # compile to exactly the pre-dielectric program.
    ior: jnp.ndarray | None     # [N] float32 or None
    sph_ior: jnp.ndarray | None  # [S] float32 or None
    # Procedural textures (Scene.tex_* / sph_tex_*), packed per
    # primitive as [*, 5] rows (kind, scale, color2 rgb). None — the
    # same static marker pattern as `ior` — when NO primitive anywhere
    # in the scene is textured; otherwise BOTH fields are arrays (a
    # sphere-only texture still materializes the zero plane rows so
    # the tracer's primitive-indexed gather is total).
    tex: jnp.ndarray | None      # [N, 5] float32 or None
    sph_tex: jnp.ndarray | None  # [S, 5] float32 or None
    # Packed [P, 32] table for the Pallas wavefront kernel
    # (render/pallas_tracer.py PLANE_COLS), Morton-ordered within each
    # closed-world test kind, plus its derived matmul operand groups
    # (pack_intersection_tables) computed once at upload: an 8-tuple
    # indexed by test mode (opaque kinds 0-2, 3 spheres, 4 triangles;
    # 5-7 the glass sphere/quad/triangle groups), each None or
    # (W, propsT, tile AABBs).
    plane_table: jnp.ndarray
    mxu_tables: tuple
    # Noise texture [S, S] float32 in [0,1) — the reference's RNG seed
    # source (`main.rs:667-695`), used when TracerConfig.noise_rng is on.
    noise: jnp.ndarray

    @property
    def num_planes(self) -> int:
        return self.normal.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sph_center.shape[0]


def upload_scene(
    scene: Scene, bvh: BVH | None = None, noise: np.ndarray | None = None
) -> DeviceScene:
    """Build derived constants + BVH and place everything on device."""
    from ..utils.noise import generate_noise
    from .pallas_tracer import build_sphere_table, pack_intersection_tables

    if bvh is None:
        bvh = build_bvh(scene.origin, scene.u, scene.v)
    if noise is None:
        noise = generate_noise()
    der = scene.derived()
    table = _ordered_plane_table(der, scene)
    mxu_tables = jax.tree.map(
        jnp.asarray,
        pack_intersection_tables(
            table,
            sphere_table=(
                build_sphere_table(scene) if scene.num_spheres else None
            ),
        ),
    )
    leaf_min, leaf_max = bvh.leaf_boxes()
    # Collision sees spheres as their bounding boxes appended to the BVH
    # leaf-box set — the same conservative AABB-vs-AABB predicate the
    # reference uses for all collision (`main.rs:237-244` on node boxes).
    center = np.asarray(scene.sph_center, np.float32)
    radius = np.asarray(scene.sph_radius, np.float32)
    if scene.num_spheres:
        leaf_min = np.concatenate(
            [leaf_min, center - radius[:, None]], axis=0
        )
        leaf_max = np.concatenate(
            [leaf_max, center + radius[:, None]], axis=0
        )
    # Textured iff any VALID primitive is textured — the same predicate
    # pack_intersection_tables applies to its (invalid-row-filtered)
    # table, so the jnp tracer's static marker (DeviceScene.tex) and
    # the kernel's (doubled props block) can never disagree.
    textured = bool(
        np.any((np.asarray(scene.tex_kind) > 0) & np.asarray(der.valid))
        or (scene.num_spheres
            and np.any(np.asarray(scene.sph_tex_kind) > 0))
    )
    # float64 squares/sums, rounded once to f32 (the bvh builder's
    # promote-before-add lesson): every backend then shares this exact
    # constant instead of re-rounding its own.
    c2r2 = (
        np.sum(center.astype(np.float64) ** 2, axis=-1)
        - radius.astype(np.float64) ** 2
    ).astype(np.float32)
    as_dev = lambda a: jnp.asarray(a)
    return DeviceScene(
        normal=as_dev(der.normal),
        d=as_dev(der.d),
        w1=as_dev(der.w1),
        b1=as_dev(der.b1),
        w2=as_dev(der.w2),
        b2=as_dev(der.b2),
        color=as_dev(der.color),
        is_mirror=as_dev(der.is_mirror),
        emission=as_dev(der.emission),
        valid=as_dev(der.valid),
        is_tri=as_dev(np.asarray(scene.kind) == 3),
        bvh_min=as_dev(bvh.aabb_min),
        bvh_max=as_dev(bvh.aabb_max),
        bvh_left_first=as_dev(bvh.left_first),
        bvh_count=as_dev(bvh.count),
        bvh_prim=as_dev(bvh.prim_index),
        leaf_min=as_dev(leaf_min.astype(np.float32)),
        leaf_max=as_dev(leaf_max.astype(np.float32)),
        sph_center=as_dev(center),
        sph_radius=as_dev(radius),
        sph_inv_r=as_dev((1.0 / radius).astype(np.float32)),
        sph_c2r2=as_dev(c2r2),
        sph_color=as_dev(np.asarray(scene.sph_color, np.float32)),
        sph_is_mirror=as_dev(np.asarray(scene.sph_is_mirror, bool)),
        sph_emission=as_dev(np.asarray(scene.sph_emission, np.float32)),
        ior=(
            as_dev(np.asarray(scene.ior, np.float32))
            if np.any(np.asarray(scene.ior) > 0) else None
        ),
        sph_ior=(
            as_dev(np.asarray(scene.sph_ior, np.float32))
            if scene.num_spheres and np.any(np.asarray(scene.sph_ior) > 0)
            else None
        ),
        tex=as_dev(_pack_tex(scene.tex_kind, scene.tex_scale,
                             scene.tex_color2)) if textured else None,
        sph_tex=as_dev(_pack_tex(scene.sph_tex_kind, scene.sph_tex_scale,
                                 scene.sph_tex_color2)) if textured
        else None,
        plane_table=as_dev(table),
        mxu_tables=mxu_tables,
        noise=as_dev(np.asarray(noise, dtype=np.float32)),
    )


def sphere_table_device(dev: DeviceScene) -> jnp.ndarray:
    """Assemble the [S, 18] sphere table (pallas_tracer
    build_sphere_table layout) IN-JIT from the DeviceScene's sphere
    arrays. Column-for-column identical to the host builder on a scene
    whose device arrays came from upload_scene: inv_r and c2r2 are the
    very constants upload derived (c2r2 f64-summed once on host), the
    premultiplied emission is the same f32 product, and the tex columns
    are DeviceScene.sph_tex verbatim (zeros/ones defaults when the
    scene is untextured — unused by the untextured packer)."""
    s = dev.num_spheres
    em = dev.sph_emission
    if dev.sph_tex is not None:
        tex_cols = dev.sph_tex
    else:
        tex_cols = jnp.concatenate(
            [jnp.zeros((s, 1), jnp.float32),
             jnp.ones((s, 1), jnp.float32),
             jnp.zeros((s, 3), jnp.float32)], axis=1
        )
    ior = (dev.sph_ior if dev.sph_ior is not None
           else jnp.zeros((s,), jnp.float32))
    return jnp.concatenate(
        [
            dev.sph_center,                                   # 0:3
            dev.sph_inv_r[:, None],                           # 3
            dev.sph_c2r2[:, None],                            # 4
            dev.sph_color,                                    # 5:8
            em[:, :3] * em[:, 3:4],                           # 8:11
            dev.sph_is_mirror.astype(jnp.float32)[:, None],   # 11
            ior[:, None],                                     # 12
            tex_cols,                                         # 13:18
        ],
        axis=1,
    )


def make_sphere_refresh(dev: DeviceScene):
    """Build refresh(scene) -> scene re-deriving the pallas kernel's
    sphere MXU operand groups (mxu_tables modes 3/5) from the scene's
    ``sph_*`` ARRAYS, in-jit (pallas_tracer.pack_sphere_group_jnp).

    Composed in front of the jitted step, this makes sphere centers
    fully DYNAMIC on the flagship pallas backend: update_avatars moves
    ``sph_center``/``sph_c2r2`` and the kernel sees the moved spheres
    on the same compiled program — without it, upload-time packing
    pins every sphere where upload_scene saw it. The glass/opaque
    partition and the textured flag are STATIC properties captured here
    from the CONCRETE scene (they shape the packed operands); only the
    sphere VALUES may change per frame. Returns None for sphere-free
    scenes (nothing to refresh — and the traced step is unchanged).
    """
    from .pallas_tracer import pack_sphere_group_jnp

    if dev.num_spheres == 0:
        return None
    ior = (np.asarray(dev.sph_ior) if dev.sph_ior is not None
           else np.zeros(dev.num_spheres, np.float32))
    idx_opaque = np.where(~(ior > 0.0))[0]
    idx_glass = np.where(ior > 0.0)[0]
    textured = dev.tex is not None

    def refresh(d: DeviceScene) -> DeviceScene:
        table = sphere_table_device(d)
        groups = list(d.mxu_tables)
        if idx_opaque.size:
            groups[3] = pack_sphere_group_jnp(
                table[idx_opaque], textured=textured
            )
        if idx_glass.size:
            groups[5] = pack_sphere_group_jnp(
                table[idx_glass], textured=textured
            )
        return d._replace(mxu_tables=tuple(groups))

    # The repacked operands must slot into the uploaded structure: same
    # shapes (S and the default tile are both static), else the jit
    # would silently recompile per call. Checked once, eagerly, here.
    check = jax.eval_shape(refresh, dev)
    for mode in (3, 5):
        got, want = check.mxu_tables[mode], dev.mxu_tables[mode]
        if (got is None) != (want is None) or (
            want is not None
            and tuple(a.shape for a in got) != tuple(a.shape for a in want)
        ):
            raise ValueError(
                f"sphere refresh shape mismatch for mode {mode}: "
                f"{got} vs uploaded {want} (non-default tile_by_mode?)"
            )
    return refresh


def _pack_tex(kind, scale, color2) -> np.ndarray:
    """[*, 5] texture rows: (kind, scale, color2 rgb)."""
    return np.concatenate(
        [
            np.asarray(kind, np.float32)[:, None],
            np.asarray(scale, np.float32)[:, None],
            np.asarray(color2, np.float32).reshape(-1, 3),
        ],
        axis=1,
    )


def _ordered_plane_table(der, scene) -> np.ndarray:
    """Morton-ordered [P, 32] plane table for the pallas kernel.

    The spatial order makes the kernel's 128-plane tiles geographically
    compact, enabling its per-tile AABB skip (pallas_tracer.py). The
    table is self-contained (all shading properties inline), so its
    order is independent of the DeviceScene arrays'.
    """
    from .pallas_tracer import build_plane_table, spatial_plane_order_key

    table = build_plane_table(der, scene)
    # Drop invalid planes (degenerate zero-extent wall runs) — the kernel
    # sweeps every table row per segment, so a 10x10 maze paying for 9
    # dead rows of 81 is pure waste. The table is index-independent, so
    # filtering is safe.
    table = table[table[:, 19] > 0.0]
    order = np.lexsort((spatial_plane_order_key(table), table[:, 26]))
    return table[order]
