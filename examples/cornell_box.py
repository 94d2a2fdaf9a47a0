"""Cornell box on the mirror-maze engine — a custom-scene showcase.

The reference app renders exactly one world: its seeded maze
(`main.rs:356-588`). This framework's `Scene` is a public surface
(docs/API.md "Custom scenes"): any quad soup drives the full engine. This
example assembles the classic Cornell box — red/green side walls, white
floor/ceiling/back, one warm area light, a short diffuse block and a tall
MIRROR block (the engine's mirror material standing in for Cornell's tall
box) — saves it with `save_scene`, and renders it offline.

The scene doubles as a numerics showcase: its albedos (0.725/0.63/0.065…)
and rotated-block normals are NOT bf16-exact, so a correct image on real
hardware exercises the kernel's split-precision one-hot select
(render/pallas_tracer.py `_pack_group`) on values the generated maze
never produces.

World conventions (scene/builder.py): +y points DOWN — the room floor is
y = +2 and its ceiling y = -8, matching the engine's maze worlds so the
default player physics work unchanged.

Run (writes cornell.npz + cornell.png):
    python examples/cornell_box.py [--size 256] [--spp 64] \
        [--intersector pallas] [--out cornell.png]

Or drive the saved world with the stock CLI:
    python -m mirror_maze_tpu render --scene cornell.npz \
        --spawn 0,-3,-10 --look 0,0,1 --width 512 --height 512 --spp 64
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

try:  # allow `python examples/cornell_box.py` from a source checkout
    import mirror_maze_tpu  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

# Classic Cornell albedos (not bf16-representable — deliberately).
WHITE = (0.725, 0.71, 0.68)
RED = (0.63, 0.065, 0.05)
GREEN = (0.14, 0.45, 0.091)
LIGHT_RGB = (1.0, 0.85, 0.55)
LIGHT_STRENGTH = 34.0

FLOOR_Y = 2.0     # +y is down: floor below, ceiling above
CEIL_Y = -8.0
HALF = 5.0        # room spans [-5, 5] in x
Z_MIN = -10.5     # the room extends BEHIND the camera and is fully
Z_MAX = 5.0       # closed, so the mirror block reflects lit geometry
                  # instead of an open (black) front — and no ray ever
                  # escapes, like the engine's closed maze worlds


class _Soup:
    """Accumulates quads; `scene()` emits the SoA Scene."""

    def __init__(self):
        self.rows = []

    def quad(self, origin, v, u, color, mirror=False, emission=(0, 0, 0, 0)):
        """One parallelogram origin + a*v + b*u, (a, b) in [0,1]^2.

        Normal convention (scene/builder.py SceneDerived): unit
        normal = normalize(cross(v, u)). Mirrors reflect only on front
        faces — rays arriving AGAINST the normal (render/tracer.py
        `side`) — so mirror quads must face outward.
        """
        self.rows.append((origin, v, u, color, mirror, emission))

    def block(self, cx, cz, half_x, half_z, height, theta_deg,
              color, mirror=False):
        """An axis box rotated theta around y: 4 outward sides + top.

        No bottom face: it is coplanar with the floor and unreachable.
        """
        th = np.deg2rad(theta_deg)
        rot = np.array([[np.cos(th), np.sin(th)],
                        [-np.sin(th), np.cos(th)]])
        # Base corners ordered so each side's cross(v, u) points outward
        # (clockwise when seen from -y, i.e. from above).
        base = np.array([[-half_x, -half_z], [-half_x, half_z],
                         [half_x, half_z], [half_x, -half_z]]) @ rot.T
        base += (cx, cz)
        top_y = FLOOR_Y - height
        up = (0.0, -height, 0.0)
        for i in range(4):
            c0, c1 = base[i], base[(i + 1) % 4]
            self.quad(
                (c0[0], FLOOR_Y, c0[1]), up,
                (c1[0] - c0[0], 0.0, c1[1] - c0[1]), color, mirror,
            )
        # Top: v along c0->c3, u along c0->c1 makes cross(v, u) point -y
        # (up, out of the block).
        c0, c1, c3 = base[0], base[1], base[3]
        self.quad(
            (c0[0], top_y, c0[1]),
            (c3[0] - c0[0], 0.0, c3[1] - c0[1]),
            (c1[0] - c0[0], 0.0, c1[1] - c0[1]), color, mirror,
        )

    def scene(self):
        from mirror_maze_tpu.scene.builder import Scene

        o, v, u, c, m, e = zip(*self.rows)
        return Scene(
            origin=np.asarray(o, np.float32),
            v=np.asarray(v, np.float32),
            u=np.asarray(u, np.float32),
            color=np.asarray(c, np.float32),
            is_mirror=np.asarray(m, bool),
            emission=np.asarray(e, np.float32),
            grid=np.zeros((1, 1), np.uint8),
        )


def checker_floor(scene, cells=8.0, color2=(0.25, 0.25, 0.3)):
    """Turn the Cornell floor (plane 0) into a UV checker — the
    engine's procedural-texture surface (Scene.tex_kind 1)."""
    import dataclasses

    tex_kind = np.zeros(scene.num_planes, np.uint8)
    tex_scale = np.ones(scene.num_planes, np.float32)
    tex_color2 = np.zeros((scene.num_planes, 3), np.float32)
    tex_kind[0] = 1
    tex_scale[0] = cells
    tex_color2[0] = color2
    return dataclasses.replace(
        scene, tex_kind=tex_kind, tex_scale=tex_scale,
        tex_color2=tex_color2,
    )


def build_cornell_box(variant="blocks"):
    """The Cornell box as an engine `Scene`.

    variant="blocks": the classic two rotated boxes (17 quads).
    variant="spheres": the two-sphere variant — a tall MIRROR sphere
    left-back and a diffuse white sphere right-front, both resting on
    the floor (`Scene.sph_*` primitives: the engine's sphere support is
    the corrected, first-classed form of the reference's dead
    `ray_sphere_intersect`, `shaders.metal:69-85` — see docs/API.md
    "Custom scenes"). Sphere normals are position-dependent, so this
    variant exercises the Pallas kernel's post-select normal
    reconstruction on a real image.
    """
    s = _Soup()
    height = FLOOR_Y - CEIL_Y                      # 10
    up = (0.0, -height, 0.0)
    # Room shell (diffuse — orientation is irrelevant for diffuse
    # surfaces, the scatter flips with the hit side like the reference).
    depth = Z_MAX - Z_MIN
    s.quad((-HALF, FLOOR_Y, Z_MIN), (0, 0, depth), (2 * HALF, 0, 0),
           WHITE)                                   # floor (index 0)
    s.quad((-HALF, CEIL_Y, Z_MIN), (2 * HALF, 0, 0), (0, 0, depth),
           WHITE)                                   # ceiling
    s.quad((-HALF, FLOOR_Y, Z_MAX), up, (2 * HALF, 0, 0), WHITE)  # back
    s.quad((-HALF, FLOOR_Y, Z_MIN), up, (2 * HALF, 0, 0), WHITE)  # front
    s.quad((-HALF, FLOOR_Y, Z_MIN), up, (0, 0, depth), RED)       # left
    s.quad((HALF, FLOOR_Y, Z_MIN), (0, 0, depth), up, GREEN)      # right
    # Area light: a panel just under the ceiling, centered.
    s.quad((-2.0, CEIL_Y + 0.01, -1.75), (0, 0, 3.5), (4.0, 0, 0),
           (0.0, 0.0, 0.0), emission=(*LIGHT_RGB, LIGHT_STRENGTH))
    if variant == "spheres":
        import dataclasses

        r_mirror, r_diff = 2.2, 1.5
        return dataclasses.replace(
            s.scene(),
            # Resting on the floor: +y is down, so center y = floor - r.
            sph_center=np.float32([[-2.0, FLOOR_Y - r_mirror, 1.8],
                                   [2.0, FLOOR_Y - r_diff, -1.7]]),
            sph_radius=np.float32([r_mirror, r_diff]),
            sph_color=np.float32([(0, 0, 0), WHITE]),  # mirror: no tint
            sph_is_mirror=np.array([True, False]),
            sph_emission=np.zeros((2, 4), np.float32),
            sph_ior=np.zeros(2, np.float32),
        )
    if variant == "glass":
        import dataclasses

        # A GLASS sphere (ior 1.5, faint blue tint) center-front where
        # it refracts the lit back of the room, next to a tall mirror
        # block behind it — refraction and reflection in one image.
        # Exercises the kernel's mode-5 group: Fresnel reflect/refract
        # split, two-interface paths, far-root exits.
        s.block(-2.0, 1.8, 1.5, 1.5, 6.0, 17.0, WHITE, mirror=True)
        r_glass = 1.8
        return dataclasses.replace(
            s.scene(),
            sph_center=np.float32([[1.6, FLOOR_Y - r_glass, -2.2]]),
            sph_radius=np.float32([r_glass]),
            sph_color=np.float32([(0.94, 0.97, 1.0)]),
            sph_is_mirror=np.array([False]),
            sph_emission=np.zeros((1, 4), np.float32),
            sph_ior=np.float32([1.5]),
        )
    # Short diffuse block (right-front), tall MIRROR block (left-back).
    s.block(2.0, -1.7, 1.5, 1.5, 3.0, -17.0, WHITE)
    s.block(-2.0, 1.8, 1.5, 1.5, 6.0, 17.0, WHITE, mirror=True)
    return s.scene()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--size", type=int, default=256, help="square image size")
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--intersector", default="brute",
                   choices=["brute", "bvh", "pallas"])
    p.add_argument("--out", default="cornell.png")
    p.add_argument("--save-scene", default="cornell.npz")
    p.add_argument("--variant", default="blocks",
                   choices=["blocks", "spheres", "glass"],
                   help="two rotated boxes (classic), the two-sphere "
                        "variant (mirror + diffuse spheres), or the "
                        "glass variant (dielectric sphere + mirror "
                        "block: Snell refraction with Schlick Fresnel)")
    p.add_argument("--checker", action="store_true",
                   help="checker the floor (procedural UV texture, "
                        "Scene.tex_kind 1)")
    args = p.parse_args(argv)

    import jax

    from mirror_maze_tpu.config import (
        CameraConfig, EngineConfig, ScreenConfig,
    )
    from mirror_maze_tpu.render import (
        make_camera, render_full_frame, to_display, upload_scene,
    )
    from mirror_maze_tpu.scene import save_scene
    from mirror_maze_tpu.utils.imageio import write_png

    scene = build_cornell_box(args.variant)
    if args.checker:
        scene = checker_floor(scene)
    if args.save_scene:
        save_scene(args.save_scene, scene)
        print(f"wrote {args.save_scene} ({scene.num_planes} planes, "
              f"{scene.num_spheres} spheres)")

    cfg = EngineConfig(
        camera=CameraConfig(spawn=(0.0, -3.0, -10.0), look_dir=(0, 0, 1)),
        screen=ScreenConfig(width=args.size, height=args.size,
                            samples_per_pixel=args.spp),
        intersector=args.intersector,
    )
    dev = upload_scene(scene)
    cam = make_camera(cfg.camera, 1.0)
    img = render_full_frame(dev, cam, jax.random.PRNGKey(0), cfg)
    write_png(args.out, np.asarray(to_display(img)))
    print(f"wrote {args.out} ({args.size}x{args.size}, {args.spp} spp, "
          f"{args.intersector})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
