from .accumulate import feedback_blur, quantize_8bit, scatter_chunks, to_display  # noqa: F401
from .camera import Camera, make_camera, ray_directions  # noqa: F401
from .campath import (orbit_cameras, render_path, spin_cameras,  # noqa: F401
                      waypoint_cameras)
from .intersect import nearest_hit_brute, nearest_hit_bvh, ray_aabb  # noqa: F401
from .pipeline import make_nearest_fn, render_full_frame, render_pixels  # noqa: F401
from .scenebuf import DeviceScene, upload_scene  # noqa: F401
from .scheduler import chunk_origin_xy, chunk_pixels, init_permutation, take_chunks  # noqa: F401
from .tracer import tone_map, trace_paths  # noqa: F401
