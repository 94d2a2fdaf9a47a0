"""ctypes bindings for the native (C++) init pipeline, with lazy build
and a transparent NumPy fallback.

The reference's host subsystems are all native (Rust); here the per-frame
path is XLA/Pallas and only init-time scene preparation remains host-side.
The SAH BVH builder is its hot spot (SURVEY.md section 3.1) and gets a C++
implementation, compiled on first use with the system toolchain. If no
compiler is available the pure-NumPy builder (scene/bvh.py) is used — the
two produce identical output by construction (tested in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_HERE, "bvh_builder.cpp"),
    os.path.join(_HERE, "term_present.cpp"),
]
_SO = os.path.join(_HERE, "libmmx_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build_library() -> str | None:
    if os.path.exists(_SO) and all(
        os.path.getmtime(_SO) >= os.path.getmtime(s) for s in _SRCS
    ):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO + ".tmp"] + _SRCS,
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


def get_library():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        for attempt in range(2):
            try:
                _lib = _load_and_bind()
                return _lib
            except (OSError, AttributeError):
                # AttributeError = a stale .so whose mtime passed the
                # check but which predates newer exports; rebuild once.
                try:
                    os.remove(_SO)
                except OSError:
                    return None
        return None


def _load_and_bind():
    path = _build_library()
    if path is None:
        raise OSError("native build unavailable")
    lib = ctypes.CDLL(path)
    lib.mmx_bvh_build.restype = ctypes.c_void_p
    lib.mmx_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.mmx_bvh_num_nodes.restype = ctypes.c_int64
    lib.mmx_bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.mmx_bvh_export.restype = None
    lib.mmx_bvh_export.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mmx_bvh_free.restype = None
    lib.mmx_bvh_free.argtypes = [ctypes.c_void_p]
    lib.mmx_ansi_halfblocks.restype = ctypes.c_int64
    lib.mmx_ansi_halfblocks.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.mmx_term_poll.restype = ctypes.c_int64
    lib.mmx_term_poll.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
    ]
    return lib


def native_available() -> bool:
    return get_library() is not None


def build_bvh_native(origin: np.ndarray, u: np.ndarray, v: np.ndarray):
    """C++ BVH build; returns a scene/bvh.py BVH or None if unavailable."""
    from ..scene.bvh import BVH

    lib = get_library()
    if lib is None:
        return None
    n = origin.shape[0]
    o = np.ascontiguousarray(origin, np.float32)
    uu = np.ascontiguousarray(u, np.float32)
    vv = np.ascontiguousarray(v, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    handle = lib.mmx_bvh_build(
        o.ctypes.data_as(fp), uu.ctypes.data_as(fp), vv.ctypes.data_as(fp), n
    )
    try:
        m = lib.mmx_bvh_num_nodes(handle)
        aabb_min = np.empty((m, 3), np.float32)
        aabb_max = np.empty((m, 3), np.float32)
        left_first = np.empty(m, np.int32)
        count = np.empty(m, np.int32)
        prim_index = np.empty(n, np.int32)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.mmx_bvh_export(
            handle,
            aabb_min.ctypes.data_as(fp),
            aabb_max.ctypes.data_as(fp),
            left_first.ctypes.data_as(ip),
            count.ctypes.data_as(ip),
            prim_index.ctypes.data_as(ip),
        )
    finally:
        lib.mmx_bvh_free(handle)
    return BVH(
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        left_first=left_first,
        count=count,
        prim_index=prim_index,
    )


def ansi_halfblocks_native(top: np.ndarray, bot: np.ndarray) -> str | None:
    """C++ half-block ANSI presenter (see term_present.cpp); byte-identical
    to utils/imageio.py ansi_frame's cell loop. Returns None if the native
    library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    rows, cols = top.shape[0], top.shape[1]
    t = np.ascontiguousarray(top, np.uint8)
    b = np.ascontiguousarray(bot, np.uint8)
    cap = rows * (cols * 43 + 5) + 1
    buf = ctypes.create_string_buffer(cap)
    up = ctypes.POINTER(ctypes.c_uint8)
    n = lib.mmx_ansi_halfblocks(
        t.ctypes.data_as(up), b.ctypes.data_as(up), rows, cols, buf, cap
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("utf-8")


def term_poll_native(fd: int, cap: int = 256) -> bytes | None:
    """Drain EVERY pending byte on fd without blocking (the reference's
    drain-until-None event pump, `main.rs:896-904`); loops in chunks of
    ``cap`` so a deep backlog (key autorepeat across a stall) cannot
    leave stale input queued. Returns None if the native library is
    unavailable."""
    lib = get_library()
    if lib is None:
        return None
    out = b""
    buf = ctypes.create_string_buffer(cap)
    while True:
        n = lib.mmx_term_poll(fd, buf, cap)
        out += buf.raw[: max(0, n)]
        if n < cap:
            return out
