"""Image IO: PNG read/write.

The display path is the only place frames cross device->host (the reference
likewise never reads the image back — it flows screen texture -> drawable,
`SURVEY.md` section 3 boundary summary). Uses PIL when present, else a
minimal built-in PNG codec so the engine has zero hard imaging deps.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, img: np.ndarray) -> None:
    """Write an [H, W, 3] uint8 (or float in [0,1]) array as PNG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.round(np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(img, mode="RGB").save(path)
        return
    except ImportError:
        pass
    _write_png_builtin(path, img)


def _write_png_builtin(path: str, img: np.ndarray) -> None:
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def read_png(path: str) -> np.ndarray:
    """Read a PNG to an [H, W, C] uint8 array (PIL path only; used for the
    optional noise-texture load and golden-image tests)."""
    from PIL import Image

    return np.asarray(Image.open(path))
