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


def ansi_frame(img: np.ndarray, max_cols: int = 100) -> str:
    """Render an RGB uint8 image as 24-bit ANSI half-block art.

    Each character cell shows two vertically-stacked pixels (upper-half
    block with independent fg/bg colors), the closest a plain terminal
    gets to the reference's window (`utils.rs:104-168`). Downsamples by
    integer striding to fit max_cols.
    """
    h, w = img.shape[:2]
    step = max(1, -(-w // max_cols))
    small = img[::step, ::step]
    if small.shape[0] % 2:
        small = small[:-1]
    top, bot = small[0::2], small[1::2]
    if top.shape[0]:
        # Native presenter (native/term_present.cpp) — the per-frame host
        # hot loop of interactive play; byte-identical Python fallback
        # below (tested in tests/test_native.py).
        from ..native.bindings import ansi_halfblocks_native

        art = ansi_halfblocks_native(top, bot)
        if art is not None:
            return art
    rows = []
    for tr, br in zip(top, bot):
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(tr, br)
        ]
        rows.append("".join(cells) + "\x1b[0m")
    return "\n".join(rows)


def kitty_frame(img: np.ndarray) -> str:
    """Encode an RGB uint8 image as a kitty graphics-protocol escape
    sequence (APC G, f=24 raw RGB, chunked base64) — full-resolution
    in-terminal display for terminals that speak it (kitty, ghostty,
    wezterm). The half-block `ansi_frame` is the portable fallback."""
    import base64

    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    payload = base64.standard_b64encode(img.tobytes()).decode("ascii")
    chunks = [payload[i:i + 4096] for i in range(0, len(payload), 4096)]
    out = []
    for i, chunk in enumerate(chunks):
        ctrl = f"a=T,f=24,s={w},v={h}," if i == 0 else ""
        m = 1 if i + 1 < len(chunks) else 0
        out.append(f"\x1b_G{ctrl}m={m};{chunk}\x1b\\")
    return "".join(out)


def read_png(path: str) -> np.ndarray:
    """Read a PNG to an [H, W, C] uint8 array (PIL path only; used for the
    optional noise-texture load and golden-image tests)."""
    from PIL import Image

    return np.asarray(Image.open(path))
