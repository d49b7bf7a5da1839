"""Image output: tonemap + PNG/PPM writers.

Replaces the reference's display path — the OpenGL fragment shader that
divides the accumulator by the iteration count at display time
(/root/reference/app/assets/fs.glsl:12) and the SDL window
(/root/reference/app/Main.hs:326-408).  On a TPU pod there is no window;
the accumulator is normalized on device (`Accumulator.image`), tonemapped,
and written to disk.  A native C++ encoder (runtime/native) is used when
built (the reference hit ~200 ms on naive host-side pixel conversion,
app/Main.hs:378-381 — the C path exists for the same reason); this module
always provides the pure-Python fallback.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap(image: np.ndarray, exposure: float = 1.0, gamma: float = 2.2) -> np.ndarray:
    """HDR radiance -> display: exposure scale, Reinhard, gamma. uint8 [H,W,3].

    The reference displays raw averaged radiance (fs.glsl:12 does only the
    division); `gamma=1.0, reinhard=False` reproduces that.  Defaults give a
    usable LDR image.
    """
    x = np.asarray(image, np.float32) * np.float32(exposure)
    x = x / (1.0 + x)  # Reinhard
    x = np.clip(x, 0.0, 1.0) ** np.float32(1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, rgb8: np.ndarray) -> None:
    """Minimal dependency-free PNG encoder (8-bit RGB)."""
    h, w, c = rgb8.shape
    assert c == 3 and rgb8.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # filter type 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb8.reshape(h, w * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, rgb8: np.ndarray) -> None:
    """Trivial PPM writer (debugging)."""
    h, w, _ = rgb8.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(rgb8.tobytes())


def save_render(path: str, image, exposure: float = 1.0, gamma: float = 2.2):
    """Tonemap a normalized radiance image and write PNG (or PPM by suffix).

    Uses the native C++ tonemap + encoder (runtime/native) when built; the
    pure-Python path above is the always-available fallback and the
    behavioral spec the native path is tested against."""
    from ..runtime import native

    img = np.asarray(image)
    if native.available():
        rgb8 = native.tonemap_rgb8(
            np.ascontiguousarray(img, np.float32), exposure, gamma
        )
        if not path.endswith(".ppm"):
            native.write_png(path, rgb8)
            return path
    else:
        rgb8 = tonemap(img, exposure=exposure, gamma=gamma)
    if path.endswith(".ppm"):
        write_ppm(path, rgb8)
    else:
        write_png(path, rgb8)
    return path
