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


def encode_png(rgb8: np.ndarray) -> bytes:
    """Minimal dependency-free PNG encoder (8-bit RGB) -> bytes."""
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
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def write_png(path: str, rgb8: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(rgb8))


def write_exr(path: str, image: np.ndarray) -> None:
    """Minimal OpenEXR 2.0 writer: single part, uncompressed, float32
    R/G/B scanlines.  HDR radiance goes to disk unclamped — the analog of
    the reference's raw accumulator texture (its tonemapping lived in the
    display shader, /root/reference/app/assets/fs.glsl:12), but in a
    format downstream tools read."""
    img = np.asarray(image, np.float32)
    h, w, c = img.shape
    assert c == 3

    def attr(name: bytes, typ: bytes, data: bytes) -> bytes:
        return name + b"\0" + typ + b"\0" + struct.pack("<I", len(data)) + data

    def chan(name: bytes) -> bytes:
        # name, pixel_type=2 (FLOAT), pLinear + 3 reserved, x/y sampling
        return name + b"\0" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)

    channels = chan(b"B") + chan(b"G") + chan(b"R") + b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        struct.pack("<I", 20000630)  # magic
        + struct.pack("<I", 2)  # version 2, no flags
        + attr(b"channels", b"chlist", channels)
        + attr(b"compression", b"compression", b"\0")  # NO_COMPRESSION
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\0")  # INCREASING_Y
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + b"\0"  # end of header
    )
    scan_bytes = 8 + 3 * 4 * w  # y + size prefix + 3 float channels
    table_start = len(header)
    data_start = table_start + 8 * h
    offsets = struct.pack(
        "<%dQ" % h, *[data_start + y * scan_bytes for y in range(h)]
    )
    with open(path, "wb") as f:
        f.write(header)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, 3 * 4 * w))
            # channels in name order: B, G, R
            f.write(np.ascontiguousarray(img[y, :, 2]).tobytes())
            f.write(np.ascontiguousarray(img[y, :, 1]).tobytes())
            f.write(np.ascontiguousarray(img[y, :, 0]).tobytes())


def read_exr(path: str) -> np.ndarray:
    """Read back images written by `write_exr` (uncompressed float32
    B/G/R) — the round-trip half used by tests and the resume path."""
    blob = open(path, "rb").read()
    magic, _version = struct.unpack("<II", blob[:8])
    assert magic == 20000630, "not an EXR file"
    pos = 8
    attrs = {}
    while blob[pos] != 0:
        end = blob.index(b"\0", pos)
        name = blob[pos:end].decode()
        pos = end + 1
        end = blob.index(b"\0", pos)
        pos = end + 1
        (size,) = struct.unpack("<I", blob[pos : pos + 4])
        pos += 4
        attrs[name] = blob[pos : pos + size]
        pos += size
    pos += 1  # header terminator
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    assert attrs["compression"] == b"\0", "only uncompressed EXR supported"
    pos += 8 * h  # offset table
    img = np.empty((h, w, 3), np.float32)
    for _ in range(h):
        y, size = struct.unpack("<ii", blob[pos : pos + 8])
        pos += 8
        row = np.frombuffer(blob[pos : pos + size], np.float32).reshape(3, w)
        pos += size
        img[y, :, 2] = row[0]  # B
        img[y, :, 1] = row[1]  # G
        img[y, :, 0] = row[2]  # R
    return img


def write_ppm(path: str, rgb8: np.ndarray) -> None:
    """Trivial PPM writer (debugging)."""
    h, w, _ = rgb8.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(rgb8.tobytes())


def save_render(path: str, image, exposure: float = 1.0, gamma: float = 2.2):
    """Tonemap a normalized radiance image and write PNG (or PPM by suffix).

    The accumulator's row 0 carries the *downward*-tilted primary rays
    (the reference's array layout: screenY=+1 -> topOffset points to -y,
    /root/reference/src/Scene/Trace.hs:234-253).  The reference displays
    that array through an OpenGL texture whose v=0 row lands at the
    *bottom* of the window (/root/reference/app/Main.hs:382-393 +
    app/assets/vs.glsl), so its window shows the world upright; file
    formats put row 0 at the top, so flip vertically here — the display
    boundary — to match what a reference user saw.  Array-level parity
    (tests, oracles) is unaffected.

    Uses the native C++ tonemap + encoder (runtime/native) when built; the
    pure-Python path above is the always-available fallback and the
    behavioral spec the native path is tested against."""
    from ..runtime import native

    img = np.asarray(image)[::-1]
    if path.endswith(".exr"):
        # HDR: raw radiance, no tonemap.
        write_exr(path, img)
        return path
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
