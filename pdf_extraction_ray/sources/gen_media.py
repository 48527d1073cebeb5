"""Deterministic media-payload synthesis (PNG / BMP) for the multimodal
pipeline.

Every pixel is a pure function of ``(doc_id, x, y)`` so the decode stage
has a closed-form oracle: ``pixel = (doc_id + 7x + 13y) % 256``,
``width = 8 + doc_id % 25``, ``height = 8 + doc_id % 17`` — all
expressible in SQL for the driver's value-hash gate.
"""

from __future__ import annotations

import struct
import zlib


def media_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 25, 8 + doc_id % 17


def pixel_value(doc_id: int, x: int, y: int) -> int:
    return (doc_id + 7 * x + 13 * y) % 256


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def build_png(doc_id: int) -> bytes:
    """8-bit grayscale PNG, filter type 0 scanlines, single IDAT."""
    w, h = media_dims(doc_id)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: None
        for x in range(w):
            raw.append(pixel_value(doc_id, x, y))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no interlace
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def build_png_shifted(doc_id: int, delta: int = 0) -> bytes:
    """Grayscale PNG with a brightness-shift-safe TEXTURED pixel law
    (values <= 199 + delta, delta <= 55): a shifted copy has different
    bytes (different sha256) but a provably IDENTICAL average-hash. The
    multiplicative x*y texture keeps per-doc hashes distinct (a smooth
    gradient law makes every doc aHash-collide — pathological input for
    average hashing)."""
    w, h = media_dims(doc_id)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        for x in range(w):
            raw.append((doc_id * 31 + (7 * x + 1) * (5 * y + 3) + x)
                       % 200 + delta)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


PALETTE_SIZE = 64


def palette_rgb(i: int) -> tuple[int, int, int]:
    """Closed-form PLTE entry law (SQL-expressible)."""
    return (3 * i) % 256, (5 * i + 1) % 256, (7 * i + 2) % 256


def build_png_palette(doc_id: int) -> bytes:
    """8-bit PALETTE PNG (color_type 3): index law
    ``idx = pixel_value(doc_id, x, y) % PALETTE_SIZE`` with the
    closed-form palette above — the resolved RGB pixels (and their
    mean) stay SQL-expressible for the decode oracle."""
    w, h = media_dims(doc_id)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: None
        for x in range(w):
            raw.append(pixel_value(doc_id, x, y) % PALETTE_SIZE)
    plte = bytearray()
    for i in range(PALETTE_SIZE):
        plte += bytes(palette_rgb(i))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)  # palette
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", bytes(plte))
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def build_bmp(doc_id: int) -> bytes:
    """Minimal 24-bit BMP (BITMAPINFOHEADER) with the same pixel law."""
    w, h = media_dims(doc_id)
    row_pad = (-3 * w) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # BMP stores bottom-up
        for x in range(w):
            v = pixel_value(doc_id, x, y)
            rows += bytes((v, v, v))
        rows += b"\x00" * row_pad
    header_size = 14 + 40
    file_size = header_size + len(rows)
    return (b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                          2835, 2835, 0, 0)
            + bytes(rows))


def wav_params(doc_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples); sample law below — closed-form for SQL."""
    return 8000, 400 + doc_id % 800


def wav_sample(doc_id: int, i: int) -> int:
    """16-bit PCM sample law: ((doc_id*37 + 11*i) % 65536) - 32768."""
    return (doc_id * 37 + 11 * i) % 65536 - 32768


def build_wav(doc_id: int) -> bytes:
    """Minimal RIFF/WAVE, PCM mono 16-bit, one data chunk."""
    rate, n = wav_params(doc_id)
    samples = bytearray()
    for i in range(n):
        samples += struct.pack("<h", wav_sample(doc_id, i))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    data = bytes(samples)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


VIDEO_MAGIC = b"RVID"


def video_params(doc_id: int) -> int:
    """Frame count per synthetic video clip."""
    return 4 + doc_id % 9


def build_video(doc_id: int) -> bytes:
    """Minimal frame-container 'video': magic + frame count + length-
    prefixed PNG frames (frame f follows the pixel law of
    ``doc_id * 1000 + f``). A real decoder swap-in point (ffmpeg-style
    containers are out of scope for a stdlib build); the container walk,
    frame indexing, and per-frame decode plumbing are real.
    """
    n = video_params(doc_id)
    out = bytearray(VIDEO_MAGIC + struct.pack("<I", n))
    for f in range(n):
        frame = build_png(doc_id * 1000 + f)
        out += struct.pack("<I", len(frame)) + frame
    return bytes(out)
