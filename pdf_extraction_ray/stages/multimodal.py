"""Multimodal column plumbing: opaque binary media + typed metadata.

Beyond-the-reference operators for image/audio payload pipelines.
``MediaFeatureExtractor`` computes byte-level features (length, sha256,
entropy) and REAL image decodes for the formats a stdlib build can carry:

* PNG — full decode via zlib: chunk walk, IDAT inflate, scanline
  unfilter (filters 0-4), 8-bit gray/RGB/RGBA → true dims + mean pixel
* BMP — BITMAPINFOHEADER dims (no pixel decode needed for features)

Unknown formats fall back to a clearly-marked deterministic fake
(``_fallback_dims``) with ``decoded=False`` — the swap-in point for a
PIL/libsndfile build. Audio/video stay opaque binary columns.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("media_sha256", pa.string()),
    ("entropy_cbits", pa.int64()),   # centibits/byte (integer for oracle-ability)
    ("width", pa.int64()),
    ("height", pa.int64()),
    ("channels", pa.int64()),
    ("mean_pixel", pa.int64()),      # floor of the decoded-pixel mean; -1 undecoded
    ("decoded", pa.bool_()),
])

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# stream channels per color type; type 3 (palette) carries 1 index byte
# per pixel in the IDAT stream and resolves through PLTE to RGB below
# (tRNS alpha is out of scope: such payloads keep their RGB triple)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> dict | None:
    """Pure-stdlib PNG decode (8-bit depth, non-interlaced; gray / RGB /
    gray+alpha / RGBA / palette).

    Returns {width, height, channels, pixels} or None when the payload is
    not a PNG this decoder handles. Palette (color_type 3) images
    resolve indices through PLTE and come back as channels=3 RGB.
    """
    if not payload.startswith(_PNG_SIG):
        return None
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = b""
    n = len(payload)
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # chunk + CRC
        if typ == b"IHDR":
            if len(data) < 13:
                return None
            width, height = struct.unpack(">II", data[:8])
            bit_depth, color_type = data[8], data[9]
            interlace = data[12]
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if (width is None or bit_depth != 8 or interlace
            or color_type not in _PNG_CHANNELS):
        return None
    if color_type == 3 and (not plte or len(plte) % 3):
        return None  # palette image without a usable PLTE
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    import numpy as np

    # scanline view: column 0 = filter byte, rest = filtered bytes
    arr = np.frombuffer(raw, np.uint8,
                        count=height * (stride + 1)).reshape(height,
                                                             stride + 1)
    filters = arr[:, 0]
    if filters.max(initial=0) > 4:
        return None
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        f = filters[y]
        line = arr[y, 1:].copy()
        if f == 1:    # Sub: per-channel cumulative sum along x (mod 256
            # distributes over the cumsum, so a wide cumsum + mask is exact)
            for c in range(channels):
                line[c::channels] = (np.cumsum(line[c::channels],
                                               dtype=np.uint64) & 0xFF)
        elif f == 2:  # Up: whole-line vector add
            line += prev
        elif f == 3:  # Average (sequential along x → bytearray loop)
            ln, pv = bytearray(line.tobytes()), prev.tobytes()
            for x in range(stride):
                a = ln[x - channels] if x >= channels else 0
                ln[x] = (ln[x] + ((a + pv[x]) >> 1)) & 0xFF
            line = np.frombuffer(bytes(ln), np.uint8)
        elif f == 4:  # Paeth (inherently sequential along x)
            ln, pv = bytearray(line.tobytes()), prev.tobytes()
            for x in range(stride):
                a = ln[x - channels] if x >= channels else 0
                b = pv[x]
                c = pv[x - channels] if x >= channels else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_
                                                           else c)
                ln[x] = (ln[x] + pred) & 0xFF
            line = np.frombuffer(bytes(ln), np.uint8)
        out[y] = line
        prev = line
    if color_type == 3:
        # resolve palette indices → RGB (vectorized gather)
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = out.reshape(-1)
        if int(idx.max(initial=0)) >= len(pal):
            return None  # index past palette end: corrupt payload
        return {"width": width, "height": height, "channels": 3,
                "pixels": pal[idx].tobytes()}
    return {"width": width, "height": height, "channels": channels,
            "pixels": out.tobytes()}


def decode_bmp_header(payload: bytes) -> dict | None:
    """BMP dimensions from the BITMAPINFOHEADER (no pixel decode)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    return {"width": int(w), "height": abs(int(h)),
            "channels": max(1, bpp // 8)}


def _entropy_cbits(payload: bytes) -> int:
    """Byte-histogram Shannon entropy in centibits/byte (0..800)."""
    if not payload:
        return 0
    import numpy as np

    counts = np.bincount(np.frombuffer(payload, np.uint8), minlength=256)
    nz = counts[counts > 0].astype(np.float64)
    p = nz / len(payload)
    h = float(-(p * np.log2(p)).sum())
    return int(round(h * 100))


def ahash64(payload: bytes) -> int | None:
    """64-bit average-hash perceptual fingerprint of a decodable image:
    nearest-neighbor downsample to 8x8 (multi-channel averaged to gray),
    then one bit per cell for value > integer mean. Invariant to uniform
    brightness shifts (both sides of the comparison move together) —
    which byte-level hashes are not. None when the payload can't decode.
    """
    img = decode_png(payload)
    if img is None:
        return None
    w, h, ch = img["width"], img["height"], img["channels"]
    px = img["pixels"]
    if w < 1 or h < 1 or not px:
        return None
    samples = []
    for gy in range(8):
        y = (gy * h) // 8
        base = y * w * ch
        for gx in range(8):
            x = (gx * w) // 8
            off = base + x * ch
            samples.append(sum(px[off:off + ch]) // ch)
    mean = sum(samples) // 64
    bits = 0
    for i, v in enumerate(samples):
        if v > mean:
            bits |= 1 << i
    return bits


def phash_dup_pairs(ds, media_col: str = "html", id_col: str = "doc_id"):
    """Perceptual near-dup pairs: equal aHash ⇒ candidate duplicates.

    hash per image in a map stage → groupby(phash) co-locates candidates
    → within-group pairs (a < b). Undecodable payloads drop out. The
    classic image-dedup shape for training corpora: catches re-encoded /
    brightness-shifted copies that content-hash dedup misses.
    """
    import pandas as pd

    def add_hash(batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        col = batch[media_col]
        for i, doc in enumerate(batch[id_col].to_pylist()):
            h = ahash64(col[i].as_py() or b"")
            if h is not None:
                ids.append(doc)
                hashes.append(h)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "phash": pa.array(hashes, pa.uint64())})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pa.Table:
        from .dedup import _upper_pairs
        return _upper_pairs(g[id_col].to_numpy())

    return hashed.groupby("phash").map_groups(pairs, batch_format="pandas")


def _fallback_dims(payload: bytes) -> tuple[int, int]:
    """FALLBACK for undecodable formats: deterministic fake dims from the
    content hash so downstream plumbing (schemas, joins, partitioning on
    dims) stays exercisable; rows carry ``decoded=False``. Swap-in point
    for a PIL/libsndfile decoder where those libraries exist.
    """
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


class MediaFeatureExtractor:
    """Actor-pool stage over an opaque binary media column.

    Use with small batch sizes: a batch is ``batch_size`` multi-MB blobs
    resident in one actor's heap (the engine's memory-sizing rule for
    wide binary rows)."""

    def __init__(self, media_col: str = "html", media_type: str = "image"):
        self.media_col = media_col
        self.media_type = media_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        col = batch[self.media_col]
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            png = decode_png(payload)
            if png is not None:
                w, h, ch = png["width"], png["height"], png["channels"]
                px = png["pixels"]
                if px:
                    import numpy as np
                    mean_pixel = int(
                        np.frombuffer(px, np.uint8).sum(dtype=np.int64)
                        // len(px))
                else:
                    mean_pixel = 0
                decoded = True
            else:
                bmp = decode_bmp_header(payload)
                if bmp is not None:
                    w, h, ch = bmp["width"], bmp["height"], bmp["channels"]
                    mean_pixel = -1  # header-only decode
                    decoded = True
                else:
                    w, h = _fallback_dims(payload)
                    ch, mean_pixel, decoded = 0, -1, False
            rows.append({
                "url": batch["url"][i].as_py(),
                "media_type": self.media_type,
                "n_bytes": len(payload),
                "media_sha256": hashlib.sha256(payload).hexdigest(),
                "entropy_cbits": _entropy_cbits(payload),
                "width": w,
                "height": h,
                "channels": ch,
                "mean_pixel": mean_pixel,
                "decoded": decoded,
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_features(pages_ds, media_col: str = "html",
                   batch_size: int = 16, concurrency=(1, 8)):
    """Pages dataset → media feature rows (actor pool, small batches)."""
    return pages_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


AUDIO_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("n_bytes", pa.int64()),
    ("media_sha256", pa.string()),
    ("sample_rate", pa.int64()),
    ("n_samples", pa.int64()),
    ("duration_ms", pa.int64()),
    ("mean_abs", pa.int64()),        # floor of mean |amplitude|; -1 undecoded
    ("decoded", pa.bool_()),
])


def decode_wav(payload: bytes) -> dict | None:
    """Pure-stdlib RIFF/WAVE decode (PCM mono/stereo, 16-bit).

    Returns {sample_rate, channels, samples: np.int16} or None when the
    payload is not a WAV this decoder handles."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    n = len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        typ = payload[pos:pos + 4]
        ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks pad to even
        if typ == b"fmt " and len(body) >= 16:
            fmt_code, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt_code != 1:
                return None  # not PCM
        elif typ == b"data":
            data = body
    if rate is None or data is None or bits != 16 or not channels:
        return None
    samples = np.frombuffer(data[:len(data) - (len(data) % 2)], "<i2")
    return {"sample_rate": int(rate), "channels": int(channels),
            "samples": samples}


class AudioFeatureExtractor:
    """Actor-pool stage for opaque audio columns: real WAV/PCM decode
    (duration, amplitude stats), deterministic fallback rows otherwise —
    the audio sibling of ``MediaFeatureExtractor``."""

    def __init__(self, media_col: str = "html"):
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rows = []
        col = batch[self.media_col]
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            wav = decode_wav(payload)
            if wav is not None and len(wav["samples"]):
                s = wav["samples"]
                rate = wav["sample_rate"]
                ns = len(s) // wav["channels"]
                mean_abs = int(np.abs(s.astype(np.int64)).sum() // len(s))
                row = {"sample_rate": rate, "n_samples": ns,
                       "duration_ms": ns * 1000 // rate,
                       "mean_abs": mean_abs, "decoded": True}
            else:
                row = {"sample_rate": 0, "n_samples": 0, "duration_ms": 0,
                       "mean_abs": -1, "decoded": False}
            row.update({
                "url": batch["url"][i].as_py(),
                "n_bytes": len(payload),
                "media_sha256": hashlib.sha256(payload).hexdigest(),
            })
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA)


def audio_features(ds, media_col: str = "html", batch_size: int = 64,
                   concurrency=(1, 8)):
    """Audio dataset → feature rows (actor pool, small batches)."""
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def resize_nearest(pixels: bytes, w: int, h: int, channels: int,
                   out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a decoded pixel buffer: fully
    vectorized index mapping ``src = out * src_dim // out_dim``."""
    import numpy as np

    arr = np.frombuffer(pixels, np.uint8).reshape(h, w * channels)
    arr = arr.reshape(h, w, channels)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)].tobytes()


class ImageResizer:
    """Actor-pool resize stage: PNG decode → nearest-neighbor resize →
    (dims + resized-pixel mean). The resize step of the multimodal
    mandate with real pixel math (swap the decoder for PIL where it
    exists)."""

    def __init__(self, out_w: int = 16, out_h: int = 16,
                 media_col: str = "html"):
        self.out_w = out_w
        self.out_h = out_h
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        urls, ws, hs, means, oks = [], [], [], [], []
        col = batch[self.media_col]
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            img = decode_png(payload)
            urls.append(batch["url"][i].as_py())
            if img is None or not img["pixels"]:
                ws.append(0), hs.append(0), means.append(-1), oks.append(False)
                continue
            px = resize_nearest(img["pixels"], img["width"], img["height"],
                                img["channels"], self.out_w, self.out_h)
            means.append(int(np.frombuffer(px, np.uint8)
                             .sum(dtype=np.int64) // len(px)))
            ws.append(self.out_w), hs.append(self.out_h), oks.append(True)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_pixel": pa.array(means, pa.int64()),
            "decoded": pa.array(oks, pa.bool_()),
        })


def iter_video_frames(payload: bytes):
    """Walk the RVID frame container: yields (frame_idx, frame_bytes).
    Stops cleanly on truncation."""
    from ..sources.gen_media import VIDEO_MAGIC

    if len(payload) < 8 or payload[:4] != VIDEO_MAGIC:
        return
    n = int.from_bytes(payload[4:8], "little")
    pos = 8
    for f in range(n):
        if pos + 4 > len(payload):
            return
        ln = int.from_bytes(payload[pos:pos + 4], "little")
        pos += 4
        if pos + ln > len(payload):
            return
        yield f, payload[pos:pos + ln]
        pos += ln


class VideoFrameSampler:
    """Actor-pool frame-sample stage: walk the frame container, keep
    every ``step``-th frame, decode each kept frame (real PNG decode) —
    the frame-sample step of the multimodal mandate. One input row
    fans out to one row per sampled frame."""

    def __init__(self, step: int = 2, media_col: str = "html"):
        self.step = step
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        urls, idxs, ws, hs, means = [], [], [], [], []
        col = batch[self.media_col]
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            url = batch["url"][i].as_py()
            for f, frame in iter_video_frames(payload):
                if f % self.step:
                    continue
                img = decode_png(frame)
                if img is None or not img["pixels"]:
                    continue
                urls.append(url)
                idxs.append(f)
                ws.append(img["width"])
                hs.append(img["height"])
                px = img["pixels"]
                means.append(int(np.frombuffer(px, np.uint8)
                                 .sum(dtype=np.int64) // len(px)))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_pixel": pa.array(means, pa.int64()),
        })


class AudioResampler:
    """Actor-pool stage: 2:1 PCM downsample (pair mean) — the cheapest
    real resampler (8 kHz → 4 kHz), exact integers end to end: out_j =
    (s_{2j} + s_{2j+1} + 131072) // 2 − 65536 (the +2^17 shift makes
    the sum non-negative BEFORE the floor division, so numpy, Python
    and SQL `//` agree on negative samples — truncation vs floor). A
    trailing unpaired sample drops (n_out = n // 2). Emits summary
    rows (the payload-out variant would write WAVs back through the
    content-addressed sink); undecodable payloads report decoded=False.
    """

    def __init__(self, media_col: str = "html"):
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rows = []
        col = batch[self.media_col]
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            wav = decode_wav(payload)
            if wav is not None and wav["channels"] == 1 \
                    and len(wav["samples"]) >= 2:
                s = wav["samples"].astype(np.int64)
                n_out = len(s) // 2
                pair = s[:2 * n_out].reshape(n_out, 2)
                out = (pair[:, 0] + pair[:, 1] + 131072) // 2 - 65536
                rows.append({
                    "url": batch["url"][i].as_py(),
                    "rate_out": wav["sample_rate"] // 2,
                    "n_out": int(n_out),
                    "mean_abs_out": int(np.abs(out).sum() // n_out),
                    "checksum": int(out.sum()),
                    "decoded": True})
            else:
                rows.append({"url": batch["url"][i].as_py(),
                             "rate_out": 0, "n_out": 0,
                             "mean_abs_out": -1, "checksum": 0,
                             "decoded": False})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("url", pa.string()), ("rate_out", pa.int64()),
            ("n_out", pa.int64()), ("mean_abs_out", pa.int64()),
            ("checksum", pa.int64()), ("decoded", pa.bool_())]))


def audio_resample(ds, media_col: str = "html", batch_size: int = 64,
                   concurrency: int = 4):
    """Actor-pool wrapper (the audio_features convention): decode +
    2:1 integer downsample per payload, summary rows out."""
    return ds.map_batches(AudioResampler(media_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class ImageHistogram:
    """Actor-pool stage: luminance histogram per image — the CV
    preprocessing statistic (exposure/contrast screens, dedup
    features) computed from REAL decoded pixels (`decode_png`), binned
    to ``bins`` equal-width buckets over 0..255. RGB images luminance
    via the integer ITU-R 601 approximation (77R + 150G + 29B) >> 8 —
    pure integers, SQL-replayable. Emits one (url, bin, n_px) row per
    NON-EMPTY bin (zero bins are omitted on both engines); an
    undecodable payload emits ONE (url, -1, 0) marker row — never a
    silent drop (the AudioResampler convention; a vanished doc would
    read as an unexplained missing-rows diff downstream)."""

    def __init__(self, media_col: str = "html", bins: int = 16):
        self.media_col = media_col
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        out_u, out_b, out_n = [], [], []
        col = batch[self.media_col]
        width = 256 // self.bins
        for i in range(len(batch)):
            payload = col[i].as_py() or b""
            img = decode_png(payload)
            if img is None:
                out_u.append(batch["url"][i].as_py())
                out_b.append(-1)   # undecodable marker, never silent
                out_n.append(0)
                continue
            px = np.frombuffer(img["pixels"], np.uint8).astype(np.int64)
            ch = img["channels"]
            if ch >= 3:
                px = px.reshape(-1, ch)
                lum = (77 * px[:, 0] + 150 * px[:, 1]
                       + 29 * px[:, 2]) >> 8
            elif ch == 2:   # gray + alpha: luminance is the gray plane
                lum = px.reshape(-1, 2)[:, 0]
            else:
                lum = px
            bins_of = lum // width
            uniq, counts = np.unique(bins_of, return_counts=True)
            url = batch["url"][i].as_py()
            out_u.extend([url] * len(uniq))
            out_b.extend(uniq.tolist())
            out_n.extend(counts.tolist())
        return pa.table({"url": pa.array(out_u, pa.string()),
                         "bin": pa.array(out_b, pa.int64()),
                         "n_px": pa.array(out_n, pa.int64())})


def image_histogram(ds, media_col: str = "html", bins: int = 16,
                    batch_size: int = 32, concurrency: int = 4):
    """Actor-pool wrapper (the media_features convention)."""
    return ds.map_batches(ImageHistogram(media_col, bins),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
