"""Multimodal (image/audio/video) columns — real Ray-side pipeline with
REAL codecs (pure NumPy/stdlib), compressed PNG included.

Media travel as opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``sample_rate``/``duration_ms``).
The decode / resize / feature-extract / frame-sample operators are
actor-pool ``map_batches`` stages:

- ``ImageDecoder`` / ``AudioDecoder`` decode REAL byte formats —
  zlib-COMPRESSED PNG (8-bit RGB, all five scanline filters:
  ``encode_png`` / ``decode_png``), binary PPM (P6) images and PCM16
  RIFF/WAVE audio — parsed in pure NumPy + stdlib zlib, with vectorized
  nearest-neighbor resize (``resize_nearest``) and 16-dim feature
  extraction from the actual pixels/samples;
- ``DecodeStub`` raises ``NotImplementedError`` when asked for a codec
  beyond these (JPEG/MP3/H.264 need external libraries absent from this
  environment), exactly marking that integration point;
- ``FakeDecoder`` is the deterministic stand-in used by the plumbing
  tests (schema handling, batching, actor reuse) independent of any
  format.

Scale notes: media rows are wide — callers should use a small
``batch_size`` (default 32 here vs thousands for text) so
batch x concurrency stays inside a worker's heap, and keep the column in
``large_binary`` so a block of payloads can exceed 2 GiB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("media_type", pa.string()),  # image/audio/video
    pa.field("payload", pa.large_binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("sample_rate", pa.int32()),
    pa.field("duration_ms", pa.int32()),
])

DEFAULT_MEDIA_BATCH_SIZE = 32  # wide rows: keep batch x concurrency in heap


def synth_media_table(n: int, media_type: str = "image", payload_bytes: int = 4096) -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded pseudo-bytes)."""
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "duration_ms")}
    for i in range(n):
        seed = hashlib.sha256(f"media-{media_type}-{i}".encode()).digest()
        payload = (seed * (payload_bytes // len(seed) + 1))[:payload_bytes]
        rows["media_id"].append(i)
        rows["media_type"].append(media_type)
        rows["payload"].append(payload)
        rows["width"].append(64 if media_type == "image" else 0)
        rows["height"].append(64 if media_type == "image" else 0)
        rows["sample_rate"].append(16000 if media_type == "audio" else 0)
        rows["duration_ms"].append(1000 if media_type != "image" else 0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class DecodeStub:
    """The real-codec integration point. Instantiating is fine (so actor
    pools can be wired); calling it without a codec raises — clearly
    marked NotImplementedError per the build spec."""

    def __init__(self, codec: str = "none"):
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            f"media codec '{self.codec}' not available in this environment; "
            "swap in a real decoder (PIL/torchaudio/decord) at deployment"
        )


class FakeDecoder:
    """Deterministic stand-in decoder (actor-pool stage).

    ``__init__`` once per actor ("model load"); ``__call__`` per batch:
    payload bytes -> fixed-shape float feature vector (mean/std/hist of
    the raw bytes) + payload sha256. Exercises the exact plumbing a real
    decoder needs: large_binary in, fixed_size_list out, metadata
    passthrough."""

    FEATURE_DIM = 16

    def __init__(self):
        self.calls = 0  # visible actor state (setup-once semantics)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.calls += 1
        feats, hashes = [], []
        for payload in batch["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            hist = np.histogram(arr, bins=self.FEATURE_DIM - 2, range=(0, 255))[0]
            vec = np.concatenate([[arr.mean(), arr.std()], hist / max(len(arr), 1)])
            feats.append(vec.astype(np.float32))
            hashes.append(hashlib.sha256(payload).hexdigest())
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), self.FEATURE_DIM
        )
        return batch.append_column(
            "features", feat_col
        ).append_column("payload_sha256", pa.array(hashes, pa.string()))


# ---------------------------------------------------------------------------
# Real codecs (pure NumPy): binary PPM (P6) images, PCM16 RIFF/WAVE audio.
# No external image/audio library — these parse the actual byte formats,
# so the decode stage runs on real decoded pixels/samples end to end.
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> (h, w, 3) uint8 (comments supported)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval, then raw samples
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    if len(payload) - i < n:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(payload, np.uint8, count=n, offset=i).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> PCM16 RIFF/WAVE bytes."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 RIFF/WAVE bytes -> (int16 mono samples, sample_rate).

    Walks the chunk list (fmt before data required; extra chunks skipped)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, sample_rate, samples = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = i + 8
        if cid == b"fmt ":
            if size < 16 or body + 16 > len(payload):
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body)
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            samples = np.frombuffer(payload, "<i2", count=size // 2,
                                    offset=body)
            break
        i = body + size + (size & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("no data chunk")
    return samples, int(sample_rate)


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG filter 4) over int16 arrays."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 -> COMPRESSED PNG bytes (8-bit RGB, color type 2)
    in pure stdlib zlib + NumPy — the compressed-codec integration the
    DecodeStub marked. Scanline filters rotate through all five PNG
    filter types (y % 5) so a round-trip exercises every un-filter path
    of :func:`decode_png`; filtering itself is fully vectorized."""
    import struct
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    lines = []
    prev = np.zeros(w * 3, dtype=np.int16)
    z = np.zeros(3, dtype=np.int16)
    for y in range(h):
        raw = arr[y].reshape(-1).astype(np.int16)
        left = np.concatenate([z, raw[:-3]])
        upleft = np.concatenate([z, prev[:-3]])
        f = y % 5
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw - left
        elif f == 2:
            filt = raw - prev
        elif f == 3:
            filt = raw - ((left + prev) >> 1)
        else:
            filt = raw - _paeth_vec(left, prev, upleft)
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = raw
    idat = zlib.compress(b"".join(lines), level)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """COMPRESSED PNG bytes -> (h, w, 3) uint8, pure stdlib zlib + NumPy.

    Supports the encoder's profile (8-bit RGB, color type 2, no
    interlace) with ALL five scanline filters: None/Sub/Up vectorize per
    row (Sub is a per-lane prefix sum — cumsum mod 256); Average/Paeth
    carry an in-row pixel dependency and reconstruct with a bounded
    per-pixel loop (media rows are KB-sized by contract, see module
    docstring). Chunk CRCs are verified."""
    import struct
    import zlib

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos: pos + 4])
        tag = payload[pos + 4: pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        body = payload[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length: pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG profile (need 8-bit RGB, "
                    f"got depth={depth} color={ctype} interlace={inter})")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    data = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = data[y * (stride + 1)]
        row = np.frombuffer(data, np.uint8, count=stride,
                            offset=y * (stride + 1) + 1).astype(np.int64)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = row.reshape(-1, 3).cumsum(axis=0) & 0xFF
            rec = rec.reshape(-1)
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f in (3, 4):  # in-row pixel dependency: bounded loop
            rec = np.zeros(stride, dtype=np.int64)
            left = np.zeros(3, dtype=np.int64)
            upleft = np.zeros(3, dtype=np.int64)
            for x in range(0, stride, 3):
                up = prev[x: x + 3]
                pred = ((left + up) >> 1) if f == 3 \
                    else _paeth_vec(left, up, upleft)
                rec[x: x + 3] = (row[x: x + 3] + pred) & 0xFF
                left = rec[x: x + 3]
                upleft = up
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor image resize, fully vectorized (fancy indexing)."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows[:, None], cols[None, :]]


def synth_ppm_table(n: int, width: int = 32, height: int = 32) -> pa.Table:
    """Deterministic synthetic REAL-PPM media rows: each payload is a
    valid P6 file of seeded pseudo-random pixels (decode_ppm round-trips
    it bit-exactly)."""
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "duration_ms")}
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(0xBEEF ^ i))
        img = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["media_type"].append("image")
        rows["payload"].append(encode_ppm(img))
        rows["width"].append(width)
        rows["height"].append(height)
        rows["sample_rate"].append(0)
        rows["duration_ms"].append(0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def synth_png_table(n: int, width: int = 32, height: int = 32) -> pa.Table:
    """Deterministic synthetic REAL-PNG media rows: each payload is a
    valid zlib-COMPRESSED PNG of seeded pseudo-random pixels (same pixel
    generator as :func:`synth_ppm_table`, so PPM/PNG feature parity is
    directly testable)."""
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "duration_ms")}
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(0xBEEF ^ i))
        img = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["media_type"].append("image")
        rows["payload"].append(encode_png(img))
        rows["width"].append(width)
        rows["height"].append(height)
        rows["sample_rate"].append(0)
        rows["duration_ms"].append(0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def synth_jpeg_table(n: int, width: int = 32, height: int = 32) -> pa.Table:
    """Deterministic synthetic REAL-JPEG media rows: each payload is a
    valid baseline JFIF (stages/jpeg.py) of a seeded smooth gradient
    (JPEG is lossy — a gradient keeps the decode close enough to assert
    feature sanity, unlike the PPM/PNG exact-pixel parity)."""
    from .jpeg import encode_jpeg

    rows = {k: [] for k in ("media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "duration_ms")}
    for i in range(n):
        yy, xx = np.mgrid[0:height, 0:width]
        img = np.stack([(yy * 4 + i * 17) % 256, (xx * 3 + i * 5) % 256,
                        ((yy + xx) * 2 + i) % 256], axis=-1).astype(np.uint8)
        rows["media_id"].append(i)
        rows["media_type"].append("image")
        rows["payload"].append(encode_jpeg(img, quality=90))
        rows["width"].append(width)
        rows["height"].append(height)
        rows["sample_rate"].append(0)
        rows["duration_ms"].append(0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """Signature-dispatching image decode: JPEG or PNG (compressed) or
    P6 PPM."""
    if payload.startswith(b"\xFF\xD8"):
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"\x89PNG"):
        return decode_png(payload)
    return decode_ppm(payload)


def synth_wav_table(n: int, sample_rate: int = 16000,
                    duration_ms: int = 250) -> pa.Table:
    """Deterministic synthetic REAL-WAV media rows (PCM16 mono sine +
    seeded noise)."""
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "duration_ms")}
    n_samp = sample_rate * duration_ms // 1000
    t = np.arange(n_samp, dtype=np.float64) / sample_rate
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(0xFEED ^ i))
        freq = 110.0 * (1 + (i % 16))
        wave = (0.5 * np.sin(2 * np.pi * freq * t)
                + 0.05 * rng.standard_normal(n_samp))
        samples = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        rows["media_id"].append(i)
        rows["media_type"].append("audio")
        rows["payload"].append(encode_wav(samples, sample_rate))
        rows["width"].append(0)
        rows["height"].append(0)
        rows["sample_rate"].append(sample_rate)
        rows["duration_ms"].append(duration_ms)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class ImageDecoder:
    """REAL image decode actor-pool stage: PPM bytes -> pixels ->
    16-dim features + payload sha256. Same plumbing contract as
    FakeDecoder, but the features come from actual decoded pixels.

    Feature layout (float32): [mean_lum, std_lum, lum_hist_ratio x8,
    width, height, mean_r, mean_g, mean_b, maxval]."""

    FEATURE_DIM = 16

    def __init__(self, resize_to: tuple[int, int] | None = None):
        self.resize_to = resize_to  # (w, h) optional pre-feature resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, hashes = [], []
        for payload in batch["payload"].to_pylist():
            img = decode_image(payload)
            if self.resize_to is not None:
                img = resize_nearest(img, *self.resize_to)
            f = img.astype(np.float64)
            lum = f @ np.array([0.299, 0.587, 0.114])
            hist = np.histogram(lum, bins=8, range=(0, 256))[0] / lum.size
            vec = np.concatenate([
                [lum.mean(), lum.std()], hist,
                [img.shape[1], img.shape[0]],
                f.reshape(-1, 3).mean(axis=0), [255.0],
            ])
            feats.append(vec.astype(np.float32))
            hashes.append(hashlib.sha256(payload).hexdigest())
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), self.FEATURE_DIM)
        return batch.append_column("features", feat_col).append_column(
            "payload_sha256", pa.array(hashes, pa.string()))


class AudioDecoder:
    """REAL audio decode actor-pool stage: WAV bytes -> samples ->
    16-dim features + payload sha256.

    Feature layout (float32): [mean_amp, std_amp, amp_hist_ratio x8,
    sample_rate, n_samples, rms, zero_cross_rate, duration_s, 0]."""

    FEATURE_DIM = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, hashes = [], []
        for payload in batch["payload"].to_pylist():
            samples, rate = decode_wav(payload)
            x = samples.astype(np.float64) / 32768.0
            hist = np.histogram(x, bins=8, range=(-1, 1))[0] / max(x.size, 1)
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
                if x.size > 1 else 0.0
            if x.size:
                mean, std, rms = x.mean(), x.std(), np.sqrt(np.mean(x * x))
            else:  # zero-length data chunk is a legal WAV: zeros, not NaN
                mean = std = rms = 0.0
            vec = np.concatenate([
                [mean, std], hist,
                [rate, x.size, rms, zcr, x.size / rate, 0.0],
            ])
            feats.append(vec.astype(np.float32))
            hashes.append(hashlib.sha256(payload).hexdigest())
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), self.FEATURE_DIM)
        return batch.append_column("features", feat_col).append_column(
            "payload_sha256", pa.array(hashes, pa.string()))


def decode_stage(ds, decoder_cls=FakeDecoder, concurrency=(1, 4),
                 batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    """Attach the decode actor-pool stage (real plumbing; stub decode)."""
    return ds.map_batches(
        decoder_cls,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_stage(ds, every_ms: int = 200,
                       batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    """Video frame sampling plan (metadata-only here): expands each video
    row into (media_id, frame_ts_ms) rows — flat_map semantics expressed
    as a vectorized map_batches."""
    def expand(batch: pa.Table) -> pa.Table:
        ids, ts = [], []
        for mid, dur in zip(batch["media_id"].to_pylist(),
                            batch["duration_ms"].to_pylist()):
            for t in range(0, int(dur or 0), every_ms):
                ids.append(mid)
                ts.append(t)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_ts_ms": pa.array(ts, pa.int32())})

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=batch_size)
