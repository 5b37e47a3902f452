"""Multimodal (image/audio/video) column plumbing — real Ray-side
pipeline, STUBBED codecs.

Media travel as opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``sample_rate``/``duration_ms``).
The decode / resize / feature-extract / frame-sample operators are
actor-pool ``map_batches`` stages whose *plumbing* (schema handling,
batch sizing for large payloads, actor signature, output layout) is real
and tested; the codec calls themselves are stubbed because no
image/audio library ships in this environment:

- ``DecodeStub`` raises ``NotImplementedError`` when asked for a real
  codec, exactly marking the integration point;
- ``FakeDecoder`` is the deterministic stand-in used by tests — it
  "decodes" a synthetic payload into a small fixed-shape array so the
  end-to-end pipeline (schema, batching, actor reuse) is exercised.

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
