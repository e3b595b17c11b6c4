"""Multimodal payload plumbing: opaque binary columns + typed metadata,
decode / feature-extract as Arrow-batched mapInPandas.

Images/audio/video are `binary` columns with a metadata struct; the
Spark side (schema, partitioning, batch shape, UDF signature) is real
and tested. The actual media decode is STUBBED: PIL/librosa/ffmpeg are
not in this container, so `decode_image`/`decode_audio` raise
NotImplementedError unless the libraries import, and the feature
extractor uses a deterministic byte-level fallback (size, entropy
proxy, 8-byte magic, content hash) so plans are executable end-to-end.

At 100 TB: binary payloads dominate row size — the plan keeps them
inside one mapInPandas stage (never through a shuffle); upstream
operators select only (key, meta) until the decode stage, and
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not available in this sandbox
    from PIL import Image  # noqa: F401
    HAS_PIL = True
except Exception:
    HAS_PIL = False

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("magic_hex", T.StringType(), True),
    T.StructField("entropy_milli", T.LongType(), True),
    T.StructField("content_sha1", T.StringType(), True),
])


def decode_image(payload: bytes) -> dict:
    """Real image decode (dims, channels). STUB: requires PIL."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode needs PIL; absent in this environment — "
            "byte-level features are extracted instead")
    raise NotImplementedError("wire PIL decode here when available")


def _byte_entropy_milli(b: bytes) -> int:
    """Shannon entropy of the byte histogram, in milli-bits
    (deterministic double math over the fixed 256-bin histogram).

    Vectorized: np.frombuffer + bincount is ~100x the per-byte Python
    loop on MB-sized payloads and keeps the Arrow batch numpy-side."""
    if not b:
        return 0
    counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
    n = len(b)
    p = counts[counts > 0] / n
    return int(float(-(p * np.log2(p)).sum()) * 1000)


def _features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        payloads = pdf["payload"].tolist()
        metas = pdf["meta"].tolist()
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "mime": [m["mime"] if m else None for m in metas],
            "n_bytes": [len(p) if p is not None else 0 for p in payloads],
            "magic_hex": [bytes(p[:8]).hex() if p else "" for p in payloads],
            "entropy_milli": [_byte_entropy_milli(bytes(p)) if p else 0
                              for p in payloads],
            "content_sha1": [hashlib.sha1(bytes(p)).hexdigest() if p else ""
                             for p in payloads],
        })


def extract_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary, meta: struct<mime,origin>) ->
    FEATURE_SCHEMA via Arrow-batched mapInPandas."""
    return df.mapInPandas(_features_batch, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def _resize_stub(payload: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """Deterministic fake resize: real image decode needs PIL (absent
    here — decode_image raises NotImplementedError); the stub derives
    fake source dims from the content hash, applies the P9-style
    max-dim clamp arithmetic for real, and 'resizes' by truncating the
    payload proportionally — exercising exactly the byte-shrinking
    shape a real thumbnailer has."""
    h = hashlib.sha1(payload).digest()
    w0 = 256 + int.from_bytes(h[0:2], "big") % 4096
    h0 = 256 + int.from_bytes(h[2:4], "big") % 4096
    m = max(w0, h0)
    if m <= max_dim:
        return w0, h0, payload
    scale = max_dim / m
    w1, h1 = max(1, int(w0 * scale)), max(1, int(h0 * scale))
    keep = max(1, int(len(payload) * scale * scale))
    return w1, h1, payload[:keep]


def resize_images(df: DataFrame, max_dim: int = 2048) -> DataFrame:
    """(doc_id, payload: binary) -> RESIZE_SCHEMA via Arrow-batched
    mapInPandas (the reference's oversize-image normalization, P9:
    LOCDB-V3/imgProcessing.py:24-28 / crop_morphology.py:231-241,
    as a distributed transform). Decode is stubbed (no PIL); the
    clamp arithmetic, schema, batching and partitioning are real."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_resize_stub(bytes(p), max_dim) if p is not None
                    else (None, None, None)
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "width": [r[0] for r in rows],
                "height": [r[1] for r in rows],
                "payload": [r[2] for r in rows],
            })
    return df.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, payload: binary) -> one row per sampled 'frame'
    (video frame-sampling plumbing: 1 input row explodes to N output
    rows inside the Arrow batch — the S5 page-explode shape for
    media). Frames are deterministic equal-stride byte slices (ffmpeg
    absent); at scale the binary column never crosses a shuffle — the
    explode happens inside mapInPandas and downstream ops select only
    (doc_id, frame_idx) until a decode stage needs bytes."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                b = bytes(p)
                stride = max(1, len(b) // n_frames)
                for k in range(min(n_frames, len(b))):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(b[k * stride:(k + 1) * stride])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames})
    return df.mapInPandas(batches, FRAME_SCHEMA)
