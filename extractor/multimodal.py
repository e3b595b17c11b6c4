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
import math
from collections.abc import Iterator

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
    """Shannon entropy of the byte histogram, in milli-bits (exact int
    from double math on small fixed-size histogram — deterministic)."""
    if not b:
        return 0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    h = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return int(h * 1000)


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
