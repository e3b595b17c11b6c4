"""Checkpoint table: per-partition lineage + counters for idempotent
resume.

Re-derives the reference's append-only ``processLog.txt`` +
reverse-scan restore (``LOCDB-V3/logWriter.py:8-33``,
``dev-version/fileProcessor.py:81-101``) as an Iceberg-style commit
log: each wave of salt buckets is committed atomically *after* its
output partitions are durably written; a restarted run anti-joins the
committed set and re-processes only the rest. Replays are idempotent
because bucket output dirs are overwritten dynamically.

On a real cluster this is an Iceberg table (snapshot-isolated commits);
the sandbox has no Iceberg jars, so the same contract is provided by a
single-writer JSON manifest with atomic rename — the driver is the only
writer, exactly as the Iceberg catalog commit would be. The Spark-side
read path (``as_dataframe``) is identical either way.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile


def _manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "manifest.json")


def read_committed(checkpoint_dir: str) -> dict[int, dict]:
    """Latest committed record per partition_id (last writer wins —
    the reverse-scan semantics of LOCDB-V3/logWriter.py:25-33)."""
    path = _manifest_path(checkpoint_dir)
    if not os.path.exists(path):
        return {}
    with open(path, "r", encoding="utf-8") as f:
        records = json.load(f)
    out: dict[int, dict] = {}
    for rec in records:  # list is append-ordered; later entries win
        if rec.get("status") == "committed":
            out[int(rec["partition_id"])] = rec
    return out


def commit(checkpoint_dir: str, run_id: str, records: list[dict]) -> None:
    """Append commit records atomically (write temp + rename)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _manifest_path(checkpoint_dir)
    existing: list[dict] = []
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            existing = json.load(f)
    now = dt.datetime.now(dt.timezone.utc).isoformat()
    for rec in records:
        rec.setdefault("run_id", run_id)
        rec.setdefault("status", "committed")
        rec.setdefault("committed_at", now)
        existing.append(rec)
    fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(existing, f)
    os.replace(tmp, path)  # atomic on POSIX


def clear(checkpoint_dir: str) -> None:
    path = _manifest_path(checkpoint_dir)
    if os.path.exists(path):
        os.remove(path)


def as_dataframe(spark, checkpoint_dir: str):
    """Checkpoint contents as a Spark DataFrame (CHECKPOINT_SCHEMA)."""
    from extractor.schema import CHECKPOINT_SCHEMA

    rows = []
    for rec in read_committed(checkpoint_dir).values():
        rows.append((
            rec.get("run_id", ""),
            int(rec["partition_id"]),
            rec.get("status", "committed"),
            int(rec.get("turns_in", 0)),
            int(rec.get("turns_out", 0)),
            int(rec.get("refs_out", 0)),
            dt.datetime.fromisoformat(rec["committed_at"]).replace(tzinfo=None)
            if rec.get("committed_at") else None,
        ))
    return spark.createDataFrame(rows, CHECKPOINT_SCHEMA)
