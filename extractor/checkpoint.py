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


class ConcurrentRunError(RuntimeError):
    """Another live driver holds this output's writer lock."""


def _lock_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "writer.lock")


def acquire_writer_lock(checkpoint_dir: str, run_id: str) -> None:
    """Single-writer guard (the role an Iceberg catalog's optimistic
    commit plays on a real deployment): atomically create a lock file
    naming this driver's PID. A second concurrent driver fails fast
    with ConcurrentRunError instead of silently interleaving partition
    overwrites. A lock whose PID is no longer alive (SIGKILLed driver)
    is stale and stolen — resume therefore never blocks on a crash."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _lock_path(checkpoint_dir)
    payload = json.dumps({"run_id": run_id, "pid": os.getpid(),
                          "at": dt.datetime.now(dt.timezone.utc).isoformat()})
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(payload)
            return
        except FileExistsError:
            try:
                with open(path, "r", encoding="utf-8") as f:
                    holder = json.load(f)
                pid = int(holder.get("pid", -1))
            except (ValueError, OSError):
                pid = -1  # unreadable/corrupt lock -> treat as stale
            alive = False
            if pid > 0:
                try:
                    os.kill(pid, 0)
                    alive = True
                except (ProcessLookupError, PermissionError):
                    alive = False
            if alive and pid != os.getpid():
                raise ConcurrentRunError(
                    "output is being written by live run {} (pid {})".format(
                        holder.get("run_id", "?"), pid))
            # stale (dead pid) or our own: steal by replacing atomically
            fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".lk")
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(payload)
            os.replace(tmp, path)
            return


def release_writer_lock(checkpoint_dir: str) -> None:
    try:
        os.remove(_lock_path(checkpoint_dir))
    except FileNotFoundError:
        pass


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
