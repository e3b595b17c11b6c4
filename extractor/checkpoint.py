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
import fcntl
import json
import os
import tempfile


SCHEMA_VERSION = 1


class CheckpointConfigError(RuntimeError):
    """Resume attempted with a run config that contradicts the one the
    manifest was committed under (e.g. a different bucket count).

    Committed partition ids are only meaningful under the exact salt
    function + bucket count that produced them: resuming a 64-bucket
    manifest with ``n_buckets=32`` would silently skip rows whose
    bucket membership changed. The reference restores per-file settings
    on crash restore for the same reason
    (dev-version/fileProcessor.py:81-101, LOCDB-V3/logWriter.py:35-49);
    here the settings are pinned in the manifest header and a mismatch
    hard-fails instead of corrupting."""


def _manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "manifest.json")


def _load_manifest(checkpoint_dir: str) -> dict:
    """Manifest as ``{"header": dict|None, "records": list}``.

    Legacy manifests (a bare JSON list of records, pre-header) are read
    as header=None — callers that require a pinned config reject them."""
    path = _manifest_path(checkpoint_dir)
    if not os.path.exists(path):
        return {"header": None, "records": []}
    with open(path, "r", encoding="utf-8") as f:
        loaded = json.load(f)
    if isinstance(loaded, list):  # legacy round-1 format
        return {"header": None, "records": loaded}
    return {"header": loaded.get("header"), "records": loaded.get("records", [])}


def _write_manifest(checkpoint_dir: str, manifest: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())  # durable before rename: power loss must not
        # leave a truncated manifest that replays committed buckets
    os.replace(tmp, _manifest_path(checkpoint_dir))  # atomic on POSIX
    dir_fd = os.open(checkpoint_dir, os.O_RDONLY)
    try:
        os.fsync(dir_fd)  # persist the rename itself
    finally:
        os.close(dir_fd)


def read_header(checkpoint_dir: str) -> dict | None:
    return _load_manifest(checkpoint_dir)["header"]


def ensure_header(checkpoint_dir: str, header: dict) -> None:
    """Pin the run config in the manifest before the first wave.

    First run: writes the header (atomic rename). Resume: verifies the
    caller's config equals the pinned one and raises
    ``CheckpointConfigError`` on any mismatch. A manifest with
    committed records but no header predates pinning and is rejected —
    its bucket ids cannot be trusted under an unverifiable config."""
    manifest = _load_manifest(checkpoint_dir)
    existing = manifest["header"]
    if existing is None:
        if manifest["records"]:
            raise CheckpointConfigError(
                "checkpoint manifest has committed records but no config "
                "header (pre-pinning format); clear the checkpoint or "
                "re-run from scratch — committed bucket ids cannot be "
                "verified against the current run config")
        manifest["header"] = dict(header)
        _write_manifest(checkpoint_dir, manifest)
        return
    mismatched = {k: (existing.get(k), header[k])
                  for k in header if existing.get(k) != header[k]}
    if mismatched:
        raise CheckpointConfigError(
            "resume config mismatch vs checkpoint manifest header: " +
            ", ".join("{}: committed={!r} requested={!r}".format(k, a, b)
                      for k, (a, b) in sorted(mismatched.items())))


def read_committed(checkpoint_dir: str) -> dict[int, dict]:
    """Latest committed record per partition_id (last writer wins —
    the reverse-scan semantics of LOCDB-V3/logWriter.py:25-33)."""
    out: dict[int, dict] = {}
    # records are append-ordered; later entries win
    for rec in _load_manifest(checkpoint_dir)["records"]:
        if rec.get("status") == "committed":
            out[int(rec["partition_id"])] = rec
    return out


def commit(checkpoint_dir: str, run_id: str, records: list[dict]) -> None:
    """Append commit records atomically (write temp + rename)."""
    manifest = _load_manifest(checkpoint_dir)
    now = dt.datetime.now(dt.timezone.utc).isoformat()
    for rec in records:
        rec.setdefault("run_id", run_id)
        rec.setdefault("status", "committed")
        rec.setdefault("committed_at", now)
        manifest["records"].append(rec)
    _write_manifest(checkpoint_dir, manifest)


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
    # the lock must appear ATOMICALLY WITH its payload: an O_EXCL
    # create followed by a separate write leaves a window where a
    # contender reads an empty file, classifies it corrupt->stale, and
    # steals a LIVE lock. Hard-linking a fully-written temp file into
    # place closes that window — link fails if the path exists, and on
    # success the payload is already durable in the inode.
    tmp = path + ".tmp." + str(os.getpid())
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(payload)
    while True:
        try:
            os.link(tmp, path)
            os.unlink(tmp)
            return
        except FileExistsError:
            # Classify-then-remove must be atomic against other
            # stealers: classifying the holder as stale and THEN
            # renaming/unlinking it leaves a window where contender B
            # completes its own steal and installs a fresh LIVE lock,
            # which our rename would silently destroy — the exact
            # double-writer the lock exists to prevent (ADVICE r3).
            # So the whole read→kill-probe→unlink section runs under
            # an exclusive flock on a sidecar arbitration file. Live
            # locks are installed only via os.link (fails while path
            # exists) and removed only here, under the flock, after a
            # fresh classification — so a lock installed after our
            # read can never be the one we unlink.
            with open(path + ".arb", "a+", encoding="utf-8") as arb:
                fcntl.flock(arb.fileno(), fcntl.LOCK_EX)
                try:
                    with open(path, "r", encoding="utf-8") as f:
                        holder = json.load(f)
                    pid = int(holder.get("pid", -1))
                except FileNotFoundError:
                    continue  # released/stolen meanwhile; re-create
                except (ValueError, OSError):
                    pid = -1  # unreadable/corrupt lock -> stale
                alive = False
                if pid > 0:
                    try:
                        os.kill(pid, 0)
                        alive = True
                    except ProcessLookupError:
                        alive = False
                    except PermissionError:
                        # EPERM means the pid EXISTS (owned by another
                        # user) — the holder is alive, not stale
                        alive = True
                if alive and pid != os.getpid():
                    try:
                        os.unlink(tmp)
                    except FileNotFoundError:
                        pass
                    raise ConcurrentRunError(
                        "output is being written by live run {} "
                        "(pid {})".format(holder.get("run_id", "?"), pid))
                # verified stale (dead pid) or our own: safe to remove
                # under the arbitration flock. A contender may os.link
                # a new lock the instant the path is free — our own
                # link then fails, we loop, re-classify under the
                # flock, and raise on its live lock. No live lock is
                # ever removed.
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
            continue


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


def snapshots(checkpoint_dir: str) -> list[dict]:
    """The manifest's commit batches in append order — the Iceberg
    snapshot-log analog over our single-writer manifest. Every
    ``commit()`` call appends its records under ONE atomic rename and
    stamps them with one shared ``committed_at``, so consecutive
    records sharing (run_id, committed_at) ARE one snapshot. Returns
    one dict per batch: ordinal ``snapshot_id``, the stamping
    ``run_id``/``committed_at``, the batch's ``partition_ids``, and
    ``committed_cumulative`` — the committed-partition SET as of that
    snapshot (last-writer-wins over any earlier batch, matching
    ``read_committed``)."""
    snaps: list[dict] = []
    cur_key = None
    cum: set[int] = set()
    for rec in _load_manifest(checkpoint_dir)["records"]:
        if rec.get("status") != "committed":
            continue
        key = (rec.get("run_id"), rec.get("committed_at"))
        if key != cur_key:
            cur_key = key
            snaps.append({"snapshot_id": len(snaps),
                          "run_id": rec.get("run_id"),
                          "committed_at": rec.get("committed_at"),
                          "partition_ids": [],
                          "committed_cumulative": None})
        pid = int(rec["partition_id"])
        snaps[-1]["partition_ids"].append(pid)
        cum.add(pid)
        snaps[-1]["committed_cumulative"] = sorted(cum)
    return snaps


def rollback(checkpoint_dir: str, snapshot_id: int) -> list[int]:
    """Roll the manifest back to snapshot ``snapshot_id`` (Iceberg
    rollback analog): atomically rewrite the manifest keeping the
    header (config pin) and only the commit batches up to and
    including the target snapshot. Returns the partition ids whose
    commits were dropped — a subsequent ``run_extract`` on the same
    output re-processes exactly those (its anti-join no longer sees
    them), and the dynamic partition overwrite makes the replay
    idempotent, so no data files need deleting here. Single-writer
    discipline applies (call it where you would call run_extract,
    never concurrently with one)."""
    snaps = snapshots(checkpoint_dir)
    if not 0 <= snapshot_id < len(snaps):
        raise ValueError(
            "snapshot_id {} out of range: manifest has {} snapshots"
            .format(snapshot_id, len(snaps)))
    manifest = _load_manifest(checkpoint_dir)
    keep_batches = snapshot_id + 1
    kept: list[dict] = []
    seen_batches = 0
    cur_key = None
    dropped: set[int] = set()
    for rec in manifest["records"]:
        if rec.get("status") != "committed":
            # non-commit records (none are written today) are kept
            # conservatively — they carry no partition lineage
            kept.append(rec)
            continue
        key = (rec.get("run_id"), rec.get("committed_at"))
        if key != cur_key:
            cur_key = key
            seen_batches += 1
        if seen_batches <= keep_batches:
            kept.append(rec)
        else:
            dropped.add(int(rec["partition_id"]))
    _write_manifest(checkpoint_dir,
                    {"header": manifest["header"], "records": kept})
    still = {int(r["partition_id"]) for r in kept
             if r.get("status") == "committed"}
    return sorted(dropped - still)


def compact(checkpoint_dir: str, keep_snapshots: int = 2) -> dict:
    """Manifest maintenance (Iceberg expire_snapshots/rewrite-manifest
    analog): the records list grows O(waves x buckets) across resumes
    — at 10^12-partition lineage an append-only log must be compacted
    or every snapshots()/read_committed() walk pays for dead history.
    Squashes every commit batch OLDER than the last ``keep_snapshots``
    into ONE synthetic baseline batch holding the last-writer-wins
    record per partition (exactly what read_committed would have
    resolved), and keeps the newest batches verbatim so recent time
    travel (read_extracted_asof / rollback) still works. The baseline
    batch is stamped run_id="__compacted__" with the newest squashed
    committed_at, so it reads as snapshot 0.

    Invariants (pinned in tests): read_committed is IDENTICAL before
    and after; resume over a compacted manifest still skips every
    committed bucket; snapshots() shrinks to <= keep_snapshots + 1.
    Single-writer discipline applies, like rollback."""
    manifest = _load_manifest(checkpoint_dir)
    batches: list[list[dict]] = []
    cur_key = None
    for rec in manifest["records"]:
        if rec.get("status") != "committed":
            continue
        key = (rec.get("run_id"), rec.get("committed_at"))
        if key != cur_key:
            cur_key = key
            batches.append([])
        batches[-1].append(rec)
    if len(batches) <= keep_snapshots:
        return {"squashed_batches": 0,
                "records_before": len(manifest["records"]),
                "records_after": len(manifest["records"])}
    old = batches[:len(batches) - keep_snapshots]
    keep = batches[len(batches) - keep_snapshots:]
    base: dict[int, dict] = {}
    last_at = ""
    for batch in old:  # append order: later batches overwrite
        for rec in batch:
            base[int(rec["partition_id"])] = dict(rec)
            last_at = max(last_at, str(rec.get("committed_at", "")))
    baseline = []
    for pid in sorted(base):
        rec = base[pid]
        # batch stamp changes (that IS the compaction), but the
        # last writer's provenance is preserved under its own keys —
        # lineage is never destroyed, only re-filed. setdefault, not
        # assignment: a SECOND compaction squashing an earlier
        # baseline would otherwise overwrite the ORIGINAL run's
        # provenance with "__compacted__", destroying exactly the
        # lineage this contract promises to keep (round-5 self-review)
        rec.setdefault("compacted_from_run_id", rec["run_id"])
        rec.setdefault("compacted_from_committed_at",
                       rec["committed_at"])
        rec["run_id"] = "__compacted__"
        rec["committed_at"] = last_at
        baseline.append(rec)
    records = baseline + [r for batch in keep for r in batch]
    before = len(manifest["records"])
    _write_manifest(checkpoint_dir,
                    {"header": manifest["header"], "records": records})
    return {"squashed_batches": len(old), "records_before": before,
            "records_after": len(records)}


def orphan_files(output_path: str) -> list[str]:
    """Data files under ``data/bucket=N/`` whose bucket has NO
    committed record in the manifest — the leftovers of a wave that
    wrote parquet but was killed before its commit (the
    ``remove_orphan_files`` table-service analog: the MANIFEST is
    the source of truth, not the filesystem). A resumed run heals
    them implicitly (uncommitted buckets are reprocessed and
    dynamic-partition-overwritten), so orphans matter for ABANDONED
    outputs: a plain directory read (read_extracted scans data/
    wholesale) would surface uncommitted partial rows. Returns
    absolute file paths, sorted; _SUCCESS/dotfiles ignored."""
    committed = set(read_committed(os.path.join(output_path,
                                                "_checkpoint")))
    data_dir = os.path.join(output_path, "data")
    out: list[str] = []
    if not os.path.isdir(data_dir):
        return out
    for name in sorted(os.listdir(data_dir)):
        if not name.startswith("bucket="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b in committed:
            continue
        d = os.path.join(data_dir, name)
        for fn in sorted(os.listdir(d)):
            if fn.startswith(("_", ".")):
                continue
            out.append(os.path.join(d, fn))
    return out


def vacuum_orphans(output_path: str, dry_run: bool = True) -> dict:
    """Delete (or just report, dry_run=True — the safe default every
    table service ships) the orphan files of ``orphan_files``,
    pruning bucket directories left empty. Returns {"orphans":
    [paths], "removed": n}. Never touches committed buckets, the
    manifest, or non-bucket paths."""
    orphans = orphan_files(output_path)
    removed = 0
    if not dry_run:
        for p in orphans:
            os.remove(p)
            removed += 1
        for p in {os.path.dirname(q) for q in orphans}:
            try:
                os.rmdir(p)  # only succeeds if now empty
            except OSError:
                pass
    return {"orphans": orphans, "removed": removed}
