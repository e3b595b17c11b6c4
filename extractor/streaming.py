"""Structured Streaming variant of the extraction job.

The reference is request-driven batch behind a Redis queue
(``LOCDB-V3/app.py:42,105-110`` — SURVEY.md S11), so the primary
engine is the resumable batch job in ``extractor.job``. This module is
the §7.6 mapping for continuously-arriving transcripts: ``readStream``
on the input directory/table -> ``foreachBatch`` running the SAME
extraction plan + checkpointed sink per micro-batch, so batch and
streaming share one code path and one output contract. Spark's
streaming checkpoint (offsets) composes with our per-bucket commit log
(idempotent overwrite) for end-to-end exactly-once to the parquet sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extractor.job import plan_extract
from extractor.schema import TRANSCRIPTS_SCHEMA


def _epoch_idempotent_sink(data_dir: str, transform=None,
                           extra_partitions: tuple = ()):
    """foreachBatch sink that is safe under epoch REPLAY (crash between
    the parquet write and the WAL commit): output is partitioned by
    epoch (plus ``extra_partitions``) and the write dynamic-overwrites
    ONLY that epoch's partitions, so re-running a batch replaces its
    own rows instead of appending duplicates. Micro-batch output is
    deterministic under Spark's state-store versioning, so the
    replacement is byte-equivalent. ``transform`` (optional) is the
    per-batch plan to apply before writing (e.g. plan_extract)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        out = out.withColumn("epoch", F.lit(int(epoch_id)))
        # per-WRITE dynamic overwrite (not the session conf): two
        # concurrent streams sharing one session must not race on a
        # global setting — a mid-plan reset to "static" would turn a
        # sibling sink's write into a full-directory overwrite
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch", *extra_partitions).parquet(data_dir))

    return sink


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    n_buckets: int = 64,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
):
    """File-source streaming extraction. Returns the StreamingQuery.

    ``trigger_once`` processes everything available and stops (the
    batch-parity mode used by tests); in production use a processing-
    time trigger and the same foreachBatch body.
    ``max_files_per_trigger`` is the micro-batch size knob (small
    values = more, smaller exactly-once epochs).
    """
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    data_dir = os.path.join(output_path, "data")

    sink = _epoch_idempotent_sink(
        data_dir, transform=lambda df: plan_extract(df, n_buckets),
        extra_partitions=("bucket",))

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(output_path, "_stream_ckpt"))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_gen(
    spark: SparkSession,
    output_path: str,
    n_buckets: int = 16,
    convs_per_batch: int = 50,
    n_turns: int = 2000,
    seed: int = 42,
):
    """Storage-free continuous ingest: the `transcript_gen` stream
    source (offset = conversation index, resumable from the WAL)
    feeding the SAME epoch-partitioned exactly-once extraction sink as
    :func:`stream_extract`. This is the north-rule shape with no input
    table materialized at all — at 10^12 turns the ingress is a queue,
    not a directory, and this path proves the engine consumes one
    without changing the extraction plan or the output contract.

    Returns the StreamingQuery (availableNow trigger: drains one rate-
    limited micro-batch per run against the shared checkpoint, so
    repeated calls advance through the conversation sequence).
    """
    from extractor.gen_source import register

    register(spark)
    src = (
        spark.readStream.format("transcript_gen")
        .option("seed", seed)
        .option("n_turns", n_turns)
        .option("convs_per_batch", convs_per_batch)
        .load()
    )
    data_dir = os.path.join(output_path, "data")

    sink = _epoch_idempotent_sink(
        data_dir, transform=lambda df: plan_extract(df, n_buckets),
        extra_partitions=("bucket",))

    return (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation",
                os.path.join(output_path, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Watermarked event-time windowed aggregation (late-data handling)
# ---------------------------------------------------------------------------

def windowed_turn_counts(
    spark: SparkSession,
    input_dir: str,
    window_duration: str = "10 minutes",
    watermark_delay: str = "10 minutes",
    slide_duration: str | None = None,
):
    """Streaming per-(event-time window, role) turn counts with a
    watermark: rows later than ``watermark_delay`` behind the observed
    max ts are DROPPED, and a window is emitted exactly once (append
    mode) when the watermark passes its end — the Structured Streaming
    pattern for late data over continuously-arriving transcripts.

    ``slide_duration`` < window_duration makes the windows SLIDING
    (each row fans into size/slide windows via the same Expand the
    batch twin w7_sliding_window_counts plans); None = tumbling.

    Scale note: the state store holds only open windows x roles (a
    handful of rows per trigger — size/slide of them when sliding),
    independent of input volume; the aggregation itself is the same
    partial-agg shuffle as the batch groupBy."""
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return (
        src
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration,
                          slide_duration or window_duration).alias("win"),
                 "role")
        .agg(F.count("*").alias("n_turns"),
             F.sum(F.length("text")).alias("chars"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "role", "n_turns", "chars")
    )


def run_windowed_turn_counts(spark: SparkSession, input_dir: str,
                             output_path: str, **kw):
    """Drive windowed_turn_counts to a parquet sink (append mode:
    only watermark-finalized windows are written)."""
    agg = windowed_turn_counts(spark, input_dir, **kw)
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
        .trigger(availableNow=True)
        .format("parquet").option("path", os.path.join(output_path, "data"))
        .start()
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: streaming sessionization via
# applyInPandasWithState (S11-analog for continuous event feeds)
# ---------------------------------------------------------------------------

_SESSION_STATE_SCHEMA = "last_us LONG, n_sessions LONG"
_SESSION_OUT_SCHEMA = "user_id LONG, n_sessions LONG, last_us LONG"
_SESSION_GAP_US = 1_800_000_000  # 30 min, identical to the batch query


def _sessionize_group(key, pdf_iter, state):
    """Per-user session counting with cross-batch state: carries
    (last event time, session count) between micro-batches so a
    session spanning a batch boundary is not double-counted. Arrow
    batches are concatenated and sorted per group (vectorized numpy
    gap compare, no per-row Python in the hot path)."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    last_us, n = state.get if state.exists else (None, 0)
    batches = list(pdf_iter)
    if not batches:
        # Timeout-triggered invocation (no data for this key this
        # batch): re-emit the current state unchanged. Unreachable
        # under NoTimeout, but pd.concat([]) raises — guard so any
        # future timeout config doesn't crash the stream.
        yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n],
                            "last_us": [last_us]})
        return
    pdf = pd.concat(batches, ignore_index=True)
    pdf = pdf.sort_values(["us", "event_id"])
    us = pdf["us"].to_numpy(dtype=np.int64)
    if len(us):
        gaps = np.diff(us) > _SESSION_GAP_US
        n_new = int(gaps.sum())
        if last_us is None:
            n = 1 + n_new
        else:
            n = n + n_new + (1 if us[0] - last_us > _SESSION_GAP_US else 0)
        last_us = int(us[-1])
    state.update((last_us, n))
    yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n],
                        "last_us": [last_us]})


def stream_sessionize(spark: SparkSession, input_dir: str,
                      output_path: str, events_schema):
    """Streaming sessionization (30-min gap) over an events feed,
    state kept per user_id across micro-batches. Update-mode stateful
    output goes through foreachBatch to an epoch-stamped parquet sink;
    the latest epoch per user is the current count — matches the batch
    ``sessionization`` query when fed the same events in ts order."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .select("event_id", "user_id",
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"))
    )
    updates = src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    data_dir = os.path.join(output_path, "data")

    sink = _epoch_idempotent_sink(data_dir)

    return (
        updates.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def read_session_counts(spark: SparkSession, output_path: str) -> DataFrame:
    """Latest per-user session count from the epoch-stamped sink."""
    from pyspark.sql import Window as W

    df = spark.read.parquet(os.path.join(output_path, "data"))
    w = W.partitionBy("user_id").orderBy(F.desc("epoch"))
    return (df.withColumn("rn", F.row_number().over(w)).where("rn = 1")
            .select("user_id", "n_sessions"))


# ---------------------------------------------------------------------------
# Incremental ingest dedup (streaming exact dedup + committed-history
# anti-join) — the continuous form of queries.dedup_exact
# ---------------------------------------------------------------------------

def stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    known_fps_path: str | None = None,
    watermark_delay: str = "10 minutes",
):
    """Continuously ingest transcript turns, keeping only the FIRST
    occurrence of each content fingerprint.

    Two dedup layers, each bounded at 100-TB scale:

    - within the stream: ``dropDuplicatesWithinWatermark`` on the
      fingerprint — the state store holds only fingerprints younger
      than the event-time watermark (vs plain ``dropDuplicates``,
      whose state grows without bound for the lifetime of the query);
    - against history: a stream-STATIC ``left_anti`` join on a
      committed-fingerprint snapshot (e.g. the batch corpus's
      ``dedup_exact`` output). The static side re-reads per
      micro-batch, so refreshing the snapshot file picks up new
      history without a restart; at scale this is a broadcast when
      the fp snapshot fits, else a shuffled anti-join of
      16-byte keys only.

    Fingerprint = md5 over (role, tool, text) with a \\x1f separator —
    the same recipe as queries.dedup_exact so batch and stream agree
    on identity. Sink writes epoch-PARTITIONED parquet via the shared
    replay-idempotent dynamic overwrite (_epoch_idempotent_sink).
    Replay caveat: if the known_fps snapshot is refreshed between a
    crash and its replay, the replayed epoch can emit FEWER rows (the
    refreshed history claims more fingerprints) — the epoch's
    partition then holds the smaller set, which is still a CORRECT
    first-occurrence answer against the newer history (every dropped
    row's fingerprint is committed there), just not byte-identical to
    the pre-crash write; hold snapshot refreshes while a query is
    down to get byte-stable replays.
    Returns the StreamingQuery (availableNow trigger).
    """
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    fp = F.md5(F.concat_ws("\x1f", F.col("role"), F.col("tool"),
                           F.col("text")))
    s = (src.withColumn("fp", fp)
         # NTZ physical type in the source schema; watermarks need TIMESTAMP
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark_delay)
         .dropDuplicatesWithinWatermark(["fp"]))
    data_dir = os.path.join(output_path, "data")

    # the history anti-join lives INSIDE the sink, not in the stream
    # plan: a batch DataFrame built once would pin its file listing at
    # definition time, so a refreshed snapshot (new part files) would
    # be invisible until restart — re-reading per micro-batch is what
    # makes the documented no-restart refresh true
    def transform(batch_df: DataFrame) -> DataFrame:
        if known_fps_path is None:
            return batch_df
        known = (batch_df.sparkSession.read.parquet(known_fps_path)
                 .select("fp"))
        return batch_df.join(known, "fp", "left_anti")

    sink = _epoch_idempotent_sink(data_dir, transform=transform)

    return (
        s.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def attribution_join(clicks: DataFrame, buys: DataFrame,
                     how: str = "inner") -> DataFrame:
    """Shared logical plan for click->purchase attribution: join on
    user_id with the purchase inside (click_ts, click_ts + 1 hour].
    Written ONCE so the four twins — batch inner (j10), batch left
    outer (j11), streaming inner, streaming left outer — cannot
    drift (the tests feed them from the same parquet).
    how='left_outer' keeps unconverted clicks with purchase_id -1
    (COALESCE'd for a null-free cross-engine compare)."""
    j = clicks.join(
        buys,
        (clicks["user_id"] == buys["b_user"])
        & (buys["purchase_ts"] > clicks["click_ts"])
        & (buys["purchase_ts"]
           <= clicks["click_ts"] + F.expr("INTERVAL 1 HOUR")),
        how)
    return j.select("user_id", "click_id",
                    F.coalesce("purchase_id", F.lit(-1))
                    .alias("purchase_id"))


def stream_stream_attribution(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    events_schema,
    watermark_delay: str = "2 hours",
):
    """Stream-STREAM interval join (the last Structured Streaming
    join class the engine exercises; reference analog: correlating a
    crop-request event with its later OCR result, dev-version
    fileProcessor flow): click and purchase streams join on user_id
    with purchase_ts in (click_ts, click_ts + 1h].

    Scale mechanics: BOTH sides carry an event-time watermark and the
    join predicate bounds their time skew, so Spark's symmetric hash
    join state store evicts a click once the purchase watermark
    passes click_ts + 1h (and vice versa) — state is bounded by
    watermark horizon x arrival rate, not by stream length. Inner
    matches emit immediately; the watermark only governs eviction.
    Without both watermarks + the time bound, Spark rejects the plan
    as unbounded-state.

    Returns the StreamingQuery (availableNow; appends matched triples
    to ``output_path``/data).
    """
    def side(event_type, id_alias, ts_alias, user_alias="user_id"):
        return (
            spark.readStream.schema(events_schema)
            .option("maxFilesPerTrigger", 2).parquet(input_dir)
            .where(F.col("event_type") == event_type)
            .select(F.col("event_id").alias(id_alias),
                    F.col("user_id").alias(user_alias),
                    F.col("ts").cast("timestamp").alias(ts_alias))
            .withWatermark(ts_alias, watermark_delay))

    clicks = side("click", "click_id", "click_ts")
    buys = side("purchase", "purchase_id", "purchase_ts", "b_user")
    j = attribution_join(clicks, buys)
    data_dir = os.path.join(output_path, "data")

    sink = _epoch_idempotent_sink(data_dir)

    return (
        j.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_attribution_outer(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    events_schema,
    watermark_delay: str = "2 hours",
):
    """LEFT OUTER stream-stream interval join — the attribution join
    with unconverted clicks KEPT (purchase_id -1), sharing the same
    attribution_join plan as j10/j11/the inner streaming twin.

    The semantics Spark adds over the inner twin: an inner match
    emits immediately, but a NULL-padded (unmatched) click can only
    emit once the engine has PROVEN no purchase can still arrive —
    i.e. when the right-side watermark passes click_ts + 1h. Two
    consequences the test pins: (1) outer rows lag the inner rows by
    the watermark horizon; (2) clicks still inside the horizon when
    an availableNow run drains hold their state in the CHECKPOINT
    and emit in a LATER run whose data advances the watermark —
    stream end is not watermark infinity. Equality oracle: the batch
    left-outer twin (j11's plan) on the same parquet, compared after
    a flush record pushes the watermark past every click's horizon.

    State bound: same as the inner twin — both sides watermarked,
    join range bounds time skew, so the state store holds only the
    horizon window of each side."""
    def side(event_type, id_alias, ts_alias, user_alias="user_id"):
        return (
            spark.readStream.schema(events_schema)
            .option("maxFilesPerTrigger", 2).parquet(input_dir)
            .where(F.col("event_type") == event_type)
            .select(F.col("event_id").alias(id_alias),
                    F.col("user_id").alias(user_alias),
                    F.col("ts").cast("timestamp").alias(ts_alias))
            .withWatermark(ts_alias, watermark_delay))

    clicks = side("click", "click_id", "click_ts")
    buys = side("purchase", "purchase_id", "purchase_ts", "b_user")
    j = attribution_join(clicks, buys, how="left_outer")
    data_dir = os.path.join(output_path, "data")

    sink = _epoch_idempotent_sink(data_dir)

    return (
        j.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def stream_session_windows(spark: SparkSession, input_dir: str,
                           output_path: str, events_schema,
                           gap: str = "30 minutes",
                           watermark_delay: str = "30 minutes"):
    """Gap sessions via the NATIVE session_window in streaming mode —
    the built-in state mechanics (merging session state store) next to
    the hand-rolled applyInPandasWithState sessionizer: append-mode
    emission means a session row appears exactly once, when the
    watermark passes session_end + nothing can extend it. Same
    touching-sessions-merge semantics as the batch twin
    (session_window_native — pinned there by hand test)."""
    src = (spark.readStream.schema(events_schema)
           .option("maxFilesPerTrigger", 1)
           .parquet(input_dir)
           # watermarks require TIMESTAMP (LTZ); session TZ is pinned
           # UTC so the NTZ cast is an identity (same as the windowed
           # counts source)
           .withColumn("ts", F.col("ts").cast("timestamp"))
           .withWatermark("ts", watermark_delay))
    agg = (src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
           .agg(F.count("*").alias("n"))
           .select("user_id", F.col("w.start").alias("session_start"),
                   F.col("w.end").alias("session_end"), "n"))
    return (agg.writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", os.path.join(output_path, "data"))
            .start())


# ---------------------------------------------------------------------------
# Custom stateful operator: streaming bounded-window EWMA via
# applyInPandasWithState — numeric state, bit-equal to the batch twin
# ---------------------------------------------------------------------------

_EWMA_STATE_SCHEMA = "tail ARRAY<DOUBLE>"
_EWMA_OUT_SCHEMA = "event_id LONG, ewma DOUBLE"


def _ewma_group(key, pdf_iter, state):
    """Per-user bounded-window EWMA with cross-batch state: the state
    is the trailing <= WIN-1 values (ordered oldest->newest), so an
    event near a micro-batch boundary sees exactly the same trailing
    window the batch query's ROWS BETWEEN frame gives it.

    Bit-equality discipline: the batch twin (ewma_user_value) left-
    folds s <- s*(1-a) + x*a over each event's ordered window, and
    its oracle hash compares RAW doubles — so this kernel must
    reproduce the identical IEEE op sequence per event. It does, and
    still stays vectorized: instead of looping over EVENTS it loops
    over the <= WIN window POSITIONS, advancing every event's fold
    state one step per iteration with elementwise numpy ops
    (s*0.75 + x*0.25 — same two multiplies + add, same order). WIN
    iterations of O(m) work per micro-batch, no per-row Python."""
    import numpy as np
    import pandas as pd

    from extractor.queries import _EWMA_ALPHA, _EWMA_WIN

    batches = list(pdf_iter)
    if not batches:
        return
    tail = list(state.get[0]) if state.exists else []
    pdf = pd.concat(batches, ignore_index=True)
    pdf = pdf.sort_values(["us", "event_id"])
    vals = pdf["value"].to_numpy(dtype=np.float64)
    arr = np.concatenate([np.asarray(tail, dtype=np.float64), vals])
    k = len(tail)
    m = len(vals)
    # sliding windows, one row per emitted event: event i (global
    # index k+i in arr) folds over arr[max(0, k+i-WIN+1) : k+i+1].
    # Left-pad with NaN so every window is exactly WIN wide; the fold
    # seeds at each row's first non-NaN column.
    pad = np.full(_EWMA_WIN - 1, np.nan)
    pa = np.concatenate([pad, arr])
    win = np.lib.stride_tricks.sliding_window_view(
        pa, _EWMA_WIN)[k:]                      # shape (m, WIN)
    s = np.full(m, np.nan)
    for j in range(_EWMA_WIN):
        x = win[:, j]
        seed = np.isnan(s) & ~np.isnan(x)
        step = ~np.isnan(s) & ~np.isnan(x)
        s = np.where(seed, x,
                     np.where(step,
                              s * (1 - _EWMA_ALPHA) + x * _EWMA_ALPHA,
                              s))
    # plain-float conversion: numpy scalars in the state row break the
    # JVM-side unpickler (zero-arg ClassDict for numpy.dtype)
    state.update(([float(v) for v in arr[-(_EWMA_WIN - 1):]],))
    yield pd.DataFrame({"event_id": pdf["event_id"].to_numpy(),
                        "ewma": s})


def stream_ewma(spark: SparkSession, input_dir: str, output_path: str,
                events_schema):
    """Streaming twin of the batch ``ewma_user_value`` query: per-user
    bounded-window EWMA over a continuously-arriving events feed,
    trailing-window state carried across micro-batches. Append-mode
    per-event output through the epoch-idempotent sink; pinned
    BIT-equal to the batch query on the same input in tests."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .select("event_id", "user_id", "value",
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("us"))
    )
    updates = src.groupBy("user_id").applyInPandasWithState(
        _ewma_group,
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = _epoch_idempotent_sink(os.path.join(output_path, "data"))
    return (
        updates.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 typed-state API) — ENV-GATED
# ---------------------------------------------------------------------------
# The Python transformWithState runtime speaks protobuf to the JVM
# state server (pyspark/sql/streaming/proto/StateMessage_pb2 imports
# google.protobuf at worker init), and this environment does not ship
# the protobuf runtime: the query dies with
# "TransformWithStateInPySpark driver worker exited unexpectedly" /
# ImportError: cannot import name 'descriptor' from 'google.protobuf'
# BEFORE any user processor code runs. Same honesty class as the
# absent Iceberg jars and PIL: the surface below is real and
# test-gated, raises a documented error here, and its pytest runs
# wherever protobuf exists. applyInPandasWithState (stream_sessionize,
# stream_ewma) remains the verified stateful path in this sandbox.

def _has_tws_runtime() -> bool:
    import importlib.util
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:      # no 'google' namespace pkg at all
        return False


_TWS_OUT_SCHEMA = ("user_id LONG, n LONG, n_types INT, vmin DOUBLE, "
                   "vmax DOUBLE, last_us LONG, recent ARRAY<LONG>")


def _make_profile_processor():
    """Per-user running-profile StatefulProcessor exercising all three
    typed-state primitives of the Spark 4 API: ValueState (count +
    order-free min/max/last-ts aggregate), MapState (distinct
    event_type set — keys are state, not a serialized blob, so a
    10^6-type key space never deserializes whole), ListState (the
    trailing-3 event ids by (us, event_id) recency). Every emitted
    column is order-insensitive or recency-windowed, so the LAST
    update row per user equals the batch groupBy aggregate exactly —
    the same pin discipline as stream_ewma."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class _Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n LONG, vmin DOUBLE, vmax DOUBLE, last_us LONG")
            self._types = handle.getMapState("types", "t STRING", "one INT")
            self._recent = handle.getListState(
                "recent", "us LONG, event_id LONG")

        def handleInputRows(self, key, rows, timer_values):
            pdf = pd.concat(list(rows), ignore_index=True)
            if self._agg.exists():
                n, vmin, vmax, last_us = self._agg.get()
            else:
                n, vmin, vmax, last_us = 0, None, None, None
            n += len(pdf)
            bmin = float(pdf["value"].min())
            bmax = float(pdf["value"].max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
            bus = int(pdf["us"].max())
            last_us = bus if last_us is None else max(last_us, bus)
            self._agg.update((n, vmin, vmax, last_us))
            for tname in pdf["event_type"].unique():
                self._types.updateValue((str(tname),), (1,))
            pairs = [tuple(int(x) for x in p) for p in self._recent.get()]
            pairs += [(int(r.us), int(r.event_id))
                      for r in pdf.itertuples()]
            pairs = sorted(pairs)[-3:]
            self._recent.clear()
            self._recent.appendList(pairs)
            n_types = sum(1 for _ in self._types.iterator())
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "n_types": [n_types],
                 "vmin": [vmin], "vmax": [vmax], "last_us": [last_us],
                 "recent": [[p[1] for p in pairs]]})

        def close(self) -> None:
            pass

    return _Profile()


def stream_user_profile_tws(spark: SparkSession, input_dir: str,
                            output_path: str, events_schema):
    """Streaming per-user profile via Spark 4's
    ``transformWithStateInPandas`` — the typed-state successor to
    applyInPandasWithState (ValueState/MapState/ListState instead of
    one tuple blob; RocksDB-backed). Emits an updated profile row per
    (user, micro-batch); the latest row per user is pinned equal to
    the batch groupBy aggregate in tests. Raises a documented
    RuntimeError where the protobuf runtime is absent (this sandbox —
    see the module note above)."""
    if not _has_tws_runtime():
        raise RuntimeError(
            "transformWithStateInPandas requires the google.protobuf "
            "runtime (PySpark's TWS state server protocol); not "
            "installed in this environment — see extractor/streaming.py "
            "env-gate note. Use stream_sessionize/stream_ewma "
            "(applyInPandasWithState) instead.")
    src = (spark.readStream.schema(events_schema)
           .option("maxFilesPerTrigger", 1).parquet(input_dir)
           .select("event_id", "user_id", "event_type", "value",
                   F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                   .alias("us")))
    updates = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_profile_processor(),
        outputStructType=_TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None")
    sink = _epoch_idempotent_sink(os.path.join(output_path, "data"))
    return (updates.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
            .trigger(availableNow=True)
            .start())


# ---------------------------------------------------------------------------
# Streaming CEP: event_seq_match's funnel regex with O(1) cross-batch
# state per user (applyInPandasWithState)
# ---------------------------------------------------------------------------

_CEP_STATE_SCHEMA = ("in_run INT, run_start LONG, n_matches LONG, "
                     "first_pos LONG, seq_len LONG")
_CEP_OUT_SCHEMA = ("user_id LONG, seq_len LONG, n_matches LONG, "
                   "first_pos LONG")
_CEP_CH = {"signup": "S", "view": "V", "click": "C", "purchase": "P"}


def _cep_group(key, pdf_iter, state):
    """Per-user streaming evaluation of the S[VC]*P funnel with O(1)
    state — NOT the event sequence itself. The regex's DFA needs only:
    is a candidate run alive at the batch boundary (state 1 = an S
    was seen and nothing since killed the run), and where that run's
    S sits globally. A live run is re-materialized as a single
    virtual 'S' prefixed to the next batch's character string, which
    is sound because the run's interior is [VC]* BY INVARIANT — its
    content cannot affect any future transition. One re.finditer per
    (user, micro-batch), never per event; counters (n_matches,
    first_pos, seq_len) carry the rest. End-of-batch run detection is
    the RIGHTMOST 'S' whose suffix is all [VC] (an S at state 1
    restarts the run — regex scanning resumes after a dead attempt —
    and any earlier S's suffix would contain that S, so rightmost is
    the only candidate)."""
    import re

    import pandas as pd

    batches = list(pdf_iter)
    if not batches:
        return
    pdf = pd.concat(batches, ignore_index=True)
    pdf = pdf.sort_values(["us", "event_id"])
    chars = "".join(_CEP_CH.get(t, "E") for t in pdf["event_type"])
    if state.exists:
        in_run, run_start, n_matches, first_pos, seq_len = state.get
    else:
        in_run, run_start, n_matches, first_pos, seq_len = 0, 0, 0, 0, 0
    prefix = "S" if in_run else ""
    s = prefix + chars
    last_end = 0
    for m in re.finditer("S[VC]*P", s):
        if n_matches == 0 and first_pos == 0:
            if in_run and m.start() == 0:
                first_pos = run_start
            else:
                first_pos = seq_len + (m.start() - len(prefix)) + 1
        n_matches += 1
        last_end = m.end()
    rem = s[last_end:]
    j = rem.rfind("S")
    if j >= 0 and all(c in "VC" for c in rem[j + 1:]):
        abs_i = last_end + j
        if not (in_run and abs_i == 0):
            run_start = seq_len + (abs_i - len(prefix)) + 1
        in_run = 1
    else:
        in_run, run_start = 0, 0
    seq_len += len(chars)
    state.update((int(in_run), int(run_start), int(n_matches),
                  int(first_pos), int(seq_len)))
    yield pd.DataFrame({"user_id": [key[0]], "seq_len": [seq_len],
                        "n_matches": [n_matches],
                        "first_pos": [first_pos]})


def stream_event_seq(spark: SparkSession, input_dir: str,
                     output_path: str, events_schema):
    """Streaming twin of the batch ``event_seq_match`` CEP query:
    funnel-pattern matching over a continuously-arriving event feed
    with constant per-user state (see _cep_group) — the Flink-CEP
    capability on Structured Streaming. Emits an updated
    (user, seq_len, n_matches, first_pos) row per micro-batch; the
    latest row per user is pinned EQUAL to the batch query in tests,
    including runs that straddle micro-batch boundaries."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (spark.readStream.schema(events_schema)
           .option("maxFilesPerTrigger", 1).parquet(input_dir)
           .select("event_id", "user_id", "event_type",
                   F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                   .alias("us")))
    updates = src.groupBy("user_id").applyInPandasWithState(
        _cep_group,
        outputStructType=_CEP_OUT_SCHEMA,
        stateStructType=_CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = _epoch_idempotent_sink(os.path.join(output_path, "data"))
    return (updates.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(output_path, "_ckpt"))
            .trigger(availableNow=True)
            .start())


# ---------------------------------------------------------------------------
# Streaming CDC apply: foreachBatch MERGE into a bucket-partitioned
# parquet table (the lakehouse upsert sink)
# ---------------------------------------------------------------------------

CDC_SCHEMA = ("doc_id LONG, op STRING, text STRING, source STRING, "
              "version LONG")


def _cdc_merge(current: DataFrame, changes: DataFrame) -> DataFrame:
    """Last-writer-wins CDC apply (the merge_upsert_cdc single-join
    shape, versioned): reduce the changeset to its highest-version
    row per key, full-outer join the current state, and resolve —
    a change wins iff its version >= the row's (so REPLAYING a batch
    is a no-op: the same versions re-apply to the same result);
    surviving op='delete' drops the key."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("version").desc(), F.col("op"))
    top = (changes.withColumn("_rn", F.row_number().over(w))
           .where("_rn = 1").drop("_rn")
           .select("doc_id", "op",
                   F.col("text").alias("c_text"),
                   F.col("source").alias("c_source"),
                   F.col("version").alias("c_version"),
                   F.lit(True).alias("_c")))
    cur = current.select("doc_id", "text", "source", "version", "bucket",
                         F.lit(True).alias("_b"))
    j = cur.join(top, "doc_id", "full_outer")
    apply_chg = (F.col("_c").isNotNull()
                 & (F.col("_b").isNull()
                    | (F.col("c_version") >= F.col("version"))))
    keep = ~(apply_chg & (F.col("op") == "delete"))
    return (j.where(keep)
            .select("doc_id",
                    F.when(apply_chg, F.col("c_text"))
                    .otherwise(F.col("text")).alias("text"),
                    F.when(apply_chg, F.col("c_source"))
                    .otherwise(F.col("source")).alias("source"),
                    F.when(apply_chg, F.col("c_version"))
                    .otherwise(F.col("version")).alias("version")))


def stream_cdc_apply(spark: SparkSession, input_dir: str,
                     table_dir: str, checkpoint_dir: str,
                     n_buckets: int = 8):
    """Continuous CDC apply: a stream of (doc_id, op, text, source,
    version) change rows maintained into a bucket-partitioned parquet
    table via foreachBatch MERGE — upserts overwrite, deletes drop,
    last writer (highest version) wins, and only the buckets a batch
    TOUCHES are rewritten (dynamic partition overwrite on
    bucket = pmod(xxhash64(doc_id), n_buckets) — the copy-on-write
    merge cost is proportional to the changed key set, not the
    table). Epoch replay after a crash converges because the merge
    is idempotent by version (re-applying a batch reproduces the
    same bucket contents byte-for-byte, and the overwrite replaces
    whole bucket dirs). Pinned in tests: a 3-micro-batch stream
    equals the one-shot grouped LWW apply of all changes; replaying
    the final batch by hand leaves the table unchanged."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        b = batch_df.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
        touched = [r["bucket"] for r in
                   b.select("bucket").distinct().collect()]
        if not touched:
            return
        try:
            cur = (sess.read.schema(
                "doc_id LONG, text STRING, source STRING, version LONG, "
                "bucket LONG").parquet(table_dir)
                .where(F.col("bucket").isin(touched)))
        except Exception:
            cur = sess.createDataFrame(
                [], "doc_id LONG, text STRING, source STRING, "
                    "version LONG, bucket LONG")
        merged = (_cdc_merge(cur, b.drop("bucket"))
                  .withColumn("bucket", F.pmod(F.xxhash64("doc_id"),
                                               F.lit(n_buckets))))
        merged = merged.persist()
        (merged.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(table_dir))
        # dynamic overwrite only rewrites partitions PRESENT in the
        # output: a touched bucket whose keys were ALL deleted emits
        # zero rows, its directory is never replaced, and the stale
        # rows would silently survive — the classic dynamic-overwrite
        # deletion pitfall. Remove emptied bucket dirs explicitly.
        import shutil
        kept = {r["bucket"] for r in
                merged.select("bucket").distinct().collect()}
        for bk in set(touched) - kept:
            shutil.rmtree(os.path.join(table_dir,
                                       "bucket={}".format(bk)),
                          ignore_errors=True)
        merged.unpersist()

    src = (spark.readStream.schema(CDC_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(input_dir))
    return (src.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
