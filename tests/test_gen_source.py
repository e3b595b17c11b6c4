"""transcript_gen Python DataSource: the storage-free input path for
north-rule-scale benchmarking. Pins (a) the input_hint schema, (b)
partition-count invariance (the property that makes the 10^12-turn
contract honest — any executor count yields the same table), (c) the
skew fixture survives, and (d) the real extraction pipeline over the
generated frame matches the pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from extractor import gen_source, job
from extractor.core.batch import extract_batch


@pytest.fixture(scope="module")
def gen_spark(spark):
    gen_source.register(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format("transcript_gen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_matches_input_hint(gen_spark):
    df = _read(gen_spark, n_turns=200, numPartitions=2)
    assert df.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,"
        "text:string,tool:string,ts:timestamp_ntz>")


def test_partition_invariance_and_skew(gen_spark):
    a = _read(gen_spark, n_turns=2000, numPartitions=3)
    b = _read(gen_spark, n_turns=2000, numPartitions=16)
    assert a.rdd.getNumPartitions() == 3
    # ceil-step chunking may yield slightly fewer than requested
    assert 8 < b.rdd.getNumPartitions() <= 16
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) >= 2000
    hot = [r for r in ra if r[0] == "conv-hot-000000"]
    assert len(hot) == 600  # hot_frac 0.30 of requested total


def test_generated_input_extracts_to_oracle(gen_spark):
    src = _read(gen_spark, n_turns=600, numPartitions=4)
    got = (job.plan_extract(src, n_buckets=8)
           .orderBy("conv_id", "turn_idx").toPandas())
    pdf = src.toPandas()
    exp = (extract_batch(pdf)
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert (got["clean_text"].values == exp["clean_text"].values).all()
    assert list(got["conv_id"]) == list(exp["conv_id"])


def test_stream_reader_resumes_from_checkpoint(gen_spark, tmp_path):
    """Two availableNow runs against one checkpoint: run 2 must resume
    at the committed conversation offset (no re-emit, no gap), and the
    union must equal the batch source over conv range [0, 2*batch).
    Determinism-under-replay is the property the WAL requires."""
    import os

    out = str(tmp_path)

    def run_once():
        q = (gen_spark.readStream.format("transcript_gen")
             .option("n_turns", 2000).option("convs_per_batch", 9).load()
             .writeStream.format("parquet")
             .option("path", os.path.join(out, "data"))
             .option("checkpointLocation", os.path.join(out, "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    run_once()
    run_once()
    got = gen_spark.read.parquet(os.path.join(out, "data"))
    assert got.select("conv_id").distinct().count() == 18
    batch = (gen_spark.read.format("transcript_gen")
             .option("n_turns", 2000).option("num_convs", 18)
             .option("numPartitions", 3).load())
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b


def test_stream_extract_gen_end_to_end_resume(gen_spark, tmp_path):
    """Storage-free continuous ingest -> extraction: two availableNow
    runs of stream_extract_gen against one checkpoint must together
    produce exactly the extraction of conversations [0, 18) — i.e. the
    stream source's WAL resume composes with the epoch-partitioned
    exactly-once sink, matching the pandas oracle byte-for-byte."""
    out = str(tmp_path / "se")
    from extractor.streaming import stream_extract_gen

    for _ in range(2):
        q = stream_extract_gen(gen_spark, out, n_buckets=8,
                               convs_per_batch=9, n_turns=2000)
        assert q.awaitTermination(120)

    got = (gen_spark.read.parquet(out + "/data").drop("bucket", "epoch")
           .orderBy("conv_id", "turn_idx").toPandas())
    src = _read(gen_spark, n_turns=2000, num_convs=18, numPartitions=3)
    exp = (extract_batch(src.toPandas())
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert (got["clean_text"].values == exp["clean_text"].values).all()
    assert list(got["conv_id"]) == list(exp["conv_id"])


def test_stream_extract_gen_replays_uncommitted_epoch_idempotently(
        gen_spark, tmp_path):
    """Exactly-once under the real failure window: crash AFTER the
    foreachBatch sink wrote parquet but BEFORE Spark committed the
    epoch. Simulated by deleting commits/1 from the stream checkpoint;
    on restart Spark replays batch 1 over the same offset range
    (readBetweenOffsets determinism) and the sink's dynamic overwrite
    of its own epoch partitions must leave the output byte-identical —
    no duplicate (conv_id, turn_idx), no changed rows."""
    import os

    from extractor.streaming import stream_extract_gen

    out = str(tmp_path / "se")
    for _ in range(2):
        q = stream_extract_gen(gen_spark, out, n_buckets=8,
                               convs_per_batch=9, n_turns=2000)
        assert q.awaitTermination(120)

    def snap():
        pdf = (gen_spark.read.parquet(out + "/data")
               .toPandas().sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        return pdf

    before = snap()
    assert not before.duplicated(["conv_id", "turn_idx"]).any()

    # crash window: epoch 1's output exists, its commit marker doesn't
    # (drop the checksum sidecar too — a crash before the atomic
    # rename leaves neither file, and a stale .crc breaks the rename)
    os.remove(os.path.join(out, "_stream_ckpt", "commits", "1"))
    os.remove(os.path.join(out, "_stream_ckpt", "commits", ".1.crc"))
    q = stream_extract_gen(gen_spark, out, n_buckets=8,
                           convs_per_batch=9, n_turns=2000)
    assert q.awaitTermination(120)

    after = snap()
    assert not after.duplicated(["conv_id", "turn_idx"]).any()
    # every pre-crash row survives the replay unchanged (the rerun may
    # ALSO have drained a new epoch beyond it — allowed, not required)
    replayed = (after[after["epoch"] <= 1]
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(replayed, before)


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """The writable data source: staged files become visible only via
    the driver commit (part files + _SUCCESS with the row count), the
    staging dir is gone, and the shards round-trip to the input."""
    import glob
    import gzip
    import json
    import os

    from extractor.gen_source import register_sink

    register_sink(spark)
    df = spark.createDataFrame(
        [("c1", 0, "user", "hello", "", "2025-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string").unionByName(spark.createDataFrame(
            [("c1", 1, "assistant", "hi → there", "",
              "2025-01-01 00:00:07")],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string"))
    out = str(tmp_path / "sink")
    df.repartition(3).write.format("transcript_jsonl") \
        .option("path", out).mode("append").save()

    assert not os.path.isdir(os.path.join(out, "_staging"))
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert json.load(f)["rows"] == 2
    rows = []
    for fn in sorted(glob.glob(os.path.join(out, "part-*.jsonl.gz"))):
        with gzip.open(fn, "rt", encoding="utf-8") as f:
            rows += [json.loads(l) for l in f]
    assert sorted(r["turn_idx"] for r in rows) == [0, 1]
    assert {r["text"] for r in rows} == {"hello", "hi → there"}


def test_jsonl_sink_abort_leaves_no_partial_output(spark, tmp_path):
    """A failing write must leave the destination unobservably empty:
    no part files, no _SUCCESS, staging swept — the two-phase
    guarantee under test."""
    import os

    import pytest as _pytest

    from extractor.gen_source import register_sink

    register_sink(spark)
    df = (spark.range(100).selectExpr(
        "cast(id as string) conv_id",
        "assert_true(id < 50, 'boom') is null or id < 999 as bad"))
    out = str(tmp_path / "sink2")
    with _pytest.raises(Exception):
        df.write.format("transcript_jsonl").option("path", out) \
            .mode("append").save()
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in (os.listdir(out) if os.path.isdir(out) else [])
                if f.startswith("part-")]


def test_jsonl_sink_repeat_writes_append_and_overwrite(spark, tmp_path):
    """Repeat writes to the same path must not corrupt (ADVICE r3):
    append keeps BOTH generations (unique task-uuid shard names, no
    clobber) and accumulates the _SUCCESS count; overwrite after a
    LARGER earlier run leaves only the new generation — no stale
    higher-numbered shards mixed under a fresh _SUCCESS."""
    import glob
    import gzip
    import json
    import os

    from extractor.gen_source import register_sink

    register_sink(spark)

    def mk(vals):
        return spark.createDataFrame(
            [("c", i, "user", v, "", "2025-01-01 00:00:00")
             for i, v in enumerate(vals)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string")

    def read_all(path):
        rows = []
        for fn in sorted(glob.glob(os.path.join(path, "part-*.jsonl.gz"))):
            with gzip.open(fn, "rt", encoding="utf-8") as f:
                rows += [json.loads(l)["text"] for l in f]
        return sorted(rows)

    # append twice: union survives, count accumulates
    out = str(tmp_path / "sink_app")
    mk(["a", "b"]).repartition(2).write.format("transcript_jsonl") \
        .option("path", out).mode("append").save()
    mk(["c"]).repartition(1).write.format("transcript_jsonl") \
        .option("path", out).mode("append").save()
    assert read_all(out) == ["a", "b", "c"]
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert json.load(f)["rows"] == 3

    # big write then small overwrite: zero stale shards
    out2 = str(tmp_path / "sink_ovr")
    mk([f"x{i}" for i in range(8)]).repartition(8) \
        .write.format("transcript_jsonl") \
        .option("path", out2).mode("append").save()
    mk(["y"]).repartition(1).write.format("transcript_jsonl") \
        .option("path", out2).mode("overwrite").save()
    assert read_all(out2) == ["y"]
    with open(os.path.join(out2, "_SUCCESS")) as f:
        assert json.load(f)["rows"] == 1


def test_jsonl_sink_append_refuses_markerless_wreckage(spark, tmp_path):
    """Appending onto a directory holding part-* shards WITHOUT a
    _SUCCESS marker (the detectable wreckage of a crashed overwrite
    commit) must hard-fail, not legitimize the stale shards under a
    fresh marker whose count excludes them."""
    import os

    import pytest as _pytest

    from extractor.gen_source import register_sink

    register_sink(spark)
    out = str(tmp_path / "sink_wreck")
    df = spark.createDataFrame(
        [("c", 0, "user", "x", "", "2025-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string")
    df.write.format("transcript_jsonl").option("path", out) \
        .mode("append").save()
    os.unlink(os.path.join(out, "_SUCCESS"))  # simulate crashed commit
    with _pytest.raises(Exception, match="without\\s+_SUCCESS|_SUCCESS"):
        df.write.format("transcript_jsonl").option("path", out) \
            .mode("append").save()
    # overwrite still recovers the directory cleanly
    df.write.format("transcript_jsonl").option("path", out) \
        .mode("overwrite").save()
    import json as _json
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert _json.load(f)["rows"] == 1


def test_jsonl_sink_stream_writer_exactly_once(gen_spark, tmp_path):
    """STREAMING write path (DataSourceStreamWriter, completing the
    Python DataSource matrix): gen stream source -> transcript_jsonl
    sink across two availableNow runs on one checkpoint must equal
    the batch source exactly — no duplicate, no loss, across epochs
    AND restarts. Then the two crash windows are driven directly:
    (a) replay of an already-committed epoch (marker present) drops
    its staged duplicates and leaves the directory untouched;
    (b) the renamed-but-unmarked window (marker missing, part-e files
    present) is healed by wholesale replacement on replay."""
    import glob
    import gzip
    import json
    import os

    from extractor.gen_source import (_JsonlStreamShardWriter,
                                      _ShardCommitMessage, register_sink)

    register_sink(gen_spark)
    out = str(tmp_path / "out")

    def run_once():
        q = (gen_spark.readStream.format("transcript_gen")
             .option("n_turns", 2000).option("convs_per_batch", 9).load()
             .writeStream.format("transcript_jsonl")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    run_once()
    run_once()
    rows = []
    for p in sorted(glob.glob(os.path.join(out, "part-e*.jsonl.gz"))):
        with gzip.open(p, "rt", encoding="utf-8") as f:
            rows += [json.loads(line) for line in f]
    batch = (gen_spark.read.format("transcript_gen")
             .option("n_turns", 2000).option("num_convs", 18)
             .load()).toPandas()
    assert len(rows) == len(batch)
    assert (sorted((r["conv_id"], r["turn_idx"]) for r in rows)
            == sorted(zip(batch["conv_id"], batch["turn_idx"])))
    markers = os.listdir(os.path.join(out, "_commits"))
    assert len(markers) >= 2, markers

    # (a) committed-epoch replay: staged duplicate dropped, dir intact
    w = _JsonlStreamShardWriter({"path": out})
    stage_dir = os.path.join(out, "_staging")
    os.makedirs(stage_dir, exist_ok=True)
    dup = os.path.join(stage_dir, "task-0-deadbeef.jsonl.gz")
    with gzip.open(dup, "wt", encoding="utf-8") as f:
        f.write('{"x": 1}\n')
    bid = int(sorted(markers, key=int)[0])
    before = sorted(glob.glob(os.path.join(out, "part-e*.jsonl.gz")))
    w.commit([_ShardCommitMessage(dup, 1)], bid)
    assert not os.path.exists(dup)
    assert sorted(glob.glob(os.path.join(out, "part-e*.jsonl.gz"))) == before

    # (b) renamed-but-unmarked heal: same epoch re-committed replaces
    # its orphans wholesale and re-creates the marker
    os.unlink(os.path.join(out, "_commits", str(bid)))
    os.makedirs(stage_dir, exist_ok=True)  # replay sweep removed it
    rep = os.path.join(stage_dir, "task-0-cafebabe.jsonl.gz")
    with gzip.open(rep, "wt", encoding="utf-8") as f:
        f.write(json.dumps({"conv_id": "healed"}) + "\n")
    w.commit([_ShardCommitMessage(rep, 1)], bid)
    healed = glob.glob(
        os.path.join(out, "part-e{:010d}-*.jsonl.gz".format(bid)))
    assert len(healed) == 1 and healed[0].endswith("cafebabe.jsonl.gz")
    assert os.path.exists(os.path.join(out, "_commits", str(bid)))


def test_jsonl_sink_batch_modes_respect_streaming_epochs(spark, tmp_path):
    """Cross-mode guards on one path (review-pass finding): a batch
    APPEND onto a streaming-sink target (_commits present) must
    refuse — its _SUCCESS count cannot account for epoch shards —
    and a batch OVERWRITE must remove the epoch shards AND their
    _commits markers together, else a restarted stream would treat
    replayed epochs as already-durable and silently drop rows."""
    import glob
    import gzip
    import os

    from extractor.gen_source import register_sink

    register_sink(spark)
    out = str(tmp_path / "sink")
    os.makedirs(os.path.join(out, "_commits"))
    with gzip.open(os.path.join(out, "part-e0000000000-x.jsonl.gz"),
                   "wt", encoding="utf-8") as f:
        f.write('{"conv_id": "s"}\n')
    open(os.path.join(out, "_commits", "0"), "w").close()

    df = spark.createDataFrame(
        [("c1", 0, "user", "hello", "", "2025-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="streaming-sink target"):
        (df.write.format("transcript_jsonl").mode("append")
         .option("path", out).save())

    (df.write.format("transcript_jsonl").mode("overwrite")
     .option("path", out).save())
    assert not glob.glob(os.path.join(out, "part-e*.jsonl.gz"))
    assert not os.path.exists(os.path.join(out, "_commits"))
    # fresh batch shards only (count = task partitioning, >= 1)
    assert glob.glob(os.path.join(out, "part-*.jsonl.gz"))
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_hot_conversation_splits_across_partitions(gen_spark):
    """The round-4 scale-ceiling fix: a hot conversation larger than
    chunk_turns must span MULTIPLE input partitions (before, one
    sequential per-conversation RNG pinned the whole 30%-hot fixture
    to a single task on every wave rescan). Pins (a) the planner
    emits >1 chunk-aligned slice for conv-hot-000000, (b) the table
    is invariant to HOW the chunk grid is partitioned, and (c) the
    slices tile the conversation exactly — no dup, no gap."""
    from extractor.gen_source import _GenReader

    # 40k turns, hot = 12k; chunk_turns=1024 -> 12 hot chunks
    opts = {"n_turns": 40_000, "chunk_turns": 1024,
            "numPartitions": 16, "seed": 42}
    r = _GenReader({k: str(v) for k, v in opts.items()})
    parts = r.partitions()
    hot = [p for p in parts if p.ci_lo == 0 and p.ci_hi == 1]
    assert len(hot) > 1, "hot conversation still single-task"
    for p in hot:
        assert p.turn_lo % 1024 == 0  # chunk-aligned slice start
    spans = sorted((p.turn_lo, p.turn_hi) for p in hot)
    assert spans[0][0] == 0 and spans[-1][1] == 12_000
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c, "gap/overlap in hot slices"

    # invariance across partitioning of the same chunk grid
    a = _read(gen_spark, n_turns=40_000, chunk_turns=1024,
              numPartitions=4)
    b = _read(gen_spark, n_turns=40_000, chunk_turns=1024,
              numPartitions=32)
    ha = a.where("conv_id = 'conv-hot-000000'")
    hb = b.where("conv_id = 'conv-hot-000000'")
    assert ha.count() == hb.count() == 12_000
    import pyspark.sql.functions as F
    fp = lambda df: df.select(F.md5(F.concat_ws(
        "|", "conv_id", "turn_idx", "text", "tool")).alias("h")) \
        .agg(F.expr("bit_xor(cast(conv(substring(h,1,15),16,10) "
                    "as bigint))")).collect()[0][0]
    assert fp(ha) == fp(hb)


def test_stream_and_batch_agree_on_custom_chunk_turns():
    """chunk_turns is dataset identity (like seed): the stream
    reader must honor it so a stream replay of (seed, chunk_turns)
    yields byte-identical rows to the batch planner's — unit-level,
    no Spark session needed."""
    from extractor.gen_source import (_GenPartition, _GenReader,
                                      _GenStreamReader, _gen_conv_batches)

    opts = {"seed": "9", "n_turns": "3000", "chunk_turns": "256",
            "numPartitions": "5"}
    batch_rows = []
    for p in _GenReader(dict(opts)).partitions():
        for rb in _gen_conv_batches(p):
            batch_rows.extend(zip(*(c.to_pylist() for c in rb.columns)))
    sr = _GenStreamReader(dict(opts, convs_per_batch="7"))
    n_convs = _GenReader(dict(opts)).n_convs
    stream_rows, ci = [], 0
    while ci < n_convs:
        end = min(ci + 7, n_convs)
        stream_rows.extend(sr.readBetweenOffsets({"ci": ci}, {"ci": end}))
        ci = end
    assert sorted(map(tuple, batch_rows)) == sorted(map(tuple, stream_rows))
    # and a DIFFERENT chunk_turns is a different (valid) dataset:
    # same schema, same sizes, different payload bytes
    other = []
    for p in _GenReader(dict(opts, chunk_turns="512")).partitions():
        for rb in _gen_conv_batches(p):
            other.extend(zip(*(c.to_pylist() for c in rb.columns)))
    assert len(other) == len(batch_rows)
    assert sorted(r[:2] for r in other) == sorted(r[:2] for r in batch_rows)
    assert sorted(map(tuple, other)) != sorted(map(tuple, batch_rows))
