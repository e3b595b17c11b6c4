"""`transcript_gen` — a PySpark Python DataSource that *generates* the
transcripts table instead of reading it (reference analog: the
fixture-upload ingress, LOCDB-V3 server.py file intake — here the
"files" are synthesized on the executors).

Why a source and not a driver-side DataFrame: at the north-rule scale
(10^12 turns) the input cannot be materialized to storage just to
benchmark the engine. Every conversation in gen_fixtures is already
generated from ``Random((seed, conv_id))`` — no cross-conversation
state — so generation is embarrassingly partition-parallel: the
planner hands each ``InputPartition`` a half-open conversation-index
range and each executor synthesizes only its own range. Conversation
*sizes* are also drawn per-index (``Random((seed, "size", ci))``), so
no partition ever needs another partition's cursor — O(1) planning
per partition, O(own rows) work per task, any ``numPartitions``.

The hot-conversation skew fixture is preserved: conversation index 0
is ``conv-hot-000000`` sized ``hot_frac`` of the requested total, so
the salted-bucket repartition in job.py sees the same adversarial
shape the parquet fixtures carry.

Rows are emitted as pyarrow RecordBatches (the Arrow fast path of the
Python DataSource API), types matching BASELINE.json input_hint:
(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp[us]).
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

from extractor.gen_fixtures import EPOCH, make_turn_text

_SCHEMA_DDL = ("conv_id string, turn_idx int, role string, "
               "text string, tool string, ts timestamp_ntz")

_ARROW_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _conv_size(seed: int, ci: int, n_turns: int, hot_frac: float) -> int:
    if ci == 0:
        return max(1, int(n_turns * hot_frac))
    return random.Random((seed, "size", ci).__repr__()).randint(4, 40)


def _n_convs(seed: int, n_turns: int, hot_frac: float) -> int:
    """Smallest conversation count whose sizes sum to >= n_turns.

    Driver-side planning cost: expected size is 22, so this walks
    ~n_turns/22 indices doing one Random() draw each. For genuinely
    astronomic n_turns, pass num_convs directly instead (sizes then
    define the total) — the per-index size draw needs no prefix sum,
    which is what makes that contract O(1) plannable.
    """
    total, ci = 0, 0
    while total < n_turns:
        total += _conv_size(seed, ci, n_turns, hot_frac)
        ci += 1
    return ci


class _GenPartition(InputPartition):
    def __init__(self, seed, hot_frac, n_turns, ci_lo, ci_hi):
        self.seed, self.hot_frac, self.n_turns = seed, hot_frac, n_turns
        self.ci_lo, self.ci_hi = ci_lo, ci_hi


class _GenReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.hot_frac = float(options.get("hot_frac", 0.30))
        self.n_parts = int(options.get("numPartitions", 32))
        n_convs = options.get("num_convs")
        if n_convs is not None:
            self.n_convs = int(n_convs)
            self.n_turns = int(options.get("n_turns", 0)) or 200_000
        else:
            self.n_turns = int(options.get("n_turns", 2000))
            self.n_convs = _n_convs(self.seed, self.n_turns, self.hot_frac)

    def partitions(self):
        if self.n_convs <= 0:
            # empty table, not a planning error (n_turns=0 etc.):
            # one empty partition keeps the DataFrame contract
            return [_GenPartition(self.seed, self.hot_frac,
                                  self.n_turns, 0, 0)]
        n = min(self.n_parts, self.n_convs)
        step = -(-self.n_convs // n)
        return [
            _GenPartition(self.seed, self.hot_frac, self.n_turns,
                          lo, min(lo + step, self.n_convs))
            for lo in range(0, self.n_convs, step)
        ]

    def read(self, part):
        return _gen_conv_batches(part)


def _gen_conv_rows(seed, hot_frac, n_turns, ci_lo, ci_hi):
    """THE conversation generator (single source of truth for both
    readers — the stream reader consumes the tuples directly, the
    batch reader batches them into Arrow): synthesize every turn of
    conversations ``[ci_lo, ci_hi)`` as
    (conv_id, turn_idx, role, text, tool, ts) tuples."""
    for ci in range(ci_lo, ci_hi):
        conv_id = ("conv-hot-000000" if ci == 0
                   else "conv-{:06d}".format(ci))
        size = _conv_size(seed, ci, n_turns, hot_frac)
        conv_rng = random.Random((seed, conv_id).__repr__())
        base = EPOCH + dt.timedelta(seconds=conv_rng.randrange(10_000_000))
        for ti in range(size):
            text, tool = make_turn_text(conv_rng)
            yield (conv_id, ti, ("user", "assistant", "tool")[ti % 3],
                   text, tool, base + dt.timedelta(seconds=7 * ti))


def _gen_conv_batches(part):
    """Arrow-batching wrapper over :func:`_gen_conv_rows` (the batch
    reader's fast path)."""
    cols = [[] for _ in _ARROW_SCHEMA]

    def flush():
        batch = pa.record_batch(
            [pa.array(vals, f.type)
             for vals, f in zip(cols, _ARROW_SCHEMA)],
            schema=_ARROW_SCHEMA)
        for c in cols:
            c.clear()
        return batch

    for row in _gen_conv_rows(part.seed, part.hot_frac, part.n_turns,
                              part.ci_lo, part.ci_hi):
        for c, v in zip(cols, row):
            c.append(v)
        if len(cols[0]) >= 2048:
            yield flush()
    if cols[0]:
        yield flush()


class _GenStreamReader(SimpleDataSourceStreamReader):
    """Continuous synthetic ingest: the offset IS the conversation
    index, so a micro-batch is a conversation-range window — the batch
    reader's planning unit, replayed incrementally. Spark passes the
    committed start offset into :meth:`read` on every micro-batch
    (including after a restart), so resume needs no reader-side
    bookkeeping; and because every conversation is a pure function of
    ``(seed, ci)``, :meth:`readBetweenOffsets` replays any committed
    range bit-identically — the property the WAL requires of a source.
    ``convs_per_batch`` is the rate limit. The simple (driver-side)
    reader variant is deliberate: a micro-batch here is a bounded
    trickle feeding the streaming-dedup pipeline; bulk generation goes
    through the partition-parallel batch reader above."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.hot_frac = float(options.get("hot_frac", 0.30))
        self.batch_convs = int(options.get("convs_per_batch", 50))
        self.n_turns = int(options.get("n_turns", 2000))

    def initialOffset(self):
        return {"ci": 0}

    def read(self, start):
        lo = int(start["ci"])
        end = {"ci": lo + self.batch_convs}
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start, end):
        # list_iterator, not a bare generator or list: the prefetch
        # path pickles the records into the micro-batch plan (rules
        # out generators) while the WAL-replay path type-checks for
        # an iterator (rules out lists).
        return iter(list(_gen_conv_rows(self.seed, self.hot_frac,
                                        self.n_turns,
                                        int(start["ci"]), int(end["ci"]))))

    def commit(self, end):
        pass


class TranscriptGenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "transcript_gen"

    def schema(self):
        return _SCHEMA_DDL

    def reader(self, schema):
        return _GenReader(self.options)

    def simpleStreamReader(self, schema):
        return _GenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TranscriptGenDataSource)
