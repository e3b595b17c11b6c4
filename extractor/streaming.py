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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extractor.job import plan_extract
from extractor.schema import TRANSCRIPTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    n_buckets: int = 64,
    trigger_once: bool = True,
):
    """File-source streaming extraction. Returns the StreamingQuery.

    ``trigger_once`` processes everything available and stops (the
    batch-parity mode used by tests); in production use a processing-
    time trigger and the same foreachBatch body.
    """
    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    data_dir = os.path.join(output_path, "data")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # partition by (epoch, bucket): a replayed micro-batch
        # dynamic-overwrites exactly its own epoch's partitions, never
        # earlier epochs' output -> idempotent, exactly-once to parquet
        out = plan_extract(batch_df, n_buckets).withColumn(
            "epoch", F.lit(int(epoch_id)))
        spark_ = out.sparkSession
        prev = spark_.conf.get("spark.sql.sources.partitionOverwriteMode",
                               "static")
        spark_.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (out.write.mode("overwrite")
             .partitionBy("epoch", "bucket").parquet(data_dir))
        finally:
            spark_.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(output_path, "_stream_ckpt"))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
