"""Table layer: Iceberg when the runtime catalog has it, parquet with
dynamic partition overwrite otherwise (SURVEY.md §7.5 — the sandbox
ships no Iceberg jars; the contract the job relies on is only
"overwrite exactly the partitions present in this write", which both
provide)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Overwrite only the partitions present in ``df`` (idempotent
    replay unit). Iceberg: ``overwritePartitions()``; parquet: dynamic
    partition overwrite."""
    spark = df.sparkSession
    if path.startswith("iceberg:"):
        df.writeTo(path[len("iceberg:"):]).overwritePartitions()
        return
    # per-WRITE option, not the session conf: concurrent writers in
    # one session must not race on a global setting
    (df.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(path))


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if path.startswith("iceberg:"):
        return spark.read.table(path[len("iceberg:"):])
    return spark.read.parquet(path)
