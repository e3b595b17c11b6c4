"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: the full extraction pipeline (salted
  repartition + Arrow mapInPandas running the HTML-strip / PDF-layout /
  reference-segmentation kernels) over a transcripts table built from
  (a) /root/testdata/sf0.001 documents re-shaped to the input_hint
  schema and (b) a deterministic synthetic payload mix (HTML with
  boilerplate + the 5 reference citation layouts, pdf glyphs with 1-3
  columns, plain text with anchored reference sections).
- ``queries()`` — one entry per implemented operator (SURVEY.md §2 IDs
  in the names) plus the training-data-pipeline operators (dedup,
  MinHash-LSH, SimHash, n-gram Jaccard, ANN cosine top-k + LSH-bucketed
  variant, language-ID, quality scoring, token counting,
  fingerprinting).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query (identical column names/types; exact-integer outputs where
  possible). The rows-only exceptions: ``ann_lsh_bucketed``,
  ``ann_ivf_topk``, ``ann_pq_topk`` and ``ann_ivfpq_topk``
  (probabilistic ANN — in-suite
  recall floors vs ``ann_cosine_topk``'s exact oracle),
  ``extract_synthetic_mix``
  (generator-driven payloads — pytest golden-equality gate),
  ``mm_extract_features`` (entropy/sha1 not replayable in DuckDB —
  pinned by a differential test instead), ``sketch_event_stats``
  (HLL++/GK approximations — accuracy pinned vs exact in-suite),
  ``content_chunk_dedup`` (rolling-hash CDC boundaries aren't SQL —
  pinned by a from-the-definition pandas differential + kernel tests),
  ``ann_mmr_topk`` (greedy iterative selection — independent-loop
  differential on Spark-produced pools + a duplicate-displacement
  hand fixture), ``bpe_train_merges`` (K-round greedy merge
  training — pinned exactly against the Sennrich reference trainer),
  ``compress_ratio_quality`` (zlib sizes aren't SQL — exact replay +
  planted repetitive/random semantics in-suite), and
  ``bpe_encode_texts`` (the merge table is trained FROM the corpus,
  so no self-contained SQL oracle can replay it, and RE2 lacks the
  lookbehind the non-overlapping merge scan needs — pinned in-suite
  by an exact per-doc differential against a from-the-definition
  Python encoder, including the regex-metachar adversarial corpus).
  Round 5 moved four former exceptions INTO the oracle set:
  ``cms_term_counts`` (md5-60bit row hash, replayed exactly in SQL),
  ``suffix_array_build`` / ``longest_repeated_substring`` (literal
  suffix ranking of the concatenation at oracle scale), and
  ``mst_boruvka`` (unrolled Borůvka rounds as materialized CTEs with
  a loud convergence guard) — 360 of 372 queries now carry an exact
  DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship extraction over sf0.001-derived + synthetic transcripts."""
    from extractor.gen_fixtures import gen_transcripts
    from extractor.job import plan_extract
    from extractor.queries import _documents_as_transcripts
    from extractor.schema import TRANSCRIPTS_SCHEMA

    docs_tr = _documents_as_transcripts(spark, "/root/testdata/sf0.001")
    synth_tr = spark.createDataFrame(
        gen_transcripts(400, seed=42), schema=TRANSCRIPTS_SCHEMA)
    tr = docs_tr.unionByName(synth_tr)
    out = plan_extract(tr, n_buckets=16).drop("bucket")
    return out.orderBy("conv_id", "turn_idx").select(
        "conv_id", "turn_idx", "clean_text",
        F.col("n_refs").cast("int").alias("n_refs"),
        F.to_json("refs").alias("refs_json"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from extractor.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from extractor.queries import ORACLES

    return dict(ORACLES)
