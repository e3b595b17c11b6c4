"""PySpark-native main-content + reference-extraction engine.

A from-scratch re-derivation of the capabilities of
``locdb/automatic-reference-extractor`` (reference read-only at
``/root/reference``) as an idiomatic Spark batch job over a transcripts
table ``(conv_id, turn_idx, role, text, tool, ts)``:

- ``extractor.core`` — pure Python + numpy kernels (no pyspark imports):
  HTML boilerplate stripping, PDF glyph-layout parsing, reference-string
  segmentation, fuzzy dedup. These run inside Arrow ``mapInPandas``
  batches on executors and double as the single-threaded oracle for the
  golden-equality tests.
- ``extractor.job`` — the Spark pipeline: scan -> salted repartition ->
  mapInPandas(extract) -> checkpointed partitioned write -> stable
  (conv_id, turn_idx) order on read.
- ``extractor.checkpoint`` / ``extractor.tables`` — Iceberg-style
  commit-log resume semantics on top of parquet (no Iceberg jars in the
  sandbox; the table layer auto-uses Iceberg if a catalog provides it).
- ``extractor.gen_fixtures`` — deterministic seeded synthetic
  transcripts (plain / HTML / pdf-glyph payloads, hot-conversation skew).
"""

__version__ = "0.1.0"
