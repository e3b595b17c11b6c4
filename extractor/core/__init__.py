"""Pure-Python extraction kernels (no pyspark imports).

Everything in this package is deterministic, order-stable, and
importable without a JVM so the same code serves as (a) the vectorized
batch body of the Spark ``mapInPandas`` stage and (b) the
single-threaded oracle that produces the golden fixtures the Spark job
must match byte-for-byte per (conv_id, turn_idx).
"""

from extractor.core.batch import extract_batch, extract_one  # noqa: F401
