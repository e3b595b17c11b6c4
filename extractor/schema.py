"""Fixed StructType schemas (the reference's implicit/dynamic schema
surface — runtime ``has_attr`` checks, optional XML tags — becomes
explicit nullable fields, per SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint: (conv_id string, turn_idx int32, role string, text string,
#              tool string, ts timestamp)
TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    # pandas/pyarrow write naive timestamps (isAdjustedToUTC=false);
    # NTZ matches that physical type so the vectorized reader accepts it
    T.StructField("ts", T.TimestampNTZType(), True),
])

# flat bib record (BibStructured analog, LOCDB-V3/imgProcessing.py:813-967)
FIELDS_STRUCT = T.StructType([
    T.StructField("authors", T.ArrayType(T.StringType()), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("journal", T.StringType(), True),
    T.StructField("date", T.StringType(), True),
    T.StructField("publisher", T.StringType(), True),
    T.StructField("location", T.StringType(), True),
    T.StructField("volume", T.StringType(), True),
    T.StructField("issue", T.StringType(), True),
    T.StructField("pages", T.StringType(), True),
])

REF_STRUCT = T.StructType([
    T.StructField("raw", T.StringType(), False),
    T.StructField("span_start", T.IntegerType(), True),
    T.StructField("span_end", T.IntegerType(), True),
    T.StructField("line_start", T.IntegerType(), True),
    T.StructField("line_end", T.IntegerType(), True),
    T.StructField("bbox", T.ArrayType(T.IntegerType()), True),
    T.StructField("detector", T.StringType(), True),
    T.StructField("fields", FIELDS_STRUCT, True),
])

EXTRACTED_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("clean_text", T.StringType(), True),
    T.StructField("refs", T.ArrayType(REF_STRUCT), True),
    T.StructField("n_refs", T.IntegerType(), True),
])

# job-internal: extraction output still carrying its salt bucket
EXTRACTED_BUCKET_SCHEMA = T.StructType(
    EXTRACTED_SCHEMA.fields + [T.StructField("bucket", T.IntegerType(), False)]
)

CHECKPOINT_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("turns_in", T.LongType(), True),
    T.StructField("turns_out", T.LongType(), True),
    T.StructField("refs_out", T.LongType(), True),
    T.StructField("committed_at", T.TimestampType(), True),
])
