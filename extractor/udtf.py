"""Python UDTF surface: the interactive re-segmentation query.

The reference exposes ``POST /segmentReference`` — a user re-runs
reference segmentation over ONE document's text and gets the per-
reference rows back (LOCDB-V3/app.py's segment route driving
imgProcessing.py:987-1083). That is a row-level, few-rows-in /
few-rows-out *interactive* shape, and a Python UDTF is the idiomatic
Spark 4 surface for it: registered once, callable from SQL as a
lateral table function.

This is explicitly NOT the bulk path. The 10^12-turn pipeline runs
the Arrow-batched ``mapInPandas`` kernel (extractor/core/batch.py —
the input_hint's "no per-row Python" rule); the UDTF exists for
ad-hoc SQL over a handful of rows, and its output is differential-
tested against that kernel so the two surfaces can never drift.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

_RETURN_TYPE = ("ref_idx int, raw string, span_start int, span_end int, "
                "detector string, n_fields int")


@udtf(returnType=_RETURN_TYPE)
class SegmentRefsUDTF:
    """One input text -> one row per segmented reference.

    Columns mirror the batch kernel's per-ref struct (raw string,
    char span, detector provenance) plus n_fields, the count of
    populated bibliographic fields from refseg.parse_fields — the
    `citation[valid=true]`-style quick quality signal.
    """

    def eval(self, clean_text):  # noqa: ANN001 (UDTF contract)
        if clean_text is None:
            return
        from extractor.core.batch import _plain_refs

        for i, r in enumerate(_plain_refs(clean_text)):
            n_fields = sum(1 for v in r["fields"].values() if v)
            yield (i, r["raw"], r["span_start"], r["span_end"],
                   r["detector"], n_fields)


def register(spark) -> str:
    """Register the UDTF for SQL use; returns the function name.

    SQL shape: ``SELECT d.doc_id, s.* FROM docs d,
    LATERAL segment_refs(d.text) s``.
    """
    spark.udtf.register("segment_refs", SegmentRefsUDTF)
    return "segment_refs"
