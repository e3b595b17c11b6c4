"""The SQL-facing UDTF (interactive segmentReference analog) must
agree exactly with the bulk Arrow kernel's segmentation — same refs,
same spans, same detector — so the two surfaces cannot drift."""

from __future__ import annotations

from extractor.core.batch import _plain_refs
from extractor.udtf import register

DOC = (
    "Intro prose that is not a citation.\n"
    "More body text on a second line.\n"
    "References\n"
    "[1] Miller, A. Deep parsing of scholarly text. Journal of "
    "Documents, 12(3), 2019, pp. 100-110.\n"
    "[2] Chen, B. Layout signals for citation mining. Proc. of the "
    "Extraction Conf., 2021.\n"
)


def test_udtf_matches_batch_kernel(spark):
    name = register(spark)
    df = spark.createDataFrame([(7, DOC), (8, "no refs here at all")],
                               "doc_id int, text string")
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.* FROM udtf_docs d, "
        "LATERAL {}(d.text) s".format(name)).collect()

    exp = _plain_refs(DOC)
    assert len(exp) >= 2  # the fixture genuinely segments
    got7 = sorted([r for r in rows if r["doc_id"] == 7],
                  key=lambda r: r["ref_idx"])
    assert [r["doc_id"] for r in rows] == [7] * len(exp)  # doc 8: no rows
    for i, (r, e) in enumerate(zip(got7, exp)):
        assert r["ref_idx"] == i
        assert r["raw"] == e["raw"]
        assert (r["span_start"], r["span_end"]) == (e["span_start"],
                                                    e["span_end"])
        assert r["detector"] == e["detector"]
        assert r["n_fields"] == sum(1 for v in e["fields"].values() if v)
        assert DOC[r["span_start"]:r["span_end"]].strip().startswith(
            "[{}]".format(i + 1))


def test_udtf_null_input_yields_nothing(spark):
    name = register(spark)
    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    df.createOrReplaceTempView("udtf_nulls")
    assert spark.sql("SELECT s.* FROM udtf_nulls d, LATERAL {}(d.text) s"
                     .format(name)).count() == 0
