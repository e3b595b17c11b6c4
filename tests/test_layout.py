"""Z-order layout: row-group stats must prune on BOTH dimensions.

The claim that matters at 100 TB: a linear (x-sorted) layout answers a
y-only predicate by reading every row group; the Z-ordered layout
reads a fraction. We measure it directly from the parquet footers
(min/max stats per row group — exactly what Spark's reader prunes
with), not from timings."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from extractor.job import zorder_expr, zorder_write

N, DOM, FILES = 120_000, 1 << 16, 32


def _corpus(spark):
    # deterministic uniform (x, y) points via xxhash64 — no rand()
    return (spark.range(N)
            .select(F.pmod(F.xxhash64("id"), F.lit(DOM)).alias("x"),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOM)).alias("y"),
                    F.col("id").alias("payload")))


def _overlapping_row_groups(dest, lo_x, hi_x, lo_y, hi_y):
    touched = total = 0
    for f in glob.glob(os.path.join(dest, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx = g.column(idx["x"]).statistics
            sy = g.column(idx["y"]).statistics
            total += 1
            if (sx.min <= hi_x and sx.max >= lo_x
                    and sy.min <= hi_y and sy.max >= lo_y):
                touched += 1
    return touched, total


def test_zorder_expr_interleaves_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long"
    ).select("x", "y", zorder_expr("x", "y").alias("z")).collect()
    got = {(r["x"], r["y"]): r["z"] for r in rows}

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _corpus(spark)
    zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder_write(df, zdir, "x", "y", n_files=FILES)
    # linear comparator: same file count, sorted by x only
    (df.repartitionByRange(FILES, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))

    # content is layout-invariant
    assert (spark.read.parquet(zdir).agg(F.sum("payload")).first()[0]
            == spark.read.parquet(ldir).agg(F.sum("payload")).first()[0])

    box = (1000, 3000, 2000, 4000)           # selective 2-D box
    ysl = (0, DOM - 1, 2000, 4000)           # y-only slice (1/32 of y)
    z_box, z_tot = _overlapping_row_groups(zdir, *box)
    l_box, l_tot = _overlapping_row_groups(ldir, *box)
    z_y, _ = _overlapping_row_groups(zdir, *ysl)
    l_y, _ = _overlapping_row_groups(ldir, *ysl)
    print("row groups touched (of {} / {}): box z={} lin={}; "
          "y-only z={} lin={}".format(z_tot, l_tot, z_box, l_box, z_y, l_y))

    # the linear layout cannot prune the non-leading dimension at all
    assert l_y == l_tot
    # z-order must genuinely prune the y-only predicate
    assert z_y <= 0.75 * z_tot, (z_y, z_tot)
    # and its worst case over the two predicate shapes beats linear's
    assert max(z_box, z_y) < max(l_box, l_y)


def test_dynamic_partition_pruning_join(spark, tmp_path):
    """Hive-partitioned fact + filtered dim: the fact scan must carry a
    runtime ``dynamicpruning`` PartitionFilter fed by the dim's reused
    broadcast — directories for keys the dim filter kills are never
    read. Negative control: with the optimizer rule off, the same join
    plans a plain full-partition scan (so the assert is detecting DPP,
    not an artifact of the plan printer)."""
    from extractor.job import dpp_join_counts, hive_partition_write

    fact_dir = str(tmp_path / "events_by_type")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hive_partition_write(ev, fact_dir, "event_type")

    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("error", "ops"),
         ("purchase", "monetize"), ("signup", "acquire")],
        "event_type string, category string")
    flt = F.col("category") == "monetize"

    res = dpp_join_counts(spark, fact_dir, dim, flt)
    got = {(r["event_type"], r["n"]) for r in res.collect()}

    # equality vs the unpartitioned computation
    want = {(r["event_type"], r["n"])
            for r in ev.join(dim.where(flt), "event_type")
                       .groupBy("event_type").count()
                       .withColumnRenamed("count", "n").collect()}
    assert got == want and got  # non-trivial

    plan = res._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "dynamicpruning" in plan, plan
    assert "PartitionFilters" in plan, plan

    # negative control: rule disabled -> no runtime pruning subquery
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
                   "false")
    try:
        off = dpp_join_counts(spark, fact_dir, dim, flt)
        off.collect()
        plan_off = off._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" not in plan_off, plan_off
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")


def test_spanning_header_xy_band_rescue():
    """The classic column-detection trap: a full-width title bridges
    the inter-column gap, so plain x-interval merge sees ONE column
    and interleaves the two body columns line-by-line. The XY-band
    rescue must read: spanning line first, then ALL of the left
    column, then ALL of the right; a mid-page spanning banner must
    split the page into two independent 2-column bands; genuinely
    single-column prose (every line wide) must be untouched."""
    import json

    from extractor.core.batch import extract_one

    def word(x, y, w, txt):
        return {"t": txt, "x0": x, "y0": y, "x1": x + w, "y1": y + 12}

    def run(glyphs):
        payload = json.dumps(
            {"pages": [{"w": 600, "h": 800, "glyphs": glyphs}]})
        return extract_one(payload, "pdf")[0].split("\n")

    g = [word(50, 20, 500, "FULL WIDTH TITLE")]
    g += [word(50, 50 + 16 * r, 200, "left%d alpha" % r) for r in range(5)]
    g += [word(320, 50 + 16 * r, 200, "right%d beta" % r) for r in range(5)]
    lines = run(g)
    assert lines[0] == "FULL WIDTH TITLE"
    assert lines[1:6] == ["left%d alpha" % r for r in range(5)]
    assert lines[6:] == ["right%d beta" % r for r in range(5)]

    g = [word(50, 40 + 16 * r, 200, "t1l%d aa" % r) for r in range(3)]
    g += [word(320, 40 + 16 * r, 200, "t1r%d bb" % r) for r in range(3)]
    g += [word(50, 100, 500, "SECTION BANNER")]
    g += [word(50, 130 + 16 * r, 200, "t2l%d cc" % r) for r in range(3)]
    g += [word(320, 130 + 16 * r, 200, "t2r%d dd" % r) for r in range(3)]
    assert run(g) == (["t1l%d aa" % r for r in range(3)]
                      + ["t1r%d bb" % r for r in range(3)]
                      + ["SECTION BANNER"]
                      + ["t2l%d cc" % r for r in range(3)]
                      + ["t2r%d dd" % r for r in range(3)])

    g = [word(50, 30 + 16 * r, 500, "prose line %d here" % r)
         for r in range(6)]
    assert run(g) == ["prose line %d here" % r for r in range(6)]


def test_rtl_page_reading_order():
    """RTL-dominant pages read columns right->left and words within a
    line right->left (logical order); the geometry-identical Latin
    twin keeps the canonical left->right order — so the rule is
    provably direction-gated, not a global flip. A mostly-Latin page
    with one embedded Arabic word stays LTR (majority gate)."""
    from extractor.core.pdf_layout import _rtl_dominant, page_lines

    def g(t, x0, y0):
        return {"t": t, "x0": x0, "y0": y0, "x1": x0 + 50, "y1": y0 + 10}

    ar = ["كتاب", "قلم", "بيت", "شمس", "قمر", "نجم"]
    en = ["book", "pen", "house", "sun", "moon", "star"]

    def page(words):
        return {"w": 600, "h": 200, "glyphs": [
            g(words[0], 540, 10), g(words[1], 480, 10),   # right col L1
            g(words[2], 540, 30),                          # right col L2
            g(words[3], 140, 10), g(words[4], 80, 10),     # left col L1
            g(words[5], 80, 30),                           # left col L2
        ]}

    rtl_lines = [ln["text"] for ln in page_lines(page(ar))]
    assert rtl_lines == [
        "كتاب قلم",    # right column first; rightmost word first
        "بيت",
        "شمس قمر",     # then left column, also right-to-left words
        "نجم",
    ], rtl_lines

    ltr_lines = [ln["text"] for ln in page_lines(page(en))]
    assert ltr_lines == ["moon sun", "star", "pen book", "house"], ltr_lines

    # majority gate: one Arabic word in Latin prose does not flip
    import numpy as np
    mixed = np.asarray(["the", "quick", "كتاب", "fox", "jumps"], dtype=str)
    assert not _rtl_dominant(mixed)
    assert _rtl_dominant(np.asarray(ar, dtype=str))


def test_running_header_footer_removal():
    """4-page doc: the repeated top-band header and the digit-varying
    bottom-band footer ('Page N' -> normalized 'Page #') vanish; body
    lines and a mid-page line that HAPPENS to equal the header text
    survive. A 2-page doc with the same furniture keeps everything
    (the >=3-page gate), as does a line repeated on only 1 of 4
    pages."""
    import json

    from extractor.core.pdf_layout import extract_pdf

    def word(t, x, y):
        return {"t": t, "x0": x, "y0": y, "x1": x + 60, "y1": y + 12}

    def page(i, with_midpage_clone=False, odd_header=False):
        glyphs = [word("ACME" if not odd_header else "ODDITY", 40, 10),
                  word("Report", 110, 10)]                 # top band
        glyphs += [word("body%d" % i, 40, 300 + 14 * k, ) for k in range(3)]
        if with_midpage_clone:
            glyphs += [word("ACME", 40, 400), word("Report", 110, 400)]
        glyphs += [word("Page", 40, 780), word(str(i + 1), 110, 780)]
        return {"w": 600, "h": 800, "glyphs": glyphs}

    doc4 = {"pages": [page(0, with_midpage_clone=True), page(1),
                      page(2), page(3, odd_header=True)]}
    out = extract_pdf(json.dumps(doc4))["clean_text"].splitlines()
    assert "ACME Report" in out          # the mid-page clone survives
    assert out.count("ACME Report") == 1  # ...but only once (3 headers gone)
    assert not any(ln.startswith("Page") for ln in out), out
    assert "ODDITY Report" in out        # 1-of-4 repetition: kept
    assert sum(ln.startswith("body") for ln in out) == 12

    doc2 = {"pages": [page(0), page(1)]}
    out2 = extract_pdf(json.dumps(doc2))["clean_text"].splitlines()
    assert out2.count("ACME Report") == 2  # under the page gate: kept
    assert sum(ln.startswith("Page") for ln in out2) == 2


def test_furniture_band_respects_canvas_normalization():
    """Code-review r4 finding: the furniture band compared normalized
    line bboxes against the RAW page height, so an oversize page
    (h > MAX_CANVAS) classified its entire content as 'top band'.
    Now: a 4-page doc at h=35000 (scaled 10x down by the canvas
    clamp) must still strip exactly the margin-repeated header/footer
    and keep every body line — identical classification to the same
    document authored at h=3500."""
    import json

    from extractor.core.pdf_layout import extract_pdf

    def doc(h):
        s = h / 800.0

        def word(t, x, y):
            return {"t": t, "x0": x * s, "y0": y * s,
                    "x1": (x + 60) * s, "y1": (y + 12) * s}

        def page(i):
            g = [word("ACME", 40, 10), word("Report", 110, 10)]
            g += [word("body%d" % i, 40, 300 + 14 * k) for k in range(3)]
            g += [word("Page", 40, 780), word(str(i + 1), 110, 780)]
            return {"w": 600 * s, "h": float(h), "glyphs": g}

        return {"pages": [page(i) for i in range(4)]}

    big = extract_pdf(json.dumps(doc(35000)))["clean_text"].splitlines()
    small = extract_pdf(json.dumps(doc(3500)))["clean_text"].splitlines()
    assert big == small
    assert sum(ln.startswith("body") for ln in big) == 12
    assert "ACME Report" not in big
    assert not any(ln.startswith("Page") for ln in big)


def test_rtl_gate_ignores_arabic_indic_digits():
    """Code-review r4 finding: Arabic-Indic digits counted as RTL
    evidence while the denominator counted letters only, so a Latin
    table page dense with Eastern-Arabic numerals flipped to RTL.
    Digits are direction-neutral now: Latin words + many Arabic-Indic
    numerals stay LTR; genuine Arabic words still trip the gate."""
    import numpy as np

    from extractor.core.pdf_layout import _rtl_dominant

    numerals = ["٠١٢", "٣٤٥", "٦٧٨", "٩٠١"] * 25   # 100 numeral cells
    latin = ["quarterly", "revenue", "table", "totals"] * 10
    assert not _rtl_dominant(np.asarray(latin + numerals, dtype=str))
    arabic = ["كتاب", "قلم", "بيت", "شمس"] * 10
    assert _rtl_dominant(np.asarray(arabic + numerals, dtype=str))


def _ref_xy2d(n, x, y):
    """Reference Hilbert xy2d (the classic quadrant-rotation loop)."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_expr_matches_reference_and_is_continuous(spark):
    """The JVM aggregate() fold must equal the reference xy2d on the
    FULL 32x32 grid (bits=5), be a bijection onto [0, 1024), and
    satisfy the defining Hilbert property: consecutive indices are
    Manhattan-distance-1 grid neighbors (the continuity Z-order lacks
    — and the reason liquid-clustering layouts use Hilbert)."""
    from extractor.job import hilbert_expr

    bits, n = 5, 32
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {(r["x"], r["y"]): r["d"] for r in
           df.select("x", "y",
                     hilbert_expr("x", "y", bits).alias("d")).collect()}
    assert got == {(x, y): _ref_xy2d(n, x, y) for x, y in pts}
    assert sorted(got.values()) == list(range(n * n))
    inv = {d: xy for xy, d in got.items()}
    assert all(abs(inv[d][0] - inv[d + 1][0])
               + abs(inv[d][1] - inv[d + 1][1]) == 1
               for d in range(n * n - 1))
    # Z-order on the same grid is NOT continuous (seam jumps exist)
    def morton(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z
    zinv = {morton(x, y): (x, y) for x, y in pts}
    zsteps = [abs(zinv[d][0] - zinv[d + 1][0])
              + abs(zinv[d][1] - zinv[d + 1][1])
              for d in range(n * n - 1)]
    assert max(zsteps) > 1


def test_hilbert_write_prunes_both_dimensions(spark, tmp_path):
    """Same harness as the Z-order pruning test: Hilbert layout must
    prune the y-only predicate a linear-by-x layout cannot touch, and
    beat linear's worst case over both predicate shapes; content is
    layout-invariant."""
    from extractor.job import hilbert_write

    df = _corpus(spark)
    hdir, ldir = str(tmp_path / "hilbert"), str(tmp_path / "linear")
    hilbert_write(df, hdir, "x", "y", n_files=FILES)
    (df.repartitionByRange(FILES, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))
    assert (spark.read.parquet(hdir).agg(F.sum("payload")).first()[0]
            == spark.read.parquet(ldir).agg(F.sum("payload")).first()[0])
    box = (1000, 3000, 2000, 4000)
    ysl = (0, DOM - 1, 2000, 4000)
    h_box, h_tot = _overlapping_row_groups(hdir, *box)
    l_box, l_tot = _overlapping_row_groups(ldir, *box)
    h_y, _ = _overlapping_row_groups(hdir, *ysl)
    l_y, _ = _overlapping_row_groups(ldir, *ysl)
    print("row groups touched (of {} / {}): box h={} lin={}; "
          "y-only h={} lin={}".format(h_tot, l_tot, h_box, l_box, h_y, l_y))
    assert l_y == l_tot
    assert h_y <= 0.75 * h_tot, (h_y, h_tot)
    assert max(h_box, h_y) < max(l_box, l_y)
