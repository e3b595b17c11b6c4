"""Hand-computed semantics for the round-3 extension operators
(stratified sampling, duplicated-n-gram spans, TF-IDF top terms,
funnel, cohort retention). The DuckDB oracle gate proves engine
parity; these pin the *intended* semantics on fixtures small enough
to verify by hand — the same split used for j9_asof_join and
pii_scrub."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from extractor.queries import (
    cohort_retention,
    dup_ngram_spans,
    funnel_conversion,
    stratified_sample_balanced,
    tfidf_top_terms,
)


def _docs(tmp_path, texts, langs=None):
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": langs or ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
    }).to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _events(tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type)"""
    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows],
                             format="mixed").astype("datetime64[us]"),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [0.0] * len(rows),
        "props": [""] * len(rows),
    }).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_dup_ngram_spans_counters(spark, tmp_path):
    """Cross-doc dup gram marks exactly its 8-word span; intra-doc
    repetition counts as duplication (Lee et al. semantics); docs
    shorter than the gram width are excluded entirely."""
    sf = _docs(tmp_path, [
        "a b c d e f g h x0 y0 z0",        # 11w, 4 grams, pos0 dup
        "p1 a b c d e f g h q1",           # 10w, 3 grams, pos1 dup
        "c20 c21 c22 c23 c24 c25 c26 c27", # 8w, 1 unique gram
        "s t u",                           # <8 words: excluded
        " ".join(["m"] * 16),              # all 9 grams identical
    ])
    got = {r["doc_id"]: (r["n_words"], r["n_grams"], r["dup_grams"],
                         r["covered_words"])
           for r in dup_ngram_spans(spark, sf).collect()}
    assert got == {
        0: (11, 4, 1, 8),
        1: (10, 3, 1, 8),
        2: (8, 1, 0, 0),
        4: (16, 9, 9, 16),
    }, got


def test_stratified_sample_balanced_deterministic(spark, tmp_path):
    """The keep rule is pure integer hash arithmetic: the smallest
    stratum survives whole, and the downsampled stratum matches an
    independent md5 reimplementation of the rule exactly."""
    texts = ["t%d" % i for i in range(44)]
    langs = ["xx"] * 4 + ["yy"] * 40
    sf = _docs(tmp_path, texts, langs)
    kept = {(r["doc_id"], r["lang"])
            for r in stratified_sample_balanced(spark, sf).collect()}
    # all 4 'xx' docs kept (target == cnt -> keep_below == 1e6)
    assert {(i, "xx") for i in range(4)} <= kept
    # 'yy' keeps exactly the docs whose 60-bit md5 prefix mod 1e6
    # falls under 4*1e6 // 40 = 100000
    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    exp_yy = {(i, "yy") for i in range(4, 44) if h(i) % 1000000 < 100000}
    assert {k for k in kept if k[1] == "yy"} == exp_yy
    # deterministic run-to-run
    again = {(r["doc_id"], r["lang"])
             for r in stratified_sample_balanced(spark, sf).collect()}
    assert again == kept


def test_tfidf_top_terms_hand(spark, tmp_path):
    """Linear-idf scores (tf/df) computed by hand; ties break on term
    ascending; docs with <3 distinct terms emit what they have."""
    sf = _docs(tmp_path, [
        "apple apple banana common common",  # apple 2/1, common 2/3, banana 1/2
        "banana cherry common",              # cherry 1/1, banana 1/2, common 1/3
        "common dog dog dog",                # dog 3/1, common 1/3
        "x y",                               # tie 1/1 vs 1/1 -> term asc
    ])
    got = {(r["doc_id"], r["rank"]): r["term"]
           for r in tfidf_top_terms(spark, sf).collect()}
    assert got == {
        (0, 1): "apple", (0, 2): "common", (0, 3): "banana",
        (1, 1): "cherry", (1, 2): "banana", (1, 3): "common",
        (2, 1): "dog", (2, 2): "common",
        (3, 1): "x", (3, 2): "y",
    }, got


def test_funnel_conversion_stages(spark, tmp_path):
    """Each step must be STRICTLY after the previous step's first
    occurrence: same-instant doesn't advance, and a purchase before
    the first qualifying click doesn't count."""
    sf = _events(tmp_path, [
        (1, "2026-01-01 10:00", 1, "view"),
        (2, "2026-01-01 11:00", 1, "click"),
        (3, "2026-01-01 12:00", 1, "purchase"),   # full funnel
        (4, "2026-01-01 10:00", 2, "click"),      # click before view
        (5, "2026-01-01 11:00", 2, "view"),
        (6, "2026-01-01 12:00", 2, "purchase"),   # no click after view
        (7, "2026-01-01 10:00", 3, "view"),
        (8, "2026-01-01 11:00", 3, "purchase"),   # purchase before click
        (9, "2026-01-01 12:00", 3, "click"),
        (10, "2026-01-01 10:00", 4, "error"),     # never entered
        (11, "2026-01-01 10:00", 5, "view"),
        (12, "2026-01-01 10:00", 5, "click"),     # same instant: not after
    ])
    got = {r["user_id"]: r["funnel_stage"]
           for r in funnel_conversion(spark, sf).collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 0, 5: 1}, got


def test_cohort_retention_weeks(spark, tmp_path):
    """Cohort = Monday-truncated week of first event; offsets are
    whole weeks between Monday truncations."""
    sf = _events(tmp_path, [
        (1, "2026-01-05 09:00", 1, "view"),   # Mon -> cohort 2026-01-05
        (2, "2026-01-14 09:00", 1, "view"),   # week of 01-12 -> offset 1
        (3, "2026-01-07 09:00", 2, "view"),   # Wed -> same cohort week
        (4, "2026-01-20 09:00", 2, "view"),   # week of 01-19 -> offset 2
        (5, "2026-01-09 09:00", 2, "view"),   # same week -> offset 0 (dedup)
    ])
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(spark, sf).collect()}
    assert got == {
        ("2026-01-05", 0): 2,
        ("2026-01-05", 1): 1,
        ("2026-01-05", 2): 1,
    }, got


def test_domain_cap_sample_caps_and_order(spark, tmp_path):
    """At most 5 docs per source survive; the survivors are exactly
    the 5 lowest by (md5-hash, doc_id) — reimplemented independently —
    and a source with <=5 docs survives whole."""
    texts = ["t%d" % i for i in range(12)]
    sf = _docs(tmp_path, texts)
    # overwrite source column: 9 docs on 'big', 3 on 'small'
    import pandas as pd
    df = pd.read_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    df["source"] = ["big"] * 9 + ["small"] * 3
    df.to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from extractor.queries import domain_cap_sample
    got = {(r["doc_id"], r["source"], r["cap_rank"])
           for r in domain_cap_sample(spark, sf).collect()}

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    exp_big = sorted(range(9), key=lambda i: (h(i), i))[:5]
    exp = {(d, "big", r + 1) for r, d in enumerate(exp_big)}
    exp |= {(d, "small", r + 1)
            for r, d in enumerate(sorted(range(9, 12), key=lambda i: (h(i), i)))}
    assert got == exp, (got, exp)


def test_gopher_quality_filter_rules(spark, tmp_path):
    """Each rule flips keep independently: word count bounds, mean
    word length bounds (integer form), '#' and '...' ratios."""
    from extractor.queries import gopher_quality_filter
    good = " ".join(["word%03d" % i for i in range(60)])        # 7-char words
    short = "only three words"                                   # <50 words
    thin = " ".join(["ab"] * 60)                                 # mean len 2 < 3
    fat = " ".join(["x" * 11] * 60)                              # mean len 11 > 10
    hashy = " ".join(["word#"] * 30 + ["word"] * 30)             # 30 '#' > 6
    dotty = " ".join(["word..."] * 30 + ["word"] * 30)           # 30 '...' > 6
    sf = _docs(tmp_path, [good, short, thin, fat, hashy, dotty])
    got = {r["doc_id"]: r["keep"]
           for r in gopher_quality_filter(spark, sf).collect()}
    assert got == {0: 1, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0}, got
    row = {r["doc_id"]: r for r in gopher_quality_filter(spark, sf).collect()}
    assert row[0]["n_words"] == 60 and row[0]["word_chars"] == 60 * 7
    assert row[4]["n_hash"] == 30 and row[5]["n_ellipsis"] == 30


def test_length_decile_bins_exact(spark, tmp_path):
    """Bins match the integer formula on a 23-doc corpus with heavy
    length ties (ties broken by doc_id, remainder spread evenly —
    NOT ntile's front-loading)."""
    lengths = [5] * 7 + [9] * 9 + [2] * 4 + [40, 40, 1]
    texts = ["x" * n for n in lengths]
    sf = _docs(tmp_path, texts)
    from extractor.queries import length_decile_bins
    got = {r["doc_id"]: r["decile"]
           for r in length_decile_bins(spark, sf).collect()}
    order = sorted(range(23), key=lambda i: (lengths[i], i))
    exp = {d: (r * 10) // 23 + 1 for r, d in enumerate(order)}
    assert got == exp, (got, exp)


def test_domain_cap_scaled_equals_single_level(spark, tmp_path):
    """The two-level salted cap must reproduce the single-level cap
    EXACTLY (rows and ranks) — deterministic-order caps compose. A
    200-doc single hot source forces every salt partition to
    overflow its local cap, exercising the re-cap pass."""
    import pandas as pd

    texts = ["t%d" % i for i in range(220)]
    sf = _docs(tmp_path, texts)
    df = pd.read_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    df["source"] = ["hot"] * 200 + ["s%d" % i for i in range(20)]
    df.to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from extractor.queries import domain_cap_sample, domain_cap_sample_scaled
    one = {tuple(r) for r in domain_cap_sample(spark, sf).collect()}
    two = {tuple(r) for r in domain_cap_sample_scaled(spark, sf).collect()}
    assert one == two and len(one) == 5 + 20, (len(one), len(two))


def test_pack_sequences_contiguous_fill(spark, tmp_path):
    """Bins fill contiguously in (hash, doc_id) order per lang:
    bin_id = cum_before div 4096, reimplemented independently;
    an oversize doc still gets the bin its cum_before selects."""
    texts = [" ".join(["w"] * n)
             for n in [3000, 2000, 1500, 5000, 100]]  # token counts
    sf = _docs(tmp_path, texts, langs=["en"] * 4 + ["fr"])
    from extractor.queries import pack_sequences
    got = {r["doc_id"]: (r["n_tokens"], r["bin_id"])
           for r in pack_sequences(spark, sf).collect()}

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    order = sorted(range(4), key=lambda i: (h(i), i))
    toks = {0: 3000, 1: 2000, 2: 1500, 3: 5000}
    cum = 0
    exp = {}
    for d in order:
        exp[d] = (toks[d], cum // 4096)
        cum += toks[d]
    exp[4] = (100, 0)  # sole fr doc
    assert got == exp, (got, exp)


def test_split_assign_group_consistent_and_shuffle_free(spark):
    """Every doc of a source gets the same split, splits are decided
    by md5(source) alone (recomputable), and the plan is a pure
    narrow projection — zero Exchange."""
    from extractor.queries import split_assign_grouped
    df = split_assign_grouped(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan
    rows = df.collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(v) == 1 for v in by_source.values()), by_source
    for src, splits in by_source.items():
        b = int(hashlib.md5(src.encode()).hexdigest()[:15], 16) % 100
        exp = "train" if b < 90 else ("val" if b < 95 else "test")
        assert splits == {exp}, (src, b, splits)


def test_winsorize_broadcasts_percentile_dim(spark):
    """The per-lang percentile frame must come back as a broadcast
    join, and clamping must hold: every output within [p05, p95]."""
    from extractor.queries import winsorize_nchars
    df = winsorize_nchars(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan, plan
    pdf = df.toPandas()
    lo = pdf.groupby("lang")["n_chars_w"].min()
    hi = pdf.groupby("lang")["n_chars_w"].max()
    import pandas as _pd
    raw = _pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    q = raw.groupby("lang")["n_chars"].quantile([0.05, 0.95]).unstack()
    for lang in q.index:
        assert abs(lo[lang] - round(q.loc[lang, 0.05], 2)) < 1e-9 or \
            lo[lang] > q.loc[lang, 0.05]  # no doc below p05 pre-clamp
        assert hi[lang] <= round(q.loc[lang, 0.95], 2) + 1e-9


def test_emb_centroid_matches_numpy(spark):
    from extractor.queries import emb_centroid_per_label
    import numpy as np
    got = emb_centroid_per_label(spark, "/root/testdata/sf0.001").toPandas()
    raw = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    for label, grp in raw.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy()).astype("float64")
        exp = np.round(mat.mean(axis=0), 5)
        sub = (got[got["label"] == label].sort_values("pos")
               ["centroid"].to_numpy())
        assert np.allclose(sub, exp, atol=1e-9), label


def test_ohlc_bars_tiebreak_and_single_shuffle(spark, tmp_path):
    """Two events share the opening timestamp — min_by's
    (ts, event_id) struct order must pick the lower event_id as open.
    Plan gate: ONE Exchange (the groupBy), zero Window/Sort over the
    fact table."""
    import re
    from extractor.queries import ohlc_hourly_bars
    rows = [  # (event_id, ts, user_id, value)
        (1, "2026-01-01 10:00:00", 7, 5.00),
        (0, "2026-01-01 10:00:00", 7, 9.00),   # same ts, lower id -> open
        (2, "2026-01-01 10:30:00", 7, 1.00),   # low
        (3, "2026-01-01 10:59:59", 7, 7.00),   # close
        (4, "2026-01-01 11:00:01", 7, 2.00),   # next bar
    ]
    sf = _events(tmp_path, [(e, ts, u, "view") for e, ts, u, _ in rows])
    import pandas as pd2
    pdf = pd2.read_parquet(os.path.join(sf, "events.parquet"))
    pdf["value"] = [r[3] for r in rows]
    pdf.to_parquet(os.path.join(sf, "events.parquet"))
    df = ohlc_hourly_bars(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "(Window" not in plan and ") Window" not in plan, plan
    got = {(r["user_id"], r["h"]): (r["open_c"], r["high_c"],
                                    r["low_c"], r["close_c"], r["n_events"])
           for r in df.collect()}
    import datetime as dt
    h0 = int(dt.datetime(2026, 1, 1, 10, tzinfo=dt.timezone.utc).timestamp())
    assert got[(7, h0)] == (900, 900, 100, 700, 4), got
    assert got[(7, h0 + 3600)] == (200, 200, 200, 200, 1), got


def test_source_mix_weights_sum_to_one_and_alpha(spark, tmp_path):
    """alpha=0.5 smoothing: a source with 4x the tokens gets only 2x
    the weight; weights sum to 1."""
    from extractor.queries import source_mix_weights
    texts = ["w " * 399 + "w", "w " * 99 + "w"]  # 400 vs 100 tokens
    sf = _docs(tmp_path, texts)
    pdf = pd.read_parquet(os.path.join(sf, "documents.parquet"))
    pdf["source"] = ["big", "small"]
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))
    got = {r["source"]: r for r in source_mix_weights(spark, sf).collect()}
    assert got["big"]["n_tokens"] == 400 and got["small"]["n_tokens"] == 100
    w_big, w_small = got["big"]["mix_weight"], got["small"]["mix_weight"]
    assert abs(w_big + w_small - 1.0) < 1e-6
    assert abs(w_big / w_small - 2.0) < 1e-4, (w_big, w_small)


def test_cdc_snapshot_diff_all_branches(spark):
    """sf0.001 has doc_id 0..499: digits 0,1 -> removed (100), digits
    8,9 -> added (100), digit 5 -> changed (50), rest unchanged (250).
    Plan must be a full-outer SortMergeJoin (no broadcast shortcut
    exists for full outer)."""
    from extractor.queries import cdc_snapshot_diff
    df = cdc_snapshot_diff(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
    got = {r["status"]: r["count"]
           for r in df.groupBy("status").count().collect()}
    assert got == {"removed": 100, "added": 100,
                   "changed": 50, "unchanged": 250}, got


def test_bigram_pmi_prefers_exclusive_pair(spark, tmp_path):
    """'alpha beta' always co-occur exclusively (lift = n_tot /
    n_pair-ish >> 1); 'the the' is frequent but independent (lift
    ~1). The exclusive pair must rank first."""
    from extractor.queries import bigram_pmi_top
    texts = [("alpha beta " + "the cat " * 10).strip() for _ in range(5)]
    sf = _docs(tmp_path, texts)
    rows = bigram_pmi_top(spark, sf).collect()
    assert rows, "no pair reached min support"
    top = rows[0]
    assert (top["w1"], top["w2"]) == ("alpha", "beta"), rows[:3]
    lifts = {(r["w1"], r["w2"]): r["lift"] for r in rows}
    assert lifts[("alpha", "beta")] > lifts[("the", "cat")], lifts


def test_corpus_build_pipeline_two_exchanges(spark):
    """The composed corpus-cut chain must cost exactly two shuffles
    (dedup fingerprint window + domain-cap window); quality filter and
    split assignment are narrow. Survivors obey the cap and carry a
    group-consistent split."""
    import re
    from extractor.queries import corpus_build_pipeline
    df = corpus_build_pipeline(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert pdf.groupby("source").size().max() <= 5
    assert (pdf.groupby("source")["split"].nunique() == 1).all()


def test_pagerank_hand_computed(spark, tmp_path):
    """Star graph: supplier 1 -> {part 1, part 2}, supplier 2 ->
    part 1. Three damped iterations computed by hand; suppliers (no
    inbound) settle at 0.15 after round 1."""
    from extractor.queries import pagerank_supplier_part
    pd.DataFrame({
        "l_suppkey": [1, 1, 2, 1],   # duplicate edge collapses
        "l_partkey": [1, 2, 1, 1],
    }).to_parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    got = {r["node_id"]: r["rank"]
           for r in pagerank_supplier_part(spark, str(tmp_path)).collect()}
    assert got == {-1: 0.15, -2: 0.15,
                   1: 0.34125, 2: 0.21375}, got


def test_merge_upsert_cdc_all_actions(spark):
    """sf0.001 has doc_id 0..499: kept = odd non-multiples-of-3 (167),
    updated = %4==0 non-multiples-of-3 (83), inserted = multiples of
    12 (42), and 83 base rows deleted (base 333 -> 167+83 surviving).
    One FULL OUTER SortMergeJoin is the whole physical plan's join
    surface (MERGE in a single pass, vs the oracle's anti+union)."""
    from extractor.queries import merge_upsert_cdc
    df = merge_upsert_cdc(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
    for other in ("BroadcastHashJoin", "ShuffledHashJoin",
                  "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert other not in plan, plan
    got = {r["merge_action"]: r["count"]
           for r in df.groupBy("merge_action").count().collect()}
    assert got == {"kept": 167, "updated": 83, "inserted": 42}, got
    upd = df.where("merge_action != 'kept'").select("text").collect()
    assert all(r["text"].startswith("v2:") for r in upd)


def _embs(tmp_path, vecs, labels):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([np.asarray(v, dtype=np.float32) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_prune_hand(spark, tmp_path):
    """Within-label domination: v1 is near-parallel to lower-id v0
    (pruned); v2 is orthogonal to both (kept); v3 duplicates v0 but
    lives in another label (kept — clusters block the comparison)."""
    from extractor.queries import semdedup_prune

    sf = _embs(tmp_path,
               [[1.0, 0.0], [0.9999, 0.01], [0.0, 1.0], [1.0, 0.0]],
               [0, 0, 0, 1])
    got = {r["vec_id"]: r["label"] for r in semdedup_prune(spark, sf).collect()}
    assert got == {0: 0, 2: 0, 3: 1}


def test_truncate_tokens_hand(spark, tmp_path):
    """32-token clamp: long doc clipped to its first 32 tokens, short
    doc untouched, repeated whitespace collapses (empty tokens are
    filtered before the slice, both engines)."""
    from extractor.queries import truncate_tokens

    long_text = " ".join("w{}".format(i) for i in range(40))
    sf = _docs(tmp_path, [long_text, "a b c", "a  b"])
    got = {r["doc_id"]: r for r in truncate_tokens(spark, sf).collect()}
    assert (got[0]["n_tokens"], got[0]["n_kept"]) == (40, 32)
    assert got[0]["text_trunc"] == " ".join("w{}".format(i) for i in range(32))
    assert (got[1]["n_tokens"], got[1]["n_kept"], got[1]["text_trunc"]) == \
        (3, 3, "a b c")
    assert (got[2]["n_tokens"], got[2]["text_trunc"]) == (2, "a b")


def test_sft_pair_build_hand(spark, tmp_path):
    """(context, target) pairs: turn k's context is the previous <=3
    turns joined in order; the first turn emits nothing."""
    from extractor.queries import sft_pair_build

    sf = _docs(tmp_path, ["A", "B", "C", "D", "E"])
    rows = {r["turn_idx"]: r for r in sft_pair_build(spark, sf).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    exp = {1: ("A", "B"), 2: ("A B", "C"), 3: ("A B C", "D"),
           4: ("B C D", "E")}
    for k, (ctx, tgt) in exp.items():
        assert rows[k]["n_ctx"] == len(ctx.split())
        want = hashlib.md5("{}|{}".format(ctx, tgt).encode()).hexdigest()
        assert rows[k]["pair_md5"] == want, k


def test_minhash_verified_pairs_verify_drops_nondups(spark, tmp_path):
    """Identical docs always collide (identical signatures) and
    verify at exactly 1000 milli-Jaccard; disjoint-vocab docs share no
    shingles and never reach the output."""
    from extractor.queries import minhash_verified_pairs

    dup = " ".join("t{}".format(i) for i in range(12))
    sf = _docs(tmp_path, [
        dup, dup,
        " ".join("u{}".format(i) for i in range(12)),
        " ".join("v{}".format(i) for i in range(12)),
    ])
    got = [(r["doc_a"], r["doc_b"], r["jac_milli"])
           for r in minhash_verified_pairs(spark, sf).collect()]
    assert got == [(0, 1, 1000)]


def test_rolling_count_1h_boundaries(spark, tmp_path):
    """The trailing-hour frame is inclusive at exactly -1h, excludes
    anything older, and counts equal-ts peers (RANGE semantics)."""
    from extractor.queries import rolling_count_1h

    sf = _events(tmp_path, [
        (0, "2025-01-01 10:00:00", 1, "view"),
        (1, "2025-01-01 11:00:00", 1, "view"),   # exactly 1h later: frame has both
        (2, "2025-01-01 12:00:00.000001", 1, "view"),  # 1h+1us after ev1
        (3, "2025-01-01 12:00:00.000001", 1, "view"),  # ts peer of ev2
        (4, "2025-01-01 10:30:00", 2, "view"),   # other user untouched
    ])
    got = {r["event_id"]: r["n_1h"] for r in rolling_count_1h(spark, sf).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 2, 4: 1}


def test_table_fingerprint_xor_order_invariant(spark, tmp_path):
    """Same rows in any order -> same fingerprint; one changed byte ->
    different fingerprint; n rides along to catch even-duplication."""
    import pandas as pd

    from extractor.queries import table_fingerprint_xor

    def write(rows, d):
        os.makedirs(str(d), exist_ok=True)
        pd.DataFrame({
            "doc_id": [r[0] for r in rows], "text": [r[1] for r in rows],
            "lang": "en", "source": [r[2] for r in rows],
            "n_chars": pd.array([len(r[1]) for r in rows], dtype="int64"),
        }).to_parquet(os.path.join(str(d), "documents.parquet"))
        return str(d)

    a = write([(1, "alpha", "s"), (2, "beta", "s")], tmp_path / "a")
    b = write([(2, "beta", "s"), (1, "alpha", "s")], tmp_path / "b")
    c = write([(1, "alphA", "s"), (2, "beta", "s")], tmp_path / "c")
    fa = table_fingerprint_xor(spark, a).collect()[0]
    fb = table_fingerprint_xor(spark, b).collect()[0]
    fc = table_fingerprint_xor(spark, c).collect()[0]
    assert (fa["fp"], fa["n"]) == (fb["fp"], fb["n"])
    assert fa["fp"] != fc["fp"]


def test_pivot_zero_fill_and_unpivot_expand(spark, tmp_path):
    """Pivot: a (source, lang) cell with no rows reads 0, not null.
    Unpivot: physically an Expand (no join, exactly the one metric-agg
    Exchange)."""
    from extractor.queries import pivot_lang_counts, unpivot_source_metrics

    sf = _docs(tmp_path, ["x y z", "p q r", "a b c"],
               langs=["en", "en", "zh"])
    row = {r["source"]: r for r in pivot_lang_counts(spark, sf).collect()}["s"]
    assert (row["en"], row["zh"], row["de"], row["es"], row["fr"]) == \
        (2, 1, 0, 0, 0)

    got = {r["metric"]: r["val"]
           for r in unpivot_source_metrics(spark, sf).collect()}
    assert got == {"n_docs": 3, "total_chars": 15, "max_chars": 5}
    # fresh plan (pre-execution): AQE rewrites exchanges once collected
    plan = (unpivot_source_metrics(spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan, plan
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Expand" in plan, plan


def test_session_window_native_boundary(spark, tmp_path):
    """Native session_window merges TOUCHING sessions: an event at
    exactly prev_ts + gap extends (strict-greater breaks) — verified
    against Spark itself; the oracle encodes the same `>`."""
    from extractor.queries import session_window_native

    sf = _events(tmp_path, [
        (0, "2025-01-01 10:00:00", 1, "view"),
        (1, "2025-01-01 10:30:00", 1, "view"),          # exactly +30min:
        # touching windows MERGE (one session of 2)
        (2, "2025-01-01 11:30:00.000001", 1, "view"),   # +30min+1us:
        # strictly beyond the gap -> new session
        (3, "2025-01-01 09:00:00", 2, "view"),          # other user
    ])
    got = sorted((r["user_id"], r["n"])
                 for r in session_window_native(spark, sf).collect())
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_table_fingerprint_xor_null_text_cross_engine(spark, tmp_path):
    """NULL text must be hashed (not dropped) and hashed DISTINCTLY
    from empty text — and both engines must agree (concat_ws drops
    nulls in Spark while || propagates them in DuckDB; the null flag +
    coalesce encoding pins one semantics)."""
    import duckdb
    import pandas as pd

    from extractor.queries import ORACLES, table_fingerprint_xor

    p = os.path.join(str(tmp_path), "documents.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["alpha", None, ""],
        "lang": "en", "source": ["s", "s", "t"],
        "n_chars": pd.array([5, 0, 0], dtype="int64"),
    }).to_parquet(p)
    got = {r["source"]: (r["fp"], r["n"])
           for r in table_fingerprint_xor(spark, str(tmp_path)).collect()}
    assert got["s"][1] == 2  # the NULL-text row is counted and hashed

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('{}')".format(p))
    exp = {r[0]: (r[1], r[2])
           for r in con.sql(ORACLES["table_fingerprint_xor"]).fetchall()}
    assert got == exp

    # NULL and '' must fingerprint differently: swap them and compare
    pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["alpha", "", None],
        "lang": "en", "source": ["s", "s", "t"],
        "n_chars": pd.array([5, 0, 0], dtype="int64"),
    }).to_parquet(p)
    swapped = {r["source"]: (r["fp"], r["n"])
               for r in table_fingerprint_xor(spark, str(tmp_path)).collect()}
    assert swapped["s"] != got["s"]


def test_quality_filter_cascade_reason_codes(spark, tmp_path):
    """Each rule fires independently and reasons accumulate in fixed
    rule order; a clean doc keeps with an empty reasons string."""
    from extractor.queries import quality_filter_cascade

    clean = " ".join("token%02d" % i for i in range(60))  # mean len 7
    sf = _docs(tmp_path, [
        clean,                                  # keeps
        "too short",                            # word_count
        " ".join(["a"] * 60),                   # word_length (mean 1) + repetition
        clean + " " + "#" * 40,                 # hash_ratio (61 words, 40 '#')
        clean,                                  # lang -> zz
        clean + " " + "... " * 9 + "...",       # ellipsis_ratio (70 words, 10 '...')
    ], langs=["en", "en", "en", "en", "zz", "en"])
    got = {r["doc_id"]: (r["keep"], r["reasons"])
           for r in quality_filter_cascade(spark, sf).collect()}
    assert got[0] == (1, "")
    assert got[1] == (0, "word_count")
    assert got[2] == (0, "word_length,repetition")
    assert got[3] == (0, "hash_ratio")
    assert got[4] == (0, "lang")
    assert got[5] == (0, "ellipsis_ratio")
    plan = (quality_filter_cascade(spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_sft_pair_build_null_text_cross_engine(spark, tmp_path):
    """NULL-text turns are excluded on BOTH engines (ADVICE r3): left
    in, Spark's concat_ws skips the NULL target and collect_list drops
    NULL ctx elements while DuckDB propagates/keeps them — the engines
    fork silently. The sf tables contain zero NULL-text rows, so this
    hand fixture is the only thing exercising the pin."""
    import duckdb
    import pandas as pd

    from extractor.queries import ORACLES, sft_pair_build

    p = os.path.join(str(tmp_path), "documents.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["alpha", None, "gamma", "delta", None],
        "lang": "en", "source": "s",
        "n_chars": pd.array([5, 0, 5, 5, 0], dtype="int64"),
    }).to_parquet(p)
    got = sorted((r["conv_id"], r["turn_idx"], r["n_ctx"], r["pair_md5"])
                 for r in sft_pair_build(spark, str(tmp_path)).collect())
    # 3 non-null turns -> turn_idx 0..2 after the filter, 2 pairs
    assert [g[1] for g in got] == [1, 2]
    assert [g[2] for g in got] == [1, 2]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('{}')".format(p))
    exp = sorted(tuple(r) for r in con.sql(
        ORACLES["sft_pair_build"]).fetchall())
    assert got == exp


def test_semdedup_pipeline_margins_and_assignment(spark):
    """The pipeline's cross-engine exactness rests on two FP margins,
    measured here (not assumed): (1) every vector's best-vs-second
    centroid cosine gap exceeds cross-engine noise, so the argmax
    label never flips; (2) every same-cluster pair's |cos - tau|
    exceeds noise, so the prune decision never flips. Also pins the
    Spark assignment against a numpy replay of the same formula."""
    import numpy as np

    from extractor.queries import (_SEMDEDUP_TAU, _SEMPIPE_K,
                                   semdedup_pipeline)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        import pandas as pd
        emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        ids = emb["vec_id"].to_numpy()
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        cents = m[ids < _SEMPIPE_K]
        sims = (m @ cents.T) / (
            np.linalg.norm(m, axis=1, keepdims=True)
            * np.linalg.norm(cents, axis=1))
        top2 = np.sort(sims, axis=1)[:, -2:]
        argmax_margin = float((top2[:, 1] - top2[:, 0]).min())
        assert argmax_margin > 1e-6, argmax_margin

        labels = sims.argmax(axis=1)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        tau_margin = np.inf
        for c in range(_SEMPIPE_K):
            sub = mn[labels == c]
            if len(sub) < 2:
                continue
            cs = sub @ sub.T
            iu = np.triu_indices(len(sub), 1)
            tau_margin = min(tau_margin,
                             float(np.abs(cs[iu] - _SEMDEDUP_TAU).min()))
        assert tau_margin > 1e-9, tau_margin

        got = {r["vec_id"]: r["label"]
               for r in semdedup_pipeline(spark, sf).collect()}
        exp = dict(zip(ids.tolist(), labels.tolist()))
        assert all(exp[v] == l for v, l in got.items())
        # survivors: every dropped vector is dominated in numpy replay
        dropped = set(ids.tolist()) - set(got)
        for v in sorted(dropped)[:25]:
            i = int(np.where(ids == v)[0][0])
            same = np.where((labels == labels[i]) & (ids < v))[0]
            assert (mn[same] @ mn[i] >= _SEMDEDUP_TAU).any(), v


def test_bm25_topk_margins_and_plan(spark):
    """bm25's cross-engine exactness rests on (1) adjacent UNROUNDED
    scores around the top-10 cut being separated by far more than the
    <=1-ulp ln/div divergence between JVM and DuckDB libm, and (2) no
    score sitting on a 4-decimal rounding boundary. Measured with a
    numpy replay of the same formula. Plan: the top-10 must be
    TakeOrderedAndProject (per-partition heap), not a global sort."""
    import collections
    import math

    import numpy as np
    import pandas as pd

    from extractor.queries import _BM25_B, _BM25_K1, _BM25_TERMS, bm25_topk

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        toks = [str(t).split(" ") for t in docs["text"]]
        n = float(len(docs))
        avgdl = float(np.mean([len(ws) for ws in toks]))
        df = {q: sum(1 for ws in toks if q in ws) for q in _BM25_TERMS}
        idf = {q: math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
               for q in _BM25_TERMS if df[q]}
        scores = {}
        for did, ws in zip(docs["doc_id"], toks):
            c = collections.Counter(ws)
            s = sum(idf[q] * c[q] * (_BM25_K1 + 1)
                    / (c[q] + _BM25_K1 * (1 - _BM25_B
                                          + _BM25_B * len(ws) / avgdl))
                    for q in idf if c[q])
            if s > 0:
                scores[int(did)] = s
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        vals = [v for _, v in ordered[:12]]
        gaps = [a - b for a, b in zip(vals, vals[1:]) if a != b]
        assert min(gaps) > 1e-9, gaps  # adjacent-score margin
        for v in vals:  # rounding-boundary margin at 4 decimals
            frac = abs(v * 10000 - round(v * 10000))
            assert abs(frac - 0.5) > 1e-6, v

        got = [(r["doc_id"], r["score_r"], r["rank"])
               for r in bm25_topk(spark, sf).collect()]
        exp = [(d, round(v, 4), i + 1)
               for i, (d, v) in enumerate(ordered[:10])]
        assert got == exp, (got, exp)

    plan = bm25_topk(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_logreg_inference_margins_and_zero_exchange(spark):
    """Inference exactness margins: every score's distance to its
    6-decimal rounding boundary and to the 0.5 decision threshold
    must exceed the summation-order divergence between numpy's
    pairwise matmul and DuckDB's sequential dot (<= ~dim ulps).
    Also: the plan must contain ZERO Exchange (broadcast model,
    pure projection) and match a numpy replay exactly."""
    import numpy as np
    import pandas as pd

    from extractor.queries import _LOGREG_BIAS, embedding_logreg_inference

    w = np.array([((j * 37 % 19) - 9) / 10.0 for j in range(64)])
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        s = 1.0 / (1.0 + np.exp(-(m @ w + _LOGREG_BIAS)))
        frac = np.abs(s * 1e6 - np.round(s * 1e6))
        assert np.abs(frac - 0.5).min() > 1e-6   # rounding-boundary gap
        assert np.abs(s - 0.5).min() > 1e-9      # decision-threshold gap

        got = {r["vec_id"]: (r["score_r"], r["pred"])
               for r in embedding_logreg_inference(spark, sf).collect()}
        exp = {int(v): (round(float(x), 6), int(x >= 0.5))
               for v, x in zip(emb["vec_id"], s)}
        assert got == exp

    plan = embedding_logreg_inference(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_chunk_tokens_overlap_edges_and_plan(spark, tmp_path):
    """Chunker edge cases pinned by hand: doc shorter than one chunk
    (single chunk), exact multiple of the stride (no empty tail
    chunk), stride+1 (two chunks, 8-token overlap intact), empty
    text (one empty chunk at s=0) — plus cross-engine equality and
    the zero-Exchange plan gate."""
    import duckdb
    import pandas as pd

    from extractor.queries import ORACLES, chunk_tokens_overlap

    def wtxt(n):
        return " ".join("w%d" % i for i in range(n))

    p = os.path.join(str(tmp_path), "documents.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        # doc 6 carries a VERTICAL TAB separator: Java \s includes
        # \x0B, RE2 \s does not — the shared explicit _WS_CLASS must
        # tokenize it identically on both engines (3 tokens)
        "text": [wtxt(5), wtxt(24), wtxt(25), wtxt(80), "",
                 "a\x0bb c"],
        "lang": "en", "source": "s",
        "n_chars": pd.array([0] * 6, dtype="int64"),
    }).to_parquet(p)
    got4 = sorted((r["doc_id"], r["chunk_idx"], r["n_tok"], r["chunk_md5"])
                  for r in chunk_tokens_overlap(spark, str(tmp_path))
                  .collect())
    got = [(d, k, n) for d, k, n, _ in got4]
    assert [(d, k, n) for d, k, n in got if d == 1] == [(1, 0, 5)]
    assert [(d, k, n) for d, k, n in got if d == 2] == [(2, 0, 24)]
    assert [(d, k, n) for d, k, n in got if d == 3] == [(3, 0, 25),
                                                        (3, 1, 1)]
    # 80 tokens: starts 0,24,48,72 -> sizes 32,32,32,8
    assert [(d, k, n) for d, k, n in got if d == 4] == [
        (4, 0, 32), (4, 1, 32), (4, 2, 32), (4, 3, 8)]
    assert [(d, k, n) for d, k, n in got if d == 5] == [(5, 0, 0)]
    assert [(d, k, n) for d, k, n in got if d == 6] == [(6, 0, 3)]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('{}')".format(p))
    # FULL-row equality incl. chunk_md5: the empty chunk must hash as
    # md5('') on both engines (DuckDB's empty array_to_string is NULL
    # and is coalesced — dropping md5 from this compare would have
    # hidden exactly that divergence)
    exp4 = sorted(tuple(r) for r in
                  con.sql(ORACLES["chunk_tokens_overlap"]).fetchall())
    assert got4 == exp4

    plan = chunk_tokens_overlap(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_round4_text_stats_margins_and_plans(spark):
    """Cross-engine exactness margins for the round-4 text-statistics
    batch (char_entropy, unigram_lm_nll, corpus_zipf_stats): every
    emitted value's UNROUNDED distance to its rounding boundary must
    exceed the ~1e-13 summation-order noise between Spark partial
    aggregation and DuckDB sequential aggregation by orders of
    magnitude. Measured with a numpy replay of the same formulas.
    Plan gates: novelty joins are equi (never cartesian), entropy is
    join-free, zipf's top-100 is a TakeOrdered (no global sort)."""
    import collections
    import math
    import re as _re

    import numpy as np
    import pandas as pd

    from extractor.queries import QUERIES

    def boundary_margin(vals, dp):
        scaled = np.asarray(vals, dtype=float) * 10 ** dp
        frac = np.abs(scaled - np.round(scaled))
        return float(np.min(np.abs(frac - 0.5)))

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))

        # char_entropy replay: ln(n) - sum(c ln c)/n over first 2000
        # chars (no \n\r in testdata, verified by the regex class)
        ents = []
        for txt in docs["text"]:
            c = collections.Counter(str(txt)[:2000])
            n = sum(c.values())
            ents.append(math.log(n) - sum(k * math.log(k)
                                          for k in c.values()) / n)
        assert boundary_margin(ents, 4) > 1e-6, boundary_margin(ents, 4)

        # unigram_lm_nll replay
        toks = [str(t).lower().split(" ") for t in docs["text"]]
        cnt = collections.Counter(w for ws in toks for w in ws if w)
        T, V = float(sum(cnt.values())), float(len(cnt))
        nlls = []
        for ws in toks:
            ws = [w for w in ws if w]
            if ws:
                nlls.append(sum(-math.log((cnt[w] + 1.0) / (T + V))
                                for w in ws) / len(ws))
        assert boundary_margin(nlls, 4) > 1e-6, boundary_margin(nlls, 4)

        # zipf slope replay over top-100 (count desc, word asc)
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        x = np.log(np.arange(1, len(top) + 1, dtype=float))
        y = np.log(np.array([c for _, c in top], dtype=float))
        slope = float(np.polyfit(x, y, 1)[0])
        assert boundary_margin([slope], 4) > 1e-6, slope
        assert boundary_margin([math.log(V) / math.log(T)], 6) > 1e-6

    sf = "/root/testdata/sf0.001"
    plan = (QUERIES["ngram_novelty_rate"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    plan = (QUERIES["char_entropy"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan, plan
    assert len(_re.findall(r"Exchange \w+", plan)) == 2, plan

    plan = (QUERIES["corpus_zipf_stats"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_kmeans_lloyd_margins_and_plan(spark):
    """kmeans_lloyd_assign's cross-engine exactness rests on every
    point's argmin being unambiguous: the relative gap between its
    best and second-best squared distance must dwarf the FP noise
    from (a) summation-order differences in the per-dim centroid
    means and (b) DuckDB's sqrt vs Spark's squared distance. Replay
    all three assignment rounds in numpy, assert the min relative gap
    per round, and that the replay's final labels equal Spark's. Plan:
    each assignment is a literal-centroid projection — the executed
    plan of the returned frame must contain NO join operator."""
    import numpy as np
    import pandas as pd

    from extractor.queries import _KMEANS_ITER, _KMEANS_K, QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        ids = emb["vec_id"].to_numpy()
        cents = X[ids < _KMEANS_K].copy()
        cids = ids[ids < _KMEANS_K].copy()

        def assign(C):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d, axis=1, kind="stable")
            best, second = d[np.arange(len(X)), order[:, 0]], \
                d[np.arange(len(X)), order[:, 1]]
            gap = np.min((second - best) / np.maximum(best, 1e-300))
            return order[:, 0], gap

        labels = None
        for _ in range(_KMEANS_ITER):
            a, gap = assign(cents)
            assert gap > 1e-9, gap
            for j in range(len(cids)):
                m = a == j
                if m.any():
                    cents[j] = X[m].mean(axis=0)
        labels, gap = assign(cents)
        assert gap > 1e-9, gap

        got = (QUERIES["kmeans_lloyd_assign"](spark, sf).toPandas()
               .sort_values("vec_id").reset_index(drop=True))
        assert (got["cluster"].to_numpy() == cids[labels]).all()

    plan = (QUERIES["kmeans_lloyd_assign"](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan, plan


def test_triangle_stats_chain_and_clique(spark):
    """Unit pin for the triangle/wedge/clustering math on a
    CONSTRUCTED edge frame — a 4-clique (4 triangles, 12 wedges:
    4 nodes of degree 3, C(3,2)=3 each) plus an open 3-chain
    (0 triangles, 1 wedge) and an isolated edge (nothing): totals
    4 triangles, 13 wedges, clustering 3*4/13 = 12/13.
    Constructed directly because the LSH front-end
    cannot reliably plant open wedges (Jaccard's triangle inequality
    closes high-similarity chains; borderline ones are banding-luck),
    which is exactly what pair_graph_triangles' docstring claims."""
    from extractor.queries import _triangle_stats

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12)]
    lone = [(20, 21)]
    pairs = spark.createDataFrame(clique + chain + lone,
                                  ["doc_a", "doc_b"])
    got = _triangle_stats(pairs).collect()[0]
    assert got["n_triangles"] == 4
    assert got["n_wedges"] == 4 * 3 + 1  # C(3,2)=3 per clique node + chain
    assert got["clustering"] == 12 / 13
    # wedge-free graph: clustering defined as 0, not a division error
    got0 = _triangle_stats(spark.createDataFrame(lone, ["doc_a", "doc_b"])
                           ).collect()[0]
    assert (got0["n_triangles"], got0["n_wedges"], got0["clustering"]) \
        == (0, 0, 0.0)
    # EMPTY graph (no verified pairs at all): still (0, 0, 0.0), never
    # NULLs — sum-over-empty is coalesced on both engines
    gote = _triangle_stats(
        spark.createDataFrame([], "doc_a long, doc_b long")).collect()[0]
    assert (gote["n_triangles"], gote["n_wedges"], gote["clustering"]) \
        == (0, 0, 0.0)


def test_pair_graph_triangles_clique_replay(spark, tmp_path):
    """End-to-end pin for pair_graph_triangles through the real LSH +
    verify front-end: a planted 5-doc near-dup clique must close
    completely (clustering == 1.0 exactly), with triangles and wedges
    equal to a pure-Python walk over the DuckDB oracle's own verified
    edge set."""
    import itertools
    import os

    import duckdb

    from extractor.queries import ORACLES, QUERIES

    def words(seed, n):
        return [hashlib.md5("{}-{}".format(seed, i).encode())
                .hexdigest()[:8] for i in range(n)]

    core = words("clq", 60)
    docs = [(i, " ".join(core + ["t%d" % i]), "en", "s", 0)
            for i in range(5)]
    docs += [(100 + i, " ".join(words("f%d" % i, 40)), "en", "s", 0)
             for i in range(20)]
    pd.DataFrame(docs, columns=[
        "doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
        os.path.join(str(tmp_path), "documents.parquet"))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('{}')"
                .format(os.path.join(str(tmp_path), "documents.parquet")))
    edges = set(map(tuple, con.sql(
        ORACLES["minhash_verified_pairs"]).df()[["doc_a", "doc_b"]]
        .itertuples(index=False)))
    assert len(edges) == 10  # the 5-clique catches completely
    nodes = sorted({n for e in edges for n in e})
    n_tri = sum((a, b) in edges and (b, c) in edges and (a, c) in edges
                for a, b, c in itertools.combinations(nodes, 3))
    deg = {n: sum(n in e for e in edges) for n in nodes}
    n_wed = sum(d * (d - 1) // 2 for d in deg.values())

    got = QUERIES["pair_graph_triangles"](spark, str(tmp_path)).collect()[0]
    assert got["n_triangles"] == n_tri == 10
    assert got["n_wedges"] == n_wed == 30
    assert got["clustering"] == 1.0


def test_jaccard_prefix_join_boundary_fixture(spark, tmp_path):
    """Boundary pin for jaccard_prefix_join: a pair engineered to sit
    EXACTLY at Jaccard 0.5 (shared 12-word run -> 10 shared interior
    shingles; 5 unique trailing words each -> 15 shingles/doc; 10/20 =
    0.5) must be emitted with jac_milli == 500; the same construction
    with one extra unique word on one side (10/21 -> 476) must be
    excluded; a near-identical pair lands high. The whole output is
    then equality-checked against a brute-force pure-Python Jaccard
    over every doc pair — prefix-filter completeness certified
    end-to-end, not just on the threshold cases."""
    import itertools

    from extractor.queries import QUERIES

    def w(tag, n):
        return ["%s%d" % (tag, i) for i in range(n)]

    shared = w("sh", 12)
    shared2 = w("sg", 12)
    texts = [
        " ".join(shared + w("a", 5)),    # 0: 15 shingles
        " ".join(shared + w("b", 5)),    # 1: 15 shingles -> jac(0,1)=0.5
        " ".join(shared2 + w("c", 5)),   # 2: 15 shingles
        " ".join(shared2 + w("d", 6)),   # 3: 16 shingles -> jac(2,3)=10/21
        " ".join(w("e", 20) + ["zz"]),   # 4: 19 shingles
        " ".join(w("e", 20) + ["yy"]),   # 5: 19 shingles -> jac(4,5)=18/20
        " ".join(w("f", 30)),            # 6: unrelated
    ]
    sf = _docs(tmp_path, texts)

    def shingles(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    brute = {}
    for i, j in itertools.combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        jm = (1000 * inter) // union
        if jm >= 500:
            brute[(i, j)] = jm

    got = {(r["doc_a"], r["doc_b"]): r["jac_milli"]
           for r in QUERIES["jaccard_prefix_join"](spark, sf).collect()}
    assert got == brute
    assert got[(0, 1)] == 500        # exact-boundary pair included
    assert (2, 3) not in got         # just-below pair excluded
    assert got[(4, 5)] == 1000 * 18 // 20


def test_jaccard_prefix_join_plan_and_prefix_prune(spark):
    """Plan gate: candidate generation is an equi join on prefix
    shingle hashes — no CartesianProduct / BroadcastNestedLoopJoin
    anywhere in the executed plan. Also measures the prefix's actual
    pruning power on real data: prefix rows emitted must be at most
    ~(1-tau)+eps of total shingle rows (the whole point of the
    strategy vs joining on every shingle)."""
    from extractor.queries import _PFX_TAU, _shingles, QUERIES

    df = QUERIES["jaccard_prefix_join"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    ex = (_shingles(spark, "/root/testdata/sf0.001")
          .select("doc_id", "s").distinct())
    tot = ex.count()
    per_doc = ex.groupBy("doc_id").count()
    pre_rows = per_doc.selectExpr(
        "sum(count - (({t} * count + 999) div 1000) + 1) AS p"
        .format(t=_PFX_TAU)).collect()[0]["p"]
    # tau=0.5 -> prefix is ~half of each doc's shingles (+1 slack/doc)
    assert pre_rows <= tot * (1 - _PFX_TAU / 1000) + per_doc.count()


def test_weighted_sample_wor_margins_and_replay(spark):
    """weighted_sample_wor's cross-engine exactness rests on the
    A-Res ordering ln(u)/w being unambiguous at every emitted rank:
    replay the keys in numpy at two SFs, assert Spark's top-3 per
    source equals the replay exactly, and that the minimum adjacent
    relative key gap within each source's top-5 dwarfs the 1-ulp
    ln() divergence class (>= 1e-9)."""
    import numpy as np

    from extractor.queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        h = d["doc_id"].astype(str).map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16))
        u = (h.to_numpy().astype(np.float64) + 1) / float(2 ** 60)
        d = d.assign(key=np.log(u) / d["n_chars"].to_numpy())
        want = {}
        for src, g in d.groupby("source"):
            g = g.sort_values(["key", "doc_id"],
                              ascending=[False, True]).head(5)
            ks = g["key"].to_numpy()
            gaps = np.abs(np.diff(ks)) / np.maximum(np.abs(ks[:-1]), 1e-300)
            assert gaps.min() > 1e-9, (src, gaps.min())
            for rank, doc in enumerate(g["doc_id"].head(3), 1):
                want[(src, int(doc))] = rank
        got = {(r["source"], r["doc_id"]): r["rank"]
               for r in QUERIES["weighted_sample_wor"](spark, sf).collect()}
        assert got == want


def test_logreg_gd_train_margins_and_plan(spark):
    """logreg_gd_train's cross-engine exactness rests on every score
    being far from BOTH hazards of the ln/exp FP class: the 6dp
    rounding boundary and the 0.5 decision threshold. Replay the two
    GD steps in numpy at two SFs, assert the Spark scores match the
    replay to 1e-9 (the engine-vs-engine summation-order band), that
    no score sits within 1e-9 of a 0.5e-6 rounding midpoint or the
    threshold, and that predictions match the replay exactly. Plan:
    the scoring pass is a literal-weight projection — no join
    operator in the executed plan."""
    import numpy as np

    from extractor.queries import _LOGREG_ETA, _LOGREG_ITER, QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        y = (emb["label"].to_numpy() % 2).astype(np.float64)
        n, dim = X.shape
        w, b = np.zeros(dim), 0.0
        for _ in range(_LOGREG_ITER):
            s = 1 / (1 + np.exp(-(X @ w + b)))
            w -= _LOGREG_ETA * (X.T @ (s - y)) / n
            b -= _LOGREG_ETA * (s - y).sum() / n
        s = 1 / (1 + np.exp(-(X @ w + b)))
        # margin vs the 6dp round midpoints and the 0.5 threshold:
        # frac is in 1e-6 units, so 1e-5 here = 1e-11 in score units —
        # ~4 orders above the ~1e-15 summation-order divergence band
        # (measured min at these SFs: 9.5e-4, i.e. 9.5e-10 in scores)
        frac = np.abs((s * 1e6) % 1 - 0.5)
        assert frac.min() > 1e-5, frac.min()
        assert np.abs(s - 0.5).min() > 1e-6, np.abs(s - 0.5).min()

        got = {r["vec_id"]: (r["score_r"], r["pred"])
               for r in QUERIES["logreg_gd_train"](spark, sf).collect()}
        for vid, sc, pr in zip(emb["vec_id"], s, (s >= 0.5).astype(int)):
            gsc, gpr = got[vid]
            assert abs(gsc - round(float(sc), 6)) < 1.5e-6, (vid, gsc, sc)
            assert gpr == pr, (vid, gpr, pr)

    df = QUERIES["logreg_gd_train"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_containment_prefix_join_excerpt_fixture(spark, tmp_path):
    """The excerpt case the operator exists for: a 12-word doc quoted
    whole inside an 80-word doc has containment 1.0 (inner->outer)
    but Jaccard ~10/78 — jaccard_prefix_join at tau 0.5 must NOT see
    the pair, containment_prefix_join must, and only in the inner->
    outer direction. Whole output equality-checked against a brute
    pure-Python containment over every directed doc pair, certifying
    the asymmetric (probe-prefix x full-index) candidate scheme."""
    import itertools

    from extractor.queries import QUERIES

    def w(tag, n):
        return ["%s%d" % (tag, i) for i in range(n)]

    quote = w("q", 12)
    texts = [
        " ".join(quote),                            # 0: the excerpt
        " ".join(w("pre", 30) + quote + w("post", 38)),  # 1: quotes 0 whole
        " ".join(w("x", 25)),                       # 2: unrelated
        " ".join(w("y", 20) + ["t1"]),              # 3: near-dup of 4
        " ".join(w("y", 20) + ["t2"]),              # 4
    ]
    sf = _docs(tmp_path, texts)

    def sh(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    brute = {}
    for i, j in itertools.permutations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        cm = (1000 * inter) // len(sets[i])
        if cm >= 800:
            brute[(i, j)] = cm

    got = {(r["doc_inner"], r["doc_outer"]): r["cont_milli"]
           for r in QUERIES["containment_prefix_join"](spark, sf).collect()}
    assert got == brute
    assert got[(0, 1)] == 1000          # full quote: containment 1.0
    assert (1, 0) not in got            # never the reverse direction
    jac = {(r["doc_a"], r["doc_b"])
           for r in QUERIES["jaccard_prefix_join"](spark, sf).collect()}
    assert (0, 1) not in jac            # symmetric dedup is blind to it
    assert (3, 4) in jac                # but still sees true near-dups


def test_pca_power_projection_margins_and_plan(spark):
    """pca_power_projection exactness pins: replay the three power
    steps in numpy at two SFs, assert (a) every projection sits far
    from its 5dp rounding midpoint relative to the summation-order
    divergence band, (b) the sign rule's |sum(v)| margin is fat (a
    near-zero component sum could flip sign between engines), and
    (c) Spark's output equals the replay after rounding. Plan: the
    scoring pass is a literal-direction projection — no join in the
    executed plan."""
    import numpy as np

    from extractor.queries import _PCA_ITER, QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        v = np.full(X.shape[1], 1.0 / np.sqrt(X.shape[1]))
        for _ in range(_PCA_ITER):
            u = X.T @ (X @ v)
            v = u / np.linalg.norm(u)
        assert abs(v.sum()) > 1e-3, v.sum()     # sign-rule margin
        if v.sum() < 0:
            v = -v
        p = X @ v
        frac = np.abs((p * 1e5) % 1 - 0.5)
        assert frac.min() > 1e-5, frac.min()    # 1e-10 in projection units

        got = {r["vec_id"]: r["pc1_r"]
               for r in QUERIES["pca_power_projection"](spark, sf).collect()}
        for vid, x in zip(emb["vec_id"], p):
            assert abs(got[vid] - round(float(x), 5)) < 1.5e-5, (vid, got[vid], x)

    df = QUERIES["pca_power_projection"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_event_transition_probs_hand(spark, tmp_path):
    """Hand-pinned Markov counts: user 1 walks view->click->view->
    click (transitions vc, cv, vc), user 2 has a same-instant pair
    whose order is decided by event_id (tie-break determinism), and a
    single-event user contributes nothing. p_milli is exact integer
    division within each prev state."""
    from extractor.queries import QUERIES

    sf = _events(tmp_path, [
        (1, "2026-01-01 10:00", 1, "view"),
        (2, "2026-01-01 11:00", 1, "click"),
        (3, "2026-01-01 12:00", 1, "view"),
        (4, "2026-01-01 13:00", 1, "click"),
        (5, "2026-01-01 10:00", 2, "signup"),   # same instant as 6:
        (6, "2026-01-01 10:00", 2, "error"),    # event_id orders them
        (7, "2026-01-01 10:00", 3, "view"),     # lone event: no pair
    ])
    got = {(r["prev_type"], r["event_type"]): (r["cnt"], r["p_milli"])
           for r in QUERIES["event_transition_probs"](spark, sf).collect()}
    assert got == {
        ("view", "click"): (2, 1000),
        ("click", "view"): (1, 1000),
        ("signup", "error"): (1, 1000),
    }, got


def test_source_kl_divergence_margins_and_replay(spark):
    """KL replayed in numpy at two SFs: Spark's 6dp-rounded values
    must match the replay, and every value must sit far from its
    rounding midpoint relative to the ln() 1-ulp divergence band."""
    import numpy as np

    from extractor.queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        n = len(d)
        lc = d["lang"].value_counts()
        want = {}
        for src, g in d.groupby("source"):
            st = len(g)
            kl = 0.0
            for lang, c in g["lang"].value_counts().items():
                p = c / st
                q = lc[lang] / n
                kl += p * np.log(p / q)
            frac = abs((kl * 1e6) % 1 - 0.5)
            assert frac > 1e-5, (src, frac)   # 1e-11 in KL units
            want[src] = round(float(kl), 6)
        got = {r["source"]: r["kl_r"]
               for r in QUERIES["source_kl_divergence"](spark, sf).collect()}
        for src in want:
            assert abs(got[src] - want[src]) < 1.5e-6, (src, got[src], want[src])
        assert set(got) == set(want)


def test_scd2_dimension_build_hand(spark, tmp_path):
    """Version intervals pinned by hand: user 1 changes view->click->
    view (3 versions, half-open chained intervals, last one open with
    the 9999 sentinel); user 2's same-instant pair keeps only the
    highest event_id (the 'error' row wins, one version); repeated
    equal states collapse into one version (user 3). Plan: everything
    rides ONE hashpartitioning Exchange on user_id."""
    import re

    from extractor.queries import QUERIES

    sf = _events(tmp_path, [
        (1, "2026-01-01 10:00", 1, "view"),
        (2, "2026-01-01 11:00", 1, "click"),
        (3, "2026-01-01 12:00", 1, "view"),
        (4, "2026-01-01 10:00", 2, "signup"),  # same instant as 5:
        (5, "2026-01-01 10:00", 2, "error"),   # id 5 wins the dedup
        (6, "2026-01-01 10:00", 3, "view"),
        (7, "2026-01-01 11:00", 3, "view"),    # equal run: no version
        (8, "2026-01-01 12:00", 3, "click"),
    ])
    got = {(r["user_id"], r["eff_from"]):
           (r["state"], r["eff_to"], r["is_current"])
           for r in QUERIES["scd2_dimension_build"](spark, sf).collect()}
    S = "9999-12-31 00:00:00"
    assert got == {
        (1, "2026-01-01 10:00:00"): ("view", "2026-01-01 11:00:00", 0),
        (1, "2026-01-01 11:00:00"): ("click", "2026-01-01 12:00:00", 0),
        (1, "2026-01-01 12:00:00"): ("view", S, 1),
        (2, "2026-01-01 10:00:00"): ("error", S, 1),
        (3, "2026-01-01 10:00:00"): ("view", "2026-01-01 12:00:00", 0),
        (3, "2026-01-01 12:00:00"): ("click", S, 1),
    }, got

    df = QUERIES["scd2_dimension_build"](spark, sf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    ex = re.findall(r"Exchange hashpartitioning", final)
    assert len(ex) == 1, plan
    assert "Join" not in final, plan


def test_ir_eval_ndcg_margins_and_replay(spark):
    """ir_eval_ndcg's cross-engine exactness needs (1) adjacent
    unrounded BM25 scores around each term's top-10 cut separated by
    far more than libm's <=1-ulp divergence (the ranking cannot flip
    between engines), and (2) no metric value on a 4-decimal rounding
    boundary. Both measured with a full numpy/pure-Python replay of
    the metric definitions, which must also reproduce the Spark
    output exactly."""
    import collections
    import math
    import os

    import numpy as np
    import pandas as pd

    from extractor.queries import _BM25_B, _BM25_K1, _BM25_TERMS, ir_eval_ndcg

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        toks = [str(t).split(" ") for t in docs["text"]]
        n = float(len(docs))
        avgdl = float(np.mean([len(ws) for ws in toks]))
        df = {q: sum(1 for ws in toks if q in ws) for q in _BM25_TERMS}
        idf = {q: math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
               for q in _BM25_TERMS if df[q]}
        exp = {}
        for term in idf:
            rows = []
            for did, ws in zip(docs["doc_id"], toks):
                tf = collections.Counter(ws)[term]
                if tf:
                    s = (idf[term] * tf * (_BM25_K1 + 1)
                         / (tf + _BM25_K1 * (1 - _BM25_B
                                             + _BM25_B * len(ws) / avgdl)))
                    rel = 2 if tf >= 4 else (1 if tf >= 2 else 0)
                    rows.append((int(did), s, rel))
            ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
            vals = [s for _, s, _ in ranked[:12]]
            gaps = [a - b for a, b in zip(vals, vals[1:]) if a != b]
            # diagnostic, not ValueError, if the term's postings ever
            # shrink to a single score at some SF
            assert gaps, (term, vals)
            assert min(gaps) > 1e-9, (term, gaps)  # cut-boundary margin
            top = ranked[:10]
            ideal = sorted(rows, key=lambda r: (-r[2], r[0]))[:10]
            dcg = sum((2.0 ** rel - 1) / math.log2(i + 2)
                      for i, (_, _, rel) in enumerate(top))
            idcg = sum((2.0 ** rel - 1) / math.log2(i + 2)
                       for i, (_, _, rel) in enumerate(ideal))
            # idcg == 0 (no doc with tf >= 2) would make the metric
            # dcg/0 — an unpinned Infinity edge on both engines; fail
            # with a data-contract message rather than ZeroDivision
            assert idcg > 0, "term {!r} has no relevant doc".format(term)
            franks = [i + 1 for i, (_, _, rel) in enumerate(top) if rel > 0]
            mrr = 1.0 / franks[0] if franks else 0.0
            p10 = sum(1 for _, _, rel in top if rel > 0) / 10.0
            for v in (dcg / idcg, mrr, p10):  # 4dp boundary margin
                frac = abs(v * 10000 - round(v * 10000))
                assert abs(frac - 0.5) > 1e-6, (term, v)
            exp[term] = (round(dcg / idcg, 4), round(mrr, 4), round(p10, 4))
        got = {r["term"]: (r["ndcg10"], r["mrr10"], r["p10"])
               for r in ir_eval_ndcg(spark, sf).collect()}
        assert got == exp, (got, exp)


def test_skyline_and_gapfill_replay(spark):
    """Brute-force pandas replays of the two rewrites:

    - skyline_pareto_parts: the Spark two-pass (max-per-size +
      running max over the size domain) must equal the literal
      quadratic strict-dominance scan.
    - time_spine_gapfill: LOCF semantics — before a user's first
      observed day the fill is NULL (no invented history); on and
      after it, the fill equals the last observed daily close."""
    import os

    import numpy as np
    import pandas as pd

    from extractor.queries import skyline_pareto_parts, time_spine_gapfill

    sf = "/root/testdata/sf0.001"
    parts = pd.read_parquet(os.path.join(sf, "part.parquet"))
    pr = parts["p_retailprice"].to_numpy()
    sz = parts["p_size"].to_numpy()
    keep = []
    for i in range(len(parts)):
        dominated = (((pr >= pr[i]) & (sz <= sz[i])
                      & ((pr > pr[i]) | (sz < sz[i]))).any())
        if not dominated:
            keep.append(int(parts["p_partkey"].iloc[i]))
    got = sorted(r["p_partkey"] for r in
                 skyline_pareto_parts(spark, sf).collect())
    assert got == sorted(keep), (got, sorted(keep))

    ev = pd.read_parquet(os.path.join(sf, "events.parquet"))
    jan = ev[(ev["ts"] >= "2024-01-01") & (ev["ts"] < "2024-02-01")].copy()
    jan["day"] = jan["ts"].dt.floor("D")
    # the LITERAL latest row's value (NaN allowed) — pandas
    # groupby(...).last() would skip NULLs and silently diverge from
    # the query's rn=1 semantics if value ever gains NULLs
    close = (jan.sort_values(["ts", "event_id"])
             .drop_duplicates(subset=["user_id", "day"], keep="last")
             .set_index(["user_id", "day"])["value"])
    rows = time_spine_gapfill(spark, sf).collect()
    assert len(rows) == jan["user_id"].nunique() * 31
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["day_str"])):
        u = r["user_id"]
        day = pd.Timestamp(r["day_str"])
        if (u, day) in close.index:
            assert r["has_obs"] == 1
            assert r["filled_value"] == round(float(close[(u, day)]), 4), r
            by_user[u] = r["filled_value"]
        else:
            assert r["has_obs"] == 0
            expf = by_user.get(u)  # None before first obs
            assert r["filled_value"] == expf, (r, expf)


def test_heavy_hitters_mg_property(spark, tmp_path):
    """Misra-Gries two-pass exactness on data that actually exercises
    the sketch (the driver corpus's 31-word vocabulary never fills
    the k=64 slots): 5000 singleton keys + 3 hot keys + 1 warm key
    just under the phi threshold. Asserts (1) the merge bound — every
    term with frequency > n/(k+1) survives a batched MG merge of a
    hostile ordering, with at most k slots held; (2) end-to-end: the
    query's output over an adversarially repartitioned corpus equals
    the exact heavy-hitter set (hot keys in, warm key and singletons
    out)."""
    import numpy as np
    import pandas as pd

    from extractor.queries import _HH_K, _HH_PHI, _mg_merge, QUERIES

    terms = (["hot_a"] * 400 + ["hot_b"] * 350 + ["hot_c"] * 300
             + ["warm"] * 150 + ["s{}".format(i) for i in range(5000)])
    n = len(terms)  # 6200; phi*n = 213.9 -> hot_* in, warm out
    rng = np.random.RandomState(7)
    order = rng.permutation(n)
    stream = [terms[i] for i in order]

    # (1) merge bound on the raw summary
    slots: dict = {}
    for lo in range(0, n, 512):  # batch like mapInPandas does
        batch = pd.Series(stream[lo:lo + 512]).value_counts().to_dict()
        slots = _mg_merge(slots, batch, _HH_K)
        assert len(slots) <= _HH_K
    for term in ("hot_a", "hot_b", "hot_c"):  # freq > n/(k+1) = 95.4
        assert term in slots, (term, sorted(slots)[:10])

    # (2) end-to-end over a multi-partition parquet corpus
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": stream,
        "lang": "en", "source": "fixture",
        "n_chars": [len(s) for s in stream]})
    sf = str(tmp_path)
    (spark.createDataFrame(docs).repartition(16, "doc_id")
     .write.mode("overwrite").parquet(sf + "/documents.parquet"))
    got = sorted((r["term"], r["cnt"]) for r in
                 QUERIES["heavy_hitters_exact"](spark, sf).collect())
    exp = sorted((t, c) for t, c in
                 pd.Series(stream).value_counts().items()
                 if c > _HH_PHI * n)
    assert got == exp, (got, exp)
    assert [t for t, _ in got] != [], got

    # plan: one sketch stage, broadcast verify join, no corpus-wide
    # sort-merge or cartesian anywhere
    df = QUERIES["heavy_hitters_exact"](spark, sf)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("MapInPandas") == 1, final
    assert "BroadcastHashJoin" in final, final
    assert "SortMergeJoin" not in final, final
    assert "CartesianProduct" not in final, final


def test_dq_expectations_planted_violations(spark, tmp_path):
    """Negative control: the sf corpora are CLEAN for the FK /
    uniqueness / null / range checks (their sweep rows pin zero), so
    plant one violation of each class in a hand corpus and assert the
    exact counts — proving the checks can fire, not just stay quiet.
    Planted: 2 orphan lineitems, 1 triple + 1 double orderkey (3
    surplus dups), 2 null users, 1 negative value, 1 bad priority,
    1 bad status."""
    import pandas as pd

    from extractor.queries import QUERIES

    d = str(tmp_path)
    pd.DataFrame({
        "o_orderkey": [1, 2, 2, 2, 3, 3],
        "o_custkey": [10] * 6,
        "o_orderstatus": ["P", "O", "F", "P", "O", "X"],
        "o_totalprice": [1.0] * 6,
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 6)
        .astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "1-URGENT", "5-LOW", "2-HIGH"],
    }).to_parquet(d + "/orders.parquet")
    pd.DataFrame({
        "l_orderkey": pd.array([1, 2, 99, 98], dtype="int64"),
    }).to_parquet(d + "/lineitem.parquet")
    pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "ts": pd.to_datetime(["2024-01-01"] * 4).astype("datetime64[us]"),
        "user_id": ["u1", None, None, "u4"],
        "event_type": ["view"] * 4,
        "value": [1.0, 2.0, -3.0, 4.0],
        "props": [""] * 4,
    }).to_parquet(d + "/events.parquet")

    got = {r["check_name"]: r["n_violations"]
           for r in QUERIES["dq_expectations"](spark, d).collect()}
    assert got == {
        "lineitem_orphan_orderkey": 2,
        "orders_dup_orderkey": 3,
        "events_null_user": 2,
        "events_negative_value": 1,
        "orders_priority_not_accepted": 1,
        "orders_status_not_accepted": 1,
    }, got


def test_content_chunk_dedup_differential(spark):
    """content_chunk_dedup (Spark: vectorized chunker + min-struct
    window + rollup) equals an independent pandas pipeline built on
    the from-the-definition naive chunker at sf0.001 — every column,
    every doc."""
    from extractor.core.cdc_chunk import chunk_spans_naive
    from extractor.queries import content_chunk_dedup

    sf = "/root/testdata/sf0.001"
    got = (content_chunk_dedup(spark, sf).toPandas()
           .sort_values("doc_id").reset_index(drop=True))

    docs = pd.read_parquet(sf + "/documents.parquet")[["doc_id", "text"]]
    docs = docs.dropna(subset=["text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = text.encode("utf-8")
        for i, (s, ln) in enumerate(chunk_spans_naive(b)):
            rows.append((int(doc_id), i, ln,
                         hashlib.md5(b[s:s + ln]).hexdigest()))
    ch = pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "length", "h"])
    firsts = (ch.sort_values(["doc_id", "chunk_idx"]).groupby("h").first()
              .reset_index()[["h", "doc_id", "chunk_idx"]]
              .rename(columns={"doc_id": "fd", "chunk_idx": "fc"}))
    m = ch.merge(firsts, on="h")
    m["is_dup"] = ((m["doc_id"] != m["fd"])
                   | (m["chunk_idx"] != m["fc"])).astype(int)
    m["bd"] = m["length"] * m["is_dup"]
    exp = (m.groupby("doc_id")
           .agg(n_chunks=("h", "size"), n_dup_chunks=("is_dup", "sum"),
                bytes_total=("length", "sum"), bytes_dup=("bd", "sum"))
           .reset_index().sort_values("doc_id").reset_index(drop=True))
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    for c in ("n_chunks", "n_dup_chunks", "bytes_total", "bytes_dup"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the corpus genuinely exercises the dup path
    assert int(got["n_dup_chunks"].sum()) > 0


def test_content_chunk_dedup_hand_fixture(spark, tmp_path):
    """Hand-verifiable semantics: two identical docs -> the later one
    is 100% dup bytes; a doc sharing only a long run with doc 0 is
    partially dup; a short unique doc has zero dup chunks. Keeper rule
    is lexicographic (doc_id, chunk_idx) — doc 0 never counts dup."""
    from extractor.queries import content_chunk_dedup

    base = ("spark shuffles hash partitions across the executor fleet "
            "while the optimizer prunes columns and pushes filters " * 4)
    sf = _docs(tmp_path, [base, base, base[:200] + " tail of fresh bytes",
                          "tiny unique doc"])
    got = (content_chunk_dedup(spark, sf).toPandas()
           .set_index("doc_id").sort_index())
    assert got.loc[1, "bytes_dup"] == got.loc[1, "bytes_total"]
    assert got.loc[1, "n_dup_chunks"] == got.loc[1, "n_chunks"]
    assert got.loc[0, "n_dup_chunks"] > 0  # base repeats internally (*4)
    assert 0 < got.loc[2, "bytes_dup"] < got.loc[2, "bytes_total"]
    assert got.loc[3, "n_dup_chunks"] == 0


def test_ann_mmr_topk_differential(spark):
    """Stage-2 MMR (integer micro-unit greedy argmax) equals an
    independent plain-Python-loop reimplementation on exactly the
    candidate pools Spark produced; and MMR genuinely reorders vs
    pure relevance (the diversity term does work on this corpus)."""
    import numpy as np

    from extractor.queries import (_MMR_K, _MMR_LAMBDA_MILLI,
                                   _mmr_candidates, QUERIES)

    sf = "/root/testdata/sf0.001"
    got = (QUERIES["ann_mmr_topk"](spark, sf).toPandas()
           .sort_values(["query_id", "sel_rank"]).reset_index(drop=True))
    assert len(got) == 10 * _MMR_K

    cpd = _mmr_candidates(spark, sf).toPandas()
    exp_rows = []
    for qid, g in cpd.groupby("query_id"):
        g = g.sort_values("neighbor_id").reset_index(drop=True)
        V = np.stack(g["v"].to_numpy())
        qv = np.asarray(g["qv"].iloc[0])
        ids = g["neighbor_id"].tolist()
        n = len(ids)
        norms = [float(np.sqrt(np.dot(V[i], V[i]))) for i in range(n)]
        qn = float(np.sqrt(np.dot(qv, qv)))
        relm = [int(np.rint(float(np.dot(V[i], qv)) / (norms[i] * qn) * 1e6))
                for i in range(n)]
        simm = [[int(np.rint(float(np.dot(V[i], V[j]))
                             / (norms[i] * norms[j]) * 1e6))
                 for j in range(n)] for i in range(n)]
        sel: list = []
        act = set(range(n))
        for rank in range(1, min(_MMR_K, n) + 1):
            best_i, best_sc = None, None
            for i in sorted(act, key=lambda i: ids[i]):
                if not sel:
                    sc = relm[i]
                else:
                    sc = (_MMR_LAMBDA_MILLI * relm[i]
                          - (1000 - _MMR_LAMBDA_MILLI)
                          * max(simm[i][j] for j in sel))
                if best_sc is None or sc > best_sc:
                    best_i, best_sc = i, sc
            exp_rows.append((qid, ids[best_i], rank, relm[best_i]))
            sel.append(best_i)
            act.discard(best_i)
    exp = (pd.DataFrame(exp_rows, columns=list(got.columns))
           .sort_values(["query_id", "sel_rank"]).reset_index(drop=True))
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c

    reordered = 0
    for qid, g in got.groupby("query_id"):
        by_rel = g.sort_values(["rel_micro", "neighbor_id"],
                               ascending=[False, True])
        if by_rel["neighbor_id"].tolist() != \
                g.sort_values("sel_rank")["neighbor_id"].tolist():
            reordered += 1
    assert reordered > 0


def test_ann_mmr_displaces_exact_duplicate(spark, tmp_path):
    """The MMR semantics on a hand-computable fixture: candidates a
    and b are EXACT duplicates with top relevance, c is diverse at
    rel 0.6. Pure relevance ranks (a, b, c); MMR at λ=0.7 must rank
    (a, c, b) — the duplicate's redundancy penalty (sim=1 to the
    already-picked a) pushes it below the diverse candidate:
    score(b) = 700·900000 − 300·1000000 = 330.0e6 <
    score(c) = 700·600000 − 300·191300 ≈ 362.6e6."""
    import numpy as np

    from extractor.queries import QUERIES

    a = [0.9, np.sqrt(1 - 0.81), 0.0, 0.0]
    vecs = {0: [1.0, 0.0, 0.0, 0.0],        # the query
            10: a, 11: list(a),              # exact duplicates
            12: [0.6, -0.8, 0.0, 0.0]}       # diverse, rel 0.6
    pd.DataFrame({
        "vec_id": list(vecs.keys()),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs.values()],
        "label": [0] * len(vecs),
    }).to_parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    got = (QUERIES["ann_mmr_topk"](spark, str(tmp_path)).toPandas()
           .sort_values("sel_rank"))
    assert got["neighbor_id"].tolist() == [10, 12, 11], got


def test_hard_negative_mining_margins_and_semantics(spark):
    """hard_negative_mining: (1) a numpy replay of the per-query BM25
    formula reproduces the Spark rows and shows the rank-3 cut and
    adjacent DISTINCT scores separated by far more than the <=1-ulp
    libm divergence (exact ties are legitimate — identical tf/dl
    multisets in a 31-word vocabulary — and are broken by doc_id on
    both engines); (2) the gold positive never appears as its own
    negative; (3) no emitted score sits on a 4-decimal rounding
    boundary."""
    import collections
    import math

    import numpy as np

    from extractor.queries import (_BM25_B, _BM25_K1, _HNM_NEGS, _HNM_Q,
                                   _HNM_QTOKS, QUERIES)

    sf = "/root/testdata/sf0.01"
    got = (QUERIES["hard_negative_mining"](spark, sf).toPandas()
           .sort_values(["query_id", "neg_rank"]).reset_index(drop=True))
    assert len(got) == _HNM_Q * _HNM_NEGS
    assert (got["neg_doc_id"] != got["query_id"]).all()
    assert (got["pos_doc_id"] == got["query_id"]).all()

    docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))
    toks = {int(d): str(t).split(" ")
            for d, t in zip(docs["doc_id"], docs["text"])}
    n = float(len(docs))
    avgdl = float(np.mean([len(ws) for ws in toks.values()]))
    qterms = {q: set(toks[q][:_HNM_QTOKS]) for q in range(_HNM_Q)}
    allq = set().union(*qterms.values())
    dfreq = {w: sum(1 for ws in toks.values() if w in ws) for w in allq}
    idf = {w: math.log(1 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
           for w in allq if dfreq[w]}
    for q in range(_HNM_Q):
        scores = {}
        for did, ws in toks.items():
            if did == q:
                continue
            c = collections.Counter(ws)
            s = sum(idf[w] * c[w] * (_BM25_K1 + 1)
                    / (c[w] + _BM25_K1 * (1 - _BM25_B
                                          + _BM25_B * len(ws) / avgdl))
                    for w in qterms[q] if c[w] and w in idf)
            if s > 0:
                scores[did] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        expect = [d for d, _ in ranked[:_HNM_NEGS]]
        mine = got[got["query_id"] == q]["neg_doc_id"].tolist()
        assert mine == expect, (q, mine, expect)
        vals = sorted({v for _, v in ranked[:_HNM_NEGS + 3]}, reverse=True)
        gaps = [a - b for a, b in zip(vals, vals[1:])]
        if gaps:
            assert min(gaps) > 1e-9, (q, gaps)
        for _, v in ranked[:_HNM_NEGS]:
            frac = abs(v * 1e4 - round(v * 1e4))
            assert 1e-6 < frac or frac == 0.0, (q, v)


def _bpe_reference(word_counts, k):
    """Sennrich ACL'16 reference trainer: dict-of-tuples vocab,
    Counter pair stats, greedy (count desc, left, right) merges."""
    import collections

    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    out = []
    for rank in range(1, k + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, cnt))
        nv = {}
        for syms, c in vocab.items():
            o, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    o.append(a + b)
                    i += 2
                else:
                    o.append(syms[i])
                    i += 1
            nv[tuple(o)] = nv.get(tuple(o), 0) + c
        vocab = nv
    return out


def test_bpe_train_merges_differential(spark):
    """bpe_train_merges equals the from-the-definition Sennrich
    trainer on the sf0.001 corpus — full merge sequence including
    counts (the regexp_replace merge application must reproduce the
    left-to-right non-overlapping scan exactly)."""
    import collections

    from extractor.queries import _BPE_MERGES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = (QUERIES["bpe_train_merges"](spark, sf).toPandas()
           .sort_values("merge_rank").reset_index(drop=True))
    wc = collections.Counter()
    for txt in pd.read_parquet(sf + "/documents.parquet")["text"]:
        for w in str(txt).split(" "):
            if w:
                wc[w] += 1
    exp = pd.DataFrame(_bpe_reference(wc, _BPE_MERGES),
                       columns=["merge_rank", "left", "right",
                                "pair_count"])
    assert got.astype(str).equals(exp.astype(str)), (got, exp)
    assert len(got) == _BPE_MERGES  # the corpus supports all K rounds


def test_bpe_train_merges_hand_sequence(spark, tmp_path):
    """The textbook fixture (low x2, lower x1) yields the
    hand-derivable sequence — including the (l,o)-beats-(o,w)
    left-asc tie-break at rank 1, overlapping-merge left-to-right
    semantics, and the early stop when every word is one symbol
    (6 merges < K=8)."""
    from extractor.queries import QUERIES

    sf = _docs(tmp_path, ["low low lower"])
    got = (QUERIES["bpe_train_merges"](spark, sf).toPandas()
           .sort_values("merge_rank"))
    seq = list(got[["left", "right", "pair_count"]]
               .itertuples(index=False, name=None))
    assert seq == [("l", "o", 3), ("lo", "w", 3), ("low", "</w>", 2),
                   ("e", "r", 1), ("er", "</w>", 1),
                   ("low", "er</w>", 1)], seq


def test_kn_bigram_nll_hand_and_margins(spark, tmp_path):
    """The KN formula on a hand-computable corpus: docs 'x y x y' and
    'y z' give bigram counts (x,y)=2, (y,x)=1, (y,z)=1 (B=3), so
    P(y|x) = (2-.75)/2 + (.75·1/2)(1/3) = 0.75 and
    P(x|y) = P(z|y) = (1-.75)/2 + (.75·2/2)(1/3) = 0.375 — the
    continuation term doing real work. Then on sf0.01: every emitted
    nll_r sits safely off its 4-decimal rounding boundary (the
    cross-engine sum-order margin discipline)."""
    import math

    from extractor.queries import QUERIES

    sf = _docs(tmp_path, ["x y x y", "y z"])
    got = (QUERIES["kn_bigram_nll"](spark, sf).toPandas()
           .set_index("doc_id").sort_index())
    nll0 = (2 * -math.log(0.75) + -math.log(0.375)) / 3
    nll1 = -math.log(0.375)
    assert got.loc[0, "n_big"] == 3 and got.loc[1, "n_big"] == 1
    assert abs(got.loc[0, "nll_r"] - round(nll0, 4)) < 1e-12
    assert abs(got.loc[1, "nll_r"] - round(nll1, 4)) < 1e-12

    # real margin: replay the UNROUNDED per-doc nll in pandas on
    # sf0.01 and assert every value sits far (>1e-9) from a 4-decimal
    # rounding boundary — the distance that makes the cross-engine
    # sum-order noise (~1e-13 rel) unable to flip the rounded digit
    import collections

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    per_doc = {}
    big_c = collections.Counter()
    for did, txt in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in str(txt).lower().split(" ") if w]
        bgs = collections.Counter(zip(ws, ws[1:]))
        if bgs:
            per_doc[int(did)] = bgs
            big_c.update(bgs)
    c1 = collections.Counter()
    fwd = collections.Counter()
    bwd = collections.Counter()
    for (w1, w2), c in big_c.items():
        c1[w1] += c
        fwd[w1] += 1
        bwd[w2] += 1
    B = float(len(big_c))
    worst = 1.0
    for did, bgs in per_doc.items():
        s = sum(m * -math.log(
            max(big_c[(w1, w2)] - 0.75, 0.0) / c1[w1]
            + (0.75 * fwd[w1] / c1[w1]) * (bwd[w2] / B))
            for (w1, w2), m in bgs.items())
        nll = s / sum(bgs.values())
        frac = abs(nll * 1e4 - math.floor(nll * 1e4) - 0.5)
        worst = min(worst, frac)
    assert worst > 1e-5, worst  # >1e-9 required; measured ~1e-5+
    big = QUERIES["kn_bigram_nll"](spark, "/root/testdata/sf0.01").toPandas()
    assert len(big) == len(per_doc) == 500


def test_cms_term_counts_guarantees(spark, tmp_path):
    """CMS hard guarantees on a deliberately colliding fixture (5,000
    distinct terms over w=1024 columns — every row of the sketch has
    ~5x column collisions): est >= true for EVERY probed term (each
    occurrence lands in all d cells — an underestimate is
    impossible), at least one probed term genuinely overestimates
    (the min-over-rows path is exercised, not bypassed), and the
    worst overestimate stays under 3·N/w (the deterministic reading
    of the eps·N bound for fixed hashes). On the real corpus the
    sketch is exact for the top-20 (31-word vocabulary cannot collide
    meaningfully in 1024 columns)."""
    from extractor.queries import _CMS_W, QUERIES

    hot = " ".join("hot{:02d} ".format(i) * (20 + i) for i in range(20))
    noise_terms = ["n{:04d}".format(i) for i in range(5000)]
    texts = [hot] + [" ".join(noise_terms[i::7]) for i in range(7)]
    sf = _docs(tmp_path, texts)
    got = QUERIES["cms_term_counts"](spark, sf).toPandas()
    n_tokens = sum(len(t.split()) for t in texts)
    assert len(got) == 20
    assert (got["est_cnt"] >= got["true_cnt"]).all(), got
    over = got["est_cnt"] - got["true_cnt"]
    assert (over > 0).any(), "collisions never exercised the min"
    assert over.max() <= 3 * n_tokens / _CMS_W, (over.max(), n_tokens)

    real = QUERIES["cms_term_counts"](
        spark, "/root/testdata/sf0.001").toPandas()
    assert (real["est_cnt"] == real["true_cnt"]).all()


def test_bpe_train_merges_regex_metachar_symbols(spark, tmp_path):
    """Symbols containing Java regex/replacement metachars ($, \\, .)
    must merge correctly: '$' crashes regexp_replace unescaped
    (INVALID_REGEXP_REPLACE) and '\\' is silently swallowed — both
    caught by code review, both now escaped. Full sequence pinned
    against the reference trainer."""
    import collections

    from extractor.queries import _BPE_MERGES, QUERIES

    texts = ["$5 $5 $5 c\\d c\\d a.b a.b a.b a.b"] * 2
    sf = _docs(tmp_path, texts)
    got = (QUERIES["bpe_train_merges"](spark, sf).toPandas()
           .sort_values("merge_rank").reset_index(drop=True))
    wc = collections.Counter(w for t in texts for w in t.split(" ") if w)
    exp = pd.DataFrame(_bpe_reference(wc, _BPE_MERGES),
                       columns=["merge_rank", "left", "right",
                                "pair_count"])
    assert got.astype(str).equals(exp.astype(str)), (got, exp)


def test_homoglyph_skeleton_catches_evasion(spark):
    """Every synthesized evasion twin (Cyrillic swap for even docs,
    zero-width + case tweak for thirds) must land in its ORIGINAL's
    skeleton group with the original as keeper — and the raw
    fingerprints inside those groups must be genuinely distinct
    (i.e. dedup_exact would NOT have caught them)."""
    from extractor.queries import QUERIES

    got = QUERIES["homoglyph_skeleton_dedup"](
        spark, "/root/testdata/sf0.001").toPandas()
    multi = got[got["n_raw_variants"] > 1]
    # 250 even docs + 167 thirds, union = 333 docs with >= 1 twin
    assert len(multi) == 333
    assert (multi["keeper_doc_id"] < 10000000).all()
    # docs divisible by 6 have BOTH twins -> 3 distinct raw variants
    both = multi[multi["n_raw_variants"] == 3]
    assert len(both) == 84  # ceil(500/6)
    assert (multi["n_docs"] == multi["n_raw_variants"]).all()


def test_compress_ratio_quality_semantics(spark, tmp_path):
    """Exact zlib replay on the corpus (same library -> byte-equal
    sizes), plus planted semantics: a degenerate repeated-phrase doc
    scores far below a random-hex doc, and only the former trips the
    low_quality flag at the 220-milli threshold."""
    import hashlib
    import zlib

    from extractor.queries import _CR_LEVEL, QUERIES

    sf = "/root/testdata/sf0.001"
    got = (QUERIES["compress_ratio_quality"](spark, sf).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pd.read_parquet(sf + "/documents.parquet")
    docs = docs.dropna(subset=["text"]).sort_values("doc_id")
    for (_, row), txt in zip(got.iterrows(), docs["text"]):
        b = txt.encode("utf-8")
        gz = len(zlib.compress(b, _CR_LEVEL))
        assert row["raw_bytes"] == len(b) and row["gz_bytes"] == gz
        assert row["ratio_milli"] == (1000 * gz) // len(b)

    rep = "click here to win amazing prizes " * 60
    rnd = " ".join(hashlib.sha256(str(i).encode()).hexdigest()
                   for i in range(30))
    sf2 = _docs(tmp_path, [rep, rnd])
    g2 = (QUERIES["compress_ratio_quality"](spark, sf2).toPandas()
          .set_index("doc_id"))
    assert g2.loc[0, "ratio_milli"] < 100 < g2.loc[1, "ratio_milli"]
    assert g2.loc[0, "low_quality"] == 1 and g2.loc[1, "low_quality"] == 0


def test_dsir_select_hand_and_margins(spark, tmp_path):
    """DSIR exactness on a hand-replayable fixture (5 docs, mixed
    langs, K=(5+4)//5=1 so exactly the top-weight doc is selected),
    then the cross-engine margin discipline on sf0.01: a pure-Python
    replay of the UNROUNDED log importance weight must (a) round to
    exactly the emitted logw_r for every doc and (b) sit far from
    every 4-decimal rounding boundary, so the engines' per-doc
    sum-order difference cannot flip a rounded digit."""
    import collections
    import math

    from extractor.queries import _DSIR_B, QUERIES

    def replay(docs):
        """(doc_id -> (n_toks, unrounded logw)) per the Xie'23
        add-1-smoothed hashed-unigram formula."""
        feats = {}
        for did, txt, lang in zip(docs["doc_id"], docs["text"],
                                  docs["lang"]):
            c = collections.Counter(
                int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
                % _DSIR_B
                for w in str(txt).lower().split() if w)
            if c:
                feats[int(did)] = (lang, c)
        raw = collections.Counter()
        tgt = collections.Counter()
        for lang, c in feats.values():
            raw.update(c)
            if lang == "en":
                tgt.update(c)
        tr, tt = sum(raw.values()), sum(tgt.values())
        out = {}
        for did, (_, c) in feats.items():
            n = sum(c.values())
            part = sum(m * math.log((tgt.get(b, 0) + 1)
                                    / (raw[b] + 1))
                       for b, m in c.items())
            out[did] = (n, part + n * math.log((tr + _DSIR_B)
                                               / (tt + _DSIR_B)))
        return out

    texts = ["the quick brown fox jumps over the lazy dog",
             "the cat sat on the mat with the hat",
             "der schnelle braune fuchs springt hoch",
             "le chat est assis sur le tapis rouge",
             "el perro corre por el parque verde"]
    sf = _docs(tmp_path, texts, langs=["en", "en", "de", "fr", "es"])
    got = (QUERIES["dsir_select"](spark, sf).toPandas()
           .set_index("doc_id").sort_index())
    exp = replay(pd.read_parquet(sf + "/documents.parquet"))
    assert len(got) == 5
    for did, (n, lw) in exp.items():
        assert got.loc[did, "n_toks"] == n
        assert abs(got.loc[did, "logw_r"] - round(lw, 4)) < 1e-12
    # K = 1: exactly the highest-weight doc is selected, and it is
    # an English doc (the target model was FIT on the en docs)
    assert int(got["sel"].sum()) == 1
    winner = got[got["sel"] == 1].index[0]
    assert exp[winner][1] == max(v[1] for v in exp.values())
    assert winner in (0, 1)
    # ranks are the dense 1..5 permutation ordered by (-logw, doc_id)
    order = sorted(exp, key=lambda d: (-exp[d][1], d))
    assert [got.loc[d, "rnk"] for d in order] == [1, 2, 3, 4, 5]

    # sf0.01: full-value differential + rounding-boundary margin
    big = (QUERIES["dsir_select"](spark, "/root/testdata/sf0.01")
           .toPandas().set_index("doc_id").sort_index())
    exp2 = replay(pd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet"))
    assert len(big) == len(exp2) == 500
    worst = 1.0
    for did, (n, lw) in exp2.items():
        assert big.loc[did, "n_toks"] == n
        assert abs(big.loc[did, "logw_r"] - round(lw, 4)) < 1e-12
    for _, lw in exp2.values():
        frac = abs(lw * 1e4 - math.floor(lw * 1e4) - 0.5)
        worst = min(worst, frac)
    assert worst > 1e-6, worst  # >1e-9 required; leaves headroom
    assert int(big["sel"].sum()) == 100  # ceil(500/5)


def test_bfs_hops_path_cap_multiseed(spark):
    """_bfs_hops from the definition: on a 0-1-...-10 path seeded at
    node 0, hop counts are exact, nodes past the 6-hop cap are
    EXCLUDED (7..10), and a disconnected 100-101 component is never
    reached. Then multi-source: seeding both ends gives min-over-
    seeds distances and exercises the empty-frontier early exit
    (every node is visited by round 5; round 6's expansion anti-joins
    to empty)."""
    from extractor.queries import _bfs_hops

    path = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(
        path + [(v, u) for u, v in path] + [(100, 101), (101, 100)],
        "u long, v long")
    seeds = spark.createDataFrame([(0,)], "node_id long")
    got = {r.node_id: r.hops for r in _bfs_hops(edges, seeds).collect()}
    assert got == {i: i for i in range(7)}

    both = spark.createDataFrame([(0,), (10,)], "node_id long")
    got2 = {r.node_id: r.hops for r in _bfs_hops(edges, both).collect()}
    assert got2 == {i: min(i, 10 - i) for i in range(11)}


def test_dedup_token_sort_catches_permutation(spark, tmp_path):
    """dedup_token_sort semantics on a planted fixture: a word-order
    permutation pair collapses to ONE fingerprint (min-id survivor),
    while a doc differing by a single word keeps its own — exactly the
    class exact dedup misses and Levenshtein rejects."""
    import pandas as pd

    from extractor.queries import QUERIES

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["fast scan table join",
                 "join table fast scan",   # permutation of doc 1
                 "fast scan table merge",  # one word differs
                 "fast scan table join extra"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [20, 20, 21, 26],
    })
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["dedup_token_sort"](spark, str(tmp_path)).toPandas()
    assert len(out) == 3
    grp = out[out.n_docs == 2]
    assert len(grp) == 1 and int(grp.keep_doc_id.iloc[0]) == 1
    assert set(out[out.n_docs == 1].keep_doc_id) == {3, 4}


def _bpe_ref_encode(word, merges):
    """Apply trained merges to one word from the definition: chars +
    </w>, each merge in rank order as a left-to-right non-overlapping
    scan (re.sub semantics, same as _bpe_reference's application)."""
    syms = list(word) + ["</w>"]
    for _, a, b, _c in merges:
        o, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                o.append(a + b)
                i += 2
            else:
                o.append(syms[i])
                i += 1
        syms = o
    return syms


def test_bpe_encode_texts_differential(spark, tmp_path):
    """bpe_encode_texts equals the from-the-definition encoder on
    (a) the sf0.001 corpus under the corpus-trained merge table and
    (b) the regex-metachar adversarial corpus ($, backslash, dot in
    symbols) — per-doc word and exact piece counts."""
    import collections

    from extractor.queries import _BPE_MERGES, QUERIES

    def check(sf):
        docs = pd.read_parquet(sf + "/documents.parquet")
        wc = collections.Counter(
            w for t in docs["text"] for w in str(t).split(" ") if w)
        merges = _bpe_reference(wc, _BPE_MERGES)
        enc = {w: len(_bpe_ref_encode(w, merges)) for w in wc}
        exp = {}
        for did, txt in zip(docs["doc_id"], docs["text"]):
            ws = [w for w in str(txt).split(" ") if w]
            if ws:
                exp[int(did)] = (len(ws), sum(enc[w] for w in ws))
        got = (QUERIES["bpe_encode_texts"](spark, sf).toPandas()
               .set_index("doc_id"))
        assert len(got) == len(exp)
        for did, (nw, np_) in exp.items():
            assert int(got.loc[did, "n_words"]) == nw, did
            assert int(got.loc[did, "n_pieces"]) == np_, did

    check("/root/testdata/sf0.001")
    texts = ["$5 $5 $5 c\\d c\\d a.b a.b a.b a.b"] * 2
    check(_docs(tmp_path, texts))


def test_prorate_largest_remainder_invariant_and_hand(spark, tmp_path):
    """Proration invariant on sf0.01: per-order allocations sum
    EXACTLY to the order total in integer cents, every order. Hand
    fixture: total 100 cents over three equal weights — remainders
    tie, line 1 takes the leftover cent -> [34, 33, 33]."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    got = QUERIES["prorate_largest_remainder"](spark, sf).toPandas()
    orders = pd.read_parquet(sf + "/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    tc = {int(k): round(v * 100)
          for k, v in zip(orders.o_orderkey, orders.o_totalprice)}
    sums = got.groupby("orderkey")["alloc_cents"].sum()
    assert all(int(sums[k]) == tc[k] for k in sums.index)
    # independent pandas replay (Hamilton from the definition) — the
    # synthetic lineitem has DUPLICATE (orderkey, linenumber) keys
    # (60k rows, 45.8k distinct at sf0.01), so the comparison is a
    # per-key MULTISET of allocations (tie swaps between identical
    # rows are invisible there, and the quota property is per row):
    li = pd.read_parquet(
        sf + "/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    li["wc"] = (li.l_extendedprice * 100).round().astype("int64")
    li["tc"] = li.l_orderkey.map(tc).astype("int64")
    li["tw"] = li.groupby("l_orderkey")["wc"].transform("sum")
    li["base"] = (li.tc * li.wc) // li.tw
    li["rem"] = (li.tc * li.wc) % li.tw
    li["rk"] = (li.sort_values(["rem", "l_linenumber"],
                               ascending=[False, True])
                .groupby("l_orderkey").cumcount() + 1)
    left = li.tc - li.groupby("l_orderkey")["base"].transform("sum")
    li["alloc"] = li.base + (li.rk <= left).astype("int64")
    # quota (exact integers): alloc is within one cent of the exact
    # share -> -tw < alloc*tw - tc*wc <= tw
    diff = li.alloc * li.tw - li.tc * li.wc
    assert (diff > -li.tw).all() and (diff <= li.tw).all()
    # replay multiset == query multiset per (orderkey, linenumber)
    rep = li.groupby(["l_orderkey", "l_linenumber"])["alloc"]             .apply(sorted).to_dict()
    out = got.groupby(["orderkey", "linenumber"])["alloc_cents"]              .apply(sorted).to_dict()
    assert rep == out

    li = pd.DataFrame({"l_orderkey": [7, 7, 7],
                       "l_linenumber": [1, 2, 3],
                       "l_extendedprice": [10.00, 10.00, 10.00]})
    od = pd.DataFrame({"o_orderkey": [7], "o_totalprice": [1.00]})
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    od.to_parquet(str(tmp_path / "orders.parquet"))
    out = (QUERIES["prorate_largest_remainder"](spark, str(tmp_path))
           .toPandas().sort_values("linenumber"))
    assert out.alloc_cents.tolist() == [34, 33, 33]


def test_sssp_cheaper_long_path_and_cap(spark, tmp_path):
    """Min-plus semantics from the definition: the cheapest route may
    use MORE hops than the hop-shortest one (0->1->2 at 10+10 beats
    the direct 0->2 at 100), and nodes needing more than 6 relaxation
    rounds are absent. Built on the registered query by synthesizing
    lineitem/supplier parquet with the exact lanes."""
    from extractor.queries import QUERIES

    # supplier 1 (node -1) is the only seed (s_suppkey <= 3).
    # lanes: -1 -> p10 (w 10.00), p10 -> s4 (same lane back is w 10.00
    # by symmetry), s4(-4) -> p20 (w 10.00); direct -1 -> p20 (w 100.00).
    # cheapest -1 .. p20 = 10+10+10 = 30.00 via 3 edges, not 100.00.
    li = pd.DataFrame({
        "l_suppkey":        [1,     4,     4,     1],
        "l_partkey":        [10,    10,    20,    20],
        "l_extendedprice":  [10.00, 10.00, 10.00, 100.00],
    })
    sup = pd.DataFrame({"s_suppkey": [1, 4],
                        "s_nationkey": [0, 0]})
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    sup.to_parquet(str(tmp_path / "supplier.parquet"))
    got = {int(r.node_id): int(r.min_cost)
           for r in QUERIES["sssp_bounded_bellman"](
               spark, str(tmp_path)).collect()}
    # -1 seed 0; p10 via lane 1000c; s4 via p10 (1000+1000);
    # p20 min(direct 10000, via s4 3000) = 3000
    assert got == {-1: 0, 10: 1000, -4: 2000, 20: 3000}


def test_event_seq_match_hand_semantics(spark, tmp_path):
    """CEP semantics from the definition on a hand corpus: greedy
    non-overlapping S[VC]*P matching, 'E' breaks the closure, users
    with no signup never match, first_pos is 1-based leftmost.
    user 1: S V C P V S P -> 'SVCPVSP' = 2 matches, first at 1
    user 2: V C P        -> no S, 0 matches
    user 3: S E P        -> error inside the run blocks the match
    user 4: S V P P      -> ONE match (second P not re-matched)"""
    from extractor.queries import QUERIES

    seqs = {1: "SVCPVSP", 2: "VCP", 3: "SEP", 4: "SVPP"}
    ch2ty = {"S": "signup", "V": "view", "C": "click",
             "P": "purchase", "E": "error"}
    rows, eid = [], 0
    for uid, s in seqs.items():
        for i, c in enumerate(s):
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=i), uid,
                         ch2ty[c], 1.0, "{}"))
            eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in
           QUERIES["event_seq_match"](spark, str(tmp_path)).collect()}
    assert (got[1]["n_matches"], got[1]["first_pos"]) == (2, 1)
    assert (got[2]["n_matches"], got[2]["first_pos"]) == (0, 0)
    assert (got[3]["n_matches"], got[3]["first_pos"]) == (0, 0)
    assert (got[4]["n_matches"], got[4]["first_pos"]) == (1, 1)
    assert got[1]["seq_len"] == 7


def test_bloom_incremental_dedup_planted_and_fp_bound(spark, tmp_path):
    """Planted cross-split duplicate: a batch doc (doc_id % 10 == 0)
    with text identical to a corpus doc must come back is_dup=1 AND
    bloom_pass=1 (the no-false-negative guarantee); a unique batch
    doc is_dup=0. Corpus-wide at sf0.1: is_dup=1 implies bloom_pass=1
    for every row, and the false-positive count obeys the sizing
    bound (n=4.5k keys in m=2^20 bits, k=5 -> p_fp ~ 4e-9; assert a
    lax <= 2 of 500)."""
    from extractor.queries import QUERIES

    rows = [(10, "the shared duplicate payload", "en", "s", 28),
            (11, "the shared duplicate payload", "en", "s", 28),
            (20, "a one-of-a-kind batch document", "en", "s", 30),
            (21, "corpus filler one", "en", "s", 17),
            (33, "corpus filler two", "en", "s", 17)]
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in
           QUERIES["bloom_incremental_dedup"](
               spark, str(tmp_path)).collect()}
    assert set(got) == {10, 20}
    assert got[10]["is_dup"] == 1 and got[10]["bloom_pass"] == 1
    assert got[20]["is_dup"] == 0

    big = QUERIES["bloom_incremental_dedup"](
        spark, "/root/testdata/sf0.1").toPandas()
    assert len(big) == 500
    assert ((big.is_dup == 1) <= (big.bloom_pass == 1)).all()
    fp = int(((big.bloom_pass == 1) & (big.is_dup == 0)).sum())
    assert fp <= 2, fp


def test_mix_temperature_alloc_invariants_and_hand(spark, tmp_path):
    """Hamilton invariants on sf0.1: allocations sum EXACTLY to the
    budget (total DIV 2) and each is within one unit of its real
    quota (-wt < alloc*wt - budget*w <= wt in exact integers); the
    sqrt flattening upweights the smallest source relative to
    proportional sampling. Hand fixture: counts 16/4/1, budget 10 ->
    sqrt weights 4:2:1 -> quotas 40/7, 20/7, 10/7 -> base 5,2,1,
    remainders 5e6,6e6,3e6 -> leftover 2 goes to B then A -> 6,3,1."""
    from extractor.queries import QUERIES

    got = QUERIES["mix_temperature_alloc"](
        spark, "/root/testdata/sf0.1").toPandas()
    total = int(got.n_docs.sum())
    budget = total // 2
    assert int(got.alloc.sum()) == budget
    wt = int(got.w_micro.sum())
    diff = got.alloc.astype("int64") * wt - budget * got.w_micro
    assert (diff > -wt).all() and (diff <= wt).all()
    small = got.loc[got.n_docs.idxmin()]
    assert small.alloc / budget >= small.n_docs / total - 1e-12

    rows = []
    for src, n in (("A", 16), ("B", 4), ("C", 1)):
        for i in range(n):
            rows.append((len(rows), "t", "en", src, 1))
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    out = {r["source"]: r["alloc"] for r in
           QUERIES["mix_temperature_alloc"](
               spark, str(tmp_path)).collect()}
    assert out == {"A": 6, "B": 3, "C": 1}


def _ref_winnow(text, k=4, w=4):
    """From-the-definition robust winnowing (Schleimer'03): k-gram
    hashes, per-window min with rightmost tie-break, dedup the
    selected (hash, 1-based pos) set."""
    import hashlib

    words = text.split(" ")
    if len(words) < k:
        return set()
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % (1 << 40)
          for g in grams]
    sel = set()
    for s in range(len(hs) - w + 1):
        win = hs[s:s + w]
        mh = min(win)
        pos = s + max(i for i, v in enumerate(win) if v == mh)
        sel.add((mh, pos + 1))
    return sel


def test_winnow_contamination_differential_and_guarantee(spark, tmp_path):
    """(1) Differential on sf0.001: per-doc n_fp / n_shared_fp must
    equal an independent single-threaded winnower's, including the
    only-contaminated-docs output filter. (2) Guarantee fixture: a
    corpus doc sharing a run of EXACTLY w + k - 1 = 7 words with a
    bench doc MUST surface (the SIGMOD'03 theorem is deterministic,
    not probabilistic); a fully-disjoint doc must not."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    fps = {int(r.doc_id): _ref_winnow(r.text) for r in docs.itertuples()}
    bench = set()
    for did, s in fps.items():
        if did < 5:
            bench |= {h for h, _ in s}
    want = {}
    for did, s in fps.items():
        if did < 5:
            continue
        hashes = {h for h, _ in s}
        shared = hashes & bench
        if shared:
            want[did] = (len(hashes), len(shared))
    got = {int(r["doc_id"]): (int(r["n_fp"]), int(r["n_shared_fp"]))
           for r in QUERIES["winnow_contamination"](spark, sf).collect()}
    assert got == want

    uniq = ["u{}{}".format(i, j) for i in range(40) for j in ("a", "b")]
    run7 = "alpha bravo charlie delta echo foxtrot golf".split()
    bench_doc = " ".join(uniq[0:10] + run7 + uniq[10:20])
    hit_doc = " ".join(uniq[20:30] + run7 + uniq[30:40])
    miss_doc = " ".join(uniq[40:70])
    rows = [(0, bench_doc, "en", "s", len(bench_doc)),
            (10, hit_doc, "en", "s", len(hit_doc)),
            (11, miss_doc, "en", "s", len(miss_doc))]
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in QUERIES["winnow_contamination"](
        spark, str(tmp_path)).collect()}
    assert 10 in out and out[10]["n_shared_fp"] >= 1
    assert 11 not in out


def test_hits_hand_fixture(spark, tmp_path):
    """Kleinberg HITS from the definition on a 2-supplier/2-part
    graph, hand-unrolled: edges s1-{p10,p20}, s2-{p20} ->
    a1=(1,2), h1=(3,2), a2=(3,5), h2=(8,5), a3=(8,13), h3=(21,13).
    Exact integers, no normalization."""
    from extractor.queries import QUERIES

    li = pd.DataFrame({"l_suppkey": [1, 1, 2, 2],
                       "l_partkey": [10, 20, 20, 20]})  # dup edge deduped
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    got = {(r["role"], r["node_id"]): r["score"]
           for r in QUERIES["hits_hub_authority"](
               spark, str(tmp_path)).collect()}
    assert got == {("authority", 10): 8, ("authority", 20): 13,
                   ("hub", -1): 21, ("hub", -2): 13}


def test_k_anonymity_hand(spark, tmp_path):
    """Size-4 quasi-identifier cell flags at_risk (k=5) with
    prosecutor risk 250000 micro; size-5 cell passes at 200000.
    Buckets split on n_chars DIV 500 boundaries."""
    from extractor.queries import QUERIES

    rows = [(i, "t", "en", "a", 100) for i in range(4)]          # 4 @ b0
    rows += [(10 + i, "t", "en", "a", 700) for i in range(5)]    # 5 @ b1
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    got = {int(r["len_bucket"]): r for r in
           QUERIES["k_anonymity_audit"](spark, str(tmp_path)).collect()}
    assert (got[0]["n"], got[0]["at_risk"], got[0]["reid_risk_micro"]) \
        == (4, 1, 250000)
    assert (got[1]["n"], got[1]["at_risk"], got[1]["reid_risk_micro"]) \
        == (5, 0, 200000)


def test_skipgram_pairs_differential(spark):
    """Independent single-threaded word2vec pair extraction on
    sf0.001 (tokenize -> deterministic sqrt(t/f) subsample by
    occurrence hash -> compacted re-rank -> +-3-rank pairs ->
    min_count 5) must reproduce the query's (center, context, n)
    multiset exactly — including which OCCURRENCES the subsampler
    drops."""
    import hashlib
    import math
    from collections import Counter

    from extractor.queries import _SG_C, _SG_MIN_COUNT, QUERIES

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    toks = [(int(r.doc_id), i + 1, w)
            for r in docs.itertuples()
            for i, w in enumerate(r.text.split(" "))]
    freq = Counter(w for _, _, w in toks)
    n = sum(freq.values())
    p_micro = {w: math.floor(math.sqrt(0.001 * n / f) * 1000000)
               for w, f in freq.items()}
    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    surv = {}
    for doc, pos, w in toks:                       # toks is pos-ordered
        if h60("{}:{}".format(doc, pos)) % 1000000 < p_micro[w]:
            surv.setdefault(doc, []).append(w)
    want = Counter()
    for words in surv.values():
        for i, cw in enumerate(words):
            for j in range(max(0, i - _SG_C), min(len(words), i + _SG_C + 1)):
                if j != i:
                    want[(cw, words[j])] += 1
    want = {k: v for k, v in want.items() if v >= _SG_MIN_COUNT}
    got = {(r["center"], r["context"]): int(r["n"])
           for r in QUERIES["skipgram_pairs"](spark, sf).collect()}
    assert got == want


def test_bitmap_intersect_equals_cooccurrence(spark):
    """Cross-query pin: the bitmap popcount path must produce the
    SAME pair->n_docs table as entity_cooccurrence's doc-level join
    path at sf0.01 (two structurally different algorithms, one
    answer)."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    bm = {(r["ent_a"], r["ent_b"]): int(r["n_docs"])
          for r in QUERIES["bitmap_entity_intersect"](spark, sf).collect()}
    co = {(r["ent_a"], r["ent_b"]): int(r["n_docs"])
          for r in QUERIES["entity_cooccurrence"](spark, sf).collect()}
    assert bm == co


def test_calibration_bins_invariants(spark):
    """Reliability-table invariants at sf0.1: bin totals sum to the
    embedding count; per-bin mean score (mass/n) lies inside the
    bin's probability interval [bin/10, (bin+1)/10); n_pos <= n
    everywhere; bins come out of [0, 9]."""
    from extractor.queries import QUERIES

    got = QUERIES["calibration_bins"](
        spark, "/root/testdata/sf0.1").toPandas()
    n_emb = len(pd.read_parquet("/root/testdata/sf0.1/embeddings.parquet",
                                columns=["vec_id"]))
    assert int(got.n.sum()) == n_emb
    assert got.bin.between(0, 9).all()
    assert (got.n_pos <= got.n).all()
    mean = got.sum_score_micro / (got.n * 1000000.0)
    lo, hi = got.bin / 10.0, (got.bin + 1) / 10.0
    # score_r = 1.0 would land in bin 9 with mean == hi; synthetic
    # scores never saturate, so strict upper bound holds
    assert ((mean >= lo - 1e-9) & (mean < hi)).all()


def test_event_seq_sessionized_gap_semantics(spark, tmp_path):
    """A funnel spanning a 30-min session gap must NOT match within
    either session (while the lifetime op would match it); a funnel
    inside one session matches and carries the correct 1-based
    session ordinal (user 2's match sits in their SECOND session)."""
    from extractor.queries import QUERIES

    t0 = pd.Timestamp("2024-01-01")
    mins = pd.Timedelta(minutes=1)
    rows = [
        # user 1: S V ... 2h gap ... V P  -> no per-session match
        (0, t0, 1, "signup", 1.0, "{}"),
        (1, t0 + mins, 1, "view", 1.0, "{}"),
        (2, t0 + pd.Timedelta(hours=2), 1, "view", 1.0, "{}"),
        (3, t0 + pd.Timedelta(hours=2) + mins, 1, "purchase", 1.0, "{}"),
        # user 2: [P] ... gap ... [S V P] -> match in session 2
        (4, t0, 2, "purchase", 1.0, "{}"),
        (5, t0 + pd.Timedelta(hours=3), 2, "signup", 1.0, "{}"),
        (6, t0 + pd.Timedelta(hours=3) + mins, 2, "view", 1.0, "{}"),
        (7, t0 + pd.Timedelta(hours=3) + 2 * mins, 2, "purchase", 1.0,
         "{}"),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))

    got = QUERIES["event_seq_sessionized"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["user_id"], r["session_id"], r["seq_len"],
            r["n_matches"]) == (2, 2, 3, 1)
    # the lifetime op DOES match user 1's cross-gap funnel
    life = {x["user_id"]: x["n_matches"] for x in
            QUERIES["event_seq_match"](spark, str(tmp_path)).collect()}
    assert life[1] == 1


def test_merkle_commit_verification_and_tamper(spark, tmp_path):
    """The commitment must support LOCALIZED verification: an
    independent pandas verifier recomputes one bucket's node from raw
    rows and the root from the 64 nodes, matching the query's output
    exactly; tampering with a single row changes that bucket's node
    AND the root but no other node."""
    import hashlib

    from extractor.queries import _MERKLE_BUCKETS, QUERIES

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    sf = "/root/testdata/sf0.001"
    out = {(r["level"], r["node_id"]): r["h"] for r in
           QUERIES["merkle_table_commit"](spark, sf).collect()}
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    rh = docs.apply(lambda r: md5("{}|{}".format(
        int(r.doc_id), md5(r.text))), axis=1)
    bucket = docs.doc_id % _MERKLE_BUCKETS
    # one bucket, verified from raw rows
    b0 = sorted(rh[bucket == 0])
    assert out[(0, 0)] == md5("".join(b0))
    # root from the 64 nodes
    nodes = [out[(0, b)] for b in sorted({int(x) for x in bucket})]
    assert out[(1, 0)] == md5("".join(nodes))

    # tamper: flip one row's text -> its bucket node + root move only
    docs2 = docs.copy()
    docs2.loc[docs2.index[0], "text"] = docs2.iloc[0].text + " tampered"
    docs2["lang"] = "en"; docs2["source"] = "s"; docs2["n_chars"] = 1
    docs2.to_parquet(str(tmp_path / "documents.parquet"))
    out2 = {(r["level"], r["node_id"]): r["h"] for r in
            QUERIES["merkle_table_commit"](
                spark, str(tmp_path)).collect()}
    hit = int(docs.iloc[0].doc_id) % _MERKLE_BUCKETS
    assert out2[(0, hit)] != out[(0, hit)]
    assert out2[(1, 0)] != out[(1, 0)]
    same = [b for b in range(_MERKLE_BUCKETS)
            if (0, b) in out and b != hit]
    assert all(out2[(0, b)] == out[(0, b)] for b in same)


def test_k_core_peel_fixpoint_and_hand(spark, tmp_path):
    """(1) The fixed-6-round query must equal an independent pandas
    peel run TO CONVERGENCE on sf0.01 — which simultaneously
    witnesses that 6 rounds reach the fixpoint. (2) Hand fixture:
    K_{3,3} (every node degree 3) survives k=3 intact; a degree-2
    part and a pendant supplier peel away."""
    import collections

    from extractor.queries import _KCORE_K, QUERIES

    sf = "/root/testdata/sf0.01"
    li = pd.read_parquet(sf + "/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey", "l_quantity"])
    li = li[li.l_quantity <= 2]
    edges = set()
    for s, p in zip(li.l_suppkey, li.l_partkey):
        edges.add((-int(s), int(p))); edges.add((int(p), -int(s)))
    while True:
        deg = collections.Counter(u for u, _ in edges)
        bad = {u for u, c in deg.items() if c < _KCORE_K}
        if not bad:
            break
        edges = {(u, v) for u, v in edges
                 if u not in bad and v not in bad}
    want = collections.Counter(u for u, _ in edges)
    got = {int(r["node_id"]): int(r["deg"]) for r in
           QUERIES["k_core_peel"](spark, sf).collect()}
    assert got == dict(want)

    rows = [(s, p, 1.0) for s in (1, 2, 3) for p in (10, 20, 30)]
    rows += [(1, 40, 1.0), (2, 40, 1.0)]   # part 40: degree 2 -> peels
    rows += [(4, 50, 1.0)]                 # pendant supplier + part
    pd.DataFrame(rows, columns=["l_suppkey", "l_partkey", "l_quantity"]
                 ).to_parquet(str(tmp_path / "lineitem.parquet"))
    out = {int(r["node_id"]): int(r["deg"]) for r in
           QUERIES["k_core_peel"](spark, str(tmp_path)).collect()}
    assert out == {-1: 3, -2: 3, -3: 3, 10: 3, 20: 3, 30: 3}


def test_graph_negative_samples_validity_and_hand(spark, tmp_path):
    """No emitted negative may be a true edge; slots are 1..4 per
    supplier; candidates stay in [1, max_partkey]; at sf0.1 every
    supplier fills all 4 slots (3% collision density). Hand fixture:
    a 1-edge graph yields exactly 4 hash-deterministic negatives per
    supplier, reproducibly."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.1"
    got = QUERIES["graph_negative_samples"](spark, sf).toPandas()
    li = pd.read_parquet(sf + "/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    true_e = set(zip(li.l_suppkey.astype(int), li.l_partkey.astype(int)))
    assert not any((int(s), int(p)) in true_e
                   for s, p in zip(got.suppkey, got.neg_partkey))
    assert got.slot.between(1, 4).all()
    assert got.neg_partkey.between(1, int(li.l_partkey.max())).all()
    per = got.groupby("suppkey").size()
    assert (per == 4).all() and len(per) == li.l_suppkey.nunique()

    li2 = pd.DataFrame({"l_suppkey": [1, 2], "l_partkey": [1, 100],
                        "l_quantity": [1.0, 1.0]})
    li2.to_parquet(str(tmp_path / "lineitem.parquet"))
    a = QUERIES["graph_negative_samples"](
        spark, str(tmp_path)).toPandas().sort_values(
        ["suppkey", "slot"]).reset_index(drop=True)
    b = QUERIES["graph_negative_samples"](
        spark, str(tmp_path)).toPandas().sort_values(
        ["suppkey", "slot"]).reset_index(drop=True)
    assert a.equals(b)                      # hash-deterministic
    assert (a.groupby("suppkey").size() == 4).all()
    assert (1, int(a[a.suppkey == 1].neg_partkey.iloc[0])) != (1, 1)


def test_quantile_normalize_source_invariants(spark):
    """Within-source percentile: min rank -> 0, max rank -> 1e6,
    median-ish mass in between; values depend only on the WITHIN-
    source order (adding other sources never moves a doc's pct);
    singleton sources pin to 500000."""
    from extractor.queries import QUERIES

    got = QUERIES["quantile_normalize_source"](
        spark, "/root/testdata/sf0.1").toPandas()
    g = got.groupby("source")["pct_micro"]
    assert (g.min() == 0).all() and (g.max() == 1000000).all()
    docs = pd.read_parquet("/root/testdata/sf0.1/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    m = docs.merge(got, on=["doc_id", "source"])
    # replay: exact integer rank transform per source
    m["rk"] = (m.sort_values(["n_chars", "doc_id"])
               .groupby("source").cumcount() + 1)
    n = m.groupby("source")["doc_id"].transform("count")
    want = ((m.rk - 1) * 1000000) // (n - 1)
    assert (m.pct_micro == want).all()


def test_ams_f2_accuracy_and_replay(spark):
    """AMS guarantee on sf0.01: each estimator is S^2 with
    E[S^2] = F2; the median of 4 means-of-4 must land within 3x of
    the EXACT F2 (loose bound — 16 deterministic estimators, the
    theorem's eps needs more; what must hold tightly is the
    construction itself, replayed independently per seed)."""
    import hashlib
    from collections import Counter
    from statistics import median

    from extractor.queries import _AMS_SEEDS, QUERIES

    sf = "/root/testdata/sf0.01"
    docs = pd.read_parquet(sf + "/documents.parquet", columns=["text"])
    cnt = Counter(w for t in docs.text for w in t.split(" "))
    f2 = sum(v * v for v in cnt.values())
    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    want = {}
    for seed in range(_AMS_SEEDS):
        sv = sum(c * (1 - 2 * (h60("{}:{}".format(w, seed)) % 2))
                 for w, c in cnt.items())
        want[seed] = (sv, sv * sv)
    got = {int(r["seed"]): (int(r["s_val"]), int(r["f2_est"]))
           for r in QUERIES["ams_f2_sketch"](spark, sf).collect()}
    assert got == want
    ests = [got[s][1] for s in range(_AMS_SEEDS)]
    means = [sum(ests[i:i + 4]) / 4 for i in range(0, 16, 4)]
    mom = median(means)
    assert f2 / 3 <= mom <= 3 * f2, (mom, f2)


def test_rrf_fuse_replay_and_invariants(spark):
    """Independent fusion replay at sf0.01: recompute both legs
    (BM25 top-10 from the registered query; TF top-10 from raw
    counts) and the 1/(60+r) fusion in pandas — scores and fused
    ranks must match exactly. fused_rank is a contiguous 1..n
    permutation."""
    from collections import Counter

    from extractor.queries import _RRF_K, QUERIES

    sf = "/root/testdata/sf0.01"
    got = (QUERIES["rrf_fuse"](spark, sf).toPandas()
           .sort_values("fused_rank").reset_index(drop=True))
    assert got.fused_rank.tolist() == list(range(1, len(got) + 1))

    a = {int(r["doc_id"]): int(r["rank"])
         for r in QUERIES["bm25_topk"](spark, sf).collect()}
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    terms = {"join", "vector", "hash"}
    tfc = {int(r.doc_id): sum(1 for w in r.text.split(" ") if w in terms)
           for r in docs.itertuples()}
    ranked = sorted(((c, d) for d, c in tfc.items() if c > 0),
                    key=lambda x: (-x[0], x[1]))[:10]
    b = {d: i + 1 for i, (_, d) in enumerate(ranked)}
    import math
    want = {}
    for d in set(a) | set(b):
        s = (1.0 / (_RRF_K + a[d]) if d in a else 0.0) \
            + (1.0 / (_RRF_K + b[d]) if d in b else 0.0)
        want[d] = math.floor(s * 1000000)
    assert {int(r.doc_id): int(r.rrf_micro)
            for r in got.itertuples()} == want


def test_join_card_estimate_accuracy(spark):
    """Correlated key sampling must track the exact self-join size:
    within 2x at sf0.01/sf0.1 (116 / 1266 sampled keys; measured
    0.90x / 1.009x), and the estimate tightens as keys grow."""
    from extractor.queries import QUERIES

    rows = {}
    for sf in ("sf0.01", "sf0.1"):
        r = QUERIES["join_card_estimate"](
            spark, "/root/testdata/" + sf).collect()[0]
        rows[sf] = r
        assert 0.5 * r["true_f2"] <= r["est"] <= 2.0 * r["true_f2"], (sf, r)
    e1 = abs(rows["sf0.01"]["est"] / rows["sf0.01"]["true_f2"] - 1)
    e2 = abs(rows["sf0.1"]["est"] / rows["sf0.1"]["true_f2"] - 1)
    assert e2 < e1


def test_jl_project_margins_and_distance_preservation(spark):
    """(1) Rounding-margin discipline (the logreg pattern): every
    projection's distance to its 6-decimal rounding boundary must
    exceed the cross-engine summation noise (~dim ulps) by orders of
    magnitude. (2) JL contract: for 100 deterministic vector pairs,
    ||Px - Py||^2 / (k * ||x - y||^2) concentrates near 1 (Rademacher
    entries: E = 1), pinned to [0.35, 2.0] at k = 16."""
    import hashlib

    import numpy as np

    from extractor.queries import _JL_IN, _JL_OUT, QUERIES

    sf = "/root/testdata/sf0.1"
    emb = pd.read_parquet(sf + "/embeddings.parquet")
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    R = np.empty((_JL_IN, _JL_OUT))
    for j in range(_JL_IN):
        for k in range(_JL_OUT):
            R[j, k] = 1.0 - 2.0 * (int(hashlib.md5(
                "{}:{}".format(j, k).encode()).hexdigest()[:15], 16) % 2)
    P = M @ R
    # margins: |v*1e6 - round(v*1e6)| must dwarf 64-ulp noise
    fr = np.abs(P * 1e6 - np.rint(P * 1e6))
    margin = np.where(fr > 0.5, 1 - fr, fr)  # distance to boundary
    noise = np.abs(P) * np.finfo(float).eps * _JL_IN * 1e6
    assert (margin > 1000 * np.maximum(noise, 1e-12)).all()

    got = QUERIES["jl_project"](spark, sf).toPandas()
    piv = got.pivot(index="vec_id", columns="dim", values="proj_r")
    piv = piv.loc[emb.vec_id].to_numpy()
    assert np.allclose(piv, np.round(P, 6), atol=0, rtol=0)

    rng = [(i, (i * 7 + 3) % len(M)) for i in range(100)]
    rng = [(a, b) for a, b in rng if a != b]
    ratios = []
    for a, b in rng:
        num = np.sum((P[a] - P[b]) ** 2)
        den = _JL_OUT * np.sum((M[a] - M[b]) ** 2)
        ratios.append(num / den)
    ratios = np.array(ratios)
    # k = 16 gives loose per-pair concentration (measured spread
    # [0.33, 2.26] over these 100 pairs) — pin generous tails and a
    # tight MEDIAN (the unbiasedness statement)
    assert ratios.min() > 0.25 and ratios.max() < 3.0, (
        ratios.min(), ratios.max())
    assert 0.8 < np.median(ratios) < 1.25, np.median(ratios)


def test_oversample_minority_balances_exactly(spark):
    """Per-class output cardinality must equal the majority count
    EXACTLY; copy indices are dense 1..copies per doc; every doc of
    every class appears at least once (floor >= 1)."""
    from extractor.queries import QUERIES

    got = QUERIES["oversample_minority"](
        spark, "/root/testdata/sf0.1").toPandas()
    docs = pd.read_parquet("/root/testdata/sf0.1/documents.parquet",
                           columns=["doc_id", "lang"])
    target = docs.lang.value_counts().max()
    per = got.groupby("lang").size()
    assert (per == target).all()
    assert set(got.doc_id) == set(docs.doc_id)
    g = got.groupby("doc_id")["copy_idx"]
    assert (g.min() == 1).all()
    assert (g.max() == g.size()).all()       # dense 1..copies


def test_dedup_yield_report_cross_pins(spark):
    """The report's legs must agree with the dedicated operators:
    exact survivors == dedup_exact's group count, token_sort
    survivors == dedup_token_sort's; removed = rows - survivors;
    bytes_in identical across methods (each reads the whole
    corpus)."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    rep = {r["method"]: r for r in
           QUERIES["dedup_yield_report"](spark, sf).collect()}
    n_rows = len(pd.read_parquet(sf + "/documents.parquet",
                                 columns=["doc_id"]))
    assert rep["exact"]["survivors"] == \
        QUERIES["dedup_exact"](spark, sf).count()
    assert rep["token_sort"]["survivors"] == \
        QUERIES["dedup_token_sort"](spark, sf).count()
    for m, r in rep.items():
        assert r["removed"] == n_rows - r["survivors"], m
    assert len({r["bytes_in"] for r in rep.values()}) == 1


def test_poisson_bootstrap_ci_and_replay(spark):
    """(1) Exact replay: per-replica (n_eff, sum_cents) must equal an
    independent pandas derivation of the hash-CDF weights. (2) The
    statistics work: replica means bracket the true mean, their
    spread matches the CLT scale (sd/sqrt(n) within 3x both ways),
    and n_eff concentrates near n (Poisson(1) sums)."""
    import hashlib

    import numpy as np

    from extractor.queries import _BOOT_B, _BOOT_CDF, QUERIES

    sf = "/root/testdata/sf0.01"
    orders = pd.read_parquet(sf + "/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    cents = (orders.o_totalprice * 100).round().astype("int64").to_numpy()
    keys = orders.o_orderkey.astype(int).to_numpy()
    h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    want = {}
    for b in range(_BOOT_B):
        us = np.array([h60("{}:{}".format(k, b)) % 1000000 for k in keys])
        wt = np.searchsorted(np.array(_BOOT_CDF), us, side="right")
        want[b] = (int(wt.sum()), int((wt * cents).sum()))
    got = {int(r["replica"]): (int(r["n_eff"]), int(r["sum_cents"]))
           for r in QUERIES["poisson_bootstrap"](spark, sf).collect()}
    assert got == want

    n = len(cents)
    true_mean = cents.mean()
    means = np.array([s / ne for ne, s in got.values()])
    assert means.min() <= true_mean <= means.max()
    se = cents.std() / np.sqrt(n)
    assert se / 3 < means.std() < 3 * se, (means.std(), se)
    neffs = np.array([ne for ne, _ in got.values()])
    assert np.abs(neffs - n).max() < 5 * np.sqrt(n)


def test_hll_register_merge_law_and_accuracy(spark, tmp_path):
    """(1) Merge law, EXACT: the register table of the union corpus
    equals the bucketwise MAX of per-source register tables (computed
    by relabeling all sources to one and re-running the query). (2)
    Estimator accuracy at sf0.1: the standard HLL estimate derived
    from the corpus-wide registers lands within 3 standard errors
    (SE = 1.04/sqrt(64) ~ 13%) of the exact distinct-text count."""
    import numpy as np

    from extractor.queries import _HLL_M, QUERIES

    sf = "/root/testdata/sf0.1"
    per = QUERIES["hll_register_table"](spark, sf).toPandas()
    merged = per.groupby("bucket")["reg"].max()

    docs = pd.read_parquet(sf + "/documents.parquet")
    one = docs.copy()
    one["source"] = "all"
    one.to_parquet(str(tmp_path / "documents.parquet"))
    union = (QUERIES["hll_register_table"](spark, str(tmp_path))
             .toPandas().set_index("bucket")["reg"].sort_index())
    assert merged.sort_index().equals(union)

    regs = np.zeros(_HLL_M)
    regs[union.index.to_numpy()] = union.to_numpy()
    alpha = 0.709                       # alpha_64
    est = alpha * _HLL_M ** 2 / np.sum(2.0 ** -regs)
    true = docs.text.nunique()
    assert abs(est - true) / true < 3 * 1.04 / np.sqrt(_HLL_M), (est, true)


def test_kmv_merge_law_and_estimates(spark, tmp_path):
    """(1) EXACT merge law: bottom-k of the union corpus equals the
    bottom-k of the concatenated per-source sketches. (2) Cardinality
    estimate (k-1)*2^60/kth_min within 3/sqrt(k) of the exact
    distinct count at sf0.1. (3) Jaccard estimate between the two
    largest sources tracks the exact text-set Jaccard within 0.15
    absolute (k = 128)."""
    import numpy as np

    from extractor.queries import _KMV_K, QUERIES

    sf = "/root/testdata/sf0.1"
    per = QUERIES["kmv_sketch"](spark, sf).toPandas()
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["source", "text"])
    one = docs.copy()
    one["doc_id"] = range(len(one))
    one["source"] = "all"
    one["lang"] = "en"; one["n_chars"] = 1
    one.to_parquet(str(tmp_path / "documents.parquet"))
    union = (QUERIES["kmv_sketch"](spark, str(tmp_path))
             .toPandas().sort_values("rk"))
    merged = np.sort(per.hv.unique())[:_KMV_K]
    assert (union.hv.to_numpy() == merged).all()

    true_n = docs.text.nunique()
    kth = union.hv.to_numpy()[_KMV_K - 1]
    est = (_KMV_K - 1) * (1 << 60) / kth
    assert abs(est - true_n) / true_n < 3 / np.sqrt(_KMV_K), (est, true_n)

    top2 = docs.source.value_counts().index[:2]
    a, b = (set(docs[docs.source == s].text) for s in top2)
    true_j = len(a & b) / len(a | b)
    sa = set(per[per.source == top2[0]].hv)
    sb = set(per[per.source == top2[1]].hv)
    theta = sorted(sa | sb)[:_KMV_K]
    est_j = sum(1 for v in theta if v in sa and v in sb) / _KMV_K
    assert abs(est_j - true_j) <= 0.15, (est_j, true_j)


def test_theta_kmv_intersect_replay(spark):
    """Exact replay from the kmv_sketch artifact alone at sf0.01:
    for every source pair, k_union = |bottom-k of merged sketches|
    and k_common = how many of those sit in both — recomputed in
    pandas from the registered sketch query; the composition must
    match row for row (sketch-only inputs, no raw-data access)."""
    from extractor.queries import _KMV_K, QUERIES

    sf = "/root/testdata/sf0.01"
    sk = QUERIES["kmv_sketch"](spark, sf).toPandas()
    by_src = {s: set(g.hv) for s, g in sk.groupby("source")}
    want = {}
    srcs = sorted(by_src)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            theta = sorted(by_src[sa] | by_src[sb])[:_KMV_K]
            want[(sa, sb)] = (
                sum(1 for v in theta
                    if v in by_src[sa] and v in by_src[sb]),
                len(theta))
    got = {(r["src_a"], r["src_b"]): (int(r["k_common"]),
                                      int(r["k_union"]))
           for r in QUERIES["theta_kmv_intersect"](spark, sf).collect()}
    assert got == want


def test_concurrency_sweep_hand_and_plan(spark, tmp_path):
    """Hand fixture: u1's session spans [00:00, 00:10]; u2 and u3
    each have a point session at 00:05 -> peak concurrency 3, first
    reached at 00:05's microsecond timestamp. The plan must carry
    the cumsum through a RANGE partitioning (the two-phase scan),
    never an Exchange SinglePartition window over the raw sweep."""
    from extractor.queries import QUERIES

    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    rows = [(0, t0, 1, "view", 1.0, "{}"),
            (1, t0 + 10 * m, 1, "view", 1.0, "{}"),
            (2, t0 + 5 * m, 2, "view", 1.0, "{}"),
            (3, t0 + 5 * m, 3, "view", 1.0, "{}")]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(str(tmp_path / "events.parquet"))
    df = QUERIES["concurrency_sweep"](spark, str(tmp_path))
    r = df.collect()[0]
    want_us = int((t0 + 5 * m).value // 1000)
    assert (r["max_concurrency"], r["peak_us"]) == (3, want_us)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan, plan


def test_textrank_margins_and_replay(spark):
    """textrank's cross-engine exactness rests on no node's
    UNROUNDED 3-round score sitting near a 6-decimal rounding
    boundary (the contract orders by the ROUNDED score, so
    boundary distance — not adjacent-score gaps — is the only FP
    margin that matters). Numpy replay of the same recursion, all
    nodes checked; the Spark top-20 must equal the replay's
    rounded-order ranking."""
    import collections

    import pandas as pd

    from extractor.queries import textrank_keywords

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        edges = set()
        for txt in docs["text"]:
            ws = str(txt).split(" ")
            for x, y in zip(ws, ws[1:]):
                if x != y and x and y:
                    edges.add((min(x, y), max(x, y)))
        adj = collections.defaultdict(list)
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        r = {n: 1.0 for n in adj}
        for _ in range(3):
            r = {n: 0.15 + 0.85 * sum(r[m] / len(adj[m])
                                      for m in adj[n])
                 for n in adj}
        for v in r.values():  # 6dp rounding-boundary margin
            frac = abs(v * 1e6 - round(v * 1e6))
            assert abs(frac - 0.5) > 1e-6, v
        exp = sorted(((n, round(v, 6)) for n, v in r.items()),
                     key=lambda kv: (-kv[1], kv[0]))[:20]
        got = [(row["word"], row["score_r"], row["rank"])
               for row in textrank_keywords(spark, sf).collect()]
        assert got == [(n, v, i + 1)
                       for i, (n, v) in enumerate(exp)], (got, exp)


def test_dirichlet_qlm_margins(spark):
    """qlm's cross-engine exactness: adjacent UNROUNDED scores
    around the top-10 cut separated far above libm noise, and no
    emitted score on a 4-decimal rounding boundary — the bm25
    margin methodology on the Dirichlet formula."""
    import collections
    import math

    import pandas as pd

    from extractor.queries import _BM25_TERMS, _QLM_MU

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = pd.read_parquet(os.path.join(sf, "documents.parquet"))
        toks = [str(t).split(" ") for t in docs["text"]]
        ctot = float(sum(len(ws) for ws in toks))
        cf = collections.Counter()
        for ws in toks:
            for w in ws:
                if w in _BM25_TERMS:
                    cf[w] += 1
        scores = {}
        for did, ws in zip(docs["doc_id"], toks):
            c = collections.Counter(ws)
            s1 = sum(math.log(1 + c[q] * ctot / (_QLM_MU * cf[q]))
                     for q in cf if c[q])
            scores[int(did)] = s1 + 3 * math.log(
                _QLM_MU / (len(ws) + _QLM_MU))
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        vals = [v for _, v in ordered[:12]]
        gaps = [a - b for a, b in zip(vals, vals[1:]) if a != b]
        assert min(gaps) > 1e-9, gaps
        for v in vals:
            frac = abs(v * 10000 - round(v * 10000))
            assert abs(frac - 0.5) > 1e-6, v


def test_mst_oracle_sql_vs_kruskal_random_and_adversarial():
    """The DuckDB MST oracle (_mst_oracle_sql) uses UNROLLED Borůvka
    rounds with pointer-doubling PARTIAL contraction — sound by the
    cut property, but the docstring's argument deserves a from-the-
    definition differential: union-find Kruskal under the identical
    (w, u, v) total order, over (a) seeded random bipartite graphs
    (the production shape), (b) a monotone-increasing-weight CHAIN
    (the deepest pointer forest — every round's local-min groups are
    minimal), and (c) a decreasing-weight chain (instant merges).
    Each case builds a fake lineitem view so the oracle SQL runs
    verbatim."""
    import random as _random

    import duckdb
    import pandas as pd

    from extractor.queries import _mst_oracle_sql

    def kruskal(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for w, u, v in sorted(edges):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
                out.append((u, v, w))
        return sorted(out)

    def run_case(rows):
        # rows: (l_suppkey, l_partkey, l_extendedprice) — may repeat
        # pairs; the oracle takes min(price) per pair like the engine
        con = duckdb.connect()
        con.register("li", pd.DataFrame(
            rows, columns=["l_suppkey", "l_partkey", "l_extendedprice"]))
        con.execute("CREATE VIEW lineitem AS SELECT * FROM li")
        got = sorted((int(u), int(v), float(w)) for u, v, w in
                     con.sql(_mst_oracle_sql()).fetchall())
        best = {}
        for s, p, w in rows:
            k = (-s, p)
            best[k] = min(best.get(k, float("inf")), w)
        exp = sorted((u, v, float(w)) for u, v, w in
                     kruskal([(w, u, v) for (u, v), w in best.items()]))
        assert got == exp, (len(got), len(exp))

    rng = _random.Random(11)
    for trial in range(3):
        rows = [(rng.randrange(1, 40), rng.randrange(1, 120),
                 round(rng.uniform(1, 9999), 2)) for _ in range(600)]
        run_case(rows)

    # (b) increasing-weight chain s1-p1-s2-p2-...: supplier i links
    # part i (w=2i) and part i-1 (w=2i-1) — one long path whose
    # min-edge pointers form the deepest possible monotone forest
    chain = []
    for i in range(1, 120):
        chain.append((i, i, float(2 * i)))
        if i > 1:
            chain.append((i, i - 1, float(2 * i - 1)))
    run_case(chain)
    # (c) decreasing weights along the same path
    run_case([(s, p, 10000.0 - w) for s, p, w in chain])
