"""Property-based tests (SURVEY.md §5.2 item 3) — hypothesis over the
pure kernels: normalization idempotency, dedup symmetry/metric
properties, segmentation determinism, layout order-stability."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from extractor.core import dedup, pdf_layout, refseg
from extractor.core.batch import extract_one
from extractor.core.textnorm import normalize_block, normalize_plain

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_plain_idempotent(s):
    once = normalize_plain(s)
    assert normalize_plain(once) == once


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_block_single_line(s):
    out = normalize_block(s)
    assert "\n" not in out and "\t" not in out
    assert out == out.strip()


@given(st.text(max_size=80), st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_levenshtein_symmetric_and_bounded(a, b):
    k = 10
    d_ab = dedup.levenshtein_banded(a, b, k)
    d_ba = dedup.levenshtein_banded(b, a, k)
    assert d_ab == d_ba
    assert 0 <= d_ab <= k
    assert dedup.levenshtein_banded(a, a, k) == 0


@given(st.text(max_size=60), st.text(max_size=60), st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_levenshtein_triangle_under_cutoff(a, b, c):
    # if both legs are exact (< cutoff), the direct distance can't
    # exceed their sum (triangle inequality survives banding)
    big = 200
    ab = dedup.levenshtein_banded(a, b, big)
    bc = dedup.levenshtein_banded(b, c, big)
    ac = dedup.levenshtein_banded(a, c, big)
    if ab < big and bc < big and ac < big:
        assert ac <= ab + bc


@given(st.lists(st.text(min_size=1, max_size=120), max_size=8))
@settings(max_examples=100, deadline=None)
def test_dedup_idempotent_and_order_stable(raws):
    refs = [{"raw": r} for r in raws]
    once = dedup.dedup_refs(refs)
    twice = dedup.dedup_refs(once)
    assert once == twice
    # survivors appear in first-seen order
    idx = [raws.index(r["raw"]) for r in once]
    assert idx == sorted(idx)


@given(TEXT, st.sampled_from(["", "browser", "pdf", "search"]))
@settings(max_examples=150, deadline=None)
def test_extract_one_total_and_deterministic(s, tool):
    """Extraction never raises on arbitrary input and is a pure
    function (determinism under parallel re-execution, §7.4 risk 2)."""
    c1, r1 = extract_one(s, tool)
    c2, r2 = extract_one(s, tool)
    assert c1 == c2 and r1 == r2
    for r in r1:
        assert len(r["raw"].strip()) > refseg.MIN_REF_LEN
        assert r["span_start"] <= r["span_end"]


@given(st.lists(
    st.tuples(st.integers(0, 2000), st.integers(0, 2800),
              st.text(alphabet="abcdefg", min_size=1, max_size=8)),
    min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_pdf_layout_total_and_shuffle_invariant(glyphs):
    """Glyph input order must not affect the reconstructed text
    (order-stability of the clustering sorts, §7.4 risk 2)."""
    def payload(gs):
        return json.dumps({"pages": [{"w": 2400, "h": 3200, "glyphs": [
            {"t": t, "x0": x, "y0": y, "x1": x + 10 * len(t), "y1": y + 24}
            for x, y, t in gs]}]})

    a = pdf_layout.extract_pdf(payload(glyphs))
    b = pdf_layout.extract_pdf(payload(list(reversed(glyphs))))
    assert a["clean_text"] == b["clean_text"]


# -- fast HTML tokenizer vs stdlib: randomized differential ----------------

_HTMLISH_PIECES = st.one_of(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    st.sampled_from([
        "<p>", "</p>", "<div class='a b'>", "</div>", "<a href=x>", "</a>",
        "<cite>", "</cite>", "<li>", "<br>", "<br/>", "<script>", "</script>",
        "<style>", "</style>", "<!-- c -->", "<!doctype html>", "<?pi?>",
        "&amp;", "&lt;", "&#65;", "&bogus;", "&", "<", ">", "'", '"',
        "<td valign=top>", "</td>", "<span class=\"cit-auth\">", "</span>",
        "<ul>", "</ul>", "<h2>References</h2>", "[1] ", "(1999). ",
        "<p", "</", "<>", "< p>", "<3", "=x", "/>", "</ p>", "</>", "</x",
        "</tag attr>", "<![CDATA[x]]>", "<EM>", "</EM>", "<p/>", "<a/>",
        "<input type=text>", "abc", "\t",
    ]),
)


@given(st.lists(_HTMLISH_PIECES, max_size=40).map("".join))
@settings(max_examples=300, deadline=None)
def test_fast_tokenizer_differential_random(doc):
    from extractor.core import html_strip

    try:
        html_strip._use_stdlib_parser = True
        std = html_strip.strip_html(doc)
    finally:
        html_strip._use_stdlib_parser = False
    assert html_strip.strip_html(doc) == std


# -- transcript-native normalization properties ----------------------------

@given(st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=30),
    min_size=0, max_size=60).map(" ".join))
@settings(max_examples=200, deadline=None)
def test_strip_base64_is_identity_on_short_token_text(text):
    """Texts whose tokens are all < 60 chars contain no base64 blob by
    definition — the stripper must be the identity on them."""
    from extractor.core.textnorm import strip_base64_blobs

    assert strip_base64_blobs(text) == text


def test_flatten_tool_json_survives_pathological_nesting():
    """A hostile payload nested past the json recursion limit must
    fall back to None (plain path), never crash the worker; and a
    wide-but-shallow document flattens fine."""
    from extractor.core.batch import _flatten_tool_json

    assert _flatten_tool_json("[" * 100_000 + "]" * 100_000) is None
    wide = "[" + ",".join('"w%d"' % i for i in range(50_000)) + "]"
    out = _flatten_tool_json(wide)
    assert out is not None and out.count("\n") == 49_999


def test_user_pasted_json_is_content_not_payload():
    """The JSON flattener is scoped to TOOL-emitted payloads: a user
    turn (tool='') whose text is pasted JSON must pass through the
    plain-text path intact (keys and numeric leaves preserved), while
    the same text under a tool name is flattened to string leaves."""
    from extractor.core.batch import extract_one

    pasted = '{"retries": 3, "timeout_ms": 5000, "note": "keep alive"}'
    clean_user, _ = extract_one(pasted, "")
    assert "retries" in clean_user and "5000" in clean_user
    clean_tool, _ = extract_one(pasted, "api")
    assert clean_tool == "keep alive"


def test_truncation_repair_spares_unspaced_math_prose():
    """The pre-pass drops genuinely cut-off tags but must not eat a
    sentence tail after unspaced math like 'n<m for the bound'."""
    from extractor.core.html_strip import strip_html

    body = ("The convergence argument proceeds in three steps and "
            "relies on the usual compactness machinery of the proof. ")
    # (in a WELL-FORMED doc "<m ..." is a real tag open that swallows
    # to the next '>' in both tokenizers — spec behavior, parity-
    # locked, not the pre-pass's business. The pre-pass only touches
    # the no-later-'>' tail, where both tokenizers would surface the
    # text as literal data — so it must spare prose there.)
    cut_prose = "<p>" + body * 3 + "we require n<m for the bound to hold"
    assert "bound to hold" in strip_html(cut_prose)["clean_text"]
    # genuinely truncated tags still get repaired
    for tail in ("<div cla", "<img src=\"par", "<a href='x", "</p", "<b"):
        doc = "<p>" + body * 3 + "kept sentence.</p>" + tail
        out = strip_html(doc)["clean_text"]
        assert "kept sentence." in out
        assert "cla" not in out.split("kept sentence.")[-1]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(
    alphabet=st.sampled_from(list(
        "abDJS .,()[]0123456789\t-:;'\"\n")), max_size=60), max_size=25))
def test_segment_text_never_raises_and_spans_bounded(lines):
    """Fuzz the rewritten anchor-less layout path: segment_text must
    never raise, and every candidate's line span must lie inside the
    document with start <= end and a marker-led first line."""
    from extractor.core.refseg import is_marker_line, segment_text

    text = "\n".join(lines)
    out = segment_text(text)
    doc_lines = text.split("\n")
    for c in out:
        assert 0 <= c["line_start"] <= c["line_end"] < len(doc_lines)
        if c["detector"] == "layout":
            assert is_marker_line(doc_lines[c["line_start"]])


def test_window_mass_conservation(spark):
    """Conservation laws the window operators must satisfy on ANY
    input: sliding 10/5-min windows count every event exactly twice
    (size/slide = 2 windows each); native sessions partition the
    events (counts sum to the total); the cube's gid=0 cells sum to
    the gid=3 grand total."""
    from extractor.queries import (a8_cube_doc_counts,
                                   session_window_native,
                                   w7_sliding_window_counts)

    sf = "/root/testdata/sf0.001"
    n_events = spark.read.parquet(sf + "/events.parquet").count()
    w7 = w7_sliding_window_counts(spark, sf).agg(
        {"n": "sum"}).first()[0]
    assert w7 == 2 * n_events
    sess = session_window_native(spark, sf).agg({"n": "sum"}).first()[0]
    assert sess == n_events
    cube = {r["gid"]: r for r in a8_cube_doc_counts(spark, sf)
            .groupBy("gid").agg({"n_docs": "sum"})
            .withColumnRenamed("sum(n_docs)", "s").collect()}
    n_docs = spark.read.parquet(sf + "/documents.parquet").count()
    assert all(cube[g]["s"] == n_docs for g in (0, 1, 2, 3))


def test_semdedup_salted_equals_plain_on_random_corpora(spark, tmp_path):
    """The salted scale path must return EXACTLY the plain variant's
    survivors on arbitrary inputs, not just the drill fixture — three
    seeded random corpora with varied cluster counts and planted
    near-dups (salting changes join geometry only; any divergence is
    a pair met twice or missed)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from extractor.queries import semdedup_prune, semdedup_prune_salted

    for seed, n, k in ((1, 300, 3), (2, 500, 1), (3, 400, 11)):
        rng = np.random.default_rng(seed)
        V = rng.standard_normal((n, 6))
        for i in range(5 + k, n, 37):  # planted near-parallel pairs —
            # copied from i-k so the pair shares label (i % k)
            V[i] = V[i - k] * (1 + 0.001 * i)
        d = tmp_path / ("c%d" % seed)
        d.mkdir()
        pq.write_table(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in V],
                                  pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % k).astype("int32"),
                              pa.int32()),
        }), os.path.join(str(d), "embeddings.parquet"))
        plain = {r["vec_id"] for r in semdedup_prune(spark, str(d)).collect()}
        salted = {r["vec_id"]
                  for r in semdedup_prune_salted(spark, str(d)).collect()}
        assert plain == salted, (seed, len(plain), len(salted),
                                 sorted(plain ^ salted)[:5])
        assert len(plain) < n  # the planted pairs pruned something


class _FakeState:
    """Minimal GroupState stand-in for driving _ewma_group directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False,
                          width=64),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=60, deadline=None)
def test_stream_ewma_kernel_split_invariant(values, n_splits):
    """_ewma_group property: chaining the kernel over ANY micro-batch
    split of a value sequence is BIT-equal per event to a from-the-
    definition per-event loop over the whole sequence (seed at the
    window's oldest value, s <- s*0.75 + x*0.25 left fold) — the
    batch-boundary state carry loses nothing, regardless of where
    the boundaries fall."""
    import numpy as np
    import pandas as pd

    from extractor.queries import _EWMA_ALPHA, _EWMA_WIN
    from extractor.streaming import _ewma_group

    # reference: per-event fold over the trailing window
    ref = []
    for i in range(len(values)):
        win = values[max(0, i - _EWMA_WIN + 1): i + 1]
        s = win[0]
        for x in win[1:]:
            s = s * (1 - _EWMA_ALPHA) + x * _EWMA_ALPHA
        ref.append(s)

    # kernel: split into n_splits contiguous micro-batches
    state = _FakeState()
    got = {}
    bounds = sorted({round(len(values) * k / n_splits)
                     for k in range(n_splits + 1)})
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        pdf = pd.DataFrame({
            "event_id": np.arange(lo, hi, dtype=np.int64),
            "us": np.arange(lo, hi, dtype=np.int64),
            "value": np.asarray(values[lo:hi], dtype=np.float64)})
        for out in _ewma_group(("u",), iter([pdf]), state):
            for eid, v in zip(out["event_id"], out["ewma"]):
                got[int(eid)] = float(v)
    assert len(got) == len(values)
    ref_a = np.asarray(ref)
    got_a = np.asarray([got[i] for i in range(len(values))])
    assert (ref_a.view(np.int64) == got_a.view(np.int64)).all()


@given(st.text(alphabet="SVCPE", min_size=1, max_size=80),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=120, deadline=None)
def test_stream_cep_kernel_split_invariant(seq, n_splits):
    """_cep_group property: chaining the O(1)-state CEP kernel over
    ANY contiguous micro-batch split of an event sequence must equal
    one re.finditer over the WHOLE sequence — n_matches, first_pos
    (1-based start of the leftmost match), and seq_len. This pins the
    virtual-'S' run re-materialization and the rightmost-S end-state
    rule against the regex semantics they claim to implement."""
    import re

    import pandas as pd

    from extractor.streaming import _cep_group

    ty = {"S": "signup", "V": "view", "C": "click", "P": "purchase",
          "E": "error"}
    ms = list(re.finditer("S[VC]*P", seq))
    want = (len(seq), len(ms), ms[0].start() + 1 if ms else 0)

    class _St:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    state = _St()
    bounds = sorted({round(len(seq) * k / n_splits)
                     for k in range(n_splits + 1)})
    last = None
    for lo, hi in zip(bounds, bounds[1:]):
        if lo == hi:
            continue
        pdf = pd.DataFrame({
            "event_id": list(range(lo, hi)),
            "us": list(range(lo, hi)),
            "event_type": [ty[c] for c in seq[lo:hi]]})
        for out in _cep_group((1,), iter([pdf]), state):
            last = out.iloc[0]
    got = (int(last.seq_len), int(last.n_matches), int(last.first_pos))
    assert got == want, (seq, n_splits, got, want)


@settings(max_examples=200, deadline=None)
@given(
    n_turns=st.integers(min_value=0, max_value=200_000),
    n_parts=st.integers(min_value=1, max_value=64),
    chunk_turns=st.integers(min_value=1, max_value=8192),
    hot_frac=st.floats(min_value=0.0, max_value=0.9,
                       allow_nan=False, allow_infinity=False),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gen_planner_tiles_exactly(n_turns, n_parts, chunk_turns,
                                   hot_frac, seed):
    """The chunked planner's tiling invariants, over random configs
    (round-5 property gate for the hot-conversation split): the
    emitted partitions cover every conversation index exactly once;
    single-conversation slices appear only for the hot conversation,
    start chunk-aligned, tile [0, hot_size) with no gap or overlap;
    and no partition is empty by construction (except the explicit
    n_convs=0 sentinel)."""
    from extractor.gen_source import _conv_size, _GenReader

    r = _GenReader({"n_turns": str(n_turns), "numPartitions": str(n_parts),
                    "chunk_turns": str(chunk_turns),
                    "hot_frac": repr(hot_frac), "seed": str(seed)})
    parts = r.partitions()
    if r.n_convs <= 0:
        assert len(parts) == 1 and parts[0].ci_lo == parts[0].ci_hi == 0
        return
    hot_size = _conv_size(seed, 0, r.n_turns, hot_frac)
    sliced = [p for p in parts if p.turn_lo is not None]
    ranged = [p for p in parts if p.turn_lo is None]
    # slices: hot conversation only, chunk-aligned, exact tiling
    assert all(p.ci_lo == 0 and p.ci_hi == 1 for p in sliced)
    assert all(p.turn_lo % chunk_turns == 0 for p in sliced)
    spans = sorted((p.turn_lo, p.turn_hi) for p in sliced)
    assert spans and spans[0][0] == 0 and spans[-1][1] == hot_size
    assert all(a < b for a, b in spans)
    assert all(b == c for (_, b), (c, _) in zip(spans, spans[1:]))
    # conversation ranges: [1, n_convs) covered exactly once
    ivals = sorted((p.ci_lo, p.ci_hi) for p in ranged)
    if r.n_convs > 1:
        assert ivals and ivals[0][0] == 1 and ivals[-1][1] == r.n_convs
        assert all(a < b for a, b in ivals)
        assert all(b == c for (_, b), (c, _) in zip(ivals, ivals[1:]))
    else:
        assert not ivals


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    color=st.sampled_from([0, 2, 4, 6]),
    filters=st.lists(st.integers(min_value=0, max_value=4),
                     min_size=1, max_size=5),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_decode_roundtrip_property(h, w, color, filters, seed):
    """Hypothesis breadth for the pure-Python PNG decoder: random
    dims x color types x per-row filter sequences x pixel content
    must round-trip bit-exact through the independent spec-forward
    encoder (tests/test_extras helpers). Complements the hand-pinned
    filter fixtures with the shape space (1-pixel rows, single
    columns, all-filter mixes) a generator would take days to cover
    one case at a time."""
    import numpy as np

    from extractor.multimodal import decode_image, probe_image_dims
    from tests.test_extras import _png_encode

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    rng = np.random.RandomState(seed % (2**32 - 1))
    arr = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    png, orig = _png_encode(arr, color, filters=filters)
    d = decode_image(png)
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert (d["pixels"] == orig).all()
    assert probe_image_dims(png) == ("png", w, h)
