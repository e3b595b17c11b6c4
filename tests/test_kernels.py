"""Unit tests per kernel (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

import json

from extractor.core import dedup, html_strip, pdf_layout, refseg
from extractor.core.batch import extract_one
from extractor.core.textnorm import normalize_block, normalize_plain


# --- textnorm (F7) ---------------------------------------------------------

def test_normalize_block_collapses_ws_and_entities():
    assert normalize_block("a &amp;  b\n c\t d") == "a & b c d"
    # double-escaped entities unescape fully
    assert normalize_block("x &amp;amp; y") == "x & y"


def test_normalize_plain_preserves_lines():
    s = "one  line\r\ntwo\n\n\n\nthree"
    assert normalize_plain(s) == "one line\ntwo\n\nthree"


# --- refseg: anchor + markers (F5/F6) -------------------------------------

def test_anchor_detection_variants():
    for a in ["References", "REFERENCES", "Bibliography:", "Works Cited",
              "Literatur", "Literaturverzeichnis", "  references  "]:
        assert refseg.is_anchor_line(a), a
    for a in ["References to prior work", "see bibliography"]:
        assert not refseg.is_anchor_line(a), a


def test_marker_detection():
    assert refseg.is_marker_line("[1] Foo")
    assert refseg.is_marker_line("12. Foo")
    assert not refseg.is_marker_line("1,2 Foo")
    assert not refseg.is_marker_line("Foo [1]")


def test_segment_text_anchor_and_continuation():
    text = "\n".join([
        "Intro prose here.",
        "References",
        "[1] Miller, A. (1999). A title of note. Journal of X, 1(2),",
        "pp. 10-20. Berlin: Springer.",
        "[2] Chen, B. (2001). Another title. Annals, 3(4), pp. 1-9.",
    ])
    refs = refseg.segment_text(text)
    assert len(refs) == 2
    assert refs[0]["detector"] == "anchor"
    assert refs[0]["raw"].endswith("Berlin: Springer.")
    assert refs[0]["line_start"] == 2 and refs[0]["line_end"] == 3


def test_segment_text_min_length_and_validity_filters():
    # P4: <=5 chars dropped; P3: no year/initials -> invalid
    text = "References\n[1] ab\n[2] no year or initials in this line at all"
    assert refseg.segment_text(text) == []


def test_segment_text_marker_run_without_anchor():
    text = "\n".join([
        "Some prose.",
        "1. Miller, A. (1999). First title. Journal, 1(2), pp. 1-2.",
        "2. Chen, B. (2001). Second title. Annals, 3(4), pp. 3-4.",
    ])
    refs = refseg.segment_text(text)
    assert len(refs) == 2
    assert all(r["detector"] == "layout" for r in refs)


def test_parse_fields_canonical():
    f = refseg.parse_fields(
        "[3] Miller, A., Chen, B. (1999). A study of things. "
        "Journal of Data Systems, 12(3), pp. 45-67. Berlin: Springer."
    )
    assert f["authors"] == ["Miller A.", "Chen B."]
    assert f["date"] == "1999"
    assert f["title"] == "A study of things"
    assert f["journal"] == "Journal of Data Systems"
    assert f["volume"] == "12" and f["issue"] == "3"
    assert f["pages"] == "45-67"
    assert f["location"] == "Berlin" and f["publisher"] == "Springer"


# --- dedup (J4/F4) ---------------------------------------------------------

def test_levenshtein_matches_reference_rule():
    assert dedup.levenshtein_banded("kitten", "sitting", 100) == 3
    assert dedup.is_near_dup("a b c d e f", "abcdef")  # space-stripped
    assert not dedup.is_near_dup("completely different", "unrelated string x")


def test_dedup_keeps_first_stable():
    refs = [{"raw": "Miller, A. (1999). Title."},
            {"raw": "Miller, A. (1999) Title"},   # near-dup of first
            {"raw": "Chen, B. (2001). Other."}]
    out = dedup.dedup_refs(refs)
    assert [r["raw"] for r in out] == [refs[0]["raw"], refs[2]["raw"]]


# --- html_strip (X1/X2/A5) -------------------------------------------------

BOILER_PAGE = """
<html><body>
<nav><a href='/a'>home</a> <a href='/b'>about</a> <a href='/c'>contact</a></nav>
<header><div class='ad-banner'><a href='/ad'>click this amazing offer now</a></div></header>
<article>
<h2>Heading</h2>
<p>This is the main content paragraph with plenty of words to satisfy the
word count rules of the boilerpipe classifier used in the engine.</p>
</article>
<aside class='sidebar'><p><a href='/x'>related one</a></p><p><a href='/y'>related two</a></p></aside>
<footer><p><a href='/tos'>terms</a> and conditions apply</p></footer>
</body></html>
"""


def test_boilerplate_stripped():
    res = html_strip.strip_html(BOILER_PAGE)
    t = res["clean_text"]
    assert "main content paragraph" in t
    assert "Heading" in t
    for junk in ("home", "amazing offer", "related one", "terms"):
        assert junk not in t, junk


def test_link_density_rejects_linkfarm():
    page = ("<body><div><p>" + " ".join(
        "<a href='/{0}'>link {0}</a>".format(i) for i in range(30)
    ) + "</p></div></body>")
    assert html_strip.strip_html(page)["clean_text"] == ""


def test_cite_layout_field_mapping():
    h = ("<body><p><cite><span class='cit-auth'>Doe, J.</span> "
         "<span class='cit-pub-date'>1999</span> "
         "<span class='cit-article-title'>Great title</span> "
         "<span class='cit-jnl-abbrev'>J. Data</span> "
         "<span class='cit-vol'>12</span> "
         "<span class='cit-fpage'>1</span> <span class='cit-lpage'>9</span>"
         "</cite></p></body>")
    refs = html_strip.strip_html(h)["refs"]
    assert len(refs) == 1
    f = refs[0]["fields"]
    assert f["authors"] == ["Doe, J."]
    assert f["date"] == "1999" and f["title"] == "Great title"
    assert f["journal"] == "J. Data" and f["volume"] == "12"
    assert f["pages"] == "1-9"


def test_dl_references_excludes_dt_labels():
    h = ("<body><dl class='references'>"
         "<dt>[1]</dt><dd>Miller, A. (1999). Title one. Journal, 1, pp. 1-2.</dd>"
         "<dt>[2]</dt><dd>Chen, B. (2001). Title two. Annals, 2, pp. 3-4.</dd>"
         "</dl></body>")
    refs = html_strip.strip_html(h)["refs"]
    assert [r["raw"][:6] for r in refs] == ["Miller", "Chen, "]


def test_ref_noise_spans_removed():
    h = ("<body><table><tr><td valign='top'>Miller, A. (1999). Title. J, 1, pp. 1-2. "
         "<span class='ref-google'>Google Scholar</span>"
         "<span class='ref-xLink'>CrossRef</span></td></tr></table></body>")
    refs = html_strip.strip_html(h)["refs"]
    assert len(refs) == 1
    assert "Google Scholar" not in refs[0]["raw"]
    assert "CrossRef" not in refs[0]["raw"]


def test_bracket_wrap_strip():
    h = ("<body><div class='media-body reference-contains'>"
         "['Miller, A. (1999). Title. J, 1, pp. 1-2.']</div></body>")
    refs = html_strip.strip_html(h)["refs"]
    assert len(refs) == 1
    assert refs[0]["raw"].startswith("Miller")
    assert not refs[0]["raw"].endswith("']")


def test_malformed_html_no_raise():
    h = "<body><div><p>Miller wrote <b>things <div>more text"
    res = html_strip.strip_html(h)  # must not raise
    assert isinstance(res["clean_text"], str)


def test_ref_spans_index_into_clean_text():
    h = ("<body><h3>References</h3><ol>"
         "<li>Miller, A. (1999). Spanned title. Journal, 1, pp. 1-2.</li>"
         "</ol></body>")
    res = html_strip.strip_html(h)
    r = res["refs"][0]
    assert res["clean_text"][r["span_start"]:r["span_end"]] == r["raw"]


# --- pdf_layout (N1/F1/F2/A1/A3/P5/P6) ------------------------------------

def _payload(glyphs, w=2400, h=3400):  # below the 3500 resize clamp (P9)
    return json.dumps({"pages": [{"w": w, "h": h, "glyphs": glyphs}]})


def _line_glyphs(words, x, y, cw=12):
    out = []
    for w in words:
        out.append({"t": w, "x0": x, "y0": y, "x1": x + cw * len(w), "y1": y + 26})
        x += cw * (len(w) + 1)
    return out


def test_two_column_reading_order():
    g = (_line_glyphs(["left", "one"], 100, 100)
         + _line_glyphs(["left", "two"], 100, 140)
         + _line_glyphs(["right", "one"], 1400, 100)
         + _line_glyphs(["right", "two"], 1400, 140))
    res = pdf_layout.extract_pdf(_payload(g))
    assert res["clean_text"] == "left one\nleft two\nright one\nright two"


def test_single_column_line_order_and_join():
    g = _line_glyphs(["hello", "world"], 100, 100) + _line_glyphs(["second"], 100, 140)
    res = pdf_layout.extract_pdf(_payload(g))
    assert res["clean_text"] == "hello world\nsecond"


def test_dehyphenation_digit_guard():
    # "exam-" + "ple" merges; "1995-" + "2001" does not (digit guard)
    g = (_line_glyphs(["exam-"], 100, 100)
         + _line_glyphs(["ple", "works"], 100, 140)
         + _line_glyphs(["range", "1995-"], 100, 180)
         + _line_glyphs(["2001", "stays"], 100, 220))
    res = pdf_layout.extract_pdf(_payload(g))
    lines = res["clean_text"].split("\n")
    assert lines[0] == "example works"
    assert lines[1] == "range 1995-"
    assert lines[2] == "2001 stays"


def test_pdf_refs_bbox_envelope_and_spans():
    g = (_line_glyphs(["Body", "text", "of", "the", "page"], 100, 100)
         + _line_glyphs(["References"], 100, 160)
         + _line_glyphs(["[1]", "Miller,", "A.", "(1999).", "Title", "here."], 100, 200)
         + _line_glyphs(["Journal,", "1(2),", "pp.", "10-20."], 140, 240))
    res = pdf_layout.extract_pdf(_payload(g))
    assert len(res["refs"]) == 1
    r = res["refs"][0]
    assert r["detector"] == "anchor"
    # continuation line merged into the same citation
    assert "pp. 10-20." in r["raw"]
    # bbox envelope covers both member lines (A1)
    assert r["bbox"][1] == 200 and r["bbox"][3] == 240 + 26
    assert r["line_start"] == 2 and r["line_end"] == 3
    # char span indexes into clean_text
    span_text = res["clean_text"][r["span_start"]:r["span_end"]]
    assert span_text.replace("\n", " ") == r["raw"]


def test_empty_lines_filtered_and_bad_payload_none():
    assert pdf_layout.extract_pdf("not json") is None
    assert pdf_layout.extract_pdf('{"pages": 3}') is None
    res = pdf_layout.extract_pdf(_payload([]))
    assert res["clean_text"] == "" and res["refs"] == []


def test_oversize_canvas_clamp():
    g = _line_glyphs(["big", "canvas"], 1000, 1000)
    res = pdf_layout.extract_pdf(_payload(g, w=7000, h=9000))
    assert "big canvas" in res["clean_text"]
    assert res is not None


# --- batch dispatch (S3) ---------------------------------------------------

def test_dispatch_by_tool():
    clean, refs = extract_one("plain prose only", "")
    assert clean == "plain prose only" and refs == []
    clean, _ = extract_one("<body><p>" + "word " * 20 + "</p></body>", "browser")
    assert clean.startswith("word word")
    clean, _ = extract_one(_payload(_line_glyphs(["pdf", "text"], 10, 10)), "pdf")
    assert clean == "pdf text"


def test_hanging_indent_citation_blocks():
    """N2: markerless, anchorless citation entries detected from the
    hanging-indent geometry alone (detector='layout')."""
    g = (_line_glyphs(["Miller,", "A.", "(1999).", "First", "cited", "work."], 100, 100)
         + _line_glyphs(["Journal", "of", "Things,", "1(2),", "pp.", "10-20."], 160, 140)
         + _line_glyphs(["Chen,", "B.", "(2001).", "Second", "cited", "work."], 100, 180)
         + _line_glyphs(["Annals,", "3(4),", "pp.", "30-40."], 160, 220))
    res = pdf_layout.extract_pdf(_payload(g))
    assert len(res["refs"]) == 2
    assert all(r["detector"] == "layout" for r in res["refs"])
    assert "pp. 10-20." in res["refs"][0]["raw"]
    assert res["refs"][1]["line_start"] == 2


def test_hanging_indent_requires_two_blocks():
    # a single author-start line is prose, not a reference region
    g = (_line_glyphs(["Miller,", "A.", "(1999)", "wrote", "things."], 100, 100)
         + _line_glyphs(["Unrelated", "prose", "follows", "here."], 100, 140))
    res = pdf_layout.extract_pdf(_payload(g))
    assert res["refs"] == []


# -- fast tokenizer vs stdlib HTMLParser differential ----------------------

def _both_parsers(payload):
    try:
        html_strip._use_stdlib_parser = True
        std = html_strip.strip_html(payload)
    finally:
        html_strip._use_stdlib_parser = False
    return html_strip.strip_html(payload), std


def test_fast_tokenizer_matches_stdlib_on_fixture_corpus():
    """The regex tokenizer must be observationally identical to the
    stdlib state machine on every fixture payload (bulk check also run
    offline on 59,921 bench HTML payloads: 0 mismatches)."""
    import pandas as pd
    t1 = pd.read_parquet("tests/goldens/t1_input.parquet")
    for payload in t1["text"].dropna():
        fast, std = _both_parsers(payload)
        assert fast == std


def test_fast_tokenizer_matches_stdlib_on_edges():
    edges = [
        "",                              # empty
        "no tags at all",
        "a &amp; b &lt;c&gt; &#65; &unknown; &",   # entities incl. bogus
        "<p>unclosed <div>nested",
        "</div> stray close",
        "<p class='x' id=\"y\" data-a=b disabled>t</p>",
        "<p class=\"a>b\">quoted gt</p>",          # '>' inside quotes
        "<script>if (a<b && c>d) {x='</div>';}</script><p>after</p>",
        "<style>a>b{color:red}</style><p>css</p>",
        "<script>never closed...",
        "<!-- comment <p>not a tag</p> --><p>real</p>",
        "<!DOCTYPE html><?xml version='1.0'?><p>decls</p>",
        "<br/><hr /><img src=x/><p>voids</p>",
        "<div/>self closing block</div>",
        "1 < 2 and 3 > 2",               # bare angle brackets
        "<p>truncated <span cla",         # EOF inside tag
        "<P CLASS='UP'>case</P>",
        "<td valign=TOP>cell</td>",
        "<ul><li>a<li>b<li>c</ul>",       # unclosed li chain
        "text <3 heart",                  # invalid tag start
        # code-review findings (stdlib-parity pathologies, each once
        # divergent):
        "<h2 id=refs/>References</h2><ol><li>Doe, J. (1999). Methods"
        " of citation analysis. Journal of Data, 12(3), pp. 1-9.</li></ol>",
        '<cite attr=x/>Doe, J. (1999). T. Journal, 1(1), pp. 1-5.</cite>',
        '<script>var s = "</scriptTag>"; rest of script</script><p>a</p>',
        "<script>x</script",               # rawtext EOF without close
        '<div class="x><p>words follow here</p>',  # unclosed value quote
        "<p>a</p><!--foo>mid<p>b</p>",     # unterminated comment w/ '>'
        "<p>a<!-->b</p>",
        "<p a=/>v</p>",                    # '/' as bare value
        "<p a=b/c>t</p>",
        "<v =\">\">",                      # junk '=' attr name + quote
        "<J v =\">",
        '<p a =="x>y">',
    ]
    for payload in edges:
        fast, std = _both_parsers(payload)
        assert fast == std, payload


def test_parse_fields_ieee_style():
    f = refseg.parse_fields(
        'A. Author and B. Writer, "Deep citation parsing at scale," '
        "Journal of Data Systems, vol. 12, no. 3, pp. 41-59, 1999.")
    assert f["authors"] == ["Author A.", "Writer B."]
    assert f["title"] == "Deep citation parsing at scale"
    assert f["journal"] == "Journal of Data Systems"
    assert (f["date"], f["volume"], f["issue"], f["pages"]) == \
        ("1999", "12", "3", "41-59")


def test_parse_fields_apa_ampersand():
    f = refseg.parse_fields(
        "Author, A., & Writer, B. (1999). Deep citation parsing. "
        "Journal of Data, 12(3), 41-59.")
    assert f["authors"] == ["Author A.", "Writer B."]
    assert f["title"] == "Deep citation parsing"
    assert (f["volume"], f["issue"], f["pages"]) == ("12", "3", "41-59")


def test_parse_fields_book_style():
    f = refseg.parse_fields(
        "J. Doe, Understanding layout analysis, 2nd ed. Berlin: Springer, 2010.")
    assert f["authors"] == ["Doe J."]
    assert f["title"] == "Understanding layout analysis"
    assert (f["location"], f["publisher"], f["date"]) == \
        ("Berlin", "Springer", "2010")


def test_pinned_stdlib_divergences_frozen():
    """Known accepted residual divergences between the fast tokenizer
    and stdlib HTMLParser, frozen with BOTH outputs. The class:
    ``<![CDATA[`` followed by ``==`` attr garbage and an
    unclosed-quote chain before ``>`` — stdlib's marked-section
    recovery re-syncs earlier than the fast path, which swallows the
    tail. Any tokenizer edit that CHANGES either side's output on
    these inputs (fixing or widening the divergence set) must fail
    here loudly and re-freeze deliberately. Bulk differential over
    the 59,800 browser payloads of bench_data/transcripts_200000:
    re-run 2026-08-17 after the round-2 edits — 0 mismatches (the
    divergence class needs adversarial CDATA+quote-chain input that
    does not occur in realistic payloads). Re-run 2026-08-21 over a
    FRESH input distribution — 30,203 browser payloads from the
    round-5 chunked-substream gen source (seed 5, 100k turns) —
    0 mismatches again: the new RNG chunking changed the payload
    stream, not the parser-equivalence class."""
    prose = ("Real prose content follows here with many words to pass "
             "the classifier threshold easily.")
    pinned = [
        ('<![CDATA[<p a ==<J v ="><p>' + prose, "", prose),
        ('<![CDATA[<p a ==<J v ="><p>"x>y"', "", '"x>y"'),
        ('<![CDATA[<a b ==<c d ="><p>tail one</p><p>' + prose + "</p>",
         "", "tail one"),
    ]
    for payload, want_fast, want_std in pinned:
        fast, std = _both_parsers(payload)
        assert fast["clean_text"] == want_fast, (payload, fast)
        assert std["clean_text"] == want_std, (payload, std)
        assert fast != std, "divergence silently fixed: " + payload


def test_data_table_content_merged_and_kept():
    """Non-citation tables merge rows/cells into one block so a data
    table classifies on its aggregate content (per-cell micro-blocks
    used to fail every word threshold and the whole table vanished);
    link-farm layout tables still die by link density, and citation
    cells (td[valign=top]) keep their per-cell ref blocks."""
    rows = "".join(
        "<tr><td>Method {i}</td><td>{v}</td><td>{p}%</td></tr>".format(
            i=i, v=80 + i, p=90 - i) for i in range(8))
    doc = ("<html><body><article><h2>Results</h2>"
           "<p>The following table summarizes the accuracy of each method "
           "across the evaluation corpus with additional context.</p>"
           "<table><tr><th>Method</th><th>Score</th><th>Coverage</th></tr>"
           + rows + "</table></article></body></html>")
    out = html_strip.strip_html(doc)["clean_text"]
    assert "Method 3 83 87%" in out
    assert "Method 7 87 83%" in out

    farm = ("<html><body><table><tr>"
            "<td><a href='/a'>Home</a></td><td><a href='/b'>News</a></td>"
            "<td><a href='/c'>Shop</a></td><td><a href='/d'>More</a></td>"
            "</tr></table><p>" + "word " * 45 + "</p></body></html>")
    out = html_strip.strip_html(farm)["clean_text"]
    assert "Home" not in out and "Shop" not in out
    assert out.startswith("word word")


def test_pre_block_keeps_line_structure():
    """<pre> content keeps its newlines through extraction (code and
    console payloads in transcripts lose meaning fully flattened);
    surrounding prose still single-line normalizes."""
    doc = ("<body><article><p>Prose before the snippet with enough words "
           "to be kept by the classifier context rules here.</p>"
           "<pre>line one\n    indented two\nline three</pre>"
           "<p>Prose after the snippet, also carrying plenty of words "
           "for the classifier to keep it in place.</p></article></body>")
    out = html_strip.strip_html(doc)["clean_text"]
    assert "line one\n    indented two\nline three" in out


def test_parse_fields_chicago_style():
    f = refseg.parse_fields(
        "Miller, Anna. 1999. Understanding Layout Analysis. "
        "Berlin: Springer.")
    assert f["authors"] == ["Miller A."]
    assert f["title"] == "Understanding Layout Analysis"
    assert (f["location"], f["publisher"], f["date"]) == \
        ("Berlin", "Springer", "1999")
    assert f["journal"] is None  # "Berlin: Springer" is not a venue


def test_parse_fields_harvard_style():
    f = refseg.parse_fields(
        "Miller, A. 1999, 'Deep citation parsing', Journal of Data "
        "Systems, vol. 12, no. 3, pp. 41-59.")
    assert f["authors"] == ["Miller A."]
    assert f["title"] == "Deep citation parsing"
    assert f["journal"] == "Journal of Data Systems"
    assert (f["volume"], f["issue"], f["pages"]) == ("12", "3", "41-59")


def test_parse_fields_mla_style():
    f = refseg.parse_fields(
        'Miller, Anna. "Deep Citation Parsing." Journal of Data '
        "Systems 12.3 (1999): 41-59.")
    assert f["authors"] == ["Miller A."]
    assert f["title"] == "Deep Citation Parsing"
    assert f["journal"] == "Journal of Data Systems"
    assert (f["date"], f["pages"]) == ("1999", "41-59")


def test_parse_fields_vancouver_style():
    f = refseg.parse_fields(
        "Miller A, Chen B. Deep citation parsing at scale. "
        "J Data Syst. 1999;12(3):41-59.")
    assert f["authors"] == ["Miller A.", "Chen B."]
    assert f["title"] == "Deep citation parsing at scale"
    assert f["journal"] == "J Data Syst"
    assert (f["volume"], f["issue"], f["pages"]) == ("12", "3", "41-59")


def test_parse_fields_apostrophe_surname_not_a_quote():
    """O'Brien's apostrophe must never open a quoted-title span."""
    f = refseg.parse_fields(
        "O'Brien, A. (1999). A study of things. Journal of Data, "
        "12(3), pp. 45-67.")
    assert f["authors"] == ["O'Brien A."]
    assert f["title"] == "A study of things"


def test_nonfinite_glyph_coords_evicted():
    """NaN/inf glyph coordinates are dropped at parse time (P5
    zero-coordinate eviction, extended) instead of flowing into the
    int64 bbox cast with undefined values."""
    payload = json.dumps({"pages": [{"w": 2400, "h": 3400, "glyphs": [
        {"t": "keep", "x0": 100, "y0": 100, "x1": 160, "y1": 120},
        {"t": "me", "x0": 170, "y0": 100, "x1": 210, "y1": 120},
        {"t": "nan", "x0": float("nan"), "y0": 100, "x1": 240, "y1": 120},
        {"t": "inf", "x0": 100, "y0": float("inf"), "x1": 240, "y1": 120},
    ]}]})
    res = pdf_layout.extract_pdf(payload)
    assert res["clean_text"] == "keep me"
    all_nan = json.dumps({"pages": [{"w": 100, "h": 100, "glyphs": [
        {"t": "x", "x0": float("nan"), "y0": float("nan"),
         "x1": float("nan"), "y1": float("nan")}]}]})
    res2 = pdf_layout.extract_pdf(all_nan)
    assert res2["clean_text"] == ""


def test_definition_list_merged_and_kept():
    """Non-citation <dl> merges dt/dd into one block: per-item blocks
    kept the 1-word terms and dropped every definition. dl.references
    still yields per-item ref blocks."""
    doc = ("<body><article><p>" + "word " * 20 + "</p><dl>"
           "<dt>AQE</dt><dd>Adaptive query execution re-plans at "
           "runtime.</dd><dt>LSH</dt><dd>Locality sensitive hashing "
           "buckets near items.</dd></dl></article></body>")
    out = html_strip.strip_html(doc)["clean_text"]
    assert "AQE Adaptive query execution re-plans at runtime." in out
    assert "LSH Locality sensitive hashing buckets near items." in out


def test_malformed_glyph_json_falls_back_to_plain():
    """JSON that parses but is not a glyph table must take the
    documented plain-text fallback, never kill the task (poison-pill
    class: one bad turn would fail the mapInPandas stage on every
    retry)."""
    from extractor.core.batch import extract_one

    for payload in ('{"pages": ["x"]}',
                    '{"pages": [{"glyphs": ["g"]}]}',
                    '{"pages": [{"w": null, "glyphs": '
                    '[{"t":"a","x0":1,"y0":1,"x1":2,"y1":2}]}]}'):
        clean, refs = extract_one(payload, "pdf")
        assert clean  # raw text via the plain path, not a crash


def test_extract_batch_tolerates_nan_nulls():
    """pandas spells nulls as NaN after CSV round-trips: NaN text must
    behave like None (row -> empty) and NaN tool like '' (user JSON is
    content, not a tool payload)."""
    import numpy as np
    import pandas as pd

    from extractor.core.batch import extract_batch

    pdf = pd.DataFrame({
        "conv_id": ["c", "c"], "turn_idx": [0, 1],
        "text": [np.nan, '{"retries": 3, "note": "keep alive"}'],
        "tool": ["", np.nan],
    })
    out = extract_batch(pdf)
    assert out["clean_text"].iloc[0] == ""
    assert "retries" in out["clean_text"].iloc[1]  # NOT json-flattened


def test_unclosed_table_depth_does_not_leak():
    """An unclosed <table> popped implicitly by an ancestor's </div>
    must decrement table_depth: a LATER well-formed table's
    surroundings must not fuse into its block."""
    from extractor.core.html_strip import strip_html

    body = ("This paragraph carries enough narrative words to be kept "
            "as genuine page content by the block classifier. ") * 2
    doc = ("<div><table><tr><td>stranded cell</td></tr></div>"
           "<p>" + body + "</p>"
           "<table><tr><td>second table</td></tr></table>"
           "<p>" + body + "Trailing marker sentence.</p>")
    out = strip_html(doc)["clean_text"]
    assert "Trailing marker sentence." in out
    # the trailing paragraph must be its own block, not fused into the
    # second table's block (the leak fused everything after it)
    assert "second table" not in out.split("Trailing marker sentence.")[0].split("\n")[-1]


def test_dom_numbered_ref_keeps_bracket():
    """A [1]-numbered reference in a DOM list ships raw WITH its
    bracket, matching the pdf/plain paths (the wrap-strip regex is for
    quoted \"['...']\" layout wraps only)."""
    from extractor.core.html_strip import strip_html

    doc = ("<h2>References</h2><ol>"
           "<li>[1] Smith, J. (1999). A study of things. "
           "Journal of Stuff, 4(2), 10-19.</li>"
           "<li>[2] Jones, K. (2001). Another look at stuff. "
           "Review of Items, 7(1), 5-9.</li></ol>")
    refs = strip_html(doc)["refs"]
    assert refs and all(r["raw"].startswith("[") for r in refs)


def test_wrapped_marker_entries_segment_without_anchor():
    """Two-column-PDF shape: every entry wraps onto a continuation
    line; the anchor-less layout detector must still find the run
    (a wrap must not reset the marker-run counter)."""
    from extractor.core.refseg import segment_text

    t = ("[1] Smith, J. (1999). A study of\n"
         "reference wrapping behavior. Journal, 4(2), 1-9.\n"
         "[2] Jones, K. (2001). Wrap handling in two\n"
         "column layouts. Proc. of Things, 8(3), 11-19.")
    refs = segment_text(t)
    assert len(refs) == 2
    assert refs[0]["raw"].endswith("Journal, 4(2), 1-9.")


def test_howto_list_with_year_in_prose_is_not_references():
    """A mid-document numbered step list followed by prose that
    happens to contain a year must yield NO layout refs (strict-
    majority validity gate)."""
    from extractor.core.refseg import segment_text

    t = ("Setup steps:\n1. Install the package\n2. Run the migration "
         "tool\nAfter that, the 2019 release notes describe the "
         "upgrade path in detail, including compatibility holes and "
         "the rollback story for the previous series.")
    assert segment_text(t) == []


def test_html_nonrendered_containers_never_leak():
    """Content of non-rendered containers — <template> (never drawn by
    any browser), <noscript> fallbacks, <svg> label text, <iframe>
    fallback text, and CDATA sections — must not surface in clean_text
    even when they are long enough to pass the density classifier on
    their own; the surrounding real prose must survive. (Adversarial
    probe pinned as a regression: all five held with zero leaks.)"""
    long_p = "<p>" + " ".join(
        "Sentence number {} carries real analytical content for the "
        "reader.".format(i) for i in range(6)) + "</p>"
    junk = {
        "noscript": "<noscript>Enable JS banner junk repeated banner "
                    "junk repeated banner junk repeated</noscript>",
        "svg": "<svg><text>chart label repeated label repeated label "
               "repeated label repeated forever</text></svg>",
        "template": "<template>" + long_p.replace("analytical",
                                                  "TEMPLATEJUNK")
                    + "</template>",
        "iframe": "<iframe src='x'>fallback iframe junk text repeated "
                  "junk text repeated junk</iframe>",
        "cdata": "<![CDATA[ raw cdata payload should never surface in "
                 "clean text output at all ]]>",
    }
    for name, block in junk.items():
        out = html_strip.strip_html(
            "<html><body>" + long_p + block + long_p
            + "</body></html>")["clean_text"]
        assert "analytical content" in out, (name, out)
        for bad in ("banner junk", "chart label", "TEMPLATEJUNK",
                    "iframe junk", "cdata payload", "]]>"):
            assert bad not in out, (name, bad, out)


def test_author_year_entries_split_without_markers():
    """Anchored marker-less author-year bibliographies (APA-style, no
    [n] markers, hanging-indent wraps) must split at column-0
    author-start lines whose previous line closed an entry — and must
    NOT split an entry wrapped mid-author-list (previous line ends
    without terminal punctuation)."""
    from extractor.core.batch import extract_one

    text = ("Body sentence long enough to stand as document prose.\n\n"
            "Bibliography\n"
            "Anderson, T. (2018). Operating systems principles. "
            "Recursive Books,\n"
            "   second edition, chapters 4-9.\n"
            "Brewer, E. A. (2000). Towards robust distributed systems. "
            "In PODC, pages 7-10.\n")
    _, refs = extract_one(text, "")
    raws = [r["raw"] for r in refs]
    assert len(raws) == 2, raws
    assert raws[0].endswith("chapters 4-9.")
    assert raws[1].startswith("Brewer, E. A.")

    wrapped = ("Intro words for this document body here.\n\n"
               "References\n"
               "Aaron, B., Charles, D., and\n"
               "Edwards, F. (1999). One single entry wrapped mid author "
               "list. Journal of Tests, 1(1).\n")
    _, refs2 = extract_one(wrapped, "")
    assert len(refs2) == 1, [r["raw"] for r in refs2]
    assert refs2[0]["raw"].startswith("Aaron, B., Charles, D., and Edwards")


# ---------------------------------------------------------------------------
# Content-defined chunking kernel (extractor/core/cdc_chunk.py)
# ---------------------------------------------------------------------------

def test_cdc_chunk_differential_and_bounds():
    """Vectorized sliding-window chunker equals the from-the-definition
    per-byte loop on random, low-entropy, and boundary-length inputs;
    spans exactly cover the input; every non-final chunk respects the
    [MIN, MAX] bounds (the final one may undershoot MIN by design)."""
    import random

    from extractor.core.cdc_chunk import (MAX_CHUNK, MIN_CHUNK,
                                          chunk_spans, chunk_spans_naive)

    rng = random.Random(7)
    sizes = [0, 1, 15, 16, 17, 31, 32, 100, 200, 1000, 3000]
    words = "key agg row scan slow fast table value part hash".split()
    cases = [bytes(rng.randrange(256) for _ in range(n)) for n in sizes]
    cases += [(" ".join(rng.choice(words) for _ in range(k))).encode()
              for k in (0, 5, 50, 300)]
    for data in cases:
        a = chunk_spans(data)
        assert a == chunk_spans_naive(data), len(data)
        pos = 0
        for i, (s, ln) in enumerate(a):
            assert s == pos and ln > 0
            pos += ln
            if i < len(a) - 1:
                assert MIN_CHUNK <= ln <= MAX_CHUNK, (i, ln)
            else:
                assert ln <= MAX_CHUNK
        assert pos == len(data)


def test_cdc_chunk_resync_after_edit():
    """THE content-defined property: a 1-byte prefix insertion leaves
    >= 80% of chunk contents identical (boundaries re-synchronize
    within one hash window). Fixed-size chunking would share ~0% —
    every boundary shifts. Also: a shared suffix between two
    different documents yields shared chunk hashes (cross-doc run
    detection, what the Spark op aggregates)."""
    import random

    from extractor.core.cdc_chunk import chunk_spans

    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(1200))
    edited = b"X" + data
    h1 = {data[s:s + l] for s, l in chunk_spans(data)}
    h2 = {edited[s:s + l] for s, l in chunk_spans(edited)}
    assert len(h1 & h2) / len(h1) >= 0.8, sorted(len(c) for c in h1)

    shared_run = bytes(rng.randrange(256) for _ in range(400))
    doc_a = bytes(rng.randrange(256) for _ in range(300)) + shared_run
    doc_b = bytes(rng.randrange(256) for _ in range(500)) + shared_run
    ca = {doc_a[s:s + l] for s, l in chunk_spans(doc_a)}
    cb = {doc_b[s:s + l] for s, l in chunk_spans(doc_b)}
    assert len(ca & cb) >= 5, (len(ca), len(cb), len(ca & cb))


def test_cdc_chunk_batch_equals_per_doc():
    """chunk_spans_batch (one rolling-hash pass over the concatenated
    Arrow batch) must equal per-doc chunk_spans exactly — including
    empty docs, docs shorter than the window, and windows that
    straddle document boundaries in the concatenated buffer (those
    must be discarded, never attributed to either neighbor)."""
    import random

    from extractor.core.cdc_chunk import (chunk_frame, chunk_spans,
                                          chunk_spans_batch, chunk_table)

    rng = random.Random(13)
    datas = [bytes(rng.randrange(256) for _ in range(n))
             for n in (0, 1, 7, 15, 16, 17, 31, 64, 200, 500, 1000)] * 3
    for d, got in zip(datas, chunk_spans_batch(datas)):
        assert got == chunk_spans(d), len(d)

    texts = ["".join(chr(97 + rng.randrange(26)) for _ in range(ln))
             for ln in (0, 5, 40, 300, 800)]
    f = chunk_frame(list(range(len(texts))), texts)
    rows = []
    for i, t in enumerate(texts):
        rows.extend(chunk_table(i, t))
    assert len(rows) == len(f["h"])
    for i, r in enumerate(rows):
        assert (r["doc_id"], r["chunk_idx"], r["start"], r["length"],
                r["h"]) == (f["doc_id"][i], f["chunk_idx"][i],
                            f["start"][i], f["length"][i], f["h"][i])


def test_jaro_winkler_micro_conventions():
    """The kernel's three reverse-engineered DuckDB/RapidFuzz
    conventions, pinned: (1) floored half-transpositions (x=3 ->
    t=1 on the 'acedd' case: 637878, not the classic-x/2
    596212); (2) INCLUSIVE 0.7 boost threshold (jaro exactly 0.7
    with prefix 1 boosts to 730000); (3) both-empty -> 0. Plus
    the exact-rational showcase: dwayne/duane = 840000 EXACTLY
    (a float path dithers one ulp around 0.84)."""
    from extractor.core.dedup import jaro_winkler_micro as jw

    assert jw("acedd", "adceeceaa b") == 637878
    assert jw("a", "a ea fcbdd") == 730000
    assert jw("", "") == 0
    assert jw("", "abc") == 0
    assert jw("dwayne", "duane") == 840000
    assert jw("martha", "marhta") == 961111
    assert jw("abcdzzzzzz", "abcdyyyyyy") == 600000  # below 0.7: no boost
    assert jw("abc", "abc") == 1000000


def test_jaro_winkler_micro_fuzz_vs_duckdb():
    """Differential lock: 4k random pairs (fixed seed) must match
    DuckDB's jaro_winkler_similarity under the nudged micro floor
    bit for bit — the gate that caught both the transposition
    floor and the inclusive boost threshold during development."""
    import math
    import random

    import duckdb

    from extractor.core.dedup import jaro_winkler_micro as jw

    con = duckdb.connect()
    random.seed(7)
    for _ in range(4000):
        a = "".join(random.choice("abcdef ")
                    for _ in range(random.randint(0, 14)))
        b = "".join(random.choice("abcdef ")
                    for _ in range(random.randint(0, 14)))
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jw(a, b) == math.floor(d * 1000000 + 1e-8), (a, b)
