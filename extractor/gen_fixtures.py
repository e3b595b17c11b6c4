"""Deterministic synthetic transcripts (FIXTURES.md §1).

Seeded ``random.Random`` only — same seed, same table, independent of
process or platform. Payload mix per FIXTURES.md §4: ~50% plain (half
with reference sections), ~30% HTML (all 5 reference layouts from
``LOCDB-V3/xmlProcessing.py:185-264`` represented, plus boilerplate and
one malformed-markup variant), ~20% pdf_glyphs (1/2/3 columns,
hyphen-broken lines incl. the digit-guard case of
``LOCDB-V3/imgProcessing.py:498-507``, trailing reference blocks).
Includes one hot conversation holding ~30% of turns (skew fixture,
the ``MAX_PROCESSES=1`` failure mode of the reference).
"""

from __future__ import annotations

import datetime as dt
import json
import random

import pandas as pd

_WORDS = (
    "analysis batch citation column corpus data density detector engine "
    "extraction feature glyph heuristic index join kernel layout line "
    "metric model offset order output page parser partition payload plan "
    "query record region result schema section segment shuffle source "
    "span stage string table text token transform turn value vector window"
).split()

_SURNAMES = ("Miller Schmidt Tanaka Rossi Dubois Novak Silva Kumar Chen "
             "Olsen Weber Fischer Moreau Costa Haas Berg Laine Petrov").split()
_JOURNALS = (
    "Journal of Data Systems", "Transactions on Extraction",
    "Annals of Layout Analysis", "Computing Surveys",
    "Proceedings of Document Engineering",
)
_CITIES = ("Berlin", "Boston", "Tokyo", "Lyon", "Oslo", "Madrid")
_PUBS = ("Springer", "Elsevier", "ACM Press", "Wiley", "MIT Press")

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)


def _para(rng: random.Random, lo: int = 20, hi: int = 45) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def make_citation(rng: random.Random, k: int | None = None) -> str:
    n_auth = rng.randint(1, 3)
    auths = ", ".join(
        "{}, {}.".format(rng.choice(_SURNAMES), chr(ord("A") + rng.randrange(26)))
        for _ in range(n_auth)
    )
    year = rng.randint(1970, 2024)
    title = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 8))).capitalize()
    vol, iss = rng.randint(1, 60), rng.randint(1, 12)
    p1 = rng.randint(1, 400)
    p2 = p1 + rng.randint(2, 40)
    city, pub = rng.choice(_CITIES), rng.choice(_PUBS)
    return (
        "{} ({}). {}. {}, {}({}), pp. {}-{}. {}: {}.".format(
            auths, year, title, rng.choice(_JOURNALS), vol, iss, p1, p2, city, pub
        )
    )


def make_plain(rng: random.Random, with_refs: bool) -> str:
    parts = [_para(rng) for _ in range(rng.randint(1, 4))]
    if with_refs:
        anchor = rng.choice(
            ["References", "REFERENCES", "Bibliography", "Works Cited", "Literatur"]
        )
        parts.append("")
        parts.append(anchor)
        marker_style = rng.choice(["[{}]", "{}."])
        for i in range(rng.randint(2, 6)):
            parts.append("{} {}".format(marker_style.format(i + 1), make_citation(rng)))
    return "\n".join(parts)


# --------------------------------------------------------------------------
# HTML payloads — the 5 reference layouts + boilerplate + malformed
# --------------------------------------------------------------------------

def _boiler(rng: random.Random) -> tuple[str, str]:
    nav = ("<nav><ul>" + "".join(
        "<li><a href='/x{0}'>menu item {0}</a></li>".format(i) for i in range(5)
    ) + "</ul></nav>")
    header = "<header><h1>Site Banner</h1><div class='ad-banner'><a href='/ad'>buy now cheap deals</a></div></header>"
    sidebar = ("<aside class='sidebar'>" + "".join(
        "<p><a href='/r{0}'>related link {0}</a></p>".format(i) for i in range(4)
    ) + "</aside>")
    footer = "<footer><p><a href='/tos'>terms</a> <a href='/priv'>privacy</a> copyright notice</p></footer>"
    return nav + header + sidebar, footer


def _cites_layout_a(rng, cites):
    out = []
    for c in cites:
        year = c["year"]
        out.append(
            "<p>As discussed in prior work <cite>"
            "<span class='cit-auth'>{a}</span> "
            "<span class='cit-pub-date'>{y}</span> "
            "<span class='cit-article-title'>{t}</span> "
            "<span class='cit-jnl-abbrev'>{j}</span> "
            "<span class='cit-vol'>{v}</span> "
            "pp. <span class='cit-fpage'>{p1}</span>-<span class='cit-lpage'>{p2}</span> "
            "<span class='cit-publ-loc'>{loc}</span> <span class='cit-publ-name'>{pub}</span>"
            "</cite></p>".format(
                a=c["auth"], y=year, t=c["title"], j=c["journal"], v=c["vol"],
                p1=c["p1"], p2=c["p2"], loc=c["loc"], pub=c["pub"])
        )
    return "".join(out)


def _cite_parts(rng) -> dict:
    return {
        "auth": "{}, {}.".format(rng.choice(_SURNAMES), chr(ord("A") + rng.randrange(26))),
        "year": rng.randint(1970, 2024),
        "title": " ".join(rng.choice(_WORDS) for _ in range(5)).capitalize(),
        "journal": rng.choice(_JOURNALS),
        "vol": rng.randint(1, 60),
        "p1": rng.randint(1, 300),
        "p2": rng.randint(301, 400),
        "loc": rng.choice(_CITIES),
        "pub": rng.choice(_PUBS),
    }


def _cite_str(c: dict) -> str:
    return "{} ({}). {}. {}, {}, pp. {}-{}. {}: {}.".format(
        c["auth"], c["year"], c["title"], c["journal"], c["vol"],
        c["p1"], c["p2"], c["loc"], c["pub"])


def make_html(rng: random.Random, layout: int) -> str:
    pre, post = _boiler(rng)
    body = ["<article>", "<h2>Main Findings</h2>"]
    for _ in range(rng.randint(2, 4)):
        body.append("<p>{}</p>".format(_para(rng)))
    cites = [_cite_parts(rng) for _ in range(rng.randint(2, 5))]

    if layout == 0:  # (a) <cite> with cit-* fields
        body.append(_cites_layout_a(rng, cites))
    elif layout == 1:  # (b) dl.references
        body.append("<h3>References</h3><dl class='references'>")
        for i, c in enumerate(cites):
            body.append("<dt>[{}]</dt><dd>{}</dd>".format(i + 1, _cite_str(c)))
        body.append("</dl>")
    elif layout == 2:  # (c) div.pll > div.media-body…reference-contains
        body.append("<div class='pll'>")
        for c in cites:
            body.append(
                "<div class='media-body mls plxl reference-contains'>['{}']</div>".format(
                    _cite_str(c))
            )
        body.append("</div>")
    elif layout == 3:  # (d) div.content > div.CitationContent
        body.append("<div class='content'>")
        for i, c in enumerate(cites):
            body.append(
                "<div class='CitationContent'><span>{}.</span> {}</div>".format(
                    i + 1, _cite_str(c))
            )
        body.append("</div>")
    elif layout == 4:  # (e) td[valign=top] with ref-google/ref-xLink noise
        body.append("<table>")
        for c in cites:
            body.append(
                "<tr><td valign='top'>{} <span class='ref-google'>Google Scholar</span>"
                "<span class='ref-xLink'>CrossRef</span></td></tr>".format(_cite_str(c))
            )
        body.append("</table>")
    else:  # 5: heading + ol list, malformed markup (unclosed tags)
        body.append("<h3>Bibliography</h3><ol>")
        for c in cites:
            body.append("<li>{}".format(_cite_str(c)))  # unclosed <li>
        body.append("</ol><div><p>{}".format(_para(rng)))  # unclosed div/p

    body.append("</article>")
    return "<html><body>{}{}{}</body></html>".format(pre, "".join(body), post)


# --------------------------------------------------------------------------
# adversarial real-world-shaped HTML (deterministic, no RNG) — frozen
# as the t2 golden set. Each case stresses a classifier/tokenizer
# dimension the synthetic make_html corpus does not: legacy nested
# layout tables, RTL/bidi text, fully minified single-line pages,
# pathological nesting depth, spaceless CJK prose, and entity soup.
# --------------------------------------------------------------------------

_ADV_PROSE = (
    "Layout analysis of scholarly documents remains difficult because "
    "publishers embed the primary narrative inside presentation markup "
    "that carries no semantic hints. A robust extractor must therefore "
    "rely on text density and link density rather than tag vocabulary, "
    "and it must keep working when the markup is minified, nested, or "
    "written right to left.")

_ADV_ARABIC = (
    "تحليل النصوص "
    "العلمية يتطلب "
    "استخراج المحتوى "
    "الرئيسي من صفحات "
    "الويب بدقة عالية "
    "دون فقدان السياق "
    "اللغوي أو اتجاه "
    "الكتابة الأصلي.")

_ADV_CJK = (
    "学術文書のレイアウト解析"
    "は、出版社が意味的な手が"
    "かりのない表示用マークア"
    "ップの中に本文を埋め込む"
    "ため、依然として困難であ"
    "る。堅牢な抽出器はタグの"
    "語彙ではなく文字密度に依"
    "拠しなければならない。")

_ADV_NAV = ("<div class='nav'><a href='/'>Home</a> <a href='/a'>Archive</a> "
            "<a href='/b'>About</a> <a href='/c'>Contact</a> "
            "<a href='/d'>Subscribe</a></div>")
_ADV_FOOT = ("<div class='footer'><a href='/terms'>Terms</a> "
             "<a href='/privacy'>Privacy</a> Copyright 1999 Example Press. "
             "<a href='/sitemap'>Sitemap</a></div>")


def make_adversarial_docs() -> list[tuple[str, str]]:
    """Deterministic (name, html) pairs for the t2 adversarial golden
    set (VERDICT round-1 item 10: real-world-shaped markup beyond the
    synthetic fixture generator)."""
    p = _ADV_PROSE
    docs: list[tuple[str, str]] = []

    # 1990s portal: three levels of layout tables; content buried in
    # the innermost cell, nav/footer link farms in sibling cells
    nested_tables = (
        "<html><body><table width='100%'><tr><td width='20%'>" + _ADV_NAV +
        "</td><td><table border='0'><tr><td bgcolor='#ffffff'>"
        "<table cellpadding='4'><tr><td><h2>Digitization Report</h2>"
        "<p>" + p + "</p><p>" + p + "</p></td></tr></table>"
        "</td></tr></table></td></tr><tr><td colspan='2'>" + _ADV_FOOT +
        "</td></tr></table></body></html>")
    docs.append(("nested_tables", nested_tables))

    # RTL page: dir=rtl, Arabic prose with bidi marks, LTR citation
    # embedded via <bdo>; boilerplate stays LTR
    rtl = (
        "<html dir='rtl'><body>" + _ADV_NAV +
        "<article><h2>ملخص</h2>"
        "<p>" + _ADV_ARABIC + "‏ " + _ADV_ARABIC + "</p>"
        "<p><bdo dir='ltr'>Doe, J. (1999). Bidirectional layout "
        "analysis. Journal of Scripts, 4(2), pp. 11-29.</bdo></p>"
        "</article>" + _ADV_FOOT + "</body></html>")
    docs.append(("rtl_arabic", rtl))

    # fully minified single-line page: inline CSS+JS blobs, link-farm
    # nav, content div — no newline anywhere
    minified = (
        "<!DOCTYPE html><html><head><style>.a{color:#000;margin:0}"
        ".b{display:none}</style><script>window.q=[];for(var i=0;i<9;i++)"
        "{q.push(i<3&&i>1?'x':'y')}</script></head><body>" +
        _ADV_NAV +
        "<div id=c><p>" + p + "</p><p>" + p + "</p></div>" +
        _ADV_FOOT + "</body></html>")
    docs.append(("minified_single_line", minified))

    # pathological nesting: content 60 divs deep, link farm as sibling
    deep = ("<html><body>" + "<div class='w'>" * 60 +
            "<p>" + p + "</p>" + "</div>" * 60 + _ADV_FOOT +
            "</body></html>")
    docs.append(("deep_nesting", deep))

    # spaceless CJK prose: word-count heuristics see ONE huge token;
    # char-density must carry the classification
    cjk = ("<html><body>" + _ADV_NAV +
           "<article><p>" + _ADV_CJK + "</p><p>" + _ADV_CJK + "</p>"
           "</article>" + _ADV_FOOT + "</body></html>")
    docs.append(("cjk_mixed", cjk))

    # data table: short numeric cells that individually fail every
    # word threshold — must survive via table-block merging
    rows = "".join(
        "<tr><td>Method {i}</td><td>{v}</td><td>{p}%</td></tr>".format(
            i=i, v=80 + i, p=90 - i) for i in range(8))
    dt = ("<html><body>" + _ADV_NAV +
          "<article><h2>Results</h2><p>" + p + "</p>"
          "<table><tr><th>Method</th><th>Score</th><th>Coverage</th></tr>"
          + rows + "</table></article>" + _ADV_FOOT + "</body></html>")
    docs.append(("data_table", dt))

    # preformatted code: line structure must survive (agent-transcript
    # payloads carry code/console output)
    code = ("<html><body>" + _ADV_NAV + "<article><p>" + p + "</p>"
            "<pre><code>def retry(fn, n=3):\n    for i in range(n):\n"
            "        try:\n            return fn()\n"
            "        except TimeoutError:\n            continue\n"
            "    raise RuntimeError('gave up')</code></pre>"
            "<p>" + p + "</p></article>" + _ADV_FOOT + "</body></html>")
    docs.append(("code_pre", code))

    # mixed citation styles under a References heading: Chicago,
    # Harvard, MLA, Vancouver — exercises the X4 style fallbacks
    # through the full DOM -> refs path
    styles = ("<html><body>" + _ADV_NAV + "<article><p>" + p + "</p>"
              "<h3>References</h3><ol>"
              "<li>Miller, Anna. 1999. Understanding Layout Analysis. "
              "Berlin: Springer.</li>"
              "<li>Miller, A. 1999, 'Deep citation parsing', Journal "
              "of Data Systems, vol. 12, no. 3, pp. 41-59.</li>"
              "<li>Miller, Anna. \"Deep Citation Parsing.\" Journal "
              "of Data Systems 12.3 (1999): 41-59.</li>"
              "<li>Miller A, Chen B. Deep citation parsing at scale. "
              "J Data Syst. 1999;12(3):41-59.</li>"
              "</ol></article>" + _ADV_FOOT + "</body></html>")
    docs.append(("citation_styles", styles))

    # entity soup: every space/bracket entity-escaped, double-escaped
    # ampersands in content
    ent = ("<html><body>" + _ADV_NAV + "<article><p>" +
           p.replace("must", "must &amp;amp; shall")
            .replace("density", "&#100;ensity") +
           " Fish &AMP; Chips &lt;tag-like&gt; &#x2014; end.</p>"
           "</article>" + _ADV_FOOT + "</body></html>")
    docs.append(("entity_soup", ent))

    return docs


# --------------------------------------------------------------------------
# t3: transcript-NATIVE payloads (the BASELINE input_hint shapes that the
# t1/t2 corpora only approximate): tool-output JSON blobs, streamed /
# truncated HTML fragments, base64-embedded binaries inside text, and
# interleaved role turns. Frozen as the t3 golden set by
# tests/freeze_goldens.py; gated byte-for-byte plus semantic asserts in
# tests/test_job_spark.py.
# --------------------------------------------------------------------------

def _b64_blob(seed: str, n_bytes: int) -> str:
    """Deterministic base64 payload (no random module)."""
    import base64
    import hashlib

    raw = b"".join(hashlib.md5((seed + str(i)).encode()).digest()
                   for i in range((n_bytes + 15) // 16))
    return base64.b64encode(raw[:n_bytes]).decode()


def make_transcript_native_cases() -> list[tuple[str, int, str, str, str]]:
    """Deterministic (conv_id, turn_idx, role, text, tool) rows."""
    rows: list[tuple[str, int, str, str, str]] = []

    # -- an interleaved agent conversation around a search tool call --
    search_json = json.dumps({
        "query": "columnar shuffle formats",
        "total": 3, "latency_ms": 41,
        "results": [
            {"title": "Columnar <b>shuffle</b> formats in depth",
             "url": "https://example.org/shuffle-formats",
             "snippet": "Arrow record batches cross the wire with "
                        "zero-copy framing &amp; dictionary reuse.",
             "score": 0.92},
            {"title": "Partition pruning explained",
             "url": "https://example.org/pruning",
             "snippet": "A scan that reads <i>every</i> footer for one "
                        "row is wrong — push the predicate down.",
             "score": 0.87},
            {"title": "シャッフルの設計",
             "url": "https://example.jp/shuffle",
             "snippet": "分散処理ではシャ"
                        "ッフルが性能を決"
                        "める。",
             "score": 0.71}]})
    rows += [
        ("t3-agent-search", 0, "user",
         "Which shuffle format should we pick for the 100 TB job? "
         "Please check what the tradeoffs are.", ""),
        ("t3-agent-search", 1, "assistant",
         "Let me search for current columnar shuffle designs first.", ""),
        ("t3-agent-search", 2, "tool", search_json, "search"),
        ("t3-agent-search", 3, "assistant",
         "Summary: Arrow framing wins for wide rows.\n\n"
         "```python\nconf.set(\"spark.sql.shuffle.partitions\", 4096)\n```\n"
         "Pruning matters more than the codec.", ""),
    ]

    # -- JSON edge shapes --
    deep: dict | str = "bottom-level finding: retries were exhausted"
    for i in range(48):
        deep = {"level%d" % i: deep, "note%d" % i: "depth marker %d" % i} \
            if i % 16 == 0 else {"level%d" % i: deep}
    rows += [
        ("t3-json-edge", 0, "tool", json.dumps(deep), "api"),
        # numbers/bools only -> no trainable text at all
        ("t3-json-edge", 1, "tool",
         json.dumps({"ok": True, "counts": [1, 2, 3],
                     "p99": 12.5, "retries": 0}), "api"),
        # ALMOST-json (trailing comma): must stay raw via the plain
        # path, never half-parsed
        ("t3-json-edge", 2, "tool",
         '{"broken": "payload", "oops": [1, 2,}', "api"),
        # double-escaped entities + unicode escapes in values
        ("t3-json-edge", 3, "tool",
         '{"msg": "R&amp;amp;D results \\u2192 ready", '
         '"attachment": "data:image/png;base64,%s"}' % _b64_blob("j", 48),
         "api"),
    ]

    # -- streamed / truncated HTML fragments (browser tool died mid-page) --
    rows += [
        ("t3-html-frag", 0, "tool",
         "<html><body><article><p>The committee reviewed the migration "
         "plan and approved the phased rollout for the storage layer. "
         "Costs stay flat through the second quarter.</p>"
         '<div class="sidebar-partial" style="wid', "browser"),
        ("t3-html-frag", 1, "tool",
         "<div><div><p>Replication lag stayed under two seconds during "
         "the failover drill, which satisfies the recovery objective "
         "set by the operations review board.</p><ul><li>[1] Gray, J. "
         "(1993). Transaction Processing. Morgan Kaufmann.</li><li>[2] "
         "DeWitt, D.", "browser"),
    ]

    # -- base64-embedded binaries inside otherwise-normal text --
    wall = "\n".join(_b64_blob("wall%d" % i, 57) for i in range(15))
    rows += [
        ("t3-b64", 0, "user",
         "Here is the latency chart from the soak run:\n\n"
         "![chart](data:image/png;base64,%s)\n\n"
         "The knee appears at thirty-two executors as predicted."
         % _b64_blob("chart", 900), ""),
        ("t3-b64", 1, "tool",
         "Attachment dump follows.\nContent-Transfer-Encoding: base64\n\n"
         + wall + "\n\nEnd of attachment.", "log"),
        ("t3-b64", 2, "user",
         "The token from the failing request was "
         + _b64_blob("tok", 120) +
         " and retrying with a fresh one fixed the auth loop.", ""),
    ]
    return rows

def _wrap_words(words: list[str], chars_per_line: int) -> list[str]:
    lines, cur, n = [], [], 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        if cur and n + add > chars_per_line:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        lines.append(" ".join(cur))
    return lines


def _glyphs_for_lines(lines: list[str], x_base: int, y_base: int,
                      char_w: int = 12, line_h: int = 34) -> list[dict]:
    out = []
    y = y_base
    for ln in lines:
        x = x_base
        for w in ln.split(" "):
            if not w:
                continue
            out.append({"t": w, "x0": x, "y0": y,
                        "x1": x + char_w * len(w), "y1": y + 26})
            x += char_w * (len(w) + 1)
        y += line_h
    return out


def make_pdf(rng: random.Random, n_cols: int) -> str:
    page_w, page_h = 2480, 3508
    margin = 120
    gap = 140  # > 3% of width -> column split detectable
    col_w = (page_w - 2 * margin - (n_cols - 1) * gap) // n_cols
    chars = max(18, col_w // 12 - 2)

    cols: list[list[str]] = []
    for ci in range(n_cols):
        words = []
        for _ in range(rng.randint(2, 3)):
            words.extend(_para(rng, 25, 50).split(" "))
        lines = _wrap_words(words, chars)
        # hyphen-break fixture: split a long word across two lines
        if len(lines) >= 2 and rng.random() < 0.7:
            k = rng.randrange(len(lines) - 1)
            w = "hyphenation"
            lines[k] = lines[k] + " " + w[:5] + "-"
            lines[k + 1] = w[5:] + " " + lines[k + 1]
        # digit-guard fixture: numeric range split (must NOT merge)
        if len(lines) >= 2 and rng.random() < 0.4:
            lines[-2] = lines[-2] + " 1995-"
            lines[-1] = "2001 " + lines[-1]
        cols.append(lines)

    # trailing reference block in the last column
    if rng.random() < 0.8:
        refl = ["References"]
        for i in range(rng.randint(2, 4)):
            cite_lines = _wrap_words(
                "[{}] {}".format(i + 1, make_citation(rng)).split(" "), chars)
            refl.extend(cite_lines)
        cols[-1].extend([""] + refl)

    glyphs = []
    for ci, lines in enumerate(cols):
        x0 = margin + ci * (col_w + gap)
        glyphs.extend(_glyphs_for_lines([ln for ln in lines if ln], x0, margin))
    return json.dumps(
        {"pages": [{"w": page_w, "h": page_h, "glyphs": glyphs}]},
        separators=(",", ":"),
    )


# --------------------------------------------------------------------------
# transcripts table
# --------------------------------------------------------------------------

def make_turn_text(rng: random.Random) -> tuple[str, str]:
    """Returns (text, tool) with the FIXTURES.md payload mix."""
    r = rng.random()
    if r < 0.30:  # html
        return make_html(rng, rng.randrange(6)), "browser"
    if r < 0.50:  # pdf glyphs
        return make_pdf(rng, rng.choice([1, 1, 2, 2, 3])), "pdf"
    # plain; half with reference sections
    tool = rng.choice(["", "", "search"])
    return make_plain(rng, rng.random() < 0.5), tool


def gen_transcripts(n_turns: int, seed: int = 42,
                    hot_frac: float = 0.30) -> pd.DataFrame:
    """Deterministic transcripts table exactly per input_hint:
    (conv_id string, turn_idx int32, role string, text string,
    tool string, ts timestamp)."""
    rng = random.Random(seed)
    hot_turns = int(n_turns * hot_frac)
    rows_conv: list[tuple[str, int]] = [("conv-hot-000000", hot_turns)]
    remaining = n_turns - hot_turns
    ci = 1
    while remaining > 0:
        size = min(remaining, rng.randint(4, 40))
        rows_conv.append(("conv-{:06d}".format(ci), size))
        ci += 1
        remaining -= size

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    t0 = EPOCH
    for conv_id, size in rows_conv:
        conv_rng = random.Random((seed, conv_id).__repr__())
        base = t0 + dt.timedelta(seconds=conv_rng.randrange(10_000_000))
        for ti in range(size):
            role = ("user", "assistant", "tool")[ti % 3]
            text, tool = make_turn_text(conv_rng)
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(base + dt.timedelta(seconds=7 * ti))
    df = pd.DataFrame({
        "conv_id": pd.array(conv_ids, dtype="string"),
        "turn_idx": pd.array(turn_idxs, dtype="int32"),
        "role": pd.array(roles, dtype="string"),
        "text": pd.array(texts, dtype="string"),
        "tool": pd.array(tools, dtype="string"),
        # microsecond resolution: Spark's vectorized parquet reader has
        # no nanosecond timestamp path (pandas default is ns)
        "ts": pd.to_datetime(tss).astype("datetime64[us]"),
    })
    return df


def write_transcripts_parquet(path: str, n_turns: int, seed: int = 42,
                              hot_frac: float = 0.30) -> None:
    # small row groups so Spark's scan can split a single file into
    # parallel tasks (one giant row group = scan parallelism 1)
    gen_transcripts(n_turns, seed, hot_frac).to_parquet(
        path, index=False, row_group_size=4096)


if __name__ == "__main__":
    import sys

    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    write_transcripts_parquet(out, n, seed)
    print("wrote {} turns to {}".format(n, out))
