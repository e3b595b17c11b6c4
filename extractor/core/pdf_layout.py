"""PDF glyph-layout parsing: glyph boxes -> lines -> columns ->
reading order -> de-hyphenated text with char offsets and per-ref
bounding boxes.

Re-derives, deterministically and in numpy, the capabilities the
reference gets from Detectron + Tesseract hOCR:

- column detection (N1): the reference's Faster-RCNN column boxes
  (``LOCDB-V3/imgProcessing.py:32-134``) become x-projection gap
  clustering over glyph boxes; columns ordered left->right
  (``LOCDB-V3/imgProcessing.py:85-90``, W2) — mirrored right->left on
  RTL-dominant pages (beyond-reference: the reference corpus is LTR).
- hOCR line parse (F2, ``LOCDB-V3/imgProcessing.py:457-528``): glyphs
  cluster into lines by y-center, words sort by x, join with " ".
- de-hyphenation with the digit guard (F1): trailing "-" merges into
  the next line UNLESS the char before "-" is a digit
  (``LOCDB-V3/imgProcessing.py:498-507``).
- running char-offset index (A3, ``LOCDB-V3/imgProcessing.py:488-516``).
- bounding-box envelope min/min/max/max (A1,
  ``LOCDB-V3/imgProcessing.py:361-378,725-746``).
- zero-coordinate eviction (P5, ``LOCDB-V3/imgProcessing.py:565-586``).
- empty-line filter (P6, ``LOCDB-V3/imgProcessing.py:478-480``).

Payload shape (FIXTURES.md §1.1):
``{"pages":[{"w":..,"h":..,"glyphs":[{"t":..,"x0":..,"y0":..,"x1":..,"y1":..}]}]}``
"""

from __future__ import annotations

import json
import re as _re

import numpy as np

try:  # orjson parses ~4x faster; stdlib fallback keeps its accept-set
    import orjson as _fastjson
except ImportError:  # pragma: no cover
    _fastjson = None

from extractor.core import refseg
from extractor.core.textnorm import collapse_inline_ws

COLUMN_GAP_FRAC = 0.03   # min x-gap between columns as fraction of page width
LINE_GAP_FACTOR = 0.6    # new line when y-center jump > factor * median height
MAX_CANVAS = 3500        # payload clamp analog (LOCDB-V3/imgProcessing.py:24-28)


def parse_payload(text: str) -> dict | None:
    """Parse the glyph JSON; None if not a valid pdf_glyphs payload.

    orjson first (C parser), stdlib retry on its stricter rejections
    (NaN/Infinity literals, >64-bit ints) so the accepted payload set
    is exactly the stdlib one."""
    obj = None
    if _fastjson is not None:
        try:
            obj = _fastjson.loads(text)
        except (ValueError, TypeError):
            obj = None
    if obj is None:
        try:
            obj = json.loads(text)
        except (ValueError, TypeError):
            return None
    if not isinstance(obj, dict) or not isinstance(obj.get("pages"), list):
        return None
    return obj


def _normalize_canvas(w: float, h: float, xs0, ys0, xs1, ys1):
    """Oversize-canvas clamp (P9 analog): scale so max dim <= MAX_CANVAS."""
    m = max(w, h)
    if m <= MAX_CANVAS:
        return w, h, xs0, ys0, xs1, ys1
    s = MAX_CANVAS / m
    return w * s, h * s, xs0 * s, ys0 * s, xs1 * s, ys1 * s


def _columns(xs0: np.ndarray, xs1: np.ndarray, width: float) -> list[tuple[float, float]]:
    """Merge glyph x-intervals; gaps wider than COLUMN_GAP_FRAC*width
    split columns. Returns [(x_lo, x_hi)] ordered left->right."""
    order = np.argsort(xs0, kind="stable")
    a, b = xs0[order], xs1[order]
    run_max = np.maximum.accumulate(b)  # interval-merge frontier
    min_gap = COLUMN_GAP_FRAC * width
    breaks = np.nonzero(a[1:] - run_max[:-1] > min_gap)[0] + 1
    starts = np.concatenate(([0], breaks))
    ends = np.concatenate((breaks, [len(a)]))
    return [(float(a[s]), float(run_max[e - 1])) for s, e in zip(starts, ends)]


# RTL-script LETTERS (Hebrew letters + ligatures; Arabic letter
# ranges incl. supplement and both presentation-forms blocks).
# Deliberately EXCLUDES Arabic-Indic digits (U+0660-0669,
# U+06F0-06F9), Arabic punctuation/format controls (U+0600-061F) and
# harakat diacritics (U+064B-065F): the majority gate divides by
# LETTER count, so counting digits as RTL evidence would let a
# digit-heavy Latin table page flip to right-to-left (code-review r4
# finding). Used only for the reading-order gate — glyph TEXT is
# never altered.
_RTL_CHARS = _re.compile(
    "[\u05D0-\u05F4"                  # Hebrew letters + ligatures
    "\u0620-\u064A\u066E-\u066F"    # Arabic letters
    "\u0671-\u06D3\u06FA-\u06FF"    # Arabic extended letters
    "\u0750-\u077F"                   # Arabic supplement
    "\uFB1D-\uFDFF\uFE70-\uFEFF]")  # presentation forms
_LETTERS = _re.compile(r"[^\W\d_]", _re.UNICODE)


def _rtl_dominant(ts_str: np.ndarray) -> bool:
    """True when the page's glyph text is majority RTL-script: RTL
    codepoints outnumber half the letters (sampled at 2000 glyphs —
    direction is a page property, not a tail property; the cap bounds
    cost on pathological pages). ASCII fast path: a pure-ASCII page
    can't be RTL."""
    sample = " ".join(ts_str[:2000].tolist())
    if sample.isascii():
        return False
    n_rtl = len(_RTL_CHARS.findall(sample))
    if not n_rtl:
        return False
    n_letters = len(_LETTERS.findall(sample))
    return n_rtl * 2 > n_letters


def _lines_in_column(ts_str, x0, y0, x1, y1, rtl: bool = False) -> list[dict]:
    """Cluster one column's glyphs into lines by y-center, emit
    reading-order lines with text and integer bbox envelope.

    One column-wide lexsort groups glyphs by line in final word order
    (primary line, then the fully-specified (x0, y0, token) key so
    coincident glyphs can't reorder under input shuffling); lines are
    then contiguous runs — no per-line boolean masks (which made the
    old loop O(lines x glyphs)).

    ``rtl`` reverses WORD order within each line (visual right to
    left becomes logical first to last) — the intra-line half of the
    RTL reading-order rule; the caller reverses the column order."""
    n = len(x0)
    yc = (y0 + y1) / 2.0
    heights = y1 - y0
    # manual median (same semantics as np.median: midpoint average for
    # even n) — np.median's _ureduce wrapper costs ~70us/call, ~3% of
    # the whole pdf path at these small per-column arrays
    if n:
        hs = np.sort(heights)
        m = n >> 1
        med_h = float(hs[m]) if n & 1 else float((hs[m - 1] + hs[m]) / 2.0)
    else:
        med_h = 1.0
    if med_h <= 0:
        med_h = 1.0
    order = np.lexsort((x0, yc))  # primary yc, secondary x0 — deterministic
    yc_s = yc[order]
    breaks = np.empty(n, dtype=bool)
    breaks[0] = True
    if n > 1:
        breaks[1:] = np.diff(yc_s) > LINE_GAP_FACTOR * med_h
    lid = np.empty(n, dtype=np.int64)
    lid[order] = np.cumsum(breaks) - 1

    final = np.lexsort((ts_str, y0, -x0 if rtl else x0, lid))
    lidf = lid[final]
    x0f, y0f, x1f, y1f = x0[final], y0[final], x1[final], y1[final]
    tsf = ts_str[final]
    starts = np.flatnonzero(np.concatenate(([True], lidf[1:] != lidf[:-1])))
    ends = np.concatenate((starts[1:], [n]))

    # vectorized per-line bbox envelopes (4 reduceat calls for the
    # whole column instead of 4 tiny .min()/.max() per line)
    bx0 = np.floor(np.minimum.reduceat(x0f, starts)).astype(np.int64)
    by0 = np.floor(np.minimum.reduceat(y0f, starts)).astype(np.int64)
    bx1 = np.ceil(np.maximum.reduceat(x1f, starts)).astype(np.int64)
    by1 = np.ceil(np.maximum.reduceat(y1f, starts)).astype(np.int64)

    lines = []
    tlist = tsf.tolist()
    for k, (s, e) in enumerate(zip(starts, ends)):
        text = collapse_inline_ws(" ".join(tlist[s:e]))
        if not text:  # empty-line filter (P6)
            continue
        lines.append({"text": text,
                      "bbox": [int(bx0[k]), int(by0[k]),
                               int(bx1[k]), int(by1[k])]})
    return lines


def _spanning_bands(ts_str, x0, y0, x1, y1, w, rtl=False):
    """XY-cut rescue for the classic column-detection trap: a
    full-width element (title, section banner, figure caption)
    bridges the inter-column gap, so the x-interval merge of
    ``_columns`` collapses the whole page to one column and the two
    body columns interleave line-by-line. Cut horizontally instead
    (Nagy's recursive XY-cut, ICPR'84 lineage): spanning glyphs
    (wider than half the page) define horizontal bands; each
    non-spanning band re-runs column detection on its own glyphs and
    reads left->right, bands top->bottom, spanning lines as their own
    single-column bands.

    Strictly additive: returns None — caller keeps the single-column
    path — unless BOTH a spanning glyph exists AND the non-spanning
    body alone separates into >= 2 columns (so genuinely
    single-column prose, where every line is wide or the body shows
    no x-gap, is untouched; the golden fixture corpus has no
    spanning glyphs and is byte-identical under this extension).
    Reference analog: crop/region ordering before OCR merge,
    dev-version/crop_morphology.py (N1/W2)."""
    wide = (x1 - x0) > 0.5 * w
    n_body = int((~wide).sum())
    if not wide.any() or n_body < 4 or n_body < 0.6 * len(x0):
        return None
    if len(_columns(x0[~wide], x1[~wide], w)) < 2:
        return None
    # merged y-intervals of the spanning glyphs = the horizontal cuts
    order = np.argsort(y0[wide], kind="stable")
    wy0, wy1 = y0[wide][order], y1[wide][order]
    run = np.maximum.accumulate(wy1)
    brk = np.nonzero(wy0[1:] > run[:-1])[0] + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [len(wy0)]))
    cuts = [(float(wy0[s]), float(run[e - 1]))
            for s, e in zip(starts, ends)]

    yc = (y0 + y1) / 2.0
    xc = (x0 + x1) / 2.0
    out: list[dict] = []

    def emit(mask):
        if not mask.any():
            return
        sub = _columns(x0[mask], x1[mask], w)
        if len(sub) == 1:
            out.extend(_lines_in_column(ts_str[mask], x0[mask], y0[mask],
                                        x1[mask], y1[mask], rtl=rtl))
            return
        for lo, hi in (reversed(sub) if rtl else sub):
            mm = mask & (xc >= lo - 1e-9) & (xc <= hi + 1e-9)
            if mm.any():
                out.extend(_lines_in_column(ts_str[mm], x0[mm], y0[mm],
                                            x1[mm], y1[mm], rtl=rtl))

    prev_hi = -np.inf
    for clo, chi in cuts:
        emit((yc > prev_hi) & (yc < clo))          # column band above
        band = (yc >= clo) & (yc <= chi)           # the spanning band
        if band.any():                             # (incl. narrow
            out.extend(_lines_in_column(            # glyphs inside it)
                ts_str[band], x0[band], y0[band], x1[band], y1[band],
                rtl=rtl))
        prev_hi = chi
    emit(yc > prev_hi)                             # trailing band
    return out


def page_lines(page: dict) -> list[dict]:
    """All lines of one page in reading order: lines top->bottom
    within a column; columns left->right — unless the page's glyph
    text is RTL-dominant (Hebrew/Arabic scripts), in which case
    columns read right->left and words within a line right->left
    (logical order). Direction detection is per page, additive, and
    never fires on ASCII text."""
    glyphs = page.get("glyphs") or []
    if not glyphs:
        return []
    # coords in one C-level conversion (scalar np assignments and
    # per-value float() calls both cost ~1.4s per 3k pages)
    ts_str = np.asarray([str(g.get("t", "")) for g in glyphs], dtype=str)
    coords = np.array(
        [(g.get("x0", 0), g.get("y0", 0), g.get("x1", 0), g.get("y1", 0))
         for g in glyphs], dtype=np.float64)
    # evict glyphs with non-finite coords (P5's zero-coordinate
    # eviction, extended): a NaN would otherwise flow into the int64
    # bbox cast with an undefined value
    finite = np.isfinite(coords).all(axis=1)
    if not finite.all():
        coords = coords[finite]
        ts_str = ts_str[finite]
        if len(coords) == 0:
            return []
    x0, y0, x1, y1 = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    w = float(page.get("w", max(1.0, float(x1.max()))))
    h = float(page.get("h", max(1.0, float(y1.max()))))
    w, h, x0, y0, x1, y1 = _normalize_canvas(w, h, x0, y0, x1, y1)

    out: list[dict] = []
    # RTL reading order (additive: pure-ASCII pages short-circuit to
    # False, so the entire golden corpus is byte-identical): columns
    # read right->left and words within a line right->left. Geometry
    # (columns, lines, bboxes, de-hyphenation) is direction-blind.
    rtl = _rtl_dominant(ts_str)
    cols = _columns(x0, x1, w)
    if len(cols) == 1:
        banded = _spanning_bands(ts_str, x0, y0, x1, y1, w, rtl=rtl)
        if banded is not None:
            return banded
        return _lines_in_column(ts_str, x0, y0, x1, y1, rtl=rtl)
    xc = (x0 + x1) / 2.0
    for lo, hi in (reversed(cols) if rtl else cols):
        mask = (xc >= lo - 1e-9) & (xc <= hi + 1e-9)
        if not mask.any():
            continue
        out.extend(_lines_in_column(ts_str[mask], x0[mask], y0[mask],
                                    x1[mask], y1[mask], rtl=rtl))
    return out


def _dehyphenate(lines: list[dict]) -> list[dict]:
    """Merge a line ending in '-' into the following line, unless the
    char before '-' is a digit (digit guard). Merged lines keep the
    full source-line range and the bbox envelope of their members."""
    out: list[dict] = []
    i = 0
    n = len(lines)
    while i < n:
        text = lines[i]["text"]
        bbox = list(lines[i]["bbox"])
        src_start = src_end = i
        while (
            src_end + 1 < n
            and text.endswith("-")
            and len(text) >= 2
            and not text[-2].isdigit()
        ):
            nxt = lines[src_end + 1]
            text = text[:-1] + nxt["text"]
            bbox = [
                min(bbox[0], nxt["bbox"][0]),
                min(bbox[1], nxt["bbox"][1]),
                max(bbox[2], nxt["bbox"][2]),
                max(bbox[3], nxt["bbox"][3]),
            ]
            src_end += 1
        out.append({
            "text": text,
            "bbox": bbox,
            "src_start": src_start,
            "src_end": src_end,
        })
        i = src_end + 1
    return out


HANG_INDENT_PX = 20  # continuation lines sit right of the entry start


def _hanging_indent_blocks(lines: list[dict]) -> list[dict]:
    """N2 geometry heuristic: citation entries without markers or an
    anchor heading — an author-start line (``Surname, I.``) whose
    following lines hang-indent (x0 >= start + HANG_INDENT_PX) starts
    a block; a region needs >= 2 such blocks to count (the reference's
    Mask-RCNN reference-region detector re-derived from indent/
    adjacency features, LOCDB-V3/imgProcessing.py:141-150)."""
    blocks: list[tuple[int, int, list[str]]] = []
    cur = None  # [start, end, parts, base_x]
    for i, ln in enumerate(lines):
        text = ln["text"]
        x0 = ln["bbox"][0]
        if refseg.AUTHOR_START_RE.match(text):
            if cur is not None:
                blocks.append((cur[0], cur[1], cur[2]))
            cur = [i, i, [text], x0]
        elif cur is not None and x0 >= cur[3] + HANG_INDENT_PX:
            cur[1] = i
            cur[2].append(text)
        else:
            if cur is not None:
                blocks.append((cur[0], cur[1], cur[2]))
                cur = None
    if cur is not None:
        blocks.append((cur[0], cur[1], cur[2]))
    if len(blocks) < 2:
        return []
    out = []
    for ls, le, parts in blocks:
        raw = " ".join(parts).strip()
        if len(raw.strip()) <= refseg.MIN_REF_LEN:
            continue
        if not refseg.looks_like_citation(raw):
            continue
        out.append({"raw": raw, "line_start": ls, "line_end": le,
                    "detector": "layout"})
    return out


def line_offset_index(texts: list[str]) -> tuple:
    """Running char-offset index (A3): starts[i] = offset of line i in
    '\\n'.join(texts), lengths[i] = len(texts[i]). Shared by the pdf
    and plain span-filling paths so the byte-equality contract cannot
    drift between them (vectorized prefix sum, np.cumsum)."""
    lengths = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        starts[1:] = np.cumsum(lengths[:-1] + 1)
    return starts, lengths


def extract_pdf(text: str) -> dict | None:
    """Full pdf_glyphs pipeline for one payload.

    Returns ``{"clean_text": str, "refs": [ref dict]}`` or None when
    the payload isn't parseable glyph JSON (caller falls back to the
    plain-text path).
    """
    obj = parse_payload(text)
    if obj is None:
        return None
    try:
        return _extract_parsed(obj)
    except (TypeError, AttributeError, ValueError, KeyError, IndexError):
        # JSON that parses but is not a glyph table (string pages,
        # glyph entries that aren't dicts, null dimensions, ...):
        # structurally invalid -> the documented plain-text fallback,
        # never a task-killing poison pill. Scoped to shape errors;
        # genuine bugs (e.g. numpy faults) still surface.
        return None


_FURN_BAND = 0.12      # top/bottom page fraction where furniture lives
_FURN_MIN_PAGES = 3    # never strip on 1-2 page documents
_FURN_DIGITS = _re.compile(r"\d+")


def _strip_running_furniture(page_line_lists, heights):
    """Running header/footer removal — the classic repetition-at-
    margin heuristic (Déjean & Meunier, DAS'06; standard
    pdfminer/GROBID practice): a line whose digit-normalized text
    ("Page 3" -> "Page #", catching counters) recurs in the top or
    bottom _FURN_BAND of at least 2/3 of the pages (and at least
    _FURN_MIN_PAGES) is page furniture, not content — drop those
    occurrences IN THE BAND only (the same sentence mid-page is
    content and survives). Strictly additive: documents under
    _FURN_MIN_PAGES pages, or without margin-repeated lines, are
    byte-identical — the entire golden corpus (no repeated margin
    lines) is unaffected, pinned by the green golden gates."""
    n = len(page_line_lists)

    def in_band(ln, h):
        if h <= 0:
            return False
        y0, y1 = ln["bbox"][1], ln["bbox"][3]
        return y1 <= h * _FURN_BAND or y0 >= h * (1.0 - _FURN_BAND)

    pages_with_key: dict = {}
    for pl, h in zip(page_line_lists, heights):
        seen = set()
        for ln in pl:
            if in_band(ln, h):
                seen.add(_FURN_DIGITS.sub("#", ln["text"]))
        for k in seen:
            pages_with_key[k] = pages_with_key.get(k, 0) + 1
    threshold = max(_FURN_MIN_PAGES, -(-2 * n // 3))  # ceil(2n/3)
    furniture = {k for k, c in pages_with_key.items() if c >= threshold}
    if not furniture:
        return page_line_lists
    return [
        [ln for ln in pl
         if not (in_band(ln, h)
                 and _FURN_DIGITS.sub("#", ln["text"]) in furniture)]
        for pl, h in zip(page_line_lists, heights)
    ]


def _extract_parsed(obj: dict) -> dict:
    page_line_lists: list[list[dict]] = []
    heights: list[float] = []
    for page in obj["pages"]:
        pl = page_lines(page)
        page_line_lists.append(pl)
        # band geometry must live in the SAME coordinate system as the
        # line bboxes page_lines emits — i.e. post _normalize_canvas
        # (an oversize page is scaled by MAX_CANVAS/max(w,h); comparing
        # scaled bboxes to the RAW height would classify the whole
        # page as top band). Re-apply the clamp to the declared h.
        try:
            w = float(page.get("w") or 0.0)
            h = float(page.get("h") or 0.0)
        except (TypeError, ValueError):
            w = h = 0.0
        m = max(w, h)
        if m > MAX_CANVAS:
            h *= MAX_CANVAS / m
        if h <= 0.0:
            h = max((ln["bbox"][3] for ln in pl), default=0.0)
        heights.append(h)
    if len(page_line_lists) >= _FURN_MIN_PAGES:
        page_line_lists = _strip_running_furniture(page_line_lists, heights)
    raw_lines = [ln for pl in page_line_lists for ln in pl]
    lines = _dehyphenate(raw_lines)

    texts = [ln["text"] for ln in lines]
    clean_text = "\n".join(texts)
    starts, lengths = line_offset_index(texts)

    a = refseg.find_anchor(texts)
    if a >= 0:
        cands = refseg.segment_lines(texts, a + 1, "anchor")
    else:
        # anchor-less: every bounded marker run (wrapped continuation
        # lines stay inside their run — two-column PDFs wrap almost
        # every entry), each run gated by the same strict-majority
        # validity rule as the plain path
        cands = []
        for rs, re_, n_markers in refseg.find_layout_runs(texts):
            got = refseg.segment_lines(texts[: re_ + 1], rs, "layout")
            if refseg.layout_run_accept(got, n_markers, re_, texts):
                cands.extend(got)
        if not cands:
            cands = _hanging_indent_blocks(lines)

    refs = []
    for c in cands:
        ls, le = c["line_start"], c["line_end"]
        member = lines[ls: le + 1]
        bbox = [
            min(m["bbox"][0] for m in member),
            min(m["bbox"][1] for m in member),
            max(m["bbox"][2] for m in member),
            max(m["bbox"][3] for m in member),
        ]
        if bbox == [0, 0, 0, 0]:
            continue  # zero-coordinate eviction (P5)
        span_start = int(starts[ls])
        span_end = int(starts[le] + lengths[le])
        refs.append({
            "raw": c["raw"],
            "span_start": span_start,
            "span_end": span_end,
            "line_start": int(member[0]["src_start"]),
            "line_end": int(member[-1]["src_end"]),
            "bbox": bbox,
            "detector": c["detector"],
            "fields": refseg.parse_fields(c["raw"]),
        })
    return {"clean_text": clean_text, "refs": refs}
