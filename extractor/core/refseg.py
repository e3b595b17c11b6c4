"""Reference-string segmentation + bibliographic field parsing.

Re-derives, from scratch, the *capability* the reference gets from
external ParsCit/Grobid subprocesses:

- The reference *injects* a known anchor ("REFERENCES") before
  candidate text so ParsCit finds a reference section
  (``LOCDB-V3/textProcessing.py:117-129``, ``LOCDB-V3/xmlProcessing.py:
  99-107``). We invert the trick: *detect* the anchor line.
- Numbered-marker formatting ``"{i}.\\t{text}"`` / ``"[ID] text"``
  (``LOCDB-V3/imgProcessing.py:759-764``, ``LOCDB-V3/xmlProcessing.py:
  93-96``) becomes a segmentation feature (marker regex).
- ``citation[valid="true"]`` filtering (``LOCDB-V3/textProcessing.py:
  143``) becomes a per-block validity score from token features
  (year / author-initial patterns).
- Min-length filter ``len(strip()) > 5`` (``LOCDB-V3/xmlProcessing.py:
  217,231-232``).
- Flat bib-field mapping (authors/title/journal/date/publisher/
  location/volume/issue/pages) mirrors the TEI->flat lift in
  ``LOCDB-V3/imgProcessing.py:801-968``.

Pure Python; deterministic; no pyspark imports.
"""

from __future__ import annotations

import re
from typing import Optional

ANCHOR_RE = re.compile(
    r"^\s*(?:\d+\.?\s+)?(references|bibliography|works\s+cited|"
    r"literatur(?:verzeichnis)?|quellen(?:verzeichnis)?)\s*:?\s*$",
    re.IGNORECASE,
)
MARKER_RE = re.compile(r"^\s*(\[\d{1,4}\]|\d{1,4}\.)\s+")
YEAR_RE = re.compile(r"\b((?:19|20)\d{2})[a-z]?\b")
INITIAL_RE = re.compile(r"\b[A-Z]\.(?:\s?[A-Z]\.)*")
MIN_REF_LEN = 5  # keep iff len(strip()) > 5, per LOCDB-V3/xmlProcessing.py:217
AUTHOR_START_RE = re.compile(r"^[A-Z][\w'À-ɏ-]+,\s*[A-Z]\.")


def is_anchor_line(line: str) -> bool:
    return ANCHOR_RE.match(line) is not None


def is_marker_line(line: str) -> bool:
    return MARKER_RE.match(line) is not None


def looks_like_citation(text: str) -> bool:
    """Validity heuristic replacing ParsCit's valid="true" flag (P3):
    a citation-ish block carries a year and an author-initial pattern,
    or a year plus enough length."""
    has_year = YEAR_RE.search(text) is not None
    has_initial = INITIAL_RE.search(text) is not None
    return (has_year and has_initial) or (has_year and len(text) >= 40)


def find_anchor(lines: list[str]) -> int:
    """Index of the first anchor line, or -1."""
    for i, ln in enumerate(lines):
        if is_anchor_line(ln):
            return i
    return -1


# wrapped citations carry 1-3 continuation lines between markers in
# 2-column PDFs; more consecutive marker-less lines means prose
MAX_RUN_GAP = 3


def find_layout_runs(lines: list[str],
                     max_cont: int = MAX_RUN_GAP) -> list[tuple]:
    """Maximal marker runs for anchor-less layout detection (F6),
    tolerating up to ``max_cont`` non-blank continuation lines between
    markers (wrapped entries are the norm in 2-column PDF output — a
    run must not reset on the wrap). Returns ``(start, end,
    n_markers)`` per run with >=2 markers: start = first marker line,
    end = last marker line plus its trailing continuation lines (same
    gap bound, stopping at a blank line), so a run never swallows the
    unbounded prose tail of the document."""
    runs: list[tuple] = []
    cur = None  # [start, last_marker, n_markers]
    gap = 0

    def close(c):
        if c is not None and c[2] >= 2:
            end = c[1]
            cont = 0
            for j in range(c[1] + 1, len(lines)):
                if not lines[j].strip() or cont >= max_cont:
                    break
                if is_marker_line(lines[j]):
                    break
                cont += 1
                end = j
            runs.append((c[0], end, c[2]))

    for i, ln in enumerate(lines):
        if is_marker_line(ln):
            if cur is None:
                cur = [i, i, 1]
            else:
                cur[1] = i
                cur[2] += 1
            gap = 0
        elif ln.strip():
            gap += 1
            if cur is not None and gap > max_cont:
                close(cur)
                cur, gap = None, 0
    close(cur)
    return runs


def segment_lines(
    lines: list[str],
    start: int,
    detector: str,
) -> list[dict]:
    """Group ``lines[start:]`` into citation blocks.

    A block starts at a marker line; marker-less non-blank lines
    continue the current block. If the region has no markers at all,
    blank-line-separated paragraphs are the blocks. Blocks failing the
    validity or min-length filters are dropped (P3/P4).

    Returns dicts with keys raw, line_start, line_end, detector
    (char spans / bbox are filled by the caller, which owns geometry).
    """
    region = lines[start:]
    any_marker = any(is_marker_line(ln) for ln in region)
    blocks: list[tuple[int, int, list[str]]] = []  # (ls, le, parts)
    cur: Optional[list] = None  # [ls, le, parts]

    for off, ln in enumerate(region):
        idx = start + off
        stripped = ln.strip()
        if not stripped:
            if cur is not None and not any_marker:
                blocks.append((cur[0], cur[1], cur[2]))
                cur = None
            continue
        if any_marker:
            if is_marker_line(ln):
                if cur is not None:
                    blocks.append((cur[0], cur[1], cur[2]))
                cur = [idx, idx, [stripped]]
            elif cur is not None:
                cur[1] = idx
                cur[2].append(stripped)
            # marker-less lines before the first marker: preamble, skip
        else:
            # marker-less region: blank lines split paragraphs, and an
            # author-start line ("Surname, I.") at column 0 whose
            # PREVIOUS line closed an entry (terminal . or )) starts a
            # new block — the plain-text twin of N2's hanging-indent
            # geometry (wrapped continuations are indented and/or the
            # prior line ends mid-entry, so "..., and\nSmith, J." never
            # splits a multi-author entry)
            starts_entry = (
                cur is not None
                and not ln[:1].isspace()
                and AUTHOR_START_RE.match(stripped) is not None
                and cur[2][-1][-1:] in (".", ")"))
            if cur is None:
                cur = [idx, idx, [stripped]]
            elif starts_entry:
                blocks.append((cur[0], cur[1], cur[2]))
                cur = [idx, idx, [stripped]]
            else:
                cur[1] = idx
                cur[2].append(stripped)
    if cur is not None:
        blocks.append((cur[0], cur[1], cur[2]))

    out = []
    for ls, le, parts in blocks:
        raw = " ".join(parts).strip()
        if len(raw.strip()) <= MIN_REF_LEN:
            continue
        if not looks_like_citation(raw):
            continue
        out.append(
            {"raw": raw, "line_start": ls, "line_end": le, "detector": detector}
        )
    return out


def segment_text(text: str) -> list[dict]:
    """Segment normalized plain text into reference candidates.

    The anchored region (after a References/Bibliography/... heading)
    is segmented with detector='anchor'. With no anchor, a trailing run
    of >=2 consecutive marker lines is segmented with detector='layout'
    (numbered-list shape is evidence enough, F6).
    """
    lines = text.split("\n")
    a = find_anchor(lines)
    if a >= 0:
        return segment_lines(lines, a + 1, "anchor")
    # no anchor: the TRAILING marker run (references sit at the end by
    # convention; a mid-document numbered list is a how-to list, not a
    # bibliography), bounded so it never swallows prose to EOF
    runs = find_layout_runs(lines)
    if not runs:
        return []
    start, end, n_markers = runs[-1]
    cands = segment_lines(lines[: end + 1], start, "layout")
    if not layout_run_accept(cands, n_markers, end, lines):
        return []
    return cands


def layout_run_accept(cands: list[dict], n_markers: int, end: int,
                      lines: list[str]) -> bool:
    """Strict-majority validity gate for anchor-less layout runs: with
    no References heading the numbered shape alone is weak evidence —
    if half or more of the entries fail the citation test (no year /
    authors), this is a step list whose last item merely mentions a
    year, and emitting it as a reference is worse than emitting
    nothing. One exception: an entry that fails validity AND is the
    document's final line is a streamed-TRUNCATION artifact ("[2]
    DeWitt, D." cut mid-entry), not evidence against the list — it
    leaves the denominator instead of voting it down."""
    denom = n_markers
    last_nonblank = -1
    for i in range(len(lines) - 1, -1, -1):
        if lines[i].strip():
            last_nonblank = i
            break
    if (end == last_nonblank and denom > 0
            and not any(c["line_end"] == end for c in cands)):
        denom -= 1
    return len(cands) * 2 > denom


# ---------------------------------------------------------------------------
# Bib-field parsing (capability of LOCDB-V3/imgProcessing.py:801-968 /
# mapHTML LOCDB-V3/xmlProcessing.py:279-397, re-derived as regexes).
# ---------------------------------------------------------------------------

_AUTHOR_RE = re.compile(r"([A-Z][\w'À-ɏ-]+),\s*((?:[A-Z]\.\s*)+)")
_VOL_ISSUE_RE = re.compile(r"\b(\d{1,4})\s*\((\d{1,3})\)")
_VOL_RE = re.compile(r"\bvol\.?\s*(\d{1,4})", re.IGNORECASE)
_ISSUE_RE = re.compile(r"\b(?:no|issue)\.?\s*(\d{1,3})", re.IGNORECASE)
_PAGES_RE = re.compile(r"\b(?:pp?\.\s*)?(\d{1,5})\s*[-–—]{1,2}\s*(\d{1,5})\b")
_PUBLOC_RE = re.compile(r"([A-Z][A-Za-z .]+?):\s*([A-Z][\w&. ]+?)(?:[,.;]|$)")
_JOURNAL_RE = re.compile(r"\bIn\s+([A-Z][^,.;]{3,80})")
_LEAD_PUNCT_RE = re.compile(r"^[)\].,:;\s]+")
_TITLE_RE = re.compile(r"([^.]{4,200})\.")
# ':' excluded so a trailing "City: Publisher." chunk is never
# mistaken for a venue (Chicago book citations)
_VENUE_RE = re.compile(r"\s*([A-Z][^,.;:0-9]{3,80})[,.]")
# fallback styles (additive — only consulted when the canonical
# "Surname, I. (YYYY). Title. Venue..." cascade found nothing):
_AUTHOR_INV_RE = re.compile(r"\b((?:[A-Z]\.\s*)+)([A-Z][\w'À-ɏ-]+)")  # "J. Doe"
_QUOTED_TITLE_RE = re.compile(r"[\"“]([^\"”]{4,200}?)[,.]?[\"”]")
# only the optional "in " prefix is case-insensitive; the leading
# [A-Z] capital heuristic must stay case-SENSITIVE or lowercase tokens
# after a quoted title (e.g. 'volume' in '"Title," volume 3') would be
# captured as the journal name
_AFTER_QUOTE_VENUE_RE = re.compile(r"\s*,?\s*(?:[iI][nN]\s+)?([A-Z][^,.;0-9]{3,80})")
_BOOK_TITLE_RE = re.compile(r"\s*,\s*([^,]{4,200}?)\s*[,.]")
# Chicago/MLA "Surname, Firstname." at the string start (no initials);
# normalized to the canonical "Surname F." shape
_AUTHOR_FULLNAME_RE = re.compile(
    r"^([A-Z][\w'À-ɏ-]+),\s+([A-Z][a-zà-ɏ]+)\b")
# Vancouver "Surname AB, Surname C." — dotless initials, authors lead
# the string; first match must start at position 0
_AUTHOR_NODOT_RE = re.compile(
    r"([A-Z][\w'À-ɏ-]+)\s+([A-Z]{1,2})(?=[,.])")
# Harvard single-quoted title: opening quote at start/after space or
# comma (so possessives like O'Brien never open a span)
_SQUOTED_TITLE_RE = re.compile(
    r"(?:^|(?<=[\s,]))['‘]([^'’]{4,200}?)[,.]?['’]")

EMPTY_FIELDS: dict = {
    "authors": None,
    "title": None,
    "journal": None,
    "date": None,
    "publisher": None,
    "location": None,
    "volume": None,
    "issue": None,
    "pages": None,
}


def parse_fields(raw: str) -> dict:
    """Flat bib struct from one citation string. All fields nullable;
    authors is a list. Deterministic regex cascade over the canonical
    shapes 'Surname, I., Surname, I. (YYYY). Title. Venue, vol(no),
    pp. a-b. Location: Publisher.'"""
    s = MARKER_RE.sub("", raw).strip()
    f = dict(EMPTY_FIELDS)

    m_year = YEAR_RE.search(s)
    if m_year:
        f["date"] = m_year.group(1)

    head = s[: m_year.start()] if m_year else s
    authors = ["{} {}".format(a.strip(), b.strip())
               for a, b in _AUTHOR_RE.findall(head)]
    inv_end = None
    nodot_end = None
    if not authors:
        # IEEE/book style "A. Author and B. Writer, ..." — initials
        # first; normalized to the same "Surname I." shape
        inv = list(_AUTHOR_INV_RE.finditer(head))
        # the author list must OPEN the citation — otherwise "Chen B.
        # Deep citation..." steals "B. Deep" from the title
        if inv and inv[0].start() == 0:
            authors = ["{} {}".format(m.group(2), " ".join(m.group(1).split()))
                       for m in inv]
            inv_end = inv[-1].end()
    if not authors:
        # Vancouver "Miller A, Chen B." — dotless initials; only when
        # the author list opens the citation
        nd = list(_AUTHOR_NODOT_RE.finditer(head))
        if nd and nd[0].start() == 0:
            authors = ["{} {}.".format(m.group(1), m.group(2))
                       for m in nd]
            nodot_end = nd[-1].end()
    if not authors:
        # Chicago/MLA "Surname, Firstname." — full first name at the
        # start; normalized to "Surname F."
        m_fn = _AUTHOR_FULLNAME_RE.match(head)
        if m_fn:
            authors = ["{} {}.".format(m_fn.group(1), m_fn.group(2)[0])]
    if authors:
        f["authors"] = authors

    # title: first sentence after the year token (skipping a close-paren/dot)
    if m_year:
        rest = s[m_year.end():]
        rest = _LEAD_PUNCT_RE.sub("", rest)
        if rest[:1] in ("'", "‘"):
            # Harvard: «Surname, I. YYYY, 'Title', Journal, vol...»
            m_sq = _SQUOTED_TITLE_RE.match(rest)
            if m_sq:
                f["title"] = m_sq.group(1).strip()
                tail = _LEAD_PUNCT_RE.sub("", rest[m_sq.end():])
            else:
                tail = rest
        else:
            m_t = _TITLE_RE.match(rest)
            # a "title" that opens with digits/parens is volume/pages
            # debris from year-at-mid styles (MLA/Vancouver), not a
            # title — reject and let the fallbacks run
            if m_t and m_t.group(1)[:1] not in "0123456789(":
                f["title"] = m_t.group(1).strip()
                tail = rest[m_t.end():]
            else:
                tail = rest
    else:
        tail = s

    if f["title"] is None:
        # IEEE/MLA quoted title: «..., "Title," Journal, vol...»
        m_q = _QUOTED_TITLE_RE.search(s)
        if m_q:
            f["title"] = m_q.group(1).strip()
            if not tail.strip() or f["title"] not in tail:
                m_jq = _AFTER_QUOTE_VENUE_RE.match(s[m_q.end():])
                if m_jq:
                    f["journal"] = m_jq.group(1).strip()
        elif inv_end is not None:
            # book style "J. Doe, Title, ed. City: Publisher, year"
            m_bt = _BOOK_TITLE_RE.match(s[inv_end:])
            if m_bt:
                f["title"] = m_bt.group(1).strip()
        elif nodot_end is not None:
            # Vancouver: title is the sentence after the author list,
            # the journal the next one ("Title of work. J Abbrev.
            # YYYY;12(3):1-9.")
            vrest = _LEAD_PUNCT_RE.sub("", s[nodot_end:])
            m_vt = _TITLE_RE.match(vrest)
            if m_vt and m_vt.group(1)[:1] not in "0123456789(":
                f["title"] = m_vt.group(1).strip()
                after = _LEAD_PUNCT_RE.sub("", vrest[m_vt.end():])
                m_vj = _TITLE_RE.match(after)
                # digits mean we ran into the year/volume chunk, not
                # a journal abbreviation
                if m_vj and not any(c.isdigit() for c in m_vj.group(1)):
                    f["journal"] = m_vj.group(1).strip()

    # year-at-end styles leave an empty tail; widen the venue/number
    # scan to the whole string for them (canonical mid-year citations
    # keep the original tail window — identical outputs)
    scan = tail if tail.strip() else s

    m_j = _JOURNAL_RE.search(tail)
    if m_j:
        f["journal"] = m_j.group(1).strip()
    elif f["journal"] is None:
        # venue = next sentence-ish chunk before volume/pages digits
        m_v = _VENUE_RE.match(tail)
        if m_v:
            f["journal"] = m_v.group(1).strip()

    m_vi = _VOL_ISSUE_RE.search(scan)
    if m_vi:
        f["volume"], f["issue"] = m_vi.group(1), m_vi.group(2)
    else:
        m_vol = _VOL_RE.search(scan)
        if m_vol:
            f["volume"] = m_vol.group(1)
        m_iss = _ISSUE_RE.search(scan)
        if m_iss:
            f["issue"] = m_iss.group(1)

    m_p = _PAGES_RE.search(scan)
    if m_p:
        f["pages"] = "{}-{}".format(m_p.group(1), m_p.group(2))

    m_pl = _PUBLOC_RE.search(scan)
    if m_pl:
        f["location"] = m_pl.group(1).strip()
        f["publisher"] = m_pl.group(2).strip()
    return f
