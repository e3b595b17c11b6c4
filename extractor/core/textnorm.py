"""Text normalization shared by every payload path.

Re-derives the reference's unicode/entity hygiene (capability of
``LOCDB-V3/imgProcessing.py:291-306`` utf8 encode/decode dance and
``dev-version/imgProcessing.py:196`` HTML-entity unescape chain) as one
deterministic function so the oracle and the Spark UDF can never
disagree on whitespace or encoding.
"""

from __future__ import annotations

import html
import re
import unicodedata

_WS_RUN = re.compile(r"[ \t\f\v]+")
_NL_RUN = re.compile(r"\n{3,}")

# Base64 payloads embedded in transcript text (data-URI images pasted
# into markdown, MIME-style attachment walls in tool logs) are noise
# for any text consumer — they wreck token counts, quality scores, and
# dedup shingles. Three shapes, all impossible in natural prose:
#   - data: URIs with a base64 payload (any length >= 16)
#   - full LINES of >= 60 base64 chars (MIME wraps at 76 columns)
#   - in-line unbroken runs of >= 120 base64 chars
_B64_DATA_URI = re.compile(r"data:[\w.+-]+/[\w.+-]+;base64,[A-Za-z0-9+/=]{16,}")
_B64_LINES = re.compile(r"(?:^[A-Za-z0-9+/]{60,}={0,2}$\n?)+", re.MULTILINE)
_B64_INLINE = re.compile(r"[A-Za-z0-9+/]{120,}={0,2}")
_B64_PRECHECK = re.compile(r"[A-Za-z0-9+/]{60}")


def strip_base64_blobs(s: str) -> str:
    """Remove embedded base64 payloads (see pattern comments above).
    Identity unless a plausible blob marker is present."""
    if "base64," in s:
        s = _B64_DATA_URI.sub("", s)
    # cheap pre-check: the line/inline rules need a 60+ char run
    if _B64_PRECHECK.search(s):
        s = _B64_LINES.sub("", s)
        s = _B64_INLINE.sub("", s)
    return s


def unescape_entities(s: str) -> str:
    """HTML entity unescape, applied twice (double-escaped corpora are
    common; the reference chains unescape calls the same way).
    Fast path: unescape is the identity when no '&' is present."""
    if "&" not in s:
        return s
    s = html.unescape(s)
    if "&" not in s:
        return s
    return html.unescape(s)


def nfc(s: str) -> str:
    # NFC is the identity on ASCII (fast path; is_normalized rechecks
    # the rest cheaply before paying for a full normalize pass)
    if s.isascii() or unicodedata.is_normalized("NFC", s):
        return s
    return unicodedata.normalize("NFC", s)


def collapse_inline_ws(s: str) -> str:
    """Collapse runs of spaces/tabs to one space; strip line edges."""
    # fast path: single spaces are already collapsed; the regex only
    # changes anything when a tab/ff/vt or a double space is present
    if "  " not in s and "\t" not in s and "\f" not in s and "\v" not in s:
        return s.strip()
    return _WS_RUN.sub(" ", s).strip()


def normalize_block(s: str) -> str:
    """Normalize one text block: NFC + entity unescape + inline-ws
    collapse. Newlines inside a block become spaces."""
    s = nfc(unescape_entities(s))
    if "\n" not in s and "\r" not in s:  # single-line fast path
        return collapse_inline_ws(s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = " ".join(part for part in (p.strip() for p in s.split("\n")) if part)
    return collapse_inline_ws(s)


def normalize_plain(s: str) -> str:
    """Normalize multi-line plain text, preserving line structure:
    base64-blob strip, NFC + unescape, per-line inline-ws collapse,
    >=3 blank lines -> 1."""
    s = strip_base64_blobs(s)
    s = nfc(unescape_entities(s))
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    lines = [collapse_inline_ws(ln) for ln in s.split("\n")]
    out = "\n".join(lines).strip("\n")
    out = _NL_RUN.sub("\n\n", out)
    return out


def normalize_pre(s: str) -> str:
    """Normalize preformatted text (code/console blocks): NFC + entity
    unescape only — indentation and intra-line spacing are meaning,
    so whitespace is left alone except for newline canonicalization
    and outer blank-line trim."""
    s = nfc(unescape_entities(s))
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s.strip("\n")
