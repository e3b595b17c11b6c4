"""Fused per-batch extraction: one pandas DataFrame in, one out.

This is the single body shared by (a) the Spark ``mapInPandas`` stage
(``extractor.job``) and (b) the single-threaded oracle that freezes the
golden fixtures — per-turn byte equality between the two is therefore a
property of the *plan* (partitioning, ordering, Arrow round-trip), not
of duplicated logic.

Dispatch mirrors the reference's extension router
(``LOCDB-V3/fileProcessor.py:39-119``, S3): the ``tool`` column marks
the payload kind (``browser`` -> HTML, ``pdf`` -> glyph JSON, anything
else -> plain text), handled with per-batch masks instead of three
separate jobs.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

from extractor.core import dedup, html_strip, pdf_layout, refseg
from extractor.core.textnorm import normalize_plain

OUTPUT_COLUMNS = ["conv_id", "turn_idx", "clean_text", "refs", "n_refs"]


def _plain_refs(clean_text: str, detector_default: str = "anchor") -> list[dict]:
    """Segment normalized plain text; fill char spans from the line
    offset index; geometry fields take the non-pdf defaults."""
    cands = refseg.segment_text(clean_text)
    if not cands:
        return []
    lines = clean_text.split("\n")
    starts, lengths = pdf_layout.line_offset_index(lines)
    refs = []
    for c in cands:
        ls, le = c["line_start"], c["line_end"]
        refs.append({
            "raw": c["raw"],
            "span_start": int(starts[ls]),
            "span_end": int(starts[le] + lengths[le]),
            "line_start": -1,
            "line_end": -1,
            "bbox": None,
            "detector": c["detector"],
            "fields": refseg.parse_fields(c["raw"]),
        })
    return refs


_TAG_RE = re.compile(r"<[^>]{0,400}>")


def _json_head(text: str) -> str:
    """First non-whitespace char without lstrip's full-string copy
    (payloads run to MBs; this is on every plain turn's path)."""
    i = 0
    n = len(text)
    while i < n and text[i] in " \t\r\n":
        i += 1
    return text[i:i + 1]


def _flatten_tool_json(text: str) -> str | None:
    """Tool-output JSON blob -> newline-joined string leaf values.

    Agent transcripts carry tool results as JSON (search hits, API
    responses); the trainable text lives in the string leaves, the
    keys/numbers are schema noise. Deterministic document-order
    traversal (dict insertion order == document order under
    json.loads); embedded HTML markup in values is tag-stripped;
    bare URL / data-URI values are dropped. Returns None when the
    payload is not a JSON object/array — the caller falls back to the
    plain-text path, so almost-JSON stays raw rather than half-parsed."""
    if _json_head(text) not in ("{", "["):
        return None
    try:
        doc = json.loads(text)
    except (ValueError, RecursionError):
        return None
    if not isinstance(doc, (dict, list)):
        return None
    out: list[str] = []
    stack: list = [doc]
    while stack:  # iterative: payload nesting depth must not crash us
        node = stack.pop()
        if isinstance(node, dict):
            stack.extend(reversed(list(node.values())))
        elif isinstance(node, list):
            stack.extend(reversed(node))
        elif isinstance(node, str):
            v = node
            if v.startswith(("http://", "https://", "data:")):
                continue
            if "<" in v:
                v = _TAG_RE.sub("", v)
            if v.strip():
                out.append(v)
    return "\n".join(out)


# oversize-payload clamp (P9 analog: the reference resizes inputs over
# 3500px before analysis, LOCDB-V3/imgProcessing.py:24-28) — a single
# pathological multi-MB turn must not pin an executor core
MAX_PAYLOAD_CHARS = 2_000_000


def extract_one(text: str, tool: str) -> tuple[str, list[dict]]:
    """Extract (clean_text, refs) for one turn. Deterministic."""
    # pandas null spellings: Arrow delivers None, but CSV round-trips
    # and hand-built oracle frames deliver NaN — a truthy float that
    # would crash len() below and sneak a "tool" past the JSON gate
    if text is None or not isinstance(text, str):
        return "", []
    if not isinstance(tool, str):
        tool = ""
    if len(text) > MAX_PAYLOAD_CHARS:
        text = text[:MAX_PAYLOAD_CHARS]
    if tool == "browser":
        res = html_strip.strip_html(text)
        refs = res["refs"]
        if not refs:
            refs = _plain_refs(res["clean_text"])
        return res["clean_text"], dedup.dedup_refs(refs)
    if tool == "pdf":
        res = pdf_layout.extract_pdf(text)
        if res is not None:
            return res["clean_text"], dedup.dedup_refs(res["refs"])
        # unparseable glyph payload -> plain fallback (raw, never the
        # JSON flattener: a malformed glyph table half-flattened to its
        # string leaves would silently look like clean output)
    elif tool and _json_head(text) in ("{", "["):
        # flatten only TOOL-emitted JSON (search/api payloads): a
        # user/assistant turn (tool='') whose text happens to be
        # pasted JSON is content, not a payload — flattening would
        # drop its keys and every non-string leaf
        flat = _flatten_tool_json(text)
        if flat is not None:
            clean = normalize_plain(flat)
            return clean, dedup.dedup_refs(_plain_refs(clean))
    clean = normalize_plain(text)
    return clean, dedup.dedup_refs(_plain_refs(clean))


def extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch entry: requires columns conv_id, turn_idx, text, tool.

    Returns OUTPUT_COLUMNS with ``refs`` as list-of-dicts (Arrow maps
    it onto the ArrayType(StructType) schema in extractor.schema).
    """
    texts = pdf["text"].to_numpy(dtype=object)
    tools = pdf["tool"].to_numpy(dtype=object)
    clean_out = np.empty(len(pdf), dtype=object)
    refs_out = np.empty(len(pdf), dtype=object)
    for i in range(len(pdf)):
        c, r = extract_one(texts[i], tools[i] or "")
        clean_out[i] = c
        refs_out[i] = r
    return pd.DataFrame({
        "conv_id": pdf["conv_id"].to_numpy(dtype=object),
        "turn_idx": pdf["turn_idx"].to_numpy(),
        "clean_text": clean_out,
        "refs": refs_out,
        "n_refs": np.array([len(r) for r in refs_out], dtype=np.int32),
    })
