"""Fuzzy reference dedup (capability of the reference's Levenshtein
merge of image-detected vs ParsCit-detected strings: match if
``levenshtein(space-stripped) < 10``, ``LOCDB-V3/imgProcessing.py:
414-448``; DP implementation ``:771-798``).

Banded Levenshtein with early exit — the full O(mn) matrix of the
reference collapses to O(n*k) for threshold k, and a length-difference
pre-filter skips most pairs entirely. Pure Python (per-turn ref lists
are tiny: dozens at most); the DataFrame-level analog is Spark's
built-in ``F.levenshtein(a, b) < 10`` theta join (exposed as a
SQL-checkable query in __spark_entry__).
"""

from __future__ import annotations

LEV_THRESHOLD = 10  # match iff distance < 10, per LOCDB-V3/imgProcessing.py:440


def strip_spaces(s: str) -> str:
    return s.replace(" ", "")


def levenshtein_banded(a: str, b: str, cutoff: int) -> int:
    """Levenshtein distance, early-exiting with ``cutoff`` once the
    band minimum exceeds it (returns ``cutoff`` in that case)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) >= cutoff:
        return cutoff
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        bj = b[j - 1]
        row_min = cur[0]
        for i in range(1, la + 1):
            c = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (a[i - 1] != bj),
            )
            cur[i] = c
            if c < row_min:
                row_min = c
        if row_min >= cutoff:
            return cutoff
        prev, cur = cur, prev
    return min(prev[la], cutoff)


def is_near_dup(a: str, b: str, threshold: int = LEV_THRESHOLD) -> bool:
    """Match rule of the reference: distance of space-stripped strings
    strictly below threshold."""
    return levenshtein_banded(strip_spaces(a), strip_spaces(b), threshold) < threshold


def dedup_refs(refs: list[dict], threshold: int = LEV_THRESHOLD) -> list[dict]:
    """Stable keep-first dedup of ref dicts (key 'raw') under the
    near-dup rule. Input order is the detector-priority order (the
    reference keeps the ParsCit-matched string and drops the image
    duplicate); output preserves first-seen order."""
    kept: list[dict] = []
    for r in refs:
        raw = r["raw"]
        dup = False
        for k in kept:
            if is_near_dup(raw, k["raw"], threshold):
                dup = True
                break
        if not dup:
            kept.append(r)
    return kept
