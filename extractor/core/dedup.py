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

from collections import Counter

LEV_THRESHOLD = 10  # match iff distance < 10, per LOCDB-V3/imgProcessing.py:440


def strip_spaces(s: str) -> str:
    return s.replace(" ", "")


def _counter_diff_bound(ca: Counter, cb: Counter) -> int:
    """ceil(symmetric-multiset-difference / 2) from prebuilt Counters —
    a Levenshtein lower bound: an insert/delete changes the char
    multiset by 1, a substitution by 2.

    Computed as total_a + total_b - 2*intersection with ONE loop over
    the smaller counter (identity: sum of positive diffs both ways
    == la + lb - 2*sum(min)); Counter.total() is C-speed."""
    if len(cb) < len(ca):
        ca, cb = cb, ca
    get = cb.get
    inter = 0
    for ch, n in ca.items():
        m = get(ch, 0)
        inter += m if m < n else n
    return (ca.total() + cb.total() - 2 * inter + 1) // 2


def _multiset_lower_bound(a: str, b: str) -> int:
    """String-input wrapper over _counter_diff_bound (Counter counting
    is C-speed — a cheap reject for the common non-duplicate pair)."""
    return _counter_diff_bound(Counter(a), Counter(b))


def levenshtein_banded(a: str, b: str, cutoff: int) -> int:
    """Levenshtein distance with Ukkonen banding: only cells within
    ``cutoff`` of the diagonal are computed (O(n * cutoff) instead of
    the reference's full O(mn) matrix), early-exiting once the band
    minimum reaches ``cutoff`` (returns ``cutoff`` in that case)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) >= cutoff:
        return cutoff
    if _multiset_lower_bound(a, b) >= cutoff:
        return cutoff
    return _band_dp(a, b, cutoff)


def _band_dp(a: str, b: str, cutoff: int) -> int:
    """The banded DP itself (callers have already applied the cheap
    equality / length / multiset gates)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if la == 0:
        return lb  # < cutoff here (length gate above)
    k = cutoff
    INF = cutoff + 1
    prev = [j if j <= k else INF for j in range(la + 1)]
    for i in range(1, lb + 1):
        lo = max(1, i - k)
        hi = min(la, i + k)
        cur = [INF] * (la + 1)
        cur[0] = i if i <= k else INF
        bi = b[i - 1]
        left = cur[lo - 1]
        row_min = INF
        for j in range(lo, hi + 1):
            c = prev[j - 1] + (a[j - 1] != bi)
            up = prev[j] + 1
            if up < c:
                c = up
            lft = left + 1
            if lft < c:
                c = lft
            cur[j] = left = c
            if c < row_min:
                row_min = c
        if row_min >= cutoff:
            return cutoff
        prev = cur
    d = prev[la]
    return d if d < cutoff else cutoff


def is_near_dup(a: str, b: str, threshold: int = LEV_THRESHOLD) -> bool:
    """Match rule of the reference: distance of space-stripped strings
    strictly below threshold."""
    return levenshtein_banded(strip_spaces(a), strip_spaces(b), threshold) < threshold


def dedup_refs(refs: list[dict], threshold: int = LEV_THRESHOLD) -> list[dict]:
    """Stable keep-first dedup of ref dicts (key 'raw') under the
    near-dup rule. Input order is the detector-priority order (the
    reference keeps the ParsCit-matched string and drops the image
    duplicate); output preserves first-seen order.

    Per-string stripped text and char Counter are computed ONCE and
    reused across all pair comparisons (the naive loop rebuilt two
    Counters per pair — the dominant dedup cost on ref-heavy turns)."""
    kept: list[dict] = []
    kept_info: list[list] = []  # [stripped, Counter-or-None, len]
    for r in refs:
        s = strip_spaces(r["raw"])
        cs = None  # built lazily — most refs never reach the multiset gate
        ls = len(s)
        dup = False
        if threshold > 0:
            for info in kept_info:
                s2, cs2, ls2 = info
                if s == s2:
                    dup = True
                    break
                if abs(ls - ls2) >= threshold:
                    continue
                if cs is None:
                    cs = Counter(s)
                if cs2 is None:
                    cs2 = info[1] = Counter(s2)
                if _counter_diff_bound(cs, cs2) >= threshold:
                    continue
                if _band_dp(s, s2, threshold) < threshold:
                    dup = True
                    break
        if not dup:
            kept.append(r)
            kept_info.append([s, cs, ls])
    return kept
