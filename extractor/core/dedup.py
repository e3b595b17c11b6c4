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


def jaro_winkler_micro(a: str, b: str) -> int:
    """Jaro-Winkler similarity (Jaro, JASA 1989; Winkler, ASA
    Proc. 1990) as an EXACT integer in micro units: the whole
    statistic is the rational (2 m^2 lb + 2 m^2 la + 2 la lb (m -
    x DIV 2)) / (6 la lb m) with the standard Winkler prefix boost
    (p = 0.1, prefix <= 4, applied only when jaro >= 0.7 — the
    boost-threshold convention DuckDB's jaro_winkler_similarity
    implements, verified empirically in the fuzz test), kept in
    integer arithmetic to the single final floor — so 'jw exactly
    0.84' is 840000, not the floor of a float that dithered one
    ulp below (the dwayne/duane case the unit test pins).
    x is the FULL count of order-mismatched matched characters,
    floored to t = x DIV 2; the boost condition jaro >= 0.7 (INCLUSIVE —
    DuckDB boosts at exactly 0.7, caught by the fuzz) is the
    exact integer comparison 10*num >= 7*den."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0  # incl. both-empty: DuckDB's convention, pinned
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i in range(la):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        for j in range(lo, hi):
            if not bm[j] and a[i] == b[j]:
                am[i] = True
                bm[j] = True
                m += 1
                break
    if m == 0:
        return 0
    x = 0
    j = 0
    for i in range(la):
        if am[i]:
            while not bm[j]:
                j += 1
            if a[i] != b[j]:
                x += 1
            j += 1
    # t = x // 2 (FLOORED half-transpositions — the RapidFuzz
    # convention DuckDB ships; the classic x/2 half-integer reading
    # disagrees on odd x, caught by the fuzz test)
    num = (2 * m * m * lb + 2 * m * m * la
           + 2 * la * lb * (m - x // 2))
    den = 6 * la * lb * m
    pl = 0
    for i in range(min(4, la, lb)):
        if a[i] != b[i]:
            break
        pl += 1
    if pl and 10 * num >= 7 * den:
        num = num * (10 - pl) + pl * den
        den = den * 10
    return (1000000 * num) // den
