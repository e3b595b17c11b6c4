"""Similarity joins at sf1 (10x the bench SF) — VERDICT round-2 item 5.

The driver ships sf{0.001,0.01,0.1}; sf1 is synthesized here as 10
letter-rotated copies of the sf0.1 documents table: copy k maps every
ASCII letter through a Caesar rotation by k (case-preserving; digits,
spaces, punctuation untouched). A per-copy bijection on the alphabet
preserves EVERY within-copy structure the five queries measure —
Levenshtein distances (including the 40-char prefix window: lengths
and edit positions are identical), word sets, shingle sets — so each
copy reproduces sf0.1's pair counts exactly, while cross-copy texts
differ in essentially every letter position (same doc across two
copies: all ~33 letters of a 40-char prefix differ, far beyond the
lev<10 / ham<=3 thresholds). Linear candidate/pair growth therefore
predicts ~10x sf0.1's counts for every query; superlinear blowup would
show directly in the rows column. (An earlier word-tag-suffix variant
distorted j4's fixed 40-char prefix window and overproduced pairs —
the rotation design measures the intended quantity.)

Writes bench_data/documents_sf1.parquet (gitignored) on first run.
Prints one JSON line per query: name, wall seconds, output rows.

Run:  python bench_sf1_similarity.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SF1_DOCS = os.path.join(HERE, "bench_data", "documents_sf1.parquet")
QUERIES = ("dedup_ngram_jaccard", "minhash_lsh_candidates",
           "simhash_hamming_pairs", "simhash_near_dup_scaled",
           "j4_near_dup_pairs_lev")


def build_sf1() -> None:
    import pandas as pd

    if os.path.exists(SF1_DOCS):
        return
    src = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")
    n = len(src)
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    copies = []
    for k in range(10):
        c = src.copy()
        c["doc_id"] = c["doc_id"] + k * n
        table = str.maketrans(lower + upper,
                              lower[k:] + lower[:k] + upper[k:] + upper[:k])
        c["text"] = c["text"].str.translate(table)
        copies.append(c)
    out = pd.concat(copies, ignore_index=True)
    os.makedirs(os.path.dirname(SF1_DOCS), exist_ok=True)
    out.to_parquet(SF1_DOCS, index=False, row_group_size=4096)
    print("built sf1 documents:", len(out), "rows", file=sys.stderr)


def main() -> None:
    build_sf1()
    # the queries read "<dir>/documents.parquet"; give them a dir view
    sf1_dir = os.path.join(HERE, "bench_data", "sf1")
    os.makedirs(sf1_dir, exist_ok=True)
    link = os.path.join(sf1_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(SF1_DOCS, link)

    from extractor.job import get_spark
    from extractor.queries import QUERIES as Q

    names = sys.argv[1:] or list(QUERIES)
    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    for sf, d in ((0.1, "/root/testdata/sf0.1"), (1.0, sf1_dir)):
        for name in names:
            df = Q[name](spark, d)
            t0 = time.time()
            rows = df.count()
            dt = time.time() - t0
            print(json.dumps({"query": name, "sf": sf,
                              "sec": round(dt, 2), "rows": rows}),
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
