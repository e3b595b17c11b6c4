"""Freeze the golden fixtures (SURVEY.md §5.2 item 1).

Writes tests/goldens/t1_input.parquet (a frozen copy of the seeded
synthetic transcripts — frozen so later generator evolution can't
silently invalidate goldens) and t1_expected.parquet (the
single-threaded pandas-oracle extraction). The Spark job must match
the expected table byte-for-byte per (conv_id, turn_idx).

Run: python -m tests.freeze_goldens
"""

from __future__ import annotations

import json
import os

from extractor.core.batch import extract_batch
from extractor.gen_fixtures import gen_transcripts

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "goldens")
N_TURNS = 400
SEED = 42


def _freeze(df, tag: str) -> None:
    df.to_parquet(os.path.join(GOLDEN_DIR, tag + "_input.parquet"),
                  index=False)
    out = extract_batch(df)
    # refs as JSON string for a stable, engine-neutral frozen format
    out["refs_json"] = [json.dumps(r, sort_keys=True) for r in out["refs"]]
    out.drop(columns=["refs"]).to_parquet(
        os.path.join(GOLDEN_DIR, tag + "_expected.parquet"), index=False
    )
    print("froze {} {} turns (refs: {})".format(
        len(out), tag, int(out["n_refs"].sum())))


def adversarial_transcripts():
    """make_adversarial_docs as a transcripts-shaped frame (one conv
    per case, tool=browser)."""
    import pandas as pd

    from extractor.gen_fixtures import make_adversarial_docs

    docs = make_adversarial_docs()
    return pd.DataFrame({
        "conv_id": ["adv-" + name for name, _ in docs],
        "turn_idx": pd.array([0] * len(docs), dtype="int32"),
        "role": ["user"] * len(docs),
        "text": [html for _, html in docs],
        "tool": ["browser"] * len(docs),
        "ts": pd.to_datetime(["2026-01-01"] * len(docs)),
    })


def native_transcripts():
    """make_transcript_native_cases as a transcripts-shaped frame."""
    import pandas as pd

    from extractor.gen_fixtures import make_transcript_native_cases

    rows = make_transcript_native_cases()
    return pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": [r[4] for r in rows],
        # microsecond resolution like gen_transcripts: pandas' ns
        # default writes INT64(ns), which Spark's NTZ reader rejects
        # when mixed with us files in one directory
        "ts": pd.to_datetime(["2026-01-01"] * len(rows))
        .astype("datetime64[us]"),
    })


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    _freeze(gen_transcripts(N_TURNS, seed=SEED), "t1")
    # t2: adversarial real-world-shaped HTML (nested layout tables,
    # RTL, minified single-line, deep nesting, spaceless CJK, entity
    # soup) — VERDICT round-1 item 10
    _freeze(adversarial_transcripts(), "t2")
    # t3: transcript-NATIVE payloads (tool-output JSON, streamed HTML
    # fragments, base64-embedded binaries, interleaved roles) —
    # VERDICT round-2 item 8
    _freeze(native_transcripts(), "t3")


if __name__ == "__main__":
    main()
