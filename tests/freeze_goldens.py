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


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    df = gen_transcripts(N_TURNS, seed=SEED)
    df.to_parquet(os.path.join(GOLDEN_DIR, "t1_input.parquet"), index=False)
    out = extract_batch(df)
    # refs as JSON string for a stable, engine-neutral frozen format
    out["refs_json"] = [json.dumps(r, sort_keys=True) for r in out["refs"]]
    out.drop(columns=["refs"]).to_parquet(
        os.path.join(GOLDEN_DIR, "t1_expected.parquet"), index=False
    )
    print("froze {} turns (refs: {})".format(len(out), int(out["n_refs"].sum())))


if __name__ == "__main__":
    main()
