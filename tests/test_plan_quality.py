"""Physical-plan regression guards (SURVEY.md §4).

The scale story rests on three plan properties that are easy to break
silently with an innocent-looking refactor:

1. the null-text filter reaches the parquet scan (PushedFilters),
2. the scan reads only the 4 needed columns (ReadSchema pruning),
3. the job has exactly ONE wide exchange (the salted repartition) —
   no accidental extra shuffle before or after the Arrow stage.

These assertions read the *formatted explain*, not timings, so they
are stable across machines.
"""

from __future__ import annotations

import re

from extractor import job
from tests.conftest import GOLDEN_INPUT


def _formatted_plan(spark) -> str:
    df = job.plan_extract(job.read_transcripts(spark, GOLDEN_INPUT), 16)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_null_filter_pushed_to_scan(spark):
    plan = _formatted_plan(spark)
    scan = plan[plan.index("Scan parquet"):]
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan)
    assert pushed is not None, plan
    assert "IsNotNull(text)" in pushed.group(1), pushed.group(1)


def test_scan_reads_only_needed_columns(spark):
    plan = _formatted_plan(spark)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"conv_id", "turn_idx", "text", "tool"}, cols


def test_exactly_one_exchange(spark):
    plan = _formatted_plan(spark)
    # count numbered operator entries ("(4) Exchange"), not tree-art
    # lines — formatted explain prints each operator twice
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, "expected the single salted repartition, got:\n" + plan


def test_arrow_eval_python_stage_present(spark):
    # the extraction stage must be the Arrow-batched map, not a
    # row-at-a-time BatchEvalPython
    plan = _formatted_plan(spark)
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
