"""Physical-plan audits — the "explain and iterate until it's the plan
you'd want" discipline, executable in tests.

These assert the properties that matter at 100 TB and silently rot:
filters reaching the parquet scan (PushedFilters), column pruning
(ReadSchema), small-side broadcasts (no sort-merge join shuffling the
fact side), and shuffle-free stages. A plan regression that today only
costs seconds at sf0.01 costs a full-corpus shuffle at scale — e.g. the
wave id-map join silently planning as SortMergeJoin would re-shuffle
every html byte of the corpus; `assert_broadcast_join` pins it.

explain() is pure planning — no jobs run — so these are cheap in CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The scan must push a filter containing ``fragment`` (column name
    or literal) into PushedFilters — not evaluate it post-scan only."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"no pushed filter containing {fragment!r}:\n" + "\n".join(pushed or [plan]))


def assert_read_schema_only(df: DataFrame, allowed: set[str]) -> None:
    """Every scan's ReadSchema must be a subset of ``allowed`` — column
    pruning reached the reader (scanning html for a url-only query is
    the kind of 100x read amplification this pins)."""
    import re

    plan = explain_str(df)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        assert cols <= allowed, f"scan reads {cols - allowed} beyond {allowed}"


def assert_broadcast_join(df: DataFrame) -> None:
    """The plan must contain a broadcast join and no SortMergeJoin."""
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, "SortMergeJoin planned where a broadcast was expected"


def assert_no_shuffle(df: DataFrame) -> None:
    """No Exchange anywhere — the computation is map-side only."""
    plan = explain_str(df)
    assert "Exchange" not in plan, "unexpected shuffle:\n" + plan[:2000]
