"""Physical-plan inspection helpers.

The engine's scale contract isn't just "right answers" — it's "right
plans": filters reach the Parquet scan (PushedFilters), projections prune
columns (ReadSchema), and the relational hot path stays inside
WholeStageCodegen with no Python evaluation. These helpers make those
properties assertable in tests instead of eyeballed in explain output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Assert every fragment appears inside a PushedFilters clause of the
    physical plan (i.e., the predicate reached the Parquet reader)."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, (
            f"filter fragment {frag!r} not pushed to scan.\n"
            f"PushedFilters lines:\n{joined}\nFull plan:\n{plan[:4000]}"
        )
    return plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists of every ReadSchema in the plan (projection pruning)."""
    plan = explain_str(df)
    out = []
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            out.append(ln.split("ReadSchema:", 1)[1].strip())
    return out


def assert_no_python_in_plan(df: DataFrame) -> str:
    """Assert the plan contains no Python row evaluation (BatchEvalPython
    = per-row Python UDF — banned by input_hint; ArrowEvalPython /
    MapInPandas/FlatMapGroupsInPandas are the sanctioned vectorized
    operators and are allowed)."""
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan, (
        f"per-row Python UDF in plan:\n{plan[:4000]}"
    )
    return plan
