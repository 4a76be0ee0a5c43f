"""Plan-inspection helpers: the engine's "did Catalyst do what I meant"
toolkit (SURVEY.md §4). Used by tests/test_plans.py to pin the physical
properties that matter at 100 TB — filters reaching the parquet scan,
dimension joins going broadcast, codegen staying on."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate was pushed into the parquet scan."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    assert fragment in plan.split("PushedFilters:", 1)[1].split("]", 1)[0], (
        f"filter {fragment!r} not pushed:\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, columns: list[str]) -> None:
    """Assert column pruning: the parquet ReadSchema contains exactly the
    expected columns (projection reached the scan)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1]
            for c in columns:
                assert c in schema, f"column {c} missing from ReadSchema: {schema}"
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of *shuffle* exchanges in the physical plan (broadcast
    exchanges excluded — they move dimension-sized data) — the scalar to
    minimize; tests pin upper bounds for the hot operators."""
    plan = physical_plan(df, "simple")  # formatted mode lists nodes twice
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def has_wholestage_codegen(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "codegen id" in plan or "WholeStageCodegen" in plan
