"""Plan linting: enforce the "no per-row Python" contract mechanically.

BASELINE.json's input_hint bans row-at-a-time Python UDFs; the only
Python allowed in any data path is Arrow-vectorized (mapInPandas /
mapInArrow / applyInPandas). Scalar Python UDFs show up in physical
plans as ``BatchEvalPython`` (or ``PythonUDF`` in expressions); Arrow
ones as ``ArrowEvalPython`` / ``MapInArrow`` / ``FlatMapGroupsInPandas``.
A test walks every contract query through this check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FORBIDDEN = ("BatchEvalPython",)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_scalar_python(df: DataFrame, context: str = "") -> None:
    plan = physical_plan(df)
    for marker in FORBIDDEN:
        if marker in plan:
            raise AssertionError(
                f"scalar Python UDF ({marker}) found in plan{' of ' + context if context else ''}:\n{plan}"
            )
