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


def scan_read_schemas(df: DataFrame) -> list[str]:
    """The ``ReadSchema: struct<...>`` fragment of every file scan in the
    physical plan — what actually gets read off parquet after Catalyst
    column pruning."""
    import re

    return re.findall(r"ReadSchema: (struct<[^>]*>)", physical_plan(df))


def assert_pruned_scan(
    df: DataFrame, allowed_cols: set[str], context: str = ""
) -> None:
    """Assert every parquet scan in the plan reads only ``allowed_cols``.

    This is the 100 TB load-bearing check: a plan whose scan schema
    carries payload columns it doesn't need reads the whole corpus
    (SCALE.md "Edge derivation" — only two columns of the 100 TB are
    read)."""
    import re

    schemas = scan_read_schemas(df)
    if not schemas:
        raise AssertionError(f"no file scan found in plan{context and ' of ' + context}")
    for s in schemas:
        cols = {m.group(1) for m in re.finditer(r"(\w+):", s[len("struct<") :])}
        extra = cols - allowed_cols
        if extra:
            raise AssertionError(
                f"scan reads unpruned columns {sorted(extra)} "
                f"(allowed {sorted(allowed_cols)}){context and ' in ' + context}: {s}"
            )
