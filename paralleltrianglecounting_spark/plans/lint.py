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


def _schema_fragments(plan: str) -> list[str]:
    """Every ``ReadSchema: struct<...>`` fragment, extracted with
    bracket-depth matching — a ``[^>]*`` regex truncates at the first
    ``>`` of any *nested* type (``toks:array<string>``), silently
    dropping every column after it and letting the pruning assertion
    pass vacuously (ADVICE r01)."""
    out: list[str] = []
    marker = "ReadSchema: struct<"
    i = 0
    while True:
        j = plan.find(marker, i)
        if j < 0:
            return out
        start = j + len("ReadSchema: ")
        depth = 0
        for pos in range(start, len(plan)):
            ch = plan[pos]
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
                if depth == 0:
                    out.append(plan[start : pos + 1])
                    i = pos + 1
                    break
        else:
            # a started fragment with no balanced close means Spark
            # truncated the schema string — failing silently here would
            # let assert_pruned_scan skip the scan entirely
            raise AssertionError(
                "ReadSchema fragment truncated in plan string (raise "
                "spark.sql.debug.maxToStringFields to verify pruning): "
                + plan[start : start + 120]
            )


def _top_level_cols(fragment: str) -> set[str]:
    """Column names at nesting depth 0 of a ``struct<...>`` fragment
    (inner struct/map field names are type detail, not scanned columns)."""
    inner = fragment[len("struct<") : -1]
    cols: set[str] = set()
    depth = 0
    token: list[str] = []
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif depth == 0:
            if ch == ",":
                token = []
            elif ch == ":":
                if token:
                    cols.add("".join(token))
                token = []
            else:
                token.append(ch)
    return cols


def count_ensure_exchanges(df: DataFrame) -> int:
    """Number of runtime shuffle exchanges (``ENSURE_REQUIREMENTS``) in
    the executed plan — the per-execution data movements Catalyst had to
    insert. Cache-build shuffles print as ``REPARTITION_BY_NUM`` inside
    the nested ``InMemoryRelation`` plan and are deliberately excluded:
    they are paid once at persist time, not per superstep. Used by the
    iterative-operator tests to prove the cached topology never
    re-exchanges inside the loop."""
    count = 0
    for node in _walk_plan(df._jdf.queryExecution().executedPlan()):
        name = node.getClass().getSimpleName()
        if name == "ShuffleExchangeExec" and "ENSURE_REQUIREMENTS" in str(
            node.shuffleOrigin()
        ):
            count += 1
    return count


def _walk_plan(node):
    """Depth-first walk of a JVM SparkPlan via py4j, descending through
    AQE wrappers (AdaptiveSparkPlanExec / query stages) but treating
    ``InMemoryTableScanExec`` as the leaf it is — the cached relation's
    build plan is persist-time history, not part of this execution.
    ``ReusedExchangeExec`` is likewise a leaf: its exchange is counted
    where it physically runs."""
    name = node.getClass().getSimpleName()
    yield node
    if name in ("InMemoryTableScanExec", "ReusedExchangeExec"):
        return
    if name == "AdaptiveSparkPlanExec":
        yield from _walk_plan(node.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk_plan(node.plan())
        return
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk_plan(it.next())


def scan_read_schemas(df: DataFrame) -> list[str]:
    """The ``ReadSchema: struct<...>`` fragment of every file scan in the
    physical plan — what actually gets read off parquet after Catalyst
    column pruning."""
    return _schema_fragments(physical_plan(df))


def assert_pruned_scan(
    df: DataFrame, allowed_cols: set[str], context: str = ""
) -> None:
    """Assert every parquet scan in the plan reads only ``allowed_cols``.

    This is the 100 TB load-bearing check: a plan whose scan schema
    carries payload columns it doesn't need reads the whole corpus
    (SCALE.md "Edge derivation" — only two columns of the 100 TB are
    read)."""
    schemas = scan_read_schemas(df)
    if not schemas:
        raise AssertionError(f"no file scan found in plan{context and ' of ' + context}")
    for s in schemas:
        if "more fields" in s:
            # Spark elides columns past spark.sql.debug.maxToStringFields
            # with "... N more fields" — the hidden columns could be
            # unpruned payload, so "cannot verify" must fail, not pass
            raise AssertionError(
                f"ReadSchema elides columns ('more fields'){context and ' in ' + context}"
                f" — raise spark.sql.debug.maxToStringFields to verify pruning: {s}"
            )
        cols = _top_level_cols(s)
        extra = cols - allowed_cols
        if extra:
            raise AssertionError(
                f"scan reads unpruned columns {sorted(extra)} "
                f"(allowed {sorted(allowed_cols)}){context and ' in ' + context}: {s}"
            )
