"""Property-based fuzz: on arbitrary small graphs, every physical
strategy (intersect / csr / wedge, compact ids on and off) must agree
with the brute-force oracle — the engine's three-way-agreement
methodology (SURVEY.md §5) driven by hypothesis instead of fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from paralleltrianglecounting_spark.operators.triangles import triangle_count
from tests.oracles import triangle_count_brute

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edge_lists)
def test_strategies_agree_with_bruteforce(spark, pairs):
    canon = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    want = triangle_count_brute(canon)
    if canon:
        df = spark.createDataFrame(canon, "src long, dst long")
    else:
        df = spark.createDataFrame([], "src long, dst long")
    for strategy in ("intersect", "csr", "wedge"):
        got = triangle_count(df, strategy=strategy).collect()[0]["triangles"]
        assert got == want, (strategy, canon)
    for compact in (True, False):
        got = triangle_count(df, compact_ids=compact).collect()[0]["triangles"]
        assert got == want, (compact, canon)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edge_lists)
def test_cc_and_lpa_agree_with_oracles(spark, pairs):
    """Arbitrary small graphs: connected components must match
    union-find, synchronous LPA must match the Counter-based oracle —
    including edge cases hypothesis likes (empty graph, self-loops
    only, stars, disconnected singleton edges)."""
    from paralleltrianglecounting_spark.operators.components import (
        connected_components,
    )
    from paralleltrianglecounting_spark.operators.labelprop import label_propagation
    from tests.oracles import components_oracle, label_propagation_oracle

    canon = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    if not canon:
        return
    df = spark.createDataFrame(canon, "src long, dst long")
    got_cc = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got_cc == components_oracle(canon)
    got_lpa = {
        r.vertex: r.label
        for r in label_propagation(df, iterations=3, detect_stability=False).collect()
    }
    assert got_lpa == label_propagation_oracle(canon, iterations=3)
