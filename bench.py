"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing convention follows the reference: the clock wraps the algorithm,
not the input load (``sequential_node_it/seq_node_it_v1.cpp:205-210``) —
the edge table is built and materialized once, then each headline query
is timed to completion (count/collect of its result).

Extra keys (ignored by the driver, used by BENCH/BASELINE.md):
edges, vertices, triangles, edges_per_sec for the flagship count.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from paralleltrianglecounting_spark.operators.components import connected_components
from paralleltrianglecounting_spark.operators.labelprop import label_propagation
from paralleltrianglecounting_spark.operators.pagerank import pagerank
from paralleltrianglecounting_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
)
from paralleltrianglecounting_spark.session import get_spark


def _cpu_times() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu line.

    This host shows 4x swings in hypervisor CPU steal between adjacent
    minutes (BENCH/BASELINE.md noise note); capturing steal around every
    rep lets the artifact itself distinguish a code regression (one
    strategy consistently slower at equal steal) from host noise (high
    variance correlated with steal).
    """
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run(sf_dir: str, cores: int) -> dict:
    from paralleltrianglecounting_spark.sources.edges import part_graph

    # normalize first: a trailing slash would defeat the warm-tier
    # exclusion below and warm up on the timed dataset itself
    sf_dir = sf_dir.rstrip("/")

    spark = get_spark(app_name=f"bench-{cores}", cores=cores)

    # JIT/codegen warmup on a smaller tier: each timed query's generated
    # code and the interpreter→C2 transition are paid here, so timings
    # below measure the engine, not JVM warmup. Same convention as the
    # reference's clock, which starts after load (`seq_node_it_v1.cpp:205-210`).
    # sf0.01 (1/10th the bench tier) is preferred: sf0.001's ~9k rows sit
    # below C2's invocation thresholds, leaving the hot generated loops
    # interpreted into the first timed reps (3-7x slow, high variance).
    leaf = sf_dir.rstrip("/").split("/")[-1]
    candidates = [
        sf_dir.replace(leaf, "sf0.01"),
        sf_dir.replace(leaf, "sf0.001"),
        "/root/testdata/sf0.01",  # generated-dir runs (e.g. sf1) warm here
    ]
    warm_dir = next(
        (d for d in candidates if d != sf_dir.rstrip("/") and os.path.isdir(d)), None
    )
    if warm_dir:
        warm = part_graph(spark, warm_dir).persist()
        warm.count()
        for strat in ("intersect", "csr"):
            triangle_count(warm, strategy=strat).collect()
        triangles_per_vertex(warm).count()
        pagerank(warm, iterations=1).count()
        connected_components(warm).count()
        label_propagation(warm, iterations=1).count()
        warm.unpersist()

    edges = part_graph(spark, sf_dir).persist()
    t0 = time.monotonic()
    n_edges = edges.count()  # materialize once; load excluded from query timings
    build_sec = time.monotonic() - t0

    timings: dict[str, float] = {}
    extras: dict[str, float | int] = {"edges": n_edges, "edge_build_sec": round(build_sec, 3)}

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # The contested triangle family gets >=4 interleaved reps so the
    # artifact carries enough samples to separate structure from noise
    # (VERDICT r04 "Next round" #2); the uncontested queries keep `reps`.
    tri_reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_TRI_REPS", "4")), reps)
    raw_timings: dict[str, list[float]] = {}
    rep_steal_pct: dict[str, list[float]] = {}

    def _time_rep(name: str, thunk):
        s0, t0_ticks = _cpu_times()
        t = time.monotonic()
        out = thunk()
        dt = time.monotonic() - t
        s1, t1_ticks = _cpu_times()
        dtot = max(t1_ticks - t0_ticks, 1)
        rep_steal_pct.setdefault(name, []).append(
            round(100.0 * (s1 - s0) / dtot, 2)
        )
        raw_timings.setdefault(name, []).append(round(dt, 3))
        return out

    def timed(name: str, thunk):
        # best-of-reps. (The reference's min-by-over-results, SURVEY §2.5
        # O3, takes the min across *configurations*, not identical runs —
        # this is the adjacent convention for a JIT'd runtime: the first
        # rep of a heavy query still pays C2 compilation of its generated
        # stage code (3-7x), and the min is the steady-state engine cost.)
        # Every raw rep is recorded in the artifact so cross-round
        # comparisons can be made like-for-like regardless of reps.
        out = None
        raw_timings[name] = []
        for _ in range(max(reps, 1)):
            out = _time_rep(name, thunk)
        timings[name] = min(raw_timings[name])
        return out

    def timed_group(entries):
        # Interleave the reps of a query group round-robin (A,B,C,A,B,C)
        # instead of back-to-back (A,A,B,B,C,C). This host drifts ±25-40%
        # between adjacent minutes (BENCH/BASELINE.md noise note), so a
        # ratio between two back-to-back best-ofs compares different time
        # windows; interleaved, every round exposes all strategies to the
        # same drift and the best-of ratio is window-matched.
        outs = {name: None for name, _ in entries}
        for name, _ in entries:
            raw_timings[name] = []
        for _ in range(max(tri_reps, 1)):
            for name, thunk in entries:
                outs[name] = _time_rep(name, thunk)
        for name, _ in entries:
            timings[name] = min(raw_timings[name])
        return outs

    tri_outs = timed_group(
        [
            (
                "triangle_count",
                lambda: triangle_count(edges, strategy="intersect").collect()[0][
                    "triangles"
                ],
            ),
            (
                "triangle_count_csr",
                lambda: triangle_count(edges, strategy="csr").collect()[0]["triangles"],
            ),
            (
                "triangle_count_wedge",
                lambda: triangle_count(edges, strategy="wedge").collect()[0][
                    "triangles"
                ],
            ),
        ]
    )
    tri = tri_outs["triangle_count"]
    tri_csr = tri_outs["triangle_count_csr"]
    assert tri_csr == tri, f"strategy disagreement: intersect={tri} csr={tri_csr}"
    tri_wedge = tri_outs["triangle_count_wedge"]
    assert tri_wedge == tri, f"strategy disagreement: intersect={tri} wedge={tri_wedge}"
    # consume tpv through a SUM, not count(): the per-vertex table joins
    # a unique-keyed aggregate to the vertex list, and Catalyst
    # (correctly) eliminates that join under count(*) — count() measured
    # an empty shell. The sum also cross-checks the result: every
    # triangle has exactly 3 corners.
    tpv_sum = timed(
        "triangles_per_vertex",
        lambda: triangles_per_vertex(edges)
        .agg(F.sum("triangles").alias("s"))
        .collect()[0]["s"],
    )
    assert tpv_sum == 3 * tri, f"corner sum {tpv_sum} != 3x{tri}"
    timed("pagerank_5", lambda: pagerank(edges, iterations=5).count())
    timed("connected_components", lambda: connected_components(edges).count())
    timed(
        "label_propagation_3",
        lambda: label_propagation(edges, iterations=3, detect_stability=False).count(),
    )

    extras["triangles"] = tri
    extras["strategies_agree"] = True  # asserted above (all three)
    extras["reps"] = reps
    extras["tri_reps"] = tri_reps
    extras["raw_timings"] = raw_timings
    # Median-of-interleaved alongside best-of: with steal per rep these
    # three fields make the artifact self-diagnosing for host noise.
    extras["median_timings"] = {
        k: round(_median(v), 3) for k, v in raw_timings.items()
    }
    extras["steal_pct_per_rep"] = rep_steal_pct
    extras["edges_per_sec_triangle_count"] = round(n_edges / timings["triangle_count"], 1)
    extras["csr_over_intersect"] = round(
        timings["triangle_count_csr"] / timings["triangle_count"], 2
    )
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "headline_link_graph_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
        **extras,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # cool-down before measuring: a JVM launched on the heels of
    # sustained heavy load measures uniformly ~2x slow on this host
    # (controlled A/B: 61s total right after a 3.5-min test session vs
    # 33s after ~1 min idle — see BENCH/BASELINE.md measurement-noise
    # note). 45s of idle restores the fast profile.
    time.sleep(int(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN", "45")))
    result = run(sf_dir, cores)
    print(json.dumps(result))
