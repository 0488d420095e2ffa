"""Round-cost curve for k-truss peeling: incremental (support deltas)
vs full re-enumeration (VERDICT r03 #1 'done' criterion).

Fixture = domino deep-cascade strip (sources/planted.py:
domino_truss_graph — Θ(n) peel rounds, O(1) frontier per round) UNION
a stable ballast of disjoint 4-cliques (every 4-clique is its own
4-truss: each edge has support 2, so the ballast never peels). The
ballast models the production regime: a huge surviving subgraph with a
small frontier cascading at its edge.

The claim under test: the incremental variant's steady-state round cost
is ∝ frontier (FLAT as the ballast grows — it pays the full O(E^1.5)
enumeration once, at init, then only a linear state scan plus
frontier-neighborhood intersection work per round), while the
full-recount variant's round cost grows with |E_surviving| (it re-
enumerates the whole ballast's triangles EVERY round). So the tool runs
the same cascade at several ballast sizes and reports the steady-state
round-second median per (variant, ballast) — the incremental row should
stay flat while the full-recount row climbs.

Per-round wall time comes from the superstep manifests; the per-round
frontier from state-row deltas.

Writes BENCH/ktruss_rounds.json. Run:
    python tools/ktruss_rounds.py [n_links] [k] [ballast_sizes_csv]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from paralleltrianglecounting_spark.operators.ktruss import k_truss_run  # noqa: E402
from paralleltrianglecounting_spark.session import get_spark  # noqa: E402
from paralleltrianglecounting_spark.sources.planted import (  # noqa: E402
    domino_truss_graph,
)


def clique_ballast(spark, n_cliques: int, base: int = 10_000_000):
    """6·n_cliques edges of disjoint 4-cliques — a stable 4-truss bulk
    (every edge has support 2 inside its clique; nothing ever peels)."""
    from pyspark.sql import functions as F

    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c = spark.range(n_cliques).select((F.lit(base) + F.col("id") * 4).alias("v0"))
    return c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("v0") + a).alias("src"), (F.col("v0") + b).alias("dst")
                    )
                    for a, b in pairs
                ]
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    m = len(xs) // 2
    return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2


def run_variant(spark, edges, k: int, incremental: bool) -> dict:
    ck_root = tempfile.mkdtemp(prefix="ktruss_rounds_")
    t0 = time.monotonic()
    res = k_truss_run(
        edges,
        k=k,
        checkpoint_dir=ck_root,
        max_iterations=500,
        resume=False,
        incremental=incremental,
    )
    total = time.monotonic() - t0
    rounds = []
    prev_t = None
    prev_rows = None
    for m in res.metrics:
        if "wall_time" not in m:
            continue
        rows = m.get("rows")
        rounds.append(
            {
                "iteration": m["iteration"],
                "sec": None if prev_t is None else round(m["wall_time"] - prev_t, 3),
                "state_rows": rows,
                "dropped": None
                if prev_rows is None or rows is None
                else prev_rows - rows,
            }
        )
        prev_t = m["wall_time"]
        prev_rows = rows
    shutil.rmtree(ck_root, ignore_errors=True)
    # steady state: skip the first two timed rounds (JIT + init spill)
    timed = [r["sec"] for r in rounds if r["sec"] is not None]
    steady = timed[2:] or timed
    return {
        "incremental": incremental,
        "iterations": res.iterations,
        "converged": res.converged,
        "total_sec": round(total, 2),
        "steady_round_median_sec": round(_median(steady), 3),
        "rounds": rounds,
    }


def main() -> None:
    n_links = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sizes = (
        [int(s) for s in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [30_000, 120_000, 480_000]
    )
    spark = get_spark(cores=8)

    out = {
        "fixture": f"domino_truss_graph(n_links={n_links}) + disjoint-4-clique ballast",
        "k": k,
        "ballast_sweep": [],
    }
    for n_ballast in sizes:
        edges = (
            domino_truss_graph(spark, n_links)
            .unionByName(clique_ballast(spark, n_ballast))
            .cache()
        )
        n_edges = edges.count()
        entry = {"ballast_cliques": n_ballast, "edges": n_edges, "variants": {}}
        for incremental in (True, False):
            key = "incremental" if incremental else "full_recount"
            print(f"ballast={n_ballast} {key} ...", flush=True)
            entry["variants"][key] = run_variant(spark, edges, k, incremental)
        inc = entry["variants"]["incremental"]
        full = entry["variants"]["full_recount"]
        entry["steady_round_speedup"] = round(
            full["steady_round_median_sec"]
            / max(inc["steady_round_median_sec"], 1e-9),
            2,
        )
        out["ballast_sweep"].append(entry)
        edges.unpersist()

    # the headline: incremental steady rounds flat across ballast sizes,
    # full-recount steady rounds growing with |E|
    out["steady_round_median_sec"] = {
        key: [
            e["variants"][key]["steady_round_median_sec"]
            for e in out["ballast_sweep"]
        ]
        for key in ("incremental", "full_recount")
    }
    out["edges_per_level"] = [e["edges"] for e in out["ballast_sweep"]]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ktruss_rounds.json", "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {k: v for k, v in out.items() if k != "ballast_sweep"}, indent=1
        )
    )


if __name__ == "__main__":
    main()
