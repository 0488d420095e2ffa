"""Scaling-efficiency evidence for the north_rule (≥0.8 going N → 4N).

No multi-executor cluster exists in this sandbox, so — per the round
driver's instruction — the two-cluster-size criterion is evidenced by
running the *identical* job at multiple local parallelism levels (fresh
JVM per level, ``local[N]``) on the same input and reporting throughput
at each plus pairwise efficiency. This is the Spark analog of the
reference's own thread sweep
(``test/parallel_edge_it_manual_threads_test/graph_10k/{2,4,8,16,24}t.png``,
orchestrated like ``CV_PROGRAM/orchestrator.cpp:105-139`` — one child
process per configuration so no state leaks between runs).

Workload sizing: the sf0.1 part graph alone (1.2 M edges) finishes in
~5 s — fixed per-query cost (codegen/JIT, stage launch) hides any
core-count effect. The scaling job therefore runs on ``--copies``
disjoint isomorphic copies (``sources.edges.replicated``; default 16 →
19.1 M edges, 30.2 M triangles) after a JIT warmup pass on the single
copy, taking the best of ``--reps`` timed runs per level for the
flagship (one run for the iterative queries, whose per-superstep fixed
cost is reported separately). Exact counts are asserted equal across
levels — exactness is parallelism-invariant.

Interpreting the levels: N→4N executor scaling on a real cluster adds
memory bandwidth, shuffle I/O, and network in proportion to cores; a
single box does not. The CPU-bound regime (local[2]→local[8] on this
32-core host) is therefore the faithful stand-in for executor scaling;
the local[8]→local[32] pair additionally shows where one box's shared
memory bus saturates (the same wall the reference's OpenMP build hit at
every thread count, ``test/parallel_edge_it_openmp_test/graph_10k``).

efficiency = (t_low / t_high) / (cores_high / cores_low)

Usage:
    python tools/scaling.py [--levels 2 8 32] [--reps 3] [--copies 16]
                            [--sf-dir /root/testdata/sf0.1] [--out BENCH]

Writes ``<out>/scaling.json`` and ``<out>/BASELINE.md``; prints the JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """\
import json, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir, cores, copies, reps = sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])

from paralleltrianglecounting_spark.session import get_spark
from paralleltrianglecounting_spark.sources.edges import part_graph, replicated
from paralleltrianglecounting_spark.operators.triangles import triangle_count
from paralleltrianglecounting_spark.operators.pagerank import pagerank
from paralleltrianglecounting_spark.operators.components import connected_components
from paralleltrianglecounting_spark.operators.labelprop import label_propagation

spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
base = part_graph(spark, sf_dir).persist()
base.count()
# offset 2^25 keeps every replicated id under 2^31 so the compact-id
# (int32) payload path engages — the same plan a dense-id production
# run gets
big = replicated(base, copies, offset=1 << 25).persist()
n_edges = big.count()

# JIT/codegen warmup — twice on the big flagship itself (C2 needs the
# actual generated stage code hot; profiling showed the first two
# executions run 3-7x slower while interpreted), once per other query.
triangle_count(big).collect()
triangle_count(big).collect()
pagerank(base, iterations=1).count()
connected_components(base).count()
label_propagation(base, iterations=1).count()

raw = {}
def best(name, thunk, n):
    out, t_best = None, None
    raw[name] = []
    for _ in range(n):
        t0 = time.monotonic()
        out = thunk()
        dt = time.monotonic() - t0
        raw[name].append(round(dt, 3))
        t_best = dt if t_best is None else min(t_best, dt)
    return out, round(t_best, 3)

# iterative queries run best-of-2 (not 1): this host shows +-25%
# between back-to-back identical JVMs (page-cache/GC turbulence), and
# a single-shot 2-core reading poisons every efficiency ratio built on
# it. Raw per-rep times ship in the artifact so the variance is
# inspectable rather than hidden.
iter_reps = max(2, reps - 1)
timings = {}
tri, timings["triangle_count"] = best(
    "triangle_count", lambda: triangle_count(big).collect()[0]["triangles"], reps)
_, timings["pagerank_3"] = best(
    "pagerank_3", lambda: pagerank(big, iterations=3).count(), iter_reps)
_, timings["connected_components"] = best(
    "connected_components", lambda: connected_components(big).count(), iter_reps)
_, timings["label_propagation_3"] = best(
    "label_propagation_3", lambda: label_propagation(big, iterations=3).count(), iter_reps)

print("SCALEROW " + json.dumps({
    "cores": cores, "copies": copies, "edges": n_edges, "triangles": tri,
    "queries": timings, "raw_timings": raw, "value": round(sum(timings.values()), 3),
    "edges_per_sec_triangle_count": round(n_edges / timings["triangle_count"], 1),
}))
"""


def run_level(
    sf_dir: str, cores: int, copies: int, reps: int, cooldown: int = 20
) -> dict:
    """One fresh JVM per level (getOrCreate would reuse the first
    master). A cool-down precedes each level: a child launched on the
    heels of a just-exited heavy JVM measures uniformly ~1.8x slow
    (observed r02 — page-cache/allocator turbulence), poisoning that
    level's every rep."""
    import time

    time.sleep(cooldown)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, REPO, sf_dir, str(cores), str(copies), str(reps)],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return next(
        json.loads(line[len("SCALEROW ") :])
        for line in out.stdout.splitlines()
        if line.startswith("SCALEROW ")
    )


def _pair(low: dict, high: dict) -> dict:
    factor = high["cores"] / low["cores"]
    speed = high["edges_per_sec_triangle_count"] / low["edges_per_sec_triangle_count"]
    per_query = {}
    for q, t_low in low["queries"].items():
        t_high = high["queries"][q]
        s = t_low / t_high if t_high else float("nan")
        per_query[q] = {"speedup": round(s, 3), "efficiency": round(s / factor, 3)}
    return {
        "cores_low": low["cores"],
        "cores_high": high["cores"],
        "factor": factor,
        "speedup_flagship": round(speed, 3),
        "efficiency_flagship": round(speed / factor, 3),
        "per_query": per_query,
    }


def scaling_report(levels: list[dict], sf_dir: str) -> dict:
    pairs = [_pair(levels[i], levels[i + 1]) for i in range(len(levels) - 1)]
    tris = {lv["triangles"] for lv in levels}
    return {
        "metric": "scaling_efficiency_across_parallelism_levels",
        "sf_dir": sf_dir,
        "copies": levels[0]["copies"],
        "edges": levels[0]["edges"],
        "triangles": levels[0]["triangles"],
        "triangles_match_all_levels": len(tris) == 1,
        "levels": [
            {
                "cores": lv["cores"],
                "queries": lv["queries"],
                "raw_timings": lv.get("raw_timings"),
                "total_sec": lv["value"],
                "edges_per_sec_triangle_count": lv["edges_per_sec_triangle_count"],
            }
            for lv in levels
        ],
        "pairs": pairs,
        "headline": pairs[0] if pairs else None,
    }


def to_markdown(rep: dict) -> str:
    head = rep["headline"]
    lines = [
        "# BENCH/BASELINE.md — scaling evidence (north_rule: efficiency ≥ 0.8, N → 4N)",
        "",
        "Same job, same input, one fresh JVM per parallelism level",
        "(`tools/scaling.py`; sandbox stand-in for N vs 4N executors per the",
        "driver instruction — no real cluster available here). Timed after a",
        "JIT warmup pass; flagship is best-of-reps.",
        "",
        f"- input: {rep['copies']} disjoint copies of the sf0.1 part co-occurrence "
        f"graph — {rep['edges']:,} canonical edges, {rep['triangles']:,} triangles",
        f"- exact triangle counts agree across every level: "
        f"{rep['triangles_match_all_levels']} (exactness is parallelism-invariant)",
        f"- **headline N→4N (local[{head['cores_low']}] → local[{head['cores_high']}], "
        f"the CPU-bound regime that models adding executors): flagship speedup "
        f"{head['speedup_flagship']}×, efficiency {head['efficiency_flagship']}**",
        "",
        "## Throughput by level (triangle_count, edges/s)",
        "",
        "| level | triangle_count s | edges/s | pagerank_3 s | cc s | lpa_3 s |",
        "|---|---|---|---|---|---|",
    ]
    for lv in rep["levels"]:
        q = lv["queries"]
        lines.append(
            f"| local[{lv['cores']}] | {q['triangle_count']} "
            f"| {lv['edges_per_sec_triangle_count']:,.0f} | {q['pagerank_3']} "
            f"| {q['connected_components']} | {q['label_propagation_3']} |"
        )
    lines += ["", "## Pairwise scaling efficiency", ""]
    lines += ["| pair | factor | flagship speedup | flagship efficiency | pagerank | cc | lpa |",
              "|---|---|---|---|---|---|---|"]
    for p in rep["pairs"]:
        pq = p["per_query"]
        lines.append(
            f"| local[{p['cores_low']}]→local[{p['cores_high']}] | {p['factor']:g}× "
            f"| {p['speedup_flagship']}× | **{p['efficiency_flagship']}** "
            f"| {pq['pagerank_3']['efficiency']} "
            f"| {pq['connected_components']['efficiency']} "
            f"| {pq['label_propagation_3']['efficiency']} |"
        )
    lines += [
        "",
        "Reading the pairs: executor scaling on a real cluster adds memory",
        "bandwidth and shuffle I/O in proportion to cores; a single box does",
        "not. The low-core pair is the faithful stand-in for N→4N executors;",
        "the highest pair shows where this one box's shared memory bus",
        "saturates — the same wall that flattened the reference's OpenMP",
        "build at every thread count (its best scaling was 0.61 efficiency,",
        "2→8 threads, std::thread build; best absolute 0.396 M edges/s on a",
        "60 k-edge graph — compare the edges/s column above).",
        "",
        "Iterative queries (pagerank/cc/lpa) carry a fixed per-superstep",
        "scheduling + lineage-truncation cost that shrinks their apparent",
        "efficiency at sandbox scale; a real cluster amortizes it over 4×",
        "the data volume. Absolute small-graph constants vs the reference",
        "are pinned separately in BENCH/reference_parity.json.",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="*", default=[2, 8, 32])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--rounds",
        type=int,
        default=1,
        help="repeat the whole level sweep this many times, interleaved "
        "(2,8,32,2,8,32,...), and take each level's per-query best across "
        "rounds — this host drifts +-40%% over tens of minutes, and "
        "interleaving exposes every level to the same drift instead of "
        "letting one slow stretch poison one level's ratios",
    )
    ap.add_argument("--copies", type=int, default=16)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    args = ap.parse_args()

    by_level: dict[int, dict] = {}
    for _ in range(max(args.rounds, 1)):
        for c in args.levels:
            row = run_level(args.sf_dir, c, args.copies, args.reps)
            prev = by_level.get(c)
            if prev is None:
                by_level[c] = row
            else:
                # per-query best across rounds; raw timings accumulate
                for q, t in row["queries"].items():
                    if t < prev["queries"][q]:
                        prev["queries"][q] = t
                    prev["raw_timings"][q].extend(row["raw_timings"][q])
                prev["value"] = round(sum(prev["queries"].values()), 3)
                prev["edges_per_sec_triangle_count"] = round(
                    prev["edges"] / prev["queries"]["triangle_count"], 1
                )
                assert row["triangles"] == prev["triangles"]
    levels = [by_level[c] for c in args.levels]
    rep = scaling_report(levels, args.sf_dir)
    rep["rounds"] = args.rounds

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "scaling.json"), "w") as f:
        json.dump(rep, f, indent=2)
    with open(os.path.join(args.out, "BASELINE.md"), "w") as f:
        f.write(to_markdown(rep))
    print(json.dumps({k: v for k, v in rep.items() if k != "levels"}))


if __name__ == "__main__":
    main()
