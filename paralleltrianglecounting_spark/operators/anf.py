"""Approximate neighborhood function + effective diameter (ANF /
HyperBall family) — the classic web-graph distance sketch.

Exact NF(k) = Σ_v |{u : d(v,u) ≤ k}| needs all-pairs BFS (O(V·E) — dead
at any scale); the Flajolet–Martin / ANF answer (Palmer–Gibbons–
Faloutsos, KDD 2002; HyperBall, Boldi–Vigna 2013, is the same
iteration with HLL registers) keeps one O(1) bitmask sketch per vertex
and propagates it with bitwise OR along edges:

    init  m_r(v) = 1 << ρ(h_r(v))      (ρ = trailing zeros: geometric)
    hop   m_r(v) |= OR over neighbors u of m_r(u)

After k hops m_r(v) is exactly the OR of the init bits of every vertex
within distance k, so b_r(v) = position of the lowest ZERO bit
estimates log2(φ·|N_k(v)|) and |N_k(v)| ≈ 2^{mean_r b_r}/φ with
φ = 0.77351 (R independent trials tighten the variance). OR is
idempotent, associative, commutative — the iteration is deterministic
at any parallelism, insensitive to duplicate edges, and reaches its
fixpoint in exactly the graph's diameter.

Spark shape (the PageRank layout): the propagation pair table is
persisted ALREADY HASH-PARTITIONED on its join key, so the |E|-row
side never re-exchanges inside the loop; the R=16 trial masks are 16
LONG COLUMNS folded by 16 ``bit_or`` aggregate expressions in ONE
codegen hash agg (the simhash/minhash ×R-explode lesson — one row per
edge crosses the shuffle, not R). State is |V| rows × (1 + R) longs,
pinned per hop with an eager localCheckpoint (cache + lineage cut paid
by the totals probe's job — the scc lesson). Per-hop 100 TB cost: one
shuffle of 16 longs per edge, map-side-combined (OR is a perfect
partial aggregate, so hub fan-in folds before the exchange) + one
|V|-row left join. Nothing driver-side but the R scalar totals.

Engine-portability (gate design): every quantity the contract query
emits is INTEGER — trailing zeros via ``bit_count((x & -x) - 1)`` and
the lowest zero bit via ``bit_count(((~x) & (x+1)) - 1)`` read
identically in Spark and DuckDB, and the trial hash is the shared
md5-derived hash56. The float estimate (2^{mean_r b}/φ summed over
vertices) is API-only, pinned by a NumPy twin pytest instead of the
oracle — IEEE pow is not cross-engine-reproducible, integers are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "neighborhood_bits",
    "neighborhood_function",
    "effective_diameter",
    "sketch_state",
    "ANF_PHI",
]

# Flajolet–Martin bias correction constant (φ): E[2^b] ≈ φ · n
ANF_PHI = 0.77351

# highest usable bit position: init bits live in 0..55 (hash56 is
# 56-bit, so ρ ≤ 55) and OR only combines them — the lowest zero bit
# is ≤ 56 and the masks never touch the int64 sign bit
_MAX_RHO = 55


def _tz(col):
    """Trailing zeros — ``bit_count((x & -x) - 1)``, the form both
    Spark and DuckDB evaluate identically on BIGINT."""
    return F.bit_count(col.bitwiseAND(-col) - F.lit(1))


def _lowest_zero_bit(col):
    """Position of the least-significant ZERO bit —
    ``bit_count(((~x) & (x + 1)) - 1)`` (x+1 carries through the
    trailing ones; ~x & (x+1) isolates the first zero). NB
    ``F.bitwise_not``, not Python ``~`` — PySpark's ``~`` is boolean
    NOT."""
    return F.bit_count(
        F.bitwise_not(col).bitwiseAND(col + F.lit(1)) - F.lit(1)
    )


def _mask_cols(n_trials: int) -> list[str]:
    return [f"m{r}" for r in range(n_trials)]


def _edge_setup(
    edges: DataFrame, directed: bool
) -> tuple[DataFrame, DataFrame]:
    """(propagation pairs hash-partitioned on from_v — NOT yet
    persisted — , distinct vertex table) for the OR iteration."""
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
    )
    if directed:
        # out-reachability: v collects its out-neighbors' sketches
        prop = e.select(
            F.col("dst").alias("from_v"), F.col("src").alias("to_v")
        )
    else:
        prop = e.select(
            F.col("src").alias("from_v"), F.col("dst").alias("to_v")
        ).unionAll(
            e.select(F.col("dst").alias("from_v"), F.col("src").alias("to_v"))
        )
    prop = prop.repartition(n_parts, "from_v")
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    return prop, verts


def _init_state(verts: DataFrame, mcols: list[str]) -> DataFrame:
    """Per-vertex FM init masks m_r(v) = 1 << min(ρ(hash56(v:r)), 55),
    one LONG column per trial (unpinned)."""
    from paralleltrianglecounting_spark.operators.text import hash56

    # NB the SQL shiftleft accepts a column shift amount; the Python
    # wrapper F.shiftleft insists on an int literal — go through the
    # rho columns + F.expr
    return verts.select(
        "vertex",
        *[
            F.least(
                _tz(hash56(F.concat_ws(":", F.col("vertex"), F.lit(str(r))))),
                F.lit(_MAX_RHO),
            ).alias(f"_rho{r}")
            for r in range(len(mcols))
        ],
    ).select(
        "vertex",
        *[
            F.expr(f"shiftleft(1L, _rho{r})").cast("long").alias(m)
            for r, m in enumerate(mcols)
        ],
    )


def _hop_update(
    prop: DataFrame, state: DataFrame, mcols: list[str]
) -> DataFrame:
    """One OR-propagation hop (unpinned): fold neighbors' masks with
    R ``bit_or`` exprs in ONE codegen hash agg (one row per pair
    crosses the shuffle, map-side-combined — OR is a perfect partial
    aggregate), then left-merge into the state."""
    incoming = (
        prop.join(
            state.select(F.col("vertex").alias("from_v"), *mcols), "from_v"
        )
        .groupBy(F.col("to_v").alias("vertex"))
        .agg(*[F.bit_or(F.col(m)).alias(f"_i{m}") for m in mcols])
    )
    return state.join(incoming, "vertex", "left").select(
        "vertex",
        *[
            F.col(m)
            .bitwiseOR(F.coalesce(F.col(f"_i{m}"), F.lit(0)))
            .alias(m)
            for m in mcols
        ],
    )


def sketch_state(
    edges: DataFrame,
    hops: int = 1,
    n_trials: int = 16,
    directed: bool = False,
) -> DataFrame:
    """Per-vertex FM reachability sketch after ``hops`` hops:
    [vertex, m0..m{R-1}] — m_r(v) is the OR of the init bits of every
    vertex within distance ``hops`` of v. The building block for
    downstream per-vertex ball-size estimation (and the plan-audit
    face of the hop update: intermediate hops are pinned, the FINAL
    hop is returned unpinned so its physical plan — the propagation
    join + one R-expr bit_or hash agg — is inspectable)."""
    from paralleltrianglecounting_spark.plans.superstep import local_pin

    if hops < 1:
        raise ValueError("sketch_state: hops must be >= 1")
    prop, verts = _edge_setup(edges, directed)
    prop = prop.persist()
    mcols = _mask_cols(n_trials)
    state = local_pin(_init_state(verts, mcols))
    for _ in range(hops - 1):
        state = local_pin(_hop_update(prop, state, mcols))
    return _hop_update(prop, state, mcols)


def _sketch_hops(
    edges: DataFrame, max_hops: int, n_trials: int, directed: bool
) -> tuple[list[list[int]], list[float], int]:
    """Run the OR propagation, returning (per-hop per-trial integer
    totals Σ_v b_r(v), per-hop float NF estimates Σ_v 2^{mean_r b}/φ,
    |V|) for hops 0..max_hops. Stops early at the OR fixpoint (integer
    totals can only grow, so equal consecutive totals certify it) and
    extends the stable tail — NF is constant past the diameter, and a
    full requested hop range keeps callers' row universes
    input-independent."""
    from paralleltrianglecounting_spark.plans.superstep import local_pin

    mcols = _mask_cols(n_trials)
    prop, verts = _edge_setup(edges, directed)
    prop = prop.persist()
    prop.count()
    state = local_pin(_init_state(verts, mcols))

    mean_b = sum(
        (_lowest_zero_bit(F.col(m)).cast("double") for m in mcols), F.lit(0.0)
    ) / F.lit(float(n_trials))

    def totals(s: DataFrame) -> tuple[list[int], float, int]:
        row = s.agg(
            *[
                F.sum(_lowest_zero_bit(F.col(m)).cast("long")).alias(m)
                for m in mcols
            ],
            F.sum(F.pow(F.lit(2.0), mean_b) / F.lit(ANF_PHI)).alias("_nf"),
            F.count(F.lit(1)).alias("_n"),
        ).collect()[0]
        return (
            [int(row[m] or 0) for m in mcols],
            float(row["_nf"] or 0.0),
            int(row["_n"]),
        )

    tb, nf, n_v = totals(state)
    per_hop, nf_by_hop = [tb], [nf]
    for _ in range(max_hops):
        state = local_pin(_hop_update(prop, state, mcols))
        tb, nf, _ = totals(state)
        per_hop.append(tb)
        nf_by_hop.append(nf)
        if tb == per_hop[-2]:
            while len(per_hop) <= max_hops:
                per_hop.append(per_hop[-1])
                nf_by_hop.append(nf_by_hop[-1])
            break
    prop.unpersist()
    return per_hop, nf_by_hop, n_v


def neighborhood_bits(
    edges: DataFrame,
    max_hops: int = 4,
    n_trials: int = 16,
    directed: bool = False,
) -> DataFrame:
    """[hop, trial, total_bits] — per hop 0..max_hops and per trial,
    the INTEGER sketch total Σ_v lowest_zero_bit(m_trial(v)): the
    quantity the ANF estimate is a deterministic function of, in the
    exact integer form both engines reproduce bit-for-bit (the
    contract-gate face of the operator)."""
    spark = edges.sparkSession
    per_hop, _, _ = _sketch_hops(edges, max_hops, n_trials, directed)
    rows = [
        (hop, trial, tb[trial])
        for hop, tb in enumerate(per_hop)
        for trial in range(n_trials)
    ]
    return spark.createDataFrame(rows, "hop int, trial int, total_bits long")


def neighborhood_function(
    edges: DataFrame,
    max_hops: int = 16,
    n_trials: int = 16,
    directed: bool = False,
) -> DataFrame:
    """[hop, nf_estimate] — the ANF point estimate of
    NF(k) = Σ_v |N_k(v)| per hop 0..max_hops (per-vertex
    2^{mean_r b_r}/φ summed — the KDD 2002 individual estimator).
    Float-bearing, so pytest-twinned rather than oracle-gated."""
    spark = edges.sparkSession
    _, nf_by_hop, _ = _sketch_hops(edges, max_hops, n_trials, directed)
    return spark.createDataFrame(
        [(k, float(round(x, 6))) for k, x in enumerate(nf_by_hop)],
        "hop int, nf_estimate double",
    )


def effective_diameter(
    edges: DataFrame,
    alpha: float = 0.9,
    max_hops: int = 64,
    n_trials: int = 16,
    directed: bool = False,
) -> DataFrame:
    """One row [effective_diameter, nf_at_diameter, nf_total, hops_run]
    — the smallest hop k whose estimate NF(k) reaches ``alpha`` of the
    fixpoint estimate NF(∞) (the standard "90% effective diameter" of
    web-graph measurement). Runs the sketch to its OR fixpoint (≤ the
    true diameter) so NF(∞) is the converged estimate, not a cap
    artifact; raises if ``max_hops`` is hit while still growing."""
    spark = edges.sparkSession
    per_hop, nf_by_hop, _ = _sketch_hops(edges, max_hops, n_trials, directed)
    if per_hop[-1] != per_hop[-2]:
        raise RuntimeError(
            f"effective_diameter: sketch still growing after {max_hops} "
            "hops; raise max_hops"
        )
    hops_run = next(
        k for k in range(len(per_hop)) if per_hop[k] == per_hop[-1]
    )
    nf_total = nf_by_hop[-1]
    eff = next(
        k for k, x in enumerate(nf_by_hop) if x >= alpha * nf_total
    )
    return spark.createDataFrame(
        [
            (
                int(eff),
                float(round(nf_by_hop[eff], 6)),
                float(round(nf_total, 6)),
                int(hops_run),
            )
        ],
        "effective_diameter int, nf_at_diameter double, "
        "nf_total double, hops_run int",
    )
