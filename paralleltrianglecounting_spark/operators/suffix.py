"""Distributed suffix ranking by prefix doubling — the exact-substring
machinery behind suffix-array deduplication (Lee et al., ACL 2022 §4.1
build their dedup on a corpus suffix array; Manber–Myers 1990 is the
doubling algorithm). The engine's n-gram dup operators (dup_ngram_spans,
winnowing) detect FIXED-length repeats; suffix ranks order ALL suffixes
at once, which is what unbounded-length exact-substring queries need.

``suffix_ranks(docs, rounds=k)`` assigns every token position the dense
rank of its suffix TRUNCATED at 2^k tokens (ties allowed — equal
truncated suffixes share a rank; a proper prefix sorts before its
extensions, the standard lexicographic convention). The truncation is
what makes the contract finite and cross-engine checkable: after k
doubling rounds the ranks are exactly "order by the first 2^k tokens",
which an oracle can reproduce by sorting explicit token slices. Full
(untruncated) suffix order is the same iteration run to rank
uniqueness; the twin pytest pins that against a brute Python suffix
sort.

Suffixes never cross document boundaries (each position's suffix ends
at its document's last token), so no sentinel tokens are needed:
position pairing joins on (doc_id, pos + 2^j) and a missing partner
ranks as −1, which sorts before every real rank — exactly
shorter-prefix-first.

The scale decision — order-preserving global re-ranking WITHOUT a
single-partition window: each round sorts the (r1, r2) pairs with
``repartitionByRange`` (Spark's RangePartitioner assigns partitions by
VALUE — binary search against sampled bounds — so equal keys always
colocate; the terasort primitive), dense-ranks WITHIN each partition,
and shifts by per-partition distinct-pair counts collected to the
driver (one ≤ n_parts-row aggregate per round). A no-partition
``dense_rank()`` window would drag the entire corpus through one task —
the exact pathology the engine bans elsewhere.

Cost model at 100 TB: log₂(depth) rounds, each = one range shuffle +
one in-partition sort + one (doc_id, pos)-keyed self-join — the same
O(n log n)-per-round sort bound as distributed terasort, and the
canonical distributed suffix-array construction (DC3/pDC3 saves the
log factor at the cost of a far more intricate merge; doubling is what
scales simply on a shuffle engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dup_prefix_depths", "suffix_ranks", "token_positions"]


def token_positions(docs: DataFrame) -> DataFrame:
    """[doc_id, pos, token] — 0-based token positions per document
    (whitespace tokenization shared with the rest of the text stack)."""
    from .text import tokens

    return docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    )


def _global_dense_rank(
    df: DataFrame, cols: list[str], n_parts: int
) -> tuple[DataFrame, DataFrame, int]:
    """Append 0-based order-preserving dense rank ``r`` over ``cols``.

    Range-partition by the key (equal keys colocate — RangePartitioner
    is value-based), dense-rank within each partition, then shift each
    partition by the total distinct-key count of the partitions before
    it (a ≤ n_parts-row aggregate collected to the driver). The result
    is globally dense and order-preserving with no single-partition
    stage.

    Returns ``(out, ranked, n_distinct)``: the ranked frame, the
    persisted intermediate (caller unpersists it once ``out`` is
    consumed), and the total distinct-key count (= 1 + max rank),
    which the prefix-doubling loop uses as its convergence test."""
    parts = df.repartitionByRange(n_parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = parts.withColumn("_wr", F.dense_rank().over(w)).persist()
    counts = {
        r["_pid"]: r["_n"]
        for r in ranked.groupBy("_pid").agg(F.max("_wr").alias("_n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    out = ranked.withColumn("r", off_expr + F.col("_wr") - 1).drop(
        "_pid", "_wr"
    )
    return out, ranked, acc


def suffix_ranks(
    docs: DataFrame,
    rounds: int = 6,
    n_parts: int = 32,
    until_unique: bool = False,
) -> DataFrame:
    """[doc_id, pos, rank] — dense rank of each position's suffix
    truncated at 2^rounds tokens (see module docstring). With
    ``until_unique=True`` the doubling continues past ``rounds`` until
    every rank is unique (= the true suffix array order), bounded by
    log₂(longest document).
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    state = token_positions(docs).select(
        "doc_id", "pos", F.col("token").alias("_k1")
    )
    from ..plans.superstep import local_pin

    state, pinned, m = _global_dense_rank(state, ["_k1"], n_parts)
    # local_pin, not persist: the pair join references the state TWICE
    # per round, so a persist-chained plan tree doubles per round and
    # its estimated sizeInBytes SQUARES (the k-truss plan-stats
    # pathology, see plans/superstep.py:local_pin — measured as a
    # many-minute stall by round ~6 on a 27k-row state)
    state = local_pin(state.select("doc_id", "pos", "r"))
    n_pos = state.count()
    pinned.unpersist()

    # convergence contract for until_unique: refinement is monotone —
    # a round only ever SPLITS rank classes — so the distinct-rank
    # count m is non-decreasing and the iteration is at its fixpoint
    # exactly when a round leaves m unchanged. "Every rank unique"
    # (m == n_pos) is NOT reachable when two documents share an
    # identical whole suffix (they tie forever, by design), so the
    # stop test is fixpoint-or-unique, never unique alone.
    j = 0
    m_prev: int | None = None
    while True:
        done_fixed = j >= rounds
        if not until_unique and done_fixed:
            break
        if until_unique and done_fixed and (m == n_pos or m == m_prev):
            break
        off = 1 << j
        partner = state.select(
            "doc_id",
            (F.col("pos") - off).alias("pos"),
            F.col("r").alias("_r2"),
        )
        paired = state.join(partner, ["doc_id", "pos"], "left").select(
            "doc_id",
            "pos",
            F.col("r").alias("_k1"),
            F.coalesce("_r2", F.lit(-1)).alias("_k2"),
        )
        new_state, pinned, new_m = _global_dense_rank(
            paired, ["_k1", "_k2"], n_parts
        )
        new_state = local_pin(new_state.select("doc_id", "pos", "r"))
        pinned.unpersist()
        state = new_state
        m_prev, m = m, new_m
        j += 1
    return state.select("doc_id", "pos", F.col("r").alias("rank"))


def dup_prefix_depths(
    docs: DataFrame,
    rounds: int = 6,
    n_parts: int = 32,
) -> DataFrame:
    """[doc_id, pos, dup_len] — per token position, the LARGEST
    power-of-two depth d ∈ {1, 2, 4, …, 2^rounds} at which the first d
    tokens of its suffix (clipped at the document end) also occur at
    some OTHER position in the corpus; 0 when even the single token is
    unique. This is the duplicated-span detector of suffix-array
    deduplication (Lee et al. ACL 2022 threshold "span of ≥ L tokens
    occurs elsewhere") at power-of-two resolution — `dup_len >= L`
    selects exactly the positions a ≥L-token exact-substring dedup
    would cut on, with L restricted to the doubling grid.

    Rides the prefix-doubling iteration directly: after round j the
    rank classes ARE the depth-2^j equality classes, and because a
    round only ever SPLITS classes, shared-ness is monotone decreasing
    in depth — so the running maximum is one carry-along column,
    updated per round by one class-size hash agg + one join, no
    post-hoc pass. Same range-partition re-rank and local_pin
    discipline as :func:`suffix_ranks`.
    """
    from ..plans.superstep import local_pin

    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    state = token_positions(docs).select(
        "doc_id", "pos", F.col("token").alias("_k1")
    )
    state, pinned, _ = _global_dense_rank(state, ["_k1"], n_parts)
    state = state.select("doc_id", "pos", "r")

    def _mark(st: DataFrame, depth: int, prev_best) -> DataFrame:
        sizes = st.groupBy("r").agg(F.count(F.lit(1)).alias("_cnt"))
        return st.join(sizes, "r").select(
            "doc_id",
            "pos",
            "r",
            F.when(F.col("_cnt") >= 2, F.lit(depth))
            .otherwise(prev_best)
            .alias("best"),
        )

    state = local_pin(_mark(state, 1, F.lit(0)))
    pinned.unpersist()
    for j in range(rounds):
        off = 1 << j
        partner = state.select(
            "doc_id",
            (F.col("pos") - off).alias("pos"),
            F.col("r").alias("_r2"),
        )
        paired = state.join(partner, ["doc_id", "pos"], "left").select(
            "doc_id",
            "pos",
            F.col("r").alias("_k1"),
            F.coalesce("_r2", F.lit(-1)).alias("_k2"),
            "best",
        )
        ranked, pinned, _ = _global_dense_rank(paired, ["_k1", "_k2"], n_parts)
        state = local_pin(
            _mark(
                ranked.select("doc_id", "pos", "r", "best"),
                2 << j,
                F.col("best"),
            )
        )
        pinned.unpersist()
    return state.select("doc_id", "pos", F.col("best").alias("dup_len"))
