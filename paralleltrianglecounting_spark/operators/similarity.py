"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

- ``cosine_topk``       exact brute-force top-k for a query set — the
                        correctness baseline, JVM-side ``zip_with`` +
                        ``aggregate`` (no Python in the loop);
- ``lsh_ann_topk``      random-hyperplane LSH-bucketed approximate
                        variant — the scale path: candidates only meet
                        inside a bucket, so the join is |Q|·bucket_size
                        instead of |Q|·N. Hyperplanes are hash-derived
                        (deterministic, no RNG state to ship);
- ``embedding_near_duplicates`` cosine ≥ τ pairs blocked by multi-band
                        LSH buckets — no reliance on any fixture column
                        (the r01 version blocked on the synthetic
                        ``label`` column, which production embedding
                        tables don't have).

Hyperplane portability: the ±1 sign matrix is derived driver-side from
md5 (``hyperplane_signs``) and embedded as LITERALS in the Spark plan —
so the DuckDB oracle can embed the *same* literals and reproduce the
bucket assignment bit-for-bit, making the LSH operators value-checkable
end-to-end (r01 used executor-side xxhash64, which DuckDB cannot
evaluate, leaving the gate rows-only).

At 100 TB the brute-force path is a broadcast of the (small) query set
against a full scan — linear, embarrassingly parallel, no shuffle; the
LSH path adds one shuffle on the bucket key. Both keep the arithmetic
in whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_queries: int = 20,
) -> DataFrame:
    """[query_id, neighbor_id, cos_r, rank]: exact top-k cosine
    neighbors for each query vector (default: the first ``n_queries``
    vec_ids). Deterministic ordering: score desc, neighbor id asc.
    """
    emb = _as_double(embeddings).select("vec_id", "embedding")
    if query_ids is not None:
        qfilter = F.col("vec_id").isin(query_ids)
    else:
        qfilter = F.col("vec_id") < n_queries
    q = emb.where(qfilter).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_r", "rank")
    )


N_HYPERPLANES = 8
ANN_BANDS = 4
ANN_PLANES_PER_BAND = 4
NEAR_DUP_BANDS = 4
NEAR_DUP_PLANES_PER_BAND = 6


def hyperplane_signs(dim: int, planes: int, band: int = 0) -> list[list[float]]:
    """Deterministic ±1 hyperplane sign matrix, ``planes`` rows of
    ``dim`` components. Component (p, j) of band ``band`` is +1 iff
    md5("band:p:j") is even — no RNG state, and portable: the matrix is
    embedded as literals in both the Spark plan and the DuckDB oracle
    SQL, so bucket assignment is reproducible in any engine with md5
    (or none at all — the literals ARE the contract)."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{band}:{p}:{j}".encode()).hexdigest(), 16) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for p in range(planes)
    ]


def _hyperplane_bucket(
    emb: Column, dim: int, planes: int = N_HYPERPLANES, band: int = 0
) -> Column:
    """LSH bucket id: sign pattern of ``planes`` deterministic
    hyperplanes (``hyperplane_signs``), evaluated entirely in
    whole-stage codegen (zip_with over a literal array + fold)."""
    bucket = F.lit(0).cast("long")
    for p, signs in enumerate(hyperplane_signs(dim, planes, band)):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _banded(emb: DataFrame, dim: int, planes: int, bands: int) -> DataFrame:
    """[vec_id, band, bucket]: one row per (vector, band) with the
    band's hyperplane bucket — the multi-table LSH key set. Deliberately
    WITHOUT the embedding column: the bands-way explode would otherwise
    ship the 64-double payload ×bands through the candidate self-join;
    callers join embeddings back by vec_id only for the deduped
    candidates (the same shape the DuckDB oracle uses)."""
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        _hyperplane_bucket(
                            F.col("embedding"), dim, planes, band
                        ).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "vec_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    dim: int = 64,
    planes: int = ANN_PLANES_PER_BAND,
    bands: int = ANN_BANDS,
) -> DataFrame:
    """[query_id, neighbor_id, cos_r, rank]: approximate top-k — exact
    cosine, but only among vectors colliding with the query in at least
    one of ``bands`` independent LSH tables (multi-probe recall:
    1-(1-p^planes)^bands per neighbor). Recall measured in tests
    against ``cosine_topk``; value-exactness vs the DuckDB oracle comes
    from the portable literal sign matrix (``hyperplane_signs``)."""
    emb = _as_double(embeddings).select("vec_id", "embedding")
    keyed = _banded(emb, dim, planes, bands)
    q = keyed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    cand = (
        F.broadcast(q)
        .join(
            keyed.select(F.col("vec_id").alias("neighbor_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])  # collided in >= 1 band
    )
    # embeddings join back AFTER candidate dedup: the payload moves once
    # per surviving pair, not x bands through the bucket join
    q_emb = F.broadcast(
        emb.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    n_emb = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        cand.join(q_emb, "query_id")
        .join(n_emb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_r", "rank")
    )


IVF_STRIDE = 32
IVF_N_PROBE = 4


def _ivf_centroids(
    emb: DataFrame, stride: int, lloyd_rounds: int, dim: int
) -> DataFrame:
    """[cell_id, c_emb]: the IVF coarse quantizer. Seeds are the vectors
    whose id is ≡ 0 (mod ``stride``) — deterministic sampling, the
    FAISS-style init with zero Lloyd rounds, chosen so the DuckDB oracle
    can reproduce the centroid set exactly (``vec_id % stride = 0``).
    ``lloyd_rounds`` > 0 refines them with standard k-means steps
    (assign → per-cell element-wise mean); that path is Spark-only
    (cross-engine floating-point mean order is not guaranteed
    reproducible, so the contract gate pins lloyd_rounds=0 and the
    refined path is pytest-verified against a NumPy twin)."""
    cent = emb.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    for _ in range(lloyd_rounds):
        asg = _ivf_assign(emb, cent)
        # element-wise mean per cell: posexplode -> one hash agg keyed
        # (cell, pos) with map-side combine -> re-assemble in pos order.
        # The 64x row fan-out is the standard distributed k-means cost
        # and touches only (cell_id, pos, component) triples, never the
        # payload twice.
        cent = (
            asg.join(emb, "vec_id")
            .select("cell_id", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cell_id",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("c_emb"),
            )
        )
    return cent


def _ivf_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """[vec_id, cell_id]: nearest-centroid assignment, ties to the
    smallest cell_id. argmax is ONE whole-stage-codegen hash aggregate —
    max(struct(cos_r, -cell_id)) with map-side partial aggregation, so
    only |N| rows cross the exchange, not the |N|·|C| scored pairs (a
    row_number window would shuffle all of them). Cosine is rounded to
    6 dp BEFORE the argmax so tie-breaks resolve identically in any
    engine that reproduces 6-dp cosine (the established portability
    contract of this module's gates)."""
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell_id",
        F.round(cosine(F.col("embedding"), F.col("c_emb")), 6).alias("cos_r"),
    )
    return scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos_r"), (-F.col("cell_id")).alias("ng"))).alias("b")
    ).select("vec_id", (-F.col("b.ng")).alias("cell_id"))


def ivf_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    stride: int = IVF_STRIDE,
    n_probe: int = IVF_N_PROBE,
    lloyd_rounds: int = 0,
) -> DataFrame:
    """[query_id, neighbor_id, cos_r, rank]: IVF-Flat approximate top-k —
    the inverted-file counterpart to ``lsh_ann_topk``. Every vector is
    assigned to its nearest coarse centroid (``_ivf_assign``); a query
    probes its ``n_probe`` closest cells and re-ranks exact cosine only
    inside them, so the scan is |Q|·(n_probe/|C|)·N instead of |Q|·N.

    At 100 TB: ``stride`` is the caller's cell-count knob (|C| =
    N/stride) and must keep the centroid table broadcastable — the
    standard IVF sizing is |C| ≈ √N (stride ≈ √N), which caps the
    broadcast at √N rows AND balances the N·|C| assignment dot products
    against the N/|C| per-cell re-rank scans; a fixed small stride at
    10^9 vectors would make |C| itself huge. With that sizing the
    assignment pass is one linear scan + one map-side-combined hash
    agg; the probe join moves only (query_id, cell_id) keys against the
    (vec_id, cell_id) assignment; embedding payloads join back by id
    only for surviving candidates (same discipline as the LSH path). No
    candidate dedup is needed — assignment is unique per vector and the
    probed cells are distinct, so (query, neighbor) pairs are already
    unique, unlike the multi-band LSH union. Recall vs ``cosine_topk``
    is pinned in tests; the contract gate runs lloyd_rounds=0 (see
    ``_ivf_centroids``) with stride=32 ≈ √N at the fixture's N."""
    emb = _as_double(embeddings).select("vec_id", "embedding")
    cent = _ivf_centroids(emb, stride, lloyd_rounds, dim=64)
    asg = _ivf_assign(emb, cent)
    q_emb_df = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    q_scored = F.broadcast(q_emb_df).crossJoin(F.broadcast(cent)).select(
        "query_id",
        "cell_id",
        F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_r"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("cell_id").asc()
    )
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "cell_id")
    )
    cand = F.broadcast(probes).join(asg, "cell_id").where(
        F.col("query_id") != F.col("vec_id")
    ).select("query_id", F.col("vec_id").alias("neighbor_id"))
    n_emb = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    scored = (
        cand.join(F.broadcast(q_emb_df), "query_id")
        .join(n_emb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_r", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bands: int = NEAR_DUP_BANDS,
    planes_per_band: int = NEAR_DUP_PLANES_PER_BAND,
) -> DataFrame:
    """[vec_a, vec_b, cos_r]: embedding-cosine near-duplicate pairs,
    blocked by multi-band LSH buckets — ``bands`` independent
    hyperplane bucketings; a pair is a candidate iff it collides in at
    least one band (the cosine analog of MinHash-LSH banding; recall
    rises as 1-(1-p^r)^b with per-plane agreement p = 1 - θ/π).

    Needs only the (vec_id, embedding) columns — no fixture/cluster
    column (r01 blocked on the synthetic ``label``). Each band's
    self-join is on the (band, bucket) key, never all-pairs; the exact
    cosine runs only on collided candidates, so at 100 TB the cost is
    Σ bucket², bounded by the bucket granularity (bands × 2^planes)."""
    emb = _as_double(embeddings).select("vec_id", "embedding")
    keyed = _banded(emb, dim, planes_per_band, bands)
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])  # collided in >= 1 band
    )
    # payload joins back by id AFTER dedup — the bucket self-join moves
    # only (vec_id, band, bucket) keys, never the embedding arrays
    emb_a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    emb_b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(emb_a, "vec_a")
        .join(emb_b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos_r"),
        )
        .where(F.col("cos_r") >= threshold)
    )


def quantize_embeddings(emb: DataFrame, levels: int = 127) -> DataFrame:
    """[vec_id, scale_r, code_sum, code_sumsq, mean_abs_err_r] —
    symmetric scalar (int8-style) quantization of each embedding:
    ``scale = max|x_i| / levels``, ``code_i = round(x_i / scale)`` ∈
    [−levels, levels] — the standard 4× vector-compression step a
    100 TB ANN pipeline applies BEFORE the bucketed candidate join
    (Jégou et al.'s SQ baseline; codes ride the shuffle, the float
    payload stays columnar at rest and joins back only for the final
    re-rank). The gate reports exact-integer code checksums
    (Σ code, Σ code² — order-free, value-pinning) plus the
    reconstruction error mean |x_i − code_i·scale| — the quality
    metric that decides whether int8 is safe for a given corpus.

    Engine portability: the max element always quantizes to ±levels
    (x_max/(x_max/levels) = levels·(1/(1+ε)) rounds to levels — never
    levels+1), round() is half-away-from-zero in both engines, and
    the only order-dependent float is the error mean over one
    vector's dims, absorbed by the 6-dp round. All per-row array
    expressions in whole-stage codegen — zero joins, zero shuffles;
    a zero vector keeps scale 0, all-zero codes, and error 0."""
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    base = emb.select("vec_id", x.alias("_x"))
    scale = F.array_max(F.transform(F.col("_x"), F.abs)) / F.lit(float(levels))
    s = base.select("vec_id", "_x", scale.alias("_scale"))

    def _code(v: Column) -> Column:
        return F.round(v / F.col("_scale")).cast("long")

    def _lsum(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0).cast("long"), lambda a, b: a + b)

    code_sum = F.when(
        F.col("_scale") > 0, _lsum(F.transform(F.col("_x"), _code))
    ).otherwise(F.lit(0))
    code_sumsq = F.when(
        F.col("_scale") > 0,
        _lsum(F.transform(F.col("_x"), lambda v: _code(v) * _code(v))),
    ).otherwise(F.lit(0))
    err = F.when(
        F.col("_scale") > 0,
        F.aggregate(
            F.transform(
                F.col("_x"),
                lambda v: F.abs(
                    v - F.round(v / F.col("_scale")) * F.col("_scale")
                ),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        / F.size("_x"),
    ).otherwise(F.lit(0.0))
    return s.select(
        "vec_id",
        F.round("_scale", 6).alias("scale_r"),
        code_sum.cast("long").alias("code_sum"),
        code_sumsq.cast("long").alias("code_sumsq"),
        F.round(err, 6).alias("mean_abs_err_r"),
    )


def ann_recall(
    embeddings: DataFrame, k: int = 5, n_queries: int = 20
) -> DataFrame:
    """[query_id, n_exact, n_lsh_hits, n_ivf_hits]: recall@k audit of
    both approximate indexes against the exact scan — per query, how
    many of the true top-k cosine neighbors each ANN path recovered.
    The routine evaluation step of any retrieval pipeline (recall =
    n_hits / n_exact); emitted as INTEGER hit counts so the gate stays
    hash-exact and the division is the caller's one float.

    Plan: the truth set is k·|Q| rows, so both hit joins broadcast it;
    the expensive legs are the three index scans themselves, shapes
    audited under their own gates (``cosine_topk``, ``lsh_ann_topk``,
    ``ivf_ann_topk``). At 100 TB the exact leg is the one that cannot
    run on the full corpus — the standard practice this operator
    encodes is measuring recall on a sampled query panel (n_queries)
    against a brute-forced ground truth of the same panel, which is
    exactly its shape: every input here is panel-sized except the ANN
    scans being audited."""
    exact = cosine_topk(embeddings, k=k, n_queries=n_queries)
    lsh = lsh_ann_topk(embeddings, k=k, n_queries=n_queries)
    ivf = ivf_ann_topk(embeddings, k=k, n_queries=n_queries)
    truth = exact.select("query_id", "neighbor_id")
    base = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))

    def _hits(approx: DataFrame, name: str) -> DataFrame:
        return (
            truth.join(
                approx.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left_semi",
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias(name))
        )

    return (
        base.join(_hits(lsh, "n_lsh_hits"), "query_id", "left")
        .join(_hits(ivf, "n_ivf_hits"), "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_lsh_hits"), F.lit(0)).alias("n_lsh_hits"),
            F.coalesce(F.col("n_ivf_hits"), F.lit(0)).alias("n_ivf_hits"),
        )
    )


def dequantized_embeddings(emb: DataFrame, levels: int = 127) -> DataFrame:
    """[vec_id, embedding]: the reconstruction a quantized index
    actually searches — ``round(x_i/scale)·scale`` per component (the
    same symmetric scalar quantizer as ``quantize_embeddings``). Zero
    vectors stay zero. Per-row codegen array expressions only."""
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    base = emb.select("vec_id", x.alias("_x"))
    scale = F.array_max(F.transform(F.col("_x"), F.abs)) / F.lit(float(levels))
    return base.select(
        "vec_id",
        F.when(
            scale > 0,
            F.transform(F.col("_x"), lambda v: F.round(v / scale) * scale),
        )
        .otherwise(F.col("_x"))
        .alias("embedding"),
    )


def quantized_recall(
    embeddings: DataFrame, k: int = 5, n_queries: int = 20, levels: int = 127
) -> DataFrame:
    """[query_id, n_exact, n_q_hits]: recall@k of the int8-quantized
    index against the float truth — the compression-loss audit that
    decides whether scalar quantization is safe for a corpus (the
    ``ann_recall`` methodology applied to ``quantize_embeddings``'s
    reconstruction). Both sides are exact brute-force scans over the
    query panel, so the ONLY degradation measured is quantization;
    integer hit counts keep the gate hash-exact."""
    truth = cosine_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id"
    )
    qtop = cosine_topk(
        dequantized_embeddings(embeddings, levels), k=k, n_queries=n_queries
    ).select("query_id", "neighbor_id")
    base = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        truth.join(qtop, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_q_hits"))
    )
    return base.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_q_hits"), F.lit(0)).alias("n_q_hits"),
    )


# Product quantization: the 64-dim embedding is cut into PQ_M
# contiguous 8-dim subvectors, each encoded independently against a
# per-subspace codebook (Jégou, Douze, Schmid, "Product Quantization
# for Nearest Neighbor Search", TPAMI 2011) — m·log2(|C|) bits per
# vector instead of 64 floats, with reconstruction error far below
# scalar int8 at the same budget when the distribution is anisotropic.
# Codebooks here are sample-seeded exactly like the IVF coarse
# quantizer (subvectors of vec_id % stride == 0, zero k-means rounds)
# so the DuckDB oracle reproduces them bit-for-bit; production would
# run Lloyd refinement per subspace (the _ivf_centroids pattern) and
# fix |C| = 256 so codes pack one byte each.
PQ_M = 8
PQ_STRIDE = 32


def _l2sq(a: Column, b: Column) -> Column:
    # written as (a·a − 2 a·b) + b·b over the SAME fold primitive the
    # cosine gates use, so the IEEE result is engine-reproducible in
    # the exact association order the oracle writes
    return (_dot(a, a) - 2 * _dot(a, b)) + _dot(b, b)


def _pq_subvectors(emb: DataFrame, m: int, dim: int) -> DataFrame:
    """[vec_id, sub_id, sub]: the m contiguous dim/m-dim subvectors."""
    sub_len = dim // m
    return emb.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.struct(
                    j.alias("sub_id"),
                    F.slice("embedding", j * sub_len + 1, sub_len).alias("sub"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.sub_id").alias("sub_id"), F.col("s.sub").alias("sub"))


def _pq_codebooks(emb: DataFrame, m: int, stride: int, dim: int) -> DataFrame:
    """[sub_id, code, c_sub]: per-subspace codebooks from the sampled
    seed vectors; code = 0-based rank of the seed's vec_id (dense,
    engine-reproducible). The window runs over the seed table only —
    |C| rows per subspace, never the corpus."""
    seeds = emb.where(F.col("vec_id") % stride == 0)
    w = Window.partitionBy("sub_id").orderBy("vec_id")
    return _pq_subvectors(seeds, m, dim).select(
        "sub_id",
        (F.row_number().over(w) - 1).cast("long").alias("code"),
        F.col("sub").alias("c_sub"),
    )


def pq_codes(
    embeddings: DataFrame, m: int = PQ_M, stride: int = PQ_STRIDE
) -> DataFrame:
    """[vec_id, sub_id, code]: the PQ encoding — per subspace, the
    nearest codebook entry by squared L2 (6-dp rounded before the
    argmin, ties to the smallest code — the ``_ivf_assign`` argmax
    pattern, one map-side-combined hash agg per (vec, sub)).

    100 TB shape: codebooks are m·|C| tiny rows — broadcast; the scan
    side is one explode to m subvector rows per vector, scored against
    the broadcast codebook and reduced by min(struct) WITHOUT a window
    over the corpus; codes are 8 small integers per vector — the
    shuffle-friendly representation ANN re-rank pipelines ship instead
    of float payloads. ``stride`` is the |C| knob exactly as in IVF."""
    emb = _as_double(embeddings).select("vec_id", "embedding")
    cb = _pq_codebooks(emb, m, stride, dim=64)
    return _pq_assign(emb, cb, m)


def _pq_assign(emb: DataFrame, cb: DataFrame, m: int) -> DataFrame:
    """[vec_id, sub_id, code] against a prebuilt codebook (so callers
    that also need the codebook — reconstruction — derive it once)."""
    sv = _pq_subvectors(emb, m, 64)
    scored = sv.join(F.broadcast(cb), "sub_id").select(
        "vec_id",
        "sub_id",
        "code",
        F.round(_l2sq(F.col("sub"), F.col("c_sub")), 6).alias("d_r"),
    )
    return (
        scored.groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("d_r", "code")).alias("b"))
        .select("vec_id", "sub_id", F.col("b.code").alias("code"))
    )


def pq_reconstructed(
    embeddings: DataFrame, m: int = PQ_M, stride: int = PQ_STRIDE
) -> DataFrame:
    """[vec_id, embedding]: the vector a PQ index actually searches —
    each subvector replaced by its codebook entry, re-assembled in
    subspace order (one small-array collect per vector; the codebook
    join is broadcast)."""
    emb = _as_double(embeddings).select("vec_id", "embedding")
    cb = _pq_codebooks(emb, m, stride, dim=64)
    codes = _pq_assign(emb, cb, m)
    return (
        codes.join(F.broadcast(cb), ["sub_id", "code"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub_id", "c_sub"))),
                    lambda s: s["c_sub"],
                )
            ).alias("embedding")
        )
    )


def pq_recall(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    m: int = PQ_M,
    stride: int = PQ_STRIDE,
) -> DataFrame:
    """[query_id, n_exact, n_pq_hits]: recall@k of the PQ-reconstructed
    index against the float brute-force truth — ``quantized_recall``'s
    methodology applied to product quantization, closing the
    compression-eval triangle (int8 scalar vs PQ vs exact) so a corpus
    owner can choose a compression level from measured recall, not
    rules of thumb. Both sides are exact scans over the query panel;
    integer hit counts keep the gate hash-exact."""
    truth = cosine_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id"
    )
    qtop = cosine_topk(
        pq_reconstructed(embeddings, m, stride), k=k, n_queries=n_queries
    ).select("query_id", "neighbor_id")
    base = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        truth.join(qtop, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_pq_hits"))
    )
    return base.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce(F.col("n_pq_hits"), F.lit(0)).alias("n_pq_hits"),
    )


RRF_K = 60


def rrf_fusion(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """[query_id, neighbor_id, rrf_r, rank]: reciprocal-rank fusion of
    the two approximate retrievers — score(d) = Σ_lists 1/(rrf_k +
    rank_list(d)) over the LSH and IVF top-k lists (Cormack, Clarke &
    Büttcher, SIGIR 2009: RRF outperforms individual rankers and needs
    no score calibration, which is why it is the standard hybrid-search
    combiner). A document found by BOTH retrievers outranks one found
    by either alone at similar depth — the complementary-recall effect
    the ann_recall audit measures per retriever.

    Engine-portable: ranks are integers, the two 1/(rrf_k+rank) terms
    are added in list order (LSH first) before the 6-dp round; final
    ordering ties break by neighbor_id. 100 TB shape: both inputs are
    the already-bounded ANN plans (bucketed joins, broadcast query
    panel); fusion itself is one full-outer join on (query, neighbor)
    pairs — O(n_queries·k) rows — plus one per-query top-k window."""
    lsh = lsh_ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.col("rank").alias("_rl")
    )
    ivf = ivf_ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.col("rank").alias("_ri")
    )
    fused = lsh.join(ivf, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("_rl")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("_ri")), F.lit(0.0)),
            6,
        ).alias("rrf_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rrf_r", "rank")
    )
