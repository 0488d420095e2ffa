"""Driver contract for the spark-link-graph engine.

``entry(spark)``      — flagship: exact triangle count on the sf0.001
                        part co-occurrence graph.
``queries()``         — one entry per implemented operator (SURVEY.md §2
                        + north-star extensions). Each callable takes
                        (spark, sf_dir) and returns a DataFrame.
``oracle_sql()``      — DuckDB-runnable ANSI SQL equivalents over the
                        same parquet tables. Keys without an oracle are
                        non-SQL-expressible (iterative-to-convergence or
                        approximate/hash-randomized operators); they get
                        the driver's rows-only check and are instead
                        oracle-tested in tests/ against NumPy/exact
                        baselines.

The canonical benchmark graph: **parts co-occurring in an order**
(vertices = l_partkey, edge iff two parts share an l_orderkey) — the
testdata analog of the production repo↔path co-occurrence graph from
BASELINE.json's input_hint. Canonicalization src<dst + distinct mirrors
the reference generator (graph_generator/generate_graph.py:22-31).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.bfs import (
    bfs_distances,
    diameter_estimate,
    ego_net,
)
from paralleltrianglecounting_spark.operators.components import (
    backbone_profile,
    bipartite_components,
    component_sizes,
    connected_components,
)
from paralleltrianglecounting_spark.operators.degrees import (
    degree_assortativity,
    degree_histogram,
    graph_summary,
)
from paralleltrianglecounting_spark.operators.degrees import degrees as _degrees
from paralleltrianglecounting_spark.operators.hits import hits, salsa
from paralleltrianglecounting_spark.operators.motifs import (
    _CLASS_DYADS,
    FULL_TRIAD_CLASSES,
    dyad_census,
    full_triad_census,
    triad_census,
    weighted_triangle_intensity,
)
from paralleltrianglecounting_spark.operators.anf import neighborhood_bits
from paralleltrianglecounting_spark.operators.kcore import (
    core_numbers,
    k_core,
    s_core,
)
from paralleltrianglecounting_spark.operators.ktruss import truss_numbers
from paralleltrianglecounting_spark.operators.scc import (
    condensation,
    reciprocity,
    strongly_connected_components,
)
from paralleltrianglecounting_spark.operators.linkpred import (
    co_citation_topk,
    link_prediction_jaccard,
    link_prediction_topk,
    neighborhood_size,
    square_count,
)
from paralleltrianglecounting_spark.operators.ktruss import k_truss
from paralleltrianglecounting_spark.operators.labelprop import (
    seeded_label_propagation,
    community_modularity,
    label_propagation,
)
from paralleltrianglecounting_spark.operators.pagerank import (
    pagerank,
    personalized_pagerank,
    spam_mass,
    weighted_pagerank,
)
from paralleltrianglecounting_spark.operators.cliques import k4_count
from paralleltrianglecounting_spark.operators.delta import triangle_count_delta
from paralleltrianglecounting_spark.operators.matching import (
    coarsen_graph,
    maximal_matching,
    vertex_cover,
)
from paralleltrianglecounting_spark.operators.matching import _edge_rank
from paralleltrianglecounting_spark.operators.msf import (
    minimum_spanning_forest,
    single_linkage_clusters,
)
from paralleltrianglecounting_spark.operators.mis import maximal_independent_set
from paralleltrianglecounting_spark.operators.coloring import greedy_coloring
from paralleltrianglecounting_spark.operators.densest import densest_subgraph
from paralleltrianglecounting_spark.operators.eigenvector import (
    eigenvector_centrality,
    katz_centrality,
)
from paralleltrianglecounting_spark.operators.degrees import rich_club
from paralleltrianglecounting_spark.operators.triangles import (
    clustering_coefficient,
    local_bridges,
    transitivity,
    triangle_count,
    triangle_count_resumable,
    triangle_triples,
    triangles_per_vertex,
)
from paralleltrianglecounting_spark.operators.percolation import clique_percolation
from paralleltrianglecounting_spark.operators.nullmodel import (
    powerlaw_alpha,
    triangle_significance,
)
from paralleltrianglecounting_spark.operators.dedup import (
    LSH_BAND_ROWS,
    MINHASH_PARAMS,
    NGRAM_MAX_BLOCK,
    SIMHASH_BITS,
    SIMHASH_MAX_BUCKET,
    CONTAIN_ANCHORS,
    CONTAIN_MAX_POSTING,
    contamination_check,
    dedup_clusters,
    deduplicated_docs,
    exact_duplicates,
    lsh_dedup_recall,
    minhash_lsh_candidates,
    ngram_containment,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from paralleltrianglecounting_spark.operators.similarity import (
    PQ_M,
    PQ_STRIDE,
    RRF_K,
    pq_codes,
    rrf_fusion,
    pq_recall,
    quantize_embeddings,
    ANN_BANDS,
    ANN_PLANES_PER_BAND,
    NEAR_DUP_BANDS,
    NEAR_DUP_PLANES_PER_BAND,
    ann_recall,
    quantized_recall,
    cosine_topk,
    embedding_near_duplicates,
    hyperplane_signs,
    ivf_ann_topk,
    lsh_ann_topk,
)
from paralleltrianglecounting_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    dup_ngram_spans,
    dup_span_runs,
    fingerprints,
    lang_id,
    pmi_collocations,
    quality_filtered_docs,
    quality_scores,
    repetition_scores,
    subword_stats,
    tfidf_top_terms,
    token_stats,
)
from paralleltrianglecounting_spark.operators.sampling import (
    PACK_CONTEXT,
    PACK_SHARDS,
    balanced_sample,
    dataset_split,
    mixture_weights,
    sequence_packing,
)
from paralleltrianglecounting_spark.operators.betweenness import (
    betweenness,
    closeness_centrality,
    harmonic_centrality,
)
from paralleltrianglecounting_spark.operators.sssp import sssp
from paralleltrianglecounting_spark.operators.stats import (
    event_funnel,
    event_transitions,
    group_quantiles,
    retention_cohorts,
    rollup_totals,
    sessionize,
    sliding_window_counts,
)
from paralleltrianglecounting_spark.operators.bpe import bpe_pair_counts
from paralleltrianglecounting_spark.operators.text import (
    WINNOW_POS_BITS,
    bigram_lm_scores,
    inverted_index,
    ngram_topk,
    oov_rate,
    skipgram_pairs,
    winnow_dup_clusters,
    winnow_fingerprints,
)
from paralleltrianglecounting_spark.operators.sketches import (
    BLOOM_BITS,
    BLOOM_HASHES,
    BLOOM_N,
    BLOOM_PARAMS,
    CMS_PARAMS,
    CMS_WIDTH,
    HLL_P,
    bloom_contamination,
    cms_heavy_hitters,
    cms_registers,
    hll_registers,
)
from paralleltrianglecounting_spark.operators.walks import biased_walks, random_walks
from paralleltrianglecounting_spark.operators.bipartite import (
    bipartite_motifs,
    item_cosine_topk,
    projection_cost,
)
from paralleltrianglecounting_spark.operators.dag import topological_levels
from paralleltrianglecounting_spark.operators.pagerank import directed_pagerank
from paralleltrianglecounting_spark.operators.text import bm25_search, chunk_documents
from paralleltrianglecounting_spark.operators.bowtie import bowtie_structure
from paralleltrianglecounting_spark.sources.edges import (
    order_bowtie_digraph,
    order_chain_digraph,
    order_cycle_digraph,
    order_chain_graph,
    part_graph,
    weighted_part_graph,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# ---------------------------------------------------------------------------
# shared SQL prelude: the part co-occurrence graph in DuckDB terms
# ---------------------------------------------------------------------------

_EDGES_CTE = """
pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
edges AS (
  SELECT DISTINCT a.e AS src, b.e AS dst
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
),
bidir AS (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL
  SELECT dst AS u, src AS v FROM edges
),
deg AS (
  SELECT u AS v, count(*) AS degree FROM bidir GROUP BY u
),
verts AS (
  SELECT v FROM deg
)
""".strip()

_TRI_CTE = """
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
""".strip()

# CPM (clique_percolation) substrate: the part graph with containers
# capped at 3 members. The full co-occurrence graph is so dense its
# triangle overlay percolates into one blob (no gate power — the same
# degenerate-fixture lesson as the co_citation audit); the cap keeps a
# real overlapping-community structure (sf0.01: 3 180 triangles, 2 634
# communities, 1 865 vertices in >1 community, max 12 memberships).
CPM_MAX_CONTAINER = 3

_CPM_EDGES_CTE = f"""
pairs0 AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
ckeep AS (
  SELECT c FROM pairs0 GROUP BY c HAVING count(*) <= {CPM_MAX_CONTAINER}
),
pairs AS (
  SELECT p.c, p.e FROM pairs0 p JOIN ckeep USING (c)
),
edges AS (
  SELECT DISTINCT a.e AS src, b.e AS dst
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
)
""".strip()

# CPM oracle building blocks, shared with the
# big-tier unrolled override in tools/correctness_sf.py: the triangle
# overlay with portable hash56 node ids, star-reduced to (triangle,
# min-tid-of-edge-group) links — linear rows, connectivity-identical
# to the quadratic edge-sharing relation (percolation.py docstring).
_CPM_OVERLAY_CTE = """
trid AS MATERIALIZED (
  SELECT a AS x, b AS y, c AS z,
         ('0x' || substr(md5(a || ':' || b || ':' || c), 1, 14))::BIGINT AS tid
  FROM tri
),
tedge AS (
  SELECT x AS eu, y AS ev, tid FROM trid
  UNION ALL SELECT x, z, tid FROM trid
  UNION ALL SELECT y, z, tid FROM trid
),
troots AS (SELECT eu, ev, min(tid) AS root FROM tedge GROUP BY eu, ev),
cpairs AS (
  SELECT DISTINCT t.tid AS pu, r.root AS pv
  FROM tedge t JOIN troots r ON r.eu = t.eu AND r.ev = t.ev
  WHERE t.tid <> r.root
),
cbidir AS MATERIALIZED (
  SELECT pu AS u, pv AS v FROM cpairs
  UNION ALL
  SELECT pv AS u, pu AS v FROM cpairs
),
cnodes AS (SELECT DISTINCT tid AS v FROM trid)
""".strip()

# final membership/size projection over clbl [tid, community]
# (isolated triangles are their own community via the (v, v) seed)
_CPM_MEMB_SQL = """
memb AS (
  SELECT DISTINCT vertex, community FROM (
    SELECT t.x AS vertex, c.community FROM trid t JOIN clbl c USING (tid)
    UNION ALL
    SELECT t.y AS vertex, c.community FROM trid t JOIN clbl c USING (tid)
    UNION ALL
    SELECT t.z AS vertex, c.community FROM trid t JOIN clbl c USING (tid)
  )
),
csizes AS (SELECT community, count(*)::BIGINT AS n_members FROM memb GROUP BY community)
SELECT m.vertex, m.community, s.n_members
FROM memb m JOIN csizes s USING (community)
""".strip()

# shared by the batch user_sessions gate and its streaming twin: the
# stream's finalized session set must hash-equal the batch answer
_SESSIONS_SQL = """WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
  FROM marked
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, session_id"""

PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85
LPA_ITERS = 3
ROUND = 6
PPR_SEEDS = 16  # deterministic seed set: the PPR_SEEDS smallest vertex ids
# k=80 sits just below this graph's core collapse (k=84 peels everything
# at sf0.01): 143 vertices cascade out over 6 synchronous rounds — a
# real multi-round peel, not a no-op filter
KCORE_K = 80
# peeling is idempotent at its fixpoint, so the oracle unrolls a fixed
# generous round count and still matches the run-to-fixpoint engine as
# long as KCORE_UNROLL >= the actual peel depth (6 at the gate tier;
# asserted by pytest)
KCORE_UNROLL = 16
# weighted s-core over the part co-occurrence graph: s = 80 sits just
# below the weighted collapse at the gate tier (a 4-round non-empty
# cascade at sf0.01: 1,889 vertices survive; 6 rounds / 18,891 at
# sf0.1). Peeling is idempotent at the fixpoint, so the generous
# unroll matches the run-to-fixpoint engine (the KCORE_UNROLL
# argument); bigger tiers are retuned by tools/correctness_sf.py's
# engine-measured depth probe.
S_CORE_S = 80
S_CORE_UNROLL = 12
# data-mixing temperature for the mixture_weights gate
MIX_ALPHA = 0.7
BFS_SEEDS = 4  # deterministic seed set: the BFS_SEEDS smallest vertex ids
# hop cap is part of the query semantics (keeps the oracle's recursive
# CTE finite on this cyclic graph). The sf0.01 co-occurrence graph has
# eccentricity 2 from the seed set (it is far denser than it is deep),
# so the cap is set to 1 to make the gate genuinely exercise the
# cap-exclusion semantics: 379 of 2000 vertices settle, the rest are
# absent (reachability-within-k IS the query)
BFS_MAX_HOPS = 1
# the DEEP gate runs on the order-chain graph (disjoint customer paths,
# median length ~10): the 4 seed vertices expand along their chains for
# multiple genuine supersteps and the cap binds after round 3 — the
# frontier/anti-join machinery is oracle-exercised over many rounds
# (VERDICT r03 #3; the dense co-occurrence graph saturates at hop 2)
BFS_DEEP_SEEDS = 4
BFS_DEEP_MAX_HOPS = 6
# k=10 exercises a real 8-round support cascade at sf0.01 (115,729
# edges peel to 4,974 — asserted by pytest); unroll 12 >= depth+1, and
# peeling is idempotent at its fixpoint so the fixed unroll matches the
# run-to-fixpoint engine exactly (same argument as KCORE_UNROLL)
KTRUSS_K = 10
KTRUSS_UNROLL = 12
# DOULION sampling rate for the approximate count: q = 1/4 keeps the
# estimator deterministic-exact (hash56 edge sampling, scale 64x)
APPROX_TRI_NUM = 1
APPROX_TRI_DEN = 4
# link prediction: global top-k non-edges by Adamic–Adar; the tie-break
# runs on the ROUNDED score then (u, v), so the k-frontier is
# deterministic and engine-portable
LINKPRED_K = 100
# HITS: fixed synchronous iteration count (the L1-normalized recurrence
# unrolls to 4 CTEs per iteration in the oracle)
HITS_ITERS = 5
# neighborhood function gate: the exact 2-hop ball (the HLL++ sketch
# variant is the scale path, bounded-error-tested in pytest — a sketch
# is not value-reproducible across engines by design)
NBHD_HOPS = 2
# decontamination gate: the "benchmark" is the deterministic eval
# slice doc_id % CONTAM_BENCH_MOD == 0; flag corpus docs sharing >=
# CONTAM_MIN_OVERLAP distinct trigrams with any benchmark doc
CONTAM_BENCH_MOD = 100
CONTAM_N = 3
CONTAM_MIN_OVERLAP = 2
# ego-net: the induced subgraph on the 1-hop ball of the EGO_SEEDS
# smallest ids (1 hop on the dense part graph already covers ~39% of
# vertices; 2 hops would be nearly the whole graph)
EGO_SEEDS = 4
EGO_HOPS = 1
# diameter double-sweep on the order-chain graph (disjoint customer
# paths, median ~10 — a diameter that actually varies; the dense part
# graph sits at 2-3). Per-sweep cap generous vs the chain depth
DIAMETER_MAX_HOPS = 24
# weighted shortest paths: hop-bounded min-plus from the SSSP_SEEDS
# smallest vertex ids; distances stay integral (hash-exact gate). The
# bound is part of the semantics (the bfs_distances cap rule); min-plus
# is idempotent at its fixpoint so the engine may stop early
SSSP_SEEDS = 4
SSSP_ITERS = 6
# betweenness: k-source depth-bounded Brandes (Brandes–Pich pivots).
# 4 pivots, depth 3 — on the sf0.01 co-occurrence graph (ecc 2 from the
# pivot set) depth 3 means the pivot DAGs are complete, so the gate
# checks the exact Brandes dependency sums for those sources; the
# depth-bound semantics are pytest-pinned on a path graph where they bind
MATCHING_UNROLL = 16
# Borůvka MSF: measured 2 real rounds + 1 no-op fixpoint round at both
# gate tiers (single connected component); rounds are idempotent at the
# fixpoint so the unroll just needs >= the actual depth — loud
# final-live guard if it ever isn't. 8 doubling jumps resolve parent
# chains up to depth 256; a per-round idempotence guard zeroes the
# output loudly if a deeper chain ever appears.
MSF_UNROLL = 4
MSF_JUMPS = 8
# eigenvector: 5 unnormalized power-iteration steps keep every walk
# count AND the L1 norm below 2^53 at both gate tiers (measured: the
# norm crosses at k=6 on sf0.1), so all sums are integer-exact in a
# double in BOTH engines and the gate is bit-identical, not
# tolerance-matched. The operator raises loudly past the bound.
EV_ITERS = 5
# katz: 4 attenuated hops — walk counts stay an iteration under the
# eigenvector 2^53 ceiling; α^k factors are Python double literals
# shared verbatim with the oracle, accumulated in one fixed
# association order (see operators/eigenvector.py:katz_centrality)
KATZ_ALPHA = 0.05
KATZ_ITERS = 4
RICH_CLUB_KS = [8, 16, 32, 64, 128]
# Luby MIS: measured 8 real rounds + 1 no-op fixpoint round at both
# gate tiers; rounds are idempotent once live is empty, and the loud
# final-live guard empties the oracle if the unroll is ever too small
MIS_UNROLL = 12
# Jones–Plassmann coloring is gated on the order-chain graph (paths):
# measured 7-8 real rounds there. On the dense co-occurrence graph JP
# needs ~|V|·(Δ+1)/|V| ≈ Δ rounds (local minima per round ≈ n/Δ) —
# far past any feasible SQL unroll, so the dense graph is covered by
# the proper-coloring + sequential-twin pytests instead (the
# bfs_distances_deep precedent for picking the gate graph by power).
COLORING_UNROLL = 12
# densest subgraph: ε=0.1 gives a measured 7-8 round peel at both gate
# tiers (ε=0.5 empties in 2 — no gate power); the best round on the
# uniformly-dense co-occurrence graph is legitimately round 0 (the
# whole graph IS its densest subgraph), so the oracle must reproduce
# the full peel ledger + argmax to agree; a planted-clique pytest pins
# the best-round>0 case. Threshold literal is repr(2(1+ε)) so both
# engines compare against the identical double.
DENSEST_EPS = 0.1
DENSEST_UNROLL = 12
# document chunking: 32-token windows with 8-token overlap (stride 24)
# — small enough that the ~80-token testdata docs emit multi-chunk
# output with a short tail chunk (both the overlap and the tail
# semantics are exercised by the gate, not just the n<=chunk_size case)
CHUNK_SIZE = 32
CHUNK_OVERLAP = 8
# BM25 gate: fixed literal queries over the testdata vocabulary (terms
# verified present at both tiers); k1/b are the Robertson defaults and
# appear as repr'd literals in the oracle SQL
BM25_QUERIES = ["fast hash join", "window agg stream", "slow table scan"]
BM25_K = 10
BM25_K1 = 1.2
BM25_B = 0.75
# directed pagerank runs on the order-chain digraph: ~15% of vertices
# are dangling (chain ends), so the dangling-mass term is load-bearing
# in the gate, not a zero
DPR_ITERS = 8
DPR_DAMPING = 0.85
# h-index coreness: measured 19 rounds to fixpoint at sf0.01 (+ slack);
# tools/correctness_sf.py retunes this from the engine's measured
# iteration count at bigger tiers (38 at sf0.1), like KCORE_UNROLL
CORENESS_UNROLL = 22
# bipartite CC: min-label rounds needed = bipartite eccentricity of
# each component's min entity (~2x the projection's, which is ~2 on
# the co-occurrence graphs) — 12 is generous, and the fixpoint guard
# makes an insufficient unroll loud (0 rows), never wrong
BIPARTITE_CC_UNROLL = 12
BIPARTITE_OFFSET = 1 << 40
# ANF sketch gate: 6 hops on the deep chain graph (median path ~10, so
# the hop range is genuinely mid-propagation at every sf) × 16 FM
# trials; every gated quantity is integer (bit positions), portable by
# the shared md5-derived hash56 + bit_count identities
ANF_HOPS = 6
ANF_TRIALS = 16
# truss decomposition: measured 24 h-index rounds to fixpoint at
# sf0.01 (+ slack); tools/correctness_sf.py retunes from the engine's
# measured iterations at bigger tiers, like CORENESS_UNROLL
TRUSS_UNROLL = 27
# SCC gate graph: customers with >= this many orders close into a
# directed cycle (one nontrivial SCC each); shorter chains stay pure
# paths (trim fodder). ~1/3 of customers are over the threshold at
# every sf (order counts are scale-free per customer in TPC-H)
SCC_MIN_CYCLE = 12
# bowtie: cycle over chain positions (HEAD+1 .. n-TAIL) so the census
# has nonempty IN/OUT sides and a closed-form oracle (see
# sources/edges.py:order_bowtie_digraph)
BOWTIE_HEAD = 3
BOWTIE_TAIL = 3
# single-linkage cut at the weakest tie strength: weight 1 = "shared
# exactly one order" — the noisiest co-occurrence links, so the cut
# yields a non-trivial dendrogram level (neither all-singletons nor
# one blob) at both gate tiers
SL_THRESHOLD = 1
DELTA_MOD = 20
SEEDED_LPA_K = 8
SEEDED_LPA_ITERS = 3
PMI_K = 20
PMI_MIN_COUNT = 5
# blocked postings: small block so the blocking machinery does real
# work at the gate tiers (df up to |docs| -> hundreds of blocks/term)
INVIDX_BLOCK = 16
SKIPGRAM_WINDOW = 2
SKIPGRAM_K = 100
# full BPE training ledger gate: enough rounds that later merges build
# on earlier merged symbols (multi-char pairs appear by rank ~4 on the
# gate corpora)
BPE_MERGES = 8
# view -> click -> purchase within a day: the 86400 s conversion window
# discriminates at every tier (15/6/3 at sf0.001, 150/60/25 at sf0.01,
# 1500/536/217 at sf0.1) — without it every long-lived user converts
FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WITHIN_S = 86_400
NGRAM_N = 3
NGRAM_K = 50
NGRAM_MIN_COUNT = 2
WINNOW_K = 4
WINNOW_W = 5
OOV_VOCAB = 64
LM_ADD_K = 0.5
WINNOW_MIN_SHARED = 2
WINNOW_MAX_POSTINGS = 200
RETENTION_EPOCH = "2024-01-01"
RETENTION_BUCKET_DAYS = 3
SALSA_ITERS = 5
COCIT_K = 100
BC_SOURCES = 4
BC_MAX_DEPTH = 3
# deterministic random-walk corpus: one walk per seed (id % mod == 0),
# WALK_LEN hash-driven steps; the oracle unrolls one join + one
# per-walk argmin window per step
WALK_LEN = 4
WALK_SEED_MOD = 16
# node2vec-style second-order walk gate: copy counts (1, 1, 4) =
# (return, inout, in-prev's-neighborhood) — BFS-ish bias, exactly
# weighted via the integer-copy min-hash trick
N2V_RET = 1
N2V_IO = 1
N2V_BASE = 4
# train/val/test hash-split weights (percent)
SPLIT_WEIGHTS = (80, 10, 10)


def _pr_chain_ctes() -> list[str]:
    """The unrolled plain-PageRank CTE chain (pr0..prN), shared by the
    pagerank and spam_mass oracles."""
    d = PAGERANK_DAMPING
    ctes = [
        "n AS (SELECT count(*) AS cnt FROM verts)",
        "pr0 AS (SELECT v, 1.0 / (SELECT cnt FROM n) AS rank FROM verts)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT b.v AS v,
         (1.0 - {d}) / (SELECT cnt FROM n) + {d} * sum(p.rank / dg.degree) AS rank
  FROM bidir b
  JOIN pr{i - 1} p ON b.u = p.v
  JOIN deg dg ON dg.v = p.v
  GROUP BY b.v
)"""
        )
    return ctes


def _pagerank_oracle_sql() -> str:
    """Power iteration unrolled to PAGERANK_ITERS chained CTEs."""
    return (
        "WITH "
        + ",\n".join([_EDGES_CTE] + _pr_chain_ctes())
        + f"\nSELECT v AS vertex, round(rank, {ROUND}) AS rank_r FROM pr{PAGERANK_ITERS}"
    )


_WEDGES_CTE = """
pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
wedges AS (
  SELECT a.e AS src, b.e AS dst, count(*)::BIGINT AS weight
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
  GROUP BY a.e, b.e
),
wbidir AS (
  SELECT src AS u, dst AS v, weight FROM wedges
  UNION ALL
  SELECT dst AS u, src AS v, weight FROM wedges
),
strength AS (
  SELECT u AS v, sum(weight) AS strength FROM wbidir GROUP BY u
)
""".strip()


def _weighted_pagerank_oracle_sql() -> str:
    """Weighted power iteration unrolled: contributions proportional to
    edge weight over the sender's strength (weighted degree)."""
    d = PAGERANK_DAMPING
    ctes = [
        _WEDGES_CTE,
        "n AS (SELECT count(*) AS cnt FROM strength)",
        "pr0 AS (SELECT v, 1.0 / (SELECT cnt FROM n) AS rank FROM strength)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT b.v AS v,
         (1.0 - {d}) / (SELECT cnt FROM n)
           + {d} * sum(p.rank * b.weight / s.strength) AS rank
  FROM wbidir b
  JOIN pr{i - 1} p ON b.u = p.v
  JOIN strength s ON s.v = p.v
  GROUP BY b.v
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vertex, round(rank, {ROUND}) AS rank_r FROM pr{PAGERANK_ITERS}"
    )


def _sssp_oracle_sql() -> str:
    """Unrolled hop-bounded min-plus relaxation over the weighted
    bidirected edge table."""
    ctes = [
        _WEDGES_CTE,
        f"""d0 AS (
  SELECT v, CAST(0 AS BIGINT) AS dist
  FROM (SELECT DISTINCT u AS v FROM wbidir ORDER BY v LIMIT {SSSP_SEEDS})
)""",
    ]
    for i in range(1, SSSP_ITERS + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT v, min(dist) AS dist FROM (
    SELECT v, dist FROM d{i - 1}
    UNION ALL
    SELECT b.v AS v, p.dist + b.weight AS dist
    FROM d{i - 1} p JOIN wbidir b ON b.u = p.v
  ) GROUP BY v
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vertex, dist FROM d{SSSP_ITERS}"
    )


def _hits_oracle_sql() -> str:
    """HITS unrolled to 4 CTEs per iteration (auth raw/normalized, hub
    raw/normalized); L1 normalization keeps the recurrence sqrt-free."""
    ctes = [
        _EDGES_CTE,
        "h0 AS (SELECT v, 1.0 AS hub FROM verts)",
    ]
    for i in range(1, HITS_ITERS + 1):
        ctes.append(
            f"""a{i}r AS MATERIALIZED (
  SELECT e.dst AS v, sum(h.hub) AS s
  FROM edges e JOIN h{i - 1} h ON e.src = h.v GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(r.s, 0) / (SELECT sum(s) FROM a{i}r) AS auth
  FROM verts LEFT JOIN a{i}r r ON r.v = verts.v
)"""
        )
        ctes.append(
            f"""h{i}r AS MATERIALIZED (
  SELECT e.src AS v, sum(a.auth) AS s
  FROM edges e JOIN a{i} a ON e.dst = a.v GROUP BY e.src
)"""
        )
        ctes.append(
            f"""h{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(r.s, 0) / (SELECT sum(s) FROM h{i}r) AS hub
  FROM verts LEFT JOIN h{i}r r ON r.v = verts.v
)"""
        )
    n = HITS_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT h.v AS vertex, round(h.hub, {ROUND}) AS hub_r,
       round(a.auth, {ROUND}) AS auth_r
FROM h{n} h JOIN a{n} a ON a.v = h.v"""
    )


_PART_SEQ_DE = """nxt AS (
  SELECT l_partkey AS s,
         lead(l_partkey) OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey
         ) AS d
  FROM lineitem
),
de AS MATERIALIZED (
  SELECT DISTINCT s AS src, d AS dst FROM nxt
  WHERE d IS NOT NULL AND s != d
)"""


def _cocitation_oracle_sql(apex: str, end: str) -> str:
    return f"""WITH {_PART_SEQ_DE}
SELECT a.{end} AS u, b.{end} AS v, count(*)::BIGINT AS strength
FROM de a JOIN de b ON a.{apex} = b.{apex} AND a.{end} < b.{end}
GROUP BY a.{end}, b.{end}
ORDER BY strength DESC, u, v
LIMIT {COCIT_K}"""


def _salsa_oracle_sql() -> str:
    """SALSA unrolled: 2 MATERIALIZED CTEs per iteration (hub from
    auth/indeg, auth from hub/outdeg) over the distinct part-succession
    digraph; mass-conserving, so no normalization CTEs at all. The
    returned hub is the hub view of the SETTLED auth vector (one extra
    half-step), matching the engine's output contract."""
    ctes = [
        """nxt AS (
  SELECT l_partkey AS s,
         lead(l_partkey) OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey
         ) AS d
  FROM lineitem
)""",
        """de AS MATERIALIZED (
  SELECT DISTINCT s AS src, d AS dst FROM nxt
  WHERE d IS NOT NULL AND s != d
)""",
        "odeg AS (SELECT src, count(*) AS od FROM de GROUP BY src)",
        "ideg AS (SELECT dst, count(*) AS ideg_n FROM de GROUP BY dst)",
        """sa0 AS (
  SELECT dst AS v, 1.0 / (SELECT count(*) FROM ideg) AS auth FROM ideg
)""",
    ]
    for i in range(1, SALSA_ITERS + 1):
        ctes.append(
            f"""sh{i} AS MATERIALIZED (
  SELECT de.src AS v, sum(a.auth / g.ideg_n) AS hub
  FROM de JOIN sa{i - 1} a ON de.dst = a.v JOIN ideg g ON g.dst = de.dst
  GROUP BY de.src
)"""
        )
        ctes.append(
            f"""sa{i} AS MATERIALIZED (
  SELECT de.dst AS v, sum(h.hub / g.od) AS auth
  FROM de JOIN sh{i} h ON de.src = h.v JOIN odeg g ON g.src = de.src
  GROUP BY de.dst
)"""
        )
    n = SALSA_ITERS
    ctes.append(
        f"""shf AS MATERIALIZED (
  SELECT de.src AS v, sum(a.auth / g.ideg_n) AS hub
  FROM de JOIN sa{n} a ON de.dst = a.v JOIN ideg g ON g.dst = de.dst
  GROUP BY de.src
)"""
    )
    ctes.append(
        "sverts AS (SELECT src AS v FROM de UNION SELECT dst FROM de)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT sverts.v AS vertex,
       round(coalesce(h.hub, 0), {ROUND}) AS hub_r,
       round(coalesce(a.auth, 0), {ROUND}) AS auth_r
FROM sverts
LEFT JOIN shf h ON h.v = sverts.v
LEFT JOIN sa{n} a ON a.v = sverts.v"""
    )


def _ppr_chain_ctes() -> list[str]:
    """The unrolled personalized-PageRank CTE chain (seeds, reset,
    ppr0..pprN), shared by the PPR and spam_mass oracles."""
    d = PAGERANK_DAMPING
    ctes = [
        f"seeds AS (SELECT v FROM verts ORDER BY v LIMIT {PPR_SEEDS})",
        f"""reset AS (
  SELECT verts.v AS v,
         CASE WHEN s.v IS NOT NULL THEN 1.0 / {PPR_SEEDS} ELSE 0.0 END AS r
  FROM verts LEFT JOIN seeds s ON verts.v = s.v
)""",
        "ppr0 AS (SELECT v, r AS rank FROM reset)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"""ppr{i} AS (
  SELECT m.v AS v, (1.0 - {d}) * r0.r + {d} * m.s AS rank
  FROM (
    SELECT b.v AS v, sum(p.rank / dg.degree) AS s
    FROM bidir b
    JOIN ppr{i - 1} p ON b.u = p.v
    JOIN deg dg ON dg.v = p.v
    GROUP BY b.v
  ) m JOIN reset r0 ON r0.v = m.v
)"""
        )
    return ctes


def _ppr_oracle_sql() -> str:
    """Personalized power iteration unrolled to PAGERANK_ITERS CTEs;
    reset mass 1/PPR_SEEDS on the PPR_SEEDS smallest vertex ids."""
    return (
        "WITH "
        + ",\n".join([_EDGES_CTE] + _ppr_chain_ctes())
        + f"\nSELECT v AS vertex, round(rank, {ROUND}) AS rank_r FROM ppr{PAGERANK_ITERS}"
    )


def _spam_mass_oracle_sql() -> str:
    """TrustRank residual: both unrolled rank chains over the shared
    edge CTEs, joined once; the mass expression reads exactly as the
    engine's ``(rank - trusted)/rank`` — both operands engine-exact
    doubles (their own gates prove it), one fixed association order."""
    n = PAGERANK_ITERS
    return (
        "WITH "
        + ",\n".join([_EDGES_CTE] + _pr_chain_ctes() + _ppr_chain_ctes())
        + f"""
SELECT p.v AS vertex,
       round(p.rank, {ROUND}) AS rank_r,
       round(t.rank, {ROUND}) AS trusted_r,
       round((p.rank - t.rank) / p.rank, {ROUND}) AS mass_r
FROM pr{n} p JOIN ppr{n} t ON t.v = p.v"""
    )


def _ktruss_oracle_sql() -> str:
    """Synchronous support peeling unrolled KTRUSS_UNROLL times (see
    KTRUSS_UNROLL note; MATERIALIZED for the same CTE-re-expansion
    reason as the k-core oracle). The inner join against the support
    table drops support-0 edges implicitly — sound for any k >= 3
    (KTRUSS_K is 10; the k=2 truss would need a left join)."""
    ctes = [_EDGES_CTE, "t0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for i in range(1, KTRUSS_UNROLL + 1):
        ctes.append(
            f"""tri{i} AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM t{i - 1} e1
  JOIN t{i - 1} e2 ON e1.dst = e2.src
  JOIN t{i - 1} e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
sup{i} AS MATERIALIZED (
  SELECT u, v, count(*) AS s FROM (
    SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri{i}
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri{i}
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri{i}
  ) GROUP BY u, v
),
t{i} AS MATERIALIZED (
  SELECT t.src, t.dst FROM t{i - 1} t
  JOIN sup{i} s ON s.u = t.src AND s.v = t.dst
  WHERE s.s >= {KTRUSS_K - 2}
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT src, dst FROM t{KTRUSS_UNROLL}"
    )


def _score_oracle_sql() -> str:
    """Synchronous weighted peeling unrolled S_CORE_UNROLL times —
    the _kcore_oracle_sql shape with SUM(weight) strength; idempotent
    at the fixpoint, so the fixed unroll matches the engine."""
    ctes = [
        _WEDGES_CTE,
        "w0 AS MATERIALIZED (SELECT src, dst, weight FROM wedges)",
    ]
    for i in range(1, S_CORE_UNROLL + 1):
        ctes.append(
            f"""st{i} AS MATERIALIZED (
  SELECT u AS v, sum(weight) AS strength FROM (
    SELECT src AS u, weight FROM w{i - 1}
    UNION ALL SELECT dst, weight FROM w{i - 1}
  ) GROUP BY u
),
w{i} AS MATERIALIZED (
  SELECT w.src, w.dst, w.weight FROM w{i - 1} w
  JOIN st{i} sa ON sa.v = w.src
  JOIN st{i} sb ON sb.v = w.dst
  WHERE sa.strength >= {S_CORE_S} AND sb.strength >= {S_CORE_S}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT DISTINCT u AS vertex FROM (
  SELECT src AS u FROM w{S_CORE_UNROLL} UNION ALL SELECT dst FROM w{S_CORE_UNROLL}
)"""
    )


def _kcore_oracle_sql() -> str:
    """Synchronous peeling unrolled KCORE_UNROLL times (idempotent at
    the fixpoint — see KCORE_UNROLL note)."""
    # every peel CTE is MATERIALIZED: s{i} references s{i-1} three times
    # (directly + via d{i}), so plain inlined CTEs would re-expand the
    # whole chain exponentially (DuckDB ran out of file handles at
    # unroll 24 before finishing)
    ctes = [_EDGES_CTE, "s0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for i in range(1, KCORE_UNROLL + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT u AS v, count(*) AS degree FROM (
    SELECT src AS u FROM s{i - 1} UNION ALL SELECT dst FROM s{i - 1}
  ) GROUP BY u
),
s{i} AS MATERIALIZED (
  SELECT s.src, s.dst FROM s{i - 1} s
  JOIN d{i} da ON da.v = s.src
  JOIN d{i} db ON db.v = s.dst
  WHERE da.degree >= {KCORE_K} AND db.degree >= {KCORE_K}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT DISTINCT u AS vertex FROM (
  SELECT src AS u FROM s{KCORE_UNROLL} UNION ALL SELECT dst FROM s{KCORE_UNROLL}
)"""
    )


def _modularity_oracle_sql() -> str:
    """Newman Q over the LPA_ITERS-unrolled label chain (same CTEs as
    the LPA oracle, then an O(#communities) combine)."""
    ctes = [_EDGES_CTE, "lbl0 AS (SELECT v, v AS label FROM verts)"]
    for i in range(1, LPA_ITERS + 1):
        ctes.append(
            f"""cnt{i} AS (
  SELECT b.v AS v, l.label AS label, count(*) AS c
  FROM bidir b JOIN lbl{i - 1} l ON b.u = l.v
  GROUP BY b.v, l.label
),
lbl{i} AS (
  SELECT v, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) AS rn
    FROM cnt{i}
  ) WHERE rn = 1
)"""
        )
    n = LPA_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
intra AS (
  SELECT l1.label AS label, count(*) AS e_c
  FROM edges e
  JOIN lbl{n} l1 ON l1.v = e.src
  JOIN lbl{n} l2 ON l2.v = e.dst
  WHERE l1.label = l2.label
  GROUP BY l1.label
),
degc AS (
  SELECT l.label AS label, sum(d.degree) AS d_c
  FROM deg d JOIN lbl{n} l ON l.v = d.v GROUP BY l.label
),
mm AS (SELECT count(*)::DOUBLE AS m FROM edges)
SELECT round(sum(coalesce(i.e_c, 0)::DOUBLE / mm.m
             - pow(dc.d_c::DOUBLE / (2 * mm.m), 2)), {ROUND}) AS modularity_r
FROM degc dc LEFT JOIN intra i ON i.label = dc.label, mm"""
    )


def _lpa_oracle_sql() -> str:
    """Synchronous LPA unrolled to LPA_ITERS steps; most-frequent
    neighbor label, ties -> min label (row_number over (cnt DESC, label))."""
    ctes = [_EDGES_CTE, "lbl0 AS (SELECT v, v AS label FROM verts)"]
    for i in range(1, LPA_ITERS + 1):
        ctes.append(
            f"""cnt{i} AS (
  SELECT b.v AS v, l.label AS label, count(*) AS c
  FROM bidir b JOIN lbl{i - 1} l ON b.u = l.v
  GROUP BY b.v, l.label
),
lbl{i} AS (
  SELECT v, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) AS rn
    FROM cnt{i}
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vertex, label FROM lbl{LPA_ITERS}"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return part_graph(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _degrees(part_graph(spark, sf_dir))


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_graph(spark, sf_dir), strategy="intersect")


def _q_triangle_count_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_graph(spark, sf_dir), strategy="csr")


def _q_triangle_count_wedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_graph(spark, sf_dir), strategy="wedge")


def _q_triangle_count_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-selected strategy (degree-table cost probe, VERDICT r03
    #5) — gated against the same oracle as the manual strategies."""
    return triangle_count(part_graph(spark, sf_dir), strategy="auto")


def _q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles_per_vertex(part_graph(spark, sf_dir))


def _q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering_coefficient(part_graph(spark, sf_dir)).select(
        "vertex", F.round("coeff", ROUND).alias("coeff_r")
    )


def _q_wedge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _degrees(part_graph(spark, sf_dir)).agg(
        F.sum(F.expr("degree * (degree - 1) div 2")).alias("wedges")
    )


def _q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(part_graph(spark, sf_dir))


def _q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return component_sizes(part_graph(spark, sf_dir))


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(
        part_graph(spark, sf_dir), damping=PAGERANK_DAMPING, iterations=PAGERANK_ITERS
    )
    return pr.select("vertex", F.round("rank", ROUND).alias("rank_r"))


def _q_edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_part_graph(spark, sf_dir)


def _q_s_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    return s_core(weighted_part_graph(spark, sf_dir), s=S_CORE_S)


def _q_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = weighted_pagerank(
        weighted_part_graph(spark, sf_dir),
        damping=PAGERANK_DAMPING,
        iterations=PAGERANK_ITERS,
    )
    return pr.select("vertex", F.round("rank", ROUND).alias("rank_r"))


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-iteration contract (oracle unrolls exactly LPA_ITERS steps):
    # stability detection off skips the per-superstep fingerprint job;
    # the synchronous step is idempotent at a fixpoint so the output is
    # byte-identical either way
    return label_propagation(
        part_graph(spark, sf_dir), iterations=LPA_ITERS, detect_stability=False
    )


def _q_seeded_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    seeds = (
        _degrees(edges)
        .select("vertex")
        .orderBy("vertex")
        .limit(SEEDED_LPA_K)
        .select("vertex", F.col("vertex").alias("label"))
    )
    return seeded_label_propagation(
        edges, seeds, iterations=SEEDED_LPA_ITERS, detect_stability=False
    )


def _q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    seeds = (
        _degrees(edges).select("vertex").orderBy("vertex").limit(PPR_SEEDS)
    )
    sm = spam_mass(
        edges, seeds, damping=PAGERANK_DAMPING, iterations=PAGERANK_ITERS
    )
    return sm.select(
        "vertex",
        F.round("rank", ROUND).alias("rank_r"),
        F.round("trusted_rank", ROUND).alias("trusted_r"),
        F.round("mass", ROUND).alias("mass_r"),
    )


def _q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    seeds = (
        _degrees(edges).select("vertex").orderBy("vertex").limit(PPR_SEEDS)
    )
    pr = personalized_pagerank(
        edges, seeds, damping=PAGERANK_DAMPING, iterations=PAGERANK_ITERS
    )
    return pr.select("vertex", F.round("rank", ROUND).alias("rank_r"))


def _q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_core(part_graph(spark, sf_dir), k=KCORE_K)


def _q_approx_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paralleltrianglecounting_spark.operators.triangles import (
        approx_triangle_count,
    )

    return approx_triangle_count(
        part_graph(spark, sf_dir), rate_num=APPROX_TRI_NUM, rate_den=APPROX_TRI_DEN
    )


def _q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_truss(part_graph(spark, sf_dir), k=KTRUSS_K)


def _q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    seeds = _degrees(edges).select("vertex").orderBy("vertex").limit(BFS_SEEDS)
    return bfs_distances(edges, seeds, max_hops=BFS_MAX_HOPS)


def _q_bfs_distances_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-superstep BFS gate (VERDICT r03 #3): the order-chain graph
    is a union of paths, so each round's frontier is genuinely new
    vertices found by the topology join + visited anti-join, for
    BFS_DEEP_MAX_HOPS real rounds before the cap binds."""
    edges = order_chain_graph(spark, sf_dir)
    seeds = (
        _degrees(edges).select("vertex").orderBy("vertex").limit(BFS_DEEP_SEEDS)
    )
    return bfs_distances(edges, seeds, max_hops=BFS_DEEP_MAX_HOPS)


def _q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_assortativity(part_graph(spark, sf_dir))


def _q_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    labels = label_propagation(edges, iterations=LPA_ITERS, detect_stability=False)
    return community_modularity(edges, labels)


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_histogram(part_graph(spark, sf_dir))


def _q_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paralleltrianglecounting_spark.operators.triangles import edge_jaccard

    return edge_jaccard(part_graph(spark, sf_dir))


def _q_square_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return square_count(part_graph(spark, sf_dir))


def _q_k4_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k4_count(part_graph(spark, sf_dir))


def _q_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    return maximal_matching(part_graph(spark, sf_dir))


def _q_coarsen_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return coarsen_graph(part_graph(spark, sf_dir))


def _q_vertex_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vertex_cover(part_graph(spark, sf_dir))


def _q_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minimum_spanning_forest(weighted_part_graph(spark, sf_dir))


def _q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return maximal_independent_set(part_graph(spark, sf_dir))


def _q_greedy_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return greedy_coloring(order_chain_graph(spark, sf_dir))


def _q_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return densest_subgraph(part_graph(spark, sf_dir), epsilon=DENSEST_EPS)


def _q_butterfly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    return bipartite_motifs(li, "l_orderkey", "l_partkey")


def _q_projection_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    return projection_cost(li, "l_orderkey", "l_partkey")


def _q_topo_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topological_levels(order_chain_digraph(spark, sf_dir))


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _docs(spark, sf_dir), chunk_size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )


# decode-audit predicate: deterministic ~40% keep rate on every tier
MEDIA_KEEP_MOD, MEDIA_KEEP_LT = 5, 2


def _q_media_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prune-before-decode audit (VERDICT r04 #7): documents stand in
    for a blob table (payload = utf-8 bytes of text, kind = doc_id%3
    round-robin); the decode stage is the real mapInPandas image
    pipeline with the deterministic fake decoder. bytes_decoded is
    measured INSIDE the decode UDF; the DuckDB twin derives the kept
    subset from the predicate alone, so hash-equality proves the stage
    decoded exactly the metadata-kept payloads and nothing more."""
    from paralleltrianglecounting_spark.operators.multimodal import (
        decode_cost_audit,
    )

    kinds3 = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.element_at(kinds3, (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "kind"
        ),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("n_chars"),
    )
    keep = F.col("n_chars") % MEDIA_KEEP_MOD < MEDIA_KEEP_LT
    return decode_cost_audit(media, keep, kinds=["image"], fake=True)


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_search(
        _docs(spark, sf_dir), BM25_QUERIES, k=BM25_K, k1=BM25_K1, b=BM25_B
    )


def _q_anf_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neighborhood_bits(
        order_chain_graph(spark, sf_dir), max_hops=ANF_HOPS, n_trials=ANF_TRIALS
    )


def _q_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return core_numbers(part_graph(spark, sf_dir))


def _q_truss_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return truss_numbers(part_graph(spark, sf_dir))


def _q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return strongly_connected_components(
        order_cycle_digraph(spark, sf_dir, min_cycle=SCC_MIN_CYCLE)
    )


def _q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bowtie_structure(
        order_bowtie_digraph(
            spark,
            sf_dir,
            min_cycle=SCC_MIN_CYCLE,
            head=BOWTIE_HEAD,
            tail=BOWTIE_TAIL,
        )
    )


def _q_bipartite_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    return bipartite_components(
        li, "l_orderkey", "l_partkey", container_offset=BIPARTITE_OFFSET
    )


def _q_directed_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = directed_pagerank(
        order_chain_digraph(spark, sf_dir),
        damping=DPR_DAMPING,
        iterations=DPR_ITERS,
    )
    return ranks.select("vertex", F.round("rank", ROUND).alias("rank_r"))


def _q_single_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return single_linkage_clusters(
        weighted_part_graph(spark, sf_dir), SL_THRESHOLD
    )


def _q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    return eigenvector_centrality(part_graph(spark, sf_dir), iterations=EV_ITERS)


def _q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    return katz_centrality(
        part_graph(spark, sf_dir), alpha=KATZ_ALPHA, iterations=KATZ_ITERS
    )


def _q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rich_club(part_graph(spark, sf_dir), RICH_CLUB_KS)


def _q_triangle_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    is_delta = (_edge_rank(F.col("src"), F.col("dst")) % DELTA_MOD) == 0
    return triangle_count_delta(edges.where(~is_delta), edges.where(is_delta))


def _q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return link_prediction_topk(part_graph(spark, sf_dir), k=LINKPRED_K)


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = hits(part_graph(spark, sf_dir), iterations=HITS_ITERS)
    return h.select(
        "vertex",
        F.round("hub", ROUND).alias("hub_r"),
        F.round("auth", ROUND).alias("auth_r"),
    )


def _q_neighborhood_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neighborhood_size(part_graph(spark, sf_dir), hops=NBHD_HOPS)


def _q_personalized_pagerank_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted twin of ``personalized_pagerank`` (same oracle): the gate
    proves the hub-salted message join leaves PPR values bit-identical
    at ROUND decimals (VERDICT r03 #4 — production seed-relevance runs
    hit the same hub fan-out as plain pagerank)."""
    edges = part_graph(spark, sf_dir)
    seeds = (
        _degrees(edges).select("vertex").orderBy("vertex").limit(PPR_SEEDS)
    )
    pr = personalized_pagerank(
        edges,
        seeds,
        damping=PAGERANK_DAMPING,
        iterations=PAGERANK_ITERS,
        hub_threshold=256,
        n_salts=8,
    )
    return pr.select("vertex", F.round("rank", ROUND).alias("rank_r"))


def _q_pagerank_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as ``pagerank`` (same oracle) with the hub-salted
    message join engaged (operators/skew.py) — the gate proves the skew
    path is value-identical, not just row-count-identical."""
    pr = pagerank(
        part_graph(spark, sf_dir),
        damping=PAGERANK_DAMPING,
        iterations=PAGERANK_ITERS,
        hub_threshold=256,
        n_salts=8,
    )
    return pr.select("vertex", F.round("rank", ROUND).alias("rank_r"))


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_docs(spark, sf_dir))


def _q_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return subword_stats(_docs(spark, sf_dir))


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(_docs(spark, sf_dir))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_docs(spark, sf_dir))


def _q_exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf_dir))


def _q_deduplicated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return deduplicated_docs(_docs(spark, sf_dir))


def _q_triangle_count_resumable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunked/checkpointed flagship, gated against the SAME oracle
    as the one-shot count: the per-chunk metric rows must sum to the
    exact global answer (each triangle closes at exactly one oriented
    edge, each edge lives in exactly one chunk)."""
    res = triangle_count_resumable(part_graph(spark, sf_dir), chunks=4, resume=False)
    return res.state.agg(
        F.coalesce(F.sum("triangles_closed"), F.lit(0)).alias("triangles")
    )


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_candidates(_docs(spark, sf_dir), threshold=0.5)


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_clusters(_docs(spark, sf_dir), threshold=0.5)


def _q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_containment(_docs(spark, sf_dir), threshold=0.5)


def _q_lsh_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_dedup_recall(_docs(spark, sf_dir), threshold=0.5)


def _q_quality_filtered_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_filtered_docs(_docs(spark, sf_dir), q=0.4)


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


def _q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_scores(_docs(spark, sf_dir))


def _q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_pair_counts(_docs(spark, sf_dir))


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE training (VERDICT r04 #6): the learned merge ledger
    for BPE_MERGES rounds, gated value-exact against an unrolled
    DuckDB twin (see ``_bpe_merges_sql`` for how the greedy
    non-overlapping merge is expressed positionally in SQL)."""
    from paralleltrianglecounting_spark.operators.bpe import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=BPE_MERGES)


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(_docs(spark, sf_dir), block_size=INVIDX_BLOCK)


def _q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skipgram_pairs(
        _docs(spark, sf_dir), window=SKIPGRAM_WINDOW, k=SKIPGRAM_K
    )


def _q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_topk(
        _docs(spark, sf_dir), n=NGRAM_N, k=NGRAM_K, min_count=NGRAM_MIN_COUNT
    )


def _q_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    return item_cosine_topk(li, "l_orderkey", "l_partkey", k=COCIT_K)


def _item_cosine_oracle_sql() -> str:
    return f"""WITH pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
edeg AS (SELECT e, count(*) AS d FROM pairs GROUP BY e),
joint AS (
  SELECT a.e AS u, b.e AS v, count(*)::BIGINT AS strength
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
  GROUP BY a.e, b.e
)
SELECT j.u, j.v, j.strength,
       round(j.strength / sqrt(du.d * dv.d), {ROUND}) AS cosine_r
FROM joint j JOIN edeg du ON du.e = j.u JOIN edeg dv ON dv.e = j.v
ORDER BY cosine_r DESC, j.u, j.v
LIMIT {COCIT_K}"""


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(_docs(spark, sf_dir), k=WINNOW_K, w=WINNOW_W)


def _q_winnow_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_dup_clusters(
        _docs(spark, sf_dir),
        k=WINNOW_K,
        w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED,
        max_postings=WINNOW_MAX_POSTINGS,
    )


def _winnow_ctes() -> str:
    """Shared winnowing CTE block ending in ``wfp(doc_id, pos,
    fingerprint)`` — used by the fingerprint gate and the duplicate-
    cluster gate. Same packed-key trick as the engine:
    min(h32 * 2^24 + (2^24 - 1 - pos)) over the trailing-w window IS
    rightmost-min-on-ties; full windows only, short docs contribute the
    single winner of their whole sequence."""
    m = 1 << WINNOW_POS_BITS
    return f"""{_TOKS_CTE},
g AS (
  SELECT doc_id, i::BIGINT AS pos,
         (('0x' || substr(md5(array_to_string(
              list_slice(toks, i, i + {WINNOW_K} - 1), ' ')), 1, 14)
          )::BIGINT >> {WINNOW_POS_BITS}) AS h,
         (len(toks) - {WINNOW_K} + 1)::BIGINT AS n_grams
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {WINNOW_K} + 2)) AS i
        FROM toks_t WHERE len(toks) >= {WINNOW_K})
),
w AS (
  SELECT doc_id, pos, n_grams,
         min(h * {m} + ({m} - 1 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wk
  FROM g
),
sel AS (
  SELECT doc_id, wk FROM w
  WHERE pos >= {WINNOW_W}
     OR (n_grams < {WINNOW_W} AND pos = n_grams)
),
wfp AS MATERIALIZED (
  SELECT DISTINCT doc_id, ({m} - 1 - (wk % {m}))::BIGINT AS pos,
         (wk // {m})::BIGINT AS fingerprint
  FROM sel
)"""


def _winnow_oracle_sql() -> str:
    return f"""WITH {_winnow_ctes()}
SELECT doc_id, pos, fingerprint FROM wfp"""


def _winnow_clusters_oracle_sql() -> str:
    """MOSS clustering: invert the fingerprint index (postings cap),
    pair docs sharing >= min_shared fingerprints, recursive min-label
    CC over the pair graph, label every document."""
    return f"""WITH RECURSIVE {_winnow_ctes()},
dfp AS MATERIALIZED (SELECT DISTINCT doc_id, fingerprint FROM wfp),
posts AS (
  SELECT fingerprint FROM dfp GROUP BY fingerprint
  HAVING count(*) <= {WINNOW_MAX_POSTINGS}
),
kept AS MATERIALIZED (
  SELECT d.doc_id, d.fingerprint FROM dfp d
  JOIN posts p ON p.fingerprint = d.fingerprint
),
prs AS MATERIALIZED (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM kept a JOIN kept b
    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {WINNOW_MIN_SHARED}
),
pbidir AS MATERIALIZED (
  SELECT u, v FROM prs UNION ALL SELECT v AS u, u AS v FROM prs
),
pv AS (SELECT DISTINCT u AS vtx FROM pbidir),
pcc(vtx, l) AS (
  SELECT vtx, vtx FROM pv
  UNION
  SELECT b.v, pcc.l FROM pcc JOIN pbidir b ON b.u = pcc.vtx
  WHERE pcc.l < b.v
),
plbl AS (SELECT vtx, min(l) AS component FROM pcc GROUP BY vtx),
labeled AS (
  SELECT d.doc_id, coalesce(p.component, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN plbl p ON p.vtx = d.doc_id
),
csz AS (SELECT cluster_id, count(*)::BIGINT AS n_members
        FROM labeled GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, c.n_members
FROM labeled l JOIN csz c ON c.cluster_id = l.cluster_id"""


def _q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohorted on purchase activity at 3-day buckets: the full stream
    puts every user in cohort 0 (the fixture is dense), so the gate
    cohorts on the sparsest event type, where first-activity genuinely
    spreads (11 daily first-purchase cohorts at sf0.01)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_type") == "purchase"
    )
    return retention_cohorts(
        ev, epoch=RETENTION_EPOCH, bucket_days=RETENTION_BUCKET_DAYS
    )


def _retention_oracle_sql() -> str:
    return f"""WITH ub AS (
  SELECT DISTINCT user_id AS u,
         (date_diff('day', DATE '{RETENTION_EPOCH}', ts::DATE)::BIGINT
          // {RETENTION_BUCKET_DAYS}) AS b
  FROM events WHERE event_type = 'purchase'
),
firsts AS (SELECT u, min(b) AS cohort FROM ub GROUP BY u),
sizes AS (SELECT cohort, count(*)::BIGINT AS cohort_size
          FROM firsts GROUP BY cohort),
tri AS (
  SELECT f.cohort, ub.b - f.cohort AS "offset",
         count(*)::BIGINT AS active_users
  FROM ub JOIN firsts f ON f.u = ub.u
  GROUP BY f.cohort, ub.b - f.cohort
)
SELECT t.cohort, t."offset", t.active_users, s.cohort_size,
       round(t.active_users / s.cohort_size, {ROUND}) AS retention_r
FROM tri t JOIN sizes s ON s.cohort = t.cohort
ORDER BY t.cohort, t."offset\""""


DUP_SPAN_N = 5
# binds at both gate tiers: 833/2000 tail vertices at sf0.01,
# 9754/20000 at sf0.1 (min degree 42/38 — a non-binding d_min would
# make the filter dead code)
POWERLAW_DMIN = 120


def _q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_spans(_docs(spark, sf_dir), n=DUP_SPAN_N)


def _q_dup_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_span_runs(_docs(spark, sf_dir), n=DUP_SPAN_N)


def _q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    return powerlaw_alpha(part_graph(spark, sf_dir), d_min=POWERLAW_DMIN)


def _q_triangle_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_significance(part_graph(spark, sf_dir))


def _q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return oov_rate(_docs(spark, sf_dir), vocab_size=OOV_VOCAB)


def _oov_oracle_sql() -> str:
    return f"""WITH {_TOKS_CTE},
stream AS (
  SELECT doc_id, unnest(toks) AS tok FROM toks_t
),
vocab AS (
  SELECT tok FROM stream GROUP BY tok
  ORDER BY count(*) DESC, tok LIMIT {OOV_VOCAB}
)
SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
       round(CASE WHEN len(t.toks) > 0 THEN
         (SELECT count(*) FROM unnest(t.toks) AS u(tok)
          WHERE tok NOT IN (SELECT tok FROM vocab))::DOUBLE / len(t.toks)
       ELSE 0.0 END, {ROUND}) AS oov_frac_r
FROM toks_t t"""


def _q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_scores(_docs(spark, sf_dir), add_k=LM_ADD_K)


def _bigram_lm_oracle_sql() -> str:
    return f"""WITH {_TOKS_CTE},
bstream AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM toks_t WHERE len(toks) >= 2)
),
cb AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bstream GROUP BY w1, w2),
cu AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM cb GROUP BY w1),
voc AS (SELECT count(DISTINCT tok)::BIGINT AS v
        FROM (SELECT unnest(toks) AS tok FROM toks_t))
SELECT s.doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(ln((cb.c2 + {LM_ADD_K}) / (cu.c1 + {LM_ADD_K} * voc.v))),
             {ROUND}) AS avg_logp_r
FROM bstream s
JOIN cb ON cb.w1 = s.w1 AND cb.w2 = s.w2
JOIN cu ON cu.w1 = s.w1
CROSS JOIN voc
GROUP BY s.doc_id"""


def _q_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return link_prediction_jaccard(part_graph(spark, sf_dir), k=LINKPRED_K)


def _part_sequence_digraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-succession directed edges, self-loops dropped —
    the reciprocity gate's substrate as a reusable digraph (45k edges
    at sf0.01 with real in/out-degree spread)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = event_transitions(
        li,
        user_col="l_orderkey",
        type_col="l_partkey",
        ts_col="l_linenumber",
        id_col="l_partkey",
        tiebreak_cols=("l_suppkey",),
    )
    return (
        t.where(F.col("src_type") != F.col("dst_type"))
        .select(
            F.col("src_type").alias("src"), F.col("dst_type").alias("dst")
        )
        .distinct()
    )


def _q_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = salsa(_part_sequence_digraph(spark, sf_dir), iterations=SALSA_ITERS)
    return out.select(
        "vertex",
        F.round("hub", ROUND).alias("hub_r"),
        F.round("auth", ROUND).alias("auth_r"),
    )


def _q_co_citation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return co_citation_topk(
        _part_sequence_digraph(spark, sf_dir), k=COCIT_K, mode="cocitation"
    )


def _q_bibliographic_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return co_citation_topk(
        _part_sequence_digraph(spark, sf_dir), k=COCIT_K, mode="coupling"
    )


def _q_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triad_census(_part_sequence_digraph(spark, sf_dir))


def _q_dyad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dyad_census(_part_sequence_digraph(spark, sf_dir))


def _q_full_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return full_triad_census(_part_sequence_digraph(spark, sf_dir))


_TRIAD_ORACLE_CE = """ce AS MATERIALIZED (
  SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
         max(CASE WHEN src < dst THEN 1 ELSE 0 END)
         + 2 * max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS code
  FROM de GROUP BY 1, 2
)"""

_DYAD_ORACLE_TAIL = """dv AS (
  SELECT count(DISTINCT x)::BIGINT AS n FROM (
    SELECT lo AS x FROM ce UNION ALL SELECT hi FROM ce
  )
),
dma AS (
  SELECT coalesce(sum(CASE WHEN code = 3 THEN 1 ELSE 0 END), 0)::BIGINT AS mutual,
         coalesce(sum(CASE WHEN code != 3 THEN 1 ELSE 0 END), 0)::BIGINT AS asym
  FROM ce
)"""


def _dyad_census_oracle_sql() -> str:
    return f"""WITH {_PART_SEQ_DE},
{_TRIAD_ORACLE_CE},
{_DYAD_ORACLE_TAIL}
SELECT dv.n AS n_vertices, dma.mutual, dma.asym,
       (dv.n * (dv.n - 1) // 2 - dma.mutual - dma.asym)::BIGINT AS null_dyads
FROM dv, dma"""


def _full_triad_census_oracle_sql() -> str:
    """Full 16-class census: the closed classes via the textbook 3-way
    self-join + the shared code CASE (the triad_census oracle), the
    open connected classes via support wedges with a null closing
    pair, 012/102/003 via the same inclusion–exclusion closed forms
    as the engine (the per-class dyad compositions are the published
    contract, not an engine internal)."""
    comp_vals = ", ".join(
        f"('{k}', {m}, {a})" for k, (m, a) in sorted(_CLASS_DYADS.items())
    )
    uni_vals = ", ".join(f"('{c}')" for c in FULL_TRIAD_CLASSES)
    return f"""WITH {_PART_SEQ_DE},
{_TRIAD_ORACLE_CE},
tri AS (
  SELECT ab.code AS a, bc.code AS b, ac.code AS c
  FROM ce ab
  JOIN ce bc ON bc.lo = ab.hi
  JOIN ce ac ON ac.lo = ab.lo AND ac.hi = bc.hi
),
cls AS (
  SELECT CASE
    WHEN (a = 3)::INT + (b = 3)::INT + (c = 3)::INT = 3 THEN '300'
    WHEN (a = 3)::INT + (b = 3)::INT + (c = 3)::INT = 2 THEN '210'
    WHEN a = 3 THEN CASE (b = 2)::INT + (c = 2)::INT
                    WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END
    WHEN b = 3 THEN CASE (a = 1)::INT + (c = 1)::INT
                    WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END
    WHEN c = 3 THEN CASE (a = 2)::INT + (b = 1)::INT
                    WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END
    WHEN (a = 1 AND b = 1 AND c = 2) OR (a = 2 AND b = 2 AND c = 1)
      THEN '030C'
    ELSE '030T' END AS triad_class
  FROM tri
),
inc AS (
  SELECT lo AS z, hi AS o,
         CASE WHEN code = 3 THEN 'm' WHEN code = 1 THEN 'out' ELSE 'in' END AS s
  FROM ce
  UNION ALL
  SELECT hi, lo,
         CASE WHEN code = 3 THEN 'm' WHEN code = 2 THEN 'out' ELSE 'in' END
  FROM ce
),
wed AS (
  SELECT i1.o AS lo, i2.o AS hi, i1.s AS s1, i2.s AS s2
  FROM inc i1 JOIN inc i2 ON i1.z = i2.z AND i1.o < i2.o
),
openw AS (
  SELECT w.s1, w.s2 FROM wed w
  LEFT JOIN ce ON ce.lo = w.lo AND ce.hi = w.hi
  WHERE ce.lo IS NULL
),
ocls AS (
  SELECT CASE
    WHEN s1 = 'm' AND s2 = 'm' THEN '201'
    WHEN s1 = 'm' OR s2 = 'm' THEN
      CASE WHEN (CASE WHEN s1 = 'm' THEN s2 ELSE s1 END) = 'out'
           THEN '111U' ELSE '111D' END
    WHEN s1 = 'out' AND s2 = 'out' THEN '021D'
    WHEN s1 = 'in' AND s2 = 'in' THEN '021U'
    ELSE '021C' END AS triad_class
  FROM openw
),
conn AS (
  SELECT triad_class, count(*)::BIGINT AS triads FROM (
    SELECT triad_class FROM cls UNION ALL SELECT triad_class FROM ocls
  ) GROUP BY 1
),
comp(triad_class, m, a) AS (VALUES {comp_vals}),
sums AS (
  SELECT coalesce(sum(c.triads * comp.m), 0)::BIGINT AS sm,
         coalesce(sum(c.triads * comp.a), 0)::BIGINT AS sa,
         coalesce(sum(c.triads), 0)::BIGINT AS stot
  FROM conn c JOIN comp USING (triad_class)
),
{_DYAD_ORACLE_TAIL},
der AS (
  SELECT '012' AS triad_class,
         (dma.asym * (dv.n - 2) - sums.sa)::BIGINT AS triads
  FROM dv, dma, sums
  UNION ALL
  SELECT '102', (dma.mutual * (dv.n - 2) - sums.sm)::BIGINT
  FROM dv, dma, sums
  UNION ALL
  SELECT '003', ((dv.n * (dv.n - 1) // 2) * (dv.n - 2) // 3 - sums.stot
         - (dma.asym * (dv.n - 2) - sums.sa)
         - (dma.mutual * (dv.n - 2) - sums.sm))::BIGINT
  FROM dv, dma, sums
),
uni(triad_class) AS (VALUES {uni_vals})
SELECT u.triad_class, coalesce(s.t, 0)::BIGINT AS triads
FROM uni u LEFT JOIN (
  SELECT triad_class, sum(triads)::BIGINT AS t FROM (
    SELECT * FROM conn UNION ALL SELECT * FROM der
  ) GROUP BY 1
) s USING (triad_class)
ORDER BY u.triad_class"""


def _triad_census_oracle_sql() -> str:
    """Closed-triad census over the part-succession digraph: fold each
    arc pair into a 2-bit code on the canonical (lo, hi) support edge,
    enumerate undirected triangles with the textbook 3-way self-join
    (independent of the engine's rank-oriented kernel), classify with
    the SAME code CASE the engine uses (the classification is the
    shared contract; the enumeration strategy is not)."""
    return f"""WITH {_PART_SEQ_DE},
ce AS MATERIALIZED (
  SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
         max(CASE WHEN src < dst THEN 1 ELSE 0 END)
         + 2 * max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS code
  FROM de GROUP BY 1, 2
),
tri AS (
  SELECT ab.code AS a, bc.code AS b, ac.code AS c
  FROM ce ab
  JOIN ce bc ON bc.lo = ab.hi
  JOIN ce ac ON ac.lo = ab.lo AND ac.hi = bc.hi
),
cls AS (
  SELECT CASE
    WHEN (a = 3)::INT + (b = 3)::INT + (c = 3)::INT = 3 THEN '300'
    WHEN (a = 3)::INT + (b = 3)::INT + (c = 3)::INT = 2 THEN '210'
    WHEN a = 3 THEN CASE (b = 2)::INT + (c = 2)::INT
                    WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END
    WHEN b = 3 THEN CASE (a = 1)::INT + (c = 1)::INT
                    WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END
    WHEN c = 3 THEN CASE (a = 2)::INT + (b = 1)::INT
                    WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END
    WHEN (a = 1 AND b = 1 AND c = 2) OR (a = 2 AND b = 2 AND c = 1)
      THEN '030C'
    ELSE '030T' END AS triad_class
  FROM tri
),
uni(triad_class) AS (
  VALUES ('030C'), ('030T'), ('120C'), ('120D'), ('120U'), ('210'), ('300')
)
SELECT u.triad_class, coalesce(s.cnt, 0)::BIGINT AS triads
FROM uni u LEFT JOIN (
  SELECT triad_class, count(*) AS cnt FROM cls GROUP BY 1
) s USING (triad_class)
ORDER BY u.triad_class"""


BACKBONE_THRESHOLDS = (1, 2, 3)


def _q_backbone_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return backbone_profile(
        weighted_part_graph(spark, sf_dir), thresholds=BACKBONE_THRESHOLDS
    )


def _backbone_oracle_sql() -> str:
    """One recursive min-label CC per threshold level over the
    weight-filtered bidirected view, then per-level stats; UNION ALL of
    the levels."""
    blocks = []
    selects = []
    for t in BACKBONE_THRESHOLDS:
        blocks.append(
            f"""wb{t} AS MATERIALIZED (
  SELECT u, v FROM wbidir WHERE weight >= {t}
),
v{t} AS MATERIALIZED (
  SELECT DISTINCT u AS v FROM wb{t}
),
cc{t}(v, l) AS (
  SELECT v, v FROM v{t}
  UNION
  SELECT b.v, cc{t}.l FROM cc{t}
  JOIN wb{t} b ON b.u = cc{t}.v
  WHERE cc{t}.l < b.v
),
lbl{t} AS (SELECT v, min(l) AS component FROM cc{t} GROUP BY v),
sz{t} AS (SELECT component, count(*)::BIGINT AS n FROM lbl{t} GROUP BY component)"""
        )
        selects.append(
            f"""SELECT {t}::BIGINT AS threshold,
       (SELECT count(*)::BIGINT FROM wedges WHERE weight >= {t}) AS kept_edges,
       coalesce((SELECT sum(n) FROM sz{t}), 0)::BIGINT AS n_vertices,
       (SELECT count(*)::BIGINT FROM sz{t}) AS components,
       coalesce((SELECT max(n) FROM sz{t}), 0)::BIGINT AS largest_cc"""
        )
    return (
        f"WITH RECURSIVE {_WEDGES_CTE},\n"
        + ",\n".join(blocks)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY threshold"
    )


def _q_weighted_triangle_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_triangle_intensity(weighted_part_graph(spark, sf_dir))


def _weighted_intensity_oracle_sql() -> str:
    return """WITH pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
we AS MATERIALIZED (
  SELECT a.e AS src, b.e AS dst, count(*)::BIGINT AS w
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
  GROUP BY a.e, b.e
)
SELECT count(*)::BIGINT AS triangles,
       coalesce(sum(ab.w * bc.w * ac.w), 0)::BIGINT AS intensity
FROM we ab
JOIN we bc ON bc.src = ab.dst
JOIN we ac ON ac.src = ab.src AND ac.dst = bc.dst"""


def _q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_funnel(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        steps=FUNNEL_STEPS,
        within_seconds=FUNNEL_WITHIN_S,
    )


def _q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_collocations(_docs(spark, sf_dir), k=PMI_K, min_count=PMI_MIN_COUNT)


def _q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_split(_docs(spark, sf_dir), weights=SPLIT_WEIGHTS)


def _q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_weights(_docs(spark, sf_dir), alpha=MIX_ALPHA)


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequence_packing(_docs(spark, sf_dir))


def _q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return balanced_sample(_docs(spark, sf_dir), strata="lang")


def _q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return random_walks(
        part_graph(spark, sf_dir), walk_len=WALK_LEN, seed_mod=WALK_SEED_MOD
    )


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
    return contamination_check(
        corpus, bench, n=CONTAM_N, min_overlap=CONTAM_MIN_OVERLAP
    )


def _q_triangle_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine triples come out in rank-orientation order; canonicalize to
    # id order (x < y < z) to match the oracle's src<dst edge chaining
    t = triangle_triples(part_graph(spark, sf_dir))
    lo = F.least("a", "b", "c")
    hi = F.greatest("a", "b", "c")
    mid = F.col("a") + F.col("b") + F.col("c") - lo - hi
    return t.select(lo.alias("x"), mid.alias("y"), hi.alias("z"))


def _q_clique_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clique_percolation(
        part_graph(spark, sf_dir, max_container_size=CPM_MAX_CONTAINER)
    )


def _q_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transitivity(part_graph(spark, sf_dir))


def _q_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the capped substrate (see CPM_MAX_CONTAINER): the full
    # co-occurrence graph has 8 bridge edges at sf0.01 — no gate power
    return local_bridges(
        part_graph(spark, sf_dir, max_container_size=CPM_MAX_CONTAINER)
    )


def _q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_counts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return group_quantiles(ev, "event_type", "value")


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_part_sequence_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the part-succession digraph (consecutive parts within an order,
    # in line-number sequence) — 45k distinct directed edges at sf0.01
    # with reciprocity ~0.01: both counters do real work, unlike the
    # 5-vertex event-type digraph whose reciprocity saturates at 1.0.
    # l_linenumber is NOT unique per order in this synthetic tier, so
    # the succession totals its order with (partkey, suppkey) —
    # (l_orderkey, l_linenumber, l_partkey, l_suppkey) is verified
    # duplicate-free at the gate tiers, making the count table
    # engine-portable (window ties are engine-dependent otherwise)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    t = event_transitions(
        li,
        user_col="l_orderkey",
        type_col="l_partkey",
        ts_col="l_linenumber",
        id_col="l_partkey",
        tiebreak_cols=("l_suppkey",),
    ).select(F.col("src_type").alias("src"), F.col("dst_type").alias("dst"))
    return reciprocity(t)


def _q_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return condensation(
        order_cycle_digraph(spark, sf_dir, min_cycle=SCC_MIN_CYCLE)
    )


def _q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet"), gap_minutes=30
    )


def _q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_totals(spark.read.parquet(f"{sf_dir}/orders.parquet"))


def _q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return harmonic_centrality(
        part_graph(spark, sf_dir), n_sources=BC_SOURCES, max_depth=BC_MAX_DEPTH
    )


def _q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return closeness_centrality(
        part_graph(spark, sf_dir), n_sources=BC_SOURCES, max_depth=BC_MAX_DEPTH
    )


def _q_ego_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = part_graph(spark, sf_dir)
    seeds = _degrees(edges).select("vertex").orderBy("vertex").limit(EGO_SEEDS)
    return ego_net(edges, seeds, hops=EGO_HOPS)


def _q_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return diameter_estimate(
        order_chain_graph(spark, sf_dir), max_hops=DIAMETER_MAX_HOPS
    )


def _q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sssp(
        weighted_part_graph(spark, sf_dir), n_seeds=SSSP_SEEDS, iterations=SSSP_ITERS
    )


def _q_biased_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return biased_walks(
        part_graph(spark, sf_dir),
        walk_len=WALK_LEN,
        seed_mod=WALK_SEED_MOD,
        return_copies=N2V_RET,
        inout_copies=N2V_IO,
        base_copies=N2V_BASE,
    )


def _q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return betweenness(
        part_graph(spark, sf_dir), n_sources=BC_SOURCES, max_depth=BC_MAX_DEPTH
    )


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.3)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir))


def _q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=3)


def _q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_registers(_docs(spark, sf_dir))


def _q_cms_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_registers(_docs(spark, sf_dir))


def _q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_heavy_hitters(_docs(spark, sf_dir), k=20)


def _q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_contamination(_docs(spark, sf_dir))


def _q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantize_embeddings(_emb(spark, sf_dir))


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_recall(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantized_recall(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_codes(_emb(spark, sf_dir))


def _q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_recall(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paralleltrianglecounting_spark.operators.simrank import simrank

    return simrank(part_graph(spark, sf_dir))


def _q_graphlet_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from paralleltrianglecounting_spark.operators.graphlets import graphlet_census

    return graphlet_census(part_graph(spark, sf_dir))


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_ann_topk(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rrf_fusion(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lloyd_rounds=0 pins the sample-seeded coarse quantizer the oracle
    # can reproduce exactly (see _ivf_centroids); refined quantizers are
    # pytest-verified against a NumPy twin
    return ivf_ann_topk(_emb(spark, sf_dir), k=5, n_queries=20)


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synthetic embeddings are near-random (cosine tops out ~0.45), so
    # the "near-dup" threshold is set where data exists; blocking is
    # multi-band LSH over the embedding itself — no fixture column
    return embedding_near_duplicates(_emb(spark, sf_dir), threshold=0.3)


def _bucket_sql(emb_expr: str, dim: int, planes: int, band: int = 0) -> str:
    """DuckDB expression computing the SAME hyperplane bucket as
    ``similarity._hyperplane_bucket`` — the ±1 sign matrix is the same
    driver-side md5-derived literal table on both sides, so the bucket
    assignment (and therefore the LSH gates) is value-exact."""
    terms = []
    for p, signs in enumerate(hyperplane_signs(dim, planes, band)):
        lst = "[" + ", ".join(str(s) for s in signs) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({emb_expr}, {lst}) > 0"
            f" THEN {1 << p} ELSE 0 END"
        )
    return "(" + "\n + ".join(terms) + ")"


def _q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value_r"),
    )


def _q_events_windowed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming promoted into the driver contract (VERDICT
    r03 #7): stage the events table as parquet files, run the windowed
    aggregation as an availableNow micro-batch STREAM (3 triggers at 8
    files each — real cross-batch state merging in the streaming
    aggregation), and return the final complete-mode result. Gated
    against the SAME oracle as the batch ``events_windowed`` — the
    stream's answer must hash-equal the batch answer.

    Complete mode (not append) because the gate wants every window: in
    append mode the watermark never passes the final windows at end of
    input, so they would be withheld. State is identical either way;
    eviction is the only difference, and a bounded gate fixture doesn't
    need eviction."""
    import shutil
    import tempfile
    import uuid

    from paralleltrianglecounting_spark.streaming.edge_stream import (
        stream_windowed_events,
    )

    stage = tempfile.mkdtemp(prefix="events_stream_stage_")
    ck = tempfile.mkdtemp(prefix="events_stream_ck_")
    name = "events_windowed_stream_" + uuid.uuid4().hex[:8]
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev.repartition(24).write.mode("overwrite").parquet(stage)
        q = (
            stream_windowed_events(spark, stage, fmt="parquet")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # the memory sink holds the final-trigger rows driver-side; the
        # staging files and stream checkpoint are no longer referenced
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name).select(
        "event_type",
        "window_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 4).alias("sum_value_r"),
    )


def _q_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph_summary(part_graph(spark, sf_dir))


def _q_degrees_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming degrees gated against the SAME oracle as the batch
    ``degrees`` query: the canonical part-graph edge table is staged as
    24 parquet files, replayed as an availableNow micro-batch stream
    (3 triggers at 8 files — a vertex's edges really do arrive across
    batches and merge in the streaming aggregation state), and the
    final complete-mode result must hash-equal the batch answer."""
    import shutil
    import tempfile
    import uuid

    from paralleltrianglecounting_spark.streaming.edge_stream import (
        stream_degrees,
    )

    stage = tempfile.mkdtemp(prefix="degrees_stream_stage_")
    ck = tempfile.mkdtemp(prefix="degrees_stream_ck_")
    name = "degrees_stream_" + uuid.uuid4().hex[:8]
    try:
        part_graph(spark, sf_dir).repartition(24).write.mode(
            "overwrite"
        ).parquet(stage)
        q = (
            stream_degrees(spark, stage)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name).select(
        "vertex", F.col("degree").cast("long").alias("degree")
    )


def _q_user_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization gated against the SAME oracle as the
    batch ``user_sessions``: native ``session_window`` state merging
    under a watermark, run availableNow over staged files with an
    APPEND-mode parquet sink (append is the production shape — each
    session is emitted exactly once, when the watermark finalizes it).

    The watermark-flush choreography is the real streaming lesson this
    gate pins, and both halves were verified by building it wrong
    first:

    - the staged files replay in arbitrary order, so the watermark
      delay must exceed the fixture's WHOLE time span or early-file
      maxima mark later-file rows late and the aggregation silently
      DROPS them (measured: a 2 h delay lost 302 of 946 sessions at
      sf0.001). A bounded backfill replay therefore runs with a
      delay > span — late-drop is a live-ingest semantic, not a
      replay one;
    - a watermark computed from batch N's data only APPLIES in batch
      N+1, so after the real files are ingested, two strictly-later
      sentinel events are appended in two separate single-file
      triggers — the first advances the watermark past every real
      session's end, the second's batch flushes them. Without the
      second sentinel the tail sessions stay in state forever.
      Sentinels carry user_id = −1 and are filtered from the result.

    session_id (the oracle's 1-based per-user numbering) is assigned
    driver-side on the COLLECTED final sessions — bounded by the
    session count, not the event count."""
    import shutil
    import tempfile
    from datetime import timedelta

    from paralleltrianglecounting_spark.streaming.edge_stream import (
        stream_user_sessions,
    )

    stage = tempfile.mkdtemp(prefix="sess_stream_stage_")
    ck = tempfile.mkdtemp(prefix="sess_stream_ck_")
    out = tempfile.mkdtemp(prefix="sess_stream_out_")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        ev.repartition(24).write.mode("overwrite").parquet(stage)

        wm_hours = 90000  # > any fixture's time span: replay, not live

        def run(max_files: int) -> None:
            q = (
                stream_user_sessions(
                    spark,
                    stage,
                    watermark=f"{wm_hours} hours",
                    max_files_per_trigger=max_files,
                )
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(8)
        s_schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        for j, hours in enumerate((wm_hours + 6, wm_hours + 12)):
            sent = spark.createDataFrame(
                [(-1 - j, max_ts + timedelta(hours=hours), -1, "sentinel", 0.0)],
                s_schema,
            )
            sent.coalesce(1).write.mode("append").parquet(stage)
            run(1)
        rows = (
            spark.read.parquet(out)
            .where(F.col("user_id") >= 0)
            .select("user_id", "session_start", "session_end", "n_events")
            .collect()
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
    rows.sort(key=lambda r: (r["user_id"], r["session_start"]))
    data = []
    prev_u, sid = None, 0
    for r in rows:
        sid = sid + 1 if r["user_id"] == prev_u else 1
        prev_u = r["user_id"]
        data.append(
            (r["user_id"], sid, r["session_start"], r["session_end"], r["n_events"])
        )
    return spark.createDataFrame(
        data,
        "user_id long, session_id long, session_start timestamp, "
        "session_end timestamp, n_events long",
    )


def _q_triangle_count_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental triangle maintenance as a STREAM: the part
    graph's edges are staged as parquet files and ingested by an
    availableNow micro-batch stream (3+ triggers at 8 files each); each
    batch counts only the triangles it creates (delta
    inclusion–exclusion against the accumulated table) and the summed
    total is gated against the SAME oracle as the batch
    ``triangle_count`` — the maintained count must equal a full
    recount, which batch boundaries cannot affect (every triangle is
    counted once, by the batch delivering its last edge)."""
    import shutil
    import tempfile

    from paralleltrianglecounting_spark.streaming.edge_stream import (
        incremental_triangle_stream,
        incremental_triangle_total,
    )

    stage = tempfile.mkdtemp(prefix="tri_stream_stage_")
    work = tempfile.mkdtemp(prefix="tri_stream_work_")
    table = f"{work}/table"
    counts = f"{work}/counts"
    ck = f"{work}/ck"
    try:
        part_graph(spark, sf_dir).repartition(24).write.mode("overwrite").parquet(
            stage
        )
        q = (
            incremental_triangle_stream(spark, stage, table, counts, ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        total = incremental_triangle_total(spark, counts).collect()[0]["triangles"]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame([(int(total),)], "triangles long")


def _q_connected_components_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maintained streaming CC gated against the SAME oracle as the
    batch ``connected_components``: the part-graph edge table staged
    as 24 parquet files, replayed availableNow at 8 files per trigger
    (3 micro-batches — components genuinely split across batches and
    must MERGE through the quotient-graph maintenance step in
    streaming/edge_stream.py:incremental_cc_stream), final state read
    back as [vertex, component]."""
    import shutil
    import tempfile

    from paralleltrianglecounting_spark.streaming.edge_stream import (
        incremental_cc_labels,
        incremental_cc_stream,
    )

    stage = tempfile.mkdtemp(prefix="cc_stream_stage_")
    work = tempfile.mkdtemp(prefix="cc_stream_work_")
    try:
        part_graph(spark, sf_dir).repartition(24).write.mode(
            "overwrite"
        ).parquet(stage)
        q = (
            incremental_cc_stream(
                spark, stage, f"{work}/labels", f"{work}/ck"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = incremental_cc_labels(spark, f"{work}/labels")
        rows = out.collect()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def _q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick (OHLC) bars per (event_type, hour): open/close are
    the first/last observation under the TOTAL (ts, event_id) order —
    two row_number windows, never arg_min/min_by whose composite-key
    tie semantics are not a portable contract. high/low/open/close are
    parquet-double passthroughs (bit-exact across engines)."""
    from paralleltrianglecounting_spark.operators.stats import ohlc_bars

    return ohlc_bars(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_events_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact time-weighted average per event_type — the weighted sum
    runs in INTEGER arithmetic (cents fixed-point × whole-second
    holding times) so the gate is hash-exact where a raw double
    Σ value·Δt could never be (partition-order-dependent); the exact
    integer numerator/denominator ride alongside the 6-dp ratio."""
    from paralleltrianglecounting_spark.operators.stats import (
        time_weighted_avg,
    )

    return time_weighted_avg(spark.read.parquet(f"{sf_dir}/events.parquet"))


CONVERSION_TOL_S = 86400  # forward as-of tolerance: 24 h conversion window


def _q_click_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (the pandas merge_asof
    surface, distributed): each click joined to the same user's next
    purchase at-or-after it, reverted to no-match past the 24 h
    conversion window — the funnel-conversion twin of the backward
    `purchase_attribution` gate, running the identical union-tag-
    window machinery on the negated microsecond axis. Sentinels keep
    the output hash-gateable; ~35% of clicks convert inside the window
    at both tiers (692/2,006 and 7,065/19,863), so the matched,
    no-next-purchase, and past-tolerance branches are all populated."""
    from paralleltrianglecounting_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    j = asof_join(
        clicks,
        purchases,
        on="user_id",
        direction="forward",
        tolerance_s=CONVERSION_TOL_S,
    )
    matched = F.col("asof_event_id").isNotNull()
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
        F.coalesce("asof_event_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce("asof_ts_us", F.lit(-1)).alias("purchase_ts_us"),
        F.coalesce(
            F.col("asof_ts_us") - F.col("ts_us"), F.lit(0)
        ).alias("gap_us"),
        matched.cast("int").alias("matched"),
    )


def _q_brand_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotient supergraph (operators/quotient.py): the part
    co-occurrence graph collapsed through the part→brand attribute
    mapping — the host-graph aggregation shape (page→host, repo→org).
    Broadcast mapping join ×2 + map-side-combinable count aggregate;
    intra-brand mass surfaces as self-loops rather than vanishing."""
    from paralleltrianglecounting_spark.operators.quotient import (
        quotient_graph,
    )

    mapping = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("vertex"), F.col("p_brand").alias("group")
    )
    return quotient_graph(part_graph(spark, sf_dir), mapping)


SUFFIX_ROUNDS = 6  # prefix-doubling depth: ranks order the first 64 tokens


def _q_suffix_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed suffix ranking by prefix doubling
    (operators/suffix.py) — the Manber–Myers iteration behind
    suffix-array exact-substring dedup (Lee et al. ACL 2022), run for
    6 doubling rounds so every position's rank is EXACTLY the dense
    rank of its suffix truncated at 64 tokens: a finite contract the
    oracle reproduces by sorting explicit token slices. Per round the
    order-preserving global re-rank is range-partition + in-partition
    dense_rank + driver-collected per-partition offsets — never a
    single-partition window."""
    from paralleltrianglecounting_spark.operators.suffix import suffix_ranks

    return suffix_ranks(_docs(spark, sf_dir), rounds=SUFFIX_ROUNDS)


def _q_dup_prefix_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span detector from the suffix machinery
    (operators/suffix.py:dup_prefix_depths): per position, the largest
    power-of-two depth at which its clipped suffix prefix occurs at
    another position — dup_len >= L is the Lee et al. exact-substring
    dedup cut at doubling-grid resolution. Shared-ness rides the
    doubling rounds as one carry-along column (classes only split, so
    the max is a running update); the oracle recomputes it from
    per-depth slice group counts."""
    from paralleltrianglecounting_spark.operators.suffix import (
        dup_prefix_depths,
    )

    return dup_prefix_depths(_docs(spark, sf_dir), rounds=SUFFIX_ROUNDS)


def _dup_depth_oracle_sql() -> str:
    depths = [1 << j for j in range(SUFFIX_ROUNDS + 1)]
    slices = ",\n         ".join(
        f"list_slice(toks, i, i + {d - 1}) AS s{d}" for d in depths
    )
    counts = ",\n         ".join(
        f"count(*) OVER (PARTITION BY s{d}) AS c{d}" for d in depths
    )
    cases = " ".join(
        f"WHEN c{d} >= 2 THEN {d}" for d in reversed(depths)
    )
    return f"""WITH {_TOKS_CTE},
pos_t AS (
  SELECT doc_id, i - 1 AS pos,
         {slices}
  FROM toks_t,
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
),
c AS (
  SELECT doc_id, pos,
         {counts}
  FROM pos_t
)
SELECT doc_id, pos,
       (CASE {cases} ELSE 0 END)::BIGINT AS dup_len
FROM c"""


TEMPORAL_DELTA_S = 600  # δ for the 2-event temporal motif gate


def _q_temporal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """δ-temporal 2-event motif counts: ALL same-user ordered event
    pairs within δ=600 s (not just consecutive — the contrast with
    event_transitions), counted per (earlier type, later type) via the
    banded range join (operators/temporal.py:temporal_pair_counts).
    The oracle runs the same predicate as a plain theta self-join —
    the banding changes the plan, never the answer."""
    from paralleltrianglecounting_spark.operators.temporal import (
        temporal_pair_counts,
    )

    return temporal_pair_counts(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        delta_s=TEMPORAL_DELTA_S,
    )


PPS_TARGET = 100  # expected PPS sample size — tier-independent by design


def _q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PPS Bernoulli corpus sampling
    (operators/sampling.py:pps_sample): keep doc d iff
    hash32(d) < (target·w_d·2^32) div W — all-integer, no RNG, no
    floats, hash-exact by construction. The expected sample size is
    target_n at EVERY tier (W scales with the corpus, thresholds
    shrink to match) — the gate exhibits that invariant across
    sf0.01/sf0.1."""
    from paralleltrianglecounting_spark.operators.sampling import pps_sample

    return pps_sample(_docs(spark, sf_dir), target_n=PPS_TARGET)


def _q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution as-of join (operators/temporal.py): each
    purchase event joined to the same user's most recent click at-or-
    before it via the union-tag-window plan — ONE shuffle on user_id +
    one in-partition sort, never a per-row range probe. Comparison
    domain is exact integer microseconds (unix_micros ≡ epoch_us).
    Unmatched purchases ride with -1/0 sentinels and matched=0 (NULLs
    would break the value-hash row sort): at sf0.01, 1,981 purchases
    with ~93% matched — both branches populated."""
    from paralleltrianglecounting_spark.operators.temporal import (
        purchase_attribution,
    )

    return purchase_attribution(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _q_session_click_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join gate: click events joined to the gap-
    sessionization intervals CONTAINING them via the range-bucketing
    rewrite (operators/temporal.py:interval_join, bucket_s = the
    session gap) — intervals explode to the coarse 30-min buckets they
    overlap, points join on (user, their single bucket), predicate
    re-checked, duplicate-free by construction. One (user, session)
    aggregate on top. The DuckDB oracle computes the same join as a
    plain BETWEEN theta-join over the shared sessions CTE — the gate
    proves the bucketed rewrite changes the plan, never the answer."""
    from paralleltrianglecounting_spark.operators.temporal import (
        interval_join,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize(ev, gap_minutes=30).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = interval_join(
        clicks,
        sessions,
        on="user_id",
        point_ts="ts",
        start_col="session_start",
        end_col="session_end",
        bucket_s=1800,
    )
    return j.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("value"), 4).alias("click_value_r"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_triangle_count(spark, "/root/testdata/sf0.001")


# Gates that have appeared in at least one driver CORRECTNESS_r*.json
# artifact (rounds 1-4; see tools/gate_manifest.py which regenerates this
# set from the artifacts). The driver's per-round correctness window only
# covers the first ~50 entries of queries(), so _ordered_queries() rotates
# never-driver-checked gates to the front (VERDICT r04, "Next round" #1),
# leading with the dedup/ANN/text/temporal/streaming families the driver
# has never verified; driver-checked graph-core gates (independently
# provable via golden pytest + the builder's full-contract artifacts at
# sf0.01/sf0.1) move to the back.
_DRIVER_CHECKED_R1_R4 = frozenset({
    "edges_part_graph", "degrees", "degrees_stream", "graph_summary",
    "triangle_count", "triangle_count_csr", "triangle_count_wedge",
    "triangle_count_auto", "triangle_count_resumable",
    "triangles_per_vertex", "clustering_coefficient", "wedge_count",
    "connected_components", "connected_components_stream",
    "component_sizes", "edges_weighted_part_graph", "pagerank",
    "weighted_pagerank", "sssp", "diameter_estimate", "ego_net",
    "pagerank_salted", "personalized_pagerank", "spam_mass",
    "personalized_pagerank_salted", "k_core", "s_core", "k_truss",
    "approx_triangle_count", "bfs_distances", "bfs_distances_deep",
    "degree_histogram", "degree_assortativity", "community_modularity",
    "edge_jaccard", "square_count", "k4_count", "maximal_matching",
    "coarsen_graph", "vertex_cover", "minimum_spanning_forest",
    "single_linkage_clusters", "maximal_independent_set",
    "greedy_coloring", "densest_subgraph", "butterfly_count",
    "projection_cost", "topo_levels", "doc_chunks", "bm25_search",
    "label_propagation", "token_stats", "quality_scores", "lang_id",
    "fingerprints", "exact_duplicates", "minhash_lsh_dedup",
    "ngram_jaccard_dedup", "simhash", "simhash_near_duplicates",
    "cosine_topk", "lsh_ann_topk", "embedding_near_duplicates",
    "events_windowed", "subword_stats", "deduplicated_docs",
})

# Within the never-checked set, lead with the LLM-pipeline +
# temporal/streaming families the verdict called out; remaining
# never-checked graph extensions follow in declaration order, then the
# driver-checked tail.
_ROTATE_FIRST = (
    # dedup / quality
    "dedup_clusters", "ngram_containment", "lsh_dedup_recall",
    "quality_filtered_docs",
    # text analysis / tokenization
    "tfidf_top_terms", "pmi_collocations", "repetition_scores",
    "bpe_pair_counts", "bpe_merges", "inverted_index", "skipgram_pairs",
    "ngram_topk",
    "oov_rate", "bigram_lm_scores", "winnow_fingerprints",
    "winnow_dup_clusters", "dup_ngram_spans", "dup_span_runs",
    "suffix_ranks", "dup_prefix_depths", "contamination_check",
    # ANN / similarity / quantization
    "embedding_quantization", "ivf_ann_topk", "rrf_fusion", "ann_recall",
    "quantized_recall", "pq_codes", "pq_recall", "item_cosine",
    # mergeable sketches
    "hll_registers", "cms_registers", "cms_heavy_hitters",
    "bloom_contamination",
    # multimodal (decode-cost audit: round-5 gate, never driver-seen)
    "media_decode_audit",
    # sampling / data mixing
    "dataset_split", "mixture_weights", "sequence_packing",
    "balanced_sample", "pps_sample",
    # walks
    "random_walks", "biased_walks",
    # temporal / sessionization
    "events_sliding", "events_quantiles", "orders_rollup",
    "user_sessions", "purchase_attribution", "session_click_stats",
    "events_ohlc", "events_twa", "temporal_pair_counts",
    "retention_cohorts", "event_funnel", "event_transitions",
    "click_conversion",
    # streaming
    "user_sessions_stream", "events_windowed_stream",
    "triangle_count_stream",
)


def _ordered_queries(
    base: "dict[str, Callable[[SparkSession, str], DataFrame]]",
) -> "dict[str, Callable[[SparkSession, str], DataFrame]]":
    lead = {k: base[k] for k in _ROTATE_FIRST if k in base}
    never = {
        k: v for k, v in base.items()
        if k not in lead and k not in _DRIVER_CHECKED_R1_R4
    }
    checked = {k: v for k, v in base.items() if k in _DRIVER_CHECKED_R1_R4}
    out = {**lead, **never, **checked}
    assert len(out) == len(base)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered_queries({
        "edges_part_graph": _q_edges,
        "degrees": _q_degrees,
        "degrees_stream": _q_degrees_stream,
        "graph_summary": _q_graph_summary,
        "triangle_count": _q_triangle_count,
        "triangle_count_csr": _q_triangle_count_csr,
        "triangle_count_wedge": _q_triangle_count_wedge,
        "triangle_count_auto": _q_triangle_count_auto,
        "triangle_count_resumable": _q_triangle_count_resumable,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "clustering_coefficient": _q_clustering_coefficient,
        "wedge_count": _q_wedge_count,
        "connected_components": _q_connected_components,
        "connected_components_stream": _q_connected_components_stream,
        "component_sizes": _q_component_sizes,
        "edges_weighted_part_graph": _q_edges_weighted,
        "pagerank": _q_pagerank,
        "weighted_pagerank": _q_weighted_pagerank,
        "sssp": _q_sssp,
        "diameter_estimate": _q_diameter,
        "ego_net": _q_ego_net,
        "pagerank_salted": _q_pagerank_salted,
        "personalized_pagerank": _q_personalized_pagerank,
        "spam_mass": _q_spam_mass,
        "personalized_pagerank_salted": _q_personalized_pagerank_salted,
        "k_core": _q_k_core,
        "s_core": _q_s_core,
        "k_truss": _q_k_truss,
        "approx_triangle_count": _q_approx_triangle_count,
        "bfs_distances": _q_bfs_distances,
        "bfs_distances_deep": _q_bfs_distances_deep,
        "degree_histogram": _q_degree_histogram,
        "degree_assortativity": _q_degree_assortativity,
        "community_modularity": _q_community_modularity,
        "edge_jaccard": _q_edge_jaccard,
        "square_count": _q_square_count,
        "k4_count": _q_k4_count,
        "maximal_matching": _q_maximal_matching,
        "coarsen_graph": _q_coarsen_graph,
        "vertex_cover": _q_vertex_cover,
        "minimum_spanning_forest": _q_msf,
        "single_linkage_clusters": _q_single_linkage,
        "maximal_independent_set": _q_mis,
        "greedy_coloring": _q_greedy_coloring,
        "densest_subgraph": _q_densest_subgraph,
        "butterfly_count": _q_butterfly_count,
        "projection_cost": _q_projection_cost,
        "topo_levels": _q_topo_levels,
        "doc_chunks": _q_doc_chunks,
        "media_decode_audit": _q_media_decode_audit,
        "bm25_search": _q_bm25_search,
        "directed_pagerank": _q_directed_pagerank,
        "core_numbers": _q_core_numbers,
        "anf_bits": _q_anf_bits,
        "bipartite_components": _q_bipartite_components,
        "bowtie_structure": _q_bowtie,
        "truss_numbers": _q_truss_numbers,
        "scc": _q_scc,
        "condensation": _q_condensation,
        "event_transitions": _q_event_transitions,
        "part_sequence_reciprocity": _q_part_sequence_reciprocity,
        "eigenvector_centrality": _q_eigenvector,
        "katz_centrality": _q_katz,
        "rich_club": _q_rich_club,
        "triangle_delta": _q_triangle_delta,
        "link_prediction": _q_link_prediction,
        "hits": _q_hits,
        "neighborhood_2hop": _q_neighborhood_2hop,
        "label_propagation": _q_label_propagation,
        "seeded_lpa": _q_seeded_lpa,
        "token_stats": _q_token_stats,
        "subword_stats": _q_subword_stats,
        "quality_scores": _q_quality_scores,
        "lang_id": _q_lang_id,
        "fingerprints": _q_fingerprints,
        "exact_duplicates": _q_exact_duplicates,
        "deduplicated_docs": _q_deduplicated_docs,
        "minhash_lsh_dedup": _q_minhash_lsh,
        "dedup_clusters": _q_dedup_clusters,
        "ngram_containment": _q_ngram_containment,
        "lsh_dedup_recall": _q_lsh_dedup_recall,
        "quality_filtered_docs": _q_quality_filtered_docs,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "pmi_collocations": _q_pmi_collocations,
        "repetition_scores": _q_repetition_scores,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "bpe_merges": _q_bpe_merges,
        "inverted_index": _q_inverted_index,
        "skipgram_pairs": _q_skipgram_pairs,
        "event_funnel": _q_event_funnel,
        "ngram_topk": _q_ngram_topk,
        "link_prediction_jaccard": _q_link_prediction_jaccard,
        "salsa": _q_salsa,
        "co_citation": _q_co_citation,
        "bibliographic_coupling": _q_bibliographic_coupling,
        "triad_census": _q_triad_census,
        "dyad_census": _q_dyad_census,
        "full_triad_census": _q_full_triad_census,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_dup_clusters": _q_winnow_dup_clusters,
        "item_cosine": _q_item_cosine,
        "oov_rate": _q_oov_rate,
        "dup_ngram_spans": _q_dup_ngram_spans,
        "dup_span_runs": _q_dup_span_runs,
        "powerlaw_alpha": _q_powerlaw_alpha,
        "triangle_significance": _q_triangle_significance,
        "bigram_lm_scores": _q_bigram_lm,
        "retention_cohorts": _q_retention_cohorts,
        "weighted_triangle_intensity": _q_weighted_triangle_intensity,
        "backbone_profile": _q_backbone_profile,
        "dataset_split": _q_dataset_split,
        "mixture_weights": _q_mixture_weights,
        "sequence_packing": _q_sequence_packing,
        "balanced_sample": _q_balanced_sample,
        "random_walks": _q_random_walks,
        "biased_walks": _q_biased_walks,
        "betweenness": _q_betweenness,
        "harmonic_centrality": _q_harmonic,
        "closeness_centrality": _q_closeness,
        "contamination_check": _q_contamination,
        "ngram_jaccard_dedup": _q_ngram_jaccard,
        "simhash": _q_simhash,
        "simhash_near_duplicates": _q_simhash_near_dups,
        "cosine_topk": _q_cosine_topk,
        "embedding_quantization": _q_quantize_embeddings,
        "hll_registers": _q_hll_registers,
        "cms_registers": _q_cms_registers,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "bloom_contamination": _q_bloom_contamination,
        "lsh_ann_topk": _q_lsh_ann_topk,
        "ivf_ann_topk": _q_ivf_ann_topk,
        "rrf_fusion": _q_rrf_fusion,
        "ann_recall": _q_ann_recall,
        "simrank": _q_simrank,
        "graphlet_census": _q_graphlet_census,
        "quantized_recall": _q_quantized_recall,
        "pq_codes": _q_pq_codes,
        "pq_recall": _q_pq_recall,
        "embedding_near_duplicates": _q_embedding_near_dups,
        "triangle_list": _q_triangle_list,
        "clique_percolation": _q_clique_percolation,
        "transitivity": _q_transitivity,
        "local_bridges": _q_local_bridges,
        "events_sliding": _q_events_sliding,
        "events_quantiles": _q_events_quantiles,
        "orders_rollup": _q_orders_rollup,
        "user_sessions": _q_user_sessions,
        "user_sessions_stream": _q_user_sessions_stream,
        "purchase_attribution": _q_purchase_attribution,
        "session_click_stats": _q_session_click_stats,
        "pps_sample": _q_pps_sample,
        "events_ohlc": _q_events_ohlc,
        "events_twa": _q_events_twa,
        "temporal_pair_counts": _q_temporal_pairs,
        "suffix_ranks": _q_suffix_ranks,
        "brand_quotient_graph": _q_brand_quotient,
        "click_conversion": _q_click_conversion,
        "dup_prefix_depths": _q_dup_prefix_depths,
        "events_windowed": _q_events_windowed,
        "events_windowed_stream": _q_events_windowed_stream,
        "triangle_count_stream": _q_triangle_count_stream,
    })


# SQL fragments shared by the document oracles. Tokenization splits on
# the SAME explicit whitespace class as the engine (text.WS_CLASS):
# RE2's \s excludes \x0B, Java's includes it, so a bare \s here would
# diverge from the engine on vertical-tab-bearing text.
from paralleltrianglecounting_spark.operators.text import WS_CLASS as _WS

_TOKS_CTE = f"""
toks_t AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(text, '{_WS}'), t -> t != '') AS toks
  FROM documents
)
""".strip()

_DISTINCT_TOKS_CTE = r"""
dtoks AS (
  SELECT doc_id, list_distinct(toks) AS toks FROM toks_t
)
""".strip()

_H56 = "('0x' || substr(md5({x}), 1, 14))::BIGINT"
_M = 2_147_483_647


def _minhash_params_values() -> str:
    return ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS))


def _bloom_pos_legs(src: str, extra_cols: str = "") -> str:
    """UNION ALL legs computing the BLOOM_HASHES bit positions of
    ``h0`` rows in CTE ``src`` (sketches._bloom_positions verbatim)."""
    return "\n  UNION ALL\n  ".join(
        f"SELECT {extra_cols}((({a} * h0 + {b}) % {_M}) % {BLOOM_BITS})::BIGINT"
        f" AS pos FROM {src}"
        for (a, b) in BLOOM_PARAMS
    )


def _cms_bucket_legs(src: str, extra_cols: str = "") -> str:
    """UNION ALL legs computing the depth CMS bucket indexes of ``h0``
    rows in CTE ``src`` — the same affine family as
    sketches._cms_buckets, parameters shared verbatim."""
    return "\n  UNION ALL\n  ".join(
        f"SELECT {extra_cols}{r}::BIGINT AS r,"
        f" ((({a} * h0 + {b}) % {_M}) % {CMS_WIDTH})::BIGINT AS bucket"
        f" FROM {src}"
        for r, (a, b) in enumerate(CMS_PARAMS)
    )


def _bpe_merges_sql(n: int) -> str:
    """Unrolled DuckDB twin of ``bpe_train`` for a fixed ``n`` rounds
    (VERDICT r04 #6 — the merge loop IS SQL-expressible when unrolled).

    The non-trivial piece is Sennrich's greedy left-to-right
    NON-OVERLAPPING merge, which has no SQL fold — but it is positional:
    two adjacent positions can only BOTH match when the pair's sides are
    equal (match at i and i+1 forces left = right), so matches come in
    runs of the pair's own symbol, and greedy picking takes every OTHER
    match starting at each run's head. Per round: unnest positions, flag
    matches, locate each run head with a running max over non-match
    positions, pick matches at even offset from the head, emit the
    merged token at picked positions, drop the position AFTER a pick,
    and re-assemble the symbol list ordered by position. The per-round
    best pair lives in a 1-row CTE with ``HAVING sum(wcount) >= 2``; on
    early stop the CTE is empty, its scalar subqueries go NULL, every
    match flag collapses to FALSE and all later rounds are no-ops —
    exactly the engine's break."""
    parts = [
        _TOKS_CTE,
        """wf AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS wcount
  FROM (SELECT unnest(toks) AS word FROM toks_t)
  GROUP BY word
)""",
        """v0 AS MATERIALIZED (
  SELECT word, wcount,
         list_append(
           list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
           '</w>'
         ) AS syms
  FROM wf
)""",
    ]
    for r in range(1, n + 1):
        p = r - 1
        parts.append(f"""b{r} AS MATERIALIZED (
  SELECT syms[i] AS l, syms[i + 1] AS rr, sum(wcount)::BIGINT AS cnt
  FROM (SELECT syms, wcount, unnest(range(1, len(syms))) AS i FROM v{p})
  GROUP BY l, rr
  HAVING sum(wcount) >= 2
  ORDER BY cnt DESC, l ASC, rr ASC
  LIMIT 1
)""")
        parts.append(f"""m{r} AS MATERIALIZED (
  SELECT word, wcount, i, syms[i] AS s,
         coalesce(syms[i] = (SELECT l FROM b{r})
                  AND syms[i + 1] = (SELECT rr FROM b{r}), FALSE) AS m
  FROM (SELECT word, wcount, syms, unnest(range(1, len(syms) + 1)) AS i
        FROM v{p})
)""")
        parts.append(f"""k{r} AS MATERIALIZED (
  SELECT *, coalesce(m AND (i - lf - 1) % 2 = 0, FALSE) AS picked
  FROM (
    SELECT *, coalesce(max(CASE WHEN NOT m THEN i END)
                OVER (PARTITION BY word ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              0) AS lf
    FROM m{r}
  )
)""")
        parts.append(f"""e{r} AS MATERIALIZED (
  SELECT word, wcount, i,
         CASE WHEN picked THEN s || (SELECT rr FROM b{r}) ELSE s END AS os,
         lag(picked, 1, FALSE) OVER (PARTITION BY word ORDER BY i) AS pp
  FROM k{r}
)""")
        parts.append(f"""v{r} AS MATERIALIZED (
  SELECT word, wcount, list(os ORDER BY i) AS syms
  FROM e{r}
  WHERE NOT pp
  GROUP BY word, wcount
)""")
    union = "\nUNION ALL\n".join(
        f'SELECT {r} AS merge_rank, l AS "left", rr AS "right", '
        f"cnt AS pair_cnt FROM b{r}"
        for r in range(1, n + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


def _doc_oracles() -> dict[str, str]:
    from paralleltrianglecounting_spark.operators.text import BPE_SPLIT_PATTERN

    bpe_sql_pat = BPE_SPLIT_PATTERN.replace("'", "''")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    h56_tok = _H56.format(x="tok")
    lang_score_cols = ",\n       ".join(
        f"len(list_filter(toks, t -> t IN ({', '.join(repr(m) for m in ms)}))) AS s_{lang}"
        for lang, ms in LANG_MARKERS
    )
    # fold argmax in declaration order, strict > to switch
    pred = f"'{LANG_MARKERS[0][0]}'"
    best = f"s_{LANG_MARKERS[0][0]}"
    for lang, _ in LANG_MARKERS[1:]:
        pred = f"CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN s_{lang} > {best} THEN s_{lang} ELSE {best} END"
    # shared CTE chain: token sets -> minhash -> LSH bands -> capped
    # buckets -> candidate pairs -> exact-Jaccard table `j`; used by
    # both the pair gate (minhash_lsh_dedup) and the transitive-cluster
    # gate (dedup_clusters)
    minhash_pairs_ctes = f"""{_TOKS_CTE},
{_DISTINCT_TOKS_CTE},
tok AS (SELECT doc_id, unnest(toks) AS tok FROM dtoks),
h AS (SELECT doc_id, ({h56_tok} % {_M}) AS h0 FROM tok),
params(i, a, b) AS (VALUES {_minhash_params_values()}),
mh AS (
  SELECT doc_id, p.i AS i, min((p.a * h.h0 + p.b) % {_M}) AS mh
  FROM h CROSS JOIN params p GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {LSH_BAND_ROWS} AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY i)) AS key
  FROM mh GROUP BY doc_id, i // {LSH_BAND_ROWS}
),
bsize AS (SELECT band, key, count(*) AS n FROM bands GROUP BY band, key),
bands_f AS (
  SELECT bands.doc_id, bands.band, bands.key FROM bands
  JOIN bsize ON bands.band = bsize.band AND bands.key = bsize.key
  WHERE bsize.n <= 200
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands_f x JOIN bands_f y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
j AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
               / greatest(len(ta.toks) + len(tb.toks)
                          - len(list_intersect(ta.toks, tb.toks)), 1), 6) AS jaccard_r
  FROM cand c
  JOIN dtoks ta ON ta.doc_id = c.doc_a
  JOIN dtoks tb ON tb.doc_id = c.doc_b
)"""
    # 56 per-bit sum columns in ONE hash aggregate, mirroring the
    # engine's fold (operators/dedup.py simhash — no ×bits row explode)
    bit_sum_cols = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS t{j}"
        for j in range(SIMHASH_BITS)
    )
    word_terms = " + ".join(
        f"(CASE WHEN t{j} > 0 THEN (1::BIGINT << {j}) ELSE 0::BIGINT END)"
        for j in range(SIMHASH_BITS)
    )
    simhash_sql = f"""WITH {_TOKS_CTE},
{_DISTINCT_TOKS_CTE},
tok AS (SELECT doc_id, unnest(toks) AS tok FROM dtoks),
h AS (SELECT doc_id, {h56_tok} AS h FROM tok),
bitsums AS (
  SELECT doc_id,
         {bit_sum_cols}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({word_terms} AS BIGINT) AS simhash
FROM bitsums"""
    # chunk blocking mirrored exactly: max_hamming+1 chunks, last chunk
    # absorbs remainder bits, buckets over SIMHASH_MAX_BUCKET dropped
    _mh = 3  # max_hamming of the contract query
    _nc = _mh + 1
    _cb = SIMHASH_BITS // _nc
    simhash_neardup_sql = f"""WITH s AS (
{simhash_sql}
),
chunks AS (
  SELECT doc_id, simhash, gs.c AS chunk,
         CASE WHEN gs.c < {_nc - 1}
              THEN (simhash >> (gs.c * {_cb})) & {(1 << _cb) - 1}
              ELSE (simhash >> {(_nc - 1) * _cb}) END AS ckey
  FROM s CROSS JOIN generate_series(0, {_nc - 1}) gs(c)
),
bsize AS (SELECT chunk, ckey, count(*) AS n FROM chunks GROUP BY chunk, ckey),
cf AS (
  SELECT chunks.doc_id, chunks.simhash, chunks.chunk, chunks.ckey FROM chunks
  JOIN bsize ON chunks.chunk = bsize.chunk AND chunks.ckey = bsize.ckey
  WHERE bsize.n <= {SIMHASH_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM cf a JOIN cf b
    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {_mh}"""
    _PQ_SUB = 64 // PQ_M
    _PQ_M1 = PQ_M - 1
    h56_gram = _H56.format(x="g")
    # shared 3-gram shingle CTE (same construction as ngram_jaccard_dedup)
    grams_cte = """
sh AS (
  SELECT doc_id, lang, len(toks)::BIGINT AS ntok,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')
         )) AS grams
  FROM toks_t WHERE len(toks) >= 3
)""".strip()
    # bottom-k gram-hash anchor blocking + exact containment (dedup.py
    # ngram_containment verbatim: anchors = k smallest distinct hash56
    # gram hashes, capped buckets, ORDERED pairs a != b)
    ngram_containment_sql = f"""WITH {_TOKS_CTE},
{grams_cte},
gh_t AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(grams, g -> {h56_gram} % {_M})) AS ghs
  FROM sh
),
anch AS (
  SELECT doc_id, lang,
         unnest(list_slice(list_sort(ghs), 1, {CONTAIN_ANCHORS})) AS gh
  FROM gh_t
),
post AS (SELECT doc_id, lang, unnest(ghs) AS gh FROM gh_t),
psize AS (SELECT lang, gh, count(*) AS n FROM post GROUP BY lang, gh),
post_f AS (
  SELECT post.doc_id, post.lang, post.gh FROM post
  JOIN psize ON post.lang = psize.lang AND post.gh = psize.gh
  WHERE psize.n <= {CONTAIN_MAX_POSTING}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM anch a JOIN post_f b
    ON a.lang = b.lang AND a.gh = b.gh AND a.doc_id != b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(ga.grams, gb.grams))::DOUBLE
             / greatest(len(ga.grams), 1), 6) AS containment_r
FROM cand c
JOIN sh ga ON ga.doc_id = c.doc_a
JOIN sh gb ON gb.doc_id = c.doc_b
WHERE round(len(list_intersect(ga.grams, gb.grams))::DOUBLE
            / greatest(len(ga.grams), 1), 6) >= 0.5"""
    # recall audit: exact blocked token-set Jaccard truth vs the
    # minhash chain's verified pairs (CTE `j`), integer counts
    lsh_dedup_recall_sql = f"""WITH {minhash_pairs_ctes},
blk_all AS (
  SELECT doc_id, lang, (len(toks) // 10)::BIGINT AS bucket
  FROM toks_t WHERE len(toks) >= 3
),
blksize AS (SELECT lang, bucket, count(*) AS n FROM blk_all GROUP BY lang, bucket),
blk AS (
  SELECT blk_all.doc_id, blk_all.lang, blk_all.bucket FROM blk_all
  JOIN blksize ON blk_all.lang = blksize.lang AND blk_all.bucket = blksize.bucket
  WHERE blksize.n <= {NGRAM_MAX_BLOCK}
),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blk a JOIN blk b
    ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  JOIN dtoks ta ON ta.doc_id = a.doc_id
  JOIN dtoks tb ON tb.doc_id = b.doc_id
  WHERE round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
              / greatest(len(ta.toks) + len(tb.toks)
                         - len(list_intersect(ta.toks, tb.toks)), 1), 6) >= 0.5
),
lshp AS (SELECT doc_a, doc_b FROM j WHERE jaccard_r >= 0.5),
stats AS (
  SELECT (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM lshp) AS n_lsh,
         (SELECT count(*) FROM truth t
          JOIN lshp l ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b) AS n_hit
)
SELECT n_true::BIGINT AS n_true, n_lsh::BIGINT AS n_lsh, n_hit::BIGINT AS n_hit,
       round(n_hit::DOUBLE / greatest(n_true, 1), 6) AS recall_r
FROM stats"""
    # per-language quantile quality filter: cutoff = quantile_cont
    # (≡ Spark percentile on DOUBLE); see text.quality_filtered_docs
    # for why the ≥ filter is cross-engine exact on 6-dp-rounded scores
    quality_filtered_sql = f"""WITH {_TOKS_CTE},
q AS (
  SELECT doc_id, lang,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS punct_ratio,
         len(list_filter(toks, t -> t IN ({stop_list})))::DOUBLE
           / greatest(len(toks), 1) AS stop_ratio,
         least(len(toks) / 100.0, 1.0) AS length_score
  FROM toks_t
),
scored AS (
  SELECT doc_id, lang,
         round(length_score * (1.0 - punct_ratio) * (0.5 + stop_ratio), 6)
           AS quality_r
  FROM q
),
cut AS (
  SELECT lang, quantile_cont(quality_r, 0.4) AS cutoff
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.quality_r
FROM scored s JOIN cut ON s.lang = cut.lang
WHERE s.quality_r >= cut.cutoff"""
    return {
        "token_stats": f"""WITH {_TOKS_CTE}
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars_actual,
       round(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::DOUBLE
             / greatest(len(toks), 1), 6) AS avg_token_len_r
FROM toks_t""",
        # fixed-size token windows with overlap: starts 0, stride, …
        # while strictly inside the doc; list_slice/range are 1-based-
        # inclusive / end-exclusive exactly like the engine's
        # slice(…, start+1, chunk_size) / sequence(0, n-1, stride)
        "doc_chunks": f"""WITH {_TOKS_CTE},
nz AS (SELECT doc_id, toks FROM toks_t WHERE len(toks) > 0),
st AS (
  SELECT doc_id, toks,
         unnest(range(0, len(toks), {CHUNK_SIZE - CHUNK_OVERLAP})) AS start
  FROM nz
)
SELECT doc_id,
       (start // {CHUNK_SIZE - CHUNK_OVERLAP})::BIGINT AS chunk_id,
       len(list_slice(toks, start + 1, start + {CHUNK_SIZE}))::BIGINT
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, start + 1, start + {CHUNK_SIZE}), ' ')
         AS chunk_text
FROM st""",
        "subword_stats": f"""WITH sub AS (
  SELECT doc_id,
         regexp_extract_all(text, '{bpe_sql_pat}') AS sw,
         list_filter(regexp_split_to_array(text, '{_WS}'), t -> t != '') AS ws
  FROM documents
)
SELECT doc_id,
       len(sw)::BIGINT AS n_subwords,
       len(ws)::BIGINT AS n_ws_tokens,
       round(len(sw)::DOUBLE / greatest(len(ws), 1), 6) AS subwords_per_token_r
FROM sub""",
        "quality_scores": f"""WITH {_TOKS_CTE},
q AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS punct_ratio,
         len(list_filter(toks, t -> t IN ({stop_list})))::DOUBLE
           / greatest(len(toks), 1) AS stop_ratio,
         least(len(toks) / 100.0, 1.0) AS length_score
  FROM toks_t
)
SELECT doc_id, n_tokens,
       round(punct_ratio, 6) AS punct_ratio_r,
       round(stop_ratio, 6) AS stop_ratio_r,
       round(length_score * (1.0 - punct_ratio) * (0.5 + stop_ratio), 6) AS quality_r
FROM q""",
        "lang_id": f"""WITH {_TOKS_CTE},
scores AS (
  SELECT doc_id, lang,
       {lang_score_cols}
  FROM toks_t
)
SELECT doc_id, lang AS lang_declared, {pred} AS lang_pred FROM scores""",
        "fingerprints": f"""WITH codes AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), c -> ascii(c)) AS cs
  FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, cs), (a, b) -> (a * 31 + b) % {_M})::BIGINT AS fp
FROM codes""",
        "exact_duplicates": """SELECT sha256(text) AS text_sha,
       count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents GROUP BY sha256(text) HAVING count(*) >= 2""",
        "deduplicated_docs": """SELECT min(doc_id) AS doc_id,
       sha256(text) AS text_sha
FROM documents GROUP BY sha256(text)""",
        "minhash_lsh_dedup": f"""WITH {minhash_pairs_ctes}
SELECT * FROM j WHERE jaccard_r >= 0.5""",
        # transitive clusters over the SAME pair graph: recursive
        # min-label CC on the near-dup pairs, every doc labeled
        # (singletons keep their own id) — mirrors dedup_clusters'
        # reuse of connected_components over the duplicate graph
        "dedup_clusters": f"""WITH RECURSIVE {minhash_pairs_ctes},
pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard_r >= 0.5),
bidir AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
nodes AS (SELECT DISTINCT u AS v FROM bidir),
cc(v, l) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT b.v, cc.l FROM cc JOIN bidir b ON b.u = cc.v WHERE cc.l < b.v
),
lbl AS (SELECT v, min(l) AS component FROM cc GROUP BY v),
labeled AS (
  SELECT d.doc_id, coalesce(lbl.component, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lbl ON lbl.v = d.doc_id
),
sizes AS (SELECT cluster_id, count(*) AS n_members FROM labeled GROUP BY cluster_id)
SELECT labeled.doc_id, labeled.cluster_id, sizes.n_members
FROM labeled JOIN sizes ON labeled.cluster_id = sizes.cluster_id""",
        "ngram_containment": ngram_containment_sql,
        "lsh_dedup_recall": lsh_dedup_recall_sql,
        "quality_filtered_docs": quality_filtered_sql,
        # smoothed tf-idf: tf * ln((N+1)/(df+1)); DuckDB ln() is the
        # natural log matching Spark's single-arg F.log
        "tfidf_top_terms": f"""WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(toks) AS term FROM toks_t),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf_r
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
)
SELECT doc_id, term, tfidf_r,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_r DESC, term) AS INT) AS rank
FROM scored
QUALIFY rank <= 3""",
        "bm25_search": _bm25_oracle_sql(),
        # PMI collocations: counts exact in both engines; the double
        # arithmetic (one multiply chain, one divide, one ln) is
        # written in the same association order as the Spark side so
        # the IEEE results are bit-identical before the 6-dp round
        "pmi_collocations": f"""WITH {_TOKS_CTE},
pair AS (
  SELECT s.p.x AS x, s.p.y AS y FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> {{'x': toks[i], 'y': toks[i + 1]}})) AS p
    FROM toks_t WHERE len(toks) >= 2
  ) s
),
cxy AS (
  SELECT x, y, count(*)::BIGINT AS pair_cnt FROM pair GROUP BY x, y
  HAVING count(*) >= {PMI_MIN_COUNT}
),
tok AS (SELECT unnest(toks) AS term FROM toks_t),
cx AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY term),
totals AS (
  SELECT sum(len(toks))::DOUBLE AS t1,
         sum(CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END)::DOUBLE AS t2
  FROM toks_t
)
SELECT cxy.x AS gram_x, cxy.y AS gram_y, pair_cnt,
       round(ln((pair_cnt::DOUBLE * t1 * t1) / (t2 * dx.c * dy.c)), {ROUND}) AS pmi_r
FROM cxy
JOIN cx dx ON dx.term = cxy.x
JOIN cx dy ON dy.term = cxy.y
CROSS JOIN totals
ORDER BY pmi_r DESC, gram_x, gram_y
LIMIT {PMI_K}""",
        # BPE round 0: char symbols + end marker via sequence/substr
        # (splitting on the empty pattern is not engine-portable), pair
        # explode weighted by exact word frequency
        "bpe_pair_counts": f"""WITH {_TOKS_CTE},
wf AS (
  SELECT word, count(*)::BIGINT AS wcount
  FROM (SELECT unnest(toks) AS word FROM toks_t)
  GROUP BY word
),
sym AS (
  SELECT list_append(
           list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
           '</w>'
         ) AS syms, wcount
  FROM wf
),
pr AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, wcount
  FROM (SELECT syms, wcount, unnest(range(1, len(syms))) AS i FROM sym)
)
SELECT l AS "left", r AS "right", sum(wcount)::BIGINT AS pair_cnt
FROM pr GROUP BY l, r""",
        # full BPE training ledger: BPE_MERGES unrolled rounds of
        # (pair count -> total-order argmax -> positional greedy merge)
        "bpe_merges": _bpe_merges_sql(BPE_MERGES),
        # prune-before-decode audit: the twin computes the kept subset
        # from the metadata predicate ALONE; the engine's decoded
        # columns are measured inside the decode UDF — equality proves
        # the stage decoded exactly the kept payloads
        "media_decode_audit": f"""WITH m AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[(doc_id % 3 + 1)] AS kind,
         encode(text) AS payload,
         n_chars
  FROM documents
),
a AS (
  SELECT kind,
         count(*)::BIGINT AS rows_present,
         sum(octet_length(payload))::BIGINT AS bytes_present,
         count(*) FILTER (
           WHERE n_chars % {MEDIA_KEEP_MOD} < {MEDIA_KEEP_LT}
         )::BIGINT AS rows_kept,
         coalesce(sum(octet_length(payload)) FILTER (
           WHERE n_chars % {MEDIA_KEEP_MOD} < {MEDIA_KEEP_LT}
         ), 0)::BIGINT AS bytes_kept
  FROM m GROUP BY kind
)
SELECT kind, rows_present, bytes_present, rows_kept, bytes_kept,
       CASE WHEN kind = 'image' THEN rows_kept ELSE 0 END AS rows_decoded,
       CASE WHEN kind = 'image' THEN bytes_kept ELSE 0 END AS bytes_decoded
FROM a""",
        # blocked postings: row_number over the per-term doc order cut
        # into {INVIDX_BLOCK}-id blocks, df joined back on the term
        "inverted_index": f"""WITH {_TOKS_CTE},
tok AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks_t),
blk AS (
  SELECT term, doc_id,
         ((row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
            // {INVIDX_BLOCK})::BIGINT AS block_id
  FROM tok
),
posting AS (
  SELECT term, block_id, count(*)::BIGINT AS block_len,
         string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
  FROM blk GROUP BY term, block_id
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY term)
SELECT p.term, d.df, p.block_id, p.block_len, p.doc_ids
FROM posting p JOIN dfreq d USING (term)""",
        # word2vec pair extraction: per-position +-window contexts,
        # exact counts, total (cnt DESC, center, context) top-k order
        "skipgram_pairs": f"""WITH {_TOKS_CTE},
pos AS (
  SELECT toks, unnest(range(1, len(toks) + 1)) AS i
  FROM toks_t WHERE len(toks) >= 2
),
pairs AS (
  SELECT toks[i] AS center, toks[j] AS context
  FROM (
    SELECT toks, i,
           unnest(range(greatest(i - {SKIPGRAM_WINDOW}, 1),
                        least(i + {SKIPGRAM_WINDOW}, len(toks)) + 1)) AS j
    FROM pos
  )
  WHERE j != i
),
counted AS (
  SELECT center, context, count(*)::BIGINT AS pair_cnt
  FROM pairs GROUP BY center, context
)
SELECT center, context, pair_cnt
FROM counted ORDER BY pair_cnt DESC, center, context
LIMIT {SKIPGRAM_K}""",
        # top-k n-gram frequencies: list_slice is 1-based inclusive both
        # ends, matching Spark's slice(toks, i, n); range end-exclusive
        "ngram_topk": f"""WITH {_TOKS_CTE},
g AS (
  SELECT array_to_string(
           list_slice(toks, i, i + {NGRAM_N} - 1), ' '
         ) AS gram
  FROM (
    SELECT toks, unnest(range(1, len(toks) - {NGRAM_N} + 2)) AS i
    FROM toks_t WHERE len(toks) >= {NGRAM_N}
  )
)
SELECT gram, count(*)::BIGINT AS gram_cnt
FROM g GROUP BY gram HAVING count(*) >= {NGRAM_MIN_COUNT}
ORDER BY gram_cnt DESC, gram
LIMIT {NGRAM_K}""",
        # Gopher-style repetition signals; bigram list via 1-based list
        # indexing (generate_series(1, 0) is empty in DuckDB — the
        # engine side guards Spark's descending sequence(1, 0) instead)
        "repetition_scores": f"""WITH {_TOKS_CTE},
base AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         round(CASE WHEN len(toks) > 0
               THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
               ELSE 0.0 END, 6) AS dup_token_frac_r
  FROM toks_t
),
gram AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS gram
  FROM toks_t WHERE len(toks) >= 2
),
per_gram AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM gram GROUP BY doc_id, gram),
per_doc AS (
  SELECT doc_id, sum(cnt) AS total, max(cnt) AS mx,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
  FROM per_gram GROUP BY doc_id
)
SELECT base.doc_id, base.n_tokens, base.dup_token_frac_r,
       round(coalesce(mx::DOUBLE / total, 0.0), 6) AS top_bigram_frac_r,
       round(coalesce(dup::DOUBLE / total, 0.0), 6) AS dup_bigram_frac_r
FROM base LEFT JOIN per_doc ON base.doc_id = per_doc.doc_id""",
        "mixture_weights": f"""WITH t AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(list_filter(regexp_split_to_array(text, '{_WS}'),
                             t -> t != '')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
z AS (SELECT sum(pow(n_tokens::DOUBLE, {MIX_ALPHA})) AS z FROM t)
SELECT source, n_docs, n_tokens,
       round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / z, 6) AS weight_r
FROM t CROSS JOIN z""",
        "sequence_packing": f"""WITH {_TOKS_CTE},
base AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard, len(toks)::BIGINT AS n_tokens
  FROM toks_t
),
c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM base
)
SELECT doc_id, shard, n_tokens,
       ((cum - n_tokens) // {PACK_CONTEXT})::BIGINT AS start_block,
       CASE WHEN cum = 0 THEN -1::BIGINT
            ELSE ((cum - 1) // {PACK_CONTEXT})::BIGINT END AS end_block
FROM c""",
        "dataset_split": f"""WITH b AS (
  SELECT doc_id,
         ({_H56.format(x="'split:' || doc_id")} % 100) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {SPLIT_WEIGHTS[0]} THEN 'train'
            WHEN bucket < {SPLIT_WEIGHTS[0] + SPLIT_WEIGHTS[1]} THEN 'val'
            ELSE 'test' END AS split
FROM b""",
        "balanced_sample": f"""WITH h AS (
  SELECT doc_id, lang,
         {_H56.format(x="'balance:' || doc_id")} AS h
  FROM documents
),
m AS (SELECT min(n) AS min_n
      FROM (SELECT count(*) AS n FROM documents GROUP BY lang)),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
  FROM h
)
SELECT doc_id, lang FROM r CROSS JOIN m WHERE rk <= min_n""",
        # decontamination: distinct-trigram overlap between the corpus
        # and the deterministic benchmark slice; shingle construction
        # matches ngram_jaccard_dedup's (1-based list_slice)
        "contamination_check": f"""WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - {CONTAM_N - 1}, 1)),
           i -> array_to_string(list_slice(toks, i, i + {CONTAM_N - 1}), ' ')
         )) AS grams
  FROM toks_t WHERE len(toks) >= {CONTAM_N}
),
g AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
bench AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % {CONTAM_BENCH_MOD} = 0),
corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % {CONTAM_BENCH_MOD} != 0)
SELECT c.doc_id, b.bench_id, count(*)::BIGINT AS shared_grams
FROM corpus c JOIN bench b ON c.gram = b.gram
GROUP BY c.doc_id, b.bench_id
HAVING count(*) >= {CONTAM_MIN_OVERLAP}""",
        "ngram_jaccard_dedup": f"""WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id, lang, len(toks)::BIGINT AS ntok,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')
         )) AS grams
  FROM toks_t WHERE len(toks) >= 3
),
blocked_all AS (SELECT *, ntok // 10 AS bucket FROM sh),
blksize AS (
  SELECT lang, bucket, count(*) AS n FROM blocked_all GROUP BY lang, bucket
),
blocked AS (
  SELECT blocked_all.* FROM blocked_all
  JOIN blksize ON blocked_all.lang = blksize.lang
              AND blocked_all.bucket = blksize.bucket
  WHERE blksize.n <= {NGRAM_MAX_BLOCK}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE
             / greatest(len(a.grams) + len(b.grams)
                        - len(list_intersect(a.grams, b.grams)), 1), 6) AS jaccard_r
FROM blocked a JOIN blocked b
  ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.grams, b.grams))::DOUBLE
            / greatest(len(a.grams) + len(b.grams)
                       - len(list_intersect(a.grams, b.grams)), 1), 6) >= 0.3""",
        "simhash": simhash_sql,
        # the oracle replicates the chunk blocking AND the bucket cap,
        # so the gate stays value-exact even when the skew guard engages
        # (pigeonhole still makes recall exact while no bucket overflows
        # — tests/test_dedup_similarity.py proves both regimes)
        "simhash_near_duplicates": simhash_neardup_sql,
        # int8-style scalar quantization: integer code checksums are
        # order-free; the error mean is the one float, 6-dp rounded
        "embedding_quantization": """WITH eq AS (
  SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS x FROM embeddings
),
eqs AS (
  SELECT vec_id, x,
         list_max(list_transform(x, v -> abs(v))) / 127.0 AS scale
  FROM eq
)
SELECT vec_id,
       round(scale, 6) AS scale_r,
       (CASE WHEN scale > 0 THEN
         list_sum(list_transform(x, v -> round(v / scale)::BIGINT))
       ELSE 0 END)::BIGINT AS code_sum,
       (CASE WHEN scale > 0 THEN
         list_sum(list_transform(x,
           v -> round(v / scale)::BIGINT * round(v / scale)::BIGINT))
       ELSE 0 END)::BIGINT AS code_sumsq,
       CASE WHEN scale > 0 THEN
         round(list_sum(list_transform(x,
           v -> abs(v - round(v / scale) * scale))) / len(x), 6)
       ELSE 0.0 END AS mean_abs_err_r
FROM eqs""",
        # HLL registers: every gated quantity is an integer (index,
        # max-rho); trailing zeros via bit_count((w & -w) - 1), the
        # cross-engine form the anf_bits gate established
        "hll_registers": f"""WITH {_TOKS_CTE},
tok AS (SELECT lang, unnest(toks) AS tok FROM toks_t),
hh AS (SELECT lang, {_H56.format(x="tok")} AS h FROM tok),
ww AS (SELECT lang, (h % {1 << HLL_P})::BIGINT AS register,
              (h >> {HLL_P})::BIGINT AS w FROM hh)
SELECT lang, register,
       (MAX(CASE WHEN w = 0 THEN {56 - HLL_P + 1}
                 ELSE bit_count((w & (-w)) - 1) + 1 END))::BIGINT AS max_rho
FROM ww GROUP BY lang, register""",
        "cms_registers": f"""WITH {_TOKS_CTE},
tok AS (SELECT unnest(toks) AS tok FROM toks_t),
hh AS (SELECT ({_H56.format(x="tok")} % {_M}) AS h0 FROM tok),
b AS (
  {_cms_bucket_legs("hh")}
)
SELECT r, bucket, count(*)::BIGINT AS cnt FROM b GROUP BY r, bucket""",
        "cms_heavy_hitters": f"""WITH {_TOKS_CTE},
tok AS (SELECT unnest(toks) AS tok FROM toks_t),
hh AS (SELECT tok, ({_H56.format(x="tok")} % {_M}) AS h0 FROM tok),
cnts AS (SELECT tok, min(h0) AS h0, count(*)::BIGINT AS exact_cnt
         FROM hh GROUP BY tok),
topk AS (SELECT tok, exact_cnt, h0,
                (row_number() OVER (ORDER BY exact_cnt DESC, tok ASC))::BIGINT
                  AS rank
         FROM cnts ORDER BY exact_cnt DESC, tok ASC LIMIT 20),
b AS (
  {_cms_bucket_legs("hh")}
),
cms AS (SELECT r, bucket, count(*)::BIGINT AS cnt FROM b GROUP BY r, bucket),
probes AS (
  {_cms_bucket_legs("topk", extra_cols="tok, exact_cnt, rank, ")}
)
SELECT p.tok, p.exact_cnt, min(c.cnt)::BIGINT AS cms_est, p.rank
FROM probes p JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
GROUP BY p.tok, p.exact_cnt, p.rank""",
        # Bloom decontamination: test split's grams set 3 bit positions
        # each; a train gram is flagged iff all 3 positions are set —
        # the count(*) = 3 check deliberately counts duplicate
        # positions twice, matching the engine's posexplode probe
        "bloom_contamination": f"""WITH {_TOKS_CTE},
sp AS (
  SELECT doc_id, ({_H56.format(x="'split:' || doc_id")} % 100) AS bucket
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - {BLOOM_N - 1}, 1)),
           i -> array_to_string(list_slice(toks, i, i + {BLOOM_N - 1}), ' ')
         )) AS grams
  FROM toks_t WHERE len(toks) >= {BLOOM_N}
),
g AS (
  SELECT sh.doc_id, unnest(sh.grams) AS gram, sp.bucket
  FROM sh JOIN sp ON sp.doc_id = sh.doc_id
),
testg AS (
  SELECT DISTINCT gram FROM g
  WHERE bucket >= {SPLIT_WEIGHTS[0] + SPLIT_WEIGHTS[1]}
),
traing AS (SELECT doc_id, gram FROM g WHERE bucket < {SPLIT_WEIGHTS[0]}),
th AS (SELECT ({_H56.format(x="gram")} % {_M}) AS h0 FROM testg),
bits AS (SELECT DISTINCT pos FROM (
  {_bloom_pos_legs("th")}
)),
ph AS (
  SELECT doc_id, gram, ({_H56.format(x="gram")} % {_M}) AS h0 FROM traing
),
pp AS (
  {_bloom_pos_legs("ph", extra_cols="doc_id, gram, ")}
),
bh AS (
  SELECT pp.doc_id, pp.gram FROM pp JOIN bits ON bits.pos = pp.pos
  GROUP BY pp.doc_id, pp.gram HAVING count(*) = {BLOOM_HASHES}
),
nb AS (SELECT doc_id, count(*)::BIGINT AS n_bloom_hits FROM bh GROUP BY doc_id),
ne AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_exact_hits
  FROM traing t JOIN testg x ON x.gram = t.gram GROUP BY t.doc_id
),
ng AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM traing GROUP BY doc_id)
SELECT ng.doc_id, ng.n_grams, nb.n_bloom_hits,
       coalesce(ne.n_exact_hits, 0)::BIGINT AS n_exact_hits
FROM ng JOIN nb ON nb.doc_id = ng.doc_id
LEFT JOIN ne ON ne.doc_id = ng.doc_id""",
        # quantization-loss recall audit: float truth vs the int8
        # reconstruction round(v/scale)*scale, both brute-force scans
        "quantized_recall": """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
dqs AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, v -> abs(v))) / 127.0 AS scale
  FROM e
),
dq AS (
  SELECT vec_id,
         CASE WHEN scale > 0
              THEN list_transform(emb, v -> round(v / scale) * scale)
              ELSE emb END AS emb
  FROM dqs
),
tr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           round(list_dot_product(q.emb, n.emb)
                 / (sqrt(list_dot_product(q.emb, q.emb))
                    * sqrt(list_dot_product(n.emb, n.emb))), 6) AS cos_r,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.emb, n.emb)
                 / (sqrt(list_dot_product(q.emb, q.emb))
                    * sqrt(list_dot_product(n.emb, n.emb))), 6) DESC,
                              n.vec_id) AS rank
    FROM e q CROSS JOIN e n
    WHERE q.vec_id < 20 AND n.vec_id != q.vec_id
  ) WHERE rank <= 5
),
qt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.emb, n.emb)
                 / (sqrt(list_dot_product(q.emb, q.emb))
                    * sqrt(list_dot_product(n.emb, n.emb))), 6) DESC,
                              n.vec_id) AS rank
    FROM dq q CROSS JOIN dq n
    WHERE q.vec_id < 20 AND n.vec_id != q.vec_id
  ) WHERE rank <= 5
),
base AS (SELECT query_id, count(*)::BIGINT AS n_exact FROM tr GROUP BY query_id),
h AS (SELECT tr.query_id, count(*)::BIGINT AS n FROM tr
      JOIN qt ON qt.query_id = tr.query_id AND qt.neighbor_id = tr.neighbor_id
      GROUP BY tr.query_id)
SELECT b.query_id, b.n_exact, coalesce(h.n, 0)::BIGINT AS n_q_hits
FROM base b LEFT JOIN h ON h.query_id = b.query_id""",
        "pq_codes": f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
seeds AS (SELECT vec_id, emb FROM e WHERE vec_id % {PQ_STRIDE} = 0),
cb AS (
  SELECT j.s AS sub_id,
         (row_number() OVER (PARTITION BY j.s ORDER BY vec_id) - 1)::BIGINT AS code,
         list_slice(emb, j.s * {_PQ_SUB} + 1, j.s * {_PQ_SUB} + {_PQ_SUB}) AS c_sub
  FROM seeds CROSS JOIN generate_series(0, {_PQ_M1}) j(s)
),
sv AS (
  SELECT vec_id, j.s AS sub_id,
         list_slice(emb, j.s * {_PQ_SUB} + 1, j.s * {_PQ_SUB} + {_PQ_SUB}) AS sub
  FROM e CROSS JOIN generate_series(0, {_PQ_M1}) j(s)
),
scored AS (
  SELECT sv.vec_id, sv.sub_id, cb.code,
         round((list_dot_product(sub, sub)
                - 2 * list_dot_product(sub, c_sub))
               + list_dot_product(c_sub, c_sub), 6) AS d_r
  FROM sv JOIN cb ON sv.sub_id = cb.sub_id
)
SELECT vec_id, sub_id::BIGINT AS sub_id, code FROM (
  SELECT vec_id, sub_id, code,
         row_number() OVER (PARTITION BY vec_id, sub_id
                            ORDER BY d_r, code) AS rn
  FROM scored
) WHERE rn = 1""",
        "pq_recall": f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
seeds AS (SELECT vec_id, emb FROM e WHERE vec_id % {PQ_STRIDE} = 0),
cb AS (
  SELECT j.s AS sub_id,
         (row_number() OVER (PARTITION BY j.s ORDER BY vec_id) - 1)::BIGINT AS code,
         list_slice(emb, j.s * {_PQ_SUB} + 1, j.s * {_PQ_SUB} + {_PQ_SUB}) AS c_sub
  FROM seeds CROSS JOIN generate_series(0, {_PQ_M1}) j(s)
),
sv AS (
  SELECT vec_id, j.s AS sub_id,
         list_slice(emb, j.s * {_PQ_SUB} + 1, j.s * {_PQ_SUB} + {_PQ_SUB}) AS sub
  FROM e CROSS JOIN generate_series(0, {_PQ_M1}) j(s)
),
scored AS (
  SELECT sv.vec_id, sv.sub_id, cb.code,
         round((list_dot_product(sub, sub)
                - 2 * list_dot_product(sub, c_sub))
               + list_dot_product(c_sub, c_sub), 6) AS d_r
  FROM sv JOIN cb ON sv.sub_id = cb.sub_id
),
codes AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT vec_id, sub_id, code,
           row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY d_r, code) AS rn
    FROM scored
  ) WHERE rn = 1
),
rec AS (
  SELECT codes.vec_id,
         flatten(list(cb.c_sub ORDER BY codes.sub_id)) AS emb
  FROM codes JOIN cb ON cb.sub_id = codes.sub_id AND cb.code = codes.code
  GROUP BY codes.vec_id
),
tr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.emb, n.emb)
                 / (sqrt(list_dot_product(q.emb, q.emb))
                    * sqrt(list_dot_product(n.emb, n.emb))), 6) DESC,
                              n.vec_id) AS rank
    FROM e q CROSS JOIN e n
    WHERE q.vec_id < 20 AND n.vec_id != q.vec_id
  ) WHERE rank <= 5
),
qt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.emb, n.emb)
                 / (sqrt(list_dot_product(q.emb, q.emb))
                    * sqrt(list_dot_product(n.emb, n.emb))), 6) DESC,
                              n.vec_id) AS rank
    FROM rec q CROSS JOIN rec n
    WHERE q.vec_id < 20 AND n.vec_id != q.vec_id
  ) WHERE rank <= 5
),
base AS (SELECT query_id, count(*)::BIGINT AS n_exact FROM tr GROUP BY query_id),
h AS (SELECT tr.query_id, count(*)::BIGINT AS n FROM tr
      JOIN qt ON qt.query_id = tr.query_id AND qt.neighbor_id = tr.neighbor_id
      GROUP BY tr.query_id)
SELECT b.query_id, b.n_exact, coalesce(h.n, 0)::BIGINT AS n_pq_hits
FROM base b LEFT JOIN h ON h.query_id = b.query_id""",
        "cosine_topk": """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_dot_product(q.q_emb, e.emb)
               / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                  * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos_r
  FROM q CROSS JOIN e WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cos_r,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_r DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5""",
        "lsh_ann_topk": f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
k AS (
  {" UNION ALL ".join(
      f'''SELECT vec_id, emb, {band} AS band,
          {_bucket_sql("emb", 64, ANN_PLANES_PER_BAND, band)} AS bucket FROM e'''
      for band in range(ANN_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
  FROM k q JOIN k n
    ON q.band = n.band AND q.bucket = n.bucket AND n.vec_id != q.vec_id
  WHERE q.vec_id < 20
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_dot_product(eq.emb, en.emb)
               / (sqrt(list_dot_product(eq.emb, eq.emb))
                  * sqrt(list_dot_product(en.emb, en.emb))), 6) AS cos_r
  FROM cand c
  JOIN e eq ON eq.vec_id = c.query_id
  JOIN e en ON en.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_r,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_r DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5""",
        # the two-step mx/asg argmax (max cosine, then min cell_id among
        # the maxima) mirrors _ivf_assign's max(struct(cos_r, -cell_id))
        # hash agg exactly; cosine is rounded to 6 dp BEFORE the argmax
        # in both engines so tie-breaks are portable
        "ivf_ann_topk": """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
cent AS (SELECT vec_id AS cell_id, emb AS c_emb FROM e WHERE vec_id % 32 = 0),
s AS (
  SELECT v.vec_id, c.cell_id,
         round(list_dot_product(v.emb, c.c_emb)
               / (sqrt(list_dot_product(v.emb, v.emb))
                  * sqrt(list_dot_product(c.c_emb, c.c_emb))), 6) AS cos_r
  FROM e v CROSS JOIN cent c
),
mx AS (SELECT vec_id, max(cos_r) AS m FROM s GROUP BY vec_id),
asg AS (
  SELECT s.vec_id, min(s.cell_id) AS cell_id
  FROM s JOIN mx ON s.vec_id = mx.vec_id AND s.cos_r = mx.m
  GROUP BY s.vec_id
),
probes AS (
  SELECT query_id, cell_id FROM (
    SELECT s.vec_id AS query_id, s.cell_id,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY s.cos_r DESC, s.cell_id) AS rn
    FROM s WHERE s.vec_id < 20
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN asg a ON a.cell_id = p.cell_id
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_dot_product(eq.emb, en.emb)
               / (sqrt(list_dot_product(eq.emb, eq.emb))
                  * sqrt(list_dot_product(en.emb, en.emb))), 6) AS cos_r
  FROM cand c
  JOIN e eq ON eq.vec_id = c.query_id
  JOIN e en ON en.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_r,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_r DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5""",
        "embedding_near_duplicates": f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
k AS (
  {" UNION ALL ".join(
      f'''SELECT vec_id, emb, {band} AS band,
          {_bucket_sql("emb", 64, NEAR_DUP_PLANES_PER_BAND, band)} AS bucket FROM e'''
      for band in range(NEAR_DUP_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM k a JOIN k b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_dot_product(ea.emb, eb.emb)
             / (sqrt(list_dot_product(ea.emb, ea.emb))
                * sqrt(list_dot_product(eb.emb, eb.emb))), 6) AS cos_r
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE round(list_dot_product(ea.emb, eb.emb)
      / (sqrt(list_dot_product(ea.emb, ea.emb))
         * sqrt(list_dot_product(eb.emb, eb.emb))), 6) >= 0.3""",
        "triangle_list": f"""WITH {_EDGES_CTE},
{_TRI_CTE}
SELECT a AS x, b AS y, c AS z FROM tri""",
        # CPM k=3 (Palla et al. 2005): recursive min-label CC over the
        # star-reduced triangle-adjacency graph. Triangle node ids are
        # the engine-portable hash56 of 'x:y:z' so both engines label
        # identical nodes; the recursive form is the sf0.01 oracle —
        # tools/correctness_sf.py swaps in the unrolled fixpoint-guarded
        # propagation at the big tier (same treatment as
        # connected_components / backbone_profile).
        "clique_percolation": f"""WITH RECURSIVE {_CPM_EDGES_CTE},
{_TRI_CTE},
{_CPM_OVERLAY_CTE},
ccc(v, l) AS (
  SELECT v, v FROM cnodes
  UNION
  SELECT b.v, ccc.l FROM ccc JOIN cbidir b ON b.u = ccc.v WHERE ccc.l < b.v
),
clbl AS (SELECT v AS tid, min(l) AS community FROM ccc GROUP BY v),
{_CPM_MEMB_SQL}""",
        "transitivity": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
w AS (SELECT CAST(coalesce(sum(degree * (degree - 1) // 2), 0) AS BIGINT) AS wedges FROM deg),
t AS (SELECT count(*)::BIGINT AS triangles FROM tri)
SELECT w.wedges, t.triangles,
       CASE WHEN w.wedges > 0
            THEN round(3.0 * t.triangles / w.wedges, 6)
            ELSE 0.0 END AS transitivity_r
FROM w, t""",
        # local bridges (zero-common-neighbor edges) over the SAME
        # capped substrate as clique_percolation — the full graph has
        # 8 such edges at sf0.01 (no power)
        "local_bridges": f"""WITH {_CPM_EDGES_CTE},
{_TRI_CTE},
lb_te AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
  UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
  UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
),
lb_td AS (SELECT DISTINCT u, v FROM lb_te),
lb_deg AS (
  SELECT u AS v, count(*)::BIGINT AS degree FROM (
    SELECT src AS u FROM edges UNION ALL SELECT dst FROM edges
  ) GROUP BY u
),
lb_zero AS (
  SELECT e.src AS u, e.dst AS v
  FROM edges e LEFT JOIN lb_td t ON t.u = e.src AND t.v = e.dst
  WHERE t.u IS NULL
)
SELECT z.u, z.v, du.degree AS deg_u, dv.degree AS deg_v
FROM lb_zero z
JOIN lb_deg du ON du.v = z.u
JOIN lb_deg dv ON dv.v = z.v""",
        # every ts lies in exactly window/slide = 2 sliding windows;
        # starts are epoch-aligned slide multiples (Spark's window())
        "events_sliding": """WITH slid AS (
  SELECT event_type, value,
         unnest([make_timestamp(((floor(epoch(ts) / 1800) * 1800)::BIGINT) * 1000000),
                 make_timestamp(((floor(epoch(ts) / 1800) * 1800 - 1800)::BIGINT) * 1000000)])
           AS window_start
  FROM events
)
SELECT event_type, window_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value_r
FROM slid GROUP BY event_type, window_start""",
        "events_quantiles": """SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.25), 6) AS q25_r,
       round(quantile_cont(value, 0.5), 6) AS q5_r,
       round(quantile_cont(value, 0.75), 6) AS q75_r
FROM events GROUP BY event_type""",
        # monetary sum in DECIMAL(18,2): exact and order-free in both
        # engines, then ONE cast to double — a raw double sum is
        # partition-order-dependent and can never gate hash-exact
        "user_sessions": _SESSIONS_SQL,
        "user_sessions_stream": _SESSIONS_SQL,
        # as-of join twin: the SAME union-tag-window plan in ANSI SQL.
        # Comparison domain is integer microseconds (epoch_us ≡
        # unix_micros); the total window order (ts_us, tag, event_id)
        # and the tag values (click 0 < purchase 1 ⇒ equal-ts clicks
        # visible) are shared with the engine verbatim.
        "purchase_attribution": """WITH tagged AS (
  SELECT user_id, epoch_us(ts) AS ts_us, 0 AS tag, event_id, value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, epoch_us(ts) AS ts_us, 1 AS tag, event_id, value
  FROM events WHERE event_type = 'purchase'
),
attrib AS (
  SELECT user_id, ts_us, tag, event_id,
         last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
           OVER w AS c_id,
         last_value(CASE WHEN tag = 0 THEN ts_us END IGNORE NULLS)
           OVER w AS c_ts,
         last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS)
           OVER w AS c_v
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts_us AS purchase_ts_us,
       coalesce(c_id, -1) AS click_id,
       coalesce(c_ts, -1) AS click_ts_us,
       coalesce(ts_us - c_ts, 0) AS gap_us,
       coalesce(c_v, 0.0) AS click_value,
       CASE WHEN c_id IS NULL THEN 0 ELSE 1 END AS matched
FROM attrib WHERE tag = 1""",
        # OHLC twin: same two row_number windows over the same TOTAL
        # (ts, event_id) order
        "events_ohlc": """WITH ranked AS (
  SELECT event_type AS key, date_trunc('hour', ts) AS bar_start, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT key, bar_start,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*)::BIGINT AS n
FROM ranked GROUP BY key, bar_start""",
        # TWA twin: identical integer fixed-point weighted sum; ONE
        # division at the end, written in the same association
        "events_twa": """WITH stepped AS (
  SELECT event_type AS key,
         round(value * 100)::BIGINT AS cv,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS t_next
  FROM events
)
SELECT key,
       sum(cv * ((t_next - t) // 1000000))::BIGINT AS twa_num,
       sum((t_next - t) // 1000000)::BIGINT AS twa_den_s,
       round(sum(cv * ((t_next - t) // 1000000))
             / sum((t_next - t) // 1000000) / 100, 6) AS twa_r
FROM stepped WHERE t_next IS NOT NULL GROUP BY key""",
        # temporal-motif twin: plain theta self-join, same strict-
        # after/inclusive-delta window in integer microseconds
        "temporal_pair_counts": f"""SELECT a.event_type AS src_type,
       b.event_type AS dst_type,
       count(*)::BIGINT AS n
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {TEMPORAL_DELTA_S} * 1000000
GROUP BY a.event_type, b.event_type""",
        # forward as-of twin: the same union-tag window on the NEGATED
        # microsecond axis; tolerance reverts far matches to no-match
        "click_conversion": f"""WITH tagged AS (
  SELECT user_id, -epoch_us(ts) AS sort_us, epoch_us(ts) AS true_us,
         0 AS tag, event_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, -epoch_us(ts) AS sort_us, epoch_us(ts) AS true_us,
         1 AS tag, event_id
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT user_id, true_us, tag, event_id,
         last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
           OVER w AS p_id,
         last_value(CASE WHEN tag = 0 THEN true_us END IGNORE NULLS)
           OVER w AS p_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY sort_us, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tol AS (
  SELECT user_id, true_us, event_id,
         CASE WHEN p_id IS NOT NULL
                AND p_ts - true_us <= {CONVERSION_TOL_S}::BIGINT * 1000000
              THEN p_id END AS p_id,
         CASE WHEN p_id IS NOT NULL
                AND p_ts - true_us <= {CONVERSION_TOL_S}::BIGINT * 1000000
              THEN p_ts END AS p_ts
  FROM carried WHERE tag = 1
)
SELECT event_id AS click_id, user_id, true_us AS click_ts_us,
       coalesce(p_id, -1) AS purchase_id,
       coalesce(p_ts, -1) AS purchase_ts_us,
       coalesce(p_ts - true_us, 0) AS gap_us,
       CASE WHEN p_id IS NULL THEN 0 ELSE 1 END AS matched
FROM tol""",
        # quotient twin: two mapping joins + canonicalize + count
        "brand_quotient_graph": f"""WITH {_EDGES_CTE},
brand_m AS (SELECT p_partkey AS vertex, p_brand AS grp FROM part)
SELECT least(a.grp, b.grp) AS src_group,
       greatest(a.grp, b.grp) AS dst_group,
       count(*)::BIGINT AS weight
FROM edges e
JOIN brand_m a ON a.vertex = e.src
JOIN brand_m b ON b.vertex = e.dst
GROUP BY least(a.grp, b.grp), greatest(a.grp, b.grp)""",
        # dup-depth twin: per-depth clipped-slice group counts, max by
        # CASE — generated from SUFFIX_ROUNDS so engine and oracle
        # share one depth grid
        "dup_prefix_depths": _dup_depth_oracle_sql(),
        # suffix-rank twin: sort explicit 64-token suffix slices —
        # list comparison is element-wise with shorter-prefix-first in
        # both engines, the lexicographic convention the doubling's
        # missing-partner = −1 rule implements
        "suffix_ranks": f"""WITH {_TOKS_CTE},
pos_t AS (
  SELECT doc_id, i - 1 AS pos,
         list_slice(toks, i, i + {(1 << SUFFIX_ROUNDS) - 1}) AS suf
  FROM toks_t,
       LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
)
SELECT doc_id, pos,
       (dense_rank() OVER (ORDER BY suf) - 1)::BIGINT AS rank
FROM pos_t""",
        # PPS sampler twin: the identical all-integer keep rule —
        # hash32 < (target·w·2^32) div W — over the shared tokenizer
        "pps_sample": f"""WITH {_TOKS_CTE},
w_t AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM toks_t
),
tot_t AS (SELECT sum(n_tokens) AS w_all FROM w_t)
SELECT doc_id, n_tokens
FROM w_t, tot_t
WHERE {_H56.format(x="'pps:' || doc_id")} % 4294967296
      < ({PPS_TARGET} * n_tokens * 4294967296) // w_all""",
        # interval-join twin: plain BETWEEN theta-join over the shared
        # sessions CTE — the engine's bucketed rewrite must give the
        # identical answer
        "session_click_stats": f"""WITH sess AS ({_SESSIONS_SQL})
SELECT e.user_id, s.session_id,
       count(*)::BIGINT AS n_clicks,
       round(sum(e.value), 4) AS click_value_r
FROM events e
JOIN sess s
  ON e.user_id = s.user_id
 AND epoch_us(e.ts) >= epoch_us(s.session_start)
 AND epoch_us(e.ts) <= epoch_us(s.session_end)
WHERE e.event_type = 'click'
GROUP BY e.user_id, s.session_id""",
        "orders_rollup": """SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round((sum(o_totalprice::DECIMAL(18,2)))::DOUBLE, 2) AS total_r
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "events_windowed": """SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value_r
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        # the STREAM must land on the batch answer exactly
        "events_windowed_stream": """SELECT event_type,
       date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value_r
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
    }


def _walks_oracle_sql() -> str:
    """Unrolled hash-driven walk: per step, one frontier×bidir join and
    a per-walk argmin window (min (hash, neighbor)) — the two-phase
    tie-break matching the engine's array_min over (h, u) structs."""
    ctes = [
        f"""s0 AS (
  SELECT DISTINCT u AS walk_id, CAST(0 AS INT) AS step, u AS v
  FROM bidir WHERE u % {WALK_SEED_MOD} = 0
)"""
    ]
    for k in range(1, WALK_LEN + 1):
        h = _H56.format(x=f"'walk:' || p.walk_id || ':{k}:' || b.v")
        ctes.append(
            f"""c{k} AS (
  SELECT p.walk_id, b.v AS u, {h} AS h
  FROM s{k - 1} p JOIN bidir b ON b.u = p.v
),
s{k} AS (
  SELECT walk_id, CAST({k} AS INT) AS step, u AS v
  FROM (SELECT walk_id, u,
               row_number() OVER (PARTITION BY walk_id ORDER BY h, u) AS rn
        FROM c{k})
  WHERE rn = 1
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, v FROM s{k}" for k in range(WALK_LEN + 1)
    )
    return f"WITH {_EDGES_CTE},\n" + ",\n".join(ctes) + "\n" + union


def _biased_walks_oracle_sql() -> str:
    """Unrolled second-order walk: per step, candidates with integer
    copy counts (CASE on previous-vertex relation), copies exploded via
    generate_series, argmin of (hash, u) per walk."""
    ctes = [
        f"""s0 AS (
  SELECT DISTINCT u AS walk_id, CAST(NULL AS BIGINT) AS prev, u AS v
  FROM bidir WHERE u % {WALK_SEED_MOD} = 0
)"""
    ]
    for k in range(1, WALK_LEN + 1):
        h = _H56.format(x=f"'n2v:' || walk_id || ':{k}:' || u || ':' || j")
        ctes.append(
            f"""c{k} AS (
  SELECT p.walk_id, p.v AS cprev, b.v AS u,
         CASE WHEN p.prev IS NULL THEN 1
              WHEN b.v = p.prev THEN {N2V_RET}
              WHEN EXISTS (SELECT 1 FROM bidir e
                           WHERE e.u = p.prev AND e.v = b.v) THEN {N2V_BASE}
              ELSE {N2V_IO} END AS w
  FROM s{k - 1} p JOIN bidir b ON b.u = p.v
),
x{k} AS (
  SELECT walk_id, cprev, u, unnest(generate_series(1, w)) AS j FROM c{k}
),
s{k} AS (
  SELECT walk_id, cprev AS prev, u AS v
  FROM (SELECT walk_id, cprev, u,
               row_number() OVER (PARTITION BY walk_id ORDER BY {h}, u) AS rn
        FROM x{k})
  WHERE rn = 1
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({k} AS INT) AS step, v FROM s{k}"
        for k in range(WALK_LEN + 1)
    )
    return f"WITH {_EDGES_CTE},\n" + ",\n".join(ctes) + "\n" + union


def _betweenness_oracle_sql() -> str:
    """Unrolled k-source depth-bounded Brandes: forward per level
    (frontier join + settled NOT EXISTS + sigma sum), backward per
    level (two left joins + dependency sum), matching the engine's
    superstep plan row-for-row."""
    D = BC_MAX_DEPTH
    ctes = [
        f"seeds AS (SELECT v FROM verts ORDER BY v LIMIT {BC_SOURCES})",
        "f0 AS (SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma FROM seeds)",
    ]
    for k in range(1, D + 1):
        settled = " OR ".join(
            f"EXISTS (SELECT 1 FROM f{j} x WHERE x.s = c.s AND x.v = c.v)"
            for j in range(k)
        )
        ctes.append(
            f"""c{k} AS (
  SELECT p.s, b.v AS v, CAST(sum(p.sigma) AS BIGINT) AS sigma
  FROM f{k - 1} p JOIN bidir b ON b.u = p.v
  GROUP BY p.s, b.v
),
f{k} AS (SELECT c.s, c.v, c.sigma FROM c{k} c WHERE NOT ({settled}))"""
        )
    ctes.append(
        f"d{D} AS (SELECT s, v, sigma, CAST(0.0 AS DOUBLE) AS delta FROM f{D})"
    )
    for k in range(D - 1, 0, -1):
        ctes.append(
            f"""d{k} AS (
  SELECT f.s, f.v, f.sigma,
         coalesce(sum(f.sigma / w.sigma * (1.0 + w.delta)), 0.0) AS delta
  FROM f{k} f
  LEFT JOIN bidir b ON b.u = f.v
  LEFT JOIN d{k + 1} w ON w.s = f.s AND w.v = b.v
  GROUP BY f.s, f.v, f.sigma
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT v, delta FROM d{k}" for k in range(1, D + 1)
    )
    return (
        f"WITH {_EDGES_CTE},\n"
        + ",\n".join(ctes)
        + f""",
alldelta AS ({union})
SELECT verts.v AS vertex,
       round(coalesce(sum(alldelta.delta), 0.0), {ROUND}) AS bc_r
FROM verts LEFT JOIN alldelta ON alldelta.v = verts.v
GROUP BY verts.v"""
    )


def _harmonic_oracle_sql() -> str:
    """Unrolled pivot harmonic centrality: the betweenness forward CTEs
    (the level index is the distance) + one 1/d sum."""
    D = BC_MAX_DEPTH
    ctes = [
        f"seeds AS (SELECT v FROM verts ORDER BY v LIMIT {BC_SOURCES})",
        "f0 AS (SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma FROM seeds)",
    ]
    for k in range(1, D + 1):
        settled = " OR ".join(
            f"EXISTS (SELECT 1 FROM f{j} x WHERE x.s = c.s AND x.v = c.v)"
            for j in range(k)
        )
        ctes.append(
            f"""c{k} AS (
  SELECT p.s, b.v AS v, CAST(sum(p.sigma) AS BIGINT) AS sigma
  FROM f{k - 1} p JOIN bidir b ON b.u = p.v
  GROUP BY p.s, b.v
),
f{k} AS (SELECT c.s, c.v, c.sigma FROM c{k} c WHERE NOT ({settled}))"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT v, 1.0 / {k} AS inv_d FROM f{k}" for k in range(1, D + 1)
    )
    return (
        f"WITH {_EDGES_CTE},\n"
        + ",\n".join(ctes)
        + f""",
alld AS ({union})
SELECT verts.v AS vertex,
       round(coalesce(sum(alld.inv_d), 0.0), {ROUND}) AS harmonic_r
FROM verts LEFT JOIN alld ON alld.v = verts.v
GROUP BY verts.v"""
    )


def _seeded_lpa_oracle_sql() -> str:
    """Unrolled seeded (clamped) synchronous label propagation: per
    superstep one labeled-neighbor count + argmax (row_number twin of
    the engine's max(struct) hash agg) + the seed clamp; unlabeled
    vertices drop from the final select in both engines."""
    D = SEEDED_LPA_ITERS
    ctes = [
        f"seeds AS (SELECT v, v AS label FROM (SELECT v FROM verts ORDER BY v LIMIT {SEEDED_LPA_K}))",
        "lbl0 AS (SELECT verts.v, s.label FROM verts LEFT JOIN seeds s ON s.v = verts.v)",
    ]
    for k in range(1, D + 1):
        ctes.append(
            f"""cnt{k} AS (
  SELECT b.v AS v, l.label AS label, count(*) AS c
  FROM bidir b JOIN lbl{k - 1} l ON b.u = l.v
  WHERE l.label IS NOT NULL
  GROUP BY b.v, l.label
),
arg{k} AS (
  SELECT v, label FROM (
    SELECT v, label,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, label ASC) AS rn
    FROM cnt{k}
  ) WHERE rn = 1
),
lbl{k} AS (
  SELECT verts.v, coalesce(s.label, a.label) AS label
  FROM verts
  LEFT JOIN seeds s ON s.v = verts.v
  LEFT JOIN arg{k} a ON a.v = verts.v
)"""
        )
    return (
        f"WITH {_EDGES_CTE},\n"
        + ",\n".join(ctes)
        + f"""
SELECT v AS vertex, label FROM lbl{D} WHERE label IS NOT NULL"""
    )


def _vertex_cover_oracle_sql() -> str:
    """Endpoints of the unrolled maximal matching (same CTE chain,
    same loud fixpoint guard)."""
    R = MATCHING_UNROLL
    return (
        _matching_ctes()
        + f"""
SELECT DISTINCT vertex FROM (
  SELECT src AS vertex FROM allm UNION ALL SELECT dst FROM allm)
WHERE (SELECT count(*) FROM l{R}) = 0"""
    )


def _closeness_oracle_sql() -> str:
    """Unrolled pivot closeness: the same forward CTEs as harmonic
    (the level index is the distance), then per-vertex reach count /
    distance sum."""
    D = BC_MAX_DEPTH
    ctes = [
        f"seeds AS (SELECT v FROM verts ORDER BY v LIMIT {BC_SOURCES})",
        "f0 AS (SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma FROM seeds)",
    ]
    for k in range(1, D + 1):
        settled = " OR ".join(
            f"EXISTS (SELECT 1 FROM f{j} x WHERE x.s = c.s AND x.v = c.v)"
            for j in range(k)
        )
        ctes.append(
            f"""c{k} AS (
  SELECT p.s, b.v AS v, CAST(sum(p.sigma) AS BIGINT) AS sigma
  FROM f{k - 1} p JOIN bidir b ON b.u = p.v
  GROUP BY p.s, b.v
),
f{k} AS (SELECT c.s, c.v, c.sigma FROM c{k} c WHERE NOT ({settled}))"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT v, CAST({k} AS BIGINT) AS d FROM f{k}" for k in range(1, D + 1)
    )
    return (
        f"WITH {_EDGES_CTE},\n"
        + ",\n".join(ctes)
        + f""",
alld AS ({union})
SELECT verts.v AS vertex,
       CAST(count(alld.v) AS BIGINT) AS n_reached,
       CAST(coalesce(sum(alld.d), 0) AS BIGINT) AS sum_dist,
       round(coalesce(CAST(count(alld.v) AS DOUBLE) / sum(alld.d), 0.0),
             {ROUND}) AS closeness_r
FROM verts LEFT JOIN alld ON alld.v = verts.v
GROUP BY verts.v"""
    )


def _matching_ctes() -> str:
    """Unrolled locally-dominant maximal matching CTE chain: per round,
    the per-vertex argmin pick (window twin of the engine's min(struct)
    hash agg), the both-endpoints-agree join, and the incident-edge
    drop. Idempotent once the live set is empty; consumers add a LOUD
    fixpoint guard — zero rows if the unroll did not converge."""
    R = MATCHING_UNROLL
    ctes = [
        "l0 AS MATERIALIZED (SELECT src, dst, ('0x' || substr(md5("
        "CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 14))"
        "::BIGINT AS w FROM edges)"
    ]
    for k in range(1, R + 1):
        ctes.append(
            f"""p{k} AS (
  SELECT v, src, dst FROM (
    SELECT i.v, i.src, i.dst,
           row_number() OVER (PARTITION BY i.v ORDER BY i.w, i.src, i.dst) AS rn
    FROM (SELECT src AS v, w, src, dst FROM l{k - 1}
          UNION ALL SELECT dst AS v, w, src, dst FROM l{k - 1}) i
  ) WHERE rn = 1
),
m{k} AS (
  SELECT e.src, e.dst, CAST({k} AS INT) AS mround FROM l{k - 1} e
  JOIN p{k} a ON a.v = e.src AND a.src = e.src AND a.dst = e.dst
  JOIN p{k} b ON b.v = e.dst AND b.src = e.src AND b.dst = e.dst
),
l{k} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w FROM l{k - 1} e
  WHERE NOT EXISTS (SELECT 1 FROM m{k} m
                    WHERE m.src = e.src OR m.dst = e.src
                       OR m.src = e.dst OR m.dst = e.dst)
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT src, dst, mround FROM m{k}" for k in range(1, R + 1)
    )
    ctes.append(f"allm AS ({union})")
    return f"WITH {_EDGES_CTE},\n" + ",\n".join(ctes)


def _matching_oracle_sql() -> str:
    R = MATCHING_UNROLL
    return (
        _matching_ctes()
        + f"""
SELECT src, dst, mround FROM allm
WHERE (SELECT count(*) FROM l{R}) = 0"""
    )


def _coarsen_oracle_sql() -> str:
    """Matching contraction: matched pairs collapse onto their lower
    endpoint, parent edges re-key through the representative map,
    self-loops drop, parallel edges merge into an exact weight. Guarded
    by the same matching fixpoint check (zero rows, never a partial
    contraction)."""
    R = MATCHING_UNROLL
    return (
        _matching_ctes()
        + f""",
map_t AS (SELECT dst AS vertex, src AS rep FROM allm),
ce AS (
  SELECT least(coalesce(ms.rep, e.src), coalesce(md.rep, e.dst)) AS s,
         greatest(coalesce(ms.rep, e.src), coalesce(md.rep, e.dst)) AS d
  FROM edges e
  LEFT JOIN map_t ms ON ms.vertex = e.src
  LEFT JOIN map_t md ON md.vertex = e.dst
)
SELECT s AS src, d AS dst, count(*)::BIGINT AS weight
FROM ce
WHERE s != d AND (SELECT count(*) FROM l{R}) = 0
GROUP BY s, d"""
    )


def _msf_oracle_ctes() -> tuple[list, str]:
    """Shared unrolled-Borůvka CTE chain (see _msf_oracle_sql) plus the
    loud-guard predicate consumers must AND into their final SELECT."""
    R, J = MSF_UNROLL, MSF_JUMPS
    ctes = [
        _WEDGES_CTE,
        """mv AS (SELECT DISTINCT v FROM (
  SELECT src AS v FROM wedges UNION ALL SELECT dst AS v FROM wedges))""",
        "l0 AS MATERIALIZED (SELECT v, v AS comp FROM mv)",
    ]
    for k in range(1, R + 1):
        ctes.append(
            f"""rk{k} AS MATERIALIZED (
  SELECT ls.comp AS cu, ld.comp AS cv, e.weight AS w, e.src, e.dst
  FROM wedges e
  JOIN l{k - 1} ls ON ls.v = e.src
  JOIN l{k - 1} ld ON ld.v = e.dst
  WHERE ls.comp != ld.comp
),
ch{k} AS MATERIALIZED (
  SELECT comp, other, w, src, dst FROM (
    SELECT i.*, row_number() OVER (PARTITION BY comp ORDER BY w, src, dst) AS rn
    FROM (SELECT cu AS comp, cv AS other, w, src, dst FROM rk{k}
          UNION ALL
          SELECT cv AS comp, cu AS other, w, src, dst FROM rk{k}) i
  ) WHERE rn = 1
),
pj{k}_0 AS MATERIALIZED (
  SELECT a.comp,
         coalesce(CASE WHEN t.comp IS NOT NULL AND c.comp < c.other
                       THEN c.comp ELSE c.other END, a.comp) AS parent
  FROM (SELECT DISTINCT comp FROM l{k - 1}) a
  LEFT JOIN ch{k} c ON c.comp = a.comp
  LEFT JOIN ch{k} t ON t.comp = c.other AND t.other = c.comp
                   AND t.src = c.src AND t.dst = c.dst
)"""
        )
        for j in range(1, J + 1):
            ctes.append(
                f"""pj{k}_{j} AS MATERIALIZED (
  SELECT a.comp, b.parent FROM pj{k}_{j - 1} a
  JOIN pj{k}_{j - 1} b ON b.comp = a.parent
)"""
            )
        ctes.append(
            f"""g{k} AS (
  SELECT count(*) AS c FROM pj{k}_{J} a
  JOIN pj{k}_{J} b ON b.comp = a.parent WHERE b.parent != a.parent
),
l{k} AS MATERIALIZED (
  SELECT l.v, r.parent AS comp FROM l{k - 1} l JOIN pj{k}_{J} r ON r.comp = l.comp
),
m{k} AS (SELECT DISTINCT src, dst, w, CAST({k} AS INT) AS mround FROM ch{k})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT src, dst, w, mround FROM m{k}" for k in range(1, R + 1)
    )
    guards = " + ".join(f"(SELECT c FROM g{k})" for k in range(1, R + 1))
    ctes.append(f"allm AS ({union})")
    ctes.append(
        f"""live_final AS (
  SELECT count(*) AS c FROM wedges e
  JOIN l{R} ls ON ls.v = e.src
  JOIN l{R} ld ON ld.v = e.dst
  WHERE ls.comp != ld.comp
)"""
    )
    return ctes, f"(SELECT c FROM live_final) = 0 AND {guards} = 0"


def _msf_oracle_sql() -> str:
    """Unrolled Borůvka over the weighted part graph: per round, the
    re-key through the current labels, the per-component argmin choice
    (window twin of the engine's min(struct) hash agg), mutual-2-cycle
    rooting, MSF_JUMPS unrolled pointer-jumping doublings, and the label
    update. Two LOUD guards zero the output if the unroll is too small:
    the final live-edge count (rounds) and the per-round pointer
    idempotence check (jumps)."""
    ctes, guard = _msf_oracle_ctes()
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT src, dst, w AS weight, mround FROM allm
WHERE {guard}"""
    )


def _single_linkage_oracle_sql() -> str:
    """Single-linkage cut of the independently-derived (unrolled
    Borůvka) forest: recursive min-label components over the ≤|V|−1
    under-threshold forest edges, singletons filled from the vertex
    set. Min-label over the FULL threshold subgraph is equivalent (the
    single-linkage identity, pytest-pinned engine-side) but needs
    diameter × |E_t| work — infeasible for the oracle budget at sf0.1.
    The same loud Borůvka guards empty the output if the unroll was
    insufficient."""
    ctes, guard = _msf_oracle_ctes()
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
fe AS (SELECT src, dst FROM allm WHERE w <= {SL_THRESHOLD}),
slb AS (
  SELECT src AS u, dst AS v FROM fe
  UNION ALL
  SELECT dst AS u, src AS v FROM fe
),
scc(v, l) AS (
  SELECT v, v FROM mv
  UNION
  SELECT b.v, scc.l FROM scc JOIN slb b ON b.u = scc.v WHERE scc.l < b.v
)
SELECT v AS vertex, min(l) AS cluster FROM scc
WHERE {guard}
GROUP BY v"""
    )


def _mis_oracle_sql() -> str:
    """Unrolled Luby rounds: per round, the per-vertex min live-
    neighbor rank (window twin of the engine's min(struct) hash agg),
    the local-minimum membership test (row comparison (h, v) <
    (hu, u)), and the member+neighbor drop. Loud final-live guard."""
    R = MIS_UNROLL

    def h(col: str) -> str:
        return f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 14))::BIGINT"

    ctes = [
        _EDGES_CTE,
        "live0 AS MATERIALIZED (SELECT v FROM verts)",
    ]
    for k in range(1, R + 1):
        ctes.append(
            f"""le{k} AS (
  SELECT b.u, b.v FROM bidir b
  JOIN live{k - 1} lu ON lu.v = b.u
  JOIN live{k - 1} lv ON lv.v = b.v
),
nm{k} AS (
  SELECT v, hu, u FROM (
    SELECT e.u AS v, {h('e.v')} AS hu, e.v AS u,
           row_number() OVER (PARTITION BY e.u ORDER BY {h('e.v')}, e.v) AS rn
    FROM le{k} e
  ) WHERE rn = 1
),
m{k} AS MATERIALIZED (
  SELECT l.v, CAST({k} AS INT) AS mround
  FROM live{k - 1} l LEFT JOIN nm{k} n ON n.v = l.v
  WHERE n.v IS NULL OR ({h('l.v')}, l.v) < (n.hu, n.u)
),
live{k} AS MATERIALIZED (
  SELECT l.v FROM live{k - 1} l
  WHERE NOT EXISTS (SELECT 1 FROM m{k} m WHERE m.v = l.v)
    AND NOT EXISTS (SELECT 1 FROM bidir b JOIN m{k} m ON b.u = m.v
                    WHERE b.v = l.v)
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT v, mround FROM m{k}" for k in range(1, R + 1)
    )
    ctes.append(f"allm AS ({union})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v AS vertex, mround FROM allm
WHERE (SELECT count(*) FROM live{R}) = 0"""
    )


def _bm25_oracle_sql() -> str:
    """Okapi BM25 with the same ONE association order as the engine:
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)); per-term score
    (idf · tf·(k1+1)) / (tf + k1·(1 − b + b·dl/avgdl)); avgdl is an
    exact integer sum divided once. Query terms are tokenized at
    SQL-build time (whitespace queries — same split both engines)."""
    k1, b = BM25_K1, BM25_B
    qvals = ",\n    ".join(
        f"({qi}, '{t}')"
        for qi, q in enumerate(BM25_QUERIES)
        for t in sorted(set(q.split()))
    )
    return f"""WITH toks_full AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{_WS}'), t -> t != '') AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM toks_full),
tok AS (SELECT doc_id, unnest(toks) AS term FROM toks_full),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
         (SELECT sum(dl) FROM dl)::BIGINT AS sum_dl
),
qterms(query_id, term) AS (
  VALUES {qvals}
),
matched AS (
  SELECT q.query_id, tf.doc_id,
         ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (tf.tf * {k1 + 1.0!r})
           / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * d.dl
                / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS sterm
  FROM tf
  JOIN qterms q ON q.term = tf.term
  JOIN dfreq f ON f.term = tf.term
  JOIN dl d ON d.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, round(sum(sterm), 6) AS score_r
  FROM matched GROUP BY query_id, doc_id
)
SELECT query_id::BIGINT AS query_id, doc_id, score_r,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score_r DESC, doc_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {BM25_K}"""


def _directed_pagerank_oracle_sql() -> str:
    """Directed power iteration with dangling-mass redistribution,
    unrolled to DPR_ITERS chained CTEs over the order-chain digraph.
    Same association order as the engine: base + d·(inflow + dm/n)."""
    d = DPR_DAMPING
    ctes = [
        """dnxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS b
  FROM orders
)""",
        "dedges AS MATERIALIZED (SELECT DISTINCT a AS src, b AS dst FROM dnxt WHERE b IS NOT NULL)",
        """dverts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM dedges UNION ALL SELECT dst FROM dedges)
)""",
        "odeg AS MATERIALIZED (SELECT src AS v, count(*)::BIGINT AS odeg FROM dedges GROUP BY src)",
        "dn AS (SELECT count(*) AS cnt FROM dverts)",
        "dpr0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT cnt FROM dn) AS rank FROM dverts)",
    ]
    for i in range(1, DPR_ITERS + 1):
        ctes.append(
            f"""dang{i - 1} AS MATERIALIZED (
  SELECT coalesce(sum(p.rank), 0.0) AS dm
  FROM dpr{i - 1} p LEFT JOIN odeg o ON o.v = p.v
  WHERE o.v IS NULL
),
dpr{i} AS MATERIALIZED (
  SELECT dv.v,
         (1.0 - {d}) / (SELECT cnt FROM dn)
           + {d} * (coalesce(s.inflow, 0.0)
                    + (SELECT dm FROM dang{i - 1}) / (SELECT cnt FROM dn)) AS rank
  FROM dverts dv
  LEFT JOIN (
    SELECT e.dst AS v, sum(p.rank / o.odeg) AS inflow
    FROM dedges e
    JOIN dpr{i - 1} p ON e.src = p.v
    JOIN odeg o ON o.v = p.v
    GROUP BY e.dst
  ) s ON s.v = dv.v
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vertex, round(rank, {ROUND}) AS rank_r FROM dpr{DPR_ITERS}"
    )


def _anf_bits_oracle_sql() -> str:
    """Unrolled FM bitmask OR-propagation (operators/anf.py): init
    m_r(v) = 1 << min(trailing_zeros(hash56(v || ':' || r)), 55), per
    hop m_r(v) |= bit_or over neighbors; emit per (hop, trial) the
    integer total Σ_v lowest_zero_bit(m_r(v)). Every expression —
    hash56, trailing zeros via bit_count((x & -x) - 1), lowest zero
    bit via bit_count(((~x) & (x + 1)) - 1) — reads identically in
    Spark and DuckDB, so the gate is hash-exact with NO float."""
    R, K = ANF_TRIALS, ANF_HOPS
    h56 = (
        "('0x' || substr(md5(CAST(vertex AS VARCHAR) || ':{r}'), 1, 14))"
        "::BIGINT"
    )
    init_masks = ",\n    ".join(
        f"(1::BIGINT << least(bit_count((({h56.format(r=r)}) & "
        f"-({h56.format(r=r)})) - 1), 55))::BIGINT AS m{r}"
        for r in range(R)
    )
    ctes = [
        _CHAIN_CTES,
        """averts AS (SELECT DISTINCT u AS vertex FROM cbidir)""",
        f"""n0 AS MATERIALIZED (
  SELECT vertex,
    {init_masks}
  FROM averts
)""",
    ]
    ors = ", ".join(f"bit_or(s.m{r}) AS i{r}" for r in range(R))
    merged = ",\n    ".join(
        f"(v.m{r} | coalesce(i.i{r}, 0))::BIGINT AS m{r}" for r in range(R)
    )
    for k in range(1, K + 1):
        ctes.append(
            f"""n{k} AS MATERIALIZED (
  SELECT v.vertex,
    {merged}
  FROM n{k - 1} v LEFT JOIN (
    SELECT p.v AS vertex, {ors}
    FROM cbidir p JOIN n{k - 1} s ON s.vertex = p.u
    GROUP BY p.v
  ) i ON i.vertex = v.vertex
)"""
        )
    legs = [
        f"SELECT {k} AS hop, {r} AS trial, "
        f"sum(bit_count(((~m{r}) & (m{r} + 1)) - 1))::BIGINT AS total_bits "
        f"FROM n{k}"
        for k in range(K + 1)
        for r in range(R)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(legs)


def _truss_numbers_oracle_sql() -> str:
    """Unrolled local h-index support iteration (init θ = support; per
    round the H-index over each edge's triangles of min(θ₁, θ₂) of the
    triangle's other two edges), fixpoint-guarded. The triangle→edge
    incidence is enumerated once (the same oriented join as _TRI_CTE)
    and MATERIALIZED; trussness = θ + 2 at the fixpoint."""
    R = TRUSS_UNROLL
    ctes = [
        _EDGES_CTE,
        _TRI_CTE.replace("tri AS (", "tri AS MATERIALIZED ("),
        """inc AS MATERIALIZED (
  SELECT a AS su, b AS du, a AS s1, c AS d1, b AS s2, c AS d2 FROM tri
  UNION ALL
  SELECT a, c, a, b, b, c FROM tri
  UNION ALL
  SELECT b, c, a, b, a, c FROM tri
)""",
        """th0 AS MATERIALIZED (
  SELECT e.src, e.dst, coalesce(s.n, 0)::BIGINT AS t
  FROM edges e LEFT JOIN (
    SELECT su, du, count(*)::BIGINT AS n FROM inc GROUP BY su, du
  ) s ON s.su = e.src AND s.du = e.dst
)""",
    ]
    for i in range(1, R + 1):
        ctes.append(
            f"""th{i} AS MATERIALIZED (
  SELECT e.src, e.dst, coalesce(h.h, 0)::BIGINT AS t
  FROM edges e LEFT JOIN (
    SELECT su, du, max(least(rnk, val))::BIGINT AS h FROM (
      SELECT inc.su, inc.du, least(p1.t, p2.t) AS val,
             row_number() OVER (
               PARTITION BY inc.su, inc.du
               ORDER BY least(p1.t, p2.t) DESC, inc.s1, inc.d1
             ) AS rnk
      FROM inc
      JOIN th{i - 1} p1 ON p1.src = inc.s1 AND p1.dst = inc.d1
      JOIN th{i - 1} p2 ON p2.src = inc.s2 AND p2.dst = inc.d2
    ) GROUP BY su, du
  ) h ON h.su = e.src AND h.du = e.dst
)"""
        )
    guard = (
        f"tchg AS (SELECT count(*) AS c FROM th{R} a "
        f"JOIN th{R - 1} b ON a.src = b.src AND a.dst = b.dst AND a.t != b.t)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
{guard}
SELECT src, dst, t + 2 AS trussness FROM th{R}
WHERE (SELECT c FROM tchg) = 0"""
    )


def _bipartite_cc_oracle_sql() -> str:
    """Unrolled min-label propagation DIRECTLY over the bipartite
    (container, entity) incidence — an independent derivation that,
    like the engine, never materializes the quadratic projection.
    Standard loud fixpoint guard (0 rows if unconverged)."""
    R = BIPARTITE_CC_UNROLL
    off = BIPARTITE_OFFSET
    ctes = [
        f"""bpairs AS MATERIALIZED (
  SELECT DISTINCT l_orderkey + {off} AS c, l_partkey AS e FROM lineitem
)""",
        """bbidir AS MATERIALIZED (
  SELECT e AS u, c AS v FROM bpairs
  UNION ALL
  SELECT c AS u, e AS v FROM bpairs
)""",
        "bverts AS MATERIALIZED (SELECT DISTINCT u AS v FROM bbidir)",
        "bl0 AS MATERIALIZED (SELECT v, v AS l FROM bverts)",
    ]
    for i in range(1, R + 1):
        ctes.append(
            f"""bl{i} AS MATERIALIZED (
  SELECT t.v AS v, least(t.l, coalesce(m.ml, t.l)) AS l
  FROM bl{i - 1} t
  LEFT JOIN (
    SELECT b.v AS v, min(p.l) AS ml
    FROM bbidir b JOIN bl{i - 1} p ON p.v = b.u
    GROUP BY b.v
  ) m ON m.v = t.v
)"""
        )
    guard = (
        f"bchg AS (SELECT count(*) AS c FROM bl{R} a "
        f"JOIN bl{R - 1} b ON a.v = b.v AND a.l != b.l)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
{guard}
SELECT v AS entity, l AS component FROM bl{R}
WHERE v < {off} AND (SELECT c FROM bchg) = 0"""
    )


def _coreness_oracle_sql() -> str:
    """Unrolled h-index fixpoint (init h = degree; per round the
    H-index of each vertex's neighbor h values via one rank window +
    one max(least(rank, h)) agg — all-integer), with the standard
    loud fixpoint guard: zero rows if the last two tables differ."""
    R = CORENESS_UNROLL
    ctes = [
        _EDGES_CTE,
        "h0 AS MATERIALIZED (SELECT v, degree::BIGINT AS h FROM deg)",
    ]
    for i in range(1, R + 1):
        ctes.append(
            f"""h{i} AS MATERIALIZED (
  SELECT v, max(least(rnk, h))::BIGINT AS h FROM (
    SELECT b.v AS v, p.h AS h,
           row_number() OVER (PARTITION BY b.v ORDER BY p.h DESC, b.u ASC) AS rnk
    FROM bidir b JOIN h{i - 1} p ON p.v = b.u
  ) GROUP BY v
)"""
        )
    guard = (
        f"chg AS (SELECT count(*) AS c FROM h{R} a "
        f"JOIN h{R - 1} b ON a.v = b.v AND a.h != b.h)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
{guard}
SELECT v AS vertex, h AS coreness FROM h{R}
WHERE (SELECT c FROM chg) = 0"""
    )


def _densest_oracle_sql() -> str:
    """Unrolled (1+ε) greedy peel: per round, the edge/vertex counts
    (density as a correctly-rounded DOUBLE division of the same
    integers the engine divides), the over-threshold survivor filter,
    and the semi-join edge shrink; then the ledger argmax (max density,
    ties to the earliest round) selects whose vertex set to emit. Loud
    guard: the peel must have emptied within the unroll."""
    R = DENSEST_UNROLL
    factor = repr(2.0 * (1.0 + DENSEST_EPS))
    ctes = [_EDGES_CTE, "e0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for k in range(R + 1):
        ctes.append(
            f"""v{k} AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e{k} UNION ALL SELECT dst FROM e{k})
),
s{k} AS (
  SELECT (SELECT count(*) FROM e{k})::BIGINT AS ecnt,
         (SELECT count(*) FROM v{k})::BIGINT AS vcnt
)"""
        )
        if k == R:
            break
        ctes.append(
            f"""keep{k} AS (
  SELECT v FROM (
    SELECT u AS v, count(*)::BIGINT AS degree FROM (
      SELECT src AS u FROM e{k} UNION ALL SELECT dst AS u FROM e{k})
    GROUP BY u
  )
  WHERE degree > {factor} * (SELECT CAST(ecnt AS DOUBLE) / vcnt FROM s{k} WHERE ecnt > 0)
),
e{k + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{k} e
  JOIN keep{k} ks ON ks.v = e.src
  JOIN keep{k} kd ON kd.v = e.dst
)"""
        )
    ledger = "\nUNION ALL\n".join(
        f"SELECT {k} AS r, CASE WHEN ecnt > 0 THEN CAST(ecnt AS DOUBLE) / vcnt END AS d FROM s{k}"
        for k in range(R + 1)
    )
    allv = "\nUNION ALL\n".join(
        f"SELECT {k} AS r, v FROM v{k}" for k in range(R + 1)
    )
    ctes.append(f"ledger AS ({ledger})")
    ctes.append(
        "winner AS (SELECT r FROM ledger WHERE d IS NOT NULL "
        "ORDER BY d DESC, r ASC LIMIT 1)"
    )
    ctes.append(f"allv AS ({allv})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v AS vertex FROM allv
WHERE r = (SELECT r FROM winner)
  AND (SELECT ecnt FROM s{R}) = 0"""
    )


def _coloring_oracle_sql() -> str:
    """Unrolled Jones–Plassmann over the order-chain graph: per round,
    the min live-neighbor rank window, the local-minimum winner test,
    the colored-neighbor color list, and the smallest-missing-color
    pick (list_filter over range(0, |used|+1) — bounded by the used
    set, as in the engine). Loud final-live guard."""
    R = COLORING_UNROLL

    def h(col: str) -> str:
        return f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 14))::BIGINT"

    ctes = [
        _CHAIN_CTES,
        """cverts AS (SELECT DISTINCT v FROM (
  SELECT src AS v FROM chain_edges UNION ALL SELECT dst FROM chain_edges))""",
        "live0 AS MATERIALIZED (SELECT v FROM cverts)",
        "colored0 AS (SELECT CAST(NULL AS BIGINT) AS v, CAST(NULL AS INT) AS color WHERE 1=0)",
    ]
    for k in range(1, R + 1):
        ctes.append(
            f"""nm{k} AS (
  SELECT v, hu, u FROM (
    SELECT b.u AS v, {h('b.v')} AS hu, b.v AS u,
           row_number() OVER (PARTITION BY b.u ORDER BY {h('b.v')}, b.v) AS rn
    FROM cbidir b
    JOIN live{k - 1} lu ON lu.v = b.u
    JOIN live{k - 1} lv ON lv.v = b.v
  ) WHERE rn = 1
),
w{k} AS MATERIALIZED (
  SELECT l.v FROM live{k - 1} l LEFT JOIN nm{k} n ON n.v = l.v
  WHERE n.v IS NULL OR ({h('l.v')}, l.v) < (n.hu, n.u)
),
used{k} AS (
  SELECT b.u AS v, list(DISTINCT c.color) AS used
  FROM cbidir b
  JOIN w{k} w ON w.v = b.u
  JOIN colored{k - 1} c ON c.v = b.v
  GROUP BY b.u
),
newc{k} AS (
  SELECT w.v,
         CAST(list_min(list_filter(
           range(0, 1 + len(coalesce(u.used, []))),
           x -> NOT list_contains(coalesce(u.used, []), x)
         )) AS INT) AS color
  FROM w{k} w LEFT JOIN used{k} u ON u.v = w.v
),
colored{k} AS MATERIALIZED (
  SELECT v, color FROM colored{k - 1} UNION ALL SELECT v, color FROM newc{k}
),
live{k} AS MATERIALIZED (
  SELECT l.v FROM live{k - 1} l
  WHERE NOT EXISTS (SELECT 1 FROM w{k} w WHERE w.v = l.v)
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v AS vertex, color FROM colored{R}
WHERE (SELECT count(*) FROM live{R}) = 0"""
    )


def _eigenvector_oracle_sql() -> str:
    """Unnormalized power iteration unrolled EV_ITERS times: every
    iterate is an integer below 2^53, so the doubles are exact in both
    engines; one final L1 division, rounded to 6 dp."""
    ctes = [
        _EDGES_CTE,
        "x0 AS (SELECT v, CAST(1 AS DOUBLE) AS x FROM verts)",
    ]
    for k in range(1, EV_ITERS + 1):
        ctes.append(
            f"""x{k} AS (
  SELECT b.v AS v, sum(p.x) AS x FROM bidir b JOIN x{k - 1} p ON b.u = p.v
  GROUP BY b.v
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v AS vertex, x AS walks,
       round(x / (SELECT sum(x) FROM x{EV_ITERS}), {ROUND}) AS score_r
FROM x{EV_ITERS}"""
    )


def _bowtie_oracle_sql() -> str:
    """INDEPENDENT closed form of the Broder census on the bowtie gate
    graph (sources/edges.py:order_bowtie_digraph): per cycle customer
    the chain positions head+1..n-tail are the SCC, 1..head the IN
    path, n-tail+1..n the OUT path; the largest such cycle (ties to
    the smallest member orderkey — the engine's (size, min-id) SCC
    tie-break) is the CORE; every other chain is its own weak
    component, hence DISCONNECTED. Row_number + count windows only —
    the oracle never replays any iteration."""
    mc, h, t = SCC_MIN_CYCLE, BOWTIE_HEAD, BOWTIE_TAIL
    return f"""WITH rn AS (
  SELECT CAST(o_orderkey AS BIGINT) AS v, o_custkey AS c,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS p,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
),
verts AS (SELECT * FROM rn WHERE n >= 2),
core_members AS (
  SELECT c, v FROM verts WHERE n >= {mc} AND p > {h} AND p <= n - {t}
),
giant AS (
  SELECT c FROM core_members GROUP BY c
  ORDER BY count(*) DESC, min(v) ASC LIMIT 1
)
SELECT e.v AS vertex,
  CASE WHEN e.c IN (SELECT c FROM giant) THEN
     CASE WHEN e.p <= {h} THEN 'IN'
          WHEN e.p > e.n - {t} THEN 'OUT'
          ELSE 'CORE' END
  ELSE 'DISCONNECTED' END AS region
FROM verts e"""


def _katz_oracle_sql() -> str:
    """Unrolled K-step attenuated walk sum (operators/eigenvector.py:
    katz_centrality): integer walk iterates below 2^53, α^k as the
    engine's own Python double literals, and the score chain written
    left-to-right — ``x1*a1 + x2*a2 + …`` parses with exactly the
    engine's acc_k = acc_{k-1} + x_k·α^k association — so the doubles
    are bit-identical before the 6-dp round."""
    ctes = [
        _EDGES_CTE,
        "k0 AS (SELECT v, CAST(1 AS DOUBLE) AS x FROM verts)",
    ]
    for k in range(1, KATZ_ITERS + 1):
        ctes.append(
            f"""k{k} AS (
  SELECT b.v AS v, sum(p.x) AS x FROM bidir b JOIN k{k - 1} p ON b.u = p.v
  GROUP BY b.v
)"""
        )
    chain = " + ".join(
        f"k{k}.x * {alpha_lit!r}"
        for k, alpha_lit in (
            (k, KATZ_ALPHA**k) for k in range(1, KATZ_ITERS + 1)
        )
    )
    joins = " ".join(
        f"JOIN k{k} ON k{k}.v = k1.v" for k in range(2, KATZ_ITERS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT k1.v AS vertex, k{KATZ_ITERS}.x AS walks,
       round({chain}, {ROUND}) AS score_r
FROM k1 {joins}"""
    )


def _rich_club_oracle_sql() -> str:
    """Suffix sums over the vertex-degree and per-edge-min-degree
    histograms; φ(k) NULL below |R_k| = 2, exactly as the engine."""
    ks = ", ".join(f"({k})" for k in sorted(set(RICH_CLUB_KS)))
    return f"""WITH {_EDGES_CTE},
eh AS (
  SELECT least(du.degree, dv.degree) AS m, count(*)::BIGINT AS cnt
  FROM edges e JOIN deg du ON du.v = e.src JOIN deg dv ON dv.v = e.dst
  GROUP BY 1
),
vh AS (SELECT degree, count(*)::BIGINT AS n FROM deg GROUP BY 1),
ks(k) AS (VALUES {ks}),
nr AS (SELECT k, sum(n)::BIGINT AS n_rich FROM ks JOIN vh ON vh.degree > ks.k GROUP BY k),
er AS (SELECT k, sum(cnt)::BIGINT AS e_rich FROM ks JOIN eh ON eh.m > ks.k GROUP BY k)
SELECT CAST(ks.k AS BIGINT) AS k,
       coalesce(n_rich, 0) AS n_rich,
       coalesce(e_rich, 0) AS e_rich,
       CASE WHEN coalesce(n_rich, 0) >= 2
            THEN round(2.0 * coalesce(e_rich, 0) / (n_rich * (n_rich - 1)), {ROUND})
       END AS phi_r
FROM ks LEFT JOIN nr ON nr.k = ks.k LEFT JOIN er ON er.k = ks.k"""


_CHAIN_CTES = """nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS b
  FROM orders
),
chain_edges AS (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
  FROM nxt WHERE b IS NOT NULL AND a != b
),
cbidir AS (
  SELECT src AS u, dst AS v FROM chain_edges
  UNION ALL
  SELECT dst AS u, src AS v FROM chain_edges
)""".strip()


def _diameter_oracle_sql() -> str:
    """Double sweep unrolled as two recursive BFS CTEs; the second seed
    is the argmax (dist desc, id asc) of the first sweep."""
    H = DIAMETER_MAX_HOPS
    return f"""WITH RECURSIVE {_CHAIN_CTES},
start AS (SELECT min(u) AS v FROM cbidir),
b1(vertex, d) AS (
  SELECT v, 0 FROM start
  UNION
  SELECT b.v, b1.d + 1 FROM b1 JOIN cbidir b ON b.u = b1.vertex
  WHERE b1.d < {H}
),
m1 AS (SELECT vertex, min(d) AS dist FROM b1 GROUP BY vertex),
far AS (SELECT vertex FROM m1 ORDER BY dist DESC, vertex LIMIT 1),
b2(vertex, d) AS (
  SELECT vertex, 0 FROM far
  UNION
  SELECT b.v, b2.d + 1 FROM b2 JOIN cbidir b ON b.u = b2.vertex
  WHERE b2.d < {H}
),
m2 AS (SELECT vertex, min(d) AS dist FROM b2 GROUP BY vertex)
SELECT (SELECT v FROM start) AS start_vertex,
       (SELECT vertex FROM far) AS far_vertex,
       max(dist) AS diameter_lb
FROM m2"""


def _graphlet_census_oracle_sql() -> str:
    """All eight 3-/4-node classes from the same closed forms as
    operators/graphlets.py (inversion constants brute-force-verified by
    tests/test_graphlets.py); squares and k4 inlined from their own
    gated oracles, sharing the edges/tri CTEs."""
    tri_mat = _TRI_CTE.replace("tri AS (", "tri AS MATERIALIZED (")
    edges_mat = _EDGES_CTE.replace("edges AS (", "edges AS MATERIALIZED (")
    return f"""WITH {edges_mat},
{tri_mat},
wp AS (
  SELECT b1.v AS u, b2.v AS w, count(*) AS codeg
  FROM bidir b1 JOIN bidir b2 ON b1.u = b2.u AND b1.v < b2.v
  GROUP BY b1.v, b2.v
),
corners AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
tv AS (SELECT v, count(*) AS n FROM corners GROUP BY v),
einc AS (
  SELECT a AS u, b AS v FROM tri
  UNION ALL SELECT a, c FROM tri
  UNION ALL SELECT b, c FROM tri
),
esup AS (SELECT u, v, count(*) AS sup FROM einc GROUP BY u, v),
base AS MATERIALIZED (
  SELECT
    coalesce((SELECT sum(degree * (degree - 1) // 2) FROM deg), 0)::BIGINT AS w,
    coalesce((SELECT sum(degree * (degree - 1) * (degree - 2) // 6) FROM deg),
             0)::BIGINT AS claw,
    (SELECT count(*) FROM tri)::BIGINT AS t,
    coalesce((SELECT sum((du.degree - 1) * (dv.degree - 1)) FROM edges e
              JOIN deg du ON du.v = e.src
              JOIN deg dv ON dv.v = e.dst), 0)::BIGINT AS p4raw,
    coalesce((SELECT sum(tv.n * (d.degree - 2))
              FROM tv JOIN deg d ON d.v = tv.v), 0)::BIGINT AS paw,
    coalesce((SELECT sum(sup * (sup - 1) // 2) FROM esup), 0)::BIGINT AS dia,
    coalesce((SELECT sum(codeg * (codeg - 1) // 2) // 2 FROM wp),
             0)::BIGINT AS c4,
    (SELECT count(*) FROM tri t
     JOIN edges e1 ON e1.src = t.c
     JOIN edges e2 ON e2.src = t.b AND e2.dst = e1.dst
     JOIN edges e3 ON e3.src = t.a AND e3.dst = e1.dst)::BIGINT AS k4
),
b2 AS MATERIALIZED (
  SELECT w, claw, t, (p4raw - 3 * t) AS p4, paw, dia, c4, k4 FROM base
)
SELECT 'wedge' AS graphlet, w AS n_subgraphs, (w - 3 * t) AS n_induced FROM b2
UNION ALL SELECT 'triangle', t, t FROM b2
UNION ALL SELECT 'claw', claw, claw - paw + 2 * dia - 4 * k4 FROM b2
UNION ALL SELECT 'p4', p4, p4 - 2 * paw - 4 * c4 + 6 * dia - 12 * k4 FROM b2
UNION ALL SELECT 'paw', paw, paw - 4 * dia + 12 * k4 FROM b2
UNION ALL SELECT 'c4', c4, c4 - dia + 3 * k4 FROM b2
UNION ALL SELECT 'diamond', dia, dia - 6 * k4 FROM b2
UNION ALL SELECT 'k4', k4, k4 FROM b2"""


def _simrank_oracle_sql() -> str:
    """Unrolled synchronous SimRank (operators/simrank.py) on the
    induced top-SIMRANK_CORE core: s0 = identity; each round the
    wedge-pair join s_k(i,j) × N⁻¹ fan-out, summed per (a, b) and
    scaled by C/(d_a·d_b); diagonal re-pinned to 1. Final values
    6-dp-rounded (the iterative-gate float contract)."""
    from paralleltrianglecounting_spark.operators.simrank import (
        SIMRANK_C,
        SIMRANK_CORE,
        SIMRANK_ITERS,
    )

    ctes = [
        _EDGES_CTE,
        f"""core AS MATERIALIZED (
  SELECT v FROM deg ORDER BY degree DESC, v ASC LIMIT {SIMRANK_CORE}
)""",
        """cadj AS MATERIALIZED (
  SELECT b.u AS src, b.v AS dst
  FROM bidir b JOIN core c1 ON c1.v = b.u JOIN core c2 ON c2.v = b.v
)""",
        "cdeg AS (SELECT src, count(*) AS d FROM cadj GROUP BY src)",
        "s0 AS (SELECT src AS i, src AS j, 1.0 AS s FROM cdeg)",
    ]
    for k in range(1, SIMRANK_ITERS + 1):
        ctes.append(
            f"""s{k} AS MATERIALIZED (
  SELECT nx.i, nx.j, {SIMRANK_C} * nx.t / (da.d * db.d) AS s
  FROM (
    SELECT a.src AS i, b.src AS j, sum(p.s) AS t
    FROM s{k - 1} p
    JOIN cadj a ON a.dst = p.i
    JOIN cadj b ON b.dst = p.j
    WHERE a.src != b.src
    GROUP BY a.src, b.src
  ) nx
  JOIN cdeg da ON da.src = nx.i
  JOIN cdeg db ON db.src = nx.j
  UNION ALL
  SELECT src, src, 1.0 FROM cdeg
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT i AS a, j AS b, round(s, 6) AS sim_r FROM s{SIMRANK_ITERS}
WHERE i < j AND round(s, 6) >= 0.000001"""
    )


def _ann_recall_oracle_sql(oracles: dict[str, str]) -> str:
    """Compose the recall@k audit from the three index oracles already
    in the contract (each a standalone WITH query — DuckDB accepts a
    WITH inside a parenthesized subquery), so truth set and candidate
    sets are BY CONSTRUCTION the same SQL the per-index gates verify."""
    exact, lsh, ivf = (
        oracles["cosine_topk"],
        oracles["lsh_ann_topk"],
        oracles["ivf_ann_topk"],
    )
    return f"""WITH x AS (SELECT query_id, neighbor_id FROM ({exact})),
l AS (SELECT query_id, neighbor_id FROM ({lsh})),
i AS (SELECT query_id, neighbor_id FROM ({ivf})),
base AS (SELECT query_id, count(*)::BIGINT AS n_exact FROM x GROUP BY query_id),
lh AS (SELECT x.query_id, count(*)::BIGINT AS n FROM x
       JOIN l ON l.query_id = x.query_id AND l.neighbor_id = x.neighbor_id
       GROUP BY x.query_id),
ih AS (SELECT x.query_id, count(*)::BIGINT AS n FROM x
       JOIN i ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
       GROUP BY x.query_id)
SELECT b.query_id, b.n_exact,
       coalesce(lh.n, 0)::BIGINT AS n_lsh_hits,
       coalesce(ih.n, 0)::BIGINT AS n_ivf_hits
FROM base b
LEFT JOIN lh ON lh.query_id = b.query_id
LEFT JOIN ih ON ih.query_id = b.query_id"""


def _rrf_oracle_sql(oracles: dict[str, str]) -> str:
    """Compose RRF from the two retriever oracles already in the
    contract (the _ann_recall_oracle_sql pattern): the fused lists are
    BY CONSTRUCTION the same SQL the per-index gates verify. Terms are
    added LSH-first to match the engine's association order."""
    lsh, ivf = oracles["lsh_ann_topk"], oracles["ivf_ann_topk"]
    return f"""WITH l AS (SELECT query_id, neighbor_id, rank FROM ({lsh})),
i AS (SELECT query_id, neighbor_id, rank FROM ({ivf})),
f AS (
  SELECT coalesce(l.query_id, i.query_id) AS query_id,
         coalesce(l.neighbor_id, i.neighbor_id) AS neighbor_id,
         round(coalesce(1.0 / ({RRF_K} + l.rank), 0.0)
               + coalesce(1.0 / ({RRF_K} + i.rank), 0.0), 6) AS rrf_r
  FROM l FULL OUTER JOIN i
    ON l.query_id = i.query_id AND l.neighbor_id = i.neighbor_id
)
SELECT query_id, neighbor_id, rrf_r,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_r DESC, neighbor_id) AS INT) AS rank
FROM f
QUALIFY rank <= 5"""


def oracle_sql() -> dict[str, str]:
    tri_sql = (
        f"WITH {_EDGES_CTE},\n{_TRI_CTE}\nSELECT count(*) AS triangles FROM tri"
    )
    out = {
        "edges_part_graph": f"WITH {_EDGES_CTE}\nSELECT src, dst FROM edges",
        "degrees": f"WITH {_EDGES_CTE}\nSELECT v AS vertex, degree FROM deg",
        # the stream must converge to exactly the batch answer
        "degrees_stream": f"WITH {_EDGES_CTE}\nSELECT v AS vertex, degree FROM deg",
        # density = 2|E| / (|V|(|V|-1)); avg/density derive from the
        # same degree pass, association order matched to the engine
        "graph_summary": f"""WITH {_EDGES_CTE}
SELECT count(*)::BIGINT AS n_vertices,
       (sum(degree) / 2)::BIGINT AS n_edges,
       min(degree)::BIGINT AS min_degree,
       max(degree)::BIGINT AS max_degree,
       round(sum(degree)::DOUBLE / count(*), 6) AS avg_degree_r,
       round(sum(degree)::DOUBLE / (count(*) * (count(*) - 1)), 6) AS density_r
FROM deg""",
        "triangle_count": tri_sql,
        "triangle_count_stream": tri_sql,
        "triangle_count_csr": tri_sql,
        "triangle_count_wedge": tri_sql,
        "triangle_count_auto": tri_sql,
        "triangle_count_resumable": tri_sql,
        "triangles_per_vertex": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
corners AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
per_v AS (SELECT v, count(*) AS cnt FROM corners GROUP BY v)
SELECT verts.v AS vertex, coalesce(per_v.cnt, 0) AS triangles
FROM verts LEFT JOIN per_v ON verts.v = per_v.v""",
        "clustering_coefficient": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
corners AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
per_v AS (SELECT v, count(*) AS cnt FROM corners GROUP BY v)
SELECT deg.v AS vertex,
       round(CASE WHEN deg.degree >= 2
             THEN 2.0 * coalesce(per_v.cnt, 0) / (deg.degree * (deg.degree - 1))
             ELSE 0.0 END, {ROUND}) AS coeff_r
FROM deg LEFT JOIN per_v ON deg.v = per_v.v""",
        "wedge_count": f"""WITH {_EDGES_CTE}
SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS wedges FROM deg""",
        "connected_components": f"""WITH RECURSIVE {_EDGES_CTE},
cc(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT b.v, cc.l FROM cc JOIN bidir b ON b.u = cc.v WHERE cc.l < b.v
)
SELECT v AS vertex, min(l) AS component FROM cc GROUP BY v""",
        # the maintained streaming labels must converge to exactly the
        # batch answer
        "connected_components_stream": f"""WITH RECURSIVE {_EDGES_CTE},
cc(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT b.v, cc.l FROM cc JOIN bidir b ON b.u = cc.v WHERE cc.l < b.v
)
SELECT v AS vertex, min(l) AS component FROM cc GROUP BY v""",
        "component_sizes": f"""WITH RECURSIVE {_EDGES_CTE},
cc(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT b.v, cc.l FROM cc JOIN bidir b ON b.u = cc.v WHERE cc.l < b.v
),
lbl AS (SELECT v, min(l) AS component FROM cc GROUP BY v)
SELECT component, count(*) AS n_vertices FROM lbl GROUP BY component""",
        "edges_weighted_part_graph": f"WITH {_WEDGES_CTE}\nSELECT src, dst, weight FROM wedges",
        "pagerank": _pagerank_oracle_sql(),
        "weighted_pagerank": _weighted_pagerank_oracle_sql(),
        "sssp": _sssp_oracle_sql(),
        "diameter_estimate": _diameter_oracle_sql(),
        "ego_net": f"""WITH RECURSIVE {_EDGES_CTE},
seeds AS (SELECT v AS vertex FROM verts ORDER BY v LIMIT {EGO_SEEDS}),
bfs(vertex, d) AS (
  SELECT vertex, 0 FROM seeds
  UNION
  SELECT b.v, bfs.d + 1 FROM bfs JOIN bidir b ON b.u = bfs.vertex
  WHERE bfs.d < {EGO_HOPS}
),
ball AS (SELECT DISTINCT vertex FROM bfs)
SELECT e.src, e.dst FROM edges e
WHERE EXISTS (SELECT 1 FROM ball WHERE ball.vertex = e.src)
  AND EXISTS (SELECT 1 FROM ball WHERE ball.vertex = e.dst)""",
        "pagerank_salted": _pagerank_oracle_sql(),
        "personalized_pagerank": _ppr_oracle_sql(),
        "spam_mass": _spam_mass_oracle_sql(),
        "personalized_pagerank_salted": _ppr_oracle_sql(),
        "k_core": _kcore_oracle_sql(),
        "s_core": _score_oracle_sql(),
        "k_truss": _ktruss_oracle_sql(),
        "approx_triangle_count": f"""WITH {_EDGES_CTE},
se AS MATERIALIZED (
  SELECT src, dst FROM edges
  WHERE (('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 14))::BIGINT % {APPROX_TRI_DEN}) < {APPROX_TRI_NUM}
),
stri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM se e1
  JOIN se e2 ON e1.dst = e2.src
  JOIN se e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT (SELECT count(*) FROM stri) AS sample_triangles,
       (SELECT count(*) FROM se) AS sampled_edges,
       round(((SELECT count(*) FROM stri)
             * {float(APPROX_TRI_DEN) ** 3 / float(APPROX_TRI_NUM) ** 3})::DOUBLE, 4)
         AS triangles_est""",
        "bfs_distances": f"""WITH RECURSIVE {_EDGES_CTE},
seeds AS (SELECT v AS vertex FROM verts ORDER BY v LIMIT {BFS_SEEDS}),
bfs(vertex, d) AS (
  SELECT vertex, 0 FROM seeds
  UNION
  SELECT b.v, bfs.d + 1
  FROM bfs JOIN bidir b ON b.u = bfs.vertex
  WHERE bfs.d < {BFS_MAX_HOPS}
)
SELECT vertex, min(d) AS dist FROM bfs GROUP BY vertex""",
        "bfs_distances_deep": f"""WITH RECURSIVE nxt AS (
  SELECT o_orderkey AS a,
         lead(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS b
  FROM orders
),
chain_edges AS (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
  FROM nxt WHERE b IS NOT NULL AND a != b
),
cbidir AS (
  SELECT src AS u, dst AS v FROM chain_edges
  UNION ALL
  SELECT dst AS u, src AS v FROM chain_edges
),
cverts AS (SELECT DISTINCT u AS v FROM cbidir),
seeds AS (SELECT v AS vertex FROM cverts ORDER BY v LIMIT {BFS_DEEP_SEEDS}),
bfs(vertex, d) AS (
  SELECT vertex, 0 FROM seeds
  UNION
  SELECT b.v, bfs.d + 1
  FROM bfs JOIN cbidir b ON b.u = bfs.vertex
  WHERE bfs.d < {BFS_DEEP_MAX_HOPS}
)
SELECT vertex, min(d) AS dist FROM bfs GROUP BY vertex""",
        "degree_histogram": f"""WITH {_EDGES_CTE}
SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree""",
        "degree_assortativity": f"""WITH {_EDGES_CTE}
SELECT round(corr(du.degree, dv.degree), {ROUND}) AS assortativity_r
FROM bidir b
JOIN deg du ON du.v = b.u
JOIN deg dv ON dv.v = b.v""",
        "community_modularity": _modularity_oracle_sql(),
        "edge_jaccard": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
tri_edges AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
  UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
  UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
),
common AS (SELECT u, v, count(*) AS common FROM tri_edges GROUP BY u, v)
SELECT e.src, e.dst,
       coalesce(c.common, 0) AS common_neighbors,
       round(CASE WHEN du.degree + dv.degree - coalesce(c.common, 0) - 2 > 0
             THEN CAST(coalesce(c.common, 0) AS DOUBLE)
                  / (du.degree + dv.degree - coalesce(c.common, 0) - 2)
             ELSE 0.0 END, {ROUND}) AS jaccard_r
FROM edges e
LEFT JOIN common c ON c.u = e.src AND c.v = e.dst
JOIN deg du ON du.v = e.src
JOIN deg dv ON dv.v = e.dst""",
        "square_count": f"""WITH {_EDGES_CTE},
wp AS (
  SELECT b1.v AS u, b2.v AS w, count(*) AS codeg
  FROM bidir b1 JOIN bidir b2 ON b1.u = b2.u AND b1.v < b2.v
  GROUP BY b1.v, b2.v
)
SELECT CAST(sum(codeg * (codeg - 1) // 2) // 2 AS BIGINT) AS squares FROM wp""",
        # each K4 {a<b<c<d} counted once: its id-lowest triangle (a,b,c)
        # from tri, the 4th corner d via the three edges (a,d),(b,d),(c,d)
        # — src<dst in the canonical edge table enforces d > c > b > a
        "k4_count": f"""WITH {_EDGES_CTE},
{_TRI_CTE}
SELECT count(*)::BIGINT AS k4_count
FROM tri t
JOIN edges e1 ON e1.src = t.c
JOIN edges e2 ON e2.src = t.b AND e2.dst = e1.dst
JOIN edges e3 ON e3.src = t.a AND e3.dst = e1.dst""",
        "link_prediction": f"""WITH {_EDGES_CTE},
wp AS (
  SELECT b1.v AS u, b2.v AS v, count(*) AS cn, sum(1.0 / ln(dz.degree)) AS aa
  FROM bidir b1
  JOIN bidir b2 ON b1.u = b2.u AND b1.v < b2.v
  JOIN deg dz ON dz.v = b1.u
  GROUP BY b1.v, b2.v
),
ne AS (
  SELECT * FROM wp
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wp.u AND e.dst = wp.v)
)
SELECT ne.u, ne.v,
       CAST(cn AS BIGINT) AS common_neighbors,
       round(aa, {ROUND}) AS adamic_adar_r,
       CAST(du.degree * dv.degree AS BIGINT) AS pref_attach
FROM ne JOIN deg du ON du.v = ne.u JOIN deg dv ON dv.v = ne.v
ORDER BY adamic_adar_r DESC, ne.u, ne.v
LIMIT {LINKPRED_K}""",
        # Jaccard variant: same wedge-pair candidates; for a NON-edge
        # the union is deg(u)+deg(v)-cn exactly (no -2 self-correction)
        "link_prediction_jaccard": f"""WITH {_EDGES_CTE},
wp AS (
  SELECT b1.v AS u, b2.v AS v, count(*) AS cn
  FROM bidir b1
  JOIN bidir b2 ON b1.u = b2.u AND b1.v < b2.v
  GROUP BY b1.v, b2.v
),
ne AS (
  SELECT * FROM wp
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wp.u AND e.dst = wp.v)
)
SELECT ne.u, ne.v,
       CAST(cn AS BIGINT) AS common_neighbors,
       round(cn / (du.degree + dv.degree - cn), {ROUND}) AS jaccard_r
FROM ne JOIN deg du ON du.v = ne.u JOIN deg dv ON dv.v = ne.v
ORDER BY jaccard_r DESC, ne.u, ne.v
LIMIT {LINKPRED_K}""",
        "hits": _hits_oracle_sql(),
        "salsa": _salsa_oracle_sql(),
        "co_citation": _cocitation_oracle_sql("src", "dst"),
        "bibliographic_coupling": _cocitation_oracle_sql("dst", "src"),
        "triad_census": _triad_census_oracle_sql(),
        "dyad_census": _dyad_census_oracle_sql(),
        "full_triad_census": _full_triad_census_oracle_sql(),
        "winnow_fingerprints": _winnow_oracle_sql(),
        "winnow_dup_clusters": _winnow_clusters_oracle_sql(),
        "item_cosine": _item_cosine_oracle_sql(),
        "oov_rate": _oov_oracle_sql(),
        # duplicated n-gram spans (Lee et al. 2022): a window is
        # duplicated iff its n-gram occurs in >= 2 distinct docs; rows
        # per gram in dgc = distinct docs by construction
        "dup_ngram_spans": f"""WITH {_TOKS_CTE},
dg AS (
  SELECT doc_id,
         ('0x' || substr(md5(array_to_string(
              list_slice(toks, i, i + {DUP_SPAN_N} - 1), ' ')), 1, 14))::BIGINT AS gh
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {DUP_SPAN_N} + 2)) AS i
        FROM toks_t WHERE len(toks) >= {DUP_SPAN_N})
),
dgc AS (SELECT doc_id, gh, count(*)::BIGINT AS c FROM dg GROUP BY doc_id, gh),
ddup AS (SELECT gh FROM dgc GROUP BY gh HAVING count(*) >= 2),
dper AS (
  SELECT dgc.doc_id,
         sum(c)::BIGINT AS n_windows,
         sum(CASE WHEN d.gh IS NOT NULL THEN c ELSE 0 END)::BIGINT AS n_dup_windows
  FROM dgc LEFT JOIN ddup d ON dgc.gh = d.gh
  GROUP BY dgc.doc_id
)
SELECT doc.doc_id,
       coalesce(p.n_windows, 0)::BIGINT AS n_windows,
       coalesce(p.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       CASE WHEN coalesce(p.n_windows, 0) > 0
            THEN round(p.n_dup_windows::DOUBLE / p.n_windows, 6)
            ELSE 0.0 END AS dup_fraction_r
FROM documents doc LEFT JOIN dper p ON p.doc_id = doc.doc_id""",
        # gaps-and-islands over duplicated window positions: island id
        # = i - row_number(); a position has exactly ONE gram, so the
        # ddup join keeps each duplicated position once
        "dup_span_runs": f"""WITH {_TOKS_CTE},
dgp AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(array_to_string(
              list_slice(toks, i, i + {DUP_SPAN_N} - 1), ' ')), 1, 14))::BIGINT AS gh
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {DUP_SPAN_N} + 2)) AS i
        FROM toks_t WHERE len(toks) >= {DUP_SPAN_N})
),
dgd AS (SELECT DISTINCT doc_id, gh FROM dgp),
ddup AS (SELECT gh FROM dgd GROUP BY gh HAVING count(*) >= 2),
dpos AS (SELECT p.doc_id, p.i FROM dgp p JOIN ddup d USING (gh)),
isl AS (SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
        FROM dpos),
runs AS (SELECT doc_id, g, count(*)::BIGINT AS len FROM isl GROUP BY doc_id, g),
per AS (SELECT doc_id, count(*)::BIGINT AS n_runs,
               (max(len) + {DUP_SPAN_N} - 1)::BIGINT AS md
        FROM runs GROUP BY doc_id)
SELECT d.doc_id, coalesce(p.n_runs, 0)::BIGINT AS n_runs,
       coalesce(p.md, 0)::BIGINT AS max_dup_span_tokens
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id""",
        # CSN eq. 3.7 over the degree HISTOGRAM (few float terms)
        "powerlaw_alpha": f"""WITH {_EDGES_CTE},
ph AS (SELECT degree, count(*)::BIGINT AS n_vertices FROM deg GROUP BY degree),
pt AS (
  SELECT coalesce(sum(n_vertices), 0)::BIGINT AS n_tail,
         sum(n_vertices * ln(degree::DOUBLE / {POWERLAW_DMIN - 0.5})) AS s
  FROM ph WHERE degree >= {POWERLAW_DMIN}
)
SELECT {POWERLAW_DMIN}::BIGINT AS d_min, n_tail,
       CASE WHEN s > 0 THEN round(1.0 + n_tail / s, 6) END AS alpha_r
FROM pt""",
        # configuration-model E[T] = ((S2/S1)^3)/6 with the engine's
        # exact association: ((r*r)*r)/6
        "triangle_significance": f"""WITH {_EDGES_CTE},
{_TRI_CTE},
s AS (SELECT coalesce(sum(degree), 0)::BIGINT AS s1,
             coalesce(sum(degree * (degree - 1)), 0)::BIGINT AS s2 FROM deg),
t AS (SELECT count(*)::BIGINT AS triangles FROM tri)
SELECT t.triangles,
       CASE WHEN s.s1 > 0 THEN
         round((s.s2::DOUBLE / s.s1) * (s.s2::DOUBLE / s.s1)
               * (s.s2::DOUBLE / s.s1) / 6.0, 6) END AS expected_r,
       CASE WHEN s.s1 > 0 AND s.s2 > 0 THEN
         round(t.triangles / ((s.s2::DOUBLE / s.s1) * (s.s2::DOUBLE / s.s1)
               * (s.s2::DOUBLE / s.s1) / 6.0), 6) END AS ratio_r
FROM s, t""",
        "bigram_lm_scores": _bigram_lm_oracle_sql(),
        "retention_cohorts": _retention_oracle_sql(),
        "weighted_triangle_intensity": _weighted_intensity_oracle_sql(),
        "backbone_profile": _backbone_oracle_sql(),
        "neighborhood_2hop": f"""WITH {_EDGES_CTE},
reach AS (
  SELECT b1.u AS u, b2.v AS w
  FROM bidir b1 JOIN bidir b2 ON b1.v = b2.u
  UNION
  SELECT u, v AS w FROM bidir
)
SELECT u AS vertex, CAST(count(*) AS BIGINT) AS ball
FROM reach WHERE w != u GROUP BY u""",
        "label_propagation": _lpa_oracle_sql(),
        "random_walks": _walks_oracle_sql(),
        "biased_walks": _biased_walks_oracle_sql(),
        "betweenness": _betweenness_oracle_sql(),
        "harmonic_centrality": _harmonic_oracle_sql(),
        "closeness_centrality": _closeness_oracle_sql(),
        "seeded_lpa": _seeded_lpa_oracle_sql(),
        "maximal_matching": _matching_oracle_sql(),
        "coarsen_graph": _coarsen_oracle_sql(),
        "vertex_cover": _vertex_cover_oracle_sql(),
        "minimum_spanning_forest": _msf_oracle_sql(),
        "single_linkage_clusters": _single_linkage_oracle_sql(),
        "maximal_independent_set": _mis_oracle_sql(),
        "greedy_coloring": _coloring_oracle_sql(),
        "densest_subgraph": _densest_oracle_sql(),
        "directed_pagerank": _directed_pagerank_oracle_sql(),
        "core_numbers": _coreness_oracle_sql(),
        "bipartite_components": _bipartite_cc_oracle_sql(),
        "bowtie_structure": _bowtie_oracle_sql(),
        "truss_numbers": _truss_numbers_oracle_sql(),
        "anf_bits": _anf_bits_oracle_sql(),
        # SCC on the order-cycle digraph has an INDEPENDENT closed form
        # (sources/edges.py:order_cycle_digraph): a >= min_cycle chain
        # closes into one cycle => SCC id = the customer's min orderkey;
        # shorter chains are directed paths => every vertex a singleton.
        # The engine runs the general FW-BW coloring decomposition
        # (generic-digraph semantics pinned by the Tarjan-twin pytests);
        # the oracle never replays the iteration
        "scc": f"""WITH c AS (
  SELECT o_custkey, count(*) AS n, min(o_orderkey) AS mn
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey::BIGINT AS vertex,
       (CASE WHEN c.n >= {SCC_MIN_CYCLE} THEN c.mn
             ELSE o.o_orderkey END)::BIGINT AS scc
FROM orders o JOIN c ON c.o_custkey = o.o_custkey
WHERE c.n >= 2""",
        # condensation of the order-cycle digraph, closed form: cycle
        # customers (n >= min_cycle) collapse to ONE quotient vertex
        # whose internal edges all become dropped self-loops; path
        # customers keep every chain edge (each vertex its own SCC)
        "condensation": f"""WITH rn AS (
  SELECT o_orderkey AS k,
         lead(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS nk,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
SELECT k::BIGINT AS src_scc, nk::BIGINT AS dst_scc
FROM rn WHERE nk IS NOT NULL AND n < {SCC_MIN_CYCLE}""",
        "event_transitions": """WITH nxt AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS dst_type
  FROM events
)
SELECT src_type, dst_type, count(*)::BIGINT AS n
FROM nxt WHERE dst_type IS NOT NULL
GROUP BY src_type, dst_type""",
        # earliest-completion ordered funnel with a conversion window:
        # step k counts users whose earliest step-(k-1) completion is
        # followed by steps[k] strictly later and within the window
        "event_funnel": f"""WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s0.t
    AND epoch_us(e.ts) - epoch_us(s0.t) <= {FUNNEL_WITHIN_S * 1_000_000}
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s1.t
    AND epoch_us(e.ts) - epoch_us(s1.t) <= {FUNNEL_WITHIN_S * 1_000_000}
  GROUP BY e.user_id
)
SELECT 0::INT AS step_idx, '{FUNNEL_STEPS[0]}' AS step_type,
       count(*)::BIGINT AS users_reached FROM s0
UNION ALL SELECT 1::INT, '{FUNNEL_STEPS[1]}', count(*)::BIGINT FROM s1
UNION ALL SELECT 2::INT, '{FUNNEL_STEPS[2]}', count(*)::BIGINT FROM s2""",
        "part_sequence_reciprocity": """WITH nxt AS (
  SELECT l_partkey AS src_type,
         lead(l_partkey) OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_partkey, l_suppkey
         ) AS dst_type
  FROM lineitem
),
e AS (
  SELECT DISTINCT src_type AS src, dst_type AS dst
  FROM nxt WHERE dst_type IS NOT NULL AND src_type != dst_type
)
SELECT count(*)::BIGINT AS n_edges,
       count(r.src)::BIGINT AS n_reciprocal,
       round(count(r.src)::DOUBLE / nullif(count(*), 0), 6)
         AS reciprocity_r
FROM e AS l LEFT JOIN e AS r ON r.src = l.dst AND r.dst = l.src""",
        # wedge-aggregation exact butterfly counting: C(codeg,2) over the
        # weighted projection + C(deg,2) per side — all BIGINT arithmetic
        "butterfly_count": """WITH pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
wproj AS (
  SELECT a.e AS s, b.e AS d, count(*)::BIGINT AS w
  FROM pairs a JOIN pairs b ON a.c = b.c AND a.e < b.e
  GROUP BY 1, 2
),
bf AS (SELECT sum(w * (w - 1) // 2)::BIGINT AS butterflies FROM wproj),
cd AS (SELECT c, count(*)::BIGINT AS dg FROM pairs GROUP BY c),
ed AS (SELECT e, count(*)::BIGINT AS dg FROM pairs GROUP BY e),
lw AS (SELECT sum(dg * (dg - 1) // 2)::BIGINT AS left_wedges,
              count(*)::BIGINT AS containers FROM cd),
rw AS (SELECT sum(dg * (dg - 1) // 2)::BIGINT AS right_wedges,
              count(*)::BIGINT AS entities FROM ed)
SELECT butterflies, left_wedges, right_wedges, containers, entities
FROM bf, lw, rw""",
        # projection-cost audit: floor(log2 d) via length(bin(d)) - 1 —
        # integer/string ops only (a float log2 at an exact power of
        # two is an engine lottery); all sums BIGINT-exact
        "projection_cost": """WITH pairs AS (
  SELECT DISTINCT l_orderkey AS c, l_partkey AS e FROM lineitem
),
cdeg AS (SELECT c, count(*)::BIGINT AS d FROM pairs GROUP BY c)
SELECT CAST(length(bin(d)) - 1 AS INTEGER) AS bucket,
       count(*)::BIGINT AS containers,
       sum(d)::BIGINT AS incidences,
       sum(d * (d - 1) // 2)::BIGINT AS proj_pairs
FROM cdeg GROUP BY 1""",
        # the order-chain digraph is a disjoint union of directed paths,
        # so longest-path layering has the closed form level = position
        # in the chain — an INDEPENDENT derivation of what the engine
        # computes by synchronous Kahn rounds (the generic-DAG semantics
        # are pinned by pytest twins on diamond/multi-pred fixtures)
        "topo_levels": """WITH rn AS (
  SELECT o_orderkey AS vertex,
         (row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ) - 1)::BIGINT AS level,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
SELECT vertex, level FROM rn WHERE n >= 2""",
        "eigenvector_centrality": _eigenvector_oracle_sql(),
        "katz_centrality": _katz_oracle_sql(),
        "rich_club": _rich_club_oracle_sql(),
        # incremental triangle maintenance: the oracle is the honest
        # full-recount difference (two id-ordered triangle joins); the
        # engine side computes the same number delta-incrementally
        "triangle_delta": f"""WITH {_EDGES_CTE},
ew AS (
  SELECT src, dst,
         ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 14))::BIGINT % {DELTA_MOD} AS hb
  FROM edges
),
b AS (SELECT src, dst FROM ew WHERE hb != 0),
tu AS (
  SELECT count(*)::BIGINT AS c
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tb AS (
  SELECT count(*)::BIGINT AS c
  FROM b e1 JOIN b e2 ON e1.dst = e2.src
  JOIN b e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT CAST(tu.c - tb.c AS BIGINT) AS new_triangles FROM tu, tb""",
        **_doc_oracles(),
    }
    out["ann_recall"] = _ann_recall_oracle_sql(out)
    out["rrf_fusion"] = _rrf_oracle_sql(out)
    out["simrank"] = _simrank_oracle_sql()
    out["graphlet_census"] = _graphlet_census_oracle_sql()
    return out
