"""Text analysis over the ``documents`` table — the training-data
pipeline operators (language-id, quality scoring, token counting,
fingerprinting). All pure JVM-side column expressions: no UDFs at all.

Portability contract: every function here has an exact ANSI-SQL twin
(DuckDB) used by the correctness gate, so each transformation is
restricted to constructs with identical semantics in both engines
(regexp_split, md5, integer arithmetic, lambda higher-order functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared 56-bit integer hash: identical in Spark and DuckDB —
# Spark:  conv(substr(md5(x), 1, 14), 16, 10) :: long
# DuckDB: ('0x' || substr(md5(x), 1, 14)) :: BIGINT
HASH56_MOD = 2_147_483_647  # 2^31 - 1, keeps (a*h+b) inside int64


def hash56(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


# The one whitespace class used for tokenization — EXPLICIT, never a
# bare `\s`: Java's \s includes vertical tab (\x0B), RE2's (DuckDB's)
# does not, so `\s`-based splits silently diverge between the engine
# and the oracle on \x0B-bearing text. Both engines read this class
# identically (same fix as BPE_SPLIT_PATTERN below).
WS_CLASS = r"[ \t\n\x0B\f\r]+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empties dropped (identical to DuckDB
    ``list_filter(regexp_split_to_array(text, WS_CLASS), t -> t != '')``
    — the oracle splits on the same explicit class)."""
    return F.filter(F.split(text, WS_CLASS), lambda t: t != F.lit(""))


STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# marker-word profiles for the n-gram/function-word language heuristic;
# checked in declaration order, ties -> earlier entry
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "is"]),
    ("de", ["der", "die", "das", "und", "ist"]),
    ("es", ["el", "la", "de", "que", "es"]),
    ("fr", ["le", "la", "les", "et", "est"]),
]


def token_stats(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, n_chars_actual, avg_token_len_r]"""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.round(total_len / F.greatest(n, F.lit(1)), 6).alias("avg_token_len_r"),
    )


# GPT-2-style BPE pre-tokenizer pattern, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB) evaluate identically:
# - no `\s+(?!\S)` lookahead (RE2 has none);
# - NO bare `\s` anywhere — Java's \s includes vertical tab (\x0B),
#   RE2's does not, so `\s`-based alternatives silently diverge between
#   the engine and the oracle on \x0B-bearing text. Whitespace is the
#   explicit class [ \t\n\x0B\f\r] both engines read the same way.
# - no whitespace-consuming branch at all: regexp_extract_all skips
#   unmatched gaps, so whitespace between tokens simply never becomes a
#   token (which also removes the need to filter blob tokens out).
# Ordered alternation: contractions, space-prefixed letter runs, digit
# runs, punctuation runs.
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+"
)


def subword_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization: the token-budget estimator a training
    pipeline runs before the (proprietary) real tokenizer. Pure JVM
    ``regexp_extract_all``; DuckDB computes the identical list."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0)


def subword_stats(docs: DataFrame) -> DataFrame:
    """[doc_id, n_subwords, n_ws_tokens, subwords_per_token_r]: BPE-ish
    subword count next to the whitespace count — the fertility ratio
    (subwords per word) is the standard per-document tokenizer-cost
    signal."""
    sub = subword_tokens(F.col("text"))  # pattern never emits ws blobs
    ws = tokens(F.col("text"))
    n_sub = F.size(sub)
    n_ws = F.size(ws)
    return docs.select(
        "doc_id",
        n_sub.cast("long").alias("n_subwords"),
        n_ws.cast("long").alias("n_ws_tokens"),
        F.round(n_sub / F.greatest(n_ws, F.lit(1)), 6).alias("subwords_per_token_r"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, punct_ratio_r, stop_ratio_r, quality_r]

    Heuristic quality: long-enough docs with normal word lengths, some
    stopwords, and little punctuation score high — the standard cheap
    pre-filter shape for web/code corpora.
    """
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("long")
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", ""))
    chars = F.greatest(F.length("text"), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stops = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct_ratio = punct / chars
    stop_ratio = stops / F.greatest(n, F.lit(1))
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    quality = length_score * (1.0 - punct_ratio) * (0.5 + stop_ratio)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio_r"),
        F.round(stop_ratio, 6).alias("stop_ratio_r"),
        F.round(quality, 6).alias("quality_r"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """[doc_id, lang_declared, lang_pred]: deterministic function-word
    language heuristic — argmax of marker-word hits, ties resolved by
    profile declaration order."""
    toks = tokens(F.col("text"))

    def marker_hits(markers: list[str]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        # one-arg lambda: F.filter passes (element, index) to 2-arg lambdas
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS}
    # fold: best = first profile with strictly-max score
    best = F.lit(LANG_MARKERS[0][0])
    best_score = scores[LANG_MARKERS[0][0]]
    for lang, _ in LANG_MARKERS[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return docs.select(
        "doc_id", F.col("lang").alias("lang_declared"), best.alias("lang_pred")
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """[doc_id, fp]: polynomial rolling hash over the document's
    characters, ``fp = fold(acc*31 + codepoint) mod (2^31-1)`` — the
    deterministic document fingerprint (a content hash expressible in
    both engines, unlike xxhash64)."""
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % HASH56_MOD,
    )
    return docs.select("doc_id", fp.alias("fp"))


def bigrams(toks: Column) -> Column:
    """Adjacent-token bigrams joined with one space. Guarded for
    ``n < 2``: Spark's ``sequence(1, 0)`` counts *down* ([1, 0]) where
    DuckDB's ``generate_series(1, 0)`` is empty, so short docs must
    short-circuit to an empty array explicitly."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def repetition_scores(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, dup_token_frac_r, top_bigram_frac_r,
    dup_bigram_frac_r]: Gopher-style repetition signals — the standard
    boilerplate/spam pre-filter for web-scale corpora (Rae et al. 2021,
    "Scaling Language Models", Table A1 uses the same duplicate-n-gram
    fraction family).

    - ``dup_token_frac_r``  = 1 - distinct_tokens / n_tokens
    - ``top_bigram_frac_r`` = occurrences of the most frequent bigram
      / total bigrams
    - ``dup_bigram_frac_r`` = occurrences belonging to bigrams seen
      more than once / total bigrams

    Docs with < 2 tokens report 0 for both bigram fractions.

    Plan shape at 100 TB: the token fraction is a pure per-row
    expression (no explode); the bigram fractions are one explode +
    one (doc_id, gram) hash agg + one doc_id hash agg — both map-side
    combinable, keys bounded by the corpus token stream — joined back
    to the per-row stats. Linear, no window, no broadcast of anything
    that scales with the corpus.
    """
    toks = tokens(F.col("text"))
    n = F.size(toks).cast("long")
    dup_tok = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(toks)) / n
    ).otherwise(F.lit(0.0))
    base = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(dup_tok, 6).alias("dup_token_frac_r"),
    )
    gram = docs.select(
        "doc_id", F.explode(bigrams(tokens(F.col("text")))).alias("gram")
    )
    per_gram = gram.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("mx"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup"
        ),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac_r",
            F.round(
                F.coalesce(F.col("mx") / F.col("total"), F.lit(0.0)), 6
            ).alias("top_bigram_frac_r"),
            F.round(
                F.coalesce(F.col("dup") / F.col("total"), F.lit(0.0)), 6
            ).alias("dup_bigram_frac_r"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """[doc_id, term, tfidf_r, rank]: top-k terms per document by
    smoothed tf-idf — tf(d,t) · ln((N+1)/(df(t)+1)), rounded to 6 dp,
    ties broken by term (binary collation in both engines). Documents
    with no tokens emit no rows (both engines drop empty splits).

    Plan shape at 100 TB: one explode + two hash aggs (doc-term tf and
    term df, both map-side combinable) + one shuffle join on term —
    the term dictionary is NOT broadcast (it scales with the corpus);
    the scalar N rides a broadcast cross join. The top-k window
    partitions by doc_id — never a single-partition window."""
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf_r"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_r").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf_r", "rank")
    )


def pmi_collocations(
    docs: DataFrame, k: int = 20, min_count: int = 5
) -> DataFrame:
    """[gram_x, gram_y, pair_cnt, pmi_r]: the corpus's top-k bigram
    collocations by pointwise mutual information (Church & Hanks 1990)
    — ``ln(P(x,y) / (P(x)·P(y)))`` with P estimated from corpus counts:
    ``ln((c_xy · T1 · T1) / (T2 · c_x · c_y))``, rounded to 6 dp,
    pairs below ``min_count`` dropped (the standard hapax guard — PMI
    is maximized by frequency-1 pairs otherwise). Ordered
    ``pmi_r DESC, gram_x, gram_y`` — deterministic at ties.

    The phrase-mining primitive for training-data pipelines
    (multi-word-expression detection before tokenizer training).

    Plan shape at 100 TB: one bigram explode + one (x, y) hash agg,
    one token explode + one unigram hash agg; the unigram dictionary
    joins twice onto the min_count-filtered pair table as plain
    equi-joins — AQE broadcasts it while it measures small and shuffles
    it once it scales with the corpus; the two scalar
    totals (T1 tokens, T2 bigrams) are per-row expressions + one
    scalar agg riding a broadcast cross join; top-k is
    TakeOrderedAndProject (per-partition heads, no global sort). All
    counts exact; the float enters only in the final ln.
    """
    toks = tokens(F.col("text"))
    n = F.size(toks)
    pairs = docs.select(
        F.explode(
            F.when(
                n >= 2,
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("x"),
                        F.element_at(toks, i + 1).alias("y"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    cxy = (
        pairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= min_count)
    )
    tok = docs.select(F.explode(toks).alias("term"))
    cx = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = docs.agg(
        F.sum(n).cast("double").alias("t1"),
        F.sum(F.greatest(n - 1, F.lit(0))).cast("double").alias("t2"),
    )
    scored = (
        cxy.join(cx.select(F.col("term").alias("x"), F.col("c").alias("c_x")), "x")
        .join(cx.select(F.col("term").alias("y"), F.col("c").alias("c_y")), "y")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("x").alias("gram_x"),
            F.col("y").alias("gram_y"),
            F.col("pair_cnt").cast("long").alias("pair_cnt"),
            F.round(
                F.log(
                    (F.col("pair_cnt").cast("double") * F.col("t1") * F.col("t1"))
                    / (F.col("t2") * F.col("c_x") * F.col("c_y"))
                ),
                6,
            ).alias("pmi_r"),
        )
    )
    return scored.orderBy(F.desc("pmi_r"), "gram_x", "gram_y").limit(k)


def chunk_documents(
    docs: DataFrame, chunk_size: int = 32, overlap: int = 8
) -> DataFrame:
    """[doc_id, chunk_id, n_chunk_tokens, chunk_text] — fixed-size
    token windows with overlap, the standard pre-training chunking step
    (context-length packing happens downstream of this).

    Chunks start at token offsets 0, stride, 2·stride, … while the
    offset is strictly inside the document (stride = chunk_size −
    overlap, required positive); the final chunk may be short — it is
    emitted, not padded, and never dropped (a silent tail drop loses
    corpus). Zero-token documents emit zero chunks. Tokenization is the
    engine-wide :func:`tokens` whitespace split; ``chunk_text`` rejoins
    with single spaces, so original inter-token whitespace is
    normalized (chunking is a training-data transform, not a
    round-trip codec).

    Plan: per-row split + ``sequence`` over start offsets + one
    posexplode + per-row ``slice``/``array_join`` — linear, no shuffle
    at all (chunks stay co-partitioned with their documents), scan
    pruned to (doc_id, text). At 100 TB this is the map-only stage
    of the tokenize→chunk→pack pipeline.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    toks = tokens(F.col("text"))
    with_starts = docs.select(
        "doc_id",
        toks.alias("_toks"),
    ).select(
        "doc_id",
        "_toks",
        F.sequence(
            F.lit(0), F.size("_toks") - F.lit(1), F.lit(stride)
        ).alias("_starts"),
    ).where(F.size("_toks") > 0)
    chunk = F.slice(F.col("_toks"), F.col("_start") + F.lit(1), chunk_size)
    return (
        with_starts.select(
            "doc_id", "_toks", F.explode("_starts").alias("_start")
        )
        .select(
            "doc_id",
            (F.col("_start") / F.lit(stride)).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def bm25_search(
    docs: DataFrame,
    queries: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """[query_id, doc_id, score_r, rank] — Okapi BM25 retrieval: the
    top-k documents per query (Robertson–Spärck Jones, with the
    Lucene-style non-negative idf ``ln(1 + (N − df + 0.5)/(df + 0.5))``).
    The retrieval primitive of training-data curation (seed-query corpus
    selection, eval-set mining) run as one batch job over the corpus.

    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Term matching is exact (case-sensitive, the engine-wide whitespace
    tokenizer) — normalization is a corpus-prep concern, not a scoring
    one. Scores are rounded to 6 dp and ranked by (score_r DESC, doc_id
    ASC), the same cross-engine-total order as ``tfidf_top_terms``; the
    per-(query, doc) float sum is over per-term values computed in ONE
    association order shared with the oracle SQL. ``avgdl`` is an exact
    integer sum divided once, so it is bit-identical in both engines.

    Plan at 100 TB: one explode + two hash aggs (tf, df — both map-side
    combinable) + a BROADCAST join against the tiny query-term set (the
    corpus never shuffles on term for scoring; only matched (doc, term)
    rows proceed), one (query, doc) hash agg, and a per-query top-k
    window — partitioned by query_id, never single-partition.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    from pyspark.sql import Window

    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)], "query_id long, qtext string"
    )
    qterms = qdf.select(
        "query_id", F.explode(tokens(F.col("qtext"))).alias("term")
    ).distinct()

    toks = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    dl = toks.select("doc_id", F.size("_toks").cast("long").alias("dl"))
    tok = toks.select("doc_id", F.explode("_toks").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").alias("sum_dl"))
    )

    matched = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # ONE association order, mirrored verbatim in the oracle SQL:
    # idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    # norm = k1 * (1 - b + b * dl / avgdl);  avgdl = sum_dl / N
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    per_term = idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)
    scored = (
        matched.select("query_id", "doc_id", per_term.alias("_s"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score_r"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_r", "rank")
    )


def inverted_index(docs: DataFrame, block_size: int = 128) -> DataFrame:
    """[term, df, block_id, block_len, doc_ids] — the blocked postings
    index: for every distinct term, the sorted list of doc_ids
    containing it, cut into fixed-size blocks (block_id is 0-based over
    the doc_id order) with the term's total document frequency on every
    block row. ``doc_ids`` is the comma-joined sorted block — a string
    so the gate hashes it portably.

    Blocking is the load-bearing scale decision: a 100 TB corpus's
    stopword posting list is billions of ids — one
    ``collect_list`` per term would gather a monster list into a
    single aggregation buffer. Blocks bound every output row to
    ``block_size`` ids (the on-disk postings-block shape real indexes
    use), and downstream intersection/skip reads stream block rows
    instead of materializing whole lists.

    Plan shape at 100 TB: one explode over distinct (doc, term) + one
    per-term window (row_number over doc_id — THE postings sort; the
    shuffle key is the term, so skew follows term frequency exactly as
    in every production indexer) + one (term, block) hash agg; df joins
    back on the same term key so the exchange is reusable. No Python,
    no unblocked collect."""
    from pyspark.sql import Window

    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    tok = docs.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    blocked = tok.withColumn(
        "block_id",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(block_size)).cast("long"),
    )
    posting = blocked.groupBy("term", "block_id").agg(
        F.count(F.lit(1)).alias("block_len"),
        F.array_join(
            F.sort_array(F.collect_list(F.col("doc_id"))), ","
        ).alias("doc_ids"),
    )
    dfreq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return posting.join(dfreq, "term").select(
        "term", "df", "block_id", "block_len", "doc_ids"
    )


def skipgram_pairs(docs: DataFrame, window: int = 2, k: int = 100) -> DataFrame:
    """[center, context, pair_cnt] — the corpus's top-k
    (center, context) co-occurrence pairs within a ±``window`` token
    window: the word2vec/GloVe training-pair extraction step
    (Mikolov et al. 2013). Counts are exact with multiplicity; ordering
    is (pair_cnt DESC, center ASC, context ASC) — total, so the top-k
    is deterministic and engine-portable.

    Plan shape at 100 TB: pair generation is a PER-ROW nested
    transform/flatten (each position emits at most 2·window structs) —
    never a positional self-join, whose pre-filter blowup is quadratic
    in document length — followed by ONE map-side-combinable hash agg
    and a TakeOrderedAndProject top-k (per-partition heads, no global
    sort). Output is vocabulary², further cut to k."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    # Materialize the token array ONCE per row in its own projection
    # before any element_at touches it: inlined into the pair
    # expression, the split re-runs per element access (~2·window·n
    # splits per doc — measured 8x slower at sf0.1). CollapseProject
    # keeps the projections separate because the alias is referenced
    # many times by a non-cheap expression. Pair structs are built
    # BEFORE the explode, so the row that crosses the Generate is one
    # pair, never the token array.
    toked = docs.select(tokens(F.col("text")).alias("_toks")).where(
        F.size("_toks") >= 2
    )
    toks = F.col("_toks")
    n = F.size(toks)
    per_center = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.filter(
                F.sequence(
                    F.greatest(i - window, F.lit(1)),
                    F.least(i + window, n),
                ),
                lambda j: j != i,
            ),
            lambda j: F.struct(
                F.element_at(toks, i).alias("center"),
                F.element_at(toks, j).alias("context"),
            ),
        ),
    )
    pairs = toked.select(F.explode(F.flatten(per_center)).alias("p"))
    counted = pairs.groupBy(
        F.col("p.center").alias("center"), F.col("p.context").alias("context")
    ).agg(F.count(F.lit(1)).alias("pair_cnt"))
    return counted.orderBy(
        F.col("pair_cnt").desc(), F.col("center").asc(), F.col("context").asc()
    ).limit(k)


def ngram_topk(
    docs: DataFrame, n: int = 3, k: int = 50, min_count: int = 2
) -> DataFrame:
    """[gram, gram_cnt] — the corpus's k most frequent n-token grams
    (space-joined), exact counts with multiplicity, grams below
    ``min_count`` dropped, ordered (gram_cnt DESC, gram ASC) — a total
    order, so the top-k frontier is deterministic and engine-portable.
    The language-model-data primitive behind memorization audits,
    boilerplate detection, and n-gram LM estimation (the PMI operator
    ranks by association; this one ranks by raw frequency at any n).

    Plan shape at 100 TB: gram generation is one per-row
    transform/slice expression over the token array (materialized once
    per row — the skipgram lesson), one explode, one
    map-side-combinable hash agg, TakeOrderedAndProject top-k. No
    joins, no windows, no Python."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toked = docs.select(tokens(F.col("text")).alias("_toks")).where(
        F.size("_toks") >= n
    )
    toks = F.col("_toks")
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), m - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return (
        toked.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gram_cnt"))
        .where(F.col("gram_cnt") >= min_count)
        .orderBy(F.col("gram_cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


# winnowing: position field width inside the packed window key. 24 bits
# caps a document at 2^24 - 1 = 16.7 M k-grams (far beyond any real
# document); the fingerprint keeps the top 32 bits of hash56, so the
# packed key h32 * 2^24 + (2^24 - 1 - pos) stays under 2^56 < int64.
WINNOW_POS_BITS = 24


def winnow_fingerprints(docs: DataFrame, k: int = 4, w: int = 5) -> DataFrame:
    """[doc_id, pos, fingerprint] — winnowing document fingerprints
    (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm):
    hash every k-token shingle, then in every window of ``w``
    consecutive hashes select the minimum, rightmost on ties; the
    distinct selected (position, hash) pairs are the fingerprint set.
    Guarantees: any token run long enough to span a full window shares
    at least one fingerprint between copies (the detection guarantee),
    and density is ~2/(w+1) of grams. Documents with fewer than ``w``
    grams contribute the single winner of their whole hash sequence;
    documents with fewer than ``k`` tokens have no grams and vanish.

    Rightmost-min-with-ties is engine-portable via ONE packed key:
    ``h32 * 2^24 + (2^24 - 1 - pos)`` — minimizing the key minimizes
    (hash, -pos) lexicographically, so plain ``min`` over the window
    frame is the whole selection rule; no struct-valued arg-min needed
    (DuckDB's min_by cannot order by a struct).

    Plan shape at 100 TB: gram hashes are per-row array expressions
    (one explode), selection is ONE window aggregate partitioned by
    doc_id (partitions bounded by document length — never global),
    then one distinct. Linear, two shuffles (window + distinct), no
    joins, no Python."""
    from pyspark.sql import Window

    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    pos_mod = 1 << WINNOW_POS_BITS
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks")).where(
        F.size("_toks") >= k
    )
    toks = F.col("_toks")
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), m - k + 1),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    g = toked.select(
        "doc_id",
        (m - k + 1).cast("long").alias("n_grams"),
        F.posexplode(grams).alias("pos0", "gram"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.shiftright(hash56(F.col("gram")), WINNOW_POS_BITS).alias("h"),
    )
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    key = F.col("h") * pos_mod + (F.lit(pos_mod - 1) - F.col("pos"))
    sel = (
        g.select(
            "doc_id", "pos", "n_grams", F.min(key).over(frame).alias("wk")
        )
        .where(
            (F.col("pos") >= w)
            | ((F.col("n_grams") < w) & (F.col("pos") == F.col("n_grams")))
        )
        .select(
            "doc_id",
            # decode with bit ops: `/` would go through double (53-bit
            # mantissa) and corrupt keys near 2^56
            (F.lit(pos_mod - 1) - F.col("wk").bitwiseAND(pos_mod - 1)).alias("pos"),
            F.shiftright(F.col("wk"), WINNOW_POS_BITS).alias("fingerprint"),
        )
        .distinct()
    )
    return sel


def dup_ngram_spans(docs: DataFrame, n: int = 5) -> DataFrame:
    """[doc_id, n_windows, n_dup_windows, dup_fraction_r] — the exact
    duplicated-substring signal of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL 2022): a window of ``n``
    consecutive tokens is *duplicated* if the same n-gram also occurs
    in at least one OTHER document (within-doc repeats are a different
    signal — ``repetition_scores``). Per document: total windows,
    duplicated windows (counting intra-doc multiplicity), and their
    ratio — the "fraction of my text that exists elsewhere in the
    corpus" filter feature. Every document keeps a row; docs with
    fewer than ``n`` tokens have 0 windows and fraction 0.0.

    Plan shape at 100 TB: gram hashes are per-row array expressions
    (hash56 keeps rows narrow before the explode); occurrences shrink
    to (doc, gram, count) in ONE map-side-combinable hash agg BEFORE
    any join; cross-doc grams come from a second hash agg over that
    (count of rows = count of distinct docs by construction); one
    shuffle join on the gram hash flags them. Nothing is quadratic in
    corpus size — the heavy object is the (doc, gram) stream, linear
    in total tokens, the same volume winnowing shuffles."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    m = F.size("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), m - n + 1),
        lambda i: hash56(F.array_join(F.slice(F.col("_toks"), i, n), " ")),
    )
    g = toked.where(m >= n).select("doc_id", F.explode(grams).alias("gh"))
    per_doc_gram = g.groupBy("doc_id", "gh").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # one row per (doc, gram) ⇒ rows per gram = distinct docs per gram
    dup = (
        per_doc_gram.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("gh", F.lit(1).alias("_dup"))
    )
    per = (
        per_doc_gram.join(dup, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_windows"),
            F.coalesce(F.sum(F.col("c") * F.col("_dup")), F.lit(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.round(
                    F.col("n_dup_windows").cast("double") / F.col("n_windows"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction_r"),
        )
    )


def dup_span_runs(docs: DataFrame, n: int = 5) -> DataFrame:
    """[doc_id, n_runs, max_dup_span_tokens] — the SPAN structure of
    cross-document duplication: maximal runs of consecutive duplicated
    n-gram windows per document (``dup_ngram_spans`` gives the
    fraction; this gives the cut points). A run of L consecutive
    duplicated windows covers L + n − 1 tokens — ``max_dup_span_tokens``
    is the longest such span, the quantity exact-substring dedup
    (Lee et al., ACL 2022 §4.1 — their suffix-array spans ≥ 50 tokens)
    thresholds on; ``n_runs`` counts the maximal spans. Docs with no
    duplicated window report (0, 0).

    Plan shape at 100 TB: identical front end to ``dup_ngram_spans``
    (per-row gram hashes, ONE (doc, gram) hash agg before any join,
    rows-per-gram = distinct docs by construction), then the classic
    gaps-and-islands: island id = position − row_number() over a
    window PARTITIONED BY doc_id (bounded by document length, never
    global) + two hash aggs. Everything past the gram join is linear
    in the number of duplicated positions."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    m = F.size("_toks")
    grams_pos = F.transform(
        F.sequence(F.lit(1), m - n + 1),
        lambda i: F.struct(
            i.alias("i"),
            hash56(F.array_join(F.slice(F.col("_toks"), i, n), " ")).alias("gh"),
        ),
    )
    g = (
        toked.where(m >= n)
        .select("doc_id", F.explode(grams_pos).alias("p"))
        .select("doc_id", F.col("p.i").alias("i"), F.col("p.gh").alias("gh"))
    )
    # one row per (doc, gram) ⇒ rows per gram = distinct docs per gram
    dup = (
        g.select("doc_id", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("gh")
    )
    # a position has exactly one gram, so the semi-join keeps each
    # duplicated position once
    dup_pos = g.join(dup, "gh", "left_semi").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = (
        dup_pos.withColumn("_isl", F.col("i") - F.row_number().over(w))
        .groupBy("doc_id", "_isl")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    per = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        (F.max("_len") + F.lit(n - 1)).cast("long").alias("max_dup_span_tokens"),
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_runs", F.lit(0)).cast("long").alias("n_runs"),
            F.coalesce("max_dup_span_tokens", F.lit(0))
            .cast("long")
            .alias("max_dup_span_tokens"),
        )
    )


def oov_rate(docs: DataFrame, vocab_size: int = 64) -> DataFrame:
    """[doc_id, n_tokens, oov_frac_r] — fraction of a document's token
    OCCURRENCES that fall outside the corpus's ``vocab_size`` most
    frequent token types (ties on count broken by token text, so the
    vocabulary frontier is total and engine-portable). The
    vocabulary-gap quality signal: a document whose mass is mostly
    out-of-vocabulary is boilerplate, a language the corpus doesn't
    cover, or junk — the cheap precursor to LM-perplexity filtering
    (CCNet, Wenzek et al. 2020). Empty documents score 0.0.

    Plan shape at 100 TB: one token hash agg + TakeOrderedAndProject
    for the vocabulary (tiny — explicitly broadcast), one broadcast
    left join over the exploded token stream, one per-doc hash agg.
    Linear; the token stream is never shuffled on the token key for
    the scoring pass."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    stream = toked.select("doc_id", F.explode_outer("_toks").alias("tok"))
    vocab = (
        stream.where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(True).alias("_in_vocab"))
    )
    joined = stream.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.col("tok")).alias("n_tokens"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("tok").isNotNull() & F.col("_in_vocab").isNull(), 1.0
                    ).otherwise(0.0)
                )
                / F.nullif(F.count(F.col("tok")), F.lit(0)),
                F.lit(0.0),
            ),
            6,
        ).alias("oov_frac_r"),
    )


def bigram_lm_scores(docs: DataFrame, add_k: float = 0.5) -> DataFrame:
    """[doc_id, n_bigrams, avg_logp_r] — per-document mean natural-log
    probability under an add-k-smoothed bigram language model trained
    on the corpus itself: P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)
    with V = corpus vocabulary size (distinct token types). The
    standard perplexity-proxy quality filter (CCNet trains KenLM; the
    count-based bigram model is its exact-arithmetic little sibling —
    same join/agg plan a 5-gram model would need). Documents with
    fewer than two tokens have no bigrams and are excluded.

    Float portability: each term is one IEEE-exact ratio of
    integer-plus-k values passed through ln; only the per-doc mean
    accumulates in engine order, and its reassociation error (~1e-14
    over document-sized sums) is absorbed by the 6-dp round.

    Plan shape at 100 TB: one bigram hash agg (the model), one
    predecessor re-agg of the model (context counts — aggregating the
    MODEL, never the corpus twice), one 1-row vocabulary scalar, two
    hash joins of the per-doc bigram stream against model and
    contexts, one per-doc agg. Model tables are vocabulary-sized —
    broadcastable long before the corpus stops fitting anywhere."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks")).where(
        F.size("_toks") >= 2
    )
    toks = F.col("_toks")
    prs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )
    stream = toked.select("doc_id", F.explode(prs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    cb = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    cu = cb.groupBy("w1").agg(F.sum("_cb").alias("_cu"))
    vocab_n = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .agg(F.countDistinct("tok").alias("_v"))
    )
    scored = (
        stream.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "doc_id",
            F.log(
                (F.col("_cb") + F.lit(add_k))
                / (F.col("_cu") + F.lit(add_k) * F.col("_v"))
            ).alias("_lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("avg_logp_r"),
    )


def winnow_dup_clusters(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_postings: int = 200,
) -> DataFrame:
    """[doc_id, cluster_id, n_members] — transitive near-duplicate
    clusters over the winnowing fingerprint index: docs sharing at
    least ``min_shared`` distinct fingerprints are linked, connected
    components label the link graph (the MOSS workflow end-to-end:
    fingerprint → invert → pair → cluster). Every document is labeled;
    singletons get cluster_id = own id; cluster_id = min doc_id, so
    keep-first dedup is ``where(doc_id == cluster_id)``.

    ``max_postings`` is the boilerplate guard: a fingerprint shared by
    more than this many documents (a ubiquitous phrase) is dropped
    from pair generation — the same cap-before-the-quadratic-join
    contract as ``NGRAM_MAX_BLOCK``/``SIMHASH_MAX_BUCKET``; what the
    cap can drop is countable from the posting list it filters.

    100 TB shape: fingerprinting is linear (see
    :func:`winnow_fingerprints`); the inverted index is one distinct +
    one posting-size agg; pair generation is a bucketed self-join with
    Σ postings² bounded by the cap; the CC supersteps run on the tiny
    near-dup pair graph; final labeling is one left join + one size
    agg — the dedup_clusters shape with a winnowing front end."""
    from paralleltrianglecounting_spark.operators.components import (
        connected_components,
    )

    fps = (
        winnow_fingerprints(docs, k=k, w=w)
        .select("doc_id", "fingerprint")
        .distinct()
    )
    sizes = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("_n"))
    keep = sizes.where(F.col("_n") <= max_postings).select("fingerprint")
    fps = fps.join(keep, "fingerprint", "left_semi")
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("_shared"))
        .where(F.col("_shared") >= min_shared)
        .select("src", "dst")
    )
    cc = connected_components(pairs)
    labeled = (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("vertex", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
    )
    csizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return labeled.join(csizes, "cluster_id").select(
        "doc_id", "cluster_id", "n_members"
    )


def quality_filtered_docs(docs: DataFrame, q: float = 0.4) -> DataFrame:
    """[doc_id, lang, quality_r]: the documents that survive per-language
    quantile quality filtering — keep docs whose ``quality_scores``
    heuristic is at or above the language's q-th quantile (CCNet-style
    per-language thresholds: a single global cutoff over-prunes
    low-resource languages whose score distribution sits lower).

    Cross-engine exactness: the cutoff is Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` on DOUBLE (verified for ``events_quantiles``);
    quality_r values are 6-dp rounded so adjacent scores differ by
    ≥ 1e-6, while an interpolated cutoff between two scores can differ
    between engines only at ULP scale — a doc can therefore never sit
    between the two engines' cutoffs, and the ≥ filter selects
    identical rows. (When q·(n−1) is integral the cutoff IS a data
    value, exact in both.)

    100 TB shape: scoring is per-row expressions; the cutoff table is
    one row per language (broadcast); exact per-group percentile holds
    group values in the aggregate state, so at extreme per-language
    cardinality switch the cutoff computation to ``approx_percentile``
    (t-digest, mergeable) — the ``events_quantiles`` scale path.
    """
    scored = quality_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
    cuts = scored.groupBy("lang").agg(
        F.percentile("quality_r", F.lit(q)).alias("_cutoff")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .where(F.col("quality_r") >= F.col("_cutoff"))
        .select("doc_id", "lang", "quality_r")
    )
