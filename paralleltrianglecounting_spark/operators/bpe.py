"""Byte-pair-encoding tokenizer training over the ``documents`` table
— the step a training-data pipeline runs AFTER corpus curation and
BEFORE tokenization: learn the merge table (Sennrich, Haddow & Birch,
ACL 2016) from exact corpus statistics.

The fundamental scale property this module is built around: BPE
training never iterates over the corpus. One corpus pass aggregates
the word-frequency table (``word_frequencies`` — millions of distinct
words at 100 TB, versus trillions of tokens), and every merge round
after that runs over that vocabulary table alone: one pair-count hash
agg + a 1-row argmax probe + one JVM higher-order-function fold that
applies the merge inside each symbol array. No per-round corpus scan,
no Python in any per-row path, and the per-round lineage/statistics
are pinned with ``local_pin`` so a 10k-merge training run neither
grows the plan nor poisons join estimates (the k-truss
localCheckpoint lesson, plans/superstep.py:local_pin).

Exactness contract: symbol splitting, pair counting, the
(count DESC, left ASC, right ASC) argmax, and the greedy
left-to-right non-overlapping merge are all integer/string exact, so
``bpe_pair_counts`` gates value-exact against a DuckDB twin and
``bpe_train``'s merge ledger is pinned against a pure-Python Sennrich
twin in tests (the ledger is deterministic at any parallelism).

Reference parity: the reference engine has no tokenizer surface; this
extends the training-data-pipeline block (SURVEY.md §6) the same way
dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["END_MARK", "bpe_pair_counts", "bpe_train", "word_frequencies"]

# end-of-word marker appended as its own symbol (Sennrich §3.2); chosen
# outside the whitespace-split alphabet so it can never collide with a
# real character sequence.
END_MARK = "</w>"


def word_frequencies(docs: DataFrame) -> DataFrame:
    """[word, wcount] — the exact corpus word-frequency table.

    The ONE corpus-scale pass of BPE training: explode + one
    map-side-combinable hash agg. Everything downstream runs over this
    table, which scales with the vocabulary, not the corpus."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _init_symbols(word: Column) -> Column:
    """Character symbols + the end marker, via sequence/substr — the
    construct both engines read identically (Spark ``substr`` and
    DuckDB ``substr`` are 1-based and UTF-8-character addressed;
    splitting on the empty pattern is NOT portable)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_MARK)))


def _pair_rows(syms: Column) -> Column:
    """Adjacent symbol pairs [(s_i, s_{i+1})] with multiplicity —
    guarded so a 1-symbol sequence yields [] (Spark's descending
    ``sequence(1, 0)`` counts DOWN; DuckDB's range is empty — the
    repetition_scores cross-engine edge case)."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def bpe_pair_counts(docs: DataFrame) -> DataFrame:
    """[left, right, pair_cnt] — exact adjacent-symbol pair frequencies
    over the initial character vocabulary (round 0 of BPE training):
    each word contributes every adjacent (char, char/end-mark) pair
    weighted by the word's corpus frequency, occurrences within a word
    counted with multiplicity.

    Plan shape at 100 TB: the corpus pass of ``word_frequencies`` (one
    explode + one hash agg), then a vocabulary-sized explode + one
    map-side-combinable hash agg down to |alphabet|² rows. No joins,
    no windows, no Python."""
    wf = word_frequencies(docs)
    return (
        wf.select(
            F.explode(_pair_rows(_init_symbols(F.col("word")))).alias("p"),
            F.col("wcount"),
        )
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("wcount").alias("pair_cnt"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) into
    one symbol — Sennrich's regex replace expressed as a JVM
    ``aggregate`` fold: append each symbol, except when the
    accumulator's last element is ``left`` and the incoming symbol is
    ``right``, in which case the last element is REPLACED by the merged
    token. Because the replacement changes the accumulator tail to the
    merged token, an overlapping second match can never fire — runs of
    the same symbol pair up left-to-right exactly like the reference
    algorithm ("aaa" + (a,a) -> ["aa", "a"])."""
    merged = F.lit(left + right)
    lcol, rcol = F.lit(left), F.lit(right)

    def step(acc: Column, x: Column) -> Column:
        # F.get is 0-based and NULL (never an ANSI error) on an empty
        # accumulator; NULL == left is NULL, so the miss branch fires.
        hit = (F.get(acc, F.size(acc) - 1) == lcol) & (x == rcol)
        replaced = F.when(F.size(acc) == 1, F.array(merged)).otherwise(
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged))
        )
        return F.when(hit, replaced).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def bpe_train(docs: DataFrame, n_merges: int = 30) -> DataFrame:
    """[merge_rank, left, right, pair_cnt] — the learned BPE merge
    ledger: ``n_merges`` rounds of (count pairs -> pick the most
    frequent pair, ties by (left ASC, right ASC) -> merge it in every
    symbol sequence). Stops early when no pair occurs twice (merging
    hapax pairs memorizes the corpus tail).

    Determinism: counts are exact integers and the argmax order is
    total, so the ledger is identical at any parallelism (pytest-pinned
    1 vs 16 partitions, and against a pure-Python Sennrich twin).

    Plan shape at 100 TB: the corpus is touched ONCE
    (word_frequencies); each round is one vocabulary-sized pair-count
    hash agg + a 1-row TakeOrdered argmax probe (a scalar driver probe,
    the choose_strategy pattern) + one higher-order-function fold —
    state pinned per round with ``local_pin`` so lineage and plan
    statistics stay flat across thousands of merges. The driver-side
    ledger is ``n_merges`` rows — never data-sized."""
    from ..plans.superstep import local_pin

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = local_pin(
        word_frequencies(docs).select(
            _init_symbols(F.col("word")).alias("syms"), F.col("wcount")
        )
    )
    ledger: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            best = (
                vocab.select(
                    F.explode(_pair_rows(F.col("syms"))).alias("p"), "wcount"
                )
                .groupBy(
                    F.col("p.left").alias("left"),
                    F.col("p.right").alias("right"),
                )
                .agg(F.sum("wcount").alias("pair_cnt"))
                .orderBy(
                    F.col("pair_cnt").desc(),
                    F.col("left").asc(),
                    F.col("right").asc(),
                )
                .limit(1)
                .collect()
            )
            if not best or best[0]["pair_cnt"] < 2:
                break
            left, right, cnt = (
                best[0]["left"],
                best[0]["right"],
                int(best[0]["pair_cnt"]),
            )
            ledger.append((rank, left, right, cnt))
            nxt = local_pin(
                vocab.select(
                    _apply_merge(F.col("syms"), left, right).alias("syms"),
                    "wcount",
                )
            )
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        ledger, "merge_rank int, left string, right string, pair_cnt bigint"
    )
