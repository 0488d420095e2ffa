"""Synthetic repo corpus: determinism, the sha256(content) per-row
invariant across repartition/rewrite, and co-occurrence edge derivation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.triangles import triangle_count
from paralleltrianglecounting_spark.sources.corpus import (
    repo_cooccurrence_edges,
    repo_files,
    with_content_sha,
)


def test_corpus_shape_and_determinism(spark):
    c1 = repo_files(spark, n_repos=20, files_per_repo=6, seed=7)
    c2 = repo_files(spark, n_repos=20, files_per_repo=6, seed=7)
    rows1 = sorted(tuple(r) for r in c1.collect())
    rows2 = sorted(tuple(r) for r in c2.collect())
    assert rows1 == rows2  # bit-identical regeneration
    assert set(c1.columns) == {"repo", "path", "commit", "lang", "content"}
    # every repo has the hub path (skew signal)
    hubs = c1.where(F.col("path") == "README.md").count()
    assert hubs == 20


def test_sha256_invariant_survives_repartition(spark, tmp_path):
    """input_hint: per-row sha256(content) equality through any
    repartition/rewrite."""
    corpus = with_content_sha(repo_files(spark, n_repos=15, files_per_repo=5, seed=3))
    before = {
        (r.repo, r.path): r.content_sha256 for r in corpus.collect()
    }
    out = str(tmp_path / "corpus")
    corpus.repartition(13).write.mode("overwrite").parquet(out)
    reread = spark.read.parquet(out).repartition(3)
    after = {(r.repo, r.path): r.content_sha256 for r in reread.collect()}
    recomputed = {
        (r.repo, r.path): r.sha
        for r in reread.select(
            "repo", "path", F.sha2("content", 256).alias("sha")
        ).collect()
    }
    assert after == before
    assert recomputed == before


def test_repo_cooccurrence_edges(spark):
    corpus = repo_files(spark, n_repos=12, files_per_repo=6, seed=5)
    edges = repo_cooccurrence_edges(corpus, on="path")
    rows = edges.collect()
    assert all(r.src < r.dst for r in rows)
    assert len(rows) == len({(r.src, r.dst) for r in rows})
    # hub paths make the repo graph dense: every repo shares README.md,
    # so the graph is complete — 12 choose 2 edges, 12 choose 3 triangles
    assert len(rows) == 66
    tri = triangle_count(edges).collect()[0]["triangles"]
    assert tri == 220


def test_commit_cooccurrence_variant(spark):
    corpus = repo_files(spark, n_repos=10, files_per_repo=4, seed=9)
    edges = repo_cooccurrence_edges(corpus, on="commit")
    # commits are sha256(seed|repo|path) — unique per row, so no two
    # repos share one: the commit graph of this corpus is empty
    assert edges.count() == 0


def test_dot_and_gfile_sinks_round_trip(spark, tmp_path):
    """S9 DOT formatter matches the reference's printDot shape; the .g
    writer round-trips through read_g_file with a truthful header."""
    from paralleltrianglecounting_spark.sources.gfile import (
        declared_vertex_count,
        read_g_file,
    )
    from paralleltrianglecounting_spark.sources.sinks import to_dot, write_g_file

    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    dot = to_dot(edges)
    assert dot.startswith("graph G {") and dot.endswith("}")
    assert "0 -- 1;" in dot and "1 -- 2;" in dot and "0 -- 2;" in dot

    path = str(tmp_path / "tri.g")
    assert write_g_file(edges, path) == 3
    assert declared_vertex_count(spark, path) == 3  # actual count, not a guess
    back = read_g_file(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == [(0, 1), (0, 2), (1, 2)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        to_dot(edges, max_edges=2)


def test_scan_column_pruning_reaches_parquet(spark, sf_tiny):
    """100 TB load-bearing: the co-occurrence derivation must read ONLY
    (container, entity) off the corpus scan — the 16-column lineitem
    table is pruned to 2 columns in ReadSchema (SCALE.md 'Edge
    derivation')."""
    from paralleltrianglecounting_spark.plans.lint import (
        assert_pruned_scan,
        scan_read_schemas,
    )
    from paralleltrianglecounting_spark.sources.edges import part_graph

    pg = part_graph(spark, sf_tiny)
    assert scan_read_schemas(pg), "expected a parquet scan in the plan"
    assert_pruned_scan(pg, {"l_orderkey", "l_partkey"})

    import pytest as _pytest

    with _pytest.raises(AssertionError):
        assert_pruned_scan(pg, {"l_orderkey"})  # detector must actually detect


def test_pruning_detector_sees_past_nested_types(spark, tmp_path):
    """ADVICE r01: a `struct<[^>]*>` regex truncated at the first '>' of
    any nested column type, silently excluding later columns from the
    pruning assertion. The depth-aware parser must flag an unpruned
    column that FOLLOWS an array<> column in the ReadSchema."""
    from pyspark.sql import functions as F

    from paralleltrianglecounting_spark.plans.lint import (
        _schema_fragments,
        _top_level_cols,
        assert_pruned_scan,
        scan_read_schemas,
    )

    out = str(tmp_path / "nested_pq")
    spark.range(10).select(
        F.col("id"),
        F.array(F.lit("a"), F.lit("b")).alias("toks"),
        (F.col("id") * 2).alias("payload"),
    ).write.parquet(out)
    df = spark.read.parquet(out).select("id", "toks", "payload")
    schemas = scan_read_schemas(df)
    assert schemas and all(s.endswith(">") for s in schemas)
    # all three columns must be visible, incl. the one after the array
    assert _top_level_cols(schemas[0]) == {"id", "toks", "payload"}

    import pytest as _pytest

    with _pytest.raises(AssertionError):
        assert_pruned_scan(df, {"id", "toks"})  # payload must be flagged

    # unit check of the fragment parser on a synthetic deep-nested plan
    frag = _schema_fragments(
        "... ReadSchema: struct<a:int,m:map<string,struct<x:int,y:array<long>>>,b:bigint> ..."
    )
    assert frag == ["struct<a:int,m:map<string,struct<x:int,y:array<long>>>,b:bigint>"]
    assert _top_level_cols(frag[0]) == {"a", "m", "b"}


def test_subword_stats_bpe_pretokenization(spark):
    """BPE-ish pre-tokenizer: contractions split off, letter/digit/punct
    runs split, space-prefix absorbed — the GPT-2 pattern minus the
    RE2-incompatible lookahead."""
    from paralleltrianglecounting_spark.operators.text import subword_stats

    docs = spark.createDataFrame(
        [
            (1, "it's 2024, don't stop!"),
            (2, "hello world"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in subword_stats(docs).collect()}
    # it|'s| 2024|,| don|'t| stop|! -> 8 subwords over 4 ws tokens
    assert got[1].n_subwords == 8 and got[1].n_ws_tokens == 4
    assert got[1].subwords_per_token_r == 2.0
    assert got[2].n_subwords == 2 and got[2].n_ws_tokens == 2
    assert got[3].n_subwords == 0 and got[3].subwords_per_token_r == 0.0


def test_subword_pattern_avoids_engine_divergent_whitespace(spark):
    """Review r02: bare `\\s` means different things to Java (includes
    \\x0B) and RE2 (excludes it). The pattern uses an explicit class and
    never emits whitespace tokens, so both engines must agree — checked
    here directly against DuckDB on adversarial whitespace."""
    import duckdb

    from paralleltrianglecounting_spark.operators.text import (
        BPE_SPLIT_PATTERN,
        WS_CLASS,
        subword_stats,
    )

    texts = ["a.\x0bb", "tab\there", "crlf\r\nline", "x \x0b\x0b y", "a\fb"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in subword_stats(docs).collect()}
    con = duckdb.connect()
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    for i, t in enumerate(texts):
        want_sub, want_ws = con.execute(
            f"""SELECT len(regexp_extract_all(?, '{pat}')),
                       len(list_filter(regexp_split_to_array(?, '{WS_CLASS}'),
                                       t -> t != ''))""",
            [t, t],
        ).fetchone()
        assert got[i].n_subwords == want_sub, (t, got[i].n_subwords, want_sub)
        # the whitespace-token count must agree too: tokens() splits on
        # the same explicit class the oracle uses, so \x0B is a token
        # separator in BOTH engines (a bare \s would separate only in
        # Java's dialect)
        assert got[i].n_ws_tokens == want_ws, (t, got[i].n_ws_tokens, want_ws)


def test_pruning_detector_rejects_truncated_schemas():
    from paralleltrianglecounting_spark.plans.lint import _schema_fragments

    import pytest as _pytest

    # unbalanced fragment (plan string cut mid-schema) must raise
    with _pytest.raises(AssertionError, match="truncated"):
        _schema_fragments("... ReadSchema: struct<a:int,b:array<string ...")
    # balanced fragments still parse
    assert _schema_fragments("ReadSchema: struct<a:int> tail") == ["struct<a:int>"]


def test_read_corpus_layered_resolution(spark, tmp_path):
    """Iceberg-first reader: falls back to parquet in this sandbox,
    validates the input_hint contract columns, and feeds the standard
    edge derivation unchanged."""
    from paralleltrianglecounting_spark.sources.corpus import repo_files
    from paralleltrianglecounting_spark.sources.iceberg import read_corpus

    out = str(tmp_path / "corpus_pq")
    repo_files(spark, n_repos=12, files_per_repo=4).write.parquet(out)

    corpus = read_corpus(spark, out)
    assert set(corpus.columns) >= {"repo", "path", "commit", "lang", "content"}
    assert corpus.count() > 0

    from paralleltrianglecounting_spark.sources.corpus import repo_cooccurrence_edges

    edges = repo_cooccurrence_edges(corpus)
    assert edges.where("src >= dst").count() == 0  # canonical

    # missing contract columns must be rejected, not silently accepted
    bad = str(tmp_path / "bad_pq")
    corpus.select("repo", "path").write.parquet(bad)
    with pytest.raises(ValueError, match="missing contract columns"):
        read_corpus(spark, bad)

    # unknown source -> clear error listing what was tried
    with pytest.raises(ValueError, match="could not load corpus"):
        read_corpus(spark, str(tmp_path / "nope"))

    # slash-free source that is not a catalog table but IS a relative
    # parquet directory must fall through to the parquet read (ADVICE
    # r01); relative paths resolve against the JVM working directory
    import shutil

    rel_name = "_tmp_slashfree_corpus_pq"
    try:
        corpus.write.mode("overwrite").parquet(rel_name)
        rel = read_corpus(spark, rel_name)
        assert rel.count() == corpus.count()
        # ...and a slash-free dir with a broken schema gets the explicit
        # missing-columns error, not "could not load"
        corpus.select("repo", "path").write.mode("overwrite").parquet(rel_name)
        with pytest.raises(ValueError, match="missing contract columns"):
            read_corpus(spark, rel_name)
    finally:
        shutil.rmtree(rel_name, ignore_errors=True)
