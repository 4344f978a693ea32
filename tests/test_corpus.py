"""Corpus-preparation operators: chunking, hash sampling, sequence packing
(operators/corpus.py). Semantics tests on tiny frames + plan-shape pins;
value parity vs DuckDB is covered by tests/test_entry_queries.py via the
corpus_* registry entries."""

from __future__ import annotations

from pyspark.sql import functions as F

from investigraph_etl_spark.operators.corpus import (
    chunk_tokens,
    pack_sequences,
    sample_hash,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------------- chunking
def test_chunk_tokens_windows_and_tail(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f g"),  # 7 tokens, k=3 -> 3+3+1
            (2, "x y"),  # 2 tokens -> one short chunk
            (3, ""),  # 0 tokens -> no rows
            (4, None),  # null text -> no rows
        ],
    )
    out = chunk_tokens(df, k=3).orderBy("doc_id", "chunk_idx").collect()
    got = [(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in out]
    assert got == [
        (1, 0, "a b c", 3),
        (1, 1, "d e f", 3),
        (1, 2, "g", 1),
        (2, 0, "x y", 2),
    ]


def test_chunk_tokens_no_shuffle(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = chunk_tokens(df, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow: explode + project only


# ----------------------------------------------------------------- sampling
def test_sample_hash_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000, 1, 8).select(F.col("id").alias("doc_id"))
    a = {r.doc_id for r in sample_hash(df, pct=10, salt="s0").collect()}
    b = {r.doc_id for r in sample_hash(df.repartition(3), pct=10, salt="s0").collect()}
    assert a == b  # layout-independent, unlike df.sample
    # ~10% within generous tolerance
    assert 120 <= len(a) <= 280
    # disjoint salts give (near-)independent splits, not nested ones
    c = {r.doc_id for r in sample_hash(df, pct=10, salt="s1").collect()}
    assert c != a
    # pct is monotone: a larger sample with the same salt contains the smaller
    d = {r.doc_id for r in sample_hash(df, pct=20, salt="s0").collect()}
    assert a <= d


def test_sample_hash_kernels_both_deterministic(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    for kernel in ("md5", "xxhash64"):
        x = {r.doc_id for r in sample_hash(df, pct=25, kernel=kernel).collect()}
        y = {r.doc_id for r in sample_hash(df, pct=25, kernel=kernel).collect()}
        assert x == y and 0 < len(x) < 500


# ------------------------------------------------------------------ packing
def test_pack_sequences_greedy_budget_semantics(spark):
    # one group so the stream order (by doc_id) is fully determined
    df = spark.createDataFrame(
        [(i, 30) for i in range(10)], "doc_id long, n_tokens long"
    )
    out = (
        pack_sequences(df, budget=100, n_groups=1)
        .orderBy("doc_id")
        .collect()
    )
    # running sum before each doc: 0,30,60,90,120,... -> bin = floor(before/100)
    assert [r.tokens_before for r in out] == [30 * i for i in range(10)]
    assert [r.bin for r in out] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert all(r.grp == out[0].grp for r in out)


def test_pack_sequences_bins_fill_at_least_budget(spark):
    df = spark.createDataFrame(
        [(i, 7 + (i * 13) % 50) for i in range(400)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, budget=64, n_groups=8)
    bins = (
        out.groupBy("grp", "bin")
        .agg(F.sum("n_tokens").alias("tot"), F.max("bin").alias("b"))
        .collect()
    )
    last_bin = {
        (r.grp, r.mb)
        for r in out.groupBy("grp").agg(F.max("bin").alias("mb")).collect()
    }
    for r in bins:
        if (r.grp, r.bin) not in last_bin:
            # greedy floor-binning: every closed bin's total is within one
            # max-size document (56 here) of the budget, on either side (a
            # doc straddling a boundary eats into the next bin's range)
            assert 64 - 56 < r.tot < 64 + 56


def test_pack_sequences_single_even_exchange(spark):
    df = spark.createDataFrame(
        [(i, 5) for i in range(100)], "doc_id long, n_tokens long"
    )
    plan = (
        pack_sequences(df, budget=50, n_groups=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one hash exchange (on grp) and no global sort/range partition
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan
