"""Connected-components dedup clustering and document chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.plans.llm_ops import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    connected_components,
    q_doc_chunks,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_cc_two_components_and_min_keeper(spark):
    # component {1,2,3} via chain, component {10,11}; pair order arbitrary
    pairs = _pairs(spark, [(2, 3), (1, 2), (10, 11)])
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    pairs = _pairs(spark, [(i, i + 1) for i in range(9)])
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(10)}


def test_cc_merges_overlapping_pairs_not_overdeletes(spark):
    """The motivating case: A~B and B~C must become ONE cluster with ONE
    keeper — pairwise keep-one would leave A and C both alive."""
    pairs = _pairs(spark, [(5, 7), (7, 9)])
    got = connected_components(pairs)
    assert {r.cluster_id for r in got.collect()} == {5}
    assert got.count() == 3


def test_cc_raises_on_iteration_exhaustion(spark):
    """A component whose diameter exceeds max_iters must fail LOUDLY
    (ADVICE r3): partially-propagated labels are split clusters that
    silently diverge from the exact recursive-CTE oracle."""
    import pytest

    pairs = _pairs(spark, [(i, i + 1) for i in range(9)])
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(pairs, max_iters=2)
    # and the same chain converges with an adequate budget
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs, max_iters=12).collect()}
    assert got == {i: 0 for i in range(10)}


def test_chunking_covers_text_with_overlap(spark, sf_correctness):
    chunks = q_doc_chunks(spark, sf_correctness)
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    # every doc appears; chunk 0 exists for each
    assert chunks.filter(F.col("chunk_idx") == 0).count() == docs.count()
    # no chunk exceeds the window; a NON-last chunk's start+stride is still
    # inside the text, so it holds strictly more than CHUNK_STRIDE chars
    assert chunks.filter(F.col("chunk_chars") > CHUNK_SIZE).count() == 0
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(F.max("chunk_idx").alias("last_idx"))
        .join(chunks, "doc_id")
        .filter(F.col("chunk_idx") < F.col("last_idx"))
    )
    assert per_doc.filter(F.col("chunk_chars") <= CHUNK_STRIDE).count() == 0
    # reconstruction bound: n_chunks*stride covers the text length
    cover = (
        chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        .join(docs.select("doc_id", F.length("text").alias("len")), "doc_id")
        .filter((F.col("n") - 1) * CHUNK_STRIDE + CHUNK_SIZE < F.col("len"))
    )
    assert cover.count() == 0


def test_pack_sequences_bounded_shard_deterministic(spark):
    """VERDICT r3 #4: the packing shard is a parameter — packing by
    (lang, bounded hash bucket) must be deterministic across input
    partitionings and never let a multi-doc pack exceed the budget."""
    from customer_activity_lakehouse_spark.plans.llm_ops import pack_sequences

    toks = (
        spark.range(100)
        .select(
            F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 37 + 1).cast("int").alias("n_tok"),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int"))
    )
    a = pack_sequences(toks, shard_cols=["lang", "bucket"], token_budget=64)
    b = pack_sequences(toks.repartition(13), shard_cols=["lang", "bucket"], token_budget=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    roll = a.groupBy("lang", "bucket", "pack_id").agg(
        F.sum("n_tok").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    assert roll.filter((F.col("tot") > 64) & (F.col("n") > 1)).count() == 0
    assert roll.count() > 8  # shards actually split the work
