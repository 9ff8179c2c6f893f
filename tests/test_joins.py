"""Skew-salted joins must match plain-join results exactly; bucketed joins
must produce exchange-free plans (the co-location contract)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from customer_activity_lakehouse_spark.operators.joins import (
    SALT_COL,
    salt_column,
    salted_join,
    write_bucketed,
)


def _skewed_fact(spark):
    # 5000 rows, 80% on key 1 — the canonical hot key
    return spark.range(5000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1)).otherwise(F.col("id") % 97).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def _dim(spark):
    return spark.range(97).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, "k", how).select("k", "v", "name")
    salted = salted_join(fact, dim, "k", how).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_join(spark):
    with pytest.raises(ValueError):
        salted_join(_skewed_fact(spark), _dim(spark), "k", "right")


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 salt bucket — otherwise the salt
    did nothing and the straggler remains. Uses salt_column — the SAME
    expression salted_join applies — so changing the salting logic is
    caught here."""
    fact = _skewed_fact(spark)
    salted = fact.withColumn(SALT_COL, salt_column(fact, 16))
    n = salted.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    assert n > 8, f"hot key only reached {n} of 16 salt buckets"


def test_salt_is_deterministic_across_runs(spark):
    """Replay safety: two independent evaluations must assign every row the
    identical salt (F.rand would re-draw per run/retry)."""
    fact = _skewed_fact(spark)
    a = sorted(map(tuple, fact.withColumn(SALT_COL, salt_column(fact, 16)).collect()))
    b = sorted(map(tuple, fact.withColumn(SALT_COL, salt_column(fact, 16)).collect()))
    assert a == b


def test_salted_join_rejects_reserved_column(spark):
    fact = _skewed_fact(spark).withColumn(SALT_COL, F.lit(0))
    with pytest.raises(ValueError, match="reserves column"):
        salted_join(fact, _dim(spark), "k")


def test_salt_column_skips_map_columns(spark):
    """xxhash64 rejects MapType; the default salt source must skip map
    columns (nested or not) instead of raising at plan time."""
    fact = _skewed_fact(spark).withColumn("m", F.create_map(F.lit("a"), F.col("v")))
    salted = fact.withColumn(SALT_COL, salt_column(fact, 16))
    assert salted.select(SALT_COL).distinct().count() > 8

    dim = _dim(spark)
    out = salted_join(fact, dim, "k").select("k", "v", "name")
    plain = fact.join(dim, "k").select("k", "v", "name")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_column_explicit_cols(spark):
    """Callers with low-cardinality payloads pick the salt source: salting
    on the high-cardinality v column spreads the hot key even when every
    other column is constant."""
    fact = _skewed_fact(spark)
    salted = fact.withColumn(SALT_COL, salt_column(fact, 16, cols=["v"]))
    n = salted.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    assert n > 8


def test_salt_column_all_maps_raises(spark):
    df = spark.range(5).select(F.create_map(F.lit("a"), F.col("id")).alias("m"))
    with pytest.raises(ValueError, match="no hashable columns"):
        salt_column(df, 16)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key/count join without any shuffle:
    the physical plan contains a SortMergeJoin and ZERO Exchange operators
    on the bucketed sides."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}'")
    try:
        left = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
        right = spark.range(5_000).select(F.col("id").alias("k"), (F.col("id") % 3).alias("b"))
        write_bucketed(left, "bktest.l", "k", 8)
        write_bucketed(right, "bktest.r", "k", 8)

        joined = spark.table("bktest.l").join(spark.table("bktest.r"), "k")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain()
            plan = buf.getvalue()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 5_000
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")
