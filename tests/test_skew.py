"""Salting: results must be identical to the unsalted operators; the salt
must actually spread hot keys across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdc_mapreduce_spark.operators.skew import (
    SALT_COL,
    salted_distinct_count,
    salted_join,
)


def _skewed_df(spark):
    # 90% of rows share key 0 — the pathological shape
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_df(spark)
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = sorted(
        (r.k, r.payload, r.dim_val)
        for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.payload, r.dim_val)
        for r in salted_join(fact, dim, "k", n_salts=8).collect()
    )
    assert salted == plain
    assert len(plain) > 0


def test_salt_spreads_hot_key(spark):
    fact = _skewed_df(spark)
    salted = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
    )
    per_salt = (
        salted.filter(F.col("k") == 0).groupBy(SALT_COL).count().collect()
    )
    assert len(per_salt) == 8, "hot key not spread over all salts"
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts) * 0.5, f"salt distribution degenerate: {counts}"


def test_salted_join_rejects_right_and_full(spark):
    """The right side is replicated per salt, so right/full semantics would
    duplicate unmatched right rows n_salts times — must be refused."""
    import pytest

    fact = _skewed_df(spark)
    dim = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(fact, dim, "k", how=how)


def test_salted_join_spreads_fully_identical_rows(spark):
    """A constant-key fact of IDENTICAL rows (same key AND same payload) must
    still fan out across salts — the per-row ordinal in the salt hash, not
    the column values, guarantees this."""
    fact = (
        spark.range(4000)
        .select(F.lit(0).alias("k"), F.lit(7).alias("payload"))
        .repartition(8)
    )
    dim = spark.createDataFrame([(0, 100)], "k long, dim_val long")
    out = salted_join(fact, dim, "k", n_salts=8)
    assert out.count() == 4000
    # reproduce the salt expression on the identical-row fact: every salt
    # bucket must receive a share
    salted = fact.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id(), *[F.col(c) for c in fact.columns]),
            F.lit(8),
        ),
    )
    counts = [r["count"] for r in salted.groupBy(SALT_COL).count().collect()]
    assert len(counts) == 8, f"identical rows collapsed onto {len(counts)} salts"
    assert max(counts) < sum(counts) * 0.5


def test_salted_distinct_count_equals_exact(spark):
    df = _skewed_df(spark).select(
        F.col("k"), (F.col("payload") % 97).alias("v")
    )
    exact = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r.k: r.n_distinct_v
        for r in salted_distinct_count(df, "k", "v", n_salts=8).collect()
    }
    assert salted == exact
