"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on by
default in session.py) handles most skew at runtime by splitting oversized
shuffle partitions. Salting is the explicit, planner-independent fallback
for the cases AQE can't fix:

- a join where ONE key holds a double-digit percentage of the fact table
  (AQE splits the partition, but every split still collides on the same
  hot key's hash bucket on the build side);
- ``count(distinct)``-style aggregations where a hot group overwhelms a
  single reducer even after map-side partial aggregation.

The reference's hash partitioner (``std::hash % R``, reference
src/worker/worker.cpp:244-250) has exactly this failure mode and no
mitigation; with R=3 one hot word owns a third of the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the skewed side gets a uniform salt in
    [0, n_salts); the small side is replicated once per salt value; the join
    key becomes (key, salt), spreading each hot key over ``n_salts`` reduce
    partitions. Costs n_salts x |small| replication — use for
    fact ⋈ medium-dim joins too big to broadcast but small enough to
    replicate.

    The salt must only be *uniform*, not reproducible: xxhash64 of the whole
    skewed row plus a per-row ordinal. The ordinal
    (``monotonically_increasing_id``) is what guarantees fully-identical hot
    rows still spread across salts — hashing the row columns alone would
    send every duplicate of a hot row to the same reducer. The join RESULT
    is salt-invariant, so the ordinal's run-to-run instability is harmless.

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated once per salt, so an unmatched right row would surface
    ``n_salts`` times under ``right``/``full`` semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (right side is "
            f"replicated per salt; right/full would duplicate unmatched "
            f"right rows), got {how!r}"
        )
    salted_left = skewed.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id(), *[F.col(c) for c in skewed.columns]),
            F.lit(n_salts),
        ),
    )
    replicated_right = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return salted_left.join(replicated_right, on=[on, SALT_COL], how=how).drop(SALT_COL)


def salted_distinct_count(
    df: DataFrame, group_col: str, distinct_col: str, n_salts: int = 16
) -> DataFrame:
    """COUNT(DISTINCT x) per group, skew-split: phase 1 dedups (group, salt,
    x) locally — the hot group's distinct-set is partitioned across salts —
    phase 2 sums per-salt partial counts. Same two-shuffle cost as Spark's
    own distinct-aggregate expansion but with the hot group spread over
    ``n_salts`` reducers in phase 1."""
    salted = df.select(
        F.col(group_col),
        F.col(distinct_col),
        F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).alias(SALT_COL),
    )
    partial = (
        salted.groupBy(group_col, SALT_COL)
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("__partial").alias(f"n_distinct_{distinct_col}")
    )
