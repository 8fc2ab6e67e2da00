"""Additional function-surface queries: window distribution functions,
unpivot/melt, regex functions, and deterministic hash sampling.

The reference exposes none of these (its only scalar surface is an
``isalnum`` filter and whitespace split, reference src/app/mapper.py:6,16;
SURVEY.md §2.2); these queries declare the engine's wider surface with
DuckDB oracles. Cross-engine hazards each query works around are noted in
its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sdc_mapreduce_spark.catalog import load_table
from sdc_mapreduce_spark.queries.base import QuerySpec, dsum, sql_dsum


def window_distribution_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution surface: ntile / percent_rank / cume_dist /
    first_value per order-status partition. The window orders by
    (o_totalprice, o_orderkey) — the key tiebreak makes ntile's row
    assignment deterministic across engines (ties in o_totalprice would
    otherwise make quartile membership engine-dependent). percent_rank and
    cume_dist are exact integer ratios, so the doubles hash identically."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first_value(F.col("o_orderkey")).over(w).alias("cheapest_key"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT o_orderkey, o_orderstatus,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) surface: wide part attributes to long (metric, value)
    rows, then an aggregate per metric. Unpivot is a zero-shuffle local
    expansion (each row emits k rows in place); only the final tiny
    aggregation shuffles. Oracle is the portable UNION ALL form."""
    part = load_table(spark, sf_dir, "part")
    long = part.select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot("p_partkey", ["retailprice", "size"], "metric", "value")
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "total"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("metric")
    )


AGG_UNPIVOT_SQL = f"""
WITH long AS (
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
  UNION ALL
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
)
SELECT metric, COUNT(*) AS n,
       {sql_dsum('value', 'total')},
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM long
GROUP BY metric
ORDER BY metric
"""


def scalar_regex_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface over documents: extract-all word counting, boolean
    match, first-number extraction, edit distance. ``try_cast`` absorbs the
    engines' differing no-match returns (Spark '' vs NULL — both cast to
    NULL)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias(
            "n_alpha_words"
        ),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.expr(
            "try_cast(regexp_extract(text, '([0-9]+)', 1) as bigint)"
        ).alias("first_number"),
        F.levenshtein(F.substring("text", 1, 10), F.lit("the quick")).alias(
            "lev_to_probe"
        ),
    )


SCALAR_REGEX_SQL = """
SELECT doc_id,
       CAST(LEN(regexp_extract_all(LOWER(text), '[a-z]+')) AS INT)
         AS n_alpha_words,
       regexp_matches(text, '[0-9]') AS has_digit,
       TRY_CAST(regexp_extract(text, '([0-9]+)', 1) AS BIGINT) AS first_number,
       CAST(levenshtein(SUBSTRING(text, 1, 10), 'the quick') AS INT)
         AS lev_to_probe
FROM documents
"""


def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via an md5 bucket on the row key, then
    per-flag estimates. This is the reproducible-sampling primitive a
    100 TB pipeline needs for debugging and quality estimation: unlike
    ``df.sample`` (seeded per-partition, changes with the split layout) the
    predicate depends only on row content, so the same rows are sampled on
    any cluster shape and in any engine — which is also what makes it
    oracle-checkable. The filter is a scan-local predicate: no shuffle, no
    extra pass."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.withColumn(
        "bucket",
        F.substring(
            F.md5(
                F.concat_ws(
                    "_",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            31,
            2,
        ),
    )
    return (
        keyed.filter(F.col("bucket") < "1a")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy("l_returnflag")
    )


SAMPLE_HASH_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_sampled,
       {sql_dsum('l_extendedprice', 'sum_price')}
FROM (
  SELECT *,
         SUBSTRING(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                       CAST(l_linenumber AS VARCHAR)), 31, 2) AS bucket
  FROM lineitem
)
WHERE bucket < '1a'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "window_distribution_fns": QuerySpec(
        window_distribution_fns, WINDOW_DISTRIBUTION_SQL
    ),
    "agg_unpivot": QuerySpec(agg_unpivot, AGG_UNPIVOT_SQL),
    "scalar_regex_fns": QuerySpec(scalar_regex_fns, SCALAR_REGEX_SQL),
    "sample_hash_bucket": QuerySpec(sample_hash_bucket, SAMPLE_HASH_SQL),
}
