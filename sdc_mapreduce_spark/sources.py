"""Sources and sinks.

The reference's only storage interface is whole/ranged text-blob reads and
blob uploads against one Azure container (SURVEY.md O1-O5, reference
src/util/blob.cpp:33-94). Spark's DataSource API generalizes that to any
Hadoop-compatible filesystem and format; this module pins down the engine's
supported formats with explicit schemas and scale-relevant writer options:

- **text** — the reference's native format (one line per row);
- **csv / json** — schema-explicit (inference is a full extra pass over
  100 TB — never rely on it in production paths), malformed rows dropped
  (DROPMALFORMED), matching the reference's silent-skip semantics
  (reference src/app/reducer.py:11-12,21-24);
- **parquet** — the columnar default for everything analytic;
- writers: overwrite-mode parquet/csv/json with optional hive-style
  partitioning (partition pruning on read) and sorted-bucketed parquet
  tables (shuffle-free joins on the bucket key for repeat consumers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from sdc_mapreduce_spark.mapreduce import read_text, write_kv_text  # noqa: F401

__all__ = [
    "read_text",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_csv",
    "write_json",
    "write_parquet",
    "write_bucketed_table",
    "write_kv_text",
]


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV source with a required schema; malformed rows are dropped (the
    reference's silent-skip contract, quirk-faithful instead of failing
    mid-job on dirty data)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "DROPMALFORMED")
        .csv(paths)
    )


def read_json(
    spark: SparkSession, paths: str | list[str], schema: StructType | str
) -> DataFrame:
    """JSON-lines source with a required schema (no inference pass)."""
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(paths)


def read_parquet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parquet source — schema from footers; pushdown + pruning automatic."""
    return spark.read.parquet(*paths) if isinstance(paths, list) else spark.read.parquet(paths)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` writes hive-style directories so
    readers prune partitions from the path alone; ``max_records_per_file``
    caps file size (huge single files serialize the scan's split planning
    on object stores)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def read_orc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """ORC source — the second columnar format Spark ships natively; same
    pushdown/pruning machinery as parquet (predicate → stripe/row-group
    skip via ORC statistics)."""
    return spark.read.orc(*paths) if isinstance(paths, list) else spark.read.orc(paths)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    df.write.mode("overwrite").option("header", header).option("sep", sep).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_sorted_global(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    fmt: str = "parquet",
    num_files: int | None = None,
) -> None:
    """Globally-ordered sink: a range-partitioning exchange (sampled split
    points) + per-partition sort, so part files are internally sorted AND
    file i's keys all precede file i+1's — a total order across the
    directory without any single-node sort. The distributed upgrade of the
    reference's partition-local sorted sink (reference src/app/reducer.py:26,
    SURVEY.md O14/Q4: hash partitioning interleaves key ranges; range
    partitioning is what makes the global order real). ``num_files`` pins
    the output file count (output-size control at scale); default lets
    AQE pick."""
    if num_files:
        out = df.repartitionByRange(num_files, *order_cols).sortWithinPartitions(
            *order_cols
        )
    else:
        out = df.orderBy(*order_cols)
    out.write.mode("overwrite").format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Sorted-bucketed parquet table (saved through the catalog — bucketing
    metadata lives in the metastore). Joins/aggregations on the bucket key
    across two tables bucketed the same way run with ZERO shuffle — the
    persisted-data analog of the reference's hash-partitioned intermediate
    files (SURVEY.md O10), kept across jobs instead of per-job."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — the table-maintenance pass every long-lived
    100 TB dataset needs (streaming sinks and per-batch ingests accrete
    thousands of tiny files; each costs a task + an open at read time).
    Bin-packs the directory into ceil(total_bytes / target) output files;
    with ``order_cols`` the rewrite also range-clusters (an OPTIMIZE +
    sort, so min/max pruning improves too). Sizing reads only filesystem
    metadata (no data pass); the rewrite is one exchange. Returns the
    output file count chosen.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_path)
    if order_cols:
        out = df.repartitionByRange(n_files, *order_cols).sortWithinPartitions(
            *order_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files
