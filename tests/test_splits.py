"""Deterministic hash splitting: content-keyed, layout-invariant,
fraction-respecting train/val/test assignment."""

from __future__ import annotations

import pytest

from sdc_mapreduce_spark.functions.splits import hash_split, split_sql_case


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "doc_id")


def test_fractions_approximately_honored(spark, keyed):
    counts = {
        r["split"]: r["n"]
        for r in hash_split(keyed, "doc_id").groupBy("split").count()
        .withColumnRenamed("count", "n").collect()
    }
    total = sum(counts.values())
    assert total == 20000
    assert abs(counts["train"] / total - 0.90) < 0.01
    assert abs(counts["val"] / total - 0.05) < 0.005
    assert abs(counts["test"] / total - 0.05) < 0.005


def test_assignment_is_partitioning_invariant(spark, keyed):
    a = {r["doc_id"]: r["split"] for r in hash_split(keyed, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(keyed.repartition(13), "doc_id").collect()
    }
    assert a == b


def test_salt_changes_assignment(spark, keyed):
    a = {r["doc_id"]: r["split"] for r in hash_split(keyed, "doc_id").collect()}
    c = {
        r["doc_id"]: r["split"]
        for r in hash_split(keyed, "doc_id", salt="v2").collect()
    }
    assert a != c  # a new salt re-rolls the split
    moved = sum(1 for k in a if a[k] != c[k])
    assert moved > 1000  # ...substantially, not marginally


def test_sql_case_matches_spark_assignment(spark, keyed):
    import duckdb

    rows = [(r["doc_id"], r["split"]) for r in hash_split(keyed, "doc_id").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k, _ in rows[:2000]])
    case = split_sql_case("doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    duck = dict(con.execute(f"SELECT doc_id, {case} FROM t").fetchall())
    for k, s in rows[:2000]:
        assert duck[k] == s


def test_fraction_validation(spark, keyed):
    with pytest.raises(ValueError):
        hash_split(keyed, "doc_id", fractions={"a": 0.5, "b": 0.2}).collect()


def test_single_split_and_many_splits(spark, keyed):
    one = hash_split(keyed, "doc_id", fractions={"all": 1.0})
    assert one.filter(one["split"] != "all").count() == 0
    many = dict(
        hash_split(
            keyed, "doc_id", fractions={f"s{i}": 0.1 for i in range(10)}
        )
        .groupBy("split")
        .count()
        .collect()
    )
    assert len(many) == 10
    for n in many.values():
        assert abs(n / 20000 - 0.1) < 0.01
