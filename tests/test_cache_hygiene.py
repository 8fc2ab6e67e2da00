"""pin()/drain_pins() cache hygiene (queries/base.py, VERDICT r9 ask #5):
builders register persists, harnesses release them after materialization —
a long sweep session must not accumulate executor storage."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdc_mapreduce_spark.queries.base import _PINNED, drain_pins, pin


def test_pin_persists_and_drain_releases(spark):
    drain_pins(spark)  # clean slate
    df = pin(spark.range(1000).withColumn("x", F.col("id") * 2))
    assert df in _PINNED
    df.count()  # materialize the cache
    assert df.storageLevel.useMemory
    drain_pins(spark)
    assert not _PINNED
    # the block manager should hold no cached RDDs after a drain
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_registry_callables_drain_previous_pins(spark, tmp_path):
    """queries() wraps every callable with a drain of the PREVIOUS query's
    pins — the shape the driver runs. Building any query after a pin()'d
    one must leave the pin ledger holding only the new query's pins."""
    from sdc_mapreduce_spark import queries as qreg

    drain_pins(spark)
    leaked = pin(spark.range(10))
    leaked.count()
    fn = qreg.queries()["wordcount"]  # wordcount itself never pins
    fn(spark, "/root/testdata/sf0.001")
    assert leaked not in _PINNED
    drain_pins(spark)


def test_drain_without_session_is_safe():
    drain_pins(None)
    drain_pins(None, gc_nudge=True)
