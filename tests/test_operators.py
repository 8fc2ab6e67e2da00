"""Composite operators: as-of join and time-range join verified against
hand-computed expectations and naive (non-equi) reference joins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sdc_mapreduce_spark.operators.relational import (
    asof_join,
    range_join_time,
    top_k,
    top_k_per_group,
)


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_global_running_sum_matches_single_partition_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sdc_mapreduce_spark.operators.relational import global_running_sum

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    ).repartition(11)  # scrambled input layout
    got = {
        r["k"]: r["cum"]
        for r in global_running_sum(df, "k", "v", out_col="cum", num_partitions=8)
        .collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expected = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == expected


def test_global_running_sum_double_and_decimal_values(spark):
    """The offset frame's dtype must follow the aggregated total's dtype —
    double and decimal value columns, not just integers."""
    from pyspark.sql import Window

    from sdc_mapreduce_spark.operators.relational import global_running_sum

    base = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") % 13 * 0.25).alias("dv"),
        (F.col("id") % 7).cast("decimal(10,2)").alias("cv"),
    ).repartition(5)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for col in ("dv", "cv"):
        got = {
            r["k"]: r["cum"]
            for r in global_running_sum(
                base, "k", col, out_col="cum", num_partitions=6
            ).collect()
        }
        expected = {
            r["k"]: r["cum"]
            for r in base.withColumn("cum", F.sum(col).over(w)).collect()
        }
        assert got == expected, col


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "L1"), (1, ts(20), "L2"), (2, ts(15), "L3"), (3, ts(5), "L4")],
        "k int, t timestamp_ntz, lv string",
    )
    right = spark.createDataFrame(
        [(1, ts(8), "R1"), (1, ts(12), "R2"), (2, ts(15), "R3"), (2, ts(30), "R4")],
        "k int, t timestamp_ntz, rv string",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t", right_value_cols=["rv"]
    )
    got = {(r["k"], r["lv"]): r["rv"] for r in out.collect()}
    assert got == {
        (1, "L1"): "R1",   # 10:10 -> latest right <= is R1@10:08
        (1, "L2"): "R2",   # 10:20 -> R2@10:12
        (2, "L3"): "R3",   # equal timestamps match (inclusive)
        (3, "L4"): None,   # no right rows for key 3
    }


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, ts(10), "L1")], "k int, t timestamp_ntz, lv string")
    right = spark.createDataFrame(
        [(1, ts(9), "early"), (1, ts(11), "next"), (1, ts(12), "later")],
        "k int, t timestamp_ntz, rv string",
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        right_value_cols=["rv"],
        direction="forward",
    )
    assert out.collect()[0]["rv"] == "next"


def test_range_join_matches_naive(spark, sf_dir):
    """Bucketed range join == naive non-equi join on the events fixture."""
    from sdc_mapreduce_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("aid"), "user_id", F.col("ts")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("bid"), F.col("user_id").alias("user_id_b"),
        F.col("ts").alias("bts"),
    )
    bucketed = range_join_time(
        a, b.withColumnRenamed("user_id_b", "user_id"),
        on="user_id", left_time="ts", right_time="bts",
        lower_seconds=0, upper_seconds=1800,
    ).select("aid", "bid")
    naive = (
        a.join(b, (F.col("user_id") == F.col("user_id_b")))
        .filter(
            (F.col("bts") >= F.col("ts"))
            & (F.col("bts") <= F.col("ts") + F.expr("INTERVAL '1800' SECOND"))
        )
        .select("aid", "bid")
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, naive.collect()))
    assert bucketed.count() > 0


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """HLL++ rsd=2% and a 10k-bucket percentile digest must land close to
    the exact aggregates (5% / 10% tolerance — generous vs the configured
    error, tight enough to catch wiring bugs). The registered query now
    emits the bounds-check booleans directly — assert they all hold, then
    re-derive the raw estimates and check them against exact aggregates."""
    from pyspark.sql import functions as F

    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.relational_queries import agg_approx_sketches

    got = {r["o_orderstatus"]: r for r in agg_approx_sketches(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    raw = {
        r["o_orderstatus"]: r
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias(
                "approx_median_price"
            ),
            F.countDistinct("o_custkey").alias("nd"),
            F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        )
        .collect()
    }
    assert set(got) == set(raw)
    for status, row in got.items():
        assert row["acd_within_bounds"] is True
        assert row["median_within_bounds"] is True
        assert row["exact_customers"] == raw[status]["nd"]
        nd, med = raw[status]["nd"], raw[status]["med"]
        assert abs(raw[status]["approx_customers"] - nd) <= max(nd * 0.05, 2)
        assert abs(raw[status]["approx_median_price"] - med) <= abs(med) * 0.10


def test_top_k_and_per_group(spark):
    df = spark.createDataFrame(
        [(g, i, g * 100 + i) for g in range(3) for i in range(10)], "g int, i int, v int"
    )
    top = top_k(df, [F.col("v").desc()], 5)
    assert [r["v"] for r in top.collect()] == [209, 208, 207, 206, 205]
    per = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r["g"], r["v"]) for r in per.collect())
    assert got == [(0, 8), (0, 9), (1, 108), (1, 109), (2, 208), (2, 209)]


def test_change_intervals_compress_state_history(spark):
    from sdc_mapreduce_spark.queries.events_queries import (
        events_change_intervals,  # noqa: F401 (query fn needs sf_dir)
    )
    from pyspark.sql import Window, functions as F

    rows = [
        (1, 100, "a", 1), (2, 100, "a", 2), (3, 100, "b", 3),
        (4, 100, "a", 4), (5, 200, "x", 1),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "t"])
    ev = ev.withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(mins=F.col("t")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    out = (
        ev.withColumn("__chg", chg)
        .withColumn("__island", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "__island")
        .agg(F.min("event_type").alias("event_type"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = sorted((r["user_id"], r["__island"], r["event_type"], r["n"]) for r in out)
    assert got == [(100, 1, "a", 2), (100, 2, "b", 1), (100, 3, "a", 1), (200, 1, "x", 1)]


def test_vocab_ids_rank_and_cutoff(spark):
    from sdc_mapreduce_spark.functions.text import vocab_ids

    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b z")], ["doc_id", "text"]
    )
    got = {
        r["token"]: (r["freq"], r["vocab_id"])
        for r in vocab_ids(df, min_count=2).collect()
    }
    # b:4 -> id 1, a:3 -> id 2; c and z fall below the cutoff
    assert got == {"b": (4, 1), "a": (3, 2)}


def test_robust_anomalies_median_mad(spark):
    """Discrete median/MAD selection and the n_mads gate, checked against a
    hand-computed group; the outlier doesn't corrupt its own baseline."""
    from sdc_mapreduce_spark.operators.relational import robust_anomalies

    # group g: values 1..7 plus one wild outlier 100.
    # sorted: 1,2,3,4,5,6,7,100 -> n=8, lower-middle rank 4 -> med=4
    # devs: 3,2,1,0,1,2,3,96 -> sorted 0,1,1,2,2,3,3,96 -> mad (rank 4) = 2
    # flag |v-4| > 3.5*2=7 -> only 100 (dev 96)
    rows = [(i, "g", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 100])]
    # constant group: mad = 0 -> nothing flagged even though devs are 0
    rows += [(100 + i, "c", 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    got = robust_anomalies(df, ["event_type"], "value", "event_id").collect()
    assert len(got) == 1
    r = got[0]
    assert r["value"] == 100.0 and r["med"] == 4.0 and r["mad"] == 2.0
    assert r["z"] == 48.0


def test_equidepth_histogram_properties(spark):
    """Depths differ by at most 1, buckets tile the value range in order,
    and counts sum to n — on a skewed value set with heavy ties."""
    from sdc_mapreduce_spark.operators.relational import equidepth_histogram

    rows = [(i, float(v)) for i, v in enumerate([1] * 50 + list(range(2, 52)))]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = sorted(
        equidepth_histogram(df, "v", "id", n_buckets=4).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in got] == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in got) == 100
    assert max(r["n_rows"] for r in got) - min(r["n_rows"] for r in got) <= 1
    for a, b in zip(got, got[1:]):
        assert a["hi"] <= b["lo"]
    assert got[0]["lo"] == 1.0 and got[3]["hi"] == 51.0


def test_integrity_audit_flags_planted_violations(spark, tmp_path):
    """Plant an orphan lineitem, a duplicate order key, and an
    out-of-range quantity in a scratch sf dir; the audit counts each."""
    import shutil

    from sdc_mapreduce_spark.catalog import TABLES, load_table
    from sdc_mapreduce_spark.queries.surface_queries import table_integrity_audit

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "sf_bad"
    dst.mkdir()
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", dst / f"{t}.parquet")
    orders = load_table(spark, src, "orders")
    li = load_table(spark, src, "lineitem")
    first_order = orders.limit(1).collect()[0]
    bad_li = li.limit(1).collect()[0].asDict()
    bad_li.update(l_orderkey=10**12, l_quantity=999.0)  # orphan + range
    li.unionByName(spark.createDataFrame([bad_li], li.schema)).coalesce(
        1
    ).write.mode("overwrite").parquet(str(dst / "lineitem.parquet"))
    orders.unionByName(
        spark.createDataFrame([first_order], orders.schema)
    ).coalesce(1).write.mode("overwrite").parquet(str(dst / "orders.parquet"))
    got = {
        r["constraint"]: r
        for r in table_integrity_audit(spark, str(dst)).collect()
    }
    assert got["orders_pk_unique"]["n_violations"] == 1
    assert got["lineitem_fk_orders"]["n_violations"] == 1
    assert got["lineitem_qty_range_1_50"]["n_violations"] == 1
    assert got["customer_fk_nation"]["n_violations"] == 0
    assert not got["orders_pk_unique"]["passed"]
    assert got["customer_name_not_null"]["passed"]


def test_cogroup_asof_matches_declarative(spark, sf_dir):
    """The cogrouped-pandas merge_asof and the union+window asof_join agree
    row-for-row on the fixture (ties included)."""
    from sdc_mapreduce_spark.queries.events_queries import (
        events_asof_join,
        events_cogroup_asof_pandas,
    )

    pandas_rows = {
        tuple(r)
        for r in events_cogroup_asof_pandas(spark, sf_dir).collect()
    }
    decl = {
        (r["event_id"], r["user_id"], r["purchase_event_id"], r["purchase_value"])
        for r in events_asof_join(spark, sf_dir).collect()
    }
    assert pandas_rows == decl


def test_interval_overlap_join_matches_naive(spark):
    """Bucketed+allocation interval join equals the naive non-equi join on
    adversarial intervals: bucket-boundary touching, containment, zero-length,
    multi-bucket spans (each pair must appear EXACTLY once)."""
    import datetime as dt

    from sdc_mapreduce_spark.operators.relational import interval_overlap_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes, seconds=0):
        return t0 + dt.timedelta(minutes=minutes, seconds=seconds)

    left = [
        (1, "L1", ts(0), ts(300)),      # spans 5 buckets (span=1h)
        (1, "L2", ts(59), ts(61)),      # crosses one boundary
        (1, "L3", ts(120), ts(120)),    # zero-length on a boundary
        (2, "L4", ts(0), ts(30)),       # other key
    ]
    right = [
        (1, "R1", ts(250), ts(400)),    # overlaps L1 mid-way
        (1, "R2", ts(61), ts(61)),      # touches L2 at its end point
        (1, "R3", ts(0), ts(1000)),     # contains everything on key 1
        (2, "R4", ts(31), ts(40)),      # adjacent-but-disjoint from L4
    ]
    ldf = spark.createDataFrame(left, ["k", "lid", "ls", "le"])
    rdf = spark.createDataFrame(right, ["k", "rid", "rs", "re"])
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "k", "ls", "le", "rs", "re", span_seconds=3600
        ).collect()
    }
    naive = {
        (l[1], r[1])
        for l in left
        for r in right
        if l[0] == r[0] and l[2] <= r[3] and r[2] <= l[3]
    }
    assert got == naive
    # exactly-once even for the 5-bucket x containing-interval pair
    rows = interval_overlap_join(
        ldf, rdf, "k", "ls", "le", "rs", "re", span_seconds=3600
    ).collect()
    assert len(rows) == len(naive)


def test_triangle_stats_clique_plus_pendant(spark):
    """4-clique {1,2,3,4} + pendant edge 1-5: the clique holds exactly four
    triangles (each clique node in three of them), the pendant closes
    none. lcc is the exact nano-unit integer 2*T*1e9 div (d*(d-1)) — node 1
    has degree 4 (clique + pendant) so its coefficient halves, and
    duplicate/reversed input edges must not change any count."""
    from sdc_mapreduce_spark.functions.graph import triangle_stats

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    # reversed + duplicated edges exercise the canonicalize+distinct pass
    edges = spark.createDataFrame(
        clique + [(5, 1)] + [(b, a) for a, b in clique], "id_a long, id_b long"
    )
    got = {r["node"]: r for r in triangle_stats(edges).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert [got[n]["triangles"] for n in (1, 2, 3, 4, 5)] == [3, 3, 3, 3, 0]
    assert got[1]["degree"] == 4 and got[5]["degree"] == 1
    assert got[1]["lcc_nano"] == (2 * 3 * 10**9) // (4 * 3)  # 500_000_000
    assert got[2]["lcc_nano"] == 10**9  # closed neighborhood
    assert got[5]["lcc_nano"] == 0


def test_new_operators_handle_empty_inputs(spark):
    """Degenerate-input robustness: empty DataFrames must yield empty
    results, not ANSI/sequence/window errors."""
    import datetime as dt

    from sdc_mapreduce_spark.functions.dedup import (
        containment_pairs,
        exact_substring_dedup,
    )
    from sdc_mapreduce_spark.functions.graph import pagerank_integer
    from sdc_mapreduce_spark.functions.text import bigram_lm_scores
    from sdc_mapreduce_spark.operators.relational import (
        equidepth_histogram,
        interval_overlap_join,
        robust_anomalies,
    )

    no_docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_substring_dedup(no_docs).count() == 0
    assert containment_pairs(no_docs).count() == 0
    assert bigram_lm_scores(no_docs).count() == 0

    no_edges = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank_integer(no_edges).count() == 0
    from sdc_mapreduce_spark.functions.graph import triangle_stats

    assert triangle_stats(no_edges).count() == 0

    no_vals = spark.createDataFrame([], "id long, v double")
    assert equidepth_histogram(no_vals, "v", "id").count() == 0
    no_ev = spark.createDataFrame([], "event_id long, event_type string, value double")
    assert robust_anomalies(no_ev, ["event_type"], "value", "event_id").count() == 0

    t0 = dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1))], "k long, s timestamp_ntz, e timestamp_ntz"
    )
    no_iv = spark.createDataFrame([], "k long, s2 timestamp_ntz, e2 timestamp_ntz")
    assert interval_overlap_join(iv, no_iv, "k", "s", "e", "s2", "e2").count() == 0
    assert (
        interval_overlap_join(
            no_iv,
            iv.select("k", F.col("s").alias("s3"), F.col("e").alias("e3")),
            "k",
            "s2",
            "e2",
            "s3",
            "e3",
        ).count()
        == 0
    )


def test_asof_join_carried_row_is_atomic(spark):
    """Round-6 fix of ADVICE r5 #4: the right payload travels as ONE struct,
    so when the tie-break-winning right row has a NULL in one value column
    that NULL must survive — never backfilled from an earlier right row
    (which would tear the result across two right rows)."""
    left = spark.createDataFrame(
        [(1, ts(20), "L1")], "k int, t timestamp_ntz, lv string"
    )
    # Earlier right row has rv2 set; the winning (latest <= left) row has
    # rv1 set but rv2 NULL. A per-column last(ignorenulls) would return
    # (new, old2) — a row that never existed.
    right = spark.createDataFrame(
        [(1, ts(5), "old1", "old2"), (1, ts(10), "new1", None)],
        "k int, t timestamp_ntz, rv1 string, rv2 string",
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        right_value_cols=["rv1", "rv2"],
    ).collect()
    assert len(out) == 1
    assert out[0]["rv1"] == "new1" and out[0]["rv2"] is None


def test_cdc_apply_partition_invariant_and_tombstones(spark, sf_dir):
    """CDC apply must be independent of input partitioning (max-struct is
    associative/commutative) and must drop exactly the keys whose LATEST
    change is a tombstone."""
    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.events_queries import events_cdc_apply

    base = sorted(map(tuple, events_cdc_apply(spark, sf_dir).collect()))

    ev = load_table(spark, sf_dir, "events").repartition(17)
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("__last"),
    )
    shuffled = sorted(
        map(
            tuple,
            agg.filter(F.col("__last.event_type") != "error")
            .select(
                "user_id",
                F.col("__last.event_id").alias("last_event_id"),
                F.col("__last.event_type").alias("last_event_type"),
                F.col("__last.value").alias("last_value"),
                "n_changes",
            )
            .orderBy("user_id")
            .collect(),
        )
    )
    assert base == shuffled

    # python replica: latest by (ts, event_id); tombstone keys absent
    rows = load_table(spark, sf_dir, "events").collect()
    latest = {}
    counts = {}
    for r in rows:
        counts[r["user_id"]] = counts.get(r["user_id"], 0) + 1
        k = (r["ts"], r["event_id"])
        if r["user_id"] not in latest or k > latest[r["user_id"]][0]:
            latest[r["user_id"]] = (k, r)
    expected = sorted(
        (u, r["event_id"], r["event_type"], r["value"], counts[u])
        for u, (_, r) in latest.items()
        if r["event_type"] != "error"
    )
    assert base == expected


def test_scd2_history_run_collapse_and_intervals(spark):
    from sdc_mapreduce_spark.operators.relational import scd2_history

    rows = [
        # user 1: A A B A  -> runs A(t0) B(t2) A(t3)
        (0, ts(0), 1, "A"),
        (1, ts(1), 1, "A"),
        (2, ts(2), 1, "B"),
        (3, ts(3), 1, "A"),
        # user 2: single run
        (4, ts(0), 2, "X"),
        (5, ts(5), 2, "X"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "state"]).repartition(7)
    out = scd2_history(df, "user_id", "state", "ts", "event_id").collect()
    got = {
        (r["user_id"], r["version"]): (
            r["state"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in out
    }
    assert got == {
        (1, 1): ("A", ts(0), ts(2), False),
        (1, 2): ("B", ts(2), ts(3), False),
        (1, 3): ("A", ts(3), None, True),
        (2, 1): ("X", ts(0), None, True),
    }


def test_scd2_history_equal_ts_tiebreak_deterministic(spark):
    """Equal timestamps order by the tiebreak id, so the run boundaries and
    the surviving states are stable under any partition layout."""
    from sdc_mapreduce_spark.operators.relational import scd2_history

    rows = [(i, ts(0), 1, s) for i, s in enumerate(["B", "A", "B"])]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "state"])
    for n in (1, 5):
        out = scd2_history(
            df.repartition(n), "user_id", "state", "ts", "event_id"
        ).collect()
        assert [(r["version"], r["state"]) for r in sorted(out, key=lambda r: r["version"])] == [
            (1, "B"), (2, "A"), (3, "B")
        ]


def test_scd2_history_intervals_partition_time(spark, sf_dir):
    """On real event data: per user, version numbers are dense from 1,
    consecutive versions abut exactly (valid_to == next valid_from),
    consecutive states differ (true run-collapse), and only the last
    version is current with NULL valid_to."""
    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.operators.relational import scd2_history

    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(ev, "user_id", "event_type", "ts", "event_id").collect()
    by_user = {}
    for r in hist:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]
            assert not a["is_current"]
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None


def test_pit_enrichment_invariants(spark, sf_dir):
    """Every sampled event lands in the run it belongs to: the carried
    state equals the event's own type (runs are maximal), next_change_at is
    strictly after ts when present, and NULL exactly on current runs."""
    from sdc_mapreduce_spark.queries.events_queries import events_pit_enrichment

    rows = events_pit_enrichment(spark, sf_dir).collect()
    assert rows
    saw_null = saw_change = False
    for r in rows:
        assert r["state"] == r["event_type"]
        if r["next_change_at"] is None:
            assert r["secs_to_change"] is None
            saw_null = True
        else:
            assert r["next_change_at"] > r["ts"] and r["secs_to_change"] >= 0
            saw_change = True
    assert saw_null and saw_change


def test_grouped_regression_matches_numpy(spark, sf_dir):
    """Slope/intercept/r per group agree with a numpy closed-form replica
    on the same quantized (x, yc) series to float tolerance."""
    import numpy as np

    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.events_queries import events_grouped_regression

    got = {r["event_type"]: r for r in events_grouped_regression(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    t0 = min(r["ts"] for r in ev)
    series = {}
    for r in ev:
        x = int((r["ts"] - t0).total_seconds())
        y = round(r["value"] * 100) / 100.0
        series.setdefault(r["event_type"], []).append((x, y))
    assert set(got) == set(series)
    for et, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        r_np = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[et]["slope"] - slope) < 1e-9
        assert abs(got[et]["intercept"] - intercept) < 1e-6
        assert abs(got[et]["r"] - r_np) < 1e-9
        assert got[et]["n"] == len(pts)


def test_winsorize_clip_bounds(spark, sf_dir):
    """Clipped values stay inside the per-group band, flags fire exactly on
    tail rows, and unflagged rows pass through unchanged."""
    from sdc_mapreduce_spark.queries.events_queries import events_winsorize_clip

    rows = events_winsorize_clip(spark, sf_dir).collect()
    assert rows
    clipped = 0
    for r in rows:
        if r["clipped_low"] or r["clipped_high"]:
            clipped += 1
            assert r["value_clipped"] != r["value"]
        else:
            assert r["value_clipped"] == r["value"]
    # ~2% of rows sit outside [p1, p99] by construction
    assert 0 < clipped < len(rows) * 0.05


def test_chisq_independence_matches_python_replica(spark, sf_dir):
    """Per-cell expected counts and contributions agree with a pure-Python
    contingency replica; marginals reconstruct; contributions nonnegative."""
    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.surface_queries import table_chisq_independence

    got = table_chisq_independence(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    obs = {}
    for r in ev:
        k = (r["event_type"], r["user_id"] % 5)
        obs[k] = obs.get(k, 0) + 1
    n = sum(obs.values())
    rows = {}
    cols = {}
    for (x, y), c in obs.items():
        rows[x] = rows.get(x, 0) + c
        cols[y] = cols.get(y, 0) + c
    assert {(r["event_type"], r["cohort"]) for r in got} == set(obs)
    for r in got:
        k = (r["event_type"], r["cohort"])
        assert r["observed"] == obs[k]
        exp = rows[k[0]] * cols[k[1]] / n
        assert abs(r["expected"] - exp) < 1e-9 * exp
        assert r["chisq_contrib"] >= 0
        assert abs(r["chisq_contrib"] - (obs[k] - exp) ** 2 / exp) < 1e-9


def test_ks_two_sample_matches_scipy_style_replica(spark, sf_dir):
    """The two-phase KS equals a pure-Python CDF sweep over the pooled
    distinct values (scipy-style two-sample statistic, right-continuous
    CDFs), including the toward-smallest argmax tie-break."""
    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.operators.relational import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    got = ks_two_sample(ev, "value", "event_type", "purchase", "click").collect()[0]
    rows = ev.filter(F.col("event_type").isin(["purchase", "click"])).select(
        "event_type", "value"
    ).collect()
    a = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    b = sorted(r["value"] for r in rows if r["event_type"] == "click")
    import bisect

    best = (-1.0, None)
    for v in sorted(set(a) | set(b)):
        ca = bisect.bisect_right(a, v) / len(a)
        cb = bisect.bisect_right(b, v) / len(b)
        d = abs(ca - cb)
        if d > best[0]:
            best = (d, v)
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert abs(got["ks_stat"] - best[0]) < 1e-12
    assert got["at_value"] == best[1]


def test_ks_two_sample_partition_invariance(spark):
    """Identical distributions give ks=0-ish regardless of layout; a
    shifted group is detected with the same statistic at any partitioning."""
    import random

    rng = random.Random(7)
    rows = [(i, "a", round(rng.uniform(0, 100), 2)) for i in range(2000)]
    rows += [(i + 2000, "b", round(rng.uniform(10, 110), 2)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    from sdc_mapreduce_spark.operators.relational import ks_two_sample

    stats = [
        ks_two_sample(df.repartition(n), "v", "g", "a", "b").collect()[0]["ks_stat"]
        for n in (1, 13)
    ]
    assert stats[0] == stats[1] and stats[0] > 0.05


def test_mutual_information_matches_python_replica(spark, sf_dir):
    """mi_nats agrees with a pure-Python PMI accumulation over the same
    contingency table using the same micro-nat quantization; a uniform
    independent pair gives ~0."""
    import math

    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.surface_queries import table_mutual_information

    got = table_mutual_information(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    obs, rows, cols = {}, {}, {}
    for r in ev:
        k = (r["event_type"], r["user_id"] % 5)
        obs[k] = obs.get(k, 0) + 1
        rows[k[0]] = rows.get(k[0], 0) + 1
        cols[k[1]] = cols.get(k[1], 0) + 1
    n = len(ev)
    mi_micro = sum(
        c * round(math.log(c * n / (rows[x] * cols[y])) * 1_000_000)
        for (x, y), c in obs.items()
    )
    assert got["n"] == n
    assert got["mi_micro"] == mi_micro
    assert abs(got["mi_nats"]) < 0.01  # near-independent fixture


def test_attribution_last_touch_semantics(spark):
    """The credited touch is the latest strictly-preceding non-purchase
    row; purchases with no prior touch carry NULLs; purchase rows never
    attribute to other purchases."""
    from sdc_mapreduce_spark.queries import REGISTRY

    fn = REGISTRY["events_attribution_last_touch"].fn
    rows = [
        (0, ts(0), 1, "view", 1.0, "{}"),
        (1, ts(1), 1, "purchase", 2.0, "{}"),   # touch = 0 (view)
        (2, ts(2), 1, "purchase", 3.0, "{}"),   # still 0 (skip purchase 1)
        (3, ts(3), 1, "click", 4.0, "{}"),
        (4, ts(4), 1, "purchase", 5.0, "{}"),   # touch = 3 (click)
        (5, ts(0), 2, "purchase", 6.0, "{}"),   # no prior touch -> NULLs
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).repartition(5)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {r["event_id"]: r for r in fn(spark, d).collect()}
    assert got[1]["touch_event_id"] == 0 and got[1]["touch_type"] == "view"
    assert got[2]["touch_event_id"] == 0
    assert got[4]["touch_event_id"] == 3 and got[4]["secs_since_touch"] == 60
    assert got[5]["touch_event_id"] is None and got[5]["secs_since_touch"] is None


def test_gini_concentration_known_values(spark):
    """Equal totals give G=0; an extreme concentration approaches
    (n-1)/n; values match the closed-form replica; layout-invariant."""
    from sdc_mapreduce_spark.operators.relational import gini_concentration

    equal = spark.createDataFrame(
        [(k, 10.0) for k in range(8) for _ in range(3)], ["k", "v"]
    )
    r = gini_concentration(equal, "v", "k").collect()[0]
    assert r["n_keys"] == 8 and abs(r["gini"]) < 1e-12

    skewed = spark.createDataFrame(
        [(0, 1000000.0)] + [(k, 0.01) for k in range(1, 10)], ["k", "v"]
    )
    r2 = gini_concentration(skewed, "v", "k").collect()[0]
    assert r2["gini"] > 0.85

    # partition-layout invariance of the exact statistic
    for n in (1, 7):
        r3 = gini_concentration(skewed.repartition(n), "v", "k").collect()[0]
        assert r3["gini"] == r2["gini"]


def test_ks_and_gini_degenerate_inputs(spark):
    """An empty KS side raises instead of reporting NaN-as-no-drift; an
    all-zero measure yields an explicit NULL gini, not NaN."""
    import pytest

    from sdc_mapreduce_spark.operators.relational import (
        gini_concentration,
        ks_two_sample,
    )

    df = spark.createDataFrame([(1, "a", 1.0)], ["id", "g", "v"])
    with pytest.raises(ValueError, match="empty sample"):
        ks_two_sample(df, "v", "g", "a", "missing").collect()

    zeros = spark.createDataFrame([(k, 0.0) for k in range(3)], ["k", "v"])
    r = gini_concentration(zeros, "v", "k").collect()[0]
    assert r["total_centi"] == 0 and r["gini"] is None


def test_benford_audit_distribution_properties(spark, sf_dir):
    """Digits 1-9 each present at most once, fracs sum to 1, expected
    follows Benford exactly (literal table), excess = frac - expected."""
    from sdc_mapreduce_spark.queries.surface_queries import table_benford_audit

    rows = table_benford_audit(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["excess"] - (r["frac"] - r["expected"])) < 1e-12


def test_changepoint_cusum_maximizes_abs_cusum(spark, sf_dir):
    """The reported changepoint day must attain the max |cusum| among the
    type's daily deviations (replicated with a driver-side fold)."""
    from pyspark.sql import functions as F

    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.events_queries import events_changepoint_cusum

    got = {
        r["event_type"]: (r["changepoint_day"], r["cusum_micro"], r["n_days"])
        for r in events_changepoint_cusum(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.expr("sum(cast(round(value * 100) as bigint))").alias("sc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    by_type = {}
    for r in daily:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        gsc = sum(r["sc"] for r in rs)
        gcnt = sum(r["cnt"] for r in rs)
        import math
        cum, best = 0, None
        for r in rs:
            dev = r["sc"] / r["cnt"] - gsc / gcnt
            q = math.floor(dev * 10000 + 0.5) if dev >= 0 else -math.floor(-dev * 10000 + 0.5)
            cum += q
            if best is None or abs(cum) > abs(best[1]):
                best = (r["day"], cum)
        assert got[et] == (best[0], best[1], len(rs))


def test_k_anonymity_audit_flags_small_and_homogeneous_groups(spark):
    """A 3-member group fails k=3? No — meets k=3 exactly (boundary is
    inclusive); the 2-member group fails k; a group whose sensitive
    values are all equal fails l even when k passes."""
    from sdc_mapreduce_spark.operators.relational import k_anonymity_audit

    rows = (
        [("a", "x", i) for i in range(3)]        # size 3, 3 distinct
        + [("b", "x", 7), ("b", "x", 7)]          # size 2, homogeneous
        + [("c", "y", 1), ("c", "y", 1), ("c", "y", 1)]  # size 3, 1 distinct
    )
    df = spark.createDataFrame(rows, "qi1 string, qi2 string, s long")
    got = {
        (r["qi1"], r["qi2"]): r
        for r in k_anonymity_audit(df, ["qi1", "qi2"], "s", k=3, l=2).collect()
    }
    assert got[("a", "x")]["is_k_anonymous"] and got[("a", "x")]["is_l_diverse"]
    assert not got[("b", "x")]["is_k_anonymous"]
    assert got[("c", "y")]["is_k_anonymous"] and not got[("c", "y")]["is_l_diverse"]
    assert got[("c", "y")]["n_sensitive"] == 1


def test_weighted_median_selection_semantics(spark):
    """Weight-skewed fixture: values 1..4 with weights (1,1,1,7) — half of
    W=10 is reached only at value 4, while the unweighted median is 2.5;
    and the 2*cum >= W boundary is INCLUSIVE (weights (5,5): the first
    value already satisfies 2*5 >= 10)."""
    from sdc_mapreduce_spark.operators.relational import weighted_median
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "g", 1.0, 1), (2, "g", 2.0, 1), (3, "g", 3.0, 1), (4, "g", 4.0, 7)],
        "id long, g string, v double, w long",
    )
    r = weighted_median(df, ["g"], "v", F.col("w"), ["id"]).collect()[0]
    assert (r["total_weight"], r["wmedian"]) == (10, 4.0)

    df2 = spark.createDataFrame(
        [(1, "g", 1.0, 5), (2, "g", 2.0, 5)], "id long, g string, v double, w long"
    )
    r2 = weighted_median(df2, ["g"], "v", F.col("w"), ["id"]).collect()[0]
    assert r2["wmedian"] == 1.0


def test_time_decay_attribution_shares(spark, tmp_path):
    """Two touches at 0h and 1h before the purchase weight 1e6 and 5e5
    micro-units (one half-life), shares 2/3 and 1/3; a touch outside the
    1-day horizon and other users' touches contribute nothing; shares per
    purchase sum to 1."""
    import datetime as dt
    import os

    from sdc_mapreduce_spark.queries.events_queries import (
        events_attribution_time_decay,
    )

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(days=2), 10, "view", 0.0, "{}"),    # beyond horizon
        (2, t0 - dt.timedelta(hours=1), 10, "click", 0.0, "{}"),  # half-life away
        (3, t0, 10, "view", 0.0, "{}"),                            # gap 0
        (4, t0, 10, "purchase", 9.9, "{}"),
        (5, t0, 99, "view", 0.0, "{}"),                            # other user
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "decay")
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["touch_id"]: r for r in events_attribution_time_decay(spark, d).collect()}
    assert set(got) == {2, 3}
    assert got[3]["w_micro"] == 10**6 and got[2]["w_micro"] == 500000
    assert abs(got[3]["credit_share"] - 2 / 3) < 1e-12
    assert abs(got[2]["credit_share"] - 1 / 3) < 1e-12


def test_autocorrelation_detects_trend_vs_alternation(spark, tmp_path):
    """A monotone ramp must give r1 ~ +1, a perfect alternation r1 ~ -1 —
    the two extremes of the lag-1 audit."""
    import datetime as dt
    import os

    from sdc_mapreduce_spark.queries.events_queries import (
        events_autocorrelation,
    )

    t0 = dt.datetime(2024, 6, 1)
    rows = []
    for i in range(40):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "ramp", float(i), "{}"))
        rows.append(
            (100 + i, t0 + dt.timedelta(minutes=i), 1, "alt",
             float(i % 2), "{}")
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "ac")
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["event_type"]: r["r1"] for r in events_autocorrelation(spark, d).collect()}
    assert got["ramp"] > 0.99
    assert got["alt"] < -0.99


def test_table_psi_drift_matches_python(spark, sf_dir):
    """PSI audit vs a brute-force Python replay: period counts, exact
    shares, micro-quantized terms, and the total (r11)."""
    import math
    from collections import Counter
    from datetime import datetime

    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.queries.surface_queries import table_psi_drift

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    cutoff = datetime(2024, 1, 16)
    ref = Counter(r["event_type"] for r in ev if r["ts"] < cutoff)
    cur = Counter(r["event_type"] for r in ev if r["ts"] >= cutoff)
    cats = set(ref) | set(cur)
    # Laplace +1 smoothing (ADVICE r11): +1 per (category, period), totals
    # gain one pseudo-count per category — one-sided categories stay finite.
    t_ref = sum(ref.values()) + len(cats)
    t_cur = sum(cur.values()) + len(cats)
    def half_up(x: float) -> int:
        # Spark/DuckDB ROUND is half-away-from-zero; Python round() is
        # banker's — match the engines, not the stdlib
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    expected = {}
    for et in cats:
        sr, sc = (ref[et] + 1) / t_ref, (cur[et] + 1) / t_cur
        expected[et] = (
            ref[et],
            cur[et],
            half_up((sc - sr) * math.log(sc / sr) * 1e6),
        )
    rows = table_psi_drift(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    total = sum(v[2] for v in expected.values())
    for r in rows:
        n_ref, n_cur, term = expected[r["event_type"]]
        assert (r["n_ref"], r["n_cur"]) == (n_ref, n_cur)
        assert r["psi_term_micro"] == term
        assert r["psi_micro_total"] == total
    # balanced synthetic halves: drift should be small but the audit must
    # still resolve nonzero per-category movement at micro resolution
    assert any(r["psi_term_micro"] != 0 for r in rows)


def test_table_psi_drift_one_sided_category_is_finite(spark, tmp_path):
    """The canonical PSI failure mode (ADVICE r11): a category present in
    only one period must yield a FINITE, non-NULL term that the total
    includes — a brand-new category IS drift, not a dropped row."""
    import os

    from sdc_mapreduce_spark.queries.surface_queries import table_psi_drift

    ev = spark.createDataFrame(
        [("old", "2024-01-10 00:00:00")] * 50
        + [("old", "2024-01-20 00:00:00")] * 30
        + [("brand_new", "2024-01-20 00:00:00")] * 20,
        "event_type string, ts_s string",
    ).select("event_type", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    d = str(tmp_path / "psi1s")
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    rows = {r["event_type"]: r for r in table_psi_drift(spark, d).collect()}
    bn = rows["brand_new"]
    assert (bn["n_ref"], bn["n_cur"]) == (0, 20)
    assert bn["psi_term_micro"] is not None and bn["psi_term_micro"] > 0
    # the total must carry the new-category term, not drop it via NULL-sum
    assert bn["psi_micro_total"] == sum(
        r["psi_term_micro"] for r in rows.values()
    )
