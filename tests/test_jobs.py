"""Job control plane: FIFO ordering, status lifecycle, failure capture
(SURVEY.md O17 / §3.1 — the reference's ZK job queue semantics)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sdc_mapreduce_spark import jobs as J


def test_fifo_order_and_lifecycle(spark, tmp_path):
    q = J.JobQueue(state_dir=str(tmp_path / "state"))
    ran: list[int] = []

    def plan(tag):
        def _p(s):
            ran.append(tag)
            return s.range(3).select(F.col("id"))

        return _p

    j1 = q.submit(plan(1), name="first")
    j2 = q.submit(plan(2), name="second")
    assert q.status(j1) == J.CREATED and q.status(j2) == J.CREATED
    # next_created scans in sequence order — the reference master's
    # lowest-znode-first poll.
    assert q.next_created().job_id == j1

    n = J.JobRunner(spark, q).run_pending()
    assert n == 2
    assert ran == [1, 2]
    assert q.status(j1) == J.COMPLETED and q.status(j2) == J.COMPLETED
    assert q.job(j1).result_rows == 3
    # Durable job-spec: one JSON per job, like the znode tree.
    state = json.loads((tmp_path / "state" / "job_1.json").read_text())
    assert state["status"] == "COMPLETED" and state["name"] == "first"


def test_concurrent_queries_share_one_session(spark, sf_dir):
    """The engine as a multi-tenant query service: one SparkSession runs
    many queries concurrently (FAIR-ish interleaving of independent jobs —
    what the reference's single-slot workers could never do, SURVEY.md Q6).
    Every concurrent result must equal its sequential twin."""
    from concurrent.futures import ThreadPoolExecutor

    from sdc_mapreduce_spark.queries import REGISTRY

    names = ["q6_forecast_revenue", "join_semi", "set_union", "agg_distinct"]

    def run(name):
        return name, REGISTRY[name].fn(spark, sf_dir).collect()

    sequential = dict(run(n) for n in names)
    with ThreadPoolExecutor(max_workers=4) as pool:
        concurrent = dict(pool.map(run, names))
    for n in names:
        assert sorted(map(tuple, concurrent[n])) == sorted(
            map(tuple, sequential[n])
        ), n


def test_sink_and_failure(spark, tmp_path):
    q = J.JobQueue()
    out = tmp_path / "out"

    def ok_plan(s):
        return s.range(5).select(F.col("id").alias("key"), F.lit(1).alias("value"))

    j_ok = q.submit(ok_plan, sink=lambda df: df.write.mode("overwrite").parquet(str(out)))

    def bad_plan(s):
        raise ValueError("boom")

    j_bad = q.submit(bad_plan, name="bad")

    J.JobRunner(spark, q).run_pending()
    assert q.status(j_ok) == J.COMPLETED
    assert spark.read.parquet(str(out)).count() == 5
    # The reference stalls forever on failure (quirk Q7); we record FAILED.
    assert q.status(j_bad) == J.FAILED
    assert "boom" in q.job(j_bad).error


def test_queue_recovers_state_and_fails_orphans(spark, tmp_path):
    """Restart semantics: a new queue over the same state dir sees completed
    history unchanged, marks jobs caught mid-flight (RUNNING) or never
    started (CREATED) as FAILED with an orphan note, and continues the
    sequence numbering — no stall, no id reuse (the reference's master
    stalls forever on a lost task, quirk Q7)."""
    import json as _json

    from sdc_mapreduce_spark.jobs import JobQueue, JobRunner

    state = tmp_path / "state"
    q1 = JobQueue(state_dir=str(state))
    done_id = q1.submit(lambda s: s.range(3), name="done")
    JobRunner(spark, q1).run_pending()
    assert q1.status(done_id) == "COMPLETED"
    # simulate a crash mid-job: persist a RUNNING record by hand
    (state / "job_99.json").write_text(
        _json.dumps(
            {
                "job_id": 99,
                "name": "inflight",
                "status": "RUNNING",
                "submitted_at": 1.0,
                "started_at": 2.0,
                "finished_at": None,
                "error": None,
                "result_rows": None,
            }
        )
    )

    q2 = JobQueue(state_dir=str(state))
    assert q2.status(done_id) == "COMPLETED"
    assert q2.job(done_id).result_rows == 3
    assert q2.status(99) == "FAILED"
    assert "orphaned" in q2.job(99).error
    # recovered orphans are terminal: nothing pending to re-run
    assert q2.next_created() is None
    # sequence continues past the recovered max id
    new_id = q2.submit(lambda s: s.range(1), name="after-restart")
    assert new_id == 100


def test_recover_skips_corrupt_record(spark, tmp_path):
    """A truncated/garbage job file (external corruption; _persist itself is
    atomic) must not poison recovery of the healthy records."""
    from sdc_mapreduce_spark.jobs import JobQueue, JobRunner

    state = tmp_path / "state"
    q1 = JobQueue(state_dir=str(state))
    ok = q1.submit(lambda s: s.range(2), name="ok")
    JobRunner(spark, q1).run_pending()
    (state / "job_50.json").write_text('{"job_id": 50, "status": "RUNN')  # truncated

    q2 = JobQueue(state_dir=str(state))
    assert q2.status(ok) == "COMPLETED"
    assert 50 not in {j.job_id for j in q2.all()}


def test_submit_enforces_pending_bound_atomically():
    """The CREATED-backlog bound lives in submit, under the queue lock —
    the (N+1)th pending submit raises QueueFullError even with no HTTP
    pre-check in front of it."""
    import pytest

    q = J.JobQueue(max_pending=2)
    q.submit(lambda s: None, name="a")
    q.submit(lambda s: None, name="b")
    with pytest.raises(J.QueueFullError):
        q.submit(lambda s: None, name="c")
    # draining one slot reopens the bound
    q.job(1).status = J.CANCELLED
    assert q.submit(lambda s: None, name="c") == 3


def test_genuine_failure_during_cancel_stays_failed(spark):
    """A plan that raises an unrelated error while cancel_requested happens
    to be set must record FAILED with the real traceback — only the
    cancellation interrupt itself maps to CANCELLED."""
    q = J.JobQueue()
    runner = J.JobRunner(spark, q)

    def bad_plan(s):
        # simulate a cancel racing in just before the genuine failure
        q.job(jid).cancel_requested = True
        raise ValueError("plan bug, not a cancellation")

    jid = q.submit(bad_plan, name="bad")
    runner.run_pending()
    job = q.job(jid)
    assert job.status == J.FAILED
    assert "plan bug" in job.error


def test_job_conf_isolated_per_job_session(spark):
    """Job-scoped confs run on a child session: the shared session's value
    is untouched during and after a job that overrides it."""
    key = "spark.sql.files.maxPartitionBytes"
    before = spark.conf.get(key)
    seen = {}

    def plan(s):
        seen["in_job"] = s.conf.get(key)
        seen["shared_during"] = spark.conf.get(key)
        return s.range(1)

    q = J.JobQueue()
    runner = J.JobRunner(spark, q)
    jid = q.submit(plan, name="conf", conf={key: "12345678"})
    runner.run_pending()
    assert q.job(jid).status == J.COMPLETED
    assert seen["in_job"] == "12345678"
    assert seen["shared_during"] == before
    assert spark.conf.get(key) == before
