"""Job control plane: the reference's submit → queue → poll → complete UX
as a thin local facade (SURVEY.md O17 / §3.1-3.2).

The reference persists a job spec as ZooKeeper znodes
(/jobs/job_N/{status,shard_size,reducer_count,files} — reference
src/webclient/webclient.cpp:42-51), a master polls for the first job with
status CREATED in sequence order (reference src/master/master.cpp:300-336),
executes the fixed map→reduce DAG, then marks the znode COMPLETED
(reference src/master/master.cpp:374-381).

Here a job is a named DataFrame plan + sink; the queue is an in-process
FIFO (sequence-numbered like ZK sequential znodes) whose runner executes
one job at a time — the single-leader semantics of the reference master.
Spark's DAGScheduler replaces the task-level scheduling entirely
(SURVEY.md O18: FIFO × first-idle-worker becomes locality-aware task
slots); what this module keeps is the *durable job-spec + status
lifecycle* a user of the reference interacts with. Statuses mirror the
reference exactly: CREATED → RUNNING → COMPLETED (plus FAILED, which the
reference lacks — its phase barrier stalls forever on a lost task, quirk
Q7).
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

CREATED = "CREATED"
RUNNING = "RUNNING"
COMPLETED = "COMPLETED"
FAILED = "FAILED"


@dataclass
class Job:
    """One queued job: mirrors reference Job (src/master/job.h:5-23) minus
    the blob/shard plumbing Spark owns."""

    job_id: int
    plan: Callable[[SparkSession], DataFrame]
    sink: Callable[[DataFrame], None] | None = None
    name: str = ""
    # session confs applied for THIS job only (set before plan+action,
    # restored after) — e.g. the reference's per-job shard_size maps to
    # files.maxPartitionBytes without leaking into the shared session
    conf: dict[str, str] = field(default_factory=dict)
    status: str = CREATED
    submitted_at: float = field(default_factory=time.time)
    started_at: float | None = None
    finished_at: float | None = None
    error: str | None = None
    result_rows: int | None = None


class JobQueue:
    """Sequence-numbered FIFO with the reference's poll semantics.

    ``submit`` is the webclient's znode-create (reference
    src/webclient/webclient.cpp:42-51); ``next_created`` is the master's
    get_next_job scan — lowest sequence number with status CREATED
    (reference src/master/master.cpp:300-336, ordering
    src/util/zook.h:161-181).
    """

    def __init__(self, state_dir: str | None = None) -> None:
        self._jobs: dict[int, Job] = {}
        self._seq = 0
        self._lock = threading.Lock()
        self._state_dir = Path(state_dir) if state_dir else None
        if self._state_dir:
            self._state_dir.mkdir(parents=True, exist_ok=True)
            self._recover()

    def _recover(self) -> None:
        """Reload persisted job records on construction — the restart
        semantics the reference gets from ZooKeeper durability. Jobs found
        RUNNING belonged to a dead runner: mark them FAILED (with an
        explicit orphan note) rather than resuming — their plan callables
        died with the previous process. Contrast the reference, whose
        master stalls forever on a lost in-flight task (quirk Q7,
        SURVEY.md §2.1). CREATED jobs likewise cannot re-run (no plan), so
        they are failed with the same note; only their history survives."""
        for path in sorted(self._state_dir.glob("job_*.json")):
            try:
                rec = json.loads(path.read_text())
            except (OSError, json.JSONDecodeError):
                # _persist is atomic (tmp + replace), so a bad record means
                # external corruption; skip it rather than refusing to
                # recover every healthy job
                continue
            job = Job(
                job_id=rec["job_id"],
                plan=_unrecoverable_plan,
                name=rec.get("name", ""),
                status=rec["status"],
                submitted_at=rec.get("submitted_at") or 0.0,
                started_at=rec.get("started_at"),
                finished_at=rec.get("finished_at"),
                error=rec.get("error"),
                result_rows=rec.get("result_rows"),
            )
            if job.status in (CREATED, RUNNING):
                job.error = (
                    f"orphaned by runner restart (was {job.status}; plan not "
                    "recoverable across processes — resubmit)"
                )
                job.status = FAILED
                job.finished_at = job.finished_at or time.time()
            self._jobs[job.job_id] = job
            self._persist(job)
        if self._jobs:
            self._seq = max(self._jobs)

    def submit(
        self,
        plan: Callable[[SparkSession], DataFrame],
        sink: Callable[[DataFrame], None] | None = None,
        name: str = "",
        conf: dict[str, str] | None = None,
    ) -> int:
        with self._lock:
            self._seq += 1
            job = Job(
                job_id=self._seq, plan=plan, sink=sink, name=name, conf=conf or {}
            )
            self._jobs[job.job_id] = job
            self._persist(job)
            return job.job_id

    def next_created(self) -> Job | None:
        with self._lock:
            for jid in sorted(self._jobs):
                if self._jobs[jid].status == CREATED:
                    return self._jobs[jid]
        return None

    def status(self, job_id: int) -> str:
        return self._jobs[job_id].status

    def all(self) -> list[Job]:
        with self._lock:
            return [self._jobs[jid] for jid in sorted(self._jobs)]

    def job(self, job_id: int) -> Job:
        return self._jobs[job_id]

    def _persist(self, job: Job) -> None:
        # Durable job-spec analog of the znode tree: one JSON file per job.
        # Written atomically (tmp + rename) so a crash mid-persist — the
        # exact scenario recovery exists for — can never leave a truncated
        # record that poisons the next _recover.
        if not self._state_dir:
            return
        payload = json.dumps(
            {
                "job_id": job.job_id,
                "name": job.name,
                "status": job.status,
                "submitted_at": job.submitted_at,
                "started_at": job.started_at,
                "finished_at": job.finished_at,
                "error": job.error,
                "result_rows": job.result_rows,
            }
        )
        final = self._state_dir / f"job_{job.job_id}.json"
        tmp = final.with_suffix(".json.tmp")
        tmp.write_text(payload)
        os.replace(tmp, final)


def _unrecoverable_plan(spark):
    raise RuntimeError("job recovered from disk; its plan is not re-runnable")


class JobRunner:
    """Single-leader job executor: drains the queue one job at a time, like
    the reference master's execute loop (reference
    src/master/master.cpp:338-372) without the 5 s poll sleep — the queue
    signals instead of being polled."""

    def __init__(self, spark: SparkSession, queue: JobQueue) -> None:
        self.spark = spark
        self.queue = queue

    def run_pending(self) -> int:
        """Run every CREATED job in sequence order; return count executed."""
        n = 0
        while True:
            job = self.queue.next_created()
            if job is None:
                return n
            self._run(job)
            n += 1

    def _run(self, job: Job) -> None:
        job.status = RUNNING
        job.started_at = time.time()
        self.queue._persist(job)
        # job-scoped confs: in effect for plan construction AND the action
        # (file-split planning happens at action time), restored afterwards
        # so one job's shard_size never leaks into the shared session
        saved: dict[str, str | None] = {}
        for k, v in job.conf.items():
            saved[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)
        try:
            df = job.plan(self.spark)
            if job.sink is not None:
                job.sink(df)
            else:
                # No sink → still execute the plan (the reference never
                # returns results inline; completion IS the result).
                job.result_rows = df.count()
            job.status = COMPLETED
        except Exception:
            # error before status: status is the publish flag a concurrent
            # reader polls on, so every field it implies must land first
            job.error = traceback.format_exc(limit=10)
            job.status = FAILED
        finally:
            for k, old in saved.items():
                if old is None:
                    self.spark.conf.unset(k)
                else:
                    self.spark.conf.set(k, old)
            job.finished_at = time.time()
            self.queue._persist(job)
