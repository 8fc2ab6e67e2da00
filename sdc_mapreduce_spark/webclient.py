"""HTTP job-submission facade over the in-process JobQueue.

The reference exposes job submission as a tiny REST endpoint (reference
src/webclient/webclient.cpp:17-55): ``POST /`` with JSON
``{files, shard_size, reducer_count}`` validates the three fields, persists
a job spec (ZooKeeper znodes there, the JobQueue's JSON state dir here) and
replies ``"Job successfully submitted: <id>"``; a master process then picks
the job up and runs the fixed word-count DAG. This module is that surface
on Spark:

- ``POST /`` — same three required fields, same 400 messages on each
  missing field (webclient.cpp:23-28), plus an optional ``output_path``
  (the reference hard-codes its output blob name). The submitted job is the
  reference's one application: word count over the given text files,
  ``reducer_count`` partitions, partition-sorted KV text sink.
- ``GET /jobs/<id>`` — the status the reference stores in
  ``/jobs/job_N/status`` znodes and never exposes over HTTP (users read ZK
  directly); here it's a proper endpoint returning the full job record.
- ``GET /jobs`` — all job records, newest last.

A single daemon runner thread drains the queue FIFO — the reference
master's single-leader execute loop (src/master/master.cpp:338-372).
``shard_size`` maps to Spark's ``files.maxPartitionBytes`` for the job's
scan: the same knob (input bytes per map task) the reference's byte-range
sharder implements by hand (src/master/sharding.h:28-83).

Usage::

    server = JobServer(spark, port=0)   # port=0 -> ephemeral
    server.start()
    requests.post(f"http://localhost:{server.port}/", json={...})
    server.stop()
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from sdc_mapreduce_spark import mapreduce as mr
from sdc_mapreduce_spark.jobs import JobQueue, JobRunner, QueueFullError


def _wordcount_plan(files: list[str]):
    def plan(spark: SparkSession):
        return mr.word_count(mr.read_text(spark, files))

    return plan


def _kv_sink(output_path: str, reducer_count: int):
    def sink(df):
        mr.write_kv_text(
            df,
            output_path,
            key_col="word",
            value_col="cnt",
            num_partitions=reducer_count,
        )

    return sink


class _Handler(BaseHTTPRequestHandler):
    server_version = "SDCMapReduceSpark/1.0"

    # the ThreadingHTTPServer subclass below carries .queue/.runner
    def _reply(self, code: int, payload: dict | str) -> None:
        body = (
            json.dumps(payload) if isinstance(payload, dict) else payload
        ).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # silence per-request stderr noise
        pass

    def _read_json(self) -> dict | None:
        """Parse the drained request body; None means the 400 was sent."""
        try:
            return json.loads(self._body or b"{}")
        except ValueError:  # malformed JSON
            self._reply(400, {"error": "invalid JSON"})
            return None

    def do_POST(self):
        # drain the body FIRST, for every path: replying (404/409/429/...)
        # while the request body sits unread resets the connection on
        # non-trivial payloads, so the client sees a broken pipe instead of
        # the status code
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            # can't drain without a parseable length — reply 400 and close
            # the connection explicitly rather than guessing at the body
            self.close_connection = True
            return self._reply(400, {"error": "invalid Content-Length"})
        self._body = self.rfile.read(length) if length > 0 else b""
        parts = [p for p in self.path.split("/") if p]
        if len(parts) == 3 and parts[0] == "jobs" and parts[2] == "cancel":
            return self._cancel_job(parts[1])
        if self.path.rstrip("/") == "/queries":
            return self._submit_query()
        if self.path.rstrip("/") == "/mapreduce":
            return self._submit_legacy()
        if self.path.rstrip("/") not in ("", "/"):
            return self._reply(404, {"error": "not found"})
        body = self._read_json()
        if body is None:
            return None
        if self.server.backlog_full():
            return self._reply(429, {"error": "job queue full"})
        # field validation with the reference's exact messages
        # (webclient.cpp:23-28)
        if "reducer_count" not in body:
            return self._reply(400, {"error": "Reducer count missing"})
        if "shard_size" not in body:
            return self._reply(400, {"error": "Shard size missing"})
        if "files" not in body:
            return self._reply(400, {"error": "Input file paths missing"})
        files = body["files"]
        if not isinstance(files, list) or not files:
            return self._reply(400, {"error": "Input file paths missing"})
        try:
            reducer_count = int(body["reducer_count"])
            shard_size = int(body["shard_size"])
        except (TypeError, ValueError):
            return self._reply(
                400, {"error": "reducer_count and shard_size must be integers"}
            )
        output_path = body.get("output_path")

        sink = _kv_sink(output_path, reducer_count) if output_path else None
        try:
            job_id = self.server.queue.submit(
                _wordcount_plan([str(f) for f in files]),
                sink=sink,
                name=body.get("name", "wordcount"),
                # the reference's per-job shard_size, applied job-scoped by
                # the runner on an isolated child session (input bytes per
                # map task)
                conf={"spark.sql.files.maxPartitionBytes": str(shard_size)},
            )
        except QueueFullError:
            # the authoritative, lock-held bound (backlog_full() above is
            # only an advisory fast path — concurrent submits race it)
            return self._reply(429, {"error": "job queue full"})
        self.server.wake.set()
        return self._reply(
            200,
            {"job_id": job_id, "message": f"Job successfully submitted: {job_id}"},
        )

    def _cancel_job(self, job_id_raw: str):
        """POST /jobs/<id>/cancel: cancel a queued or running job (runner
        interrupts the Spark job group of a running one). Terminal jobs
        return 409 with their unchanged status."""
        try:
            job_id = int(job_id_raw)
            before = self.server.queue.job(job_id).status
        except (KeyError, ValueError):
            return self._reply(404, {"error": f"no job {job_id_raw}"})
        from sdc_mapreduce_spark.jobs import CREATED, RUNNING

        if before not in (CREATED, RUNNING):
            return self._reply(
                409, {"error": f"job {job_id} already {before}", "status": before}
            )
        status = self.server.runner.cancel(job_id)
        return self._reply(200, {"job_id": job_id, "status": status})

    def _submit_legacy(self):
        """POST /mapreduce — the reference's ALTERNATE (pre-ZooKeeper)
        submitter (reference src/app.py:8-13): a Flask route taking FORM
        fields ``shard_size`` and ``file`` and spawning the master as a
        fire-and-forget subprocess, replying ``{"message": "Job
        submitted"}`` with no job id. Same contract here — urlencoded form
        body, same two fields, same reply — except the job goes through the
        same bounded queue as every other submission instead of an
        unsupervised process spawn (the reference superseded this path with
        the ZK queue for exactly that reason)."""
        from urllib.parse import parse_qs

        form = {
            k: v[-1]
            for k, v in parse_qs(
                (self._body or b"").decode("utf-8", "replace")
            ).items()
        }
        # Flask's request.form['missing'] aborts with 400 — same here.
        if "shard_size" not in form or "file" not in form:
            return self._reply(400, {"error": "shard_size and file required"})
        try:
            shard_size = int(form["shard_size"])
        except ValueError:
            return self._reply(400, {"error": "shard_size must be an integer"})
        if self.server.backlog_full():
            return self._reply(429, {"error": "job queue full"})
        try:
            self.server.queue.submit(
                _wordcount_plan([form["file"]]),
                name="legacy-mapreduce",
                conf={"spark.sql.files.maxPartitionBytes": str(shard_size)},
            )
        except QueueFullError:
            return self._reply(429, {"error": "job queue full"})
        self.server.wake.set()
        # the legacy reply carries no job id (src/app.py:13) — byte-for-byte
        return self._reply(200, {"message": "Job submitted"})

    def _submit_query(self):
        """POST /queries {name, sf_dir?, output_path?}: run ANY registered
        query from the engine's inventory as a queued job — the step past
        the reference's single hard-coded application (its master runs only
        word count; here the control plane fronts the full query surface).
        Results land as parquet at output_path, or the job completes with
        result_rows only."""
        body = self._read_json()  # body already drained by do_POST
        if body is None:
            return None
        if self.server.backlog_full():
            return self._reply(429, {"error": "job queue full"})
        from sdc_mapreduce_spark.catalog import DEFAULT_SF_DIR
        from sdc_mapreduce_spark.queries import REGISTRY

        name = body.get("name")
        if not name:
            return self._reply(400, {"error": "query name missing"})
        if name not in REGISTRY:
            return self._reply(400, {"error": f"unknown query {name!r}"})
        sf_dir = str(body.get("sf_dir") or DEFAULT_SF_DIR)
        output_path = body.get("output_path")
        fn = REGISTRY[name].fn

        def plan(spark, _fn=fn, _sf=sf_dir):
            return _fn(spark, _sf)

        sink = None
        if output_path:
            def sink(df, _out=str(output_path)):
                df.write.mode("overwrite").parquet(_out)

        try:
            job_id = self.server.queue.submit(plan, sink=sink, name=f"query:{name}")
        except QueueFullError:
            return self._reply(429, {"error": "job queue full"})
        self.server.wake.set()
        return self._reply(
            200,
            {"job_id": job_id, "message": f"Job successfully submitted: {job_id}"},
        )

    def do_GET(self):
        parts = [p for p in self.path.split("/") if p]
        if parts == ["queries"]:
            from sdc_mapreduce_spark.queries import REGISTRY

            return self._reply(200, {"queries": sorted(REGISTRY)})
        if parts == ["jobs"]:
            return self._reply(
                200, {"jobs": [self._job_dict(j) for j in self.server.queue.all()]}
            )
        if len(parts) == 2 and parts[0] == "jobs":
            try:
                job = self.server.queue.job(int(parts[1]))
            except (KeyError, ValueError):
                return self._reply(404, {"error": f"no job {parts[1]}"})
            return self._reply(200, self._job_dict(job))
        return self._reply(404, {"error": "not found"})

    @staticmethod
    def _job_dict(job) -> dict:
        return {
            "job_id": job.job_id,
            "name": job.name,
            "status": job.status,
            "submitted_at": job.submitted_at,
            "started_at": job.started_at,
            "finished_at": job.finished_at,
            "error": job.error,
            "result_rows": job.result_rows,
        }


class JobServer(ThreadingHTTPServer):
    """HTTP facade + a bounded pool of runner threads over one JobQueue.

    ``max_concurrent`` (default 1 = the reference master's single-leader
    semantics) caps how many jobs execute at once inside the shared Spark
    session — Spark's FAIR/FIFO scheduler multiplexes their stages across
    the same executors, so the bound is about driver-side plan/action
    concurrency, not cluster slots. ``max_pending`` bounds the CREATED
    backlog: submissions past it get HTTP 429 instead of unbounded queue
    growth (the reference has no such guard — its queue is ZK-limited
    only)."""

    daemon_threads = True

    def __init__(
        self,
        spark: SparkSession,
        host: str = "127.0.0.1",
        port: int = 0,
        state_dir: str | None = None,
        max_concurrent: int = 1,
        max_pending: int | None = None,
    ) -> None:
        super().__init__((host, port), _Handler)
        self.queue = JobQueue(state_dir=state_dir, max_pending=max_pending)
        self.runner = JobRunner(spark, self.queue)
        self.max_concurrent = max(1, int(max_concurrent))
        self.max_pending = max_pending
        self.wake = threading.Event()
        self._stop = threading.Event()
        self._workers: list[threading.Thread] = []

    @property
    def port(self) -> int:
        return self.server_address[1]

    def backlog_full(self) -> bool:
        return (
            self.max_pending is not None
            and self.queue.pending_count() >= self.max_pending
        )

    def start(self) -> None:
        self._workers = [threading.Thread(target=self.serve_forever, daemon=True)]
        self._workers += [
            threading.Thread(target=self._run_loop, daemon=True, name=f"sdc-runner-{i}")
            for i in range(self.max_concurrent)
        ]
        for t in self._workers:
            t.start()

    def _run_loop(self) -> None:
        # event-driven drain, not the reference master's 5 s poll sleep
        while not self._stop.is_set():
            self.wake.wait(timeout=0.2)
            self.wake.clear()
            self.runner.run_pending()

    def stop(self) -> None:
        self._stop.set()
        self.wake.set()
        self.shutdown()
        for t in self._workers:
            t.join(timeout=5)
        self.server_close()

    def wait_for(self, job_id: int, timeout: float = 60.0) -> str:
        """Block until the job leaves CREATED/RUNNING; return final status."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            status = self.queue.status(job_id)
            if status not in ("CREATED", "RUNNING"):
                return status
            time.sleep(0.05)
        return self.queue.status(job_id)
