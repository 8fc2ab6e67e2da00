"""Custom Python DataSource (Spark 4 DataSource API) for the reference's
key-value text format.

The reference's entire data model is lines of ``"<key> <value>"`` in text
blobs, scanned as fixed-size byte shards with record-aligned boundaries
(reference src/util/shard.h:7-16, src/master/sharding.h:27-83 byte-range
packing; src/worker/worker.cpp:124-182 boundary adjustment;
src/app/reducer.py:11-24 malformed-row drop). This module re-expresses that
contract as a first-class pluggable Spark source:

- ``partitions()`` is the reference's shard planner: fixed ``shard_size``
  byte ranges per file, tail shard smaller — each range becomes one Spark
  input partition, so scan parallelism is data-size-driven exactly like the
  reference's master (SURVEY.md O6).
- ``read()`` applies the line-boundary protocol (the robust form of the
  reference's isalnum ±lookahead adjustment, SURVEY.md O7/Q5): a partition
  starting mid-file discards its partial first line and reads one line past
  its end — every line is produced by exactly one partition, no
  double/half-reads.
- malformed pairs (wrong token count, non-integer value) are dropped, the
  reference's reducer semantics (SURVEY.md O15).

Usage::

    spark.dataSource.register(KVTextDataSource)
    df = (spark.read.format("kvtext")
          .option("path", "/data/pairs.txt")
          .option("shard_size", 50000).load())
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DEFAULT_SHARD_SIZE = 50_000  # the reference client's SHARD_SIZE default
# (reference clientsdk/job_details.py:5)


class KVShard(InputPartition):
    """One byte range of one file — the Spark twin of the reference's
    ShardFileInfo {startOffset, endOffset, fileName} (src/util/shard.h:7-11).
    """

    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class KVTextReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext: 'path' option is required")
        self.shard_size = int(options.get("shard_size", DEFAULT_SHARD_SIZE))
        if self.shard_size <= 0:
            raise ValueError("kvtext: shard_size must be positive")
        if os.path.isdir(path):
            self.paths = sorted(
                p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p)
            )
        else:
            self.paths = [path]
        if not self.paths:
            raise ValueError(f"kvtext: no files under {path!r}")

    def partitions(self):
        # Fixed-size byte shards, tail shard smaller — the reference's
        # createShardAllocations without the multi-file packing (Spark tasks
        # are cheap; one partition per range is the simpler equivalent of
        # packing file tails together).
        shards: list[KVShard] = []
        for p in self.paths:
            size = os.path.getsize(p)
            start = 0
            while start < size:
                end = min(start + self.shard_size, size)
                shards.append(KVShard(p, start, end))
                start = end
        return shards or [KVShard(self.paths[0], 0, 0)]

    def read(self, partition: KVShard) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                # line-boundary protocol: the partition to our left owns the
                # line spanning the boundary — skip to the next full line
                fh.readline()
            while fh.tell() <= partition.end:
                raw = fh.readline()
                if not raw:
                    break
                parts = raw.decode("utf-8", errors="replace").split()
                if len(parts) != 2:
                    continue  # malformed: wrong token count (O15)
                try:
                    value = int(parts[1])
                except ValueError:
                    continue  # malformed: non-integer value (O15)
                yield (parts[0], value)
                # note: the loop condition uses tell() BEFORE the read, so a
                # line that starts exactly at `end` belongs to the next
                # partition, and a line starting before `end` is fully
                # consumed here even if it extends past it


class KVTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return "key string, value long"

    def reader(self, schema) -> KVTextReader:
        return KVTextReader(self.options)


def register_kvtext(spark) -> None:
    spark.dataSource.register(KVTextDataSource)
