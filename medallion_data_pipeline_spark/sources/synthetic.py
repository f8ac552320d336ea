"""Custom Python DataSource (Spark 4 API): deterministic synthetic
event generator.

Demonstrates the `pyspark.sql.datasource` extension point — the
engine-native way to plug a bespoke source into `spark.read.format(...)`
so it participates in the planner like any built-in source (schema
known up front, work split across InputPartitions, executed on
executors, no driver-side materialization).

Rows are a pure function of (partition, row index) via md5, so any
cluster size / task retry produces identical data — the same
reproducibility contract as the deterministic samplers in
queries/llmops.py. Useful for load-testing pipelines at arbitrary
scale without shipping input data: `n_rows` and `n_partitions` options
dial the volume; each partition generates independently in parallel.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _h(seed: str) -> int:
    return int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        pid = partition.value
        per = self.n_rows // self.n_partitions
        start = pid * per
        end = self.n_rows if pid == self.n_partitions - 1 else start + per
        for i in range(start, end):
            h = _h(f"evt:{i}")
            ts = _EPOCH + timedelta(seconds=(h % 2_592_000))
            yield (
                i,
                ts.replace(tzinfo=None),
                h % 150,
                EVENT_TYPES[h % len(EVENT_TYPES)],
                round((h % 10_000) / 100.0, 2),
                '{"k": %d}' % (h % 100),
            )


class SyntheticEventsSource(DataSource):
    """`spark.read.format("synthetic_events").option("n_rows", N)` —
    register once per session with
    `spark.dataSource.register(SyntheticEventsSource)`."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string")

    def reader(self, schema):
        return SyntheticEventsReader(self.options)
