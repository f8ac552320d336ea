"""Streaming bronze ingest — the reference's streaming roadmap item
(reference README.md:502-506) over the file-source path.

The batch loader lands CSV exports with PERMISSIVE parsing and per-pk
ON CONFLICT upsert semantics (bronze/data_loader.py:74-77, 112-119).
This is the same contract as a continuous plan: watch a landing
directory with ``readStream``, and land each micro-batch through the
idempotent keyed merge sink (streaming/events.py::merge_sink) — new
files upsert on pk, replayed batches after restart are no-ops. Swapping
the file source for Kafka (events.py::read_kafka_event_stream) changes
nothing downstream: that unified model is the point of Structured
Streaming.

At 100 TB/day: the landing dir becomes an object-store prefix with
file-notification discovery, the merge becomes MERGE INTO on a
Delta/Iceberg bronze table, and maxFilesPerTrigger bounds batch size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.bronze import PRIMARY_KEYS
from .events import merge_sink


def read_csv_stream(spark: SparkSession, csv_dir: str, schema: str,
                    max_files_per_trigger: int = 1) -> DataFrame:
    """PERMISSIVE streaming CSV source over a landing directory.
    Schema is mandatory for streaming reads — pass the bronze
    accept-anything schema (ids + TEXT columns)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(csv_dir)
    )


def run_csv_ingest(spark: SparkSession, csv_dir: str, warehouse: str,
                   table: str, schema: str, checkpoint_dir: str,
                   max_files_per_trigger: int = 1) -> None:
    """Drain all currently-available landing files into bronze/<table>
    with per-pk last-write-wins merge, synchronously.

    Restart-safe: the checkpoint remembers consumed files, and the merge
    sink is idempotent on pk, so an at-least-once replay after a crash
    converges to the same bronze state.
    """
    stream = read_csv_stream(spark, csv_dir, schema, max_files_per_trigger)
    target = os.path.join(warehouse, "bronze", table)
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_sink(target, [PRIMARY_KEYS[table]]))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
