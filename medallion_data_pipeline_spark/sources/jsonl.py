"""Line-delimited JSON (JSONL) source and sink.

Web-crawl corpora — the raw input of every large-scale training-data
pipeline — arrive as (usually gzipped) JSONL: one document object per
line, schema known by contract, a non-trivial fraction of lines
malformed (truncated shards, encoding damage, mid-crawl schema
drift). The reference ingests its raw layer from CSV/Sheets
(`ingestion/data_loader.py`); this module is the JSONL analog with
the same bronze-layer philosophy: never drop bad input silently —
land it in a reject column and count it.

Scale contract (100 TB):

- **Explicit schema, never inference.** `spark.read.json` without a
  schema runs a FULL extra pass over the data just to infer types
  (and infers differently per shard sample). Callers pass the
  contract schema; the reader does one pass.
- **PERMISSIVE + corrupt-record capture.** Malformed lines land
  whole in ``corrupt_col`` with every data field NULL — the same
  audit-don't-drop contract as plans/silver.py's rejection split.
  ``mode="DROPMALFORMED"``/``"FAILFAST"`` pass through for callers
  that want them.
- **JSONL is splittable; gzip is not.** A .gz shard scans as ONE
  task no matter its size — fine at the many-small-shards layout
  crawls actually ship, pathological for single large files. The
  reader takes directories/globs and lets Spark parallelize over
  files; re-shard pathological inputs with sources/layout.py.
- **Column pruning still applies** (the Jackson parser skips
  unrequested fields), but there is no predicate pushdown and no
  row-group skipping — JSONL is the INGEST format; the first job of
  any pipeline here is bronze -> parquet (plans/bronze.py), after
  which every scan gets parquet's pushdown. The roundtrip query
  (queries/llmops.py::jsonl_ingest_roundtrip) gates losslessness of
  exactly that hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: default reject-capture column (Spark's conventional name — also
#: what `columnNameOfCorruptRecord` defaults to session-wide)
CORRUPT_COL = "_corrupt_record"


def corrupt_capture_schema(schema: T.StructType,
                           corrupt_col: str = CORRUPT_COL) -> T.StructType:
    """The contract schema plus the corrupt-record string column.

    Spark only POPULATES the corrupt column if it is present in the
    user schema — a permissive read without it silently NULLs bad
    rows instead of capturing them, which violates the bronze audit
    contract. Appended last so data columns keep their positions."""
    if corrupt_col in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())])


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType,
               mode: str = "PERMISSIVE",
               corrupt_col: str = CORRUPT_COL) -> DataFrame:
    """Read line-delimited JSON with an explicit contract schema.

    PERMISSIVE mode returns every input line as a row: parsed fields
    for good lines, ``corrupt_col`` holding the raw line (all data
    fields NULL) for bad ones. ``multiLine`` stays False — JSONL's
    one-object-per-line framing is what makes the format splittable;
    multiline JSON forces whole-file parse tasks."""
    reader = (spark.read
              .option("mode", mode)
              .option("multiLine", "false"))
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        schema = corrupt_capture_schema(schema, corrupt_col)
    return reader.schema(schema).json(path)


def split_rejects(df: DataFrame,
                  corrupt_col: str = CORRUPT_COL) -> tuple[DataFrame,
                                                           DataFrame]:
    """(good_rows_without_the_capture_column, reject_rows) — the
    bronze-layer split. Reject rows keep the data columns (PERMISSIVE
    fills whatever DID parse — e.g. a single type-drifted field nulls
    only itself — so partial parses stay inspectable) plus the whole
    raw line as ``raw_line``; callers append lineage (file, ingest
    ts) and land them in the audit sink exactly as plans/silver.py
    does for validation rejects.

    Pruning trap: Spark disallows raw-JSON plans whose SCAN ends up
    referencing only the internal corrupt column (UNSUPPORTED_FEATURE.
    QUERY_ONLY_CORRUPT_RECORD_COLUMN — corruption is only detectable
    while parsing data fields). A bare ``count()`` on EITHER side
    trips it (count prunes every data column, leaving just the
    corrupt-col filter). Supported ops: writes/collects of either
    side (full projection), and :func:`ingest_audit` for counting —
    never the cache()-the-whole-scan workaround the error message
    suggests, which is a non-starter at 100 TB."""
    good = (df.filter(F.col(corrupt_col).isNull())
            .drop(corrupt_col))
    bad = (df.filter(F.col(corrupt_col).isNotNull())
           .withColumnRenamed(corrupt_col, "raw_line"))
    return good, bad


def ingest_audit(df: DataFrame, corrupt_col: str = CORRUPT_COL):
    """One-pass (n_rows, n_good, n_rejects) over a permissive JSONL
    read. Deliberately aggregates a DATA column alongside the corrupt
    column: corruption is only detectable while parsing data fields,
    so Spark rejects any plan whose scan references the corrupt
    column alone (see split_rejects) — ``bad.count()`` prunes to
    exactly that and throws. This is the supported counting shape,
    and it's also the honest one: a bronze audit wants data-field
    stats in the same pass anyway."""
    data_cols = [f.name for f in df.schema.fields if f.name != corrupt_col]
    row = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(corrupt_col).alias("n_rejects"),
        # the data-column reference that keeps the scan legal (and a
        # useful null-rate signal in its own right)
        F.count(data_cols[0]).alias(f"n_nonnull_{data_cols[0]}"),
    ).collect()[0]
    return row.n_rows, row.n_rows - row.n_rejects, row.n_rejects


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                mode: str = "overwrite") -> None:
    """Write line-delimited JSON (one object per row-line). ``gzip``
    compression matches what crawl pipelines exchange; leave None for
    splittable plain text. Export-side twin of the CSV/ORC sinks in
    sources/sinks.py."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
