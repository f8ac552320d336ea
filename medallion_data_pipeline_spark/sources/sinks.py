"""Output sinks (SURVEY §2.1 S6-S10, §2.6 O4).

The reference pushes gold marts to a remote PostgreSQL with hand-rolled
batching (fetchmany 10k / execute_values 5k / commit every 3 batches /
3 threads, gold/push.py:127-163,194-207). In Spark every one of those
knobs is a JDBC writer option, and "3 threads" becomes submitting the
table writes as concurrent jobs — the driver schedules them onto the
same executors.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def derby_url(db_path: str, create: bool = True) -> tuple[str, dict]:
    """(url, properties) for Spark's EMBEDDED Derby — the database
    engine Spark already ships for its Hive metastore, so a real
    ``write.jdbc`` → ``read.jdbc`` → :func:`verify_push` round-trip
    runs with no external server (this is how the sandbox test suite
    executes the S6/S7 path for real). Single-JVM engine: fine in
    local mode and for tests; a cluster pushes to a networked RDBMS
    via the same `push_jdbc` with a different url/driver. Note Derby
    caps DECIMAL precision at 31 — cast wider decimals (or to double)
    before pushing, exactly as you would for any dialect mismatch."""
    url = f"jdbc:derby:{db_path}" + (";create=true" if create else "")
    return url, {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def push_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
              batchsize: int = 5000, properties: dict | None = None) -> None:
    """Batched JDBC sink (S6): the reference's execute_values paging is
    the `batchsize` option; DDL replication is `createTableColumnTypes`
    if needed."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def push_tables_parallel(tables: dict[str, DataFrame], url: str,
                         max_workers: int = 3, **kw) -> dict[str, bool]:
    """Parallel multi-table push (S7): ThreadPoolExecutor submits the
    JDBC writes concurrently (reference gold/push.py:194-207); Spark's
    scheduler interleaves the jobs. Returns per-table success."""
    results: dict[str, bool] = {}

    def _push(item):
        name, df = item
        try:
            push_jdbc(df, url, name, **kw)
            return name, True
        except Exception:
            return name, False

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        for name, ok in ex.map(_push, tables.items()):
            results[name] = ok
    return results


def upsert_jdbc(df: DataFrame, url: str, table: str, pk: list[str],
                properties: dict | None = None,
                staging: str | None = None) -> None:
    """Idempotent keyed upsert into a serving RDBMS: stage the frame
    with the batched JDBC writer, then ONE server-side ``MERGE INTO``
    keyed on ``pk``, executed over the driver's ``java.sql`` connection
    (same JVM, no extra client library). Replays and re-emitted keys
    collapse to last-write-wins — the reference's TRUNCATE+INSERT page
    loop (gold/push.py:136-147) upgraded to exactly-once-over-replays.
    Works on any MERGE-capable RDBMS (Derby / Postgres 15+ / SQL
    Server / Oracle); the in-sandbox test drives it against embedded
    Derby end-to-end. Identifiers are double-quoted to match the JDBC
    writer's quoted (case-sensitive) column names; the target is
    created from the staging table's shape on first use. String
    columns are created as VARCHAR (not the dialect's default
    CLOB/TEXT) — MERGE compares the pk columns, and LOB types are not
    comparable (Derby: 'Comparisons between CLOB and CLOB are not
    supported').

    Input contract, enforced here so the MERGE cannot misfire: rows
    are deduplicated on ``pk`` (a multi-matching source row aborts a
    SQL MERGE) and NULL-pk rows are DROPPED (NULL never matches an ON
    clause, so replays would re-insert them forever — the opposite of
    idempotence). Which duplicate survives is arbitrary; pre-reduce
    upstream (e.g. max_by) if the choice matters."""
    df = df.dropna(subset=pk).dropDuplicates(pk)
    staging = staging or f"{table}_staging"
    properties = dict(properties or {})
    if "createTableColumnTypes" not in properties:
        str_cols = [f.name for f in df.schema.fields
                    if f.dataType.simpleString() == "string"]
        if str_cols:
            properties["createTableColumnTypes"] = ", ".join(
                f"{c} VARCHAR(1024)" for c in str_cols)
    push_jdbc(df, url, staging, mode="overwrite", properties=properties)

    spark = df.sparkSession
    jvm = spark._jvm
    driver = properties.get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    # carry the connection properties (user/password/ssl...) into the
    # driver-side MERGE connection, not just into the Spark writer —
    # createTableColumnTypes etc. are writer-only and harmless here
    jprops = jvm.java.util.Properties()
    for k, v in properties.items():
        if k not in ("driver", "createTableColumnTypes", "batchsize"):
            jprops.setProperty(k, str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        st = conn.createStatement()
        md = conn.getMetaData()
        # engines fold unquoted identifiers differently (Derby/Oracle
        # -> UPPER, Postgres -> lower); ask the driver which
        if md.storesUpperCaseIdentifiers():
            lookup = table.upper()
        elif md.storesLowerCaseIdentifiers():
            lookup = table.lower()
        else:
            lookup = table
        tables = md.getTables(None, None, lookup, None)
        if not tables.next():
            st.executeUpdate(
                f"CREATE TABLE {table} AS SELECT * FROM {staging} "
                "WITH NO DATA")
        cols = df.columns
        q = '"{}"'.format
        on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk)
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in cols if c not in pk)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
        ins_cols = ", ".join(q(c) for c in cols)
        ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
        st.executeUpdate(
            f"MERGE INTO {table} t USING {staging} s ON {on} "
            f"{matched}"
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) "
            f"VALUES ({ins_vals})")
    finally:
        conn.close()


def verify_push(local: DataFrame, remote: DataFrame) -> tuple[bool, int, int]:
    """Count verification after push (reference gold/push.py:165-181):
    both sides must match and be > 0."""
    a, b = local.count(), remote.count()
    return (a == b and a > 0), a, b


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV export sink (S8, the UI download path). single_file coalesces
    to one part — driver-bottleneck by design, only for result-set
    sized frames (the reference exports query results, not facts)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def reset_warehouse(warehouse: str, layers: tuple[str, ...] = ("bronze", "silver", "gold", "audit")) -> None:
    """Bulk delete/reset (S10, reference delete_all_data.py): drop layer
    directories; no sequences to reset in Spark."""
    import shutil

    for layer in layers:
        shutil.rmtree(os.path.join(warehouse, layer), ignore_errors=True)


def truncate_log(df: DataFrame, ts_col: str, keep: int = 100) -> DataFrame:
    """Keep-last-N log truncation (O4, reference scheduler_manager.py:285)."""
    return df.orderBy(F.desc(ts_col)).limit(keep)


def export_orc(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """ORC export sink — the columnar interchange format next to
    parquet (both ship in Spark; no extra package). Keeps predicate
    pushdown + column pruning on re-read; optional partition column
    for downstream pruning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC source: schema from file footers, pushdown-capable."""
    return spark.read.orc(path)

