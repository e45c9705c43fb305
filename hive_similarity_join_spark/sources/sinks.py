"""Sinks and file-format ingest: the Hive DDL surface re-expressed
(SURVEY §2.1 — ``CREATE TABLE`` / ``LOAD DATA`` / ``INSERT OVERWRITE``,
text/ORC SerDes).

The reference family materializes every stage into HDFS tables in a
configured SerDe; here one writer covers the same surface through the
DataSource API:

- ``write_table``   — INSERT OVERWRITE / INSERT INTO (mode), any of
  parquet/orc/csv/json, optional Hive-style partition directories
  (``partition_by``) for partition-pruned readback.
- ``read_files``    — LOAD DATA schema-on-read with a DECLARED schema
  (engine rule: never infer in the engine proper; inference reads the
  data twice and can drift between runs).

Scale notes:
- Partition directories (``partitionBy``) are the Hive static-partition
  layout; readers prune them from the path, which ``.explain`` shows as
  PartitionFilters — at 100 TB the partition column choice (low-ish
  cardinality, filter-aligned) IS the table design.
- Columnar formats (parquet/orc) keep predicate pushdown + vectorized
  scans; csv/json are row SerDes for interchange — correct but not the
  scan path you want at scale, same trade the Hive TEXTFILE SerDe makes.
- ``maxRecordsPerFile`` caps output file size instead of a global
  ``coalesce(1)`` chokepoint; writers stay parallel per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")

# Row SerDes cannot carry nested types (Hive TEXTFILE has the same
# limitation without explicit collection delimiters).
_CSV_UNSUPPORTED = (T.ArrayType, T.MapType, T.StructType)

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _check_format(fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"format must be one of {FORMATS}, got {fmt!r}")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
) -> None:
    """INSERT OVERWRITE (mode='overwrite') / INSERT INTO (mode='append')
    into a directory table, optionally Hive-partitioned."""
    _check_format(fmt)
    if fmt == "csv":
        for f in df.schema.fields:
            if isinstance(f.dataType, _CSV_UNSUPPORTED):
                raise ValueError(
                    f"csv cannot serialize nested column {f.name!r} "
                    f"({f.dataType.simpleString()}); use parquet/orc/json"
                )
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "csv":
        # header carries column names; microsecond timestamp format keeps
        # TimestampType round-trips lossless for this data
        w = w.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        w = w.option("timestampFormat", _TS_FMT)
    w.format(fmt).save(path)


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType,
) -> DataFrame:
    """LOAD DATA: schema-on-read over a file directory with a DECLARED
    schema. Partition columns written by ``write_table(partition_by=...)``
    come back from the directory names automatically."""
    _check_format(fmt)
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        r = r.option("timestampFormat", _TS_FMT)
    return r.format(fmt).load(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style CLUSTERED BY ... INTO n BUCKETS (catalog table).

    THE shuffle-elimination tool for repeated big-big joins: two tables
    bucketed into the same count on the join key sort-merge-join with
    ZERO Exchange on either side — the shuffle is paid once at write
    time instead of per query. At 100 TB, bucket the fact tables on
    their join keys (orders/lineitem on the order key) and every later
    join/groupBy on that key is exchange-free; ``sort_cols`` adds
    in-bucket ordering so the SMJ skips its sort too.
    """
    _check_format(fmt)
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read; bucketing metadata rides along so Catalyst can
    plan exchange-free joins between co-bucketed tables."""
    return spark.table(table)
