"""Batch source/sink builders (SURVEY.md §2.2 scans/sinks rows).

Thin, typed wrappers over ``spark.read``/``df.write`` that enforce the
engine's scan discipline:

* always pass an explicit schema for text formats (CSV/JSON) — schema
  inference is a full extra pass over 100 TB and type-drifts silently;
* parquet scans go through :mod:`reactive_kinesis_spark.tables` for the
  driver tables, or here for ad-hoc paths;
* writers default to snappy parquet with optional partitioning — the shape
  every downstream scan benefits from (partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BATCH_FORMATS = ("parquet", "csv", "json", "orc")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch scan of ``path``. CSV defaults: header=true. Explicit schema
    required for csv/json (no silent inference pass)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format: {fmt!r} (use {BATCH_FORMATS})")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(
            f"{fmt} scans require an explicit schema — inference costs a "
            "full extra pass and type-drifts at scale"
        )
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Batch write. Parquet+snappy default; ``partition_by`` produces the
    directory layout partition pruning needs."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format: {fmt!r} (use {BATCH_FORMATS})")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    buckets: int,
    bucket_by: list[str],
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted-within-bucket) table.

    Bucketing is the 100 TB answer to *recurring* joins/aggregations on the
    same key: both sides pre-hashed into the same number of buckets join
    with ZERO shuffle on every subsequent query — the exchange is paid once
    at write time instead of once per query. ``sort_by`` additionally
    pre-sorts within buckets so sort-merge joins skip their sort.

    Bucketed layout requires a catalog table (``saveAsTable``); pass
    ``path`` to keep the data external at an explicit location.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_range_layout(
    df: DataFrame,
    path: str,
    range_by: list[str],
    *,
    files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` range-clustered on ``range_by``: rows are range-
    partitioned (contiguous key bands per output file) and sorted within
    each file, so every parquet footer carries a TIGHT min/max band for
    the key.

    This is the layout lever for range predicates, the way
    :func:`write_bucketed` is for equi-joins: a time- or key-range scan
    then prunes at two levels — whole files via footer stats and row
    groups via chunk stats — reading O(selectivity) instead of O(corpus).
    On an unsorted layout every file spans nearly the full key range and
    min/max pruning is useless (each footer intersects every predicate);
    ``tests/test_joins_skew_io.py`` pins both directions. The range
    exchange is paid once at write time, amortized over every later scan
    — exactly the bucketing trade.

    ``repartitionByRange`` samples key quantiles, so bands are balanced
    even under skew (a hot day gets more files, not a bigger one).
    ``files`` bounds the file count (default: the session's shuffle
    partitions). Use alongside ``partition_by`` directory layout when the
    key has a natural coarse unit (e.g. ``partition_by=["date"]`` +
    range layout on ``ts`` inside each date).
    """
    n = files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = df.repartitionByRange(n, *range_by).sortWithinPartitions(*range_by)
    write_batch(out, path, fmt=fmt, mode=mode, **options)


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` Z-order-clustered on 2-4 numeric/timestamp columns:
    each row's columns are quantized to ``bits``-bit buckets over the
    observed [min, max], the bucket bits are interleaved into one Morton
    key, and the data is range-partitioned + sorted on that key.

    This is the MULTI-dimensional layout lever: :func:`write_range_layout`
    gives tight footer bands on ONE key (a second-column predicate then
    prunes nothing, because every file spans that column's full range);
    the Z-curve's locality gives every file a bounded band on EVERY
    clustered column at once, so predicates on any of them — alone or
    combined — skip files and row groups. The classic trade: per-column
    bands are a few times wider than a dedicated single-column sort would
    give, in exchange for pruning working on all d dimensions
    (``tests/test_joins_skew_io.py`` pins both effects structurally from
    the parquet footers).

    Quantization is EQUI-DEPTH: each column is bucketed by its own approx
    quantiles (one bounded driver-side probe of 2^bits − 1 boundaries per
    column), so buckets hold equal row mass and the interleaved key's
    high bits discriminate even on heavy-tailed columns — min/max-linear
    bucketing would map a skewed column's entire mass into a few low
    buckets and its Z-bits would never reach the file boundaries (the
    same reason equi-depth histograms beat equi-width ones for
    selectivity). NULLs bucket to 0 and cluster in the lowest files. The
    per-row bucket lookup is one JVM ``aggregate`` fold over the literal
    boundary array (no UDF, no join), and the interleave is pure bit
    arithmetic; the Z-exchange is paid once at write time, amortized over
    every later scan, exactly the bucketing trade.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError("write_zorder_layout needs 2-4 cluster columns")
    if not 1 <= bits <= 12:
        raise ValueError("bits must be in [1, 12]")
    n_buckets = 1 << bits
    d = len(cols)
    dbl = df.select(*[F.col(c).cast("double").alias(f"__q{i}") for i, c in enumerate(cols)])
    probs = [k / n_buckets for k in range(1, n_buckets)]
    quantiles = dbl.approxQuantile([f"__q{i}" for i in range(d)], probs, 0.001)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        bounds = sorted(set(quantiles[i])) if quantiles[i] else []
        if not bounds:
            bucket = F.lit(0).cast("long")  # constant/all-null column: no signal
        else:
            # bucket = #boundaries <= value: an O(2^bits) JVM fold per row,
            # paid once at layout time
            arr = F.array(*[F.lit(b) for b in bounds])
            v = F.col(c).cast("double")
            depth = F.coalesce(
                F.aggregate(
                    arr,
                    F.lit(0).cast("long"),
                    lambda acc, b: acc
                    + F.when(v >= b, F.lit(1).cast("long")).otherwise(
                        F.lit(0).cast("long")
                    ),
                ),
                F.lit(0).cast("long"),
            )
            # low-cardinality columns dedupe to few boundaries; rescale the
            # depth onto the full bit range so the HIGH interleave bits (the
            # ones file boundaries cut on) still discriminate
            bucket = F.floor(
                depth * F.lit(n_buckets - 1) / F.lit(len(bounds))
            ).cast("long")
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * d + i))
    n = files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    write_batch(out, path, fmt=fmt, mode=mode, **options)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog-table scan — bucketing metadata (bucket count/columns) rides
    along, letting Catalyst elide the shuffle in bucket-aligned joins."""
    return spark.table(table_name)


def file_stats(spark: SparkSession, path: str, fmt: str = "parquet") -> dict:
    """Data-file inventory for a dataset directory: ``n_files``,
    ``total_bytes``, ``avg_bytes`` — the health probe that decides whether
    :func:`compact_files` is due. Uses the Hadoop FileSystem API (same code
    path on local disk, HDFS, or s3a), recursing into partition
    subdirectories and skipping metadata/hidden files.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n = total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += st.getLen()
    return {
        "n_files": n,
        "total_bytes": total,
        "avg_bytes": (total / n) if n else 0.0,
    }


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column profile: one row per column in ``cols`` with
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)`` —
    the data-quality / stats-collection pass a pipeline runs on every new
    ingest (null-rate drift, cardinality sanity, range checks), and the
    numbers a cost-based optimizer wants.

    Shape: ONE corpus pass. All columns' aggregates run in a single
    ``agg`` — Catalyst plans the multi-``count_distinct`` with one Expand
    (input rows x |cols|, partial-aggregated map-side before the single
    shuffle); the final 1-row frame is unpivoted driver-free with
    ``stack``. Exact distinct counts by contract (that is what ANALYZE
    stores); for quick-look profiling at 100 TB swap in
    ``approx_count_distinct`` — one line, same plan minus the Expand.
    min/max aggregate in NATIVE column order, then cast to string for the
    uniform row shape (casting before the agg would compare '100' < '48').

    Identifier-safe by construction: the frame is positionally renamed
    (``toDF``) to ``__c0..__cN`` before any aggregation, so source column
    names never enter Catalyst's name resolver (which dot-parses even
    ``df[name]`` lookups) and reach the output only as ``F.lit`` string
    literals; internal aggregate aliases are positional too. A column
    named ``it's a.b`` or ``weird-col`` profiles fine (raw f-string
    splicing into ``selectExpr`` mis-parsed on quotes/spaces/dots/hyphens).
    """
    pos = {c: i for i, c in reversed(list(enumerate(df.columns)))}
    missing = [c for c in cols if c not in pos]
    if missing:
        raise ValueError(f"profile_table: columns not in frame: {missing}")
    safe = df.toDF(*[f"__c{i}" for i in range(len(df.columns))])
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        src = F.col(f"__c{pos[c]}")
        aggs += [
            F.count(src).cast("long").alias(f"__nn_{i}"),
            F.count_distinct(src).cast("long").alias(f"__nd_{i}"),
            F.min(src).cast("string").alias(f"__min_{i}"),
            F.max(src).cast("string").alias(f"__max_{i}"),
        ]
    one = safe.agg(*aggs)
    stack_args: list = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col("__n") - F.col(f"__nn_{i}"),
            F.col(f"__nd_{i}"),
            F.col(f"__min_{i}"),
            F.col(f"__max_{i}"),
        ]
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "col_name", "n_nulls", "n_distinct", "min_value", "max_value"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def compact_files(
    spark: SparkSession,
    path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    shuffle: bool = False,
) -> dict:
    """Rewrite a small-files dataset into ``ceil(total/target)`` right-sized
    files — the maintenance pass every long-running streaming sink needs:
    a micro-batch writer emits one file per trigger per partition, and a
    week of 10-second triggers is ~60k tiny files whose open/footer
    overhead dominates every subsequent scan (and breaks object-store
    listing long before that).

    ``shuffle=False`` (default) uses ``coalesce`` — no exchange, each
    output file unions whole input files; size skew across outputs is
    bounded by the input file sizes, which is exactly the small-file case.
    ``shuffle=True`` uses round-robin ``repartition`` for byte-exact
    balance at the cost of one full shuffle of the dataset.

    The rewrite stages into a sibling temp dir, then swaps directories via
    rename — atomic on posix/HDFS. On object stores without atomic rename,
    run the swap step under a table format's commit protocol instead; the
    compaction itself (read → re-layout → write) is identical. Readers
    started before the swap see the old listing — schedule compaction in
    the same maintenance window as checkpoint cleanup.

    Returns ``{before: file_stats, after: file_stats}``.
    """
    import math
    import os
    import shutil

    spark.catalog.refreshByPath(path)  # drop any stale cached listing
    before = file_stats(spark, path, fmt)
    if before["n_files"] == 0:
        return {"before": before, "after": before}
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes_per_file))
    df = spark.read.format(fmt).load(path)
    sized = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    tmp = path.rstrip("/") + "._compact_tmp"
    sized.write.format(fmt).mode("overwrite").save(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # the session's FileStatusCache still lists the pre-swap files; without
    # this, the next scan of `path` raises FILE_NOT_EXIST (found by driving
    # the swap end-to-end — the in-process analog of REFRESH TABLE)
    spark.catalog.refreshByPath(path)
    after = file_stats(spark, path, fmt)
    return {"before": before, "after": after}


def table_fingerprint(
    df: DataFrame,
    cols: list[str],
    group_by: str | None = None,
) -> DataFrame:
    """Order-independent content fingerprint of a table (optionally per
    group) — the cheap equality check for snapshot/migration validation:
    two tables with equal ``(n_rows, fingerprint)`` are, up to a ~2⁻⁵⁶
    per-row collision, identical multisets of rows on ``cols``. Because
    the fingerprint is a SUM of per-row hashes it is partition-,
    order-, and engine-independent (the same rows always sum to the same
    value) and aggregates map-side — one scan, one (tiny) shuffle, no
    sort. The portable-hash trick: 56 bits of md5 per row, summed as
    DECIMAL(38,0) (exact for ~10²¹ rows).

    Rows are canonicalized as ``col₁\\x1f col₂…`` with NULL → a sentinel
    distinct from any value; pass only columns whose string form is
    engine-portable (ints, strings, dates, timestamps — NOT doubles,
    whose text rendering is engine-specific).
    """
    repr_ = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in cols]
    )
    md5_hex = F.md5(repr_)
    row_h = F.conv(F.substring(md5_hex, 1, 14), 16, 10).cast("long")
    keys = [group_by] if group_by else []
    agg = df.select(*keys, row_h.alias("__h")).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("__h").cast("decimal(38,0)")).alias("fingerprint"),
    )
    return agg
