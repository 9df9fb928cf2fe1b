"""Physical data-layout operators — the part of a 100 TB lakehouse the
query engine never sees in the plan but lives or dies by at scan time:

  - **Z-order clustering**: interleave the bits of two scan dimensions
    and range-sort by the interleaved value, so parquet file/row-group
    min-max stats are tight in BOTH dimensions and a 2-D predicate skips
    most of the table (a linear sort is tight in one dimension and
    useless in the other).
  - **Small-file compaction**: rewrite a fragmented dataset into
    target-size files. Streaming/incremental writers leave thousands of
    tiny files per partition; scans then pay per-file open/footer costs
    and lose row-group locality. Compaction is the maintenance job every
    lakehouse table needs.
  - **Schema-evolution reads**: merge per-batch parquet schemas so old
    batches surface added columns as nulls — append-only ingestion
    survives schema growth without rewriting history.

The reference stores one whole-table parquet object per layer
(tasks/silver.py:84-89) — none of these concerns exist until the data
outgrows one file; all three are prerequisites at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_acordos_spark.functions.hashing import (
    KNUTH_C,
    M32,
    XX_PRIME,
    hash32,
)


def zorder_value(col_a: str, col_b: str, bits: int = 16) -> Column:
    """Morton/Z-order value: interleave the low *bits* bits of two
    non-negative integer columns (a-bits at even positions, b-bits at
    odd). One Catalyst expression — map-only, JVM-side, no UDF.

    Clamps each input to the *bits*-bit range first so outliers cannot
    wrap; with bits=16 the result fits in 32 bits of a BIGINT. Column
    names only (the SQL expression embeds them verbatim).
    """
    cap = (1 << bits) - 1
    a = f"cast(least(greatest({col_a}, 0), {cap}) as bigint)"
    b = f"cast(least(greatest({col_b}, 0), {cap}) as bigint)"
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) ->"
        f" acc + shiftleft(shiftright({a}, i) & 1, 2 * i)"
        f" + shiftleft(shiftright({b}, i) & 1, 2 * i + 1))"
    )


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> str:
    """Cluster *df* by the Z-order of (*col_a*, *col_b*) and write it.

    `repartitionByRange` + in-partition sort on the z-value gives a
    global clustering: each output file owns a contiguous z-range, which
    is a small rectangle in (a, b) space — so min-max stats are tight in
    both columns and 2-D predicates skip files/row-groups
    (tests/test_scale_paths.py measures the tightening vs a linear
    sort). The z-column is dropped before writing — it's a sort key, not
    data.
    """
    zed = df.withColumn("_z", zorder_value(col_a, col_b, bits))
    writer = (
        zed.repartitionByRange(F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    return path


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of a dataset directory (Hadoop FS metadata
    call — no data read)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    return int(fs.getContentSummary(hpath).getLength())


def dataset_file_count(spark: SparkSession, path: str) -> int:
    """Number of data files in a parquet dataset (via the scan's file
    index — counts what a query would actually open)."""
    return len(spark.read.parquet(path).inputFiles())


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> str:
    """Rewrite a fragmented parquet dataset into ~target-size files.

    File count = ceil(total_bytes / target): one round-robin shuffle —
    the only way to get even file sizes from skewed inputs — then one
    write. At 100 TB this runs per partition (compact only partitions
    whose file count exceeds a threshold), not table-wide; the demo
    compacts one dataset which IS one partition's worth.
    """
    total = dataset_bytes(spark, src_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(src_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return dst_path


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    shard_mult: int = KNUTH_C,
    order_mult: int = XX_PRIME,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export:
    assign each row a ``shard`` (hash bucket) and a ``pos`` (rank inside
    its shard by a SECOND, uncorrelated hash) — the standard way to get
    a reproducible corpus-wide shuffle at 100 TB without a total sort.

    A training run wants every epoch to stream the corpus in an order
    that is (1) statistically shuffled, (2) bit-reproducible across
    reruns and cluster layouts, and (3) writable as N independent shard
    files. A global ``ORDER BY random()`` is none of those; this is all
    three: shard = ``hash_a(id) mod n_shards``, pos = rank of
    ``hash_b(id)`` within the shard. The plan is one hash-partition
    exchange on ``shard`` plus an in-partition sort — each shard is
    produced by exactly one task, which then writes one file
    (``partitionBy("shard")`` at export time); no stage ever holds a
    global ordering. Two hash families (Knuth / xxhash32-prime
    multipliers) keep bucket choice and within-bucket order
    uncorrelated — with one family, within-shard order would be id
    order re-scaled, not a shuffle.

    Ids must be non-negative (functions/hashing.py sign convention).
    The 32-bit hash collides for ids congruent mod 2^32 (both families
    at once, since they share the modulus), so ``id_col`` is the final
    sort key: colliding pairs fall back to ascending-id order within
    the shard — output stays deterministic, at the price of a locally
    unshuffled run. Do NOT drop the id key as "redundant".

    The bucket is the hash's TOP bits — ``floor(h * n / 2^32)``, the
    Fibonacci-hashing range map — never ``h mod n``: a multiplicative
    hash's low bits are weak (``KNUTH_C mod 8 = 1``, so ``h mod 8`` of
    a sequential id column degenerates to ``id mod 8`` — round-robin,
    not a shuffle). The map is exact in DOUBLE arithmetic (h*n < 2^53
    for any sane shard count and 2^32 is a power of two), so the
    oracle's replay is bit-identical.
    """
    if n_shards < 1:
        raise ValueError(f"shuffle_shard: n_shards must be >= 1, got {n_shards}")
    h_shard = F.floor(
        hash32(F.col(id_col), shard_mult).cast("double")
        * n_shards
        / F.lit(float(M32))
    ).cast("int")
    h_order = hash32(F.col(id_col), order_mult)
    w = Window.partitionBy("shard").orderBy(
        F.col("_ord").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("shard", h_shard)
        .withColumn("_ord", h_order)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_ord")
    )


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Read a multi-batch parquet dataset unioning all batch schemas
    (columns absent in older batches surface as nulls). Spark reads one
    footer per distinct schema, not per file — cheap even at 100 TB
    file counts."""
    return spark.read.option("mergeSchema", "true").parquet(path)
