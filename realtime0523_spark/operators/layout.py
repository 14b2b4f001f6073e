"""Multi-dimensional data layout: Z-order (Morton) clustering — the
multi-dimensional sibling of core/layout.py's directory partitioning
and within-file ordering (which prune on ONE column each).

The problem at 100 TB: min/max zone-map pruning (parquet row-group
stats, Delta/Iceberg file stats) only skips files for the ONE column
the data is sorted by. Queries that filter on a second dimension scan
everything. Interleaving the bits of two (or more) key columns into a
Morton code and range-partitioning + sorting by that code gives every
file a tight bounding RECTANGLE in (x, y) space, so zone maps prune on
BOTH dimensions — the technique behind Delta Lake's OPTIMIZE ZORDER
and Databricks' liquid clustering (Morton 1966; the classic multi-dim
indexing recipe).

Spark-first execution:
- the Morton code is a pure per-row JVM expression (shifts + masks,
  whole-stage-codegen'd — no UDF);
- the layout itself is `repartitionByRange(zval)` +
  `sortWithinPartitions(zval)` — a RANGE exchange (sampled split
  points, no global sort, no single-task bottleneck) followed by a
  partition-local sort, exactly what a sorted parquet/Delta write
  wants;
- effectiveness is MEASURABLE as the per-z-range bounding boxes:
  after z-clustering, each of the 2^prefix_bits code ranges covers a
  narrow x-span AND a narrow y-span (the inventory query
  `events_zorder` emits these boxes and the oracle checks them
  exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def morton_interleave(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Bit-interleaved Morton code of two non-negative ints truncated
    to `bits` bits each: bit i of x lands at position 2i, bit i of y
    at 2i+1. Pure integer shifts/masks — identical arithmetic exists
    in any SQL engine, and the expression stays inside codegen."""
    xs = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    ys = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + (
            F.shiftright(xs, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        ) + (
            F.shiftright(ys, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_repartition(
    df: DataFrame, zcol: str = "zval", n_partitions: int = 32
) -> DataFrame:
    """The write-side clustering: range-partition on the Morton code
    (sampled range exchange — NOT a global sort) and sort within each
    partition, so every output file is a contiguous z-range with tight
    per-file min/max on BOTH interleaved dimensions. Follow with
    .write.parquet(...) on a real pipeline."""
    return df.repartitionByRange(n_partitions, F.col(zcol)).sortWithinPartitions(zcol)


def zorder_boxes(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = ZORDER_BITS,
    prefix_bits: int = 8,
) -> DataFrame:
    """The pruning-effectiveness report: group rows by the top
    `prefix_bits` of their Morton code (= the z-range a clustered file
    would hold) and emit each range's row count and (x, y) bounding
    box. Tight boxes == zone maps prune on both dimensions. One
    partial-agg'd groupBy into 2^prefix_bits rows."""
    z = morton_interleave(x, y, bits)
    zbucket = F.shiftright(z, 2 * bits - prefix_bits)
    return (
        df.select(
            zbucket.alias("zbucket"),
            x.cast("bigint").alias("__x"),
            y.cast("bigint").alias("__y"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )


def pruning_report(
    df: DataFrame,
    x: Column,
    y: Column,
    predicates: list[tuple[int, int, int, int]],
    bits: int = ZORDER_BITS,
    prefix_bits: int = 8,
) -> DataFrame:
    """Quantified zone-map pruning: for each 2-D range predicate
    (x_lo, x_hi, y_lo, y_hi), how many of the 2^prefix_bits files
    must be read — and how many rows they hold — under (a) Z-order
    clustering vs (b) a plain x-sorted layout. A file is read iff its
    bounding box intersects the predicate box, exactly the decision
    parquet/Delta zone maps make from per-file min/max stats.

    ONE corpus scan: GROUPING SETS over (zbucket) and (xbucket)
    emits both layouts' zone maps in a single Expand + partial-agg'd
    shuffle to ≤2^(prefix_bits+1) box rows; the predicate table is a
    exploded literal array. Output per (predicate, layout): files_total,
    files_read, rows_read — the x-sorted layout reads ~every file
    the moment the filter touches y, the z-layout reads the
    rectangle's cover, and the gap IS the OPTIMIZE ZORDER benefit."""
    z = morton_interleave(x, y, bits)
    base = df.select(
        F.shiftright(z, 2 * bits - prefix_bits).alias("zbucket"),
        F.shiftright(x.cast("bigint"), bits - prefix_bits).alias("xbucket"),
        x.cast("bigint").alias("__x"),
        y.cast("bigint").alias("__y"),
    )
    boxes = (
        base.groupingSets(
            [[F.col("zbucket")], [F.col("xbucket")]],
            F.col("zbucket"),
            F.col("xbucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
        .select(
            F.when(F.col("zbucket").isNotNull(), F.lit("zorder"))
            .otherwise(F.lit("xsorted"))
            .alias("layout"),
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
        )
    )
    # predicates attach as an exploded LITERAL array — map-side
    # fan-out over the ≤2^(prefix_bits+1) box rows, never a join
    # operator (keeps the engine-wide no-cartesian plan invariant)
    preds = F.array(
        *[
            F.struct(
                F.lit(i).alias("pred_id"),
                F.lit(int(xl)).cast("long").alias("x_lo"),
                F.lit(int(xh)).cast("long").alias("x_hi"),
                F.lit(int(yl)).cast("long").alias("y_lo"),
                F.lit(int(yh)).cast("long").alias("y_hi"),
            )
            for i, (xl, xh, yl, yh) in enumerate(predicates)
        ]
    )
    hit = (
        F.col("x_min") <= F.col("p.x_hi")
    ) & (
        F.col("x_max") >= F.col("p.x_lo")
    ) & (
        F.col("y_min") <= F.col("p.y_hi")
    ) & (
        F.col("y_max") >= F.col("p.y_lo")
    )
    return (
        boxes.withColumn("p", F.explode(preds))
        .select("*", F.col("p.pred_id").alias("pred_id"))
        .groupBy("pred_id", "layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("files_read"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_read"),
        )
    )


def global_positions(
    df: DataFrame,
    order_cols: list,
    pos_col: str = "global_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank by `order_cols` WITHOUT a single-task
    sort — the scalable form of `row_number() OVER (ORDER BY …)`:

    1. `repartitionByRange(order_cols)`: a SAMPLED range exchange
       (every engine's scalable sort primitive) puts each partition on
       a disjoint, ordered key range;
    2. partition-local sort completes the total order;
    3. `monotonically_increasing_id()` encodes (partition, local row
       index) — pure metadata, no extra pass;
    4. per-partition row counts (|partitions| scalars to the driver)
       become cumulative offsets, broadcast-joined back;
    5. pos = offset[partition] + local index + 1.

    The sorted frame is materialized once (localCheckpoint) before the
    count pass: range boundaries come from sampling, so re-executing
    the exchange for a second action could re-draw them and misalign
    the offsets. A production writer persists this exact artifact
    anyway — the sorted output IS what it ships; the materialization
    is the write, not overhead. `order_cols` must be a UNIQUE total
    order (include a tie-break id) or ranks within ties follow the
    partition-local order.
    """
    if num_partitions is not None:
        d = df.repartitionByRange(num_partitions, *order_cols)
    else:
        d = df.repartitionByRange(*order_cols)
    d = d.sortWithinPartitions(*order_cols).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    d = d.localCheckpoint()  # pin partitioning + ids across both passes
    pid = F.shiftright("__mid", 33)
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    sizes = sorted(
        (r[0], r[1])
        for r in d.groupBy(pid.alias("__pid")).count().collect()
    )
    offsets, acc = [], 0
    for p, n in sizes:
        offsets.append((p, acc))
        acc += n
    off = df.sparkSession.createDataFrame(
        offsets, "__pid long, __off long"
    )
    return (
        d.withColumn("__pid", pid)
        .join(F.broadcast(off), "__pid")
        .withColumn(pos_col, F.col("__off") + local + 1)
        .drop("__pid", "__mid", "__off")
    )
