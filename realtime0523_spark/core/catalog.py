"""Schema registry + table catalog.

The reference declares schema-by-convention via Scala case classes
parsed with fastjson (e.g. reference scala/…/bean/Order_info.scala:7-29,
parse at scala/…/dwd/Ods_to_DWD_order_info.scala:58 — missing fields
silently null). Our engine makes schemas explicit: every table the
engine reads has a registered StructType, and loads validate against
it. Missing-field→null CDC semantics are reproduced by
`from_json(..., PERMISSIVE)` in the streaming layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- driver testdata tables (TESTDATA.md) -------------------------------

TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Some fixture generations store timestamps as parquet TIMESTAMP(NANOS),
# which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). For
# those columns we read raw int64 nanos (spark.sql.legacy.parquet.
# nanosAsLong) and convert to TimestampType at microsecond precision —
# the same truncation DuckDB applies, so oracle comparisons line up.
#
# The unit is NOT hard-coded: it is probed from the parquet footer per
# table (see `nano_ts_cols`), because the fixture generator has shipped
# both NANOS and MICROS over time and guessing wrong silently collapses
# every timestamp into 1970 (micros div 1000 ≈ epoch + minutes).


def _footer_file(path: str) -> str:
    """Resolve `path` (a parquet file, or a directory of part files) to
    one concrete file whose footer represents the table's physical
    schema. Footer reads are metadata-only — no data pages touched —
    so this stays O(1) regardless of table size."""
    import glob
    import os

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            glob.glob(os.path.join(path, "part-*"))
        )
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        return parts[0]
    return path


def probe_ts_cols(path: str, schema: T.StructType, table: str) -> list[str]:
    """One footer open per table load: validates timestamp sanity
    (raises on garbage) and returns the columns needing the
    INT64-nanos read path. `nano_ts_cols` / `assert_ts_sanity` are
    thin views of this — use probe_ts_cols on load paths so the footer
    (a full round-trip on object stores) is opened once, not 3-4×."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    declared = [f.name for f in schema.fields if isinstance(f.dataType, T.TimestampType)]
    if not declared:
        return []
    pf = pq.ParquetFile(_footer_file(path))
    arrow_schema = pf.schema_arrow
    md = pf.metadata

    # sanity 1: a TimestampType column stored as a raw integer with no
    # timestamp logical type has an unknowable unit — refuse at load
    # with a clear message, not a mid-query executor crash.
    for name in declared:
        if name in arrow_schema.names and pa.types.is_integer(arrow_schema.field(name).type):
            raise ValueError(
                f"{table}.{name} is declared TimestampType but stored as a "
                f"raw integer without a timestamp logical type — the unit "
                f"is unknowable from the footer. Regenerate the fixture "
                f"with real parquet timestamps (any unit works; it is "
                f"probed), or load the column as a long explicitly."
            )

    # sanity 2: epoch-collapse tripwire. A wrong unit shows up as every
    # timestamp near 1970 (micros divided as nanos → 1970-01-20; nanos
    # read as micros → inside 1970); 1975 is far above any unit mix-up
    # yet below legitimately historical data (TPC-H dates start 1992).
    # Footer statistics are metadata-only — free at any table size.
    if md.num_row_groups > 0:
        rg = md.row_group(0)
        arrow_names = [md.schema.column(i).name for i in range(md.num_columns)]
        for i, name in enumerate(arrow_names):
            if name not in declared:
                continue
            stats = rg.column(i).statistics
            if stats is None or not stats.has_min_max:
                continue
            year = getattr(stats.min, "year", None)
            if year is not None and year < 1975:
                raise ValueError(
                    f"{table}.{name}: parquet footer min statistic is "
                    f"{stats.min!r} (near the 1970 epoch). This usually "
                    f"means the fixture was written with a different "
                    f"timestamp unit than expected — refusing to load "
                    f"garbage timestamps."
                )

    # unit probe: only INT64 TIMESTAMP(NANOS) needs the nanosAsLong
    # escape hatch. Legacy INT96 also surfaces as timestamp[ns] in
    # pyarrow but Spark reads it natively.
    physical = {
        md.schema.column(i).name: md.schema.column(i).physical_type
        for i in range(md.num_columns)
    }
    return [
        name
        for name in declared
        if name in arrow_schema.names
        and pa.types.is_timestamp(arrow_schema.field(name).type)
        and arrow_schema.field(name).type.unit == "ns"
        and physical.get(name) == "INT64"
    ]


def nano_ts_cols(path: str, schema: T.StructType) -> list[str]:
    """Which of `schema`'s TimestampType columns need the INT64-nanos
    read path (see probe_ts_cols)."""
    return probe_ts_cols(path, schema, table="<unnamed>")


def assert_ts_sanity(path: str, schema: T.StructType, table: str) -> None:
    """Run only the sanity checks of probe_ts_cols (raises on garbage
    timestamps; see there for the rules)."""
    probe_ts_cols(path, schema, table)

# Dimension tables small enough to broadcast at any scale factor
# (mirrors the reference's hand-built broadcast of province/sku dims,
# reference scala/…/dwd/Ods_to_DWD_order_info.scala:171,
# scala/…/dim/SkuInfoApp.scala:81).
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


@dataclass
class Catalog:
    """Loads registered tables from a scale-factor directory.

    At cluster scale the same catalog would point at partitioned /
    bucketed table roots; the API (name → DataFrame with a verified
    schema) is storage-independent.
    """

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # The engine's timestamp semantics are UTC (SURVEY §1.2); the
        # driver/judge may hand us a session created on a non-UTC
        # machine, where date_format() would silently shift days/hours
        # away from the TZ-naive DuckDB oracle. Pin it here so every
        # query is self-sufficient.
        self.spark.conf.set("spark.sql.session.timeZone", "UTC")

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; registered: {sorted(TABLES)}")
        if name not in self._cache:
            schema = TABLES[name]
            path = f"{self.sf_dir}/{name}.parquet"
            ts_cols = probe_ts_cols(path, schema, name)
            if ts_cols:
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                physical = T.StructType(
                    [
                        T.StructField(f.name, T.LongType() if f.name in ts_cols else f.dataType)
                        for f in schema.fields
                    ]
                )
            else:
                physical = schema
            df = self.spark.read.schema(physical).parquet(path)
            for c in ts_cols:
                # integer `div`, not `/`: nano epochs (~1.7e18) exceed
                # double's 2^53 exact range, so float division is off
                # by ±1 µs — enough to break oracle parity.
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
            df = df.select(*[f.name for f in schema.fields])
            self._cache[name] = df
        return self._cache[name]

    def register_views(self, names: list[str] | None = None) -> None:
        """Register tables as temp views for the SQL API."""
        for name in names or TABLES:
            self.table(name).createOrReplaceTempView(name)
