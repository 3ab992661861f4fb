"""Schema-checked loaders for the ten driver test tables (FIXTURES.md).

One loader owns every read-side quirk so operators never touch paths:

- ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark 4.1.2 cannot read
  natively (SURVEY §5). With ``spark.sql.legacy.parquet.nanosAsLong=true``
  it arrives as bigint nanos; we convert to TIMESTAMP_NTZ by adding
  ``ts div 1000`` microseconds to the NTZ epoch. This is timezone-
  independent (no TimestampType/local-tz round trip) and equals DuckDB's
  truncating read of the same column (verified on event_id 0-1).
- All other timestamp columns already read as TIMESTAMP_NTZ.

At 100 TB these loaders are the single place to attach bucketing /
partition-pruning metadata; operators stay declarative against them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast when joined
# against a fact table (row counts: region 5, nation 25, supplier 10 @sf1-ish;
# they do not scale with sf).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table from ``sf_dir`` by name."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts arrives as bigint nanoseconds; truncate (integer div) to micros and
    # rebase onto the NTZ epoch -> wall-clock identical to DuckDB's read.
    return df.withColumn(
        "ts", F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_NTZ_EPOCH})")
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
