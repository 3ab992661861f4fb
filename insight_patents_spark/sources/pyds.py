"""Custom Python Data Source (Spark 4 DataSource API) — the engine's
source-extensibility exhibit (SURVEY §2.1 family).

Reference parity: the reference ingests weekly USPTO grant archives from
a custom feed (SURVEY §0.1 step 1, [PK-M]); this models that shape — a
partitioned, deterministic "grant feed" source the executors read in
parallel. Each input partition generates its own id range, so the scan
is embarrassingly parallel and the source scales by adding partitions
(at 100 TB: one partition per archive file / key range).

The generated values are pure integer functions of the row id, so the
DuckDB oracle reproduces them exactly from range().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query

N_ROWS = 10_000
N_PARTS = 8


def _register(spark: SparkSession) -> None:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class GrantFeedReader(DataSourceReader):
        def partitions(self):
            step = N_ROWS // N_PARTS
            return [InputPartition((i * step, (i + 1) * step)) for i in range(N_PARTS)]

        def read(self, partition):
            # yield Arrow batches, not tuples: the reader stays vectorized
            # end-to-end (numpy -> Arrow -> JVM columnar), no per-row
            # Python objects — the posture any high-volume custom source
            # needs
            import numpy as np
            import pyarrow as pa

            lo, hi = partition.value
            ids = np.arange(lo, hi, dtype=np.int64)
            status = np.array(["granted", "pending", "expired"])[ids % 3]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array(ids % 52),
                    pa.array((ids * 7919) % 10000),
                    pa.array(status),
                ],
                names=["grant_id", "week", "fee", "status"],
            )

    class GrantFeedSource(DataSource):
        @classmethod
        def name(cls):
            return "grant_feed"

        def schema(self):
            return "grant_id bigint, week bigint, fee bigint, status string"

        def reader(self, schema):
            return GrantFeedReader()

    spark.dataSource.register(GrantFeedSource)


@query(
    "scan_python_datasource",
    oracle=f"""
    SELECT r AS grant_id,
           r % 52 AS week,
           (r * 7919) % 10000 AS fee,
           CASE CAST(r % 3 AS INTEGER) WHEN 0 THEN 'granted'
                WHEN 1 THEN 'pending' ELSE 'expired' END AS status
    FROM range(0, {N_ROWS}) t(r)
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the registered custom source (8 partitions read in
    parallel by executor-side Python workers, Arrow-batched)."""
    _register(spark)
    return spark.read.format("grant_feed").load()
