"""External sinks (SURVEY §2.1 `sink_jdbc` — document-only).

The reference loads its node/edge tables into a serving store
(Neo4j/Postgres, SURVEY §0.1 step 5 [PK-M]). The Spark-native equivalent
is ``df.write.jdbc``; this container has no database server or JDBC
driver jar, so the function is provided and unit-smoke-tested for its
argument handling but is not part of the checked query registry (matches
the SURVEY §2.1 'document only' contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **properties: str,
) -> None:
    """Bulk-load a DataFrame into an external RDBMS.

    Scale notes: ``numPartitions`` bounds parallel connections (each
    partition opens one); ``batchsize`` controls executemany batching.
    For a 1000-executor cluster loading a serving store, repartition down
    (e.g. 32-64) first so the database sees a bounded connection count.
    """
    writer = df.repartition(num_partitions) if num_partitions else df
    (
        writer.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**properties)
        .mode(mode)
        .save()
    )
