"""Sorts, limits, set operations, deduplication (SURVEY §2.6).

Reference parity: top-N patents by importance score (`limit_topk`) and
duplicate patent records across weekly archive files (`dedup_exact`) are
direct analogs of reference behaviors [PK-M].

Scale notes: global sort is a range-partitioned exchange (sampled
boundaries) — fine at any size; orderBy().limit(k) compiles to
TakeOrderedAndProject which never materializes the full sort. Exact
dedup hashes content into a fixed-width signature first so the shuffle
key is narrow regardless of payload width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load


@query(
    "sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC,
                              o_totalprice DESC NULLS LAST,
                              o_orderkey ASC) AS pos
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with mixed directions; the emitted `pos` column pins
    the total order so the order-insensitive hash still verifies it."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    w = Window.orderBy(
        F.col("o_orderpriority").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "pos")
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject: per-partition heaps, no full
    sort). Ties broken by the unique key."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'big' AS src FROM orders
    WHERE o_totalprice > 200000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two (overlapping) order slices."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("src")
    )
    b = o.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("src")
    )
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicating union (one hash-distinct shuffle)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers present in both status slices (set semantics)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL keeps multiplicity arithmetic honest)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.exceptAll(b)


@query(
    "dedup_exact",
    oracle="""
    SELECT sig, text, n_copies FROM (
      SELECT md5(text) AS sig, text, COUNT(*) AS n_copies,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY md5(text)) AS rn
      FROM documents
      GROUP BY md5(text), text
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup on md5(text) (duplicate-patent-record analog;
    md5 is byte-identical across engines — SURVEY §5).

    group-by on the fixed-width signature (not dropDuplicates on the raw
    payload): the shuffle key stays 32 bytes however wide the document is,
    and the survivor is well-defined (text is functionally determined by
    its hash up to collisions; count kept as dup evidence).
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("sig", F.md5("text"))
        .groupBy("sig", "text")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .select("sig", "text", "n_copies")
    )


@query(
    "dedup_subset_keys",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id, value
    FROM (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_subset_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user, type). Deliberately row_number with
    a total tiebreak order — plain dropDuplicates picks an arbitrary
    survivor (SURVEY §5 determinism rule)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", F.col("event_id").alias("latest_event_id"), "value"
        )
    )


@query(
    "set_except_all",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_custkey % 3 = 0
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_custkey % 7 = 0
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with MULTIPLICITY (each right-side
    occurrence cancels exactly one left-side occurrence), where
    `set_except`'s DISTINCT semantics collapse duplicates first. The
    difference matters whenever rows are observations, not identities
    (inventory reconciliation, event-stream diffs): dropping 3 of 7
    duplicates must leave 4, not 0. Spark plans it as a single
    counting-aggregate join (no distinct pass, no explode) — the same
    one-shuffle cost as EXCEPT at any scale."""
    o = load(spark, sf_dir, "orders")
    left = o.filter(F.col("o_custkey") % 3 == 0).select("o_orderpriority")
    right = o.filter(F.col("o_custkey") % 7 == 0).select("o_orderpriority")
    return left.exceptAll(right)
