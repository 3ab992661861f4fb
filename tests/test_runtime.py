"""Harness state-hygiene contract (runtime.release_ephemeral).

Pins the r11 fix for the r10 full-bench inflation: ephemeral
localCheckpoints are unpersisted after a query's result is consumed,
while shared-cache checkpoints (and persist()-based SQL caches) survive
and their downstream consumers still execute. Unpersisting a live
localCheckpoint is unrecoverable (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND),
so the protection logic is load-bearing, not an optimization.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from insight_patents_spark import registry, runtime


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _run(spark, sf_dir, name) -> None:
    registry.load_all()[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()


def test_release_drops_unregistered_checkpoint(spark):
    cp = spark.range(1000).withColumn("x", F.col("id") * 2).localCheckpoint()
    cp_id = int(
        cp._jdf.queryExecution().analyzed().collectLeaves().apply(0).rdd().id()
    )
    assert cp_id in _persistent_ids(spark)
    released = runtime.release_ephemeral(spark)
    assert cp_id in released
    assert cp_id not in _persistent_ids(spark)


def test_release_protects_shared_cache_and_consumers(spark, sf_dir):
    # Build the shared graph caches (pair + edge checkpoints), release,
    # then run iterative consumers that would crash with
    # CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND if protection failed.
    _run(spark, sf_dir, "graph_build")
    protected = runtime.protected_rdd_ids()
    assert protected, "graph caches should register protected checkpoints"
    runtime.release_ephemeral(spark)
    assert protected <= _persistent_ids(spark)
    _run(spark, sf_dir, "graph_cc")  # reads the protected edge cache
    runtime.release_ephemeral(spark)
    _run(spark, sf_dir, "graph_degree")  # and again after a release


def test_release_leaves_sql_cache_alone(spark):
    pre = _persistent_ids(spark)
    df = spark.range(512).withColumn("y", F.col("id") % 7).persist()
    df.count()
    cached_ids = _persistent_ids(spark) - pre
    assert cached_ids, "persist()+count should register a persistent RDD"
    released = runtime.release_ephemeral(spark)
    # persist()-based blocks are recomputable; the hook must not touch
    # them (vec_ann_lsh's bucket/shortlist cache contract): the cached
    # RDD is neither in the released list nor gone from the registry.
    assert cached_ids.isdisjoint(released)
    assert cached_ids <= _persistent_ids(spark)
    assert df.count() == 512
    df.unpersist()


def test_release_fails_closed_on_plan_scan_error(spark):
    # An unscannable shared-cache value means the protected set is
    # unknown — the hook must release NOTHING that cycle rather than
    # risk destroying the cache's live checkpoints (ADVICE r11).
    cp = spark.range(256).localCheckpoint()
    cp_id = int(
        cp._jdf.queryExecution().analyzed().collectLeaves().apply(0).rdd().id()
    )
    # extract yields a non-DataFrame whose plan scan raises
    poison = {"bad": object()}
    runtime.register_shared_cache(poison, extract=lambda v: (v,))
    try:
        released = runtime.release_ephemeral(spark)
        assert released == []
        assert cp_id in _persistent_ids(spark)
    finally:
        runtime._SHARED_CACHES[:] = [
            (c, e) for c, e in runtime._SHARED_CACHES if c is not poison
        ]
    # with the poison gone the same checkpoint is released normally
    assert cp_id in runtime.release_ephemeral(spark)


def test_ephemeral_checkpoints_do_not_accumulate(spark, sf_dir):
    # A checkpoint-heavy query's pinned RDDs must not outlive the hook:
    # after release, only protected + persist-based blocks remain.
    _run(spark, sf_dir, "dedup_cluster_cc")  # builds sig/pairs/cc caches
    runtime.release_ephemeral(spark)
    baseline = _persistent_ids(spark)
    _run(spark, sf_dir, "graph_louvain_move")  # many loop checkpoints
    assert _persistent_ids(spark) > baseline
    runtime.release_ephemeral(spark)
    leftover = _persistent_ids(spark) - baseline - runtime.protected_rdd_ids()
    # anything left must be persist-based (no checkpointData), not pinned
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in leftover:
            assert not jmap.get(k).rdd().checkpointData().isDefined()
