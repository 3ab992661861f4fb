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
    "insight_patents_spark.operators.pipeline",
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
#   r6:    50 of the 157 never-checked after r5 (see git history).
#   r7:    50 of the 108 never-checked after r6 + the 22 NEW r7 queries
#          + the changed set (graph_scc, seq_attribution_markov) — see
#          git history for the full list.
#   r8:    the set below — 20 of the 80 never-checked after r7
#          (complement of the union of CORRECTNESS_r01-r07 keys) + the
#          12 queries NEW in r8 (pipeline_patents_e2e, join_skew_aqe,
#          graph_ktruss, win_skyline_3d, win_sliding_hll,
#          vec_cell_kmeans, dedup_url_canonical, ml_group_parity,
#          text_boilerplate_flag, text_bpe_train, graph_hyperball,
#          dedup_cluster_cc) +
#          every query whose CODE changed in r8: graph_pagerank /
#          graph_pagerank_personalized / graph_hits / graph_betweenness
#          (quantized integer-unit folds — VALUES changed), vec_centroid
#          / vec_knn_label / vec_kmeans / vec_residual_pq /
#          vec_pca_project / vec_pca_top2 (quantized
#          centroid/PCA means — values moved <= 1e-9),
#          geo_cluster_cells (assert→raise), text_winnowing (packing
#          widened), agg_chi_square (overflow CASE), text_jaccard_tokens
#          + dedup_eval (merged strategy probe), and dedup_ngram_jaccard
#          (r7 PPJoin rewrite that the r7 prefix missed — the ADVICE
#          finding), and the late-r8 short-doc guard fixes
#          (text_ngrams, text_bigram_lm, text_decontaminate,
#          text_fingerprint) + dedup_minhash_pairs (pairs-CTE oracle
#          refactor). The never-checked ops left for r9 are listed in
#          STATE.md.
#   r9:    50 of the 95 never-checked after r8 (complement of the union
#          of CORRECTNESS_r01-r08 keys, recomputed this round): the 18
#          _POST_PREFIX_HEAD entries that were positioned to lead this
#          gate (new-in-r8, never externally checked), then the 18-op
#          block the r8 late wave displaced (fn_* battery + the vec/dedup
#          ANN family), then 14 more cross-family backlog entries. The
#          45 never-checked that remain close the ledger in r10 (listed
#          in STATE.md). New-in-r9 queries register in _POST_PREFIX_HEAD
#          (positions 51+) to lead the r10 gate, carried by their
#          dedicated oracle/replay tests until then — the r8 pattern.
# Everything else keeps registration order after the prefix. A name here
# that is not registered is a bug (asserted in load_all).
_SHOWCASE_50 = (
    # --- the r9 gate: 50 never-driver-checked operators ---
    # First the 18 queries r8 positioned as _POST_PREFIX_HEAD (new in
    # r8, never externally gated — they lead as promised):
    "ml_calibration_isotonic", "join_asof_tolerance",
    "agg_covariance_matrix", "agg_lorenz_points", "fn_inet",
    "time_business_days", "vec_cluster_purity", "graph_edge_churn",
    "win_ulcer_index", "agg_ab_srm_check", "agg_basket_triples",
    "ml_permutation_importance", "dq_schema_contract", "time_pacf",
    "vec_pq_recon_error", "scan_text_fixed_width", "fn_checksum_luhn",
    "seq_repeat_purchase_latency",
    # Then the 18-op block the r8 late wave displaced (owed the gate
    # since r8): the fn_* battery + the ANN/dedup vector family.
    "fn_array", "fn_explode", "fn_map", "fn_json", "fn_hash",
    "fn_bitwise", "fn_variant", "set_union_distinct", "sample_priority",
    "agg_bitmap_distinct", "dedup_embed_cosine", "vec_ann_lsh",
    "vec_pq_codes", "vec_rerank_stub", "dedup_semantic",
    "vec_matryoshka", "vec_cell_refine", "vec_pca_project",
    # Then 13 more cross-family never-checked backlog entries (UDF
    # ladder, multimodal, graph, sequences, windows, text):
    "udf_python_scalar", "udaf_pandas_agg", "udf_python_arrow",
    "mm_decode_stub", "mm_phash_dedup", "graph_shortest_path",
    "graph_label_prop", "graph_closeness", "seq_topk_paths",
    "time_acf", "win_streaks", "agg_survival_km",
    "text_clean_normalize",
    # NEW in r9, LAST in the prefix (new code runs the gate on a warm
    # session — the changed-queries rule): the LLM-curation flagship.
    # It displaced agg_survival_curve into _POST_PREFIX_HEAD.
    "pipeline_llm_curation_e2e",
)

# Registered immediately after the prefix (r10-gate head): the one
# backlog entry the r9 flagship displaced, then new-in-r9 queries as
# they land (the r8 pattern — new code leads the NEXT gate, carried by
# dedicated oracle/replay tests until then).
_POST_PREFIX_HEAD = (
    "agg_survival_curve",
    "dedup_minhash_weighted",
    "text_mix_epochs",
    "graph_smallworld_sigma",
    "agg_apriori_triples",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module and return the full registry,
    showcase-ordered (see _SHOWCASE_50)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    missing = [
        n for n in _SHOWCASE_50 + _POST_PREFIX_HEAD if n not in _REGISTRY
    ]
    assert not missing, f"showcase names not registered: {missing}"
    ordered = {n: _REGISTRY[n] for n in _SHOWCASE_50 + _POST_PREFIX_HEAD}
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
