"""Regenerate PLANS.md: the formatted physical plans of the flagship
scale exhibits, with a one-line note on the load-bearing property of
each. Evidence artifact for plan-quality review; re-run after planner-
visible changes:

    python tools/dump_plans.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from insight_patents_spark import registry  # noqa: E402
from insight_patents_spark.plans.explain import formatted_plan  # noqa: E402
from insight_patents_spark.session import get_spark  # noqa: E402

# (query id, the property the plan demonstrates)
SHOWCASE = [
    ("agg_groupby", "vectorized parquet scan (Batched: true), pushed filter, "
     "partial+final HashAggregate (map-side combine)"),
    ("join_broadcast", "dim side broadcast — zero shuffle of the fact table"),
    ("join_bucketed", "bucket-to-bucket SortMergeJoin: 'Bucketed: true' on both "
     "scans, the ONLY Exchange is the final 5-group aggregate"),
    ("topk_per_group", "WindowGroupLimit: each partition keeps k rows before "
     "the shuffle; no full sort of the fact table"),
    ("limit_topk", "TakeOrderedAndProject: global top-k with no global sort"),
    ("sql_exists_correlated", "EXISTS/NOT EXISTS decorrelated to "
     "LeftSemi/LeftAnti joins — no per-row subquery execution"),
    ("dedup_minhash_pairs", "signatures+bitsets materialized ONCE "
     "(checkpointed table feeds both self-join sides); in-row popcount "
     "verify — no second pass over documents"),
    ("sink_parquet", "partition-pruned re-read: PartitionFilters on the scan"),
    ("join_dpp", "dynamic partition pruning: dynamicpruningexpression in "
     "PartitionFilters — fact partitions pruned by the filtered dim at "
     "runtime, no static predicate on the partition column"),
    ("time_rollup_hier", "hierarchical rollup: each level re-aggregates the "
     "finer level's partials — three shrinking HashAggregates, raw events "
     "scanned exactly once"),
    ("dedup_substring", "anchor-shingle containment: candidate stage is a "
     "signature equi-join (SortMergeJoin on sig) over the checkpointed "
     "shingle table — no cartesian/nested-loop over document pairs"),
    ("vec_rerank_stub", "two-stage retrieval: MapInPandas scorer sits ABOVE "
     "the WindowGroupLimit shortlist — the pandas stage sees k rows per "
     "query, never the candidate pair stream"),
    ("agg_ohlc", "open/close via min_by/max_by ride the SAME partial+final "
     "hash aggregate as high/low/volume — one scan, one shuffle, no Window"),
    ("vec_pq_adc", "IVF-PQ ADC: the coded item table joins the BROADCAST "
     "query side (with its 8-entry lookup tables); per-pair work is CASE "
     "lookups + adds — no 64-dim dot in the pair stage"),
    ("vec_hamming_sign", "binary-quantization prefilter: bit_count(XOR) "
     "prescreen in the join condition, float dot only above the filter"),
    ("vec_kmeans", "Lloyd assignment via broadcast of the k x 64 centroid "
     "table twice — the vector table never shuffles for assignment"),
    ("text_cdc_chunk", "content-defined chunking is all in-row (Generate "
     "fan-out, no shuffle past the input-split repartition)"),
    ("win_anomaly_zscore", "count/sum/sum-of-squares share ONE WindowExec "
     "(squared column precomputed; a window-expression argument would "
     "split the pass)"),
    ("join_star_schema", "Q5-shaped star join: all four dimension hops are "
     "BroadcastHashJoin — the fact table is scanned once and never "
     "shuffled before the final aggregate"),
    ("join_shuffle_hash", "SHUFFLE_HASH hint pins ShuffledHashJoin — both "
     "sort passes skipped vs sort-merge"),
    ("ml_lr_inference", "hashed-weights classifier inference: ZERO joins — "
     "the model is a hash function; two map-side-combinable hash aggs are "
     "the whole plan"),
    ("ml_pr_curve", "threshold sweep over a binned histogram: both aggs run "
     "BEFORE the cumulative windows — the corpus is never sorted by score"),
    ("vec_pca_project", "matvec-only power iteration: per-dim int64 partials "
     "are the only wide op; mean/component return via BroadcastExchange; "
     "the vector table is never hash-partitioned by vec_id"),
    ("mm_phash_dedup", "multi-index hamming search: band equi-join (no "
     "nested loop) over the CHECKPOINTED fingerprint table (the Arrow "
     "pass runs once — ExistingRDD); occupancy-gated salted path wired "
     "(plain join on this corpus, cap 2048)"),
    ("win_rsi", "lag + trailing-frame windows share ONE (type, day) sort — "
     "two Window nodes, one Sort, one grid aggregate"),
    ("dedup_ngram_jaccard", "PPJoin prefix filtering: candidates come from "
     "the per-doc rarest-shingle prefix (window rank over a shuffle-joined "
     "df table) with length+position bounds in the join filter; exact "
     "array_intersect verify above — never an all-pairs product"),
    ("graph_scc", "FW-BW-MIN peel result: a union of per-round checkpointed "
     "label frames (ExistingRDD) — no transitive closure, no "
     "CartesianProduct; lineage truncated every round"),
    ("geo_knn", "exact kNN two-stage refinement: probe side broadcast "
     "(items never shuffle for the distance pass), per-cell partial "
     "top-k then per-probe final — two WindowGroupLimit-eligible "
     "windows, never one giant per-probe partition"),
    ("text_winnowing", "winnowing fingerprint selection runs entirely "
     "in-row (array transforms + integer window minima): ZERO Exchange "
     "nodes — a narrow scan-speed projection"),
    ("ml_ndcg", "both ranking windows (model + ideal) and the per-user "
     "aggregate ride ONE user_id Exchange — partitioning reuse makes "
     "ranking evaluation a single-shuffle job"),
    ("pipeline_patents_e2e", "the flagship composite (ingest->parse->edge "
     "build->PageRank->top-k per class->sink): pre-sink plan shows the "
     "part dim broadcast, WindowGroupLimit top-3, rank state from the "
     "checkpointed quantized loop; ONE fact scan feeds the whole chain "
     "(the text roundtrip + edge checkpoint own it — lineitem never "
     "re-enters)"),
    ("join_skew_aqe", "AQE runtime skew-split: SortMergeJoin(skew=true) "
     "with 'AQEShuffleRead coalesced and skewed' on the hot fact side — "
     "the production-default skew path beside join_skew_salted's manual "
     "salting"),
    ("ml_tree_inference", "tree ensemble compiled into the plan: nested "
     "CASE chains over integer features — a narrow zero-Exchange "
     "whole-stage-codegen projection; model serving at scan speed"),
    ("agg_causal_did", "DiD estimator: one corpus scan -> partial+final "
     "hash agg to the |types|x2x2 cell grid (decimal moment "
     "accumulators), then a second agg over the ~20-cell grid pivots "
     "per type — all post-scan work is grid-sized"),
    ("dedup_lines", "line-level dedup shuffles 32-byte md5 digests, never "
     "line text: in-row line Generate, min hash agg on the digest, one "
     "digest equi-join back, doc-level agg"),
    ("win_kalman_1d", "whole Kalman recursion inside ONE aggregate() fold "
     "per user row: a single user_id Exchange builds the sorted array; "
     "no per-step operators in the plan at all"),
    ("dedup_minhash_weighted", "weighted-Jaccard dedup: band self-join "
     "consumes the checkpointed signature table on BOTH sides "
     "(ExistingRDD), verification is an in-plan array_intersect on "
     "carried element arrays — the corpus never re-enters"),
    ("pipeline_llm_curation_e2e", "the LLM-curation flagship: the QC "
     "feature pass is ONE documents scan with every gate feature "
     "in-row (no join/agg/window/Python — plan-gated); downstream, the "
     "checkpointed feature table gates, the md5-digest keeper window "
     "dedups, drop lists anti-join, class counts broadcast, and the "
     "per-lang pack window bins — documents never re-enters"),
    ("dedup_minhash_icws", "real-weight (ICWS) probe dedup: only the 5% "
     "probe slice joins the band index; verification is ONE in-plan "
     "map_zip_with merge per candidate over carried weight maps "
     "(ExistingRDD signature table on both sides — no corpus re-join, "
     "no per-key map scans)"),
    ("vec_ann_nsw", "graph-ANN beam search: the returned plan is the "
     "LAST hop's frontier (ExistingRDD — each hop merge-joined into the "
     "BUCKETED index tables, gated in test_plans) + grounding; the only "
     "corpus scans are the entry-point min and the test-SF exact arm "
     "(BroadcastNestedLoopJoin, never CartesianProduct)"),
    ("dedup_embed_cosine", "IVF cell-scoped near-dup pairs (r13): the "
     "pair stage is ONE cell_id equi-join over the checkpointed "
     "assignment (ExistingRDD on both sides) — no label-block "
     "broadcast, no CartesianProduct; label equality is an in-cell "
     "filter"),
    ("graph_louvain_move", "Louvain level-1 scoring stage: checkpointed "
     "label + edge tables (ExistingRDD — gain pass and contraction loop "
     "ran eagerly), |nodes|-sized label table broadcast into both w_in "
     "endpoint joins, m2 scalar a broadcast nested loop — lineitem "
     "never re-enters"),
    ("seq_gsp_triples", "GSP level-3 chain: every post-window stage reads "
     "the checkpointed position grids (ExistingRDD), prune lists arrive "
     "by BroadcastHashJoin, level 3 is grid×grid with a plain count — "
     "the event stream appears only under the checkpoints"),
    ("mm_crossmodal_topk", "cross-modal retrieval: ONE Arrow Python stage "
     "(the encoder) on the item side, probe batch broadcast "
     "(BroadcastNestedLoopJoin) — items never shuffle before the "
     "per-query window"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    specs = registry.load_all()
    spark = get_spark("ips-plans")
    out = [
        "# PLANS — physical plans of the flagship scale exhibits",
        "",
        f"Generated by `python tools/dump_plans.py` at sf_dir={args.sf}.",
        "Each section names the load-bearing plan property (all are also",
        "asserted by `tests/test_plans.py`, so they cannot silently regress).",
        "",
    ]
    for name, why in SHOWCASE:
        if name == "pipeline_llm_curation_e2e":
            # same read-back caveat as pipeline_patents_e2e: dump the
            # single-scan feature pass AND the downstream packed chain
            from insight_patents_spark.operators.pipeline import (
                _llm_curation_features,
                _llm_curation_packed,
            )

            plan = (
                formatted_plan(_llm_curation_features(spark, args.sf))
                + "\n-- downstream (gate->dedup->balance->pack) --\n"
                + formatted_plan(_llm_curation_packed(spark, args.sf))
            )
        elif name == "pipeline_patents_e2e":
            # the registered query returns the sink READ-BACK; the
            # dataflow worth reviewing is the pre-sink chain
            from insight_patents_spark.operators.pipeline import _e2e_presink

            plan = formatted_plan(_e2e_presink(spark, args.sf))
        elif name == "join_skew_aqe":
            # the skew split is a RUNTIME re-plan: dump the executed
            # plan of the join frame under the exhibit's confs
            from insight_patents_spark.operators.joins import (
                _AQE_SKEW_CONFS,
                _skew_join_frame,
            )

            old = {k: spark.conf.get(k, None) for k in _AQE_SKEW_CONFS}
            for k, v in _AQE_SKEW_CONFS.items():
                spark.conf.set(k, v)
            try:
                df = _skew_join_frame(spark, args.sf)
                df.foreach(lambda r: None)
                plan = df._jdf.queryExecution().executedPlan().toString()
            finally:
                for k, v in old.items():
                    spark.conf.unset(k) if v is None else spark.conf.set(k, v)
        else:
            df = specs[name].fn(spark, args.sf)
            plan = formatted_plan(df)
        out += [f"## {name}", "", f"**Demonstrates:** {why}", "", "```",
                plan.rstrip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'} ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
