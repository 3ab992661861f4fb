"""Model scoring & evaluation at scale (SURVEY §2.16).

The ML-adjacent stages every training-data pipeline runs INSIDE the data
engine (the reference's pipeline surface is reconstructed, SURVEY §0.1;
these are the quality-classifier shapes every corpus-curation stack —
fastText-style filters, classifier-based mixture selection — executes
over the full corpus, not in a training framework):

- ``ml_lr_inference``: linear-model inference over hashed text features.
  The "model" is a hash function (hashing-trick weights), so scoring is
  a STATELESS narrow pipeline — no weight table is shipped, joined, or
  broadcast; the defining production property of feature hashing.
- ``ml_pr_curve``: precision/recall/F1 threshold sweep computed the
  scale-correct way — scores collapse to an exact integer-bin histogram
  first (hash agg), cumulative TP/FP ride windows over the ≤101-bin
  grid. Never a global sort of the corpus by score (that is how
  sklearn does it and exactly what dies at 10⁹ rows; Spark ML's
  BinaryClassificationMetrics bins for the same reason).

Determinism: logits are exact int64 weight-dot-products divided once;
sigmoid/F1 are single transcendental/divisions of bit-identical inputs,
rounded 9dp per the repo contract (README §determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import load

_LR_BUCKETS = 16  # hashed feature width (production: 2^18+)
_LR_BIAS_CENTI = -20  # intercept, in 1/100 units like the weights


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


@query(
    "ml_lr_inference",
    # Logistic scoring over hashed features. Weights derive from md5 of
    # the bucket id (centi-units, [-50, 50]) so the whole model is a
    # pure function — Spark and DuckDB materialize identical weights
    # with no fitted artifact. z_centi = sum(cnt_b * w_b) is an exact
    # int64; logit = one division; sigmoid rounded 9dp.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT)
               % {_LR_BUCKETS} AS bucket
      FROM tok),
    c AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM b
          GROUP BY doc_id, bucket),
    w AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(cnt * (CAST(('0x' || substr(md5('w' || CAST(bucket AS VARCHAR)), 1, 4))
                                  AS BIGINT) % 101 - 50)) AS BIGINT) AS z_centi
      FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           CAST(ROUND((z_centi + {_LR_BIAS_CENTI} * n_tokens) * 1.0
                      / (100 * n_tokens), 9) AS DOUBLE) AS logit,
           CAST(ROUND(1.0 / (1.0 + EXP(-ROUND((z_centi + {_LR_BIAS_CENTI} * n_tokens) * 1.0
                      / (100 * n_tokens), 9))), 9) AS DOUBLE) AS score,
           (z_centi + {_LR_BIAS_CENTI} * n_tokens) > 0 AS keep
    FROM w
    """,
)
def ml_lr_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier inference over the corpus — the fastText-style
    filter stage of every LLM data pipeline, run as pure SQL: tokens
    hash into {_LR_BUCKETS} buckets (hashing trick), each bucket carries
    a weight derived from md5 of its id (centi-units, so the dot product
    is EXACT int64 arithmetic), logit = (Σ cnt·w + bias·n) / (100·n) in
    one division, sigmoid rounded 9dp, keep = logit > 0 (exact integer
    comparison — the filter decision never touches a float).

    Scale shape: the model is a hash function, so inference is a
    stateless narrow pipeline — explode → hash → two map-side-combinable
    hash aggs. NO weight table exists to broadcast or join; swapping in
    a trained model means swapping the md5-derived weight expression for
    a 2^18-entry broadcast map, everything else unchanged. Nothing here
    is quadratic, nothing shuffles except the two doc_id aggs (which
    share partitioning)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % _LR_BUCKETS
    )
    # weight(bucket) in centi-units: md5-derived int in [-50, 50]
    w_centi = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w"), F.col("bucket").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 101
        - 50
    )
    c = (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = c.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum(F.col("cnt") * w_centi).cast("bigint").alias("z_centi"),
    )
    z_num = F.col("z_centi") + _LR_BIAS_CENTI * F.col("n_tokens")
    logit = F.round(z_num / (100.0 * F.col("n_tokens")), 9)
    return w.select(
        "doc_id",
        "n_tokens",
        logit.cast("double").alias("logit"),
        F.round(1.0 / (1.0 + F.exp(-logit)), 9).cast("double").alias("score"),
        (z_num > 0).alias("keep"),
    )


@query(
    "ml_pr_curve",
    # PR curve via exact integer score bins: score = type-token ratio
    # binned to floor(100·distinct/total) (exact int arithmetic), label
    # = lang='en'. Cells (bin -> pos, neg) aggregate first; TP/FP at
    # threshold bin t are DESCENDING cumulative window sums over the
    # occupied-bin grid; precision/recall/F1 are single divisions of
    # exact ints, rounded 9dp.
    oracle="""
    WITH per_doc AS (
      SELECT d.doc_id,
             CAST(FLOOR(100.0 * COUNT(DISTINCT t.token) / COUNT(*))
                  AS BIGINT) AS bin,
             (MIN(d.lang) = 'en') AS pos
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      GROUP BY d.doc_id),
    cells AS (
      SELECT bin,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS neg
      FROM per_doc GROUP BY bin),
    cum AS (
      SELECT bin,
             SUM(pos) OVER (ORDER BY bin DESC) AS tp,
             SUM(neg) OVER (ORDER BY bin DESC) AS fp,
             SUM(pos) OVER () AS p
      FROM cells)
    SELECT CAST(bin AS BIGINT) AS threshold_bin,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(ROUND(tp * 1.0 / (tp + fp), 9) AS DOUBLE) AS precision_at,
           CAST(ROUND(tp * 1.0 / p, 9) AS DOUBLE) AS recall_at,
           CAST(ROUND(2.0 * tp / (tp + fp + p), 9) AS DOUBLE) AS f1_at
    FROM cum
    """,
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation sweep — precision/recall/F1 at every score
    threshold, computed the way it must be at corpus scale: the corpus
    collapses to an exact integer-bin histogram (bin = floor(100·TTR),
    type-token ratio as the score; label = lang='en'), and the sweep is
    two cumulative windows over the ≤101-bin grid. F1 uses the
    2·tp/(2·tp+fp+fn) identity so it is one division of exact ints.

    Scale shape: one per-doc hash agg (map-side combinable), one ≤101-row
    cell agg, windows over the cell grid only — the corpus is never
    globally sorted by score (the sklearn per-row sweep is exactly what
    a 10⁹-row corpus cannot do; Spark ML bins for the same reason).
    Swapping the score for a real model column changes nothing
    downstream."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(_tokens()).alias("token")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.floor(100.0 * F.count_distinct(F.col("token")) / F.count(F.lit(1)))
        .cast("bigint")
        .alias("bin"),
        (F.min("lang") == "en").alias("pos"),
    )
    cells = per_doc.groupBy("bin").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("pos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("bigint").alias("neg"),
    )
    w_cum = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cells.select(
        "bin",
        F.sum("pos").over(w_cum).alias("tp"),
        F.sum("neg").over(w_cum).alias("fp"),
        F.sum("pos").over(w_all).alias("p"),
    )
    return cum.select(
        F.col("bin").cast("bigint").alias("threshold_bin"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 9)
        .cast("double")
        .alias("precision_at"),
        F.round(F.col("tp") / F.col("p"), 9).cast("double").alias("recall_at"),
        F.round(2.0 * F.col("tp") / (F.col("tp") + F.col("fp") + F.col("p")), 9)
        .cast("double")
        .alias("f1_at"),
    )
