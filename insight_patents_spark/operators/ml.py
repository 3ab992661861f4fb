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


@query(
    "ml_confusion_matrix",
    # Binary confusion matrix + derived metrics for the lr filter vs the
    # lang='en' label: one hash agg to 4 cells, every metric a single
    # division of exact int64s (MCC's sqrt rounds 9dp). The metric
    # columns repeat per row by design (scalar-only results contract).
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
    z AS (
      SELECT doc_id,
             CAST(SUM(cnt * (CAST(('0x' || substr(md5('w' || CAST(bucket AS VARCHAR)), 1, 4))
                                  AS BIGINT) % 101 - 50)) AS BIGINT)
               + {_LR_BIAS_CENTI} * CAST(SUM(cnt) AS BIGINT) AS zc
      FROM c GROUP BY doc_id),
    joined AS (
      SELECT (z.zc > 0) AS pred, (d.lang = 'en') AS actual
      FROM z JOIN documents d ON z.doc_id = d.doc_id),
    m AS (
      SELECT CAST(SUM(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM joined)
    SELECT quadrant, n, accuracy, mcc FROM (
      SELECT unnest(['tp', 'fp', 'fn', 'tn']) AS quadrant,
             unnest([tp, fp, fn, tn]) AS n,
             CAST(ROUND((tp + tn) * 1.0 / (tp + fp + fn + tn), 9) AS DOUBLE)
               AS accuracy,
             CAST(CASE WHEN (tp+fp)*(tp+fn)*(tn+fp)*(tn+fn) > 0
                  THEN ROUND((tp*tn - fp*fn) /
                       SQRT(CAST((tp+fp)*(tp+fn) AS DOUBLE) *
                            CAST((tn+fp)*(tn+fn) AS DOUBLE)), 9)
                  ELSE 0.0 END AS DOUBLE) AS mcc
      FROM m)
    """,
)
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + accuracy + Matthews correlation for the
    ml_lr_inference filter against the lang='en' label — the
    classifier-audit readout next to ml_pr_curve (PR sweeps thresholds;
    this scores the DEPLOYED cut at logit>0). The prediction recomputes
    the exact int64 decision (shared arithmetic with ml_lr_inference),
    so the whole evaluation is one narrow pipeline + two hash aggs + a
    4-cell rollup; every metric is one division of exact ints (MCC's
    denominator factors split into two exact products before ONE double
    multiply — (tp+fp)(tp+fn)(tn+fp)(tn+fn) would overflow int64 at
    10⁹ docs; paired products stay < 2⁶² there).

    Scale shape: identical to ml_lr_inference (stateless, no weight
    table) plus a broadcast-sized label join and a 4-cell aggregate."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % _LR_BUCKETS
    )
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
    z = c.groupBy("doc_id").agg(
        (
            F.sum(F.col("cnt") * w_centi)
            + _LR_BIAS_CENTI * F.sum("cnt")
        )
        .cast("bigint")
        .alias("zc")
    )
    joined = z.join(d.select("doc_id", "lang"), "doc_id").select(
        (F.col("zc") > 0).alias("pred"), (F.col("lang") == "en").alias("actual")
    )
    m = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    d1 = (tp + fp) * (tp + fn)
    d2 = (tn + fp) * (tn + fn)
    mcc = F.when(
        (d1 > 0) & (d2 > 0),
        F.round(
            (tp * tn - fp * fn)
            / F.sqrt(d1.cast("double") * d2.cast("double")),
            9,
        ),
    ).otherwise(F.lit(0.0))
    wide = m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((tp + tn) / (tp + fp + fn + tn), 9)
        .cast("double")
        .alias("accuracy"),
        mcc.cast("double").alias("mcc"),
    )
    return wide.select(
        F.posexplode(
            F.create_map(
                F.lit("tp"), tp, F.lit("fp"), fp, F.lit("fn"), fn,
                F.lit("tn"), tn,
            )
        ).alias("_", "quadrant", "n"),
        "accuracy",
        "mcc",
    ).select("quadrant", F.col("n").cast("bigint").alias("n"), "accuracy", "mcc")


@query(
    "ml_calibration_bins",
    # Reliability diagram: predicted probability (the lr sigmoid) binned
    # to centiles; per bin the observed positive rate (exact int
    # division) vs the mean predicted probability. The mean of a float
    # column is made order-independent by FLOOR-quantizing each score to
    # exact int64 nano-units before summing (documented quantization —
    # at 1e-9 resolution the bias is below the 9dp output rounding).
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
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(cnt * (CAST(('0x' || substr(md5('w' || CAST(bucket AS VARCHAR)), 1, 4))
                                  AS BIGINT) % 101 - 50)) AS BIGINT) AS z_centi
      FROM c GROUP BY doc_id),
    sc AS (
      SELECT w.doc_id,
             ROUND(1.0 / (1.0 + EXP(-ROUND((z_centi + {_LR_BIAS_CENTI} * n_tokens) * 1.0
                   / (100 * n_tokens), 9))), 9) AS score,
             (d.lang = 'en') AS pos
      FROM w JOIN documents d ON w.doc_id = d.doc_id),
    cells AS (
      SELECT CAST(FLOOR(score * 100) AS BIGINT) AS bin,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CAST(FLOOR(score * 1e9) AS BIGINT)) AS BIGINT) AS sq
      FROM sc GROUP BY 1)
    SELECT bin, CAST(n AS BIGINT) AS n,
           CAST(ROUND(n_pos * 1.0 / n, 9) AS DOUBLE) AS observed_rate,
           CAST(ROUND(sq / (n * 1e9), 9) AS DOUBLE) AS mean_predicted
    FROM cells
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability diagram for the lr filter: predicted
    probabilities binned to centiles, observed positive rate vs mean
    predicted probability per bin — the readout that tells you whether
    a 0.8 score means 80% (and feeds temperature scaling if not).
    Completes the in-engine evaluation set: ml_pr_curve sweeps
    thresholds, ml_confusion_matrix scores the deployed cut, this
    audits the probabilities themselves.

    Scale shape: the score pipeline is the stateless lr chain; the
    diagram is ONE hash agg to ≤100 cells. The only float mean is made
    order-independent by floor-quantizing scores to exact int64
    nano-units before summing (same posture as vec_pca_project's matvec
    reduction) — no collect_list of scores, no per-bin sort, at any
    corpus size."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % _LR_BUCKETS
    )
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
    logit = F.round(
        (F.col("z_centi") + _LR_BIAS_CENTI * F.col("n_tokens"))
        / (100.0 * F.col("n_tokens")),
        9,
    )
    sc = w.join(d.select("doc_id", "lang"), "doc_id").select(
        F.round(1.0 / (1.0 + F.exp(-logit)), 9).alias("score"),
        (F.col("lang") == "en").alias("pos"),
    )
    cells = sc.groupBy(
        F.floor(F.col("score") * 100).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.floor(F.col("score") * F.lit(1e9)).cast("long"))
        .cast("bigint")
        .alias("sq"),
    )
    return cells.select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n_pos") / F.col("n"), 9)
        .cast("double")
        .alias("observed_rate"),
        F.round(F.col("sq") / (F.col("n") * F.lit(1e9)), 9)
        .cast("double")
        .alias("mean_predicted"),
    )
