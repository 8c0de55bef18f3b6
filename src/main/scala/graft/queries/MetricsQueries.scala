package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.evaluation.BinaryModelMetrics

/** Evaluation-curve queries. Score/label pairs are derived deterministically
  * from the orders table (multiplicative-hash pseudo-score, status flag
  * label) so the DuckDB oracle can replay the exact same input.
  */
object MetricsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def scoreAndLabels(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      (((col("o_orderkey") * 2654435761L) % 1000) / 1000.0).as("score"),
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("label"))

  // shared oracle CTE prefix building per-score cumulative confusions
  private val cumSql =
    """WITH sl AS (
      |  SELECT ((o_orderkey * 2654435761) % 1000) / 1000.0 AS score,
      |         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS label
      |  FROM orders
      |), by_score AS (
      |  SELECT score, sum(label) AS pos, count(*) AS cnt FROM sl GROUP BY score
      |), cum AS (
      |  SELECT score,
      |    sum(pos) OVER (ORDER BY score DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
      |    sum(cnt - pos) OVER (ORDER BY score DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
      |    sum(pos) OVER () AS p,
      |    sum(cnt - pos) OVER () AS n
      |  FROM by_score
      |)""".stripMargin

  val queries: Map[String, Q] = Map(
    // gains chart (the reference's headline addition): distributed groupBy
    // per score + window cumulative confusion counts.
    "q15_gains_curve" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir)).gains()
        .select(round(col("reach"), 6).as("reach"), round(col("recall"), 6).as("recall"))
    }),

    // lift chart (reach, recall/reach)
    "q16_lift_curve" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir)).lift()
        .select(round(col("reach"), 6).as("reach"), round(col("lift"), 6).as("lift"))
    }),

    // trapezoid AUC-ROC as a single LAZY row — the whole area is one
    // distributed sum (per-segment deltas derived row-locally), so building
    // this DataFrame runs zero jobs.
    "q17_auc_roc" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir)).areaUnderROCFrame()
        .select(round(col("auc"), 6).as("auc"))
    }),

    // precision/recall by threshold
    "q18_precision_recall_by_threshold" -> ((s, dir) => {
      val m = new BinaryModelMetrics(scoreAndLabels(s, dir))
      m.precisionByThreshold()
        .join(m.recallByThreshold(), "score")
        .select(round(col("score"), 6).as("score"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"))
    }),

    // gains chart through the numBins down-sampling path (deterministic
    // chunking of distinct scores into distinct/numBins-sized groups)
    "q26_gains_binned" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir), numBins = 100).gains()
        .select(round(col("reach"), 6).as("reach"), round(col("recall"), 6).as("recall"))
    }),

    // F-beta by threshold (beta=2 weighs recall higher)
    "q33_fmeasure" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir)).fMeasureByThreshold(2.0)
        .select(round(col("score"), 6).as("score"),
          round(col("fMeasure"), 6).as("fmeasure"))
    }),

    // PR curve incl. the (0, firstPrecision) prepend (SPARK-21806 behavior,
    // a documented divergence from the reference's (0,1) point)
    "q34_pr_curve" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir)).pr()
        .select(round(col("recall"), 6).as("recall"),
          round(col("precision"), 6).as("precision"))
    }),

    // ROC curve points with (0,0)/(1,1) endpoints
    "q40_roc_curve" -> ((s, dir) => {
      new BinaryModelMetrics(scoreAndLabels(s, dir)).roc()
        .select(round(col("fpr"), 6).as("fpr"), round(col("tpr"), 6).as("tpr"))
    }),

    // per-subgroup AUC (fairness slicing): the ranking metric recomputed
    // inside each order-priority slice via the exact rank-sum identity
    // AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) with midranks from per-score
    // counts + PrefixSum.exclusiveBy — ONE scan of orders, one grouped
    // bucketed prefix pass across ALL slices at once (round 8 looped the
    // 5 slices on the driver, each with its own scan; round 9's grouped
    // prefix sum is the generalization users should copy), exact
    // half-integer arithmetic, never a low-cardinality window partition
    "q161_grouped_auc" -> ((s, dir) => {
      val base = Tables.orders(s, dir).select(
        col("o_orderpriority").as("g"),
        (((col("o_orderkey") * 2654435761L) % 1000) / 1000.0).as("score"),
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("label"))
      // persist the TINY per-(group, score) aggregate (≤ groups × score
      // buckets rows): exclusiveBy's three-phase dataflow references its
      // input from differently-pruned branches, which defeats exchange
      // reuse — pinning the aggregate means orders is scanned ONCE and
      // the diamond fans out over ~5k cached rows (PlanAuditSpec pins the
      // single-scan shape). NOTE: there is no matching unpersist — the
      // returned DataFrame still references the cached frame, so releasing
      // it here would defeat the pin. Bench clearCache()s between passes;
      // any other long-lived session reusing this query repeatedly should
      // clear the (tiny, ≤ groups × buckets rows) entry itself.
      val byV = base.groupBy(col("g"), col("score"))
        .agg(sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("cp"),
          count(lit(1)).as("cnt"))
        .persist()
      val ranked = graft.sql.PrefixSum
        .exclusiveBy(byV, Seq("g"), "score", "cnt", "cb")
        .withColumn("midrank",
          col("cb").cast("double") + (col("cnt") + 1).cast("double") / 2.0)
      ranked.groupBy(col("g"))
        .agg(sum(col("cp")).cast("double").as("np"),
          (sum(col("cnt")) - sum(col("cp"))).cast("double").as("nn"),
          sum(col("cp").cast("double") * col("midrank")).as("rp"))
        .select(col("g"),
          round((col("rp") - col("np") * (col("np") + 1.0) / 2.0) /
            (col("np") * col("nn")), 9).as("auc"),
          col("np").cast("long").as("n_pos"),
          col("nn").cast("long").as("n_neg"))
    }),

    // reliability diagram + ECE: the calibration companion to the ranking
    // curves — one histogram-shaped groupBy on the predicted axis, the
    // ECE a count-weighted fold of the tiny bin table (broadcast back so
    // the output is one tidy frame)
    "q132_calibration" -> ((s, dir) => {
      val cal = new graft.evaluation.ScoreCalibration(10)
      val rel = cal.reliability(scoreAndLabels(s, dir), "score", "label")
      rel.crossJoin(broadcast(cal.ece(rel)))
        .select(col("bin"), col("n"),
          round(col("confidence"), 6).as("confidence"),
          round(col("accuracy"), 6).as("accuracy"),
          round(col("gap"), 6).as("gap"),
          round(col("ece"), 6).as("ece"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the same per-slice midrank construction over an ordered window
    "q161_grouped_auc" ->
      """WITH sl AS (
        |  SELECT o_orderpriority AS g,
        |    ((o_orderkey * 2654435761) % 1000) / 1000.0 AS score,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS label
        |  FROM orders
        |), byv AS (
        |  SELECT g, score,
        |    sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS cp,
        |    count(*) AS cnt
        |  FROM sl GROUP BY 1, 2
        |), r AS (
        |  SELECT g, cp, cnt,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      + CAST(cnt + 1 AS DOUBLE) / 2.0 AS midrank
        |  FROM byv
        |), agg AS (
        |  SELECT g, CAST(sum(cp) AS DOUBLE) AS np,
        |    CAST(sum(cnt) - sum(cp) AS DOUBLE) AS nn,
        |    sum(CAST(cp AS DOUBLE) * midrank) AS rp
        |  FROM r GROUP BY 1
        |)
        |SELECT g, round((rp - np * (np + 1.0) / 2.0) / (np * nn), 9) AS auc,
        |  CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
        |FROM agg""".stripMargin,
    // equal-width bins on the predicted axis; every sum feeding
    // accuracy/n is integer-valued, confidence/ece tolerate aggregation-
    // order ulp via round(6) like the rest of the metrics family
    "q132_calibration" ->
      """WITH sl AS (
        |  SELECT ((o_orderkey * 2654435761) % 1000) / 1000.0 AS score,
        |         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS label
        |  FROM orders
        |), b AS (
        |  SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin, count(*) AS n,
        |    avg(score) AS confidence, avg(label) AS accuracy
        |  FROM sl GROUP BY 1
        |), g AS (
        |  SELECT bin, n, confidence, accuracy,
        |    abs(confidence - accuracy) AS gap
        |  FROM b
        |), e AS (SELECT sum(gap * n) / sum(n) AS ece FROM g)
        |SELECT bin, n, round(confidence, 6) AS confidence,
        |  round(accuracy, 6) AS accuracy, round(gap, 6) AS gap,
        |  round(ece, 6) AS ece
        |FROM g, e""".stripMargin,
    "q15_gains_curve" ->
      (cumSql +
        """
          |SELECT round((tp + fp) / (p + n), 6) AS reach, round(tp / p, 6) AS recall FROM cum
          |UNION ALL SELECT CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
          |UNION ALL SELECT CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)""".stripMargin),
    "q16_lift_curve" ->
      (cumSql +
        """
          |SELECT round((tp + fp) / (p + n), 6) AS reach,
          |       round((tp / p) / ((tp + fp) / (p + n)), 6) AS lift
          |FROM cum""".stripMargin),
    "q17_auc_roc" ->
      (cumSql +
        """, pts AS (
          |  SELECT 0 AS seq, CAST(0.0 AS DOUBLE) AS fpr, CAST(0.0 AS DOUBLE) AS tpr
          |  UNION ALL
          |  SELECT row_number() OVER (ORDER BY score DESC) AS seq,
          |         fp / n AS fpr, tp / p AS tpr
          |  FROM cum
          |  UNION ALL
          |  SELECT 9223372036854775807 AS seq, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)
          |), segs AS (
          |  SELECT fpr, tpr,
          |         lag(fpr) OVER (ORDER BY seq) AS pfpr,
          |         lag(tpr) OVER (ORDER BY seq) AS ptpr
          |  FROM pts
          |)
          |SELECT round(sum((fpr - pfpr) * (tpr + ptpr) / 2), 6) AS auc
          |FROM segs WHERE pfpr IS NOT NULL""".stripMargin),
    "q18_precision_recall_by_threshold" ->
      (cumSql +
        """
          |SELECT round(score, 6) AS score,
          |       round(tp / (tp + fp), 6) AS precision,
          |       round(tp / p, 6) AS recall
          |FROM cum""".stripMargin),
    "q33_fmeasure" ->
      (cumSql +
        """
          |SELECT round(score, 6) AS score,
          |  round(CASE WHEN 4.0 * (tp / (tp + fp)) + (tp / p) = 0 THEN 0.0
          |        ELSE ((1 + 4.0) * (tp / (tp + fp)) * (tp / p)) /
          |             (4.0 * (tp / (tp + fp)) + (tp / p)) END, 6) AS fmeasure
          |FROM cum""".stripMargin),
    "q34_pr_curve" ->
      (cumSql +
        """
          |SELECT round(tp / p, 6) AS recall, round(tp / (tp + fp), 6) AS precision FROM cum
          |UNION ALL
          |(SELECT CAST(0.0 AS DOUBLE) AS recall, round(tp / (tp + fp), 6) AS precision
          | FROM cum ORDER BY score DESC LIMIT 1)""".stripMargin),
    "q40_roc_curve" ->
      (cumSql +
        """
          |SELECT round(fp / n, 6) AS fpr, round(tp / p, 6) AS tpr FROM cum
          |UNION ALL SELECT CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
          |UNION ALL SELECT CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)""".stripMargin),
    "q26_gains_binned" ->
      """WITH sl AS (
        |  SELECT ((o_orderkey * 2654435761) % 1000) / 1000.0 AS score,
        |         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS label
        |  FROM orders
        |), by_score AS (
        |  SELECT score, sum(label) AS pos, count(*) AS cnt FROM sl GROUP BY score
        |), ranked AS (
        |  SELECT score, pos, cnt,
        |    row_number() OVER (ORDER BY score DESC) AS seq,
        |    count(*) OVER () AS nsc
        |  FROM by_score
        |), binned AS (
        |  SELECT CASE WHEN nsc // 100 >= 2 THEN (seq - 1) // (nsc // 100) ELSE seq END AS bin,
        |    max(score) AS score, sum(pos) AS pos, sum(cnt) AS cnt
        |  FROM ranked GROUP BY 1
        |), cum AS (
        |  SELECT score,
        |    sum(pos) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |    sum(cnt - pos) OVER (ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
        |    sum(pos) OVER () AS p,
        |    sum(cnt - pos) OVER () AS n
        |  FROM binned
        |)
        |SELECT round((tp + fp) / (p + n), 6) AS reach, round(tp / p, 6) AS recall FROM cum
        |UNION ALL SELECT CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
        |UNION ALL SELECT CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)""".stripMargin
  )
}
