package graft.evaluation

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation curves, DataFrame-native and scale-safe.
  *
  * Re-expresses the reference's fork of Spark 1.5's
  * `BinaryClassificationMetrics` (reference: sparkext-mllib/.../evaluation/
  * BinaryModelMetrics.scala:46-238) — including its two additions, the
  * '''gains''' chart (reach vs recall, with (0,0)/(1,1) endpoints,
  * reference :79-85) and the '''lift''' chart (reach vs lift, :87) — on
  * modern Spark.
  *
  * Scale design (the reference's own two-phase trick at :198-216, made
  * declarative so the plan stays lazy and Catalyst-optimizable):
  *
  *  - per-score confusion counts: one `groupBy(score)` (distributed, single
  *    shuffle with map-side partial aggregation)
  *  - cumulative TP/FP: '''bucketed two-phase prefix sums''' — scores are
  *    range-bucketed via a broadcast (min, max) scalar aggregate, running
  *    sums are computed per-bucket with a PARTITIONED window (parallel), and
  *    cross-bucket offsets come from a bounded `numScoreBuckets`-row
  *    triangle self-join (broadcast). No unpartitioned window anywhere, so
  *    no single-task global sort at any input cardinality.
  *  - totals P/N: scalar aggregate + `crossJoin(broadcast(...))`, never a
  *    whole-frame window.
  *  - AUC: trapezoid per-segment areas are derivable from each row's own
  *    cumulative counts (previous point = current minus this score's
  *    deltas), so both areas reduce to ONE distributed `sum` — no `lag`
  *    window, and the returned value/frame is lazy until an action runs.
  *  - `numBins` down-sampling: consecutive chunks of `distinct/numBins`
  *    scores merged via the two-phase sequence number (deterministic; the
  *    reference's bins at :167-196 depended on physical partitioning).
  *
  * Bucket skew note: scores concentrated in a narrow range can crowd one
  * range bucket; raise `numScoreBuckets` (default 1024) or pre-quantize
  * scores if a single bucket's distinct-score count is still huge.
  */
class BinaryModelMetrics(
    scoreAndLabels: DataFrame,
    numBins: Int = 0,
    numScoreBuckets: Int = 1024) {
  require(numBins >= 0, s"numBins ($numBins) must be nonnegative")
  require(numScoreBuckets > 0, s"numScoreBuckets ($numScoreBuckets) must be positive")

  def this(scoreAndLabels: RDD[(Double, Double)], numBins: Int) =
    this(SparkSession.active.createDataFrame(scoreAndLabels).toDF("score", "label"), numBins)

  def this(scoreAndLabels: RDD[(Double, Double)]) = this(scoreAndLabels, 0)

  private val session: SparkSession = scoreAndLabels.sparkSession
  import session.implicits._

  /** Adds cumulative columns to a (score, pos, cnt) frame: tp, fp (running
    * sums by descending score), seq (1-based rank by descending score), and
    * broadcast totals p, n, nscores. Two-phase: per-bucket partitioned
    * window + bounded cross-bucket offset join.
    */
  private def cumulative(byScore: DataFrame): DataFrame = {
    val stats = byScore.agg(
      sum($"pos").as("p"),
      sum($"cnt" - $"pos").as("n"),
      min($"score").as("smin"),
      max($"score").as("smax"),
      count(lit(1)).as("nscores"))

    val b = numScoreBuckets
    // bucket 0 holds the HIGHEST scores so bucket order == curve order
    val withB = byScore.crossJoin(broadcast(stats))
      .withColumn("bkt",
        when($"smax" === $"smin", lit(0L))
          .otherwise(least(lit(b - 1L),
            floor((($"smax" - $"score") / ($"smax" - $"smin")) * b)).cast("long")))

    val wIn = Window.partitionBy($"bkt").orderBy($"score".desc)
    val wInRows = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val part = withB
      .withColumn("tp_in", sum($"pos").over(wInRows))
      .withColumn("fp_in", sum($"cnt" - $"pos").over(wInRows))
      .withColumn("seq_in", row_number().over(wIn).cast("long"))

    // per-bucket totals (≤ numScoreBuckets rows) → offsets from strictly
    // earlier buckets via triangle self-join (no window, fully parallel)
    val bt = withB.groupBy($"bkt").agg(
      sum($"pos").as("bp"), sum($"cnt" - $"pos").as("bn"), count(lit(1)).as("br"))
    val offsets = bt.as("x")
      .join(bt.select($"bkt".as("yb"), $"bp".as("ybp"), $"bn".as("ybn"), $"br".as("ybr")),
        $"yb" < $"x.bkt", "left")
      .groupBy($"x.bkt")
      .agg(
        coalesce(sum($"ybp"), lit(0.0)).as("tp0"),
        coalesce(sum($"ybn"), lit(0.0)).as("fp0"),
        coalesce(sum($"ybr"), lit(0L)).as("seq0"))

    part.join(broadcast(offsets), "bkt")
      .select($"score", $"pos", $"cnt",
        ($"tp_in" + $"tp0").as("tp"),
        ($"fp_in" + $"fp0").as("fp"),
        ($"seq_in" + $"seq0").as("seq"),
        $"p", $"n", $"nscores")
  }

  /** One row per (possibly numBins-merged) distinct score with per-score
    * deltas (pos, cnt), cumulative confusion counts (tp, fp), curve rank
    * (seq) and totals (p, n).
    */
  private lazy val cum: DataFrame = {
    val byScore = scoreAndLabels
      .groupBy($"score")
      .agg(sum($"label").cast("double").as("pos"),
        count(lit(1)).cast("double").as("cnt"))
    val full = cumulative(byScore)
    if (numBins == 0) full
    else {
      // chunk size = distinct/numBins (integer division, same as the
      // reference :179); < 2 → binning is a no-op, exactly like :171-173
      val binned = full
        .withColumn("grouping", floor($"nscores" / numBins))
        .withColumn("bin",
          when($"grouping" >= 2, floor(($"seq" - 1) / $"grouping")).otherwise($"seq"))
        .groupBy($"bin")
        .agg(max($"score").as("score"), sum($"pos").as("pos"), sum($"cnt").as("cnt"))
        .select($"score", $"pos", $"cnt")
      cumulative(binned)
    }
  }

  /** One row per (possibly binned) distinct score, with cumulative tp/fp
    * and totals p, n.
    */
  lazy val confusions: DataFrame = cum.select($"score", $"tp", $"fp", $"p", $"n")

  /** Confusions with the curve-order sequence (1..k by descending score). */
  private lazy val seqConfusions: DataFrame =
    cum.select($"score", $"tp", $"fp", $"p", $"n", $"seq")

  /** ROC curve: (fpr, tpr) with (0,0) prepended and (1,1) appended. */
  def roc(): DataFrame = rocSeq.orderBy($"seq").select($"fpr", $"tpr")

  private def rocSeq: DataFrame = {
    val pts = seqConfusions.select($"seq",
      ($"fp" / $"n").as("fpr"), ($"tp" / $"p").as("tpr"))
    endpoints(0L, 0.0, 0.0).union(pts).union(endpoints(Long.MaxValue, 1.0, 1.0))
      .toDF("seq", "fpr", "tpr")
  }

  /** Precision-recall curve: (recall, precision), (0, p1) prepended.
    *
    * Intentional divergence from the reference (which prepends (0.0, 1.0),
    * Spark ≤2.2 behavior): we prepend (0, firstPrecision), matching Spark
    * ≥2.3 / SPARK-21806 — the (0,1) point overstated areaUnderPR for models
    * whose top-scored example is negative.
    */
  def pr(): DataFrame = prSeq.orderBy($"seq").select($"recall", $"precision")

  private def prSeq: DataFrame = {
    val pts = seqConfusions.select($"seq",
      ($"tp" / $"p").as("recall"),
      ($"tp" / ($"tp" + $"fp")).as("precision"))
    val first = pts.orderBy($"seq").limit(1).select(lit(0L), lit(0.0), $"precision")
    first.union(pts).toDF("seq", "recall", "precision")
  }

  /** Gains chart: (reach, recall) with (0,0) and (1,1) endpoints —
    * the reference's first addition (BinaryModelMetrics.scala:79-85).
    */
  def gains(): DataFrame = {
    val pts = seqConfusions.select($"seq",
      (($"tp" + $"fp") / ($"p" + $"n")).as("reach"),
      ($"tp" / $"p").as("recall"))
    endpoints(0L, 0.0, 0.0).union(pts).union(endpoints(Long.MaxValue, 1.0, 1.0))
      .toDF("seq", "reach", "recall")
      .orderBy($"seq").select($"reach", $"recall")
  }

  /** Lift chart: (reach, lift = recall / reach) — the reference's second
    * addition (BinaryModelMetrics.scala:87).
    */
  def lift(): DataFrame =
    confusions.select(
      (($"tp" + $"fp") / ($"p" + $"n")).as("reach"),
      (($"tp" / $"p") / (($"tp" + $"fp") / ($"p" + $"n"))).as("lift"))

  def thresholds(): DataFrame = confusions.select($"score")

  def precisionByThreshold(): DataFrame =
    confusions.select($"score", ($"tp" / ($"tp" + $"fp")).as("precision"))

  def recallByThreshold(): DataFrame =
    confusions.select($"score", ($"tp" / $"p").as("recall"))

  /** F-beta per threshold; 0.0 when precision and recall are both zero
    * (conventional, and required under ANSI mode — the denominator is 0
    * whenever no positive has been retrieved yet).
    */
  def fMeasureByThreshold(beta: Double = 1.0): DataFrame = {
    val b2 = beta * beta
    val precision = $"tp" / ($"tp" + $"fp")
    val recall = $"tp" / $"p"
    val den = lit(b2) * precision + recall
    confusions.select($"score",
      when(den === 0.0, 0.0)
        .otherwise((lit(1) + b2) * precision * recall / den)
        .as("fMeasure"))
  }

  /** Lazy one-row frame with the trapezoid AUC-ROC.
    *
    * Each curve segment ends at a score row and starts at the previous
    * point, which is recoverable from the row itself: prev tp = tp - pos,
    * prev fp = fp - (cnt - pos). With the (0,0) prepend that also covers
    * the first segment (prev counts 0), and the (1,1) append adds a
    * zero-width segment — so the whole area is one distributed sum.
    */
  def areaUnderROCFrame(): DataFrame =
    cum.select(
      ((($"cnt" - $"pos") / $"n") * ($"tp" * 2 - $"pos") / ($"p" * 2)).as("seg"))
      .agg(coalesce(sum($"seg"), lit(0.0)).as("auc"))

  /** Lazy one-row frame with the trapezoid area under the PR curve (with
    * the (0, firstPrecision) prepend: a first row's "previous precision"
    * is its own precision).
    */
  def areaUnderPRFrame(): DataFrame = {
    val prec = $"tp" / ($"tp" + $"fp")
    val prevTotal = $"tp" + $"fp" - $"cnt"
    val prevPrec = when(prevTotal === 0.0, prec).otherwise(($"tp" - $"pos") / prevTotal)
    cum.select((($"pos" / $"p") * (prec + prevPrec) / 2).as("seg"))
      .agg(coalesce(sum($"seg"), lit(0.0)).as("auc"))
  }

  def areaUnderROC(): Double = areaUnderROCFrame().first().getDouble(0)

  def areaUnderPR(): Double = areaUnderPRFrame().first().getDouble(0)

  private def endpoints(seq: Long, x: Double, y: Double): DataFrame =
    session.range(1).select(lit(seq).as("seq"), lit(x).as("x"), lit(y).as("y"))
}

/** Scalar metric computers over a confusion matrix — the reference's
  * `BinaryClassificationMetricComputer` additions
  * (BinaryModelMetricComputer.scala:6-21).
  */
object metrics {

  /** Predicted-positive rate: (TP+FP)/(P+N); 1.0 on empty population. */
  def reach(tp: Long, fp: Long, p: Long, n: Long): Double =
    if (p + n == 0) 1.0 else (tp + fp).toDouble / (p + n)

  /** Recall / Reach. */
  def lift(tp: Long, fp: Long, p: Long, n: Long): Double = {
    val recall = if (p == 0) 0.0 else tp.toDouble / p
    recall / reach(tp, fp, p, n)
  }
}
