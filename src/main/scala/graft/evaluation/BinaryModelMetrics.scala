package graft.evaluation

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation curves, DataFrame-native.
  *
  * Re-expresses the reference's fork of Spark 1.5's
  * `BinaryClassificationMetrics` (reference: sparkext-mllib/.../evaluation/
  * BinaryModelMetrics.scala:46-238) — including its two additions, the
  * '''gains''' chart (reach vs recall, with (0,0)/(1,1) endpoints,
  * reference :79-85) and the '''lift''' chart (reach vs lift, :87) — on
  * modern Spark:
  *
  *  - per-score confusion counts: one `groupBy(score)` (distributed, one
  *    shuffle) instead of `combineByKey`
  *  - cumulative TP/FP: a window running-sum ordered by score descending,
  *    replacing the reference's hand-rolled two-phase partition prefix sums
  *    (:198-216)
  *  - `numBins` down-sampling: consecutive chunks of `distinct/numBins`
  *    scores merged, first (=highest) score kept — the same chunking as the
  *    reference (:167-196) but deterministic (the reference's bins depended
  *    on physical partitioning)
  *
  * Scale note: after the per-score aggregation the data is one row per
  * DISTINCT score. The global window runs on a single partition, so for
  * high-cardinality scores set `numBins` (the reference's own advice:
  * "millions of points ... when thousands may be entirely sufficient") or
  * quantize scores upstream; the heavy reduction happened in the
  * distributed groupBy.
  */
class BinaryModelMetrics(scoreAndLabels: DataFrame, numBins: Int = 0) {
  require(numBins >= 0, s"numBins ($numBins) must be nonnegative")

  def this(scoreAndLabels: RDD[(Double, Double)], numBins: Int) =
    this(SparkSession.active.createDataFrame(scoreAndLabels).toDF("score", "label"), numBins)

  def this(scoreAndLabels: RDD[(Double, Double)]) = this(scoreAndLabels, 0)

  private val session: SparkSession = scoreAndLabels.sparkSession
  import session.implicits._

  /** One row per (possibly binned) distinct score, descending, with
    * cumulative confusion counts: tp, fp, plus totals p, n.
    */
  lazy val confusions: DataFrame = {
    val byScore = scoreAndLabels
      .groupBy($"score")
      .agg(sum($"label").cast("double").as("pos"),
        count(lit(1)).cast("double").as("cnt"))

    val binned = if (numBins > 0) {
      val distinctScores = byScore.count()
      val grouping = distinctScores / numBins
      if (grouping < 2) byScore
      else {
        val w = Window.orderBy($"score".desc)
        byScore
          .withColumn("bin", floor((row_number().over(w) - 1) / grouping.toDouble))
          .groupBy($"bin")
          .agg(max($"score").as("score"), sum($"pos").as("pos"), sum($"cnt").as("cnt"))
          .drop("bin")
      }
    } else byScore

    val w = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("tp", sum($"pos").over(w))
      .withColumn("fp", sum($"cnt" - $"pos").over(w))
      .withColumn("p", sum($"pos").over(Window.partitionBy(lit(1))))
      .withColumn("n", sum($"cnt" - $"pos").over(Window.partitionBy(lit(1))))
      .select($"score", $"tp", $"fp", $"p", $"n")
  }

  /** Confusions with a curve-order sequence (1..k by descending score). */
  private lazy val seqConfusions: DataFrame =
    confusions.withColumn("seq",
      row_number().over(Window.orderBy($"score".desc)).cast("long"))

  /** ROC curve: (fpr, tpr) with (0,0) prepended and (1,1) appended. */
  def roc(): DataFrame = rocSeq.orderBy($"seq").select($"fpr", $"tpr")

  private def rocSeq: DataFrame = {
    val pts = seqConfusions.select($"seq",
      ($"fp" / $"n").as("fpr"), ($"tp" / $"p").as("tpr"))
    endpoints(0L, 0.0, 0.0).union(pts).union(endpoints(Long.MaxValue, 1.0, 1.0))
      .toDF("seq", "fpr", "tpr")
  }

  /** Precision-recall curve: (recall, precision), (0, p1) prepended. */
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

  def fMeasureByThreshold(beta: Double = 1.0): DataFrame = {
    val b2 = beta * beta
    confusions.select($"score",
      (((lit(1) + b2) * ($"tp" / ($"tp" + $"fp")) * ($"tp" / $"p")) /
        (lit(b2) * ($"tp" / ($"tp" + $"fp")) + ($"tp" / $"p"))).as("fMeasure"))
  }

  def areaUnderROC(): Double = trapezoid(rocSeq, "fpr", "tpr")

  def areaUnderPR(): Double = trapezoid(prSeq, "recall", "precision")

  /** Trapezoid rule in CURVE order (seq = threshold order): ties on x must
    * join segments at the first-seen point, exactly as the sequential
    * reference computation does.
    */
  private def trapezoid(points: DataFrame, x: String, y: String): Double = {
    val w = Window.orderBy($"seq")
    points
      .select(col(x), col(y),
        lag(col(x), 1).over(w).as("px"), lag(col(y), 1).over(w).as("py"))
      .where(col("px").isNotNull)
      .select(sum((col(x) - col("px")) * (col(y) + col("py")) / 2).as("auc"))
      .first().getDouble(0)
  }

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
