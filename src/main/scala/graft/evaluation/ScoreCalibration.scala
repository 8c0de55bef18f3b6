package graft.evaluation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probability-calibration diagnostics for a binary scorer: the
  * reliability table (per-bin mean predicted probability vs empirical
  * positive rate) and the Expected Calibration Error
  *
  *   ECE = Σ_b (n_b / N) · |conf_b − acc_b|
  *
  * — the companion diagnostic to [[BinaryModelMetrics]]' ranking curves:
  * AUC says the ORDER is right, calibration says the PROBABILITIES mean
  * what they claim, which is what selection thresholds (keep documents
  * with P(quality) > 0.7) and importance weights actually consume. A
  * curation pipeline that thresholds an uncalibrated classifier is
  * silently running a different selection rule than it thinks.
  *
  * Scores are binned equal-width on [0, 1] into `numBins` buckets
  * (score 1.0 clamps into the last bin; binning on the PREDICTED axis is
  * what makes it a reliability diagram). Output per bin: row count, mean
  * score (confidence), positive fraction (accuracy), and the bin's
  * absolute gap — `ece` of the whole table is the count-weighted mean of
  * `gap`.
  *
  * Scale: one partial-aggregated `groupBy(bin)` over row-local bin
  * assignment — the same single-pass shape as a histogram; never a sort,
  * never a window. Beyond-reference operator (evaluation-family
  * extension).
  */
class ScoreCalibration(numBins: Int = 10) {
  require(numBins > 1, s"numBins ($numBins) must be > 1")

  /** (bin, n, confidence, accuracy, gap) per non-empty bin, bin ascending
    * by construction of the group key. `scoreCol` must lie in [0, 1];
    * `labelCol` is interpreted as positive iff its double cast is 1.0.
    */
  def reliability(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    // clamp BOTH edges (HistogramSketch.bin discipline): a score slightly
    // below 0 or a NULL score would otherwise mint a phantom negative/NULL
    // bin row and silently skew ECE; out-of-contract inputs land in the
    // edge bins instead, and NULL scores are dropped up front
    val bin = greatest(lit(0),
      least(floor(s * numBins).cast("int"), lit(numBins - 1)))
    df.where(s.isNotNull)
      .select(bin.as("bin"),
        s.as("__s"),
        when(col(labelCol).cast("double") === 1.0, 1.0).otherwise(0.0).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        avg(col("__s")).as("confidence"),
        avg(col("__y")).as("accuracy"))
      .withColumn("gap", abs(col("confidence") - col("accuracy")))
  }

  /** Single-row ECE from a [[reliability]] table: count-weighted mean gap. */
  def ece(rel: DataFrame): DataFrame =
    rel.agg((sum(col("gap") * col("n")) / sum(col("n"))).as("ece"))
}
