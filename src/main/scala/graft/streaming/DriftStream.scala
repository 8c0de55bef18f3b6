package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed distribution-drift monitor: per (tumbling window, group), the
  * Population Stability Index of the value distribution against a FIXED
  * reference histogram — the live tripwire behind
  * [[graft.feature.DriftMonitor]]'s batch snapshot-vs-snapshot gate:
  * "is this hour's feed still shaped like the corpus we calibrated on".
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == One aggregation, streaming-legal ==
  *
  * Structured Streaming allows a single aggregation per query, so the
  * per-bin histogram CANNOT be a bin-keyed groupBy re-aggregated per
  * window (the batch HistogramSketch shape). Instead each bin is a
  * conditional `count(when(bin = i))` INSIDE the one (window, group)
  * aggregation — numBins parallel algebraic partials, codegen-friendly,
  * partial-aggregated map-side — and PSI is a row-local fold over the
  * resulting counts. Works unchanged on batch frames (watermark no-op),
  * which is the q182 oracle surface; state per (window, group) is
  * numBins longs.
  *
  * == Determinism contract ==
  *
  * Binning is the [[graft.sql.HistogramSketch]] convention:
  * `floor((v − lo)/width)` clamped to [0, numBins) — out-of-range values
  * land in the edge bins, null values are not observations. Live shares
  * are Laplace-half-count smoothed, `(c + 0.5)/(n + 0.5·B)` (the
  * DriftMonitor convention), so an empty bin never produces ln(0); the
  * REFERENCE must arrive strictly positive and summing to 1 (smooth it
  * upstream — a reference is calibration data, fixed and tiny). PSI
  * terms are added in FIXED bin order, and `width` should divide
  * (hi − lo) exactly representably when bit-replay matters (the q182
  * oracle replays the identical binning, smoothing and term order;
  * ln() is rounded at 6dp there — last-ulp libm differences between
  * engines are absorbed, the q111 discipline).
  */
object DriftStream {

  /** (window_start, group, n_events, psi) per tumbling window —
    * `n_events` counts the NON-NULL, non-NaN observations (a null or NaN
    * value is not a distribution sample; [[StreamMonitor.stats]] is the
    * null-rate channel). `psi` is NULL when a (window, group) has zero
    * observations: no distribution to compare, but the row still
    * surfaces — the monitor contract.
    */
  def psi(
      events: DataFrame,
      refProbs: Seq[Double],
      lo: Double,
      hi: Double,
      windowLength: String = "1 hour",
      watermark: String = "2 hours",
      tsCol: String = "ts",
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val numBins = refProbs.size
    require(numBins > 1 && numBins <= 64,
      s"refProbs size ($numBins) must be in (1, 64] — one count aggregate " +
        "per bin rides the single streaming aggregation")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(refProbs.forall(_ > 0.0),
      "reference probabilities must be strictly positive (smooth the " +
        "reference upstream; PSI needs ln(p/q) defined for every bin)")
    require(math.abs(refProbs.sum - 1.0) < 1e-9,
      s"reference probabilities must sum to 1, got ${refProbs.sum}")
    val width = (hi - lo) / numBins
    val v = col(valueCol).cast("double")
    // explicit null branch, NOT bare greatest/least: Spark's least SKIPS
    // nulls, so least(numBins-1, NULL) = numBins-1 and a null value would
    // silently land in the LAST bin as a phantom observation (the same
    // null-skipping trap rankByValue and the variance clamp document).
    // NaN is excluded with null: floor((NaN-lo)/width) is NaN and the
    // non-ANSI double→int cast turns NaN into 0 — a NaN would otherwise
    // silently count as a bin-0 observation (unlike null), and the oracle
    // replay's strict NaN→INT cast would error. A NaN is not a
    // distribution sample any more than a null is.
    val bin: Column = when(v.isNull || isnan(v), lit(null).cast("int"))
      .otherwise(greatest(lit(0), least(lit(numBins - 1),
        floor((v - lit(lo)) / lit(width)).cast("int"))))

    val binCounts = (0 until numBins).map(i =>
      count(when(bin === i, 1)).as(s"__c$i"))
    val agg = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(groupCol))
      .agg(binCounts.head, binCounts.tail: _*)

    val n = (0 until numBins).map(i => col(s"__c$i")).reduce(_ + _)
    val denom = col("__n").cast("double") + lit(0.5 * numBins)
    val psiSum = (0 until numBins).map { i =>
      val p = (col(s"__c$i").cast("double") + lit(0.5)) / denom
      val q = lit(refProbs(i))
      (p - q) * log(p / q) // fixed bin order; log is natural (ln)
    }.reduce(_ + _)

    agg
      .withColumn("__n", n)
      .select(col("window.start").as("window_start"), col(groupCol),
        col("__n").as("n_events"),
        when(col("__n") > 0L, psiSum).as("psi"))
  }
}
