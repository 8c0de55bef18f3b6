package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series anomaly flags from an exponentially-weighted
  * mean/variance monitor: event t is scored against the smoother state
  * BEFORE it folded in — z_t = (x_t − m_{t−1}) / sqrt(v_{t−1}) — so an
  * outlier cannot suppress its own detection by inflating the variance it
  * is judged against.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief):
  * the drift/outage/corruption tripwire an always-on ingest pipeline keeps
  * per feed, and the batch backfill of the [[graft.streaming.EwmaStream]]
  * monitor family.
  *
  * == The variance identity (why there is no second recurrence) ==
  *
  * The exponentially-weighted variance recurrence (West 1979, the
  * `adjust=False, bias=True` convention):
  *
  *   m_t = α·x_t + (1−α)·m_{t−1}
  *   v_t = (1−α)·(v_{t−1} + α·(x_t − m_{t−1})²),   v_seed = 0
  *
  * depends on the MEAN's previous output, so computing it directly would
  * chain a second sequential pass behind the first. Expanding the square
  * shows v_t = q_t − m_t² where q_t is the plain EWMA of x_t² with the
  * same α and the same first-value seed (q_seed = x² ⇒ v_seed = 0, exactly
  * West's convention). So the plan is two INDEPENDENT
  * [[EwmaFeatures]] smoothers over the same frame — one on x, one on x² —
  * with no sequential dependency between them, each the segmented
  * two-phase affine scan with no per-key row-size bound. The price of the
  * two-sided form is the classic cancellation at q − m² when the
  * coefficient of variation is tiny (clamped at 0, never negative); the
  * alternative — the direct recurrence — costs a cross-pass sequential
  * dependency and buys last-ulp conditioning this detector does not need
  * (a z-score threshold at 3σ is insensitive to ulps in σ).
  *
  * == Cold-start contract ==
  *
  * A row is scored only when all of: its value is non-null, at least
  * `minPrior` non-null observations precede it on its key, and the prior
  * variance is strictly positive. Otherwise z is null and is_anomaly 0 —
  * a constant-history key never flags until real dispersion appears (the
  * conservative cold-start rule every EWMA monitor needs; the clamp makes
  * "variance rounded to -0.0 by cancellation" land here too, as a
  * non-score rather than a spurious flag).
  *
  * == Scale ==
  *
  * Two segmented smoothers (each: one keyed partial-agg + one keyed
  * gather bounded by the segment size + one bounded summary window), two
  * (key, tie) hash joins attaching their outputs back to the row frame,
  * and ONE key-partitioned lag/count window with streaming (bounded)
  * frames. No per-key gather of full history anywhere — hot keys inherit
  * EwmaFeatures' no-row-size-cap property. Null keys are real groups
  * (null-safe joins, the EwmaFeatures convention); a null order value
  * fails loudly inside the smoothers.
  *
  * Numeric contract: mean/msq are the segmented smoothers' bit-pinned
  * outputs (the q127 oracle discipline); variance, z and the flag are
  * fixed-op-order arithmetic on them, so the q178 oracle replays the whole
  * pipeline bit-for-bit with no rounding tolerance.
  *
  * Input contract: `tieCol` must uniquely identify a row WITHIN its key —
  * the smoother outputs join back on (key, tie), so duplicate (key, tie)
  * rows fan that join out k² ways with mixed means (silently wrong, the
  * reason the contract is stated here). The streaming batch route
  * ([[graft.streaming.AnomalyStream.detect]]) enforces it upfront by
  * flagging ANY reused per-key tie before calling this operator; direct
  * callers with possibly-duplicated ties should dedupe the same way
  * first.
  */
class AnomalyDetector(
    alpha: Double = 0.25,
    threshold: Double = 3.0,
    minPrior: Int = 2,
    keyCol: String = "user_id",
    orderCol: String = "ts_us",
    valueCol: String = "value",
    tieCol: String = "event_id") {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
  require(threshold > 0.0, s"threshold ($threshold) must be positive")
  require(minPrior >= 1,
    s"minPrior ($minPrior) must be >= 1 (z against zero prior observations " +
      "is undefined; >= 2 gives the variance a chance to be nonzero)")

  /** (key, tie, value, mean, variance, z, is_anomaly): one row per input
    * event. mean/variance are the post-fold smoother state at t; z scores
    * x_t against the PRE-fold state (m_{t−1}, v_{t−1}); is_anomaly is an
    * INT 0/1 (1 iff z is defined and |z| > threshold).
    */
  def transform(events: DataFrame): DataFrame = {
    val base = events.select(col(keyCol).as("__k"), col(orderCol).as("__o"),
      col(tieCol).as("__tie"), col(valueCol).cast("double").as("__v"))

    // the two independent smoothers; x² is computed BEFORE its smoother
    // folds (one multiply per row — the same op the oracle replays)
    val m = new EwmaFeatures(alpha, "__k", "__o", "__v", "__tie")
      .transform(base)
      .select(col("__k").as("__mk"), col("__tie").as("__mt"),
        col("ewma").as("mean"))
    val q = new EwmaFeatures(alpha, "__k", "__o", "__v2", "__tie")
      .transform(base.withColumn("__v2", col("__v") * col("__v")))
      .select(col("__k").as("__qk"), col("__tie").as("__qt"),
        col("ewma").as("msq"))

    // attach both smoother outputs back to the ordered row frame
    // (EwmaFeatures drops the order column); (key, tie) identifies a row,
    // null-safe on BOTH so null keys/ties join like they grouped
    val joined = base
      .join(m, col("__k") <=> col("__mk") && col("__tie") <=> col("__mt"))
      .drop("__mk", "__mt")
      .join(q, col("__k") <=> col("__qk") && col("__tie") <=> col("__qt"))
      .drop("__qk", "__qt")

    val w = Window.partitionBy(col("__k")).orderBy(col("__o"), col("__tie"))
    val wPrior = w.rowsBetween(Window.unboundedPreceding, -1)
    // CASE-form clamp, deliberately NOT greatest(expr, 0.0): Spark's
    // greatest SKIPS nulls (greatest(NULL, 0.0) = 0.0) so a pre-seed row
    // would read variance 0 instead of null — and the oracle engine
    // disagrees on the same corner. CASE propagates null identically in
    // both engines.
    def clampVar(mq: org.apache.spark.sql.Column,
        mm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(mq - mm * mm < 0.0, lit(0.0)).otherwise(mq - mm * mm)

    joined
      .withColumn("__mprev", lag(col("mean"), 1).over(w))
      .withColumn("__qprev", lag(col("msq"), 1).over(w))
      .withColumn("__nprior", count(col("__v")).over(wPrior))
      .withColumn("variance", clampVar(col("msq"), col("mean")))
      .withColumn("__vprev", clampVar(col("__qprev"), col("__mprev")))
      .withColumn("z",
        when(col("__v").isNotNull && col("__mprev").isNotNull &&
          col("__nprior") >= minPrior && col("__vprev") > 0.0,
          (col("__v") - col("__mprev")) / sqrt(col("__vprev"))))
      .withColumn("is_anomaly",
        when(col("z").isNotNull && abs(col("z")) > threshold, lit(1))
          .otherwise(lit(0)))
      .select(col("__k").as(keyCol), col("__tie").as(tieCol),
        col("__v").as(valueCol), col("mean"), col("variance"),
        col("z"), col("is_anomaly"))
  }
}
