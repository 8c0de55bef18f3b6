package graft.feature

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percentile winsorization: clamp a numeric column to its per-group
  * [lower, upper] quantiles — the robust-scaling prepass that keeps a
  * handful of pathological outliers (bot sessions, parse glitches,
  * fat-finger values) from dominating downstream normalization, binning
  * ([[Binning]]), or model features.
  *
  * Two-pass shape that survives 100 TB: pass 1 learns one bounds row per
  * group (partial-aggregated, state bounded by group count, same growth as
  * any groupBy); pass 2 joins the tiny bounds table back (strategy left to
  * AQE — group cardinality is unbounded, so a hard broadcast hint would
  * risk a driver OOM; AQE broadcasts while the frame is small) and clamps
  * row-locally inside whole-stage codegen. While the bounds frame
  * broadcasts — the overwhelmingly common case — the big table is never
  * shuffled, only scanned twice; past the broadcast threshold the join
  * degrades to a shuffle on the group key rather than failing. The clamp
  * pass is where callers chain their real pipeline.
  *
  * By default quantiles are exact with linear interpolation (Spark
  * `percentile`, identical to ANSI `percentile_cont`), so the SQL oracle
  * replays bounds bit-for-bit (q82) — but the exact aggregate's state is
  * bounded by per-group DISTINCT VALUE count, which for a continuous
  * metric at 100 TB is effectively row count. `approx = true` swaps in
  * `percentile_approx` (KLL-sketch state, fixed size `accuracy`) — the
  * same trade as [[graft.sql.TableProfiler]]'s approx flag.
  */
class Winsorizer(
    lower: Double = 0.05,
    upper: Double = 0.95,
    approx: Boolean = false,
    accuracy: Int = 10000) {
  require(0.0 <= lower && lower < upper && upper <= 1.0,
    s"need 0 <= lower < upper <= 1, got [$lower, $upper]")
  require(accuracy > 0, s"accuracy ($accuracy) must be positive")

  private def pct(v: Column, p: Double): Column =
    Percentiles.maybeApprox(v, p, approx, accuracy)

  /** Per-group clamp bounds: one row per group, columns `lo`/`hi`. */
  def bounds(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(pct(col(valueCol), lower).as("lo"),
        pct(col(valueCol), upper).as("hi"))

  /** Input plus `<valueCol>_wins`, the value clamped to the group bounds.
    * Row-preserving: the join back is null-safe, so a NULL group clamps to
    * its own learned bounds instead of silently vanishing from an inner
    * equi-join (NULL never equals NULL).
    */
  def transform(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val b = bounds(df, groupCol, valueCol)
      .withColumnRenamed(groupCol, "__wins_g")
    df.join(b, col(groupCol) <=> col("__wins_g"))
      .drop("__wins_g")
      .withColumn(s"${valueCol}_wins",
        Winsorizer.clamp(col(valueCol), col("lo"), col("hi")))
  }
}

object Winsorizer {
  /** NULL-preserving clamp: Spark's greatest/least SKIP nulls, so the bare
    * `least(greatest(v, lo), hi)` turns a NULL observation into `lo` (and
    * NaN into `hi`) — fabricated data flowing into downstream training as
    * a real value. Missing stays missing. (DuckDB's least/greatest skip
    * nulls the same way, so the oracle carries the same explicit guard.)
    */
  def clamp(v: Column, lo: Column, hi: Column): Column =
    when(v.isNull, lit(null)).otherwise(least(greatest(v, lo), hi))
}
