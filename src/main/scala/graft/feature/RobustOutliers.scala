package graft.feature

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via the modified z-score: flag rows
  * where |x − median| / MAD exceeds `cutoff` (MAD = median absolute
  * deviation, the robust spread estimate that — unlike stddev — a single
  * extreme value cannot inflate to hide itself behind). The standard
  * data-cleaning gate for metric streams and label columns before training.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale shape mirrors [[Winsorizer]]: two statistics passes that each
  * produce ONE row per group (exact interpolated `percentile` aggregates,
  * partial-aggregated), joined back onto the stream. The join strategy is
  * left to AQE: group cardinality is unbounded, so a hard `broadcast` hint
  * would turn a high-cardinality groupCol into a driver/broadcast OOM —
  * AQE broadcasts the one-row-per-group frames while they are small and
  * falls back to a shuffle join when they are not. Pass 1 learns medians;
  * pass 2 learns the MAD from row-local absolute deviations; pass 3 flags
  * row-locally inside whole-stage codegen. Zero-MAD groups (over half the
  * values identical) flag nothing rather than dividing by zero.
  */
class RobustOutliers(
    cutoff: Double = 3.5,
    approx: Boolean = false,
    accuracy: Int = 10000) {
  require(cutoff > 0.0, s"cutoff ($cutoff) must be positive")
  require(accuracy > 0, s"accuracy ($accuracy) must be positive")

  /** Exact interpolated median by default (oracle-replayable, q89); with
    * `approx`, a fixed-state `percentile_approx` sketch — the 100 TB path
    * when per-group distinct values are unbounded (same trade as
    * [[Winsorizer]] / [[graft.sql.TableProfiler]]).
    */
  private def med(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Percentiles.maybeApprox(v, 0.5, approx, accuracy)

  /** Input plus `med`, `mad`, `robust_z`, `is_outlier`. Row-preserving:
    * the statistic joins are null-safe, so a NULL group is screened
    * against its own median/MAD instead of silently vanishing from an
    * inner equi-join.
    */
  def flag(df: Dataset[_], groupCol: String, valueCol: String): DataFrame = {
    val meds = df.groupBy(col(groupCol))
      .agg(med(col(valueCol)).as("med"))
      .withColumnRenamed(groupCol, "__ro_g")
    val withMed = df.join(meds, col(groupCol) <=> col("__ro_g"))
      .drop("__ro_g")
    val mads = withMed
      .withColumn("__ad", abs(col(valueCol) - col("med")))
      .groupBy(col(groupCol))
      .agg(med(col("__ad")).as("mad"))
      .withColumnRenamed(groupCol, "__ro_g")
    withMed.join(mads, col(groupCol) <=> col("__ro_g"))
      .drop("__ro_g")
      .withColumn("robust_z",
        when(col("mad") > 0, abs(col(valueCol) - col("med")) / col("mad"))
          .otherwise(lit(0.0)))
      .withColumn("is_outlier", col("robust_z") > cutoff)
  }
}
