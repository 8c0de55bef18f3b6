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
  * partial-aggregated), broadcast back onto the stream; the big table is
  * never shuffled. Pass 1 learns medians; pass 2 learns the MAD from
  * row-local absolute deviations; pass 3 flags row-locally inside
  * whole-stage codegen. Zero-MAD groups (over half the values identical)
  * flag nothing rather than dividing by zero.
  */
class RobustOutliers(cutoff: Double = 3.5) {
  require(cutoff > 0.0, s"cutoff ($cutoff) must be positive")

  /** Input plus `med`, `mad`, `robust_z`, `is_outlier`. */
  def flag(df: Dataset[_], groupCol: String, valueCol: String): DataFrame = {
    val meds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(meds), groupCol)
    val mads = withMed
      .withColumn("__ad", abs(col(valueCol) - col("med")))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__ad, 0.5)").as("mad"))
    withMed.join(broadcast(mads), groupCol)
      .withColumn("robust_z",
        when(col("mad") > 0, abs(col(valueCol) - col("med")) / col("mad"))
          .otherwise(lit(0.0)))
      .withColumn("is_outlier", col("robust_z") > cutoff)
  }
}
