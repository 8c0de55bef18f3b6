package graft.feature

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's one definition of the exact-vs-approx percentile trade:
  * exact interpolated `percentile` (ANSI `percentile_cont`, oracle-
  * replayable, but aggregate state bounded by per-group DISTINCT value
  * count) or fixed-state `percentile_approx` (KLL sketch, rank error
  * ~1/accuracy — the 100 TB path). Shared by [[Winsorizer]] and
  * [[RobustOutliers]] so the policy has a single home.
  */
private[graft] object Percentiles {

  def maybeApprox(v: Column, p: Double, approx: Boolean, accuracy: Int): Column = {
    require(accuracy > 0, s"accuracy ($accuracy) must be positive")
    if (approx) percentile_approx(v, lit(p), lit(accuracy))
    else percentile(v, lit(p))
  }
}
