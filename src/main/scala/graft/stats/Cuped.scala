package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance reduction for A/B readouts (Deng, Xu, Kohavi, Walker,
  * "Improving the Sensitivity of Online Controlled Experiments by
  * Utilizing Pre-Experiment Data", WSDM 2013): adjust each unit's metric
  * by its PRE-period covariate, y' = y - θ·(x - x̄), with θ = cov(x,y)/
  * var(x) estimated POOLED across arms and x̄ the global covariate mean.
  * Randomization makes E[x|arm] equal across arms, so the adjustment
  * shifts nothing in expectation while removing the covariate-explained
  * variance — the standard way to cut experiment runtimes without
  * touching the assignment.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Deterministic contract ==
  *
  * Everything reduces to per-arm moment sums (n, Σx, Σy, Σxy, Σx², Σy²);
  * θ and x̄ come from re-summing those few rows. The DuckDB oracle
  * replays the identical closed forms; cross-engine float-sum order
  * drift lives ~1e-15 relative, far inside the output rounding grids.
  *
  * == Scale shape ==
  *
  * One keyed aggregation to unit grain (the caller's input here), one
  * map-side-combinable per-arm moment aggregation (rows = #arms), one
  * broadcast of the 2-row globals back onto it. No per-unit second pass:
  * mean/variance of the ADJUSTED metric expand algebraically in the same
  * moments (Var(y-θx) = Syy - 2θSxy + θ²Sxx on centered sums), so the
  * adjustment costs zero extra scans at any corpus size.
  */
object Cuped {

  /** Per-arm CUPED readout from per-unit rows: (variant, n, mean_y,
    * mean_y_cuped, var_y, var_y_cuped, theta). Variance columns are
    * sample (n-1) variances, null when an arm has a single unit; theta
    * is the pooled regression coefficient (same value on every row).
    */
  def adjust(
      units: DataFrame,
      variantCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val arms = units.groupBy(col(variantCol).as("variant")).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val glob = broadcast(arms.agg(
      sum(col("n")).cast("double").as("gn"),
      sum(col("sx")).as("gsx"), sum(col("sy")).as("gsy"),
      sum(col("sxy")).as("gsxy"), sum(col("sxx")).as("gsxx"))
      .select(
        // degenerate-covariate fallback: a CONSTANT x has exactly-zero
        // centered Sxx (the guard keys on exact 0, which only identical
        // x values produce) -> theta = 0, i.e. no adjustment, instead of
        // a 0/0 NaN poisoning every output row
        when(col("gsxx") - col("gsx") * col("gsx") / col("gn") =!= 0.0,
          (col("gsxy") - col("gsx") * col("gsy") / col("gn"))
            / (col("gsxx") - col("gsx") * col("gsx") / col("gn")))
          .otherwise(lit(0.0)).as("theta"),
        (col("gsx") / col("gn")).as("xbar")))
    arms.crossJoin(glob)
      .withColumn("nd", col("n").cast("double"))
      // centered per-arm sums (the only cancellation-sensitive step; the
      // oracle writes the IDENTICAL expressions)
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("nd"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("nd"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("nd"))
      .select(
        col("variant"), col("n"),
        (col("sy") / col("nd")).as("mean_y"),
        ((col("sy") - col("theta") * (col("sx") - col("nd") * col("xbar")))
          / col("nd")).as("mean_y_cuped"),
        when(col("n") > 1, col("cyy") / (col("nd") - 1)).as("var_y"),
        when(col("n") > 1,
          (col("cyy") - lit(2.0) * col("theta") * col("cxy")
            + col("theta") * col("theta") * col("cxx")) / (col("nd") - 1))
          .as("var_y_cuped"),
        col("theta"))
  }
}
