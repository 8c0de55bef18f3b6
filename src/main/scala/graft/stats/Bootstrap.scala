package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals for grouped means and
  * ratio-of-sums metrics — uncertainty
  * for any per-group metric WITHOUT resampling the data (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012; the
  * standard large-scale bootstrap: per-row Poisson(1) replicate weights
  * instead of n-out-of-n draws, since at n in the billions Binomial(n,1/n)
  * IS Poisson(1) and weights need no coordination across rows).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Determinism contract ==
  *
  * Replicate weights come from the engine's md5 coin
  * ([[graft.sql.functions.uniform32]]) on `(idCol, replicate)` — seed-free,
  * partitioning-independent, identical on backfill and replay, and ANSI-
  * replayable by the oracle. The Poisson(1) inverse CDF is applied as
  * EIGHT integer threshold compares (the cumulative probabilities
  * pre-scaled to the [0, 2^32) coin domain and floored to integer
  * literals), so weight assignment is integer arithmetic with zero
  * cross-engine float risk; weights cap at 8 (P[W > 8] ~ 1e-5 — bias
  * far below a 32-replicate CI's own resolution).
  *
  * == Scale shape ==
  *
  * One scan fans each row out ×`replicates` (row-local explode — map work,
  * no extra shuffle keys beyond ×R per group), one partial-aggregated
  * groupBy (group, replicate) reduces to `groups × (R+1)` rows, and the
  * percentile over the R replicate means runs on R values per group. At
  * 100 TB the cost is R× map arithmetic over one scan — the entire point
  * vs. R independent resamples of the corpus. The true mean rides as the
  * weight-1 IDENTITY replicate (r = −1) in the same aggregation, so the
  * input is scanned exactly once.
  */
object Bootstrap {

  /** floor(cumP[Poisson(1) <= k] * 2^32) for k = 0..7: weight(u) = number
    * of thresholds <= u. Integer literals, shared verbatim with the q186
    * oracle SQL — never recompute via exp()/factorial at runtime (last-ulp
    * libm drift across engines would move a threshold by one coin value).
    */
  val PoissonThresholds: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L, 4294923276L)

  /** Per `groupCol`: row count `n`, the plain `mean` of `valueCol`, and
    * the percentile-method bootstrap interval [`ci_lo`, `ci_hi`] at level
    * `1 − alpha` from `replicates` Poisson-weighted replicate means.
    * `idCol` must identify rows uniquely (the coin's row key); null
    * values should be filtered upstream (a null contributes null·w to a
    * replicate sum and poisons the mean — same contract as avg()'s
    * null-skipping would silently disagree with).
    *
    * A replicate whose weights sum to zero in some group is excluded from
    * that group's percentile (only plausible for tiny groups; with
    * n >= 30 the probability is e^{-30·R}-scale). Groups keep their row
    * even if EVERY replicate degenerates: ci bounds are then NULL.
    */
  private def requireParams(replicates: Int, alpha: Double): Unit = {
    require(replicates >= 8, s"replicates ($replicates) must be >= 8 for a CI to mean anything")
    require(alpha > 0.0 && alpha < 0.5, s"alpha ($alpha) must be in (0, 0.5)")
  }

  /** Row-local ×(R+1) fan-out with the deterministic Poisson(1) weight:
    * every input row becomes `replicates` weighted replicate rows plus
    * the weight-1 identity replicate (__r = −1) that carries the point
    * estimate through the same single-scan aggregation. `keep` columns
    * pass through untouched.
    */
  private def fan(
      df: DataFrame,
      keep: Seq[Column],
      idCol: String,
      replicates: Int,
      salt: String): DataFrame = {
    val u = graft.sql.functions.uniform32(salt,
      concat(col(idCol).cast("string"), lit("|"), col("__r").cast("string")))
    // weight = #thresholds <= u, as integer compares; r = -1 is the
    // identity replicate (weight 1)
    val w = when(col("__r") === -1, lit(1L)).otherwise(
      PoissonThresholds.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _))
    // resolve the keep expressions ONCE; downstream selects go by name
    val base = df.select(keep :+ col(idCol): _*)
    val keepNames = base.columns.dropRight(1).toSeq
    base
      .select((keepNames :+ idCol).map(col) :+
        explode(lit((-1 until replicates).toArray)).as("__r"): _*)
      .select(keepNames.map(col) :+ col("__r") :+ w.as("__w"): _*)
  }

  def meanCI(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      replicates: Int = 32,
      alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    requireParams(replicates, alpha)
    val fanned = fan(df,
      Seq(col(groupCol), col(valueCol).cast("double").as("__x")),
      idCol, replicates, salt)
    val perRep = fanned.groupBy(col(groupCol), col("__r"))
      .agg(sum(col("__w") * col("__x")).as("__swx"),
        sum(col("__w")).as("__sw"),
        count(lit(1)).as("__n"))
      .withColumn("__mr",
        when(col("__sw") > 0L, col("__swx") / col("__sw").cast("double")))
    perRep.groupBy(col(groupCol))
      .agg(
        max(when(col("__r") === -1, col("__n"))).as("n"),
        max(when(col("__r") === -1, col("__mr"))).as("mean"),
        expr(s"percentile(CASE WHEN __r >= 0 THEN __mr END, ${alpha / 2})").as("ci_lo"),
        expr(s"percentile(CASE WHEN __r >= 0 THEN __mr END, ${1.0 - alpha / 2})").as("ci_hi"))
  }

  /** Per `groupCol`: the RATIO-OF-SUMS metric sum(`numCol`) / sum(`denCol`)
    * with its percentile-method bootstrap interval — the Chamandy paper's
    * actual production case (CTR = clicks/impressions, revenue-per-view,
    * accept-rate), where per-row division would weight rows wrongly and a
    * mean-of-ratios is simply a different (usually unwanted) estimand.
    * Each replicate reweights BOTH sums with the SAME per-row Poisson
    * weight (numerator and denominator are correlated within a row — the
    * whole reason the delta method is fiddly here and the bootstrap
    * isn't), so a replicate ratio is sum(w·num)/sum(w·den) from the one
    * fanned scan. A replicate whose weighted denominator is exactly zero
    * is excluded from the percentile (the q186 degenerate-replicate
    * contract); same null contract as [[meanCI]] — filter nulls upstream.
    */
  def ratioCI(
      df: DataFrame,
      groupCol: String,
      numCol: String,
      denCol: String,
      idCol: String,
      replicates: Int = 32,
      alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    requireParams(replicates, alpha)
    val fanned = fan(df,
      Seq(col(groupCol), col(numCol).cast("double").as("__p"),
        col(denCol).cast("double").as("__q")),
      idCol, replicates, salt)
    val perRep = fanned.groupBy(col(groupCol), col("__r"))
      .agg(sum(col("__w") * col("__p")).as("__swp"),
        sum(col("__w") * col("__q")).as("__swq"),
        count(lit(1)).as("__n"))
      .withColumn("__rr",
        when(col("__swq") =!= 0.0, col("__swp") / col("__swq")))
    perRep.groupBy(col(groupCol))
      .agg(
        max(when(col("__r") === -1, col("__n"))).as("n"),
        max(when(col("__r") === -1, col("__rr"))).as("ratio"),
        expr(s"percentile(CASE WHEN __r >= 0 THEN __rr END, ${alpha / 2})").as("ci_lo"),
        expr(s"percentile(CASE WHEN __r >= 0 THEN __rr END, ${1.0 - alpha / 2})").as("ci_hi"))
  }
}
