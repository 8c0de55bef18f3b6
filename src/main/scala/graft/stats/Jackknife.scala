package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delete-one-BUCKET jackknife standard errors for ratio-of-sums metrics
  * (Quenouille/Tukey; the "delete-a-group jackknife" of Kott 2001, survey
  * form) — the closed-form companion to [[Bootstrap]]: where the bootstrap
  * resamples R times, the jackknife recomputes the estimator B times with
  * one bucket of units held out, and at B buckets the whole thing
  * collapses to algebra over per-bucket sums: θ̂₍ᵢ₎ = (ΣN - Nᵢ)/(ΣD - Dᵢ).
  * Bucketing by a UNIT hash (user, not event) keeps within-unit
  * correlation inside a bucket, making the SE cluster-robust — the same
  * reason q186/q190 bootstrap by unit coins.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * == Deterministic contract ==
  *
  * The bucket id is the caller's deterministic hash column, so engine and
  * oracle bucket identically; everything else is per-(group, bucket) sums
  * and a B-row fold — closed-form, replayed exactly by SQL. A group
  * absent from some buckets jackknifes over the buckets it HAS (B_g =
  * count of present buckets), which the SQL replay reproduces naturally.
  *
  * == Scale shape ==
  *
  * One map-side-combinable aggregation to (group, bucket) grain — the
  * only pass over the data — then per-group folds over ≤B rows. State is
  * groups × B, independent of row count.
  */
object Jackknife {

  /** Per-group ratio estimate with jackknife SE and normal-approx CI:
    * (group..., theta, se_jack, ci_lo, ci_hi, n_buckets). `num`/`den`
    * are summed per (group, bucket); theta = sum(num)/sum(den).
    */
  def ratioCI(
      df: DataFrame,
      groupCols: Seq[String],
      num: Column,
      den: Column,
      bucket: Column,
      z: Double = 1.959963984540054): DataFrame = {
    val g = groupCols.map(col)
    val byBucket = df.groupBy(g :+ bucket.as("__b"): _*)
      .agg(sum(num.cast("double")).as("bn"), sum(den.cast("double")).as("bd"))
    val totals = byBucket.groupBy(g: _*)
      .agg(sum(col("bn")).as("tn"), sum(col("bd")).as("td"),
        count(lit(1)).as("nb"))
    val loo = byBucket.join(totals, groupCols)
      .withColumn("theta_i", (col("tn") - col("bn")) / (col("td") - col("bd")))
    loo.groupBy(g: _*)
      .agg(
        first(col("tn") / col("td")).as("theta"),
        first(col("nb")).as("n_buckets"),
        sum(col("theta_i")).as("s1"),
        sum(col("theta_i") * col("theta_i")).as("s2"))
      .withColumn("bd2", col("n_buckets").cast("double"))
      .withColumn("var_jack",
        (col("bd2") - 1) / col("bd2")
          * (col("s2") - col("s1") * col("s1") / col("bd2")))
      // float fuzz can push a zero-variance group to -1e-18; clamp before sqrt
      .withColumn("se_jack", sqrt(greatest(col("var_jack"), lit(0.0))))
      .select(
        g ++ Seq(col("theta"), col("se_jack"),
          (col("theta") - lit(z) * col("se_jack")).as("ci_lo"),
          (col("theta") + lit(z) * col("se_jack")).as("ci_hi"),
          col("n_buckets")): _*)
  }
}
