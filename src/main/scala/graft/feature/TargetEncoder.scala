package graft.feature

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Smoothed target (mean) encoding for high-cardinality categoricals — the
  * standard alternative to one-hot when the key space is too large for a
  * dictionary (`GatherEncoder` keeps the top slice; this keeps EVERY key as
  * one number): replace each category with a shrunk estimate of the label
  * mean,
  *
  *   enc(k) = (sum_y(k) + m · prior) / (cnt(k) + m)
  *
  * where `prior` is the global label mean and `m` ("smoothing") is the
  * pseudo-count pulling rare keys toward it (m = 0 is the raw per-key mean;
  * m → ∞ is the prior). Also emits the key frequency (`count encoding`),
  * the other standard cardinality-proof encoding.
  *
  * The leave-one-out variant answers the leakage problem when encoding the
  * SAME rows the statistics were learned from: each row's own label is
  * removed from its key's numerator/denominator,
  *
  *   encLoo_i(k) = (sum_y(k) − y_i + m · prior) / (cnt(k) − 1 + m)
  *
  * which is row-local arithmetic after the same join — no second pass, no
  * window.
  *
  * Beyond-reference operator (LLM-pipeline extension): the quality-
  * classifier features in a curation pipeline (q102/q104) are exactly this
  * shape for source/domain/lang keys whose cardinality rules out one-hot.
  *
  * Scale: one partial-aggregated `groupBy(key)` (state = distinct keys,
  * the same growth as any dictionary), one broadcast scalar row for the
  * prior, and one equi-join of the stats frame back onto the input —
  * strategy left to AQE, same reasoning as [[Winsorizer]]: broadcast while
  * small, degrade to a key-partitioned shuffle (never fail) when the key
  * space outgrows it. The encode itself is whole-stage-codegen arithmetic.
  * NULL keys are a real category (null-safe join), matching how a NULL
  * domain/source still needs an encoding at inference time.
  */
class TargetEncoder(smoothing: Double = 20.0) {
  require(smoothing >= 0.0, s"smoothing ($smoothing) must be >= 0")

  /** Per-key statistics: `cnt` (ROW frequency — the count encoding),
    * `n_y` (rows with an OBSERVED label), `sum_y`, and the smoothed
    * `enc`. One row per distinct key (including NULL keys). The `prior`
    * column is repeated on every row so the frame is self-contained for
    * persistence.
    *
    * The mean uses `n_y`, not `cnt`: `sum(label)` skips NULL labels while
    * `count(*)` doesn't, so dividing by `cnt` silently treated every
    * missing label as 0 — a key with half its labels missing encoded to
    * HALF its true mean (and inconsistently with `prior`, whose avg() is
    * null-excluding).
    */
  def encodings(df: DataFrame, keyCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val prior = df.agg(avg(y).as("prior"))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        count(y).as("n_y"),
        coalesce(sum(y), lit(0.0)).as("sum_y"))
      .crossJoin(broadcast(prior))
      .withColumn("enc",
        when(col("n_y") + lit(smoothing) > 0,
          (col("sum_y") + lit(smoothing) * col("prior")) /
            (col("n_y") + lit(smoothing)))
          .otherwise(col("prior")))
  }

  /** Input plus `<keyCol>_enc` (smoothed mean encoding) and `<keyCol>_cnt`
    * (count encoding), for scoring NEW rows against learned statistics. A
    * key unseen in `stats` falls back to the prior (cnt 0), the standard
    * cold-start rule.
    */
  def transform(df: DataFrame, stats: DataFrame, keyCol: String): DataFrame = {
    // every stats-side helper rides under a __te_ prefix so an input frame
    // that already has a `cnt`/`enc`/`prior` column can't collide with (or
    // be silently dropped by) the join plumbing
    val s = stats.select(col(keyCol).as("__te_k"),
      col("cnt").as("__te_cnt"), col("enc").as("__te_enc"))
    // prior is constant across stats rows; reduce it to one broadcast scalar
    val priorDf = stats.agg(max(col("prior")).as("__te_prior"))
    df.crossJoin(broadcast(priorDf))
      .join(s, col(keyCol) <=> col("__te_k"), "left")
      .withColumn(s"${keyCol}_enc", coalesce(col("__te_enc"), col("__te_prior")))
      .withColumn(s"${keyCol}_cnt", coalesce(col("__te_cnt"), lit(0L)))
      .drop("__te_k", "__te_cnt", "__te_enc", "__te_prior")
  }

  /** Leave-one-out encode of the TRAINING frame itself: each row's label is
    * excluded from its own key's statistics. A key seen exactly once (its
    * only evidence is the row itself) has an empty leave-one-out sample and
    * encodes to the prior — the m=0 limit is well-defined too. A row whose
    * OWN label is NULL contributed nothing to the stats, so nothing is
    * removed for it (it gets the full-key encoding, not a NULL).
    */
  def transformLoo(df: DataFrame, keyCol: String, labelCol: String): DataFrame = {
    val s = encodings(df, keyCol, labelCol)
      .select(col(keyCol).as("__te_k"), col("cnt").as("__te_cnt"),
        col("n_y").as("__te_ny"), col("sum_y").as("__te_sum_y"),
        col("prior").as("__te_prior"))
    val y = col(labelCol).cast("double")
    val own = when(y.isNotNull, lit(1L)).otherwise(lit(0L))
    val denom = col("__te_ny") - own + lit(smoothing)
    df.join(s, col(keyCol) <=> col("__te_k"))
      .withColumn(s"${keyCol}_enc",
        when(denom > 0,
          (col("__te_sum_y") - coalesce(y, lit(0.0))
            + lit(smoothing) * col("__te_prior")) / denom)
          .otherwise(col("__te_prior")))
      .withColumn(s"${keyCol}_cnt", col("__te_cnt"))
      .drop("__te_k", "__te_cnt", "__te_ny", "__te_sum_y", "__te_prior")
  }
}
