package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring: turn candidate pairs (from any
  * blocking stage — deletion-hash edit joins, LSH, grid blocking) into
  * calibrated match decisions by summing per-field agreement weights
  *
  *   agree:    log2(m / u)            (positive evidence)
  *   disagree: log2((1−m) / (1−u))    (negative evidence)
  *
  * where m = P(field agrees | same entity) and u = P(field agrees |
  * different entities) — the classic probabilistic record-linkage model
  * (Fellegi & Sunder JASA 1969). Pairs classify `match` / `possible` /
  * `non_match` against two thresholds, the middle band being the
  * clerical-review queue.
  *
  * The weights are DATA-INDEPENDENT constants computed once on the
  * driver, so scoring is pure whole-stage-codegen arithmetic over the
  * candidate pairs — no libm in the distributed plan, and the SQL oracle
  * replays decisions bit-exactly from the same literals. Scale: weight =
  * a chain of `when` sums, verdict a comparison — row-local over however
  * many candidates blocking produced.
  */
class LinkageScorer(
    fields: Seq[LinkageField],
    upper: Double,
    lower: Double) {
  require(fields.nonEmpty, "need at least one field")
  require(lower <= upper, s"need lower <= upper, got ($lower, $upper)")

  /** Input plus `weight` and `verdict`. */
  def score(pairs: DataFrame): DataFrame = {
    val weight = fields.map(f =>
      when(f.agree, lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    pairs.withColumn("weight", weight)
      .withColumn("verdict",
        when(col("weight") >= upper, "match")
          .when(col("weight") >= lower, "possible")
          .otherwise("non_match"))
  }
}

/** One field's agreement predicate and its (m, u) rates. */
case class LinkageField(agree: Column, m: Double, u: Double) {
  require(0 < m && m < 1 && 0 < u && u < 1, s"m/u must be in (0,1): ($m, $u)")
  require(m > u, s"m ($m) must exceed u ($u) or the field carries no signal")
  val wAgree: Double = math.log(m / u) / math.log(2.0)
  val wDisagree: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
}
