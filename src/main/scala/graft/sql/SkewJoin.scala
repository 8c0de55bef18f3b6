package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the big (skewed) side gets a
  * deterministic salt in [0, factor) derived from a row-identifying
  * column, the small side is replicated onto every salt value, and the
  * join runs on (keys..., salt) — a hot key's rows spread across `factor`
  * partitions instead of funneling into one straggler task.
  *
  * Results are EXACTLY those of the plain equi-join (the salt is a
  * partitioning refinement, not a semantic change) — pinned by the q55
  * oracle and a spec equality check. AQE's skew-join handles many cases
  * at runtime; explicit salting remains the tool when a key is so hot
  * that even one split exceeds task memory, or when the join sits under
  * operators AQE won't re-plan.
  *
  * Cost: small side × factor rows through its shuffle — pick factor near
  * the hot key's row-count ratio to the average key.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `keys`, with `big` salted by
    * `xxhash64(saltFrom) mod factor`. `small` must not contain the salt
    * column name.
    */
  def salted(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFrom: String,
      factor: Int): DataFrame = {
    require(factor > 0, s"salt factor ($factor) must be positive")
    require(keys.nonEmpty, "need at least one join key")
    // loud, not silent: withColumn REPLACES an existing __salt, so a
    // caller column of that name would vanish from the output and never
    // participate in the join
    Seq("big" -> big, "small" -> small).foreach { case (name, df) =>
      require(!df.columns.contains("__salt"),
        s"$name side already has a '__salt' column — rename it before salted()")
    }
    val b = big.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(factor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
