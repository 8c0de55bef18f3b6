package graft.sampling

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing: downsample each group (language, source,
  * domain …) toward a target row count, so the output approximates a
  * chosen mixture — the "data mixing" step of training-corpus assembly
  * (e.g. cap web crawl, keep all code).
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  *
  * Per group g: rate_g = min(1, target_g / count_g); a row is kept iff
  * `uniform32(salt, id) < floor(rate_g * 2^32)` — the coin is the FULL
  * 32-bit hash, not a mod-10⁴ bucket: the coarse bucket floor()ed any
  * rate below 1/10⁴ to a threshold of ZERO, silently dropping an entire
  * group whose positive target was small relative to its count (a 2·10⁸-
  * row crawl group with target 10⁴ has rate 5·10⁻⁵ → kept 0 rows). At
  * 2⁻³² resolution a group zeroes out only past ~4·10⁹ rows per target
  * row, and every group's undershoot is bounded by 2⁻³² of its size.
  * Membership depends only on (salt, id, group rates), so the sample is
  * stable across runs, partitionings and engines (the SQL oracle replays
  * it exactly) — unlike `df.stat.sampleBy`, whose membership is seed-
  * and partitioning-dependent. Groups without a target are dropped.
  *
  * Scale: one groupBy for the (small) per-group counts, broadcast back,
  * then a streamed filter over the corpus — no shuffle of the big side.
  */
class MixtureSampler(
    targets: Map[String, Long],
    idCol: String = "doc_id",
    groupCol: String = "lang",
    salt: String = "mix") {

  require(targets.nonEmpty, "need at least one group target")
  require(targets.values.forall(_ >= 0), "targets must be nonnegative")

  /** The full-resolution 32-bit coin for this row's id, in [0, 2³²). */
  def coin: Column = graft.sql.functions.uniform32(salt, col(idCol))

  def transform(dataset: Dataset[_]): DataFrame = {
    val session = dataset.sparkSession
    import session.implicits._
    val targetRows = targets.toSeq.sortBy(_._1).toDF(groupCol, "__target")
    val thresholds = dataset.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
      .join(targetRows, groupCol)
      .select(col(groupCol),
        floor(least(lit(1.0), col("__target") / col("__cnt")) * MixtureSampler.CoinRange)
          .cast("long").as("__thr"))
    dataset.join(broadcast(thresholds), groupCol)
      .where(coin < col("__thr"))
      .drop("__thr")
  }
}

/** Temperature-scaled mixture sampling: per-group targets are DERIVED
  * from the observed counts, target_g ∝ count_g^α scaled to `totalTarget`
  * rows — the multilingual-training α-sampling rule (XLM-R style): α=1
  * keeps natural proportions, α→0 flattens toward uniform, 0<α<1 boosts
  * low-resource groups without starving the head. The acceptance coin is
  * [[MixtureSampler]]'s md5 idiom, so membership is deterministic and
  * engine-replayable.
  *
  * Float discipline (what makes the sample bit-replayable): α=0.5 uses
  * `sqrt` (correctly rounded everywhere — `pow(x, 0.5)` is not), and the
  * normalizer Σ count^α is summed SEQUENTIALLY over groups in group order
  * (a sorted-array left-fold, not a parallel float agg), so every engine
  * adds the same terms in the same order. Other α values replay only on
  * engines whose `pow` bit-matches the JVM's.
  *
  * Scale: one groupBy for the (low-cardinality) per-group counts, the
  * fold runs over that tiny array, thresholds broadcast back — the corpus
  * itself is never shuffled, exactly like [[MixtureSampler]].
  */
class TemperatureMixture(
    totalTarget: Long,
    alpha: Double = 0.5,
    idCol: String = "doc_id",
    groupCol: String = "lang",
    salt: String = "temp") {

  require(totalTarget > 0, "totalTarget must be positive")
  require(alpha > 0 && alpha <= 1, s"alpha ($alpha) must be in (0, 1]")

  private def powA(c: Column): Column =
    if (alpha == 0.5) sqrt(c) else pow(c, alpha)

  /** Per-group (group, __cnt, __thr): thr = floor(min(1, total·n^α/Z/n)·2³²). */
  def thresholds(dataset: Dataset[_]): DataFrame = {
    val counts = dataset.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val z = counts.agg(
      aggregate(
        expr(s"transform(array_sort(collect_list(struct($groupCol AS g, __cnt AS c)))," +
          " x -> CAST(x.c AS DOUBLE))"),
        lit(0.0), (acc, x) => acc + powA(x)).as("__z"))
    counts.crossJoin(broadcast(z))
      .select(col(groupCol), col("__cnt"),
        floor(least(lit(1.0),
          lit(totalTarget.toDouble) * powA(col("__cnt").cast("double")) / col("__z") / col("__cnt"))
          * MixtureSampler.CoinRange).cast("long").as("__thr"))
  }

  def transform(dataset: Dataset[_]): DataFrame =
    dataset.join(broadcast(thresholds(dataset).drop("__cnt")), groupCol)
      .where(graft.sql.functions.uniform32(salt, col(idCol)) < col("__thr"))
      .drop("__thr")
}

object MixtureSampler {
  /** Acceptance-coin range: uniform32 is uniform on [0, 2³²). */
  private[sampling] val CoinRange: Double = 4294967296.0
}

/** Exact-count stratified sampling: keep EXACTLY min(n, |group|) rows per
  * group, chosen by md5 rank — deterministic, engine-portable, and
  * uniform-ish (hash order is unrelated to any data order). The exact
  * counterpart of [[MixtureSampler]]'s rate-based mixing, for carve-outs
  * that must hit a precise size ("exactly 5k eval docs per language").
  *
  * Scale: the group key is low-cardinality (~tens of languages), so a
  * rank window partitioned by it would sort the dominant group's whole
  * corpus in ONE task. Instead rank two-phase ([[graft.sql.GroupedNtile]])
  * over 256 buckets cut from the md5 order key's leading byte — trivially
  * order-consistent because the ordering IS the hash's hex string, and
  * uniform by construction, so no bucket degenerates.
  */
class StratifiedSampler(
    n: Int,
    idCol: String = "doc_id",
    groupCol: String = "lang",
    salt: String = "strat") {

  require(n > 0, s"per-group sample size n ($n) must be positive")

  def transform(dataset: Dataset[_]): DataFrame = {
    val withH = dataset.withColumn("__h",
      md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
    graft.sql.GroupedNtile.rank(withH, groupCol, Seq(col("__h").asc),
        conv(substring(col("__h"), 1, 2), 16, 10).cast("long"), "__rn")
      .where(col("__rn") <= n)
      .drop("__rn", "__h")
  }
}

/** Deterministic weighted sampling (sequential Poisson / priority
  * sampling, Ohlsson 1998): each row gets priority `u / w` where `u` is
  * a uniform md5-derived value in [0,1) and `w` its weight; the k rows
  * with the smallest priorities form a weighted-inclusion sample —
  * heavier rows are proportionally likelier to be kept. Deterministic in
  * (salt, id, weight), so runs, engines, and partitionings agree.
  *
  * Scale: the global smallest-k is `orderBy(priority).limit(k)` — planned
  * as TakeOrderedAndProject (per-partition top-k + driver merge of k-row
  * heaps), never a full sort.
  */
class WeightedSampler(
    k: Int,
    weightCol: String,
    idCol: String = "doc_id",
    salt: String = "wsample") {

  require(k > 0, s"sample size k ($k) must be positive")

  /** Uniform [0,1) hash of the row id: 56-bit md5 prefix / 2^56. */
  def uniform: Column =
    conv(substring(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 14), 16, 10)
      .cast("double") / 72057594037927936.0

  def priority: Column = uniform / col(weightCol)

  /** Rows with weight ≤ 0 (or NULL) are EXCLUDED before ranking: their
    * intended inclusion probability is zero, but the raw arithmetic would
    * GUARANTEE their selection instead — u/0 is NULL in Spark and
    * ascending sort puts NULLs first, and a negative weight sorts before
    * every positive priority.
    */
  def transform(dataset: Dataset[_]): DataFrame =
    dataset.where(col(weightCol) > 0)
      .withColumn("__pri", priority)
      .orderBy(col("__pri"), col(idCol))
      .limit(k)
      .drop("__pri")
}
