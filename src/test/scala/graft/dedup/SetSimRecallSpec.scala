package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Measured recall contract for LSH near-dup detection against EXACT
  * ground truth: [[SetSimilarityJoin]] (prefix-filtered, recall-
  * guaranteed) defines the true pair set at the threshold; the banded
  * MinHash pipeline's verified pairs are a subset (verification uses
  * exact Jaccard), and the band stage is the only loss. This closes the
  * last unmeasured approximation in the dedup family — the IVF/PQ/LSH
  * similarity indexes all carry recall tables already (SURVEY §8).
  */
class SetSimRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private val t = 0.5

  // corpus ∪ planted borderline partners: every 4th doc gets a copy that
  // keeps a prefix and appends doc-specific md5 junk, landing its char-8
  // Jaccard in the band-miss-prone region just above the threshold —
  // the natural near-dups alone sit so far above t that every layout
  // catches them and recall is uninformatively 1.0
  private lazy val docs = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = base.where(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(
          substring(col("text"), lit(1), (length(col("text")) * 0.7).cast("int")),
          lit(" "),
          expr("concat_ws('', transform(sequence(1, 3), i -> md5(concat(cast(doc_id AS string), ':', i))))"))
          .as("text"))
    base.unionByName(planted)
  }

  private lazy val sets = docs.select(col("doc_id"),
    org.apache.spark.sql.GraftBridge.column(
      graft.sql.expressions.Shingles(
        org.apache.spark.sql.GraftBridge.expression(
          TextNormalizer.normalize(col("text"))), 8)).as("sh"))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact: Set[(Long, Long)] =
    pairSet(new SetSimilarityJoin(t, "doc_id", "sh").pairs(sets))

  private def lsh(numHashes: Int, numBands: Int): Set[(Long, Long)] =
    pairSet(new MinHashDeduplicator()
      .setIdCol("doc_id").setTextCol("text")
      .setShingleSize(8).setNumHashes(numHashes).setNumBands(numBands)
      .setThreshold(t)
      .transform(docs))

  test("LSH verified pairs are a subset of the exact pair set") {
    val l = lsh(12, 4)
    assert(exact.nonEmpty)
    assert((l -- exact).isEmpty,
      s"${(l -- exact).size} LSH pairs not in the exact ground truth")
  }

  test("recall floors per band layout; finer bands never lose recall") {
    val n = exact.size.toDouble
    val r12x4 = (lsh(12, 4) & exact).size / n   // rows/band 3
    val r12x6 = (lsh(12, 6) & exact).size / n   // rows/band 2
    val r24x12 = (lsh(24, 12) & exact).size / n // rows/band 2, more hashes
    info(f"exact=${exact.size} recall 12x4=$r12x4%.3f 12x6=$r12x6%.3f 24x12=$r24x12%.3f")
    assert(r12x4 >= 0.55, s"recall 12x4 = $r12x4")
    assert(r12x6 >= 0.80, s"recall 12x6 = $r12x6")
    assert(r24x12 >= 0.80, s"recall 24x12 = $r24x12")
    assert(r12x6 >= r12x4 - 1e-9, "shorter bands lost recall")
  }
}
