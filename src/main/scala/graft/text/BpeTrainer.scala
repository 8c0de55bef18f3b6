package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.dedup.TextNormalizer

/** Distributed BPE (byte-pair-encoding) tokenizer training: the classic
  * merge loop — count adjacent symbol pairs over the corpus, merge the most
  * frequent pair everywhere, repeat — run Spark-first. Vocabulary induction
  * for LLM tokenizers; complements [[VocabBuilder]]'s frequency cutoff with
  * learned subword units.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale design: the working state is the DISTINCT-WORD table
  * `(word, count, symbols)` — wordcount-sized, never the corpus — so a
  * 100 TB corpus reduces to its vocabulary before the loop starts. Each
  * iteration is ONE pair-count shuffle (weighted by word count, partial-
  * aggregated) plus a single-row driver decision (the argmax pair — the
  * same bounded-statistic discipline as the encoder fits), and a row-local
  * merge rewrite (an `aggregate` fold over each word's symbol array).
  * Lineage is truncated per round with `localCheckpoint` (the
  * [[graft.dedup.DedupClusters]] pattern), so k merges cost k linear
  * passes, not an exponentially deep plan.
  *
  * Determinism: ties in pair frequency break by (left, right) ascending,
  * so the merge sequence is reproducible across runs and partitionings.
  */
class BpeTrainer(
    numMerges: Int = 10,
    textCol: String = "text") {

  require(numMerges >= 1, s"numMerges ($numMerges) must be positive")

  /** Greedy left-to-right single-pair merge of `a`+`b` inside a symbol
    * array — the fold never re-merges across an already-merged token
    * ("aaa" under (a,a) becomes ["aa","a"], matching reference BPE).
    */
  private[text] def mergeOnce(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast(ArrayType(StringType)), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learned merge table: (rank, left, right, merged, pair_count), rank
    * 1-based in merge order. Stops early if no adjacent pair remains.
    */
  def fit(docs: Dataset[_]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // corpus -> distinct words with counts -> character symbol sequences
    var state = docs
      .select(explode_outer(TextNormalizer.tokens(col(textCol))).as("word"))
      .where(col("word").isNotNull && length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("symbols", split(col("word"), ""))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      // adjacent pairs weighted by word frequency; one shuffle on the pair
      val top = state
        .select(col("cnt"), explode(zip_with(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()

      top.headOption match {
        case None => continue = false
        case Some((a, b, n)) =>
          merges += ((rank, a, b, a + b, n))
          state = state
            .withColumn("symbols", mergeOnce(col("symbols"), a, b))
            .localCheckpoint()
          rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "pair_count")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Apply a learned merge table to a corpus: per-document subword
    * segmentation (the merges fold in rank order as chained row-local
    * rewrites — no shuffle of the corpus).
    */
  def segment(docs: Dataset[_], merges: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val ordered = merges.orderBy("rank")
      .select("left", "right").as[(String, String)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING))
      .collect()
    val tokens = docs.select(col(idCol),
      explode_outer(TextNormalizer.tokens(col(textCol))).as("word"))
      .where(col("word").isNotNull && length(col("word")) > 0)
    val segmented = ordered.foldLeft(split(col("word"), "")) {
      case (sym, (a, b)) => mergeOnce(sym, a, b)
    }
    tokens.select(col(idCol), col("word"), segmented.as("subwords"))
  }
}
