package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.dedup.TextNormalizer

/** Coverage-bounded vocabulary builder: the smallest token set — ordered by
  * (frequency desc, token asc) — whose cumulative token mass reaches
  * `cover` of the corpus, with the reference's strict-`<` coverage scan
  * (a token enters while the mass BEFORE it is still under the threshold;
  * GatherEncoder.computeTopKeys, reference
  * `sparkext-mllib/src/main/scala/org/apache/spark/ml/feature/GatherEncoder.scala:183-186`
  * — same arithmetic, applied to text tokens instead of gather keys).
  *
  * Beyond-reference operator (LLM-pipeline extension): tokenizer vocabulary
  * induction / frequency-cutoff selection over a web-scale corpus.
  *
  * Scale design — NO global ordered window and NO driver-side vocabulary
  * (the classic implementations of "sort by count, running sum, cut" both
  * die at 100 TB). Instead the cumulative ordering is decomposed by
  * frequency value:
  *
  *  1. distributed wordcount → (term, c);
  *  2. histogram over DISTINCT COUNT VALUES (Zipf: a few thousand rows even
  *     for billion-type vocabularies) → per-frequency mass;
  *  3. tiny-side triangle join gives each frequency group its
  *     strictly-more-frequent exclusive mass;
  *  4. groups entirely under the threshold admit ALL their terms with a
  *     broadcast semi join — no ordering ever computed inside them (this is
  *     what keeps the giant count=1 tail off a single task);
  *  5. only the single boundary frequency group ranks its terms — and that
  *     rank is itself sharded over term-prefix buckets
  *     ([[graft.sql.GroupedNtile.rank]]), because the boundary is usually
  *     the count=1 tail, i.e. most of the vocabulary.
  */
class VocabBuilder(
    cover: Double = 0.95,
    textCol: String = "text") {

  require(cover > 0.0 && cover <= 1.0, s"cover ($cover) must be in (0, 1]")

  /** (term, c): the selected vocabulary with corpus frequencies. */
  def vocab(docs: Dataset[_]): DataFrame = {
    // explode_outer: keeps the tokenizer regexp chain out of scan filters
    // (InferFiltersFromGenerate skips outer generates)
    val terms = docs
      .select(explode_outer(TextNormalizer.tokens(col(textCol))).as("term"))
      .where(col("term").isNotNull)
    // materialize the wordcount once: four consumers reference it (histogram,
    // total, full-group join, boundary join), and Spark re-executes a shared
    // subtree per reference — without this the corpus is re-tokenized 4x
    // (measured 28s -> 4s at 100k docs). State is vocab-sized (the same
    // bounded-frame discipline as DedupClusters' label propagation).
    val counts = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint()

    // per-frequency histogram: mass = c * n_terms token occurrences;
    // tiny (distinct count values), also referenced three times
    val hist = counts.groupBy(col("c"))
      .agg(sum(col("c")).as("mass"), count(lit(1)).as("n_terms"))
      .localCheckpoint()
    val total = hist.agg(sum(col("mass")).cast("double").as("total"))

    // exclusive mass of all strictly-more-frequent groups (triangle join on
    // the tiny histogram), plus the coverage threshold as a broadcast scalar
    val above = hist.as("x")
      .join(hist.select(col("c").as("yc"), col("mass").as("ymass")),
        col("yc") > col("x.c"), "left")
      .groupBy(col("x.c").as("c"), col("x.n_terms").as("n_terms"))
      .agg(coalesce(sum(col("ymass")), lit(0L)).as("cum_above"))
      .crossJoin(broadcast(total))
      .withColumn("thresh", col("total") * cover)

    // a group is fully in iff its LAST term's exclusive cumulative is still
    // under the threshold: cum_above + (n_terms - 1) * c < thresh
    val lastExcl = col("cum_above") + (col("n_terms") - 1) * col("c")
    val full = above.where(lastExcl < col("thresh")).select(col("c"))
    val boundary = above
      .where(col("cum_above") < col("thresh") && !(lastExcl < col("thresh")))
      .select(col("c"), col("cum_above"), col("thresh"))

    val fullTerms = counts.join(broadcast(full), "c").select(col("term"), col("c"))
    // boundary group(s): alphabetic rank within the frequency tie decides
    // the admitted prefix. In Zipfian corpora the boundary is typically the
    // count=1 tail — most of the vocabulary — so a window partitioned by
    // the single boundary count would serialize it through one task. The
    // rank is instead two-phase (GroupedNtile.rank) over 2-char term-prefix
    // buckets: prefix order is consistent with term order ([a-z0-9] terms;
    // a term shorter than its bucket width is its own prefix), so per-
    // (c, prefix) windows + offset join reproduce the global alphabetic rank
    val boundaryTerms = graft.sql.GroupedNtile.rank(
      counts.join(broadcast(boundary), "c"),
      "c", Seq(col("term")), substring(col("term"), 1, 2), "rnk")
      .where(col("cum_above") + (col("rnk") - 1) * col("c") < col("thresh"))
      .select(col("term"), col("c"))

    fullTerms.unionByName(boundaryTerms)
  }
}
