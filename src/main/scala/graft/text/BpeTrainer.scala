package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.dedup.TextNormalizer

/** Distributed BPE (byte-pair-encoding) tokenizer training: the classic
  * merge loop — count adjacent symbol pairs over the corpus, merge the most
  * frequent pair everywhere, repeat. Vocabulary induction for LLM
  * tokenizers; complements [[VocabBuilder]]'s frequency cutoff with learned
  * subword units.
  *
  * Beyond-reference operator (LLM-pipeline extension).
  *
  * Scale design: BPE state is the DISTINCT-WORD table `(word, count)` —
  * wordcount-sized, never the corpus — so `fit` spends exactly ONE
  * corpus-sized Spark job (the word count) and then trains ALL merge
  * rounds on the collected word table driver-side with incremental pair
  * counts (each merge touches only the words containing the merged pair).
  * The collect is guarded by a loud `maxWords` failure (the GatherEncoder
  * discipline): a bounded-vocabulary contract beats the alternative — one
  * pair-count shuffle per merge, which at a real vocabulary size (30k-50k
  * merges) is tens of thousands of sequential Spark jobs and
  * wall-clock-impossible on any cluster. Corpora whose raw vocabulary
  * exceeds `maxWords` should be pre-filtered (e.g. drop count-1 hapaxes)
  * before training.
  *
  * Determinism: ties in pair frequency break by (left, right) ascending,
  * so the merge sequence is reproducible across runs and partitionings —
  * and is hash-verified against a fully-unrolled CTE oracle (q97).
  */
class BpeTrainer(
    numMerges: Int = 10,
    textCol: String = "text",
    maxWords: Int = 2000000) extends Serializable {

  require(numMerges >= 1, s"numMerges ($numMerges) must be positive")
  require(maxWords >= 1, s"maxWords ($maxWords) must be positive")

  /** Greedy left-to-right single-pair merge of `a`+`b` inside a symbol
    * array — the fold never re-merges across an already-merged token
    * ("aaa" under (a,a) becomes ["aa","a"], matching reference BPE).
    */
  private[text] def mergeOnce(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast(ArrayType(StringType)), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Local twin of [[mergeOnce]]: same greedy left-to-right fold. */
  private[text] def mergeLocal(
      s: collection.Seq[String], a: String, b: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    for (x <- s) {
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
    }
    out
  }

  /** Driver-side merge loop over the collected `(word, count)` table.
    * Pair counts update incrementally: a merge rewrites only the words
    * indexed under its pair (a HashSet per pair — memory tracks
    * occurrences, not word-table size), subtracting their old
    * adjacent-pair contributions and adding the new ones — never a full
    * recount. The argmax rides a lazy-deletion max-heap: `include` pushes
    * the pair's current count, stale tops re-push the live count on pop,
    * so each round's winner costs ~O(log pairs) instead of a full map
    * scan (30k-merge training would otherwise spend O(merges × livePairs)
    * on argmax alone).
    *
    * Ordering note: ties break by (left, right) ascending via Java String
    * order, which equals the shuffle-side UTF8String binary order the
    * previous distributed implementation used because TextNormalizer
    * restricts symbols to ASCII `[a-z0-9]`.
    */
  private[text] def trainLocal(
      words: Array[(String, Long)]): Seq[(Long, String, String, String, Long)] = {
    val syms: Array[mutable.ArrayBuffer[String]] =
      words.map { case (w, _) => mutable.ArrayBuffer(w.split(""): _*) }
    val cnts = words.map(_._2)
    val pairN = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // max by (n, then l/r ASCENDING): reverse the string legs under `max`
    val heapOrd: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse)
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)

    def eachPair(i: Int)(f: ((String, String)) => Unit): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) { f((s(j), s(j + 1))); j += 1 }
    }
    def include(i: Int): Unit = eachPair(i) { p =>
      val n = pairN.getOrElse(p, 0L) + cnts(i)
      pairN(p) = n
      pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
      heap.enqueue((n, p._1, p._2))
    }
    def exclude(i: Int): Unit = eachPair(i) { p =>
      val n = pairN(p) - cnts(i)
      if (n == 0L) pairN.remove(p) else pairN(p) = n
      pairWords.get(p).foreach { ws =>
        ws -= i
        if (ws.isEmpty) pairWords.remove(p)
      }
      // no heap push: stale-high entries are discarded (and the live
      // count re-pushed) when they surface at the top
    }
    /** Heap top whose count is live; stale tops re-push the pair's
      * current count so no pair is ever lost to a decrease.
      */
    def argmax(): Option[(String, String, Long)] = {
      while (heap.nonEmpty) {
        val (n, l, r) = heap.dequeue()
        pairN.get((l, r)) match {
          case Some(cur) if cur == n => return Some((l, r, n))
          case Some(cur) => heap.enqueue((cur, l, r))
          case None => // pair fully merged away; drop
        }
      }
      None
    }

    var i = 0
    while (i < syms.length) { include(i); i += 1 }

    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      argmax() match {
        case None => done = true
        case Some((a, b, n)) =>
          out += ((rank.toLong, a, b, a + b, n))
          val affected = pairWords.getOrElse((a, b), mutable.HashSet.empty).toArray
          java.util.Arrays.sort(affected) // deterministic rewrite order
          for (w <- affected) {
            exclude(w)
            syms(w) = mergeLocal(syms(w), a, b)
            include(w)
          }
          rank += 1
      }
    }
    out.result()
  }

  /** Learned merge table: (rank, left, right, merged, pair_count), rank
    * 1-based in merge order. Stops early if no adjacent pair remains.
    * Fails loudly if the corpus's distinct-word table exceeds `maxWords`.
    */
  def fit(docs: Dataset[_]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // the ONLY corpus-sized job: distinct words with counts
    val words = docs
      .select(explode_outer(TextNormalizer.tokens(col(textCol))).as("word"))
      .where(col("word").isNotNull && length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .limit(maxWords + 1)
      .as[(String, Long)]
      .collect()
    require(words.length <= maxWords,
      s"BPE training collects the distinct-word table on the driver, but this corpus " +
        s"has more than maxWords ($maxWords) distinct words; raise maxWords or " +
        s"pre-filter the corpus (e.g. drop count-1 words) before fit")

    trainLocal(words).toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Beyond this many merges, [[segment]] switches from a chained
    * expression fold (whole-stage-codegen-friendly, but the plan tree
    * grows one `aggregate` per merge) to a broadcast rank-priority
    * encoder — a 30k-merge expression chain would not even analyze.
    */
  private[text] val segmentExprMerges = 32

  /** Encode one word against a rank-keyed merge table: repeatedly apply
    * the LOWEST-ranked pair present, greedy left-to-right. Identical to
    * folding the merges in rank order (merge k's pair is built from
    * symbols that exist before rank k, so later merges can never create
    * a new instance of an earlier pair), but O(len²) per word instead of
    * O(numMerges · len).
    */
  private[text] def encodeLocal(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var s: collection.Seq[String] = word.split("")
    var done = s.length < 2
    while (!done) {
      var best: (String, String) = null
      var br = Int.MaxValue
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < br) { best = p; br = r }
        j += 1
      }
      if (best == null) done = true
      else {
        s = mergeLocal(s, best._1, best._2)
        done = s.length < 2
      }
    }
    s.toSeq
  }

  /** Per-task memo bound for the broadcast encoder: beyond this many
    * distinct words a task stops caching (never evicts — encode cost, not
    * memory, is the cheap resource past this point).
    */
  private[text] val segmentMemoMax = 1 << 20

  /** Apply a learned merge table to a corpus: per-document subword
    * segmentation. Row-local either way — small merge tables fold as
    * chained codegen'd rewrites; large ones ride a broadcast rank map
    * through [[encodeLocal]] (same greedy semantics, see there).
    *
    * Cost contract at vocabulary scale (>[[segmentExprMerges]] merges):
    * [[encodeLocal]] is O(len²) rank-map lookups per word, INDEPENDENT of
    * the merge-table size, and a per-task memo (capped at
    * [[segmentMemoMax]] entries) pays that once per DISTINCT word per
    * task — token repetition (Zipf) costs one hash hit. No shuffle either
    * way; the merge table rides a broadcast. Throughput at a real 10k-merge
    * vocabulary is pinned by spec (BpeTrainerSpec).
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
    val segmented: Column =
      if (ordered.length <= segmentExprMerges) {
        ordered.foldLeft(split(col("word"), "")) {
          case (sym, (a, b)) => mergeOnce(sym, a, b)
        }
      } else {
        val ranks = docs.sparkSession.sparkContext.broadcast(
          ordered.iterator.zipWithIndex.map { case (p, r) => p -> r }.toMap)
        val self = this
        // one closure instance per task (task binaries deserialize per
        // task, and a task runs single-threaded), so the memo is plain
        val encode: String => Seq[String] = new (String => Seq[String]) with Serializable {
          @transient private lazy val memo = mutable.HashMap.empty[String, Seq[String]]
          def apply(word: String): Seq[String] =
            if (memo.size >= self.segmentMemoMax) self.encodeLocal(word, ranks.value)
            else memo.getOrElseUpdate(word, self.encodeLocal(word, ranks.value))
        }
        val enc = udf(encode)
        enc(col("word"))
      }
    tokens.select(col(idCol), col("word"), segmented.as("subwords"))
  }
}
