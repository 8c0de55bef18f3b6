package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE merge sequence vs the hand-computed classic example. */
class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  // the standard BPE walkthrough corpus: hug x10, pug x5, pun x12,
  // bun x4, hugs x5.
  // pair counts: (u,g)=20 (p,u)=17 (u,n)=16 (h,u)=15 (g,s)=5 (b,u)=4
  //   merge 1: u+g -> ug (20)
  //   then (u,n)=16 (h,ug)=15 (p,u)=12 ... merge 2: u+n -> un (16)
  //   then (h,ug)=15 ... merge 3: h+ug -> hug (15)
  private val corpus = (
    Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
      Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("merge sequence matches the hand computation") {
    val merges = new BpeTrainer(numMerges = 3).fit(corpus)
      .select("rank", "left", "right", "merged", "pair_count")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(merges === Seq(
      (1L, "u", "g", "ug", 20L),
      (2L, "u", "n", "un", 16L),
      (3L, "h", "ug", "hug", 15L)))
  }

  test("segmentation applies merges greedily left-to-right") {
    val trainer = new BpeTrainer(numMerges = 3)
    val merges = trainer.fit(corpus)
    val seg = trainer.segment(Seq((1L, "hugs pun")).toDF("doc_id", "text"), merges)
      .select("word", "subwords").as[(String, Seq[String])].collect().toMap
    assert(seg("hugs") === Seq("hug", "s"))
    assert(seg("pun") === Seq("p", "un"))
  }

  test("greedy fold never re-merges across a merged token") {
    val trainer = new BpeTrainer()
    val got = Seq(Tuple1(Seq("a", "a", "a")))
      .toDF("symbols")
      .select(trainer.mergeOnce(col("symbols"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(got === Seq("aa", "a"))
  }

  test("stops early when words are fully merged") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = new BpeTrainer(numMerges = 10).fit(tiny)
    // "ab" merges once to a single symbol; no pairs remain
    assert(merges.count() === 1L)
  }
}
