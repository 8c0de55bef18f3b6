package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sliding-window chunking: count formula, overlap, reconstruction. */
class ChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunk count = ceil(max(n - size, 0) / stride) + 1") {
    val docs = Seq((1L, doc(100)), (2L, doc(64)), (3L, doc(65)),
      (4L, doc(10)), (5L, "")).toDF("doc_id", "text")
    val counts = new Chunker().setChunkSize(64).setStride(48).transform(docs)
      .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts(1L) === 2) // ceil(36/48)+1
    assert(counts(2L) === 1) // exactly one window
    assert(counts(3L) === 2) // one token over
    assert(counts(4L) === 1) // short doc -> whole doc
    assert(counts(5L) === 1) // "" tokenizes to [] -> one EMPTY chunk (0 tokens)
  }

  test("chunks overlap by chunkSize - stride and cover every token") {
    val docs = Seq((1L, doc(200))).toDF("doc_id", "text")
    val chunks = new Chunker().setChunkSize(32).setStride(24).transform(docs)
      .orderBy($"chunk_id")
      .select($"chunk_text", $"chunk_tokens").as[(String, Long)].collect()
    // every consecutive pair shares its 8-token boundary
    chunks.sliding(2).foreach { case Array((a, _), (b, _)) =>
      assert(a.split(" ").takeRight(8).sameElements(b.split(" ").take(8)))
    case _ => ()
    }
    // stride-prefixes of each chunk + full last chunk == original stream
    val rebuilt = chunks.dropRight(1).map(_._1.split(" ").take(24).mkString(" ")) :+
      chunks.last._1
    assert(rebuilt.mkString(" ") === doc(200).toLowerCase)
    // token accounting: last chunk may be short, never empty
    assert(chunks.dropRight(1).forall(_._2 === 32L) && chunks.last._2 >= 1L)
  }

  test("row-local plan: no shuffle") {
    val docs = Seq((1L, doc(50))).toDF("doc_id", "text")
    val plan = new Chunker().transform(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
