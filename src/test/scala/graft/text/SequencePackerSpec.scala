package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SequencePackerSpec extends SparkTestBase {
  import spark.implicits._

  // token counts: d1=3, d2=6, d3=4, d4=0 (blank), d5=2 -> 15 tokens, L=4:
  // stream cut at 4-token boundaries straddles d2 and d3
  lazy val docs = Seq(
    (1L, "a b c"),
    (2L, "d e f g h i"),
    (3L, "j k l m"),
    (4L, "   "),
    (5L, "n o"))
    .toDF("doc_id", "text")

  lazy val out = new SequencePacker(seqLen = 4).spans(docs)
    .as[(Long, Long, Long, Long, Long, Long)].collect()
    .map(r => (r._1, r._3) -> (r._2, r._4, r._5, r._6)).toMap

  test("spans: boundary-straddling documents split at sequence cuts") {
    // d1 [0,3) -> seq 0 off 0 len 3; d2 [3,9) -> seq0 off3 len1,
    // seq1 off0 len4, seq2 off0 len1; d3 [9,13) -> seq2 off1 len3,
    // seq3 off0 len1; d5 [13,15) -> seq3 off1 len2
    assert(out((1L, 0L)) === ((3L, 0L, 0L, 3L)))
    assert(out((2L, 0L)) === ((6L, 3L, 0L, 1L)))
    assert(out((2L, 1L)) === ((6L, 0L, 1L, 4L)))
    assert(out((2L, 2L)) === ((6L, 0L, 5L, 1L)))
    assert(out((3L, 2L)) === ((4L, 1L, 0L, 3L)))
    assert(out((3L, 3L)) === ((4L, 0L, 3L, 1L)))
    assert(out((5L, 3L)) === ((2L, 1L, 0L, 2L)))
    assert(out.size === 7)
  }

  test("every document's spans reassemble it exactly; blanks emit nothing") {
    val perDoc = out.toSeq.groupBy(_._1._1).map { case (d, spans) =>
      d -> spans.map(_._2._4).sum
    }
    assert(perDoc === Map(1L -> 3L, 2L -> 6L, 3L -> 4L, 5L -> 2L))
  }

  test("every sequence but the last is exactly full") {
    val perSeq = out.toSeq.groupBy(_._1._2).map { case (s, spans) =>
      s -> spans.map(_._2._4).sum
    }
    assert(perSeq === Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 3L))
  }

  test("partitioning does not change the packing") {
    val a = new SequencePacker(4).spans(docs.repartition(7))
      .orderBy("doc_id", "seq_id").collect().toSeq
    val b = new SequencePacker(4).spans(docs.repartition(1))
      .orderBy("doc_id", "seq_id").collect().toSeq
    assert(a === b)
  }
}
