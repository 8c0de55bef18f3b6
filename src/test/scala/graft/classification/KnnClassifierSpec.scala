package graft.classification

import graft.SparkTestBase

class KnnClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // two tight cosine clusters: axis-0 labeled 7, axis-1 labeled 3
  private def v(axis: Int, eps: Double): Array[Double] = {
    val a = Array.fill(3)(eps)
    a(axis) = 1.0
    a
  }

  lazy val labeled = Seq(
    (1L, v(0, 0.01), 7), (2L, v(0, 0.02), 7), (3L, v(0, 0.03), 7),
    (11L, v(1, 0.01), 3), (12L, v(1, 0.02), 3), (13L, v(1, 0.03), 3))
    .toDF("vec_id", "embedding", "label")

  test("queries take the label of their surrounding cluster") {
    val queries = Seq((100L, v(0, 0.0)), (101L, v(1, 0.0)))
      .toDF("vec_id", "embedding")
    val got = new KnnClassifier(k = 3)
      .predict(queries, labeled)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(100L) === ((7, 3L)))
    assert(got(101L) === ((3, 3L)))
  }

  test("vote ties break toward the smallest label") {
    // k=2 with one neighbor from each cluster: 1 vote each -> label 3 wins
    val mid = Seq((200L, Array(1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val two = Seq((1L, v(0, 0.01), 7), (11L, v(1, 0.01), 3))
      .toDF("vec_id", "embedding", "label")
    val got = new KnnClassifier(k = 2).predict(mid, two)
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq === Seq((200L, 3, 1L)))
  }

  test("STRING labels: majority vote and smallest-label tie-break, no numeric cast") {
    // the old tie-break negated the label (-label), which casts a string
    // taxonomy to double -> NULL under non-ANSI (arbitrary tie winners)
    // or a cast error under ANSI
    val sLabeled = Seq(
      (1L, v(0, 0.01), "sports"), (2L, v(0, 0.02), "sports"),
      (11L, v(1, 0.01), "news"))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, v(0, 0.0))).toDF("vec_id", "embedding")
    val got = new KnnClassifier(k = 3).predict(queries, sLabeled)
      .as[(Long, String, Long)].collect()
    assert(got.toSeq === Seq((100L, "sports", 2L)))
    // 1-1 vote tie: lexicographically smallest label wins, deterministic
    val mid = Seq((200L, Array(1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val two = Seq((1L, v(0, 0.01), "sports"), (11L, v(1, 0.01), "news"))
      .toDF("vec_id", "embedding", "label")
    val tie = new KnnClassifier(k = 2).predict(mid, two)
      .as[(Long, String, Long)].collect()
    assert(tie.toSeq === Seq((200L, "news", 1L)))
  }

  test("leave-one-out: a labeled corpus classifies against itself, self excluded") {
    val got = new KnnClassifier(k = 2).predict(labeled, labeled)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got.size === 6)
    assert(Seq(1L, 2L, 3L).forall(got(_) === 7))
    assert(Seq(11L, 12L, 13L).forall(got(_) === 3))
  }
}
