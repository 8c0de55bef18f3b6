package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.PrefixSum

class TokenPackerSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed exclusive prefix sum equals the global-window formulation") {
    val df = (1 to 500).map(i => (i.toLong * 3 + (i % 7), (i % 50) + 1L))
      .toDF("id", "v")
    val two = PrefixSum.exclusive(df, "id", "v", "prefix", numBuckets = 8)
      .select($"id", $"prefix")
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.select($"id", coalesce(sum($"v").over(w), lit(0L)).as("prefix"))
    assert(two.collect().toSet === ref.collect().toSet)
  }

  test("prefix sum plan has no unpartitioned window") {
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("id", "v")
    val plan = PrefixSum.exclusive(df, "id", "v", "prefix")
      .queryExecution.executedPlan.toString
    // every WindowExec must carry a partition spec (the __bkt column)
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition"),
      s"plan:\n$plan")
    val windowLines = plan.linesIterator.filter(_.contains("WindowExec")).toList
    windowLines.foreach(l => assert(l.contains("__bkt"), s"unpartitioned window: $l"))
  }

  test("packer chunks respect id order and the budget boundary") {
    val docs = Seq(
      (1L, "a b c d"),        // 4 tokens, prefix 0,  chunk 0
      (2L, "e f g"),          // 3 tokens, prefix 4,  chunk 0
      (3L, "h i j k l"),      // 5 tokens, prefix 7,  chunk 0
      (4L, "m n"),            // 2 tokens, prefix 12, chunk 1
      (5L, "o"))              // 1 token,  prefix 14, chunk 1
      .toDF("doc_id", "text")
    val out = new TokenPacker().setBudget(10L).transform(docs)
      .select($"doc_id", $"n_tokens", $"prefix_tokens", $"chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, 4L, 0L, 0L), (2L, 3L, 4L, 0L), (3L, 5L, 7L, 0L),
      (4L, 2L, 12L, 1L), (5L, 1L, 14L, 1L)))
  }

  test("carryCols pass through unchanged, in declared schema order") {
    val docs = Seq(
      (1L, "a b c d", 0.25, "en"),
      (2L, "e f g", -1.5, "de"),
      (3L, "h i j k l", 0.0, "en"))
      .toDF("doc_id", "text", "margin", "lang")
    val packer = new TokenPacker().setBudget(10L)
      .setCarryCols(Array("margin", "lang"))
    assert(packer.transformSchema(docs.schema).fieldNames ===
      Array("doc_id", "margin", "lang", "n_tokens", "prefix_tokens", "chunk"))
    val out = packer.transform(docs)
    assert(out.columns === Array("doc_id", "margin", "lang", "n_tokens", "prefix_tokens", "chunk"))
    val rows = out.select($"doc_id", $"margin", $"lang", $"chunk")
      .as[(Long, Double, String, Long)].collect().sortBy(_._1)
    assert(rows === Array((1L, 0.25, "en", 0L), (2L, -1.5, "de", 0L), (3L, 0.0, "en", 0L)))
  }

  test("tokensCol packs on precomputed counts instead of the estimate") {
    // real-tokenizer counts (e.g. BpeTrainer.segment subwords) differ from
    // the regex estimate; the packer must budget on what it is given
    val counted = Seq((1L, 6L), (2L, 5L), (3L, 7L), (4L, 1L))
      .toDF("doc_id", "bpe_tokens")
    val out = new TokenPacker().setTokensCol("bpe_tokens").setBudget(10L)
      .transform(counted)
      .select($"doc_id", $"n_tokens", $"prefix_tokens", $"chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, 6L, 0L, 0L), (2L, 5L, 6L, 0L), (3L, 7L, 11L, 1L), (4L, 1L, 18L, 1L)))
    // no text column required on this path; a tokensCol named n_tokens
    // must survive the internal rename
    val already = Seq((1L, 2L), (2L, 3L)).toDF("doc_id", "n_tokens")
    val out2 = new TokenPacker().setTokensCol("n_tokens").setBudget(4L)
      .transform(already)
      .select($"doc_id", $"n_tokens", $"prefix_tokens", $"chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out2 === Array((1L, 2L, 0L, 0L), (2L, 3L, 2L, 0L)))
    // a non-numeric tokensCol fails loudly at transformSchema
    val bad = Seq((1L, "x")).toDF("doc_id", "bpe_tokens")
    val e = intercept[IllegalArgumentException] {
      new TokenPacker().setTokensCol("bpe_tokens").transform(bad)
    }
    assert(e.getMessage.contains("numeric"))
  }
}
