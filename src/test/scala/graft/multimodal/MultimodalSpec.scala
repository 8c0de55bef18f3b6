package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  lazy val payloads = Seq(
    (1L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3, 4, 5, 6, 7, 8)),
    (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9)),
    (3L, "plain text payload".getBytes("UTF-8")))
    .toDF("id", "payload")

  test("magic-byte sniffing identifies containers") {
    val out = payloads.select($"id", MultimodalFunctions.sniffFormat($"payload").as("f"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "png")
    assert(out(2L) === "jpeg")
    assert(out(3L) === "unknown")
  }

  test("byte length and head bytes") {
    val r = payloads.where($"id" === 1)
      .select(MultimodalFunctions.byteLength($"payload"),
        MultimodalFunctions.headBytes($"payload", 4)).head()
    assert(r.getInt(0) === 12)
    assert(r.getString(1) === "89504E47")
  }

  test("stride sample picks every k-th byte") {
    val r = payloads.where($"id" === 1)
      .select(MultimodalFunctions.strideSample($"payload", 3, 4)).head()
    // bytes at offsets 0, 4, 8 → 0x89, 0x01, 0x05
    assert(r.getString(0) === "890105")
  }

  test("decoder stub emits fixed-dim features per row, batched") {
    val out = new MediaDecoder()
      .setInputCol("payload").setOutputCol("feats")
      .setFeatureDim(4).setBatchSize(2)
      .transform(payloads)
    val feats = out.select($"id", $"feats").as[(Long, Seq[Double])].collect().toMap
    assert(feats.size === 3)
    assert(feats.values.forall(_.length === 4))
    assert(feats.values.forall(_.forall(v => v >= 0.0d && v < 1.0d)))
    // deterministic: same input → same features
    val again = new MediaDecoder().setInputCol("payload").setOutputCol("feats")
      .setFeatureDim(4).transform(payloads)
      .select($"id", $"feats").as[(Long, Seq[Double])].collect().toMap
    assert(feats === again)
  }

  test("decoder preserves existing columns and appends array<double>") {
    val out = new MediaDecoder().setInputCol("payload").setOutputCol("feats")
      .transform(payloads)
    assert(out.columns.toSeq === Seq("id", "payload", "feats"))
    assert(out.schema("feats").dataType.typeName === "array")
  }
}
