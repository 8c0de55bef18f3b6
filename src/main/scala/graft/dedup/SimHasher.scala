package graft.dedup

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 64-bit SimHash (Charikar 2002) document fingerprints from Catalyst
  * expressions only: tokenize, hash each token with md5 (frequency-weighted
  * via row multiplicity), majority-vote each of the 64 bits, emit a 16-char
  * hex signature. Near-duplicates are documents within small Hamming
  * distance; `candidatePairs` banding over 4×16-bit chunks finds every pair
  * with distance ≤ 3 (pigeonhole) without an all-pairs product.
  *
  * Beyond-reference operator (LLM-pipeline extension from the build brief).
  * md5 (not a JVM-private hash) keeps the signature replayable by the SQL
  * correctness oracle.
  *
  * Scale: one explode + one hash-partitioned groupBy(id) carrying 64 small
  * integer partial sums; candidate search shuffles on 16-bit band values.
  */
class SimHasher(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("simhash"))

  final val idCol: Param[String] = new Param[String](this, "idCol", "Document id column")
  final val textCol: Param[String] = new Param[String](this, "textCol", "Text column")
  final val outputCol: Param[String] = new Param[String](this, "outputCol",
    "Output signature column (16 hex chars)")

  setDefault(idCol -> "doc_id", textCol -> "text", outputCol -> "simhash")

  def setIdCol(value: String): this.type = set(idCol, value)
  def setTextCol(value: String): this.type = set(textCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  /** First 16 hex nibbles of md5(token) = 64 hash bits per token. */
  private def nibble(h: Column, i: Int): Column =
    conv(substring(h, i + 1, 1), 16, 10).cast("int")

  /** (id, simhash) — one row per input id. The signature is a native
    * row-local expression ([[graft.sql.expressions.SimHash64]]): no token
    * explode, no 64-column vote aggregate, no shuffle.
    */
  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val sig = org.apache.spark.sql.GraftBridge.column(
      graft.sql.expressions.SimHash64(
        org.apache.spark.sql.GraftBridge.expression(
          TextNormalizer.tokens(col($(textCol))))))
    // spread: the md5-per-token kernel is CPU-bound; a single-split input
    // would run it on one task (and once per downstream consumer)
    graft.sql.functions
      .spread(dataset.select(col($(idCol)), col($(textCol))), col($(idCol)))
      .select(col($(idCol)), sig.as($(outputCol)))
  }

  /** Hamming distance between two 16-hex-char signatures (0..64). */
  def hammingDistance(a: Column, b: Column): Column =
    (0 until 16)
      .map(i => bit_count(nibble(a, i).cast("long").bitwiseXOR(nibble(b, i).cast("long"))))
      .reduce(_ + _)

  /** (id, band, chunk, sig): each signature's four 16-bit band chunks, with
    * the full signature carried along so pair consumers need no join back.
    */
  private def bands(signed: DataFrame): DataFrame =
    signed.select(col($(idCol)), col($(outputCol)),
      explode(expr("sequence(0, 3)")).as("band"))
      .select(col($(idCol)), col("band"),
        expr(s"substring(${$(outputCol)}, band * 4 + 1, 4)").as("chunk"),
        col($(outputCol)).as("sig"))

  /** Near-duplicate pairs with exact Hamming distance ≤ maxDist, candidates
    * from band buckets only (complete for maxDist ≤ 3 by pigeonhole).
    * The signatures ride through the band join, so there is no join back to
    * the full corpus (and no recompute of the signature kernel for it);
    * Hamming is evaluated per band collision — cheap codegen arithmetic —
    * then surviving pairs dedup on (id_a, id_b, hamming).
    */
  def nearDupPairs(signed: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, s"banding only guarantees completeness for maxDist <= 3, got $maxDist")
    graft.sql.PairJoins.bucketedSelfPairs(
      bands(signed), $(idCol), Seq("band", "chunk"), payload = Seq("sig"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sig_a"), col("sig_b")).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Pairs of ids whose signatures agree on at least one of the four 16-bit
    * bands — a superset of all pairs with Hamming distance ≤ 3.
    */
  def candidatePairs(signed: DataFrame): DataFrame =
    graft.sql.PairJoins.bucketedSelfPairs(
      bands(signed), $(idCol), Seq("band", "chunk"))
      .distinct()

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)), s"id column ${$(idCol)} not found")
    require(schema($(textCol)).dataType == StringType,
      s"text column must be string, got ${schema($(textCol)).dataType}")
    StructType(Seq(schema($(idCol)), StructField($(outputCol), StringType)))
  }

  override def copy(extra: ParamMap): SimHasher = defaultCopy(extra)
}

object SimHasher extends DefaultParamsReadable[SimHasher]
