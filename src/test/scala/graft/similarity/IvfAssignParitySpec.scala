package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The r17 row-local nearest-centroid assignment
  * ([[graft.sql.expressions.NearestCentroidId]]) must be drop-in equal to
  * the crossJoin + `max_by(cid, struct(cos, -cid))` shape it replaced —
  * including the edges: a zero vector (cos = NaN against every centroid,
  * NaN sorts LARGEST so the zero vector assigns to the lowest cid), and
  * exact tie-breaks (duplicate vectors → same cid; equal cos → lowest
  * cid).
  */
class IvfAssignParitySpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  private def h(i: Long, s: Int): Double =
    (((i * 2654435761L + s * 40503L) % 1000) / 1000.0) - 0.5

  private def vec(i: Long): (Long, Seq[Double]) =
    (i, (0 until dim).map(j => h(i, j + 1) * 3 + (i % 4).toDouble))

  test("row-local assignment equals the max_by crossJoin formulation") {
    val ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))
    val base = (0L until 80L).map(vec)
    // edges: an exact duplicate of id 3 (tie on every cos), and a zero
    // vector (cosine = 0/0 = NaN against every centroid)
    val corpus = (base :+ (100L, base(3)._2) :+ (101L, Seq.fill(dim)(0.0)))
      .toDF("vec_id", "embedding")
    val idx = ivf.build((0L until 80L).map(vec).toDF("vec_id", "embedding"))

    val got = ivf.assignNew(idx, corpus)
      .as[(Long, Long)].collect().toMap

    // the pre-r17 formulation, written out verbatim
    val ref = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("cv"))
      .crossJoin(broadcast(
        idx.centroids.select(col("cid"),
          col("centroid").cast("array<double>").as("centroid"))))
      .select(col("vec_id"), col("cid"),
        graft.sql.functions.cosineSimilarity(col("cv"), col("centroid")).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"))
      .as[(Long, Long)].collect().toMap

    assert(got.size === ref.size)
    assert(got === ref)
    // the duplicate vector tie-breaks identically to its original
    assert(got(100L) === got(3L))
    // the NaN row did assign (NaN sorts largest → lowest cid wins)
    assert(got.contains(101L))
  }

  test("row-local probes equal the crossJoin + row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))
    val idx = ivf.build((0L until 80L).map(vec).toDF("vec_id", "embedding"))
    val queries = ((0L until 10L).map(vec) :+ (101L, Seq.fill(dim)(0.0)))
      .toDF("vec_id", "embedding")
    val got = ivf.probes(queries, idx)
      .select("query_id", "cid").as[(Long, Long)].collect().sorted.toSeq

    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cid"))
    val ref = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(broadcast(idx.centroids))
      .select(col("query_id"), col("cid"),
        graft.sql.functions.cosineSimilarity(col("qv"),
          col("centroid").cast("array<double>")).as("cos"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= 2)
      .select(col("query_id"), col("cid"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === ref)
  }

  test("listRows drops null-id rows exactly like the old equi-join") {
    val ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))
    val idx = ivf.build((0L until 80L).map(vec).toDF("vec_id", "embedding"))
    val withNull = ((0L until 10L).map(vec).toDF("vec_id", "embedding"))
      .unionByName(Seq(vec(11L)).toDF("vec_id", "embedding")
        .withColumn("vec_id", lit(null).cast("long")))
    val lists = ivf.listRows(withNull, idx.centroids)
    assert(lists.count() === 10L)
    assert(lists.where(col("vec_id").isNull).count() === 0L)
  }
}
