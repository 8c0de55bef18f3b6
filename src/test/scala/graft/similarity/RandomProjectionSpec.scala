package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("local sign matrix matches the uniform32 SQL coin exactly") {
    val rp = new RandomProjection(inDim = 8, outDim = 4, salt = "rp")
    val grid = (for { j <- 0 until 4; k <- 0 until 8 } yield (j, k)).toDF("j", "k")
    val sql = grid.select($"j", $"k",
        when(graft.sql.functions.uniform32("rp",
          concat($"j", lit(":"), $"k")) < 2147483648L, 1.0).otherwise(-1.0).as("s"))
      .as[(Int, Int, Double)].collect()
    sql.foreach { case (j, k, s) => assert(rp.signs(j)(k) === s, s"sign($j,$k)") }
    // both signs actually occur — a constant matrix would be a broken coin
    assert(rp.signs.flatten.toSet === Set(1.0, -1.0))
  }

  test("projection approximately preserves pairwise squared distances (JL)") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map(i => i.toLong -> Array.fill(64)(rnd.nextGaussian()))
    val rp = new RandomProjection(inDim = 64, outDim = 16)
    val projected = vecs.toDF("id", "v")
      .select($"id", rp.project($"v").as("y"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      (i, vi) <- vecs; (j, vj) <- vecs if i < j
    } yield d2(projected(i), projected(j)) / d2(vi.toSeq, vj.toSeq)
    // E[ratio] = 1; k=16 gives ~1/sqrt(16) per-pair noise with chi-square
    // tails, so across 780 pairs individual ratios range widely. The mean
    // must be tight; the per-pair band is the loose JL envelope
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1, s"mean distance ratio $mean")
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"worst ratios: ${ratios.min} .. ${ratios.max}")
  }

  test("projection plan is a pure row-local map — no Exchange") {
    val rp = new RandomProjection(inDim = 64, outDim = 16)
    val df = (0 until 4).map(i => i.toLong -> Array.fill(64)(i.toDouble)).toDF("id", "v")
    val plan = df.select(rp.project($"v")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan shuffles:\n$plan")
  }

  test("output length and scale: projecting a sign row recovers sqrt(inDim-scaled) mass") {
    val rp = new RandomProjection(inDim = 8, outDim = 4)
    // v = signs(0) → y_0 = 8/sqrt(4) = 4.0 exactly (±1 arithmetic is exact)
    val out = Seq(Tuple1(rp.signs(0))).toDF("v")
      .select(rp.project($"v").as("y")).as[Seq[Double]].head()
    assert(out.length === 4)
    assert(out.head === 8.0 / math.sqrt(4.0))
  }
}
