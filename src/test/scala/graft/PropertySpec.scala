package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck property tests for the engine's pure kernels — invariants
  * that hold for ALL inputs, complementing the example-based specs.
  * (The scalatest-scalacheck bridge isn't in the offline cache, so a
  * small deterministic driver samples the generators directly.)
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], trials: Int = 50)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var done = 0
    var attempts = 0
    while (done < trials && attempts < trials * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); done += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(done == trials, s"generator too restrictive: $done/$trials")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))(t => f(t._1, t._2, t._3, t._4))

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.numChar, 1 -> Gen.oneOf('!', '?', ',', '.', 'X')))
      .map(_.mkString)

  test("text normalization is idempotent") {
    forAll(Gen.listOfN(20, asciiText)) { (texts: List[String]) =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        val once = graft.dedup.TextNormalizer.normalize($"text")
        val twice = graft.dedup.TextNormalizer.normalize(once)
        assert(df.where(not(once <=> twice)).count() === 0)
      }
    }
  }

  test("minhash kernel: signature of a multiset equals signature of its set") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { (shingles: List[String]) =>
      def sig(ss: Seq[String]) = graft.sql.expressions.MinHashSignature.compute(
        new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any]), 12).toLongArray.toSeq
      assert(sig(shingles ++ shingles) === sig(shingles.distinct))
    }
  }

  test("minhash kernel: signature is order-invariant") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { (shingles: List[String]) =>
      def sig(ss: Seq[String]) = graft.sql.expressions.MinHashSignature.compute(
        new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any]), 12).toLongArray.toSeq
      assert(sig(shingles) === sig(shingles.reverse))
    }
  }

  test("simhash kernel: 16 lowercase hex chars, identical inputs agree") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { (tokens: List[String]) =>
      def sig(ts: Seq[String]) = graft.sql.expressions.SimHash64.compute(
        new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])).toString
      val s = sig(tokens)
      assert(s.length === 16 && s.forall(c => "0123456789abcdef".contains(c)))
      assert(s === sig(tokens))
    }
  }

  test("metric computers: lift * reach == recall for any confusion matrix") {
    forAll(Gen.choose(0L, 1000L), Gen.choose(0L, 1000L),
      Gen.choose(1L, 1000L), Gen.choose(0L, 1000L)) { (tp0: Long, fp: Long, p: Long, n: Long) =>
      val tp = math.min(tp0, p)
      val reach = graft.evaluation.metrics.reach(tp, fp, p, n)
      val lift = graft.evaluation.metrics.lift(tp, fp, p, n)
      whenever(reach > 0) {
        assert(math.abs(lift * reach - tp.toDouble / p) < 1e-9)
      }
    }
  }

  test("S2 cell containment: a point's leaf is inside its ancestors") {
    val latGen = Gen.choose(-89.9, 89.9)
    val lonGen = Gen.choose(-179.9, 179.9)
    forAll(latGen, lonGen, Gen.choose(0, 29)) { (lat: Double, lon: Double, lvl: Int) =>
      val leaf = graft.geo.S2.fromLatLngDegrees(lat, lon)
      val parent = graft.geo.S2.parent(leaf, lvl)
      val deeper = graft.geo.S2.parent(leaf, lvl + 1)
      // the deeper cell's ancestor at lvl is the same parent cell
      assert(graft.geo.S2.parent(deeper, lvl) === parent)
      assert(graft.geo.S2.level(parent) === lvl)
    }
  }
}
