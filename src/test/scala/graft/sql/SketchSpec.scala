package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sql.expressions.{BloomFilterOps, ZOrder64}
import graft.sql.functions.{bloomFilter, bloomMightContain, cmsEstimate, cmsMerge, countMinSketch, zorder}

/** Count-Min sketch, Bloom filter, and Z-order kernels: estimate bounds,
  * merge correctness (partition invariance), and codegen safety.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Count-Min sketch ----

  test("cms: estimate is an upper bound and exact when width >> distinct") {
    val df = (1 to 900).map(i => s"tok${i % 30}").toDF("v") // each token 30x
    val sk = df.agg(countMinSketch($"v", 4, 1024).as("sk"))
    val est = (0 until 30).map { t =>
      sk.select(cmsEstimate($"sk", lit(s"tok$t"), 4, 1024)).as[Long].head()
    }
    // 30 keys in 1024 buckets over 4 rows: collision in ALL 4 rows is
    // essentially impossible, so the min-bucket estimate is exact
    assert(est.forall(_ == 30L), s"estimates $est")
  }

  test("cms: merge = elementwise add (partition-count invariant)") {
    val df = (1 to 5000).map(i => s"t${i % 97}").toDF("v")
    def run(parts: Int): Seq[Long] =
      df.repartition(parts).agg(countMinSketch($"v", 2, 64).as("sk"))
        .select($"sk").as[Seq[Long]].head()
    val one = run(1)
    assert(run(7) === one && run(32) === one)
    assert(one.length === 2 * 64 && one.sum === 2L * 5000)
  }

  test("cms: estimate never underestimates under forced collisions") {
    val df = (1 to 2000).map(i => s"k${i % 200}").toDF("v") // 200 keys, width 32
    val sk = df.agg(countMinSketch($"v", 4, 32).as("sk"))
    val ests = (0 until 200 by 17).map { k =>
      sk.select(cmsEstimate($"sk", lit(s"k$k"), 4, 32)).as[Long].head()
    }
    assert(ests.forall(_ >= 10L), s"underestimate in $ests") // true count 10
  }

  // ---- Bloom filter ----

  test("bloom: no false negatives, FPR sane at 10 bits/key") {
    val keys = (1 to 1000).map(i => s"key$i")
    val words = keys.toDF("v").agg(bloomFilter($"v", 1 << 14, 5).as("bf"))
      .select($"bf").as[Seq[Long]].head().toArray
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
    assert(keys.forall(k => BloomFilterOps.mightContain(arr, k, 5)))
    val fp = (1 to 2000).count(i => BloomFilterOps.mightContain(arr, s"absent$i", 5))
    assert(fp < 2000 * 0.05, s"$fp false positives / 2000") // ~1% expected
  }

  test("bloom: merge = bitwise OR (partition-count invariant)") {
    val df = (1 to 3000).map(i => s"key${i % 500}").toDF("v")
    def run(parts: Int): Seq[Long] =
      df.repartition(parts).agg(bloomFilter($"v", 4096, 5).as("bf"))
        .select($"bf").as[Seq[Long]].head()
    val one = run(1)
    assert(run(5) === one && run(16) === one)
  }

  test("bloomMightContain filters in a plan (codegen path)") {
    val keys = (1 to 50).map(i => s"id$i").toDF("v")
      .agg(bloomFilter($"v", 1024, 5).as("bf"))
      .select($"bf").as[Seq[Long]].head().toArray
    val probe = (1 to 200).map(i => s"id$i").toDF("k")
    val kept = probe.where(bloomMightContain(typedlit(keys), $"k", 5)).count()
    assert(kept >= 50 && kept <= 60, s"kept $kept") // 50 members + few FPs
  }

  test("BloomJoin.semiJoin equals the plain left_semi result") {
    val probe = (1 to 500).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
    val build = Seq(3L, 7L, 100L, 499L, 9999L).toDF("bk")
    val got = graft.sql.BloomJoin.semiJoin(probe, $"k", build, $"bk",
      numBits = 1024, numHashes = 5)
      .select($"k").as[Long].collect().sorted
    assert(got === Array(3L, 7L, 100L, 499L))
  }

  // ---- Z-order ----

  test("zorder: bit interleave matches the definition") {
    // x=0b101, y=0b011 -> z bits: x0=1@0, y0=1@1, x1=0@2, y1=1@3, x2=1@4, y2=0@5
    assert(ZOrder64.interleave(5L, 3L, 3) === (1L | 2L | 8L | 16L))
    assert(ZOrder64.interleave(0L, 0L, 16) === 0L)
    // full 31-bit interleave keeps dimensions recoverable
    val z = ZOrder64.interleave(0x7FFFFFFFL, 0L, 31)
    assert((0 until 31).forall(i => ((z >> (2 * i)) & 1L) == 1L))
    assert((0 until 31).forall(i => ((z >> (2 * i + 1)) & 1L) == 0L))
  }

  test("cmsMerge: merged sub-sketches equal the direct union sketch (CMS is linear)") {
    val df = (1 to 9000).map(i => (s"g${i % 3}", s"v${i % 800}")).toDF("g", "v")
    val direct = df.agg(countMinSketch($"v", 4, 256).as("sk"))
      .select($"sk").as[Seq[Long]].head()
    val merged = df.groupBy($"g").agg(countMinSketch($"v", 4, 256).as("sk"))
      .agg(cmsMerge($"sk", 4, 256).as("sk"))
      .select($"sk").as[Seq[Long]].head()
    assert(merged === direct)
    // and merged estimates answer like the direct sketch
    val est = df.groupBy($"g").agg(countMinSketch($"v", 4, 256).as("sk"))
      .agg(cmsMerge($"sk", 4, 256).as("sk"))
      .select(cmsEstimate($"sk", lit("v7"), 4, 256)).as[Long].head()
    assert(est >= 9000 / 800) // CMS estimates never undercount
  }

  test("minhashMerge: merged per-subset signatures equal the union's direct signature") {
    def sig(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.MinHashSignature(
          org.apache.spark.sql.GraftBridge.expression(c), 12))
    val parts = Seq(Seq("aardvark", "beetle", "caribou"), Seq("caribou", "dingo"), Seq("emu"))
      .toDF("sh")
    val merged = parts.select(sig($"sh").as("s"))
      .agg(graft.sql.functions.minhashMerge($"s", 12).as("s"))
      .select($"s").as[Seq[Long]].head()
    val direct = Seq(Seq("aardvark", "beetle", "caribou", "dingo", "emu")).toDF("sh")
      .select(sig($"sh").as("s")).as[Seq[Long]].head()
    assert(merged === direct)
    assert(merged.length === 12)
  }

  test("zorder column: codegen matches interleave, two instances coexist") {
    val df = (0L until 64L).map(x => (x, 63L - x)).toDF("x", "y")
    // two zorder calls in ONE projection — guards the freshName codegen fix
    val rows = df.select(
      zorder($"x", $"y", 6).as("z1"),
      zorder($"y", $"x", 6).as("z2"),
      $"x", $"y").as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (z1, z2, x, y) =>
      assert(z1 === ZOrder64.interleave(x, y, 6))
      assert(z2 === ZOrder64.interleave(y, x, 6))
    }
  }

  test("cmsJoinSize: upper bound on the true join size, exact when sparse") {
    import graft.sql.{functions => gf}
    val d = 4; val w = 4096
    // a: keys 0..49 with multiplicity (i%3)+1; b: keys 25..74 once each
    val a = (0 until 50).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i")).toDF("k")
    val b = (25 until 75).map(i => s"k$i").toDF("k")
    val trueSize = (25 until 50).map(i => i % 3 + 1).sum.toLong
    val est = a.agg(gf.countMinSketch($"k", d, w).as("sa"))
      .crossJoin(b.agg(gf.countMinSketch($"k", d, w).as("sb")))
      .select(gf.cmsJoinSize($"sa", $"sb", d, w)).as[Long].head()
    assert(est >= trueSize, s"est $est under true $trueSize")
    // width >> distinct keys: collisions are improbable enough that the
    // bound is tight on this fixture
    assert(est === trueSize, s"est $est vs true $trueSize")
    // disjoint key sets estimate (near) zero
    val c = (1000 until 1050).map(i => s"k$i").toDF("k")
    val estDisjoint = a.agg(gf.countMinSketch($"k", d, w).as("sa"))
      .crossJoin(c.agg(gf.countMinSketch($"k", d, w).as("sb")))
      .select(gf.cmsJoinSize($"sa", $"sb", d, w)).as[Long].head()
    assert(estDisjoint <= 4L, s"disjoint estimate $estDisjoint too large")
  }

  test("zorder: sorting by z clusters both dimensions (range pruning works)") {
    val df = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val sorted = df.select($"x", $"y", zorder($"x", $"y", 5).as("z"))
      .orderBy($"z").as[(Long, Long, Long)].collect()
    // file-bucket simulation: 16 buckets of 64 rows; each bucket's x and y
    // spans must be narrow (Morton locality), enabling min/max pruning
    val spans = sorted.grouped(64).map { g =>
      val xs = g.map(_._1); val ys = g.map(_._2)
      (xs.max - xs.min, ys.max - ys.min)
    }.toSeq
    assert(spans.forall { case (dx, dy) => dx <= 8 && dy <= 8 },
      s"unclustered spans: $spans")
  }
}
