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

  // (key, time) rows with per-key-unique times, so as-of winners and
  // running sums are deterministic
  private val timedRows: Gen[List[(String, Long)]] =
    Gen.listOfN(18, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 40L)))
      .map(_.distinct)

  test("as-of join matches the brute-force definition on random data") {
    forAll(Gen.zip(timedRows, timedRows), trials = 8) { case (ls, rs) =>
      whenever(ls.nonEmpty && rs.nonEmpty) {
        val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("lid", "key", "t")
        val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("rid", "key", "rt")
        val got = new graft.temporal.AsOfJoin(Seq("key"), "t", "rt")
          .join(left, right)
          .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
        ls.zipWithIndex.foreach { case ((k, t), i) =>
          val want = rs.zipWithIndex
            .filter { case ((rk, rt), _) => rk == k && rt <= t }
            .sortBy(_._1._2).lastOption.map(_._2.toLong)
          assert(got(i.toLong) === want, s"left ($k,$t) in ls=$ls rs=$rs")
        }
      }
    }
  }

  test("range join matches the brute-force definition on random data") {
    val intervals: Gen[List[(String, Long, Long)]] =
      Gen.listOfN(10, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 30L), Gen.choose(0L, 15L)))
        .map(_.map { case (k, lo, len) => (k, lo, lo + len) })
    forAll(Gen.zip(timedRows, intervals, Gen.choose(1L, 20L)), trials = 8) { case (ps, is, w) =>
      whenever(ps.nonEmpty && is.nonEmpty) {
        val points = ps.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("pid", "key", "t")
        val ivs = is.zipWithIndex.map { case ((k, lo, hi), i) => (i.toLong, k, lo, hi) }
          .toDF("iid", "key", "lo", "hi")
        val got = new graft.temporal.RangeJoin(Seq("key"), "t", "lo", "hi", w)
          .join(points, ivs).select($"pid", $"iid")
          .as[(Long, Long)].collect().toSet
        val want = (for {
          ((pk, t), pi) <- ps.zipWithIndex
          ((ik, lo, hi), ii) <- is.zipWithIndex
          if pk == ik && t >= lo && t <= hi
        } yield (pi.toLong, ii.toLong)).toSet
        assert(got === want, s"w=$w ps=$ps is=$is")
      }
    }
  }

  test("salted join equals the plain join for any salt factor") {
    val rows: Gen[List[(Long, Long)]] =
      Gen.listOfN(25, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 99L)))
    forAll(Gen.zip(rows, rows, Gen.choose(1, 9)), trials = 6) { case (bs, ss, factor) =>
      whenever(bs.nonEmpty && ss.nonEmpty) {
        val big = bs.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("bid", "k", "bv")
        val small = ss.map(_._1).distinct.zipWithIndex
          .map { case (k, i) => (k, s"s$i") }.toDF("k", "sv")
        val salted = graft.sql.SkewJoin.salted(big, small, Seq("k"), "bid", factor)
          .select($"bid", $"sv").as[(Long, String)].collect().toSet
        val plain = big.join(small, "k")
          .select($"bid", $"sv").as[(Long, String)].collect().toSet
        assert(salted === plain, s"factor=$factor")
      }
    }
  }

  test("deletion-blocked edit join equals the naive all-pairs definition") {
    // tiny alphabet + short strings -> dense near-pairs
    val word: Gen[String] =
      Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    forAll(Gen.listOfN(12, word), trials = 6) { words =>
      whenever(words.nonEmpty) {
        val got = new graft.text.EditDistanceJoin().pairs(words.toDF("s"), "s")
          .select($"a", $"b").as[(String, String)].collect().toSet
        val distinct = words.distinct
        val want = (for {
          a <- distinct; b <- distinct if a < b && lev(a, b) == 1
        } yield (a, b)).toSet
        assert(got === want, s"words=$distinct")
      }
    }
  }

  test("vocab builder equals the sequential coverage scan") {
    val doc: Gen[String] =
      Gen.listOfN(8, Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" "))
    forAll(Gen.zip(Gen.listOfN(5, doc), Gen.choose(1, 99)), trials = 6) { case (docs, coverPct) =>
      whenever(docs.nonEmpty) {
        val cover = coverPct / 100.0
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = new graft.text.VocabBuilder(cover).vocab(df)
          .as[(String, Long)].collect().toSet
        val counts = docs.flatMap(_.split(" ")).groupBy(identity)
          .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
          .sortBy { case (t, c) => (-c, t) }
        val total = counts.map(_._2).sum.toDouble
        val want = counts.zip(counts.map(_._2).scanLeft(0L)(_ + _))
          .takeWhile { case (_, excl) => excl < cover * total }
          .map(_._1).toSet
        assert(got === want, s"cover=$cover counts=$counts")
      }
    }
  }

  test("histogram-sketch quantile equals the sequential reference fold") {
    import graft.sql.HistogramSketch
    val hs = new HistogramSketch(0.0, 100.0, 10)
    // sequential reference of the documented interpolation
    def ref(counts: Seq[Long], p: Double): Option[Double] = {
      val total = counts.sum.toDouble
      if (total == 0) return None
      val target = p * total
      var cum = 0.0
      counts.zipWithIndex.foreach { case (c, i) =>
        if (c > 0 && cum + c >= target)
          return Some((i + math.max(0.0, target - cum) / c) * 10.0)
        cum += c
      }
      None
    }
    val gen = Gen.zip(
      Gen.listOfN(10, Gen.choose(0L, 50L)),
      Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0))
    forAll(gen, trials = 25) { case (counts, p) =>
      val got = Seq(Tuple1(counts)).toDF("hist")
        .select(hs.quantile($"hist", p).as("q"))
        .as[Option[Double]].head()
      assert(got === ref(counts, p), s"counts=$counts p=$p")
      // estimate stays inside the histogram's bounds whenever defined
      got.foreach(q => assert(q >= 0.0 && q <= 100.0))
    }
  }

  test("two-phase prefix sum equals the sequential scan on random data") {
    val rows: Gen[List[(Long, Long)]] =
      Gen.listOfN(30, Gen.zip(Gen.choose(0L, 500L), Gen.choose(0L, 9L)))
        .map(_.groupBy(_._1).map { case (id, vs) => (id, vs.head._2) }.toList)
    forAll(Gen.zip(rows, Gen.choose(1, 7)), trials = 8) { case (rs, buckets) =>
      whenever(rs.nonEmpty) {
        val df = rs.toDF("id", "v")
        val got = graft.sql.PrefixSum.exclusive(df, "id", "v", "prefix", buckets)
          .select($"id", $"prefix").as[(Long, Long)].collect().toMap
        val sorted = rs.sortBy(_._1)
        val want = sorted.map(_._1)
          .zip(sorted.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
        assert(got === want, s"buckets=$buckets rs=$sorted")
      }
    }
  }

  test("grouped prefix sum equals the per-group sequential scan on random data") {
    // random (group, order, value) with orders unique WITHIN each group
    // (the documented contract); groups drawn small so multi-row groups
    // and singletons both occur
    val rows: Gen[List[(Int, Long, Long)]] =
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 3), Gen.choose(-100L, 100L), Gen.choose(0L, 9L)))
        .map(_.groupBy(r => (r._1, r._2)).map { case ((g, o), vs) => (g, o, vs.head._3) }.toList)
    forAll(Gen.zip(rows, Gen.choose(1, 7)), trials = 8) { case (rs, buckets) =>
      whenever(rs.nonEmpty) {
        val df = rs.toDF("g", "o", "v")
        val got = graft.sql.PrefixSum
          .exclusiveBy(df, Seq("g"), "o", "v", "prefix", buckets)
          .select($"g", $"o", $"prefix").as[(Int, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        val want = rs.groupBy(_._1).flatMap { case (g, grs) =>
          val sorted = grs.sortBy(_._2)
          sorted.map(r => (g, r._2))
            .zip(sorted.map(_._3).scanLeft(0L)(_ + _).dropRight(1))
        }
        assert(got === want, s"buckets=$buckets rs=$rs")
      }
    }
  }

  test("ordered EWMA stream: any bounded-disorder arrival pattern folds exactly; flags only beyond-lateness") {
    // simulate the engine's micro-batch loop around orderedEwmaFn for
    // RANDOM event/delay patterns: events arrive sorted by
    // (event time + delay) in batches of 5; the watermark trails the max
    // event time seen in completed batches by W; Spark's own late-row
    // filter (drop ts < wm) is simulated too. Invariants:
    //  (1) lateness honored: an event still at-or-ahead of the fold
    //      horizon when it arrives is NEVER flagged;
    //  (2) exactness: folded values equal the sequential (ts, tie) fold
    //      over exactly the folded set;
    //  (3) completeness: folded ∪ flagged ∪ engine-dropped = all events
    //      after a final flush.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.EwmaStream
    val base = 1700000000000L
    val wMs = 120000L // watermark 120 s
    val lMs = 60000L  // lateness 60 s -> slack 60 s
    val slack = wMs - lMs
    val evGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 600), Gen.choose(0, 180)))
    forAll(evGen, trials = 12) { raw =>
      whenever(raw.nonEmpty) {
        val events = raw.zipWithIndex.map { case ((offS, delayS), i) =>
          (EwmaStream.EwmaEvent(1L, i.toLong, new java.sql.Timestamp(base + offS * 1000L),
            Some((i % 5).toDouble)), base + (offS + delayS) * 1000L)
        }
        val arrival = events.sortBy { case (e, at) => (at, e.event_id) }
        var stateOpt = Option.empty[EwmaStream.OrderedEwmaState]
        var wm = 0L
        var folded = Vector.empty[EwmaStream.EwmaPoint]
        var flagged = Vector.empty[Long]
        var dropped = Vector.empty[Long]
        var maxSeen = 0L
        def call(batch: Seq[EwmaStream.EwmaEvent], timedOut: Boolean): Unit = {
          val st = TestGroupState.create[EwmaStream.OrderedEwmaState](
            stateOpt.map(Optional.of[EwmaStream.OrderedEwmaState]).getOrElse(Optional.empty()),
            GroupStateTimeout.EventTimeTimeout, 1000L, Optional.of(wm), timedOut)
          val out = EwmaStream.orderedEwmaFn(0.25, 86400L, slack)(
            1L, batch.iterator, st).toVector
          stateOpt = if (st.isRemoved) None else Some(st.get)
          val horizon = if (wm <= 0L) Long.MinValue else wm + slack
          out.foreach { p =>
            if (p.late) {
              // invariant (1): only events the horizon had already
              // passed may be flagged
              val ts = batch.find(_.event_id == p.event_id).get.ts.getTime
              assert(ts < horizon,
                s"event ${p.event_id} (ts=$ts) flagged though horizon=$horizon had not passed it")
              flagged :+= p.event_id
            } else folded :+= p
          }
        }
        arrival.grouped(5).foreach { g =>
          val (keep, drop) = g.partition { case (e, _) => e.ts.getTime >= wm }
          dropped ++= drop.map(_._1.event_id)
          call(keep.map(_._1), timedOut = false)
          maxSeen = math.max(maxSeen, g.map(_._1.ts.getTime).max)
          wm = math.max(wm, maxSeen - wMs)
        }
        // final flush: watermark passes everything
        wm = maxSeen + wMs + lMs + 60000L
        call(Seq.empty, timedOut = true)
        // invariant (3): nothing lost, nothing duplicated
        val ids = folded.map(_.event_id) ++ flagged ++ dropped
        assert(ids.sorted === events.map(_._1.event_id).sorted,
          s"folded=${folded.size} flagged=${flagged.size} dropped=${dropped.size}")
        // invariant (2): sequential fold over exactly the folded set
        val byId = events.map { case (e, _) => e.event_id -> e }.toMap
        var prev = Option.empty[Double]
        val expected = folded.map(p => byId(p.event_id))
          .sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val v = prev match {
              case None => e.value.get
              case Some(x) => 0.25 * e.value.get + 0.75 * x
            }
            prev = Some(v)
            e.event_id -> v
          }.toMap
        folded.foreach { p =>
          assert(p.ewma === Some(expected(p.event_id)), s"event ${p.event_id}")
        }
      }
    }
  }

  test("ordered anomaly stream: random bounded disorder scores exactly; flags only beyond-lateness") {
    // the anomaly analog of the ordered-EWMA property above: the same
    // simulated engine loop around orderedAnomFn, with the exactness
    // invariant extended to the FULL scored tuple — mean, variance, z,
    // and the flag must equal the sequential West-recurrence fold
    // (m/q pair, pre-fold scoring, minPrior + v>0 gates) over exactly
    // the folded set, in (event-time, tie) order
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.{AnomalyStream, EwmaStream}
    val base = 1700000000000L
    val wMs = 120000L
    val lMs = 60000L
    val slack = wMs - lMs
    val evGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 600), Gen.choose(0, 180)))
    forAll(evGen, trials = 12) { raw =>
      whenever(raw.nonEmpty) {
        val events = raw.zipWithIndex.map { case ((offS, delayS), i) =>
          // values with genuine dispersion plus occasional spikes so both
          // flag outcomes occur across trials
          val v = if (i % 11 == 0) 500.0 else (i % 7).toDouble
          (EwmaStream.EwmaEvent(1L, i.toLong,
            new java.sql.Timestamp(base + offS * 1000L), Some(v)),
            base + (offS + delayS) * 1000L)
        }
        val arrival = events.sortBy { case (e, at) => (at, e.event_id) }
        var stateOpt = Option.empty[AnomalyStream.OrderedAnomState]
        var wm = 0L
        var folded = Vector.empty[AnomalyStream.AnomPoint]
        var flagged = Vector.empty[Long]
        var dropped = Vector.empty[Long]
        var maxSeen = 0L
        def call(batch: Seq[EwmaStream.EwmaEvent], timedOut: Boolean): Unit = {
          val st = TestGroupState.create[AnomalyStream.OrderedAnomState](
            stateOpt.map(Optional.of[AnomalyStream.OrderedAnomState]).getOrElse(Optional.empty()),
            GroupStateTimeout.EventTimeTimeout, 1000L, Optional.of(wm), timedOut)
          val out = AnomalyStream.orderedAnomFn(0.25, 3.0, 2, 86400L, slack)(
            1L, batch.iterator, st).toVector
          stateOpt = if (st.isRemoved) None else Some(st.get)
          val horizon = if (wm <= 0L) Long.MinValue else wm + slack
          out.foreach { p =>
            if (p.late) {
              val ts = batch.find(_.event_id == p.event_id).get.ts.getTime
              assert(ts < horizon,
                s"event ${p.event_id} (ts=$ts) flagged though horizon=$horizon had not passed it")
              flagged :+= p.event_id
            } else folded :+= p
          }
        }
        arrival.grouped(5).foreach { g =>
          val (keep, drop) = g.partition { case (e, _) => e.ts.getTime >= wm }
          dropped ++= drop.map(_._1.event_id)
          call(keep.map(_._1), timedOut = false)
          maxSeen = math.max(maxSeen, g.map(_._1.ts.getTime).max)
          wm = math.max(wm, maxSeen - wMs)
        }
        wm = maxSeen + wMs + lMs + 60000L
        call(Seq.empty, timedOut = true)
        val ids = folded.map(_.event_id) ++ flagged ++ dropped
        assert(ids.sorted === events.map(_._1.event_id).sorted,
          s"folded=${folded.size} flagged=${flagged.size} dropped=${dropped.size}")
        // sequential West-recurrence reference over exactly the folded set
        val byId = events.map { case (e, _) => e.event_id -> e }.toMap
        var m = Option.empty[Double]
        var q = Option.empty[Double]
        var n = 0L
        val expected = folded.map(p => byId(p.event_id))
          .sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val x = e.value.get
            val vp = for (qq <- q; mm <- m) yield math.max(qq - mm * mm, 0.0)
            val z = (m, vp) match {
              case (Some(mm), Some(vv)) if n >= 2 && vv > 0.0 =>
                Some((x - mm) / math.sqrt(vv))
              case _ => None
            }
            m = Some(m.fold(x)(p0 => 0.25 * x + 0.75 * p0))
            q = Some(q.fold(x * x)(p0 => 0.25 * x * x + 0.75 * p0))
            n += 1
            e.event_id -> ((m.get, math.max(q.get - m.get * m.get, 0.0), z,
              if (z.exists(v => math.abs(v) > 3.0)) 1 else 0))
          }.toMap
        folded.foreach { p =>
          val (em, ev, ez, ef) = expected(p.event_id)
          assert(p.mean === Some(em), s"mean of ${p.event_id}")
          assert(p.variance === Some(ev), s"variance of ${p.event_id}")
          assert(p.z === ez, s"z of ${p.event_id}")
          assert(p.is_anomaly === ef, s"flag of ${p.event_id}")
        }
      }
    }
  }
}
