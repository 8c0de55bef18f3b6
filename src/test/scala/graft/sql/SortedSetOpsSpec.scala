package graft.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** [[graft.sql.expressions.SortedDistinct]] /
  * [[graft.sql.expressions.SortedIntersectCount]] — the r17 verify kernels
  * must be drop-in equal to `array_distinct` (as a SET) and
  * `size(array_intersect(...))` on every input shape the dedup operators
  * feed them, including nulls, duplicates, and empties.
  */
class SortedSetOpsSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(StringType, containsNull = true)),
    StructField("b", ArrayType(StringType, containsNull = true))))

  private def run(rows: Seq[(Seq[String], Seq[String])]): Seq[Row] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }, 2),
      schema)
    df.select(
      functions.sortedIntersectCount(
        functions.sortedDistinct(col("a")),
        functions.sortedDistinct(col("b"))).as("fast"),
      size(array_intersect(array_distinct(col("a")), array_distinct(col("b"))))
        .as("ref"),
      size(functions.sortedDistinct(col("a"))).as("fast_sz"),
      size(array_distinct(col("a"))).as("ref_sz"),
      functions.sortedDistinct(col("a")).as("sd"))
      .collect().toSeq
  }

  test("matches array_intersect/array_distinct on directed edge cases") {
    val cases = Seq(
      (Seq("b", "a", "b"), Seq("a", "c")),
      (Seq.empty[String], Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x"), Seq("x")),
      (Seq("x", null), Seq(null, "y")),
      (Seq(null, null), Seq(null.asInstanceOf[String])),
      (Seq("", "a"), Seq("", "")),
      // multi-byte UTF-8 ordering must match Spark's binary string order
      (Seq("é", "e", "中"), Seq("中", "é")),
      (Seq("aa", "ab", "b"), Seq("ab", "aa", "zz")))
    run(cases).foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"intersect count mismatch: $r")
      assert(r.getInt(2) == r.getInt(3), s"distinct size mismatch: $r")
    }
  }

  test("sortedDistinct output is sorted, distinct, nulls last") {
    val rows = run(Seq((Seq("c", null, "a", "c", "b", null), Seq("a"))))
    val sd = rows.head.getSeq[String](4)
    assert(sd == Seq("a", "b", "c", null))
  }

  test("property: equal to the built-in pair on seeded random arrays") {
    val rnd = new scala.util.Random(17)
    // small alphabet forces collisions; ~10% null elements; lengths 0..8
    def elem(): String =
      if (rnd.nextInt(10) == 0) null
      else ("abcdeé中" (rnd.nextInt(7))).toString * (1 + rnd.nextInt(2))
    def arr(): Seq[String] = Seq.fill(rnd.nextInt(9))(elem())
    val pairs = Seq.fill(300)((arr(), arr()))
    run(pairs).foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"intersect mismatch: $r")
      assert(r.getInt(2) == r.getInt(3), s"distinct size mismatch: $r")
    }
  }
}
