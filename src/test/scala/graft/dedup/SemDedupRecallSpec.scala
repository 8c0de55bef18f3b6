package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins SemDeDup's dedup quality the way PqRecallSpec pins PQ: on the
  * seeded sf0.01 embeddings (every 10th vector gets a perturbed copy at
  * cosine >= 0.9 — the planted near-dup set the LSH queries share), how
  * many planted pairs does CELL-BOUNDED pruning actually collapse? A
  * pair is caught only when copy and original land in the same quantizer
  * cell — the recall cost of never doing corpus-wide pairing.
  */
class SemDedupRecallSpec extends SparkTestBase {
  import spark.implicits._

  // the q108 seeding, inlined (SimilarityQueries.seeded is query-private)
  private lazy val seeded = {
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .select(explode_outer(expr(
        """concat(
          |  array(named_struct('vec_id', vec_id,
          |    'embedding', CAST(embedding AS ARRAY<DOUBLE>))),
          |  CASE WHEN vec_id % 10 = 0
          |    THEN array(named_struct('vec_id', vec_id + 100000,
          |      'embedding', zip_with(CAST(embedding AS ARRAY<DOUBLE>),
          |        sequence(0, size(embedding) - 1),
          |        (x, d) -> x + 0.02 * ((((vec_id + d * 7919) % 97) / 97.0) - 0.5))))
          |    ELSE array() END)""".stripMargin)).as("r"))
      .select($"r.vec_id".as("vec_id"), $"r.embedding".as("embedding"))
  }

  test("cell-bounded pruning collapses most planted pairs; verdict partition is sane") {
    val v = new SemanticDeduplicator(numCells = 16, threshold = 0.9, dim = Some(64))
      .verdicts(seeded)
      .select($"vec_id", $"cid", $"keep").as[(Long, Long, Boolean)].collect()
    val byId = v.map(r => r._1 -> r).toMap
    val planted = v.collect { case (id, _, _) if id >= 100000 => id - 100000 }
    assert(planted.length === 50)
    // a planted pair counts as caught iff one member was dropped
    val caught = planted.count { orig =>
      !byId(orig)._3 || !byId(orig + 100000)._3
    }
    info(s"planted pairs caught: $caught / 50")
    assert(caught >= 40, s"cell-bounded dedup caught only $caught/50 planted pairs")
    // caught == pairs sharing a cell (the only mechanism): every co-celled
    // planted pair is collapsed, every split pair survives
    val sameCell = planted.count(orig => byId(orig)._2 == byId(orig + 100000)._2)
    assert(caught === sameCell,
      s"caught ($caught) != co-celled planted pairs ($sameCell)")
    // nothing unrelated dropped: drops happen only inside planted pairs
    val dropped = v.filter(!_._3).map(_._1).toSet
    val plantedMembers = planted.flatMap(o => Seq(o, o + 100000)).toSet
    assert(dropped.subsetOf(plantedMembers),
      s"unexpected drops outside planted pairs: ${dropped -- plantedMembers}")
  }
}
