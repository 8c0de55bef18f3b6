package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{ExactDeduplicator, MinHashDeduplicator, SimHasher}

/** Deduplication queries over the documents table.
  *
  * The synthetic corpus has no natural duplicates, so each query seeds
  * deterministic ones first: exact copies of every doc_id % 10 == 0 row
  * (id + 100000) and suffix-mutated near-copies of every doc_id % 7 == 0
  * row (id + 200000). The DuckDB oracle replays the identical seeding, so
  * both sides dedup the same corpus.
  */
object DedupQueries {

  // the oracle's whitespace map IS the engine's, by construction —
  // every normalize-chain replica below interpolates the one translate()
  // fragment (graft.dedup.TextNormalizer.sqlTranslateArgs), so Spark and
  // DuckDB whitespace sets can never drift
  private val WSMAP = graft.dedup.TextNormalizer.sqlTranslateArgs

  type Q = (SparkSession, String) => DataFrame

  private[queries] def seeded(s: SparkSession, dir: String): DataFrame =
    seedDocs(Tables.documents(s, dir))

  /** One-scan seeding: each row fans out to its 1-3 seeded copies via a
    * single explode instead of a 3-way union of filtered re-scans (the
    * union shape read the parquet three times per consumer).
    */
  private[queries] def seedDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"))
      .select(explode_outer(expr(
        """concat(
          |  array(named_struct('doc_id', doc_id, 'text', text)),
          |  CASE WHEN doc_id % 10 = 0
          |    THEN array(named_struct('doc_id', doc_id + 100000, 'text', text))
          |    ELSE array() END,
          |  CASE WHEN doc_id % 7 = 0
          |    THEN array(named_struct('doc_id', doc_id + 200000,
          |      'text', concat(text, ' graft near dup probe')))
          |    ELSE array() END)""".stripMargin)).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))

  private val seededSql =
    s"""WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' graft near dup probe'
      |  FROM documents WHERE doc_id % 7 = 0
      |), norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(translate(
      |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM base
      |)""".stripMargin

  val queries: Map[String, Q] = Map(
    // the STREAMING exact deduplicator's identity under the oracle: in
    // batch mode dropDuplicatesWithinWatermark keeps one arbitrary row
    // per fingerprint, so the deterministic surface is the fingerprint
    // SET itself — same sha2-over-normalized-text identity as q19's
    // batch deduplicator (the backfill/ingest-parity contract).
    "q177_streaming_dedup" -> ((s, dir) => {
      graft.streaming.StreamingDedup.dedup(
        seeded(s, dir).withColumn("ts",
          expr("timestamp_micros(doc_id * 1000000)")),
        "text", "ts", "1 hour")
        .select(col("fingerprint"))
    }),

    // the STREAMING near-dup detector's batch route (the q177 pattern):
    // the SAME banding + band-equality join + exact-Jaccard verify plan
    // the live stream runs, on the seeded corpus with a planted event-time
    // axis — minute (doc_id % 1000), with EVEN-source near-dup probe
    // copies shifted +45 min so the join's ±30 min time bound genuinely
    // prunes (those pairs band-collide and verify at j >= 0.5, yet must
    // NOT appear; odd-source probes at Δt=0 must). ts_a is orientation-
    // arbitrary after the pair dedup, so the deterministic surface is
    // (id_a, id_b, jaccard).
    "q183_streaming_neardup" -> ((s, dir) => {
      val docs = seeded(s, dir).withColumn("ts", expr(
        """timestamp_micros(((doc_id % 1000) * 60 +
          |  CASE WHEN doc_id >= 200000 AND doc_id % 2 = 0 THEN 2700 ELSE 0 END
          |) * 1000000)""".stripMargin))
      graft.streaming.StreamingNearDup.pairs(docs, "doc_id", "text", "ts",
        delay = "30 minutes", k = 8, numHashes = 12, numBands = 4,
        threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // template-farm detection: the 2-core of the NEAR-DUP PAIR GRAPH —
    // KCore composed over q20's MinHash-LSH pairs. A document survives
    // only if it near-duplicates 2+ documents that ALSO near-duplicate
    // 2+ (the planted triangles: originals divisible by 70 carry BOTH an
    // exact and a mutated copy, and all three pair pairwise); star
    // centers with many one-off copies peel away — the signal raw pair
    // degree cannot give. core_degree = surviving neighbor count.
    "q188_neardup_core" -> ((s, dir) => {
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(seeded(s, dir))
      new graft.graph.KCore(k = 2, maxRounds = 12)
        .vertices(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    }),

    // name the duplicate FAMILIES: 5 synchronous label-propagation
    // rounds over q20's verified near-dup pair graph — each document
    // gets its community's label (which template farm it belongs to),
    // complementing q188's "how dense" with "which family". Fixed-round
    // deterministic contract (max-count/min-label votes, integer-only).
    "q193_neardup_communities" -> ((s, dir) => {
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(seeded(s, dir))
      new graft.graph.LabelPropagation(rounds = 5)
        .run(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    }),

    // exact dedup: normalize → sha2 fingerprint → keep lowest id per group.
    // The 50 seeded identical copies collapse onto their originals.
    "q19_dedup_exact" -> ((s, dir) => {
      new ExactDeduplicator()
        .setIdCol("doc_id").setTextCol("text").setFingerprintCol("fingerprint")
        .transform(seeded(s, dir))
        .select(col("doc_id"), col("fingerprint"))
    }),

    // MinHash-LSH near-dup: 8-char shingles, 12 hashes in 4 bands × 3 rows,
    // candidates only from band-bucket collisions (never all-pairs),
    // verified shingle Jaccard >= 0.5.
    "q20_dedup_minhash" -> ((s, dir) => {
      new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(seeded(s, dir))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // 64-bit SimHash signature per original document (md5 bit votes).
    "q25_simhash" -> ((s, dir) => {
      new SimHasher().setIdCol("doc_id").setTextCol("text").setOutputCol("simhash")
        .transform(Tables.documents(s, dir))
    }),

    // SimHash near-dup pairs: band candidates + exact Hamming <= 3 over the
    // seeded corpus (exact copies at distance 0, suffix-mutated copies
    // within a few flipped bits).
    "q36_simhash_pairs" -> ((s, dir) => {
      val hasher = new SimHasher().setIdCol("doc_id").setTextCol("text").setOutputCol("simhash")
      hasher.nearDupPairs(hasher.transform(seeded(s, dir)), maxDist = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),

    // word-n-gram Jaccard near-dup: token bigram shingles through the same
    // MinHash-LSH pipeline (the n-gram variant of q20).
    "q32_jaccard_ngram" -> ((s, dir) => {
      new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleMode("token").setShingleSize(2)
        .setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(seeded(s, dir))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // segment-level exact dedup (CCNet-style "line dedup"): 16-token
    // blocks deduped corpus-wide by first occurrence, docs reassembled
    // from their surviving blocks — seeded exact copies collapse to '',
    // near-dup copies keep only their mutated tail block
    "q77_segment_dedup" -> ((s, dir) => {
      new graft.dedup.SegmentDeduplicator(blockTokens = 16)
        .transform(seeded(s, dir))
    }),

    // substring-level exact dedup (fixed-k ExactSubstr): overlapping
    // 8-token shingles counted corpus-wide, duplicated windows merged
    // into maximal spans per doc via the sorted-position lag identity.
    // Seeded exact copies are one full-doc span on both members; near-dup
    // copies share everything but the mutated tail.
    // EXACT Jaccard >= 0.8 join over 8-char shingle sets via prefix
    // filtering (AllPairs) — q20's near-dup semantics with a recall
    // guarantee instead of LSH's probabilistic bands. The oracle verifies
    // completeness the strong way: it computes the answer EXHAUSTIVELY
    // (every shingle-sharing pair), so one pair missed by the prefix
    // filter is a hash mismatch.
    "q120_setsim_join" -> ((s, dir) => {
      val sh = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.Shingles(
          org.apache.spark.sql.GraftBridge.expression(
            graft.dedup.TextNormalizer.normalize(col("text"))), 8))
      new graft.dedup.SetSimilarityJoin(0.8, "doc_id", "sh")
        .pairs(seeded(s, dir).select(col("doc_id"), sh.as("sh")))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // EXACT asymmetric containment |A∩B|/|A| >= 0.9 over 16-char shingle
    // sets — the pairs q120's symmetric Jaccard MISSES by design: a doc
    // swallowed by a larger one (every seeded near-dup's original is
    // fully contained in its probe-suffixed copy, C = 1.0, while its
    // Jaccard shrinks with the suffix). Ordered pairs, both directions
    // possible. 16-char shingles (vs q120's 8): containment is a
    // near-verbatim-span notion, and on this templated corpus 8-char
    // grams are ~16x less selective (sum df^2 878M vs 23M at sf0.1) —
    // the k=8 first reading cost 11.9 s / 572 CPU-s in the prefix x
    // inverted-index join for zero semantic gain. The oracle is
    // exhaustive (every shingle-sharing ordered pair scored), so a pair
    // missed by the prefix filter = hash mismatch.
    "q197_containment_join" -> ((s, dir) => {
      val sh = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.Shingles(
          org.apache.spark.sql.GraftBridge.expression(
            graft.dedup.TextNormalizer.normalize(col("text"))), 16))
      new graft.dedup.ContainmentJoin(0.9, "doc_id", "sh")
        .pairs(seeded(s, dir).select(col("doc_id"), sh.as("sh")))
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 6).as("containment"))
    }),

    // the THIRD blocking family (after LSH bands and prefix filtering):
    // sorted-neighborhood — sort by the normalized 24-char prefix key,
    // pair every record with its 10 sort-neighbors, verify exact shingle
    // Jaccard >= 0.5. O(n*w) candidates whatever the key skew; recall is
    // the method's contract (pairs sorted > w apart are missed) and the
    // oracle replays the same method, so the gate pins the mechanics.
    "q206_sorted_neighborhood" -> ((s, dir) => {
      val sh = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.Shingles(
          org.apache.spark.sql.GraftBridge.expression(
            graft.dedup.TextNormalizer.normalize(col("text"))), 8))
      val recs = seeded(s, dir).select(col("doc_id"),
        substring(graft.dedup.TextNormalizer.normalize(col("text")), 1, 24)
          .as("key"),
        sh.as("sh"))
      new graft.dedup.SortedNeighborhoodJoin(10, "doc_id", "key")
        .pairs(recs, "sh", 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // source-level resemblance WITHOUT pairwise doc scans: per-doc
    // minhash signatures min-merged into ONE 12-long signature per source
    // (bit-equal to signing the source's shingle UNION directly — the
    // oracle computes it that way), pairwise signature match fraction
    // beside the exact shingle-set Jaccard it estimates
    "q128_source_resemblance" -> ((s, dir) => {
      val shCol = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.Shingles(
          org.apache.spark.sql.GraftBridge.expression(
            graft.dedup.TextNormalizer.normalize(col("text"))), 8))
      val sigCol = org.apache.spark.sql.GraftBridge.column(
        graft.sql.expressions.MinHashSignature(
          org.apache.spark.sql.GraftBridge.expression(shCol), 12))
      val docs = Tables.documents(s, dir)
      val sigs = docs.select(col("source"), sigCol.as("sig"))
        .groupBy(col("source"))
        .agg(graft.sql.functions.minhashMerge(col("sig"), 12).as("sig"))
      val occ = docs.select(col("source"), explode_outer(shCol).as("shingle")).distinct()
      val sz = occ.groupBy(col("source")).agg(count(lit(1)).as("z"))
      val inter = occ.as("x")
        .join(occ.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("i"))
      sigs.as("a").join(sigs.as("b"), col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.sig").as("sa"), col("b.sig").as("sb"))
        .select(col("src_a"), col("src_b"),
          expr("CAST(size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v)) AS BIGINT)")
            .as("sig_matches"))
        .join(inter, Seq("src_a", "src_b"), "left")
        .join(sz.select(col("source").as("src_a"), col("z").as("za")), "src_a")
        .join(sz.select(col("source").as("src_b"), col("z").as("zb")), "src_b")
        .select(col("src_a"), col("src_b"), col("sig_matches"),
          round(coalesce(col("i"), lit(0L)).cast("double") /
            (col("za") + col("zb") - coalesce(col("i"), lit(0L))), 6).as("jaccard"))
    }),

    "q107_substring_dedup" -> ((s, dir) => {
      new graft.dedup.SubstringDeduplicator(k = 8, minCount = 2)
        .transform(seeded(s, dir))
    }),

    // cross-source duplication matrix: distinct shared fingerprints per
    // source pair — "which feeds duplicate each other" before mixing
    // weights are set. Sources derived as doc_id mod 3 on the seeded
    // corpus (the +100000/+200000 copies shift bucket, planting overlap).
    // One fingerprint-keyed self-join; output is |sources|² rows.
    "q113_source_overlap" -> ((s, dir) => {
      val fp = seeded(s, dir)
        .select(concat(lit("s"), (col("doc_id") % 3).cast("string")).as("src"),
          sha2(graft.dedup.TextNormalizer.normalize(col("text")), 256).as("f"))
        .distinct()
      fp.as("a").join(fp.as("b"),
          col("a.f") === col("b.f") && col("a.src") < col("b.src"))
        .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // incremental ingest dedup: the seeded batch arrives against a known
    // corpus (every 3rd original doc's fingerprints); known content is
    // dropped via the Bloom-pruned anti-join, the rest dedups within-batch
    "q92_incremental_dedup" -> ((s, dir) => {
      val known = Tables.documents(s, dir)
        .where(col("doc_id") % 3 === 0)
        .select(sha2(graft.dedup.TextNormalizer.normalize(col("text")), 256)
          .as("fingerprint"))
      ExactDeduplicator.incremental(seeded(s, dir), known)
        .select(col("doc_id"), col("fingerprint"))
    })
  )

  /** Programmatically generated 64-bit SimHash CTE chain (64 vote sums);
    * expects a `norm` CTE with (doc_id, norm), ends with `sigs`
    * (doc_id, simhash).
    */
  private val simhashChain: String = {
    val votes = (for (i <- 0 until 16; b <- 3 to 0 by -1) yield
      s"sum(CASE WHEN (('0x' || substr(h, ${i + 1}, 1))::INT >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_${i}_$b")
      .mkString(",\n    ")
    val nibbles = (0 until 16).map { i =>
      val v = (3 to 0 by -1)
        .map(b => s"(CASE WHEN s_${i}_$b > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      s"substring('0123456789abcdef', ($v) + 1, 1)"
    }.mkString(" || ")
    s""", toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS tok FROM norm
       |), hashed AS (
       |  SELECT doc_id, md5(tok) AS h FROM toks
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id
       |), sigs AS (
       |  SELECT doc_id, $nibbles AS simhash FROM votes
       |)""".stripMargin
  }

  private val simhashSql: String =
    s"""WITH norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(translate(
      |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents
      |)""".stripMargin +
      simhashChain + "\nSELECT doc_id, simhash FROM sigs"

  /** Exact hamming distance between two 16-hex simhash columns in SQL. */
  private def hammingSql(a: String, b: String): String =
    (1 to 16).map(i =>
      s"bit_count(xor(('0x' || substr($a, $i, 1))::BIGINT, ('0x' || substr($b, $i, 1))::BIGINT))")
      .mkString(" + ")

  val oracles: Map[String, String] = Map(
    // per-source signature computed DIRECTLY over the source's distinct
    // shingle union (the Spark side min-merges per-doc signatures — the
    // merge identity is what the hash checks), exact Jaccard exhaustively
    "q128_source_resemblance" ->
      s"""WITH norm AS (
        |  SELECT source,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT source, substring(norm, CAST(i AS INT), 8) AS shingle
        |  FROM norm CROSS JOIN range(1, 700) t(i)
        |  WHERE i <= greatest(length(norm) - 7, 1)
        |), hashed AS (
        |  SELECT source, shingle,
        |         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
        |         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT source, CAST(j AS INT) AS seed,
        |         min((h1 + j * h2) % 72057594037927936) AS mh
        |  FROM hashed CROSS JOIN range(0, 12) t(j)
        |  GROUP BY 1, 2
        |), pm AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         CAST(count(*) FILTER (a.mh = b.mh) AS BIGINT) AS sig_matches
        |  FROM sig a JOIN sig b ON a.seed = b.seed AND a.source < b.source
        |  GROUP BY 1, 2
        |), sz AS (
        |  SELECT source, count(*) AS z FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.source < y.source
        |  GROUP BY 1, 2
        |)
        |SELECT pm.src_a, pm.src_b, pm.sig_matches,
        |  round(coalesce(i, 0)::DOUBLE / (za.z + zb.z - coalesce(i, 0)), 6) AS jaccard
        |FROM pm
        |JOIN sz za ON za.source = pm.src_a
        |JOIN sz zb ON zb.source = pm.src_b
        |LEFT JOIN inter ON inter.src_a = pm.src_a AND inter.src_b = pm.src_b
        |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
        |SELECT 'x', 'x', -1, -1.0 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin,

    // EXHAUSTIVE replay (no prefix filter): every shingle-sharing pair's
    // exact Jaccard — any pair with J > 0 shares a shingle, so this is
    // the complete ground truth the prefix-filtered join must equal.
    "q120_setsim_join" ->
      (seededSql +
        """, sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 8) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 7, 1)
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
          |  FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.doc_id < y.doc_id
          |  GROUP BY 1, 2
          |), jac AS (
          |  SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS jaccard
          |  FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |)
          |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
          |WHERE jaccard >= 0.8
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, -1.0 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin),

    // EXHAUSTIVE replay (no prefix filter): every shingle-sharing ORDERED
    // pair's exact containment — any pair with C > 0 shares a shingle, so
    // this is the complete ground truth the prefix-filtered join must equal.
    "q197_containment_join" ->
      (seededSql +
        """, sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 16) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 15, 1)
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
          |  FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.doc_id <> y.doc_id
          |  GROUP BY 1, 2
          |), cont AS (
          |  SELECT id_a, id_b, i::DOUBLE / sa.sz AS containment
          |  FROM inter JOIN sizes sa ON sa.doc_id = id_a
          |)
          |SELECT id_a, id_b, round(containment, 6) AS containment FROM cont
          |WHERE containment >= 0.9
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, -1.0 WHERE (SELECT max(length(norm)) FROM norm) > 714""".stripMargin),

    // same sorted neighborhood (row_number over the (key, doc_id) total
    // order — identical to the engine's two-phase rank by construction),
    // same in-window pairing, same exact-Jaccard verify
    "q206_sorted_neighborhood" ->
      (seededSql +
        """, keyed AS (
          |  SELECT doc_id, substring(norm, 1, 24) AS k FROM norm
          |), rnk AS (
          |  SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS r FROM keyed
          |), cand AS (
          |  SELECT least(a.doc_id, b.doc_id) AS id_a,
          |         greatest(a.doc_id, b.doc_id) AS id_b
          |  FROM rnk a JOIN rnk b ON b.r > a.r AND b.r <= a.r + 10
          |), sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 8) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 7, 1)
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT c.id_a, c.id_b, count(*) AS i
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.id_a
          |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
          |  GROUP BY 1, 2
          |), jac AS (
          |  SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS jaccard
          |  FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |)
          |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
          |WHERE jaccard >= 0.5
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, -1.0 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin),

    "q19_dedup_exact" ->
      (seededSql +
        """
          |SELECT doc_id, sha256(norm) AS fingerprint FROM norm
          |QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1""".stripMargin),
    "q177_streaming_dedup" ->
      (seededSql +
        """
          |SELECT DISTINCT sha256(norm) AS fingerprint FROM norm""".stripMargin),
    "q113_source_overlap" ->
      (seededSql +
        """, fp AS (
          |  SELECT DISTINCT 's' || (doc_id % 3) AS src, sha256(norm) AS f
          |  FROM norm
          |)
          |SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
          |FROM fp a JOIN fp b ON a.f = b.f AND a.src < b.src
          |GROUP BY 1, 2""".stripMargin),
    "q20_dedup_minhash" ->
      (seededSql +
        """, sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 8) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 7, 1)
          |), hashed AS (
          |  SELECT doc_id,
          |         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
          |         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
          |  FROM sh
          |), sig AS (
          |  SELECT doc_id, CAST(j AS INT) AS seed,
          |         min((h1 + j * h2) % 72057594037927936) AS minhash
          |  FROM hashed CROSS JOIN range(0, 12) t(j)
          |  GROUP BY 1, 2
          |), bands AS (
          |  SELECT doc_id, seed // 3 AS band,
          |         md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS bandsig
          |  FROM sig GROUP BY doc_id, seed // 3
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bands a
          |  JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT c.id_a, c.id_b, count(*) AS i
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.id_a
          |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
          |  GROUP BY 1, 2
          |), jac AS (
          |  SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
          |  FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |)
          |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
          |WHERE jaccard >= 0.5
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, -1.0 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin),
    // q183: q20's full MinHash-band replay plus the stream join's ±30 min
    // event-time bound (the planted axis: minute doc_id % 1000, even-source
    // probe copies shifted +45 min). The bound is applied to the CANDIDATE
    // pairs — verification is a pure filter, so band ∧ time ∧ jaccard
    // composes in any order.
    "q183_streaming_neardup" ->
      (seededSql +
        """, tsx AS (
          |  SELECT doc_id,
          |    ((doc_id % 1000) * 60 +
          |      CASE WHEN doc_id >= 200000 AND doc_id % 2 = 0 THEN 2700 ELSE 0 END
          |    ) * 1000000 AS ts_us
          |  FROM norm
          |), sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 8) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 7, 1)
          |), hashed AS (
          |  SELECT doc_id,
          |         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
          |         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
          |  FROM sh
          |), sig AS (
          |  SELECT doc_id, CAST(j AS INT) AS seed,
          |         min((h1 + j * h2) % 72057594037927936) AS minhash
          |  FROM hashed CROSS JOIN range(0, 12) t(j)
          |  GROUP BY 1, 2
          |), bands AS (
          |  SELECT doc_id, seed // 3 AS band,
          |         md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS bandsig
          |  FROM sig GROUP BY doc_id, seed // 3
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bands a
          |  JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
          |  JOIN tsx ta ON ta.doc_id = a.doc_id
          |  JOIN tsx tb ON tb.doc_id = b.doc_id
          |  WHERE abs(ta.ts_us - tb.ts_us) <= 1800000000
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT c.id_a, c.id_b, count(*) AS i
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.id_a
          |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
          |  GROUP BY 1, 2
          |), jac AS (
          |  SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
          |  FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |)
          |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
          |WHERE jaccard >= 0.5
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, -1.0 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin),

    // q188: q20's full band replay down to the verified pair set, then
    // the q187 fixed-12-round peeling. `pairs` and every round are
    // MATERIALIZED — each is referenced twice downstream, and default
    // CTE inlining would re-run the whole MinHash chain per reference
    // (and expand round 12 into 2^12 copies of it).
    "q188_neardup_core" -> {
      val rounds = (1 to 12).map { i =>
        s"""k$i AS MATERIALIZED (
           |  SELECT s FROM se${i - 1} GROUP BY s HAVING count(*) >= 2),
           |se$i AS MATERIALIZED (
           |  SELECT c.s, c.d FROM se${i - 1} c
           |  JOIN k$i a ON c.s = a.s JOIN k$i b ON c.d = b.s
           |)""".stripMargin
      }.mkString(",\n")
      seededSql +
        s""", sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 8) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 7, 1)
          |), hashed AS (
          |  SELECT doc_id,
          |         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
          |         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
          |  FROM sh
          |), sig AS (
          |  SELECT doc_id, CAST(j AS INT) AS seed,
          |         min((h1 + j * h2) % 72057594037927936) AS minhash
          |  FROM hashed CROSS JOIN range(0, 12) t(j)
          |  GROUP BY 1, 2
          |), bands AS (
          |  SELECT doc_id, seed // 3 AS band,
          |         md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS bandsig
          |  FROM sig GROUP BY doc_id, seed // 3
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bands a
          |  JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT c.id_a, c.id_b, count(*) AS i
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.id_a
          |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
          |  GROUP BY 1, 2
          |), pairs AS MATERIALIZED (
          |  SELECT id_a, id_b FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
          |), se0 AS MATERIALIZED (
          |  SELECT id_a AS s, id_b AS d FROM pairs
          |  UNION ALL SELECT id_b AS s, id_a AS d FROM pairs
          |),
          |$rounds
          |SELECT s AS id, count(*) AS core_degree FROM se12 GROUP BY 1
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin
    },

    // q193: the same band replay down to `pairs`, then 5 generated LPA
    // rounds — per round: (node, label) vote counts, keep max-count rows
    // (window max + filter ≡ the engine's struct-max), min label among
    // them. Integer-only; MATERIALIZED for the q188 reasons.
    "q193_neardup_communities" -> {
      val rounds = (1 to 5).map { i =>
        s"""l$i AS MATERIALIZED (
           |  SELECT node, min(l) AS lbl FROM (
           |    SELECT n AS node, l, cnt, max(cnt) OVER (PARTITION BY n) AS mx
           |    FROM (SELECT e.s AS n, p.lbl AS l, count(*) AS cnt
           |          FROM se0 e JOIN l${i - 1} p ON p.node = e.d GROUP BY 1, 2))
           |  WHERE cnt = mx GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      seededSql +
        s""", sh AS (
          |  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INT), 8) AS shingle
          |  FROM norm CROSS JOIN range(1, 700) t(i)
          |  WHERE i <= greatest(length(norm) - 7, 1)
          |), hashed AS (
          |  SELECT doc_id,
          |         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
          |         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
          |  FROM sh
          |), sig AS (
          |  SELECT doc_id, CAST(j AS INT) AS seed,
          |         min((h1 + j * h2) % 72057594037927936) AS minhash
          |  FROM hashed CROSS JOIN range(0, 12) t(j)
          |  GROUP BY 1, 2
          |), bands AS (
          |  SELECT doc_id, seed // 3 AS band,
          |         md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS bandsig
          |  FROM sig GROUP BY doc_id, seed // 3
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bands a
          |  JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT c.id_a, c.id_b, count(*) AS i
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.id_a
          |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
          |  GROUP BY 1, 2
          |), pairs AS MATERIALIZED (
          |  SELECT id_a, id_b FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
          |), se0 AS MATERIALIZED (
          |  SELECT id_a AS s, id_b AS d FROM pairs
          |  UNION ALL SELECT id_b AS s, id_a AS d FROM pairs
          |), l0 AS MATERIALIZED (
          |  SELECT DISTINCT s AS node, s AS lbl FROM se0
          |),
          |$rounds
          |SELECT node AS id, lbl AS label FROM l5
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin
    },

    "q25_simhash" -> simhashSql,
    "q36_simhash_pairs" ->
      (seededSql + simhashChain +
        s"""
           |, bands AS (
           |  SELECT doc_id, CAST(b AS INT) AS band,
           |         substr(simhash, CAST(b AS INT) * 4 + 1, 4) AS chunk
           |  FROM sigs CROSS JOIN range(0, 4) t(b)
           |), cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM bands a
           |  JOIN bands b ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
           |), ham AS (
           |  SELECT c.id_a, c.id_b,
           |         ${hammingSql("x.simhash", "y.simhash")} AS hamming
           |  FROM cand c
           |  JOIN sigs x ON x.doc_id = c.id_a
           |  JOIN sigs y ON y.doc_id = c.id_b
           |)
           |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""".stripMargin),
    "q32_jaccard_ngram" ->
      (seededSql +
        """, toks AS (
          |  SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
          |), sh AS (
          |  SELECT DISTINCT doc_id,
          |    array_to_string(list_slice(tl, CAST(i AS INT), CAST(i AS INT) + 1), ' ') AS shingle
          |  FROM toks CROSS JOIN range(1, 200) t(i)
          |  WHERE i <= greatest(len(tl) - 1, 1)
          |), hashed AS (
          |  SELECT doc_id,
          |         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
          |         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
          |  FROM sh
          |), sig AS (
          |  SELECT doc_id, CAST(j AS INT) AS seed,
          |         min((h1 + j * h2) % 72057594037927936) AS minhash
          |  FROM hashed CROSS JOIN range(0, 12) t(j)
          |  GROUP BY 1, 2
          |), bands AS (
          |  SELECT doc_id, seed // 3 AS band,
          |         md5(string_agg(minhash::VARCHAR, ',' ORDER BY seed)) AS bandsig
          |  FROM sig GROUP BY doc_id, seed // 3
          |), cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bands a
          |  JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
          |), sizes AS (
          |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
          |), inter AS (
          |  SELECT c.id_a, c.id_b, count(*) AS i
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.id_a
          |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
          |  GROUP BY 1, 2
          |), jac AS (
          |  SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
          |  FROM inter
          |  JOIN sizes sa ON sa.doc_id = id_a
          |  JOIN sizes sb ON sb.doc_id = id_b
          |)
          |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
          |WHERE jaccard >= 0.5
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,200) token bound
          |SELECT -1, -1, -1.0 WHERE (SELECT max(len(tl)) FROM toks) > 200""".stripMargin),
    "q77_segment_dedup" ->
      (seededSql +
        """
          |, toks AS (
          |  SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
          |), segs AS (
          |  SELECT doc_id, CAST(i AS INT) AS seg_idx,
          |    array_to_string(list_slice(tl, CAST(i*16+1 AS INT), CAST(i*16+16 AS INT)), ' ') AS segment
          |  FROM toks CROSS JOIN range(0, 16) t(i)
          |  -- len(tl) > 0 guard is load-bearing: DuckDB // TRUNCATES toward
          |  -- zero, so (0-1)//16 = 0 and a blank doc would emit one phantom
          |  -- '' segment; the operator emits ZERO segments for blank docs
          |  WHERE len(tl) > 0 AND i <= (len(tl) - 1) // 16
          |), rn AS (
          |  SELECT doc_id, seg_idx, segment,
          |    row_number() OVER (PARTITION BY segment ORDER BY doc_id, seg_idx) AS rn
          |  FROM segs
          |)
          |SELECT doc_id, count(*) AS n_segments,
          |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segments,
          |  coalesce(string_agg(CASE WHEN rn = 1 THEN segment END, ' ' ORDER BY seg_idx), '')
          |    AS clean_text
          |FROM rn GROUP BY doc_id
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(0,16) segment bound
          |SELECT -1, -1, -1, '' WHERE (SELECT max(len(tl)) FROM toks) > 256""".stripMargin),
    "q107_substring_dedup" ->
      (seededSql +
        """
          |, toks AS (
          |  SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
          |), sh AS (
          |  SELECT doc_id, CAST(i AS INT) AS pos,
          |    md5(array_to_string(list_slice(tl, CAST(i AS INT), CAST(i AS INT) + 7), ' ')) AS fp
          |  FROM toks CROSS JOIN range(1, 200) t(i)
          |  WHERE i <= len(tl) - 7
          |), dup AS (
          |  SELECT fp FROM sh GROUP BY fp HAVING count(*) >= 2
          |), hits AS (
          |  SELECT s.doc_id, s.pos,
          |    lag(s.pos) OVER (PARTITION BY s.doc_id ORDER BY s.pos) AS prev
          |  FROM sh s JOIN dup d ON s.fp = d.fp
          |), agg AS (
          |  SELECT doc_id,
          |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
          |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev >= 8 THEN 8 ELSE pos - prev END) AS BIGINT) AS dup_tokens
          |  FROM hits GROUP BY doc_id
          |)
          |SELECT t.doc_id, len(t.tl) AS n_tokens,
          |  coalesce(a.dup_spans, 0) AS dup_spans,
          |  coalesce(a.dup_tokens, 0) AS dup_tokens,
          |  len(t.tl) - coalesce(a.dup_tokens, 0) AS clean_tokens
          |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,200) shingle bound
          |SELECT -1, -1, -1, -1, -1 WHERE (SELECT max(len(tl)) FROM toks) > 206""".stripMargin),
    "q92_incremental_dedup" ->
      (seededSql +
        s"""
          |, known AS (
          |  SELECT DISTINCT sha256(trim(regexp_replace(regexp_replace(translate(
          |    lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
          |  FROM documents WHERE doc_id % 3 = 0
          |), inc AS (
          |  SELECT doc_id, sha256(norm) AS fingerprint FROM norm
          |)
          |SELECT doc_id, fingerprint FROM inc
          |WHERE fingerprint NOT IN (SELECT fingerprint FROM known)
          |QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1""".stripMargin)
  )
}
