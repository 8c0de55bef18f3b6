package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{DedupClusters, ExactDeduplicator, MinHashDeduplicator}
import graft.sampling.{HashSampler, MixtureSampler, StratifiedSampler, TemperatureMixture, WeightedSampler}
import graft.text.{QualityFilter, TfIdf, TokenPacker}

/** Corpus-curation queries: heuristic quality filtering, deterministic
  * hash-split sampling, and near-dup cluster resolution — the end-game
  * operators of a training-data pipeline (filter → dedup → split).
  */
object CurationQueries {

  // the oracle's whitespace map IS the engine's, by construction —
  // every normalize-chain replica below interpolates the one translate()
  // fragment (graft.dedup.TextNormalizer.sqlTranslateArgs), so Spark and
  // DuckDB whitespace sets can never drift
  private val WSMAP = graft.dedup.TextNormalizer.sqlTranslateArgs

  type Q = (SparkSession, String) => DataFrame

  // one-scan seeded corpus shared with the dedup family
  private def seeded(s: SparkSession, dir: String): DataFrame =
    DedupQueries.seeded(s, dir)

  val queries: Map[String, Q] = Map(
    // C4/Gopher-style heuristic filter: token bounds + quality threshold
    "q37_quality_filter" -> ((s, dir) => {
      new QualityFilter().setTextCol("text")
        .setMinTokens(40).setMaxTokens(100000)
        .setMaxPunctRatio(0.2).setMinQuality(0.5)
        .transform(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_chars"))
    }),

    // reproducible 30% validation split (salt-namespaced md5 buckets)
    "q38_hash_split" -> ((s, dir) => {
      val sampler = new HashSampler().setIdCol("doc_id").setPercent(30).setSalt("val")
      sampler.transform(Tables.documents(s, dir))
        .select(col("doc_id"), sampler.bucket.as("bucket"))
    }),

    // near-dup pairs (q20 pipeline) collapsed into clusters via distributed
    // min-label propagation; cluster id = smallest member
    "q39_dedup_clusters" -> ((s, dir) => {
      val docs = seeded(s, dir)
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(docs)
      DedupClusters.components(docs, pairs, "doc_id")
    }),

    // LEAKAGE-SAFE train/valid split: the split coin is thrown on the
    // near-dup CLUSTER id, not the document id, so every member of a
    // near-duplicate cluster lands on the same side — the standard cure
    // for eval contamination via train/valid near-dups, which a per-doc
    // hash split (q38) cannot give. Composition: q39's components + one
    // row-local md5 coin on the cluster label; no new wide operation.
    "q163_leakage_safe_split" -> ((s, dir) => {
      val docs = seeded(s, dir)
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(docs)
      val comps = DedupClusters.components(docs, pairs, "doc_id")
      comps.select(col("doc_id"), col("cluster"),
        when(graft.sql.functions.uniform32("split", col("cluster")) % 100 < 90,
          "train").otherwise("valid").as("split"))
    }),

    // the SAME component semantics as q39 via the O(log n) algorithm:
    // alternating large-star/small-star contraction (Kiveris et al. 2014)
    // instead of O(diameter) min-label propagation. Identical oracle —
    // two independent distributed algorithms must agree on every label.
    "q121_cc_star" -> ((s, dir) => {
      val docs = seeded(s, dir)
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(docs)
      graft.graph.StarContraction.components(docs, pairs, "doc_id")
    }),

    // canonical selection by QUALITY: near-dup clusters keep their
    // best-quality member (ties to the lowest id), not the min-id — the
    // production keep rule when duplicates differ in boilerplate/truncation.
    // One per-cluster max_by partial aggregation over the q39 components;
    // the quality score is row-local codegen, so the only new wide op is
    // the cluster-keyed argmax.
    "q123_keep_best" -> ((s, dir) => {
      val docs = seeded(s, dir)
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(docs)
      val comps = DedupClusters.components(docs, pairs, "doc_id")
      val scored = docs.select(col("doc_id"),
        graft.text.TextFunctions.qualityScore(col("text")).as("quality"))
      comps.join(scored, "doc_id")
        .groupBy(col("cluster"))
        .agg(
          max_by(struct(col("doc_id"), col("quality")),
            struct(col("quality"), -col("doc_id"))).as("k"),
          count(lit(1)).as("members"))
        .select(col("cluster"), col("k.doc_id").as("keep_id"),
          col("k.quality").as("quality"), col("members"))
    }),

    // dedup savings report: q39's clusters rolled up by size — how many
    // clusters of each size, docs removable (k−1 each), characters saved
    // under the keep-min-id rule. The number a curation run actually
    // reports to its owner before committing the drop.
    "q153_dedup_report" -> ((s, dir) => {
      val docs = seeded(s, dir)
      val pairs = new MinHashDeduplicator()
        .setIdCol("doc_id").setTextCol("text")
        .setShingleSize(8).setNumHashes(12).setNumBands(4).setThreshold(0.5)
        .transform(docs)
      val comps = DedupClusters.components(docs, pairs, "doc_id")
      val sized = comps
        .join(docs.select(col("doc_id"),
          length(col("text")).cast("long").as("chars")), "doc_id")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("k"), sum(col("chars")).as("tot"),
          min_by(col("chars"), col("doc_id")).as("kept"))
      sized.groupBy(col("k"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("tot") - col("kept")).as("chars_saved"))
        .select(col("k"), col("n_clusters"),
          ((col("k") - 1) * col("n_clusters")).as("docs_removable"),
          col("chars_saved"))
    }),

    // the end-game composition in ONE declarative plan: quality filter →
    // exact dedup (keep canonical) → 70% train split → token-budget shards
    "q50_curation_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val filtered = new QualityFilter().setTextCol("text")
        .setMinTokens(40).setMaxTokens(100000)
        .setMaxPunctRatio(0.2).setMinQuality(0.5)
        .transform(docs)
      val deduped = new ExactDeduplicator()
        .setIdCol("doc_id").setTextCol("text").setFingerprintCol("fingerprint")
        .transform(filtered)
      val train = new HashSampler().setIdCol("doc_id").setPercent(30).setSalt("val")
        .transformComplement(deduped)
      new TokenPacker().setIdCol("doc_id").setTextCol("text").setBudget(2048L)
        .transform(train)
        .select(col("doc_id"), col("n_tokens"), col("prefix_tokens"), col("chunk"))
    }),

    // deterministic corpus mixing toward per-language target counts
    "q51_mixture" -> ((s, dir) => {
      new MixtureSampler(
        targets = Map("en" -> 200L, "de" -> 50L, "fr" -> 50L, "es" -> 30L, "zh" -> 20L),
        idCol = "doc_id", groupCol = "lang", salt = "mix")
        .transform(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"))
    }),

    // temperature-scaled mixing: per-lang targets derived from counts,
    // target ∝ n^0.5 scaled to 250 rows — α-sampling boosts low-resource
    // langs; head langs rate-capped, tiny langs hit the min(1,·) branch
    "q109_temperature_mix" -> ((s, dir) => {
      new TemperatureMixture(totalTarget = 250, alpha = 0.5,
        idCol = "doc_id", groupCol = "lang", salt = "temp")
        .transform(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"))
    }),

    // exact-count stratified carve-out: exactly min(5, |lang|) docs per
    // language by md5 rank (group-partitioned window)
    "q58_stratified" -> ((s, dir) => {
      new StratifiedSampler(n = 5, idCol = "doc_id", groupCol = "lang", salt = "strat")
        .transform(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"))
    }),

    // TF-IDF top-3 terms per document — distributed wordcount + broadcast
    // corpus size, no driver-side vocabulary
    "q59_tfidf" -> ((s, dir) => {
      new TfIdf(topK = 3).topTerms(Tables.documents(s, dir))
    }),

    // deterministic weighted (priority) sample: 100 docs, inclusion odds
    // proportional to n_chars; global smallest-k = TakeOrderedAndProject
    "q68_weighted_sample" -> ((s, dir) => {
      new WeightedSampler(k = 100, weightCol = "n_chars")
        .transform(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")))
    }),

    // DSIR-style importance resampling: tilt the corpus toward a target
    // domain (here the deterministic doc_id % 31 slice) by target-vs-base
    // unigram log-likelihood ratio + an md5-coin acceptance. kept uses the
    // UNROUNDED score on both sides; only the reported score is rounded
    "q99_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      new graft.sampling.ImportanceSampler(alpha = 0.5, rate = 0.5)
        .select(docs, docs.where(col("doc_id") % 31 === 0))
        .select(col("doc_id"), col("n_tokens"),
          round(col("score"), 6).as("score"), col("kept"))
    }),

    // the CLASSIFIER-scored curation loop, one declarative plan: heuristic
    // quality filter → hashing-trick features → linear margin (q102's
    // exact integer weights) → sigmoid-probability md5-coin acceptance
    // (the ImportanceSampler idiom: keep iff coin < p·2^32, computed with
    // the IDENTICAL float op order on both engines) → exact dedup keeping
    // the canonical copy → token-budget shards. Upgrades q50's hash split
    // to model-driven selection — every stage stays oracle-replayable
    "q104_classifier_curation" -> ((s, dir) => {
      // spread: the filter + hashed-gram margin are CPU-dense row-local
      // work; a single-split local file would run them serially (no-op on
      // a many-split production scan, where the filter stays at the scan)
      val filtered = new QualityFilter().setTextCol("text")
        .setMinTokens(40).setMaxTokens(100000)
        .setMaxPunctRatio(0.2).setMinQuality(0.5)
        .transform(graft.sql.functions.spread(
          Tables.documents(s, dir), col("doc_id")))
      // row-local margin (Σ over grams of w(bucket), exact long sum) —
      // same value as the features() groupBy/sum, but the corpus is
      // scanned ONCE and scored in place: no gram explode, no shuffle,
      // no self-join of the filtered corpus against its own scores
      val scored = filtered.withColumn("margin",
        new graft.text.HashedNgramFeaturizer(dim = 4096)
          .marginCol(col("text"), b => b % 7 - 3) / 10.0 - 0.3)
      val coin = graft.sql.functions.uniform32("clf", col("doc_id"))
      val accepted = scored
        .where(coin.cast("double") <
          lit(4294967296.0) / (lit(1.0) + exp(-col("margin"))))
      val deduped = new ExactDeduplicator()
        .setIdCol("doc_id").setTextCol("text").setFingerprintCol("fingerprint")
        .transform(accepted)
      // margin rides through the packer (carryCols) — re-joining `margins`
      // here would inline the featurizer subtree a second time
      new TokenPacker().setIdCol("doc_id").setTextCol("text").setBudget(2048L)
        .setCarryCols(Array("margin"))
        .transform(deduped)
        .select(col("doc_id"), round(col("margin"), 6).as("margin"),
          col("n_tokens"), col("prefix_tokens"), col("chunk"))
    })
  )

  // shared fragments reproducing the q20 minhash pipeline for the oracle
  private val minhashPairsSql =
    s""", norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(translate(
      |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM base
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
      |), sizes AS (
      |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
      |), inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS i
      |  FROM cand c
      |  JOIN sh x ON x.doc_id = c.id_a
      |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id_a, id_b
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
      |)""".stripMargin

  // shared closure CTEs over the q20 pair graph (through `comps`) — the
  // connected-components ground truth consumed by q39 (min-label
  // propagation), q121 (star contraction), and q123 (keep-best selection)
  private val ccClustersCte =
    ("""WITH RECURSIVE base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 200000, text || ' graft near dup probe'
       |  FROM documents WHERE doc_id % 7 = 0
       |)""".stripMargin
      + minhashPairsSql +
      """, ed AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL
        |  SELECT id_b, id_a FROM pairs
        |), reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM base
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN ed e ON e.src = reach.id
        |), comps AS (
        |  SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id
        |)""".stripMargin)

  private val ccOracleSql =
    (ccClustersCte +
      """
        |SELECT doc_id, cluster FROM comps
        |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
        |SELECT -1, -1 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin)

  val oracles: Map[String, String] = Map(
    "q37_quality_filter" ->
      s"""WITH norm AS (
        |  SELECT doc_id, text, n_chars,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, text, n_chars, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
        |), scored AS (
        |  SELECT doc_id, n_chars,
        |    len(tl) AS n_tokens,
        |    (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text) AS punct,
        |    len(list_filter(tl, t -> list_contains(
        |      ['the', 'a', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'for'],
        |      t))) * 1.0 / len(tl) AS stop_ratio,
        |    list_sum(list_transform(tl, t -> length(t))) * 1.0 / len(tl) AS awl
        |  FROM toks
        |)
        |SELECT doc_id, n_chars FROM scored
        |WHERE n_tokens BETWEEN 40 AND 100000
        |  AND punct <= 0.2
        |  AND stop_ratio >= 0.0
        |  AND round((
        |    least(n_tokens / 100.0, 1.0) +
        |    greatest(0.0, 1.0 - punct * 4.0) +
        |    least(stop_ratio * 3.0, 1.0) +
        |    (CASE WHEN awl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
        |  ) / 4.0, 6) >= 0.5""".stripMargin,
    "q38_hash_split" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5('val:' || doc_id), 1, 8))::BIGINT % 100 AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5('val:' || doc_id), 1, 8))::BIGINT % 100 < 30""".stripMargin,
    "q39_dedup_clusters" -> ccOracleSql,
    // q39's components + the md5 cluster coin (identical float-free
    // integer arithmetic both engines); same shingle-bound guard row
    "q163_leakage_safe_split" ->
      (ccClustersCte +
        """
          |SELECT doc_id, cluster,
          |  CASE WHEN ('0x' || substr(md5('split:' || CAST(cluster AS VARCHAR)), 1, 8))::BIGINT % 100 < 90
          |    THEN 'train' ELSE 'valid' END AS split
          |FROM comps
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, '-1' WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin),
    // shared closure + the same size/savings rollup (keep = min doc_id)
    "q153_dedup_report" ->
      (ccClustersCte +
        """, sized AS (
          |  SELECT cluster, count(*) AS k,
          |    sum(length(text)) AS tot,
          |    min_by(length(text), doc_id) AS kept
          |  FROM comps JOIN base USING (doc_id)
          |  GROUP BY 1
          |)
          |SELECT k, count(*) AS n_clusters,
          |  CAST((k - 1) * count(*) AS BIGINT) AS docs_removable,
          |  CAST(sum(tot - kept) AS BIGINT) AS chars_saved
          |FROM sized GROUP BY k""".stripMargin),
    // clusters from the shared closure + the q50 quality formula, keep =
    // highest quality then lowest id (rounded to 6dp on both engines
    // BEFORE the argmax, so the comparison replays exactly)
    "q123_keep_best" ->
      (ccClustersCte +
        s""", tk AS (
          |  SELECT doc_id, text,
          |    list_filter(string_split(
          |      trim(regexp_replace(regexp_replace(translate(
          |        lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')),
          |      ' '), t -> t <> '') AS tl
          |  FROM base
          |), q AS (
          |  SELECT doc_id,
          |    round((
          |      least(len(tl) / 100.0, 1.0) +
          |      greatest(0.0, 1.0 - ((length(text) -
          |        length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
          |        * 1.0 / length(text)) * 4.0) +
          |      least(len(list_filter(tl, t -> list_contains(
          |        ['the', 'a', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'for'],
          |        t))) * 1.0 / len(tl) * 3.0, 1.0) +
          |      (CASE WHEN list_sum(list_transform(tl, t -> length(t))) * 1.0 / len(tl)
          |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
          |    ) / 4.0, 6) AS quality
          |  FROM tk
          |), ranked AS (
          |  SELECT comps.cluster, comps.doc_id, q.quality,
          |    row_number() OVER (PARTITION BY comps.cluster
          |      ORDER BY q.quality DESC, comps.doc_id) AS rn,
          |    count(*) OVER (PARTITION BY comps.cluster) AS members
          |  FROM comps JOIN q USING (doc_id)
          |)
          |SELECT cluster, doc_id AS keep_id, quality, members
          |FROM ranked WHERE rn = 1
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,700) shingle bound
          |SELECT -1, -1, -1.0, -1 WHERE (SELECT max(length(norm)) FROM norm) > 706""".stripMargin),
    // q121 runs a DIFFERENT distributed algorithm (star contraction) over
    // the same pair graph — one ground truth, two independent engines
    // AND two independent algorithms agreeing on every cluster label
    "q121_cc_star" -> ccOracleSql,
    "q50_curation_pipeline" ->
      s"""WITH norm AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, text, norm, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
        |), scored AS (
        |  SELECT doc_id, norm, tl,
        |    len(tl) AS n_tokens,
        |    (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text) AS punct,
        |    len(list_filter(tl, t -> list_contains(
        |      ['the', 'a', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'for'],
        |      t))) * 1.0 / len(tl) AS stop_ratio,
        |    list_sum(list_transform(tl, t -> length(t))) * 1.0 / len(tl) AS awl
        |  FROM toks
        |), kept AS (
        |  SELECT doc_id, norm, CAST(n_tokens AS BIGINT) AS n_tokens FROM scored
        |  WHERE n_tokens BETWEEN 40 AND 100000
        |    AND punct <= 0.2
        |    AND stop_ratio >= 0.0
        |    AND round((
        |      least(n_tokens / 100.0, 1.0) +
        |      greatest(0.0, 1.0 - punct * 4.0) +
        |      least(stop_ratio * 3.0, 1.0) +
        |      (CASE WHEN awl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
        |    ) / 4.0, 6) >= 0.5
        |), dedup AS (
        |  SELECT doc_id, n_tokens FROM kept
        |  QUALIFY row_number() OVER (PARTITION BY sha256(norm) ORDER BY doc_id) = 1
        |), train AS (
        |  SELECT doc_id, n_tokens FROM dedup
        |  WHERE ('0x' || substr(md5('val:' || doc_id), 1, 8))::BIGINT % 100 >= 30
        |), pref AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix_tokens
        |  FROM train
        |)
        |SELECT doc_id, n_tokens, prefix_tokens,
        |  CAST(floor(prefix_tokens / 2048.0) AS BIGINT) AS chunk
        |FROM pref""".stripMargin,
    "q51_mixture" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS c FROM documents GROUP BY 1
        |), t(lang, tgt) AS (
        |  VALUES ('en', 200), ('de', 50), ('fr', 50), ('es', 30), ('zh', 20)
        |), rates AS (
        |  -- full 2^32 coin resolution, mirroring MixtureSampler (a mod-1e4
        |  -- bucket floors any rate < 1e-4 to zero, dropping whole groups)
        |  SELECT counts.lang,
        |    CAST(floor(least(1.0, tgt * 1.0 / c) * 4294967296.0) AS BIGINT) AS thr
        |  FROM counts JOIN t ON counts.lang = t.lang
        |)
        |SELECT doc_id, d.lang AS lang
        |FROM documents d JOIN rates ON d.lang = rates.lang
        |WHERE ('0x' || substr(md5('mix:' || doc_id), 1, 8))::BIGINT < thr""".stripMargin,
    // replays the α=0.5 targets: sqrt is correctly rounded on both
    // engines, and the normalizer is a SEQUENTIAL in-lang-order fold
    // (list_reduce == the operator's sorted-array left-fold), so Z is
    // bit-identical. Division order mirrors the operator exactly.
    "q109_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS c FROM documents GROUP BY 1
        |), z AS (
        |  SELECT list_reduce(list(sqrt(CAST(c AS DOUBLE)) ORDER BY lang),
        |                     (a, b) -> a + b) AS z
        |  FROM counts
        |), thr AS (
        |  SELECT lang,
        |    CAST(floor(least(1.0, 250.0 * sqrt(CAST(c AS DOUBLE)) / z / c) * 4294967296.0)
        |      AS BIGINT) AS thr
        |  FROM counts, z
        |)
        |SELECT doc_id, d.lang AS lang
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |WHERE ('0x' || substr(md5('temp:' || doc_id), 1, 8))::BIGINT < thr""".stripMargin,
    "q58_stratified" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY md5('strat:' || doc_id)) <= 5""".stripMargin,
    "q59_tfidf" ->
      s"""WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
        |), tok AS (
        |  SELECT doc_id, unnest(tl) AS term FROM toks
        |), tc AS (
        |  SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS len FROM tc GROUP BY 1
        |), df AS (
        |  SELECT term, count(*) AS df FROM tc GROUP BY 1
        |), nd AS (
        |  SELECT count(*) AS n FROM documents
        |), scored AS (
        |  SELECT tc.doc_id, tc.term, c * 1.0 / len AS tf, df.df,
        |    (c * 1.0 / len) * ln((n + 1) * 1.0 / (df.df + 1)) AS tfidf
        |  FROM tc JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nd
        |)
        |SELECT doc_id, term, round(tf, 6) AS tf, CAST(df AS BIGINT) AS df,
        |  round(tfidf, 6) AS tfidf, CAST(rnk AS BIGINT) AS rnk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3""".stripMargin,
    "q68_weighted_sample" ->
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    (('0x' || substr(md5('wsample:' || doc_id), 1, 14))::BIGINT
        |      / 72057594037927936.0) / n_chars AS pri
        |  -- weight > 0 mirror of WeightedSampler (w <= 0 rows are excluded,
        |  -- not guaranteed-selected via NULL/negative priorities)
        |  FROM documents WHERE n_chars > 0)
        |ORDER BY pri, doc_id
        |LIMIT 100""".stripMargin,
    "q99_dsir" ->
      s"""WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS tok FROM norm
        |), base AS (
        |  SELECT tok, count(*) AS cb FROM tok GROUP BY 1
        |), tgt AS (
        |  SELECT tok, count(*) AS ct FROM tok WHERE doc_id % 31 = 0 GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT CAST(sum(cb) AS DOUBLE) FROM base) AS nb,
        |         (SELECT CAST(count(*) AS DOUBLE) FROM base) AS vb,
        |         (SELECT CAST(sum(ct) AS DOUBLE) FROM tgt) AS nt,
        |         (SELECT CAST(count(*) AS DOUBLE) FROM tgt) AS vt
        |), scored AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    avg(ln((coalesce(g.ct, 0) + 0.5) / (nt + vt * 0.5))
        |      - ln((b.cb + 0.5) / (nb + vb * 0.5))) AS score
        |  FROM tok t JOIN base b USING (tok) LEFT JOIN tgt g USING (tok)
        |  CROSS JOIN tot
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_tokens, round(score, 6) AS score,
        |  (('0x' || substring(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)::DOUBLE
        |    < 0.5 * exp(score) * 4294967296.0 AS kept
        |FROM scored""".stripMargin,
    // q50's skeleton with the hash split replaced by the q102 classifier
    // margin + sigmoid coin; the coin threshold is written with the same
    // float op order as the Spark plan (4294967296.0 / (1.0 + exp(-m)))
    "q104_classifier_curation" ->
      s"""WITH norm AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, text, norm, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
        |), scored AS (
        |  SELECT doc_id, norm, tl,
        |    len(tl) AS n_tokens,
        |    (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text) AS punct,
        |    len(list_filter(tl, t -> list_contains(
        |      ['the', 'a', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'for'],
        |      t))) * 1.0 / len(tl) AS stop_ratio,
        |    list_sum(list_transform(tl, t -> length(t))) * 1.0 / len(tl) AS awl
        |  FROM toks
        |), kept AS (
        |  SELECT doc_id, norm, tl, CAST(n_tokens AS BIGINT) AS n_tokens FROM scored
        |  WHERE n_tokens BETWEEN 40 AND 100000
        |    AND punct <= 0.2
        |    AND stop_ratio >= 0.0
        |    AND round((
        |      least(n_tokens / 100.0, 1.0) +
        |      greatest(0.0, 1.0 - punct * 4.0) +
        |      least(stop_ratio * 3.0, 1.0) +
        |      (CASE WHEN awl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
        |    ) / 4.0, 6) >= 0.5
        |), uni AS (
        |  SELECT doc_id, unnest(tl) AS gram FROM kept
        |), bi AS (
        |  SELECT doc_id, tl[CAST(i AS INT)] || ' ' || tl[CAST(i AS INT) + 1] AS gram
        |  FROM kept CROSS JOIN range(1, 256) t(i)
        |  WHERE i <= len(tl) - 1
        |), grams AS (
        |  SELECT * FROM uni UNION ALL SELECT * FROM bi
        |), feats AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5('hng:' || gram), 1, 8))::BIGINT % 4096 AS bucket,
        |    count(*) AS n
        |  FROM grams GROUP BY 1, 2
        |), m AS (
        |  SELECT doc_id, CAST(sum((bucket % 7 - 3) * n) AS DOUBLE) / 10.0 - 0.3 AS margin
        |  FROM feats GROUP BY 1
        |), coin AS (
        |  SELECT k.doc_id, k.norm, k.n_tokens, m.margin
        |  FROM kept k JOIN m USING (doc_id)
        |  WHERE (('0x' || substr(md5('clf:' || k.doc_id), 1, 8))::BIGINT)::DOUBLE
        |    < 4294967296.0 / (1.0 + exp(-m.margin))
        |), dedup AS (
        |  SELECT doc_id, n_tokens, margin FROM coin
        |  QUALIFY row_number() OVER (PARTITION BY sha256(norm) ORDER BY doc_id) = 1
        |), pref AS (
        |  SELECT doc_id, margin, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix_tokens
        |  FROM dedup
        |)
        |SELECT doc_id, round(margin, 6) AS margin, n_tokens, prefix_tokens,
        |  CAST(floor(prefix_tokens / 2048.0) AS BIGINT) AS chunk
        |FROM pref
        |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,256) bigram bound
        |SELECT -1, -1.0, count(*), 0, 0 FROM toks WHERE len(tl) > 256 HAVING count(*) > 0""".stripMargin
  )
}
