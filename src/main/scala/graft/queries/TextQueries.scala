package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Bm25, BpeTrainer, Chunker, ContaminationChecker, CorpusDiversity, EditDistanceJoin, FimTransform, LinkageField, LinkageScorer, PhraseMatcher, RepetitionStats, SequencePacker, SpanCorruption, TextFunctions, TextRedactor, TokenPacker, UnigramLM, VocabBuilder}

/** Text-analysis queries over the documents table, each mirrored by a
  * DuckDB oracle computing the identical formula.
  */
object TextQueries {

  // the oracle's whitespace map IS the engine's, by construction —
  // every normalize-chain replica below interpolates the one translate()
  // fragment (graft.dedup.TextNormalizer.sqlTranslateArgs), so Spark and
  // DuckDB whitespace sets can never drift
  private val WSMAP = graft.dedup.TextNormalizer.sqlTranslateArgs

  type Q = (SparkSession, String) => DataFrame

  // shared oracle prelude: normalization + token list per document
  private val normSql =
    s"""WITH norm AS (
      |  SELECT doc_id, text,
      |    trim(regexp_replace(regexp_replace(translate(
      |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, text, list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM norm
      |)""".stripMargin

  private val enList = TextFunctions.stopwords.toMap.apply("en")
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** q180's two retrieval legs — shared with PlanAuditSpec, which audits
    * the UNPINNED fusion of exactly these frames (the eager pin inside
    * fuse truncates lineage, so the per-query audit only sees the fusion
    * tail; the legs are audited through this door).
    */
  private[graft] def hybridLegs(s: SparkSession, dir: String)
      : Seq[(String, DataFrame)] = {
    val anchors = Seq(0L, 7L, 42L)
    val lex = new Bm25(k1 = 1.2, b = 0.75)
      .retrieve(Tables.documents(s, dir), Seq(
        "0" -> Seq("spark", "query", "join", "stream"),
        "7" -> Seq("hash", "merge", "sort", "group"),
        "42" -> Seq("vector", "window", "filter", "dup")), k = 20)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val vec = new graft.similarity.CosineTopK(20)
      .search(emb.where(col("vec_id").isin(anchors: _*)), emb)
      .select(col("query_id").cast("string").as("query_id"),
        col("vec_id").as("id"), col("rank"))
    Seq("lex" -> lex, "vec" -> vec)
  }

  val queries: Map[String, Q] = Map(
    // per-document statistics + composite quality score
    "q23_text_stats" -> ((s, dir) => {
      val t = col("text")
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(t).as("n_tokens"),
        round(TextFunctions.avgWordLength(t), 6).as("avg_word_len"),
        round(TextFunctions.punctRatio(t), 6).as("punct_ratio"),
        round(TextFunctions.stopwordRatio(t), 6).as("stopword_ratio"),
        TextFunctions.bpeTokenEstimate(t).cast("long").as("bpe_tokens"),
        TextFunctions.qualityScore(t).as("quality"))
    }),

    // heuristic language ID with per-language stopword hit counts
    "q30_lang_id" -> ((s, dir) => {
      val t = col("text")
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.stopwordHits(t, "en").as("en_hits"),
        TextFunctions.stopwordHits(t, "de").as("de_hits"),
        TextFunctions.stopwordHits(t, "fr").as("fr_hits"),
        TextFunctions.stopwordHits(t, "es").as("es_hits"),
        TextFunctions.languageId(t).as("lang_guess"))
    }),

    // order-sensitive rolling-hash fingerprint over the token stream
    "q31_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
    }),

    // Gopher-style repetition signals: duplicate-token ratio and
    // top-bigram dominance, computed as a distributed wordcount (never a
    // per-row O(n²) mode scan)
    "q45_repetition" -> ((s, dir) => {
      new RepetitionStats().setIdCol("doc_id").setTextCol("text")
        .transform(Tables.documents(s, dir))
    }),

    // token-budget chunking via the two-phase bucketed prefix sum (no
    // global single-partition window)
    "q48_token_pack" -> ((s, dir) => {
      new TokenPacker().setIdCol("doc_id").setTextCol("text").setBudget(4096L)
        .transform(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("prefix_tokens"), col("chunk"))
    }),

    // benchmark decontamination: distinct 5-gram overlap of every document
    // against a broadcast "benchmark" slice (doc_id % 97 == 0)
    "q49_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      new ContaminationChecker(n = 5)
        .check(docs, docs.where(col("doc_id") % 97 === 0))
    }),

    // PII scrubbing over a corpus with deterministic seeded emails/numbers
    // (the synthetic docs carry none of their own)
    "q60_redact" -> ((s, dir) => {
      val seeded = Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com or call 5551234567")))
            .otherwise(col("text")).as("text"))
      new TextRedactor().transform(seeded)
        .select(col("doc_id"), col("redacted"), col("n_redactions"))
    }),

    // language-ID quality: confusion counts of the heuristic guess vs the
    // corpus's ground-truth lang label
    "q61_lang_confusion" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.languageId(col("text")).as("lang_guess"))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
    }),

    // per-source distinct-token estimate via the KMV sketch aggregate
    // (custom TypedImperativeAggregate; k=64 longs of state per group)
    "q67_distinct_sketch" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"),
          explode(graft.dedup.TextNormalizer.tokens(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(graft.sql.functions.kMinValues(col("tok"), 64).as("kmv"))
        .select(col("source"),
          round(graft.sql.functions.kmvEstimate(col("kmv"), 64), 6).as("est_distinct"))
    }),

    // sliding-window chunking: 32-token chunks every 24 tokens (RAG /
    // training-sequence prepass; row-local fan-out, no shuffle)
    "q72_chunker" -> ((s, dir) => {
      new Chunker().setIdCol("doc_id").setTextCol("text")
        .setChunkSize(32).setStride(24)
        .transform(Tables.documents(s, dir))
    }),

    // Count-Min frequency sketch (depth 4 × width 1024 custom typed
    // aggregate) point-checked against the exact top-20 token counts
    "q74_cms_topk" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode_outer(graft.dedup.TextNormalizer.tokens(col("text"))).as("tok"))
      val sketch = toks.agg(graft.sql.functions.countMinSketch(col("tok"), 4, 1024).as("sk"))
      toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(20)
        .crossJoin(broadcast(sketch))
        .select(col("tok"), col("exact_n"),
          graft.sql.functions.cmsEstimate(col("sk"), col("tok"), 4, 1024).as("cms_n"))
    }),

    // unigram-LM scoring (CCNet-style quality gate): per-doc mean token
    // negative log-likelihood under the corpus's own smoothed unigram model
    "q76_unigram_lm" -> ((s, dir) => {
      new UnigramLM(alpha = 0.5).fitScore(Tables.documents(s, dir))
    }),

    // Okapi BM25 retrieval scoring against a fixed term set — broadcast
    // query terms prune the token stream before df aggregation
    "q78_bm25" -> ((s, dir) => {
      new Bm25(k1 = 1.2, b = 0.75)
        .score(Tables.documents(s, dir), Seq("spark", "query", "join", "stream"))
    }),

    // batch BM25 retrieval: top-10 docs for each of 3 query profiles in
    // ONE corpus pass (df/counts over the union of terms, tiny
    // (query, term) fan-out, two-phase per-query rank — no per-query
    // window sort)
    "q111_bm25_retrieval" -> ((s, dir) => {
      new Bm25(k1 = 1.2, b = 0.75)
        .retrieve(Tables.documents(s, dir), Seq(
          "q_engine" -> Seq("spark", "query", "join", "stream"),
          "q_exec" -> Seq("hash", "merge", "sort", "group"),
          "q_vector" -> Seq("vector", "window", "filter", "dup")), k = 10)
    }),

    // hybrid retrieval: the q111 BM25 term leg and the q21 cosine leg
    // fused by reciprocal-rank fusion — each query is a term profile
    // ANCHORED at a document (its embedding drives the vector leg; the
    // anchor itself is excluded there by CosineTopK's self-pair rule,
    // while the term leg may retrieve it — documented asymmetry, the
    // fusion sees both). Only integer RANKS cross the fusion boundary:
    // rrf = 1/(60+r_lex) + 1/(60+r_vec) added in fixed leg order, so the
    // fused doubles are bit-pinned given the legs' rank orders.
    "q180_hybrid_rrf" -> ((s, dir) =>
      graft.similarity.HybridRetriever.fuse(
        hybridLegs(s, dir), rrfK = 60, topK = 10)),

    // HyperLogLog distinct-token estimate per source: 2^10 one-byte
    // registers per group (merge = element-wise max) — the fixed-state
    // counterpart of q67's KMV sketch. md5-derived registers let the
    // oracle replay the sketch exactly; register values stay small enough
    // that the harmonic-mean estimate is bit-reproducible (see hllEstimate)
    "q80_hll" -> ((s, dir) => {
      val p = 10
      Tables.documents(s, dir)
        .select(col("source"),
          explode_outer(graft.dedup.TextNormalizer.tokens(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(graft.sql.functions.hllSketch(col("tok"), p).as("regs"))
        .select(col("source"),
          size(filter(col("regs"), r => r === lit(0))).as("zero_regs"),
          round(graft.sql.functions.hllEstimate(col("regs"), p), 6).as("est_distinct"))
    }),

    // mergeable-sketch rollup: sketch distinct tokens ONCE per
    // (source, lang), then roll up per source AND globally by MERGING
    // registers (element-wise max) — tokens are never rescanned for the
    // coarser scopes. The oracle computes every scope's sketch DIRECTLY
    // from the tokens, so the hash pins the merge identity itself:
    // merged sub-sketches must equal the direct sketch bit-for-bit.
    "q122_sketch_rollup" -> ((s, dir) => {
      val p = 10
      val sk = Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          explode_outer(graft.dedup.TextNormalizer.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("lang"))
        .agg(graft.sql.functions.hllSketch(col("tok"), p).as("regs"))
      val perSource = sk.groupBy(col("source"))
        .agg(graft.sql.functions.hllMerge(col("regs"), p).as("regs"))
      val global = sk.groupBy()
        .agg(graft.sql.functions.hllMerge(col("regs"), p).as("regs"))
        .select(lit("__all__").as("source"), col("regs"))
      perSource.unionByName(global)
        .select(col("source"),
          size(filter(col("regs"), r => r === lit(0))).as("zero_regs"),
          round(graft.sql.functions.hllEstimate(col("regs"), p), 6).as("est_distinct"))
    }),

    // mergeable bottom-k uniform sample (custom TypedImperativeAggregate,
    // k strings of state per group): per-source doc samples, global scope
    // by MERGING the per-source sketches (union + re-rank by the same md5
    // order) — the oracle samples every scope DIRECTLY, so the hash pins
    // the merge identity: merged samples == direct samples, bit-for-bit
    "q131_bottomk_sample" -> ((s, dir) => {
      val k = 8
      val sk = Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(graft.sql.functions.bottomKSample(
          col("doc_id").cast("string"), k).as("sample"))
      val global = sk.groupBy()
        .agg(graft.sql.functions.bottomKMerge(col("sample"), k).as("sample"))
        .select(lit("__all__").as("source"), col("sample"))
      sk.unionByName(global)
        .select(col("source"), posexplode(col("sample")))
        .select(col("source"), col("pos").cast("int").as("pos"),
          col("col").cast("long").as("doc_id"))
    }),

    // source-concentration (Herfindahl) per language: Σ share² over the
    // source mix — the "is this language dominated by one feed" number a
    // mixing plan checks before setting weights. Pure wordcount-shaped
    // aggregation, no ranks, no windows.
    "q157_source_hhi" -> ((s, dir) => {
      val bySrc = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      val byLang = bySrc.groupBy(col("lang"))
        .agg(sum(col("n")).cast("double").as("tot"),
          count(lit(1)).as("n_sources"))
      bySrc.join(byLang, "lang")
        .withColumn("sh", col("n").cast("double") / col("tot"))
        .groupBy(col("lang"))
        .agg(max(col("n_sources")).as("n_sources"),
          round(sum(col("sh") * col("sh")), 9).as("hhi"))
    }),

    // chi-squared independence test for the lang × source contingency
    // table (zero cells included via the margins cross): is the language
    // mix independent of the source feed — the categorical drift
    // companion to q117's PSI. All aggregation is wordcount-shaped; the
    // statistic folds over R×C tiny cells
    "q149_chi2" -> ((s, dir) => {
      val obs = Tables.documents(s, dir).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val rowT = obs.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
      val colT = obs.groupBy(col("source")).agg(sum(col("o")).as("ct"))
      val n = obs.agg(sum(col("o")).cast("double").as("nn"))
      val cells = rowT.crossJoin(colT)
        .join(obs, Seq("lang", "source"), "left")
        .withColumn("oo", coalesce(col("o"), lit(0L)).cast("double"))
        .crossJoin(broadcast(n))
        .withColumn("e",
          col("rt").cast("double") * col("ct").cast("double") / col("nn"))
        .withColumn("term",
          (col("oo") - col("e")) * (col("oo") - col("e")) / col("e"))
      val dims = obs.agg(count_distinct(col("lang")).as("r"),
        count_distinct(col("source")).as("c"))
      cells.agg(round(sum(col("term")), 6).as("chi2"))
        .crossJoin(broadcast(dims))
        .select(col("chi2"), ((col("r") - 1) * (col("c") - 1)).as("dof"))
    }),

    // Fellegi–Sunter record linkage: deletion-hash blocking (q88's edit
    // join) → per-field agreement weights (driver-computed constants, so
    // the distributed plan is pure codegen arithmetic) → match/possible/
    // non-match verdicts
    "q145_record_linkage" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val pairs = new EditDistanceJoin().pairs(cust, "c_name")
      val attrsA = cust.select(col("c_name").as("a"),
        col("c_nationkey").as("nat_a"), col("c_mktsegment").as("seg_a"),
        col("c_acctbal").as("bal_a"))
      val attrsB = cust.select(col("c_name").as("b"),
        col("c_nationkey").as("nat_b"), col("c_mktsegment").as("seg_b"),
        col("c_acctbal").as("bal_b"))
      new LinkageScorer(Seq(
        LinkageField(col("nat_a") === col("nat_b"), 0.9, 0.04),
        LinkageField(col("seg_a") === col("seg_b"), 0.8, 0.2),
        LinkageField(abs(col("bal_a") - col("bal_b")) <= 500.0, 0.7, 0.1)),
        upper = 6.0, lower = 0.0)
        .score(pairs.join(attrsA, "a").join(attrsB, "b"))
        .select(col("a"), col("b"), round(col("weight"), 6).as("weight"),
          col("verdict"))
    }),

    // blocklist gate: exact multi-phrase occurrence counts via k-gram
    // broadcast equi-joins (one explode per distinct phrase LENGTH, work
    // independent of list size) — never a per-row contains sweep
    "q143_blocklist" -> ((s, dir) => {
      new PhraseMatcher(Seq("table scan", "slow query", "hash join",
        "big table", "window", "sort merge join"))
        .counts(Tables.documents(s, dir))
    }),

    // pretraining document packing: concatenate the corpus token stream
    // in doc_id order, cut every 64 tokens, emit the (doc, sequence) span
    // table — pure prefix-sum arithmetic (two-phase PrefixSum, row-local
    // span explode); no token is ever materialized
    "q138_sequence_pack" -> ((s, dir) => {
      new SequencePacker(seqLen = 64)
        .spans(Tables.documents(s, dir))
    }),

    // weighted sample sketch (Efraimidis–Spirakis A-Res, custom typed
    // aggregate): per-lang samples weighted by n_chars, global scope by
    // re-keyed merge — the fixed-size mixture-weighted selection
    // primitive. The oracle ranks every scope directly by the same
    // -ln(u)/w key, pinning both the scheme and the merge identity.
    "q136_weighted_sample_sketch" -> ((s, dir) => {
      val k = 6
      val sk = Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(graft.sql.functions.weightedBottomK(
          col("doc_id").cast("string"), col("n_chars").cast("double"), k)
          .as("sample"))
      val global = sk.groupBy()
        .agg(graft.sql.functions.weightedBottomKMerge(col("sample"), k)
          .as("sample"))
        .select(lit("__all__").as("lang"), col("sample"))
      sk.unionByName(global)
        .select(col("lang"), posexplode(col("sample")))
        .select(col("lang"), col("pos").cast("int").as("pos"),
          col("col.v").cast("long").as("doc_id"), col("col.w").as("w"))
    }),

    // mergeable fixed-bin histogram quantiles: per-source n_chars
    // histograms (32 bins over [0, 640)), global scope by element-wise SUM
    // of the count arrays — p50/p90/p99 estimated by in-bin interpolation
    // at every scope without rescanning rows. The oracle recomputes each
    // scope's histogram and interpolation directly from the rows.
    "q133_hist_quantiles" -> ((s, dir) => {
      val hs = new graft.sql.HistogramSketch(0.0, 640.0, 32)
      val sk = hs.sketch(Tables.documents(s, dir), "source", "n_chars")
      val global = sk.groupBy().agg(hs.merge(col("hist")).as("hist"))
        .select(lit("__all__").as("source"), col("hist"))
      sk.unionByName(global)
        .select(col("source"),
          aggregate(col("hist"), lit(0L), (a, c) => a + c).as("n"),
          round(hs.quantile(col("hist"), 0.5), 9).as("p50"),
          round(hs.quantile(col("hist"), 0.9), 9).as("p90"),
          round(hs.quantile(col("hist"), 0.99), 9).as("p99"))
    }),

    // bigram collocation mining: top-20 bigrams by frequency with PMI —
    // two distributed wordcounts, then only the tiny top-k set (not the
    // vocabulary) broadcast-joins back to unigram counts. Bigrams come
    // from a row-local zip of adjacent tokens (no self-join); ordering is
    // by integer count + keys, never by the float score
    "q81_pmi" -> ((s, dir) => {
      val tl = Tables.documents(s, dir)
        .select(graft.dedup.TextNormalizer.tokens(col("text")).as("tl"))
      val uni = tl.select(explode_outer(col("tl")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val totals = uni.agg(sum(col("cw")).cast("double").as("n1"))
      val bgCounts = tl.select(explode_outer(
          graft.dedup.TextNormalizer.adjacentPairs(col("tl"))(
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .where(col("bg").isNotNull)
        .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("c_xy"))
      val n2 = bgCounts.agg(sum(col("c_xy")).cast("double").as("n2"))
      val top = bgCounts.orderBy(col("c_xy").desc, col("w1"), col("w2")).limit(20)
      broadcast(top)
        .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
        .crossJoin(broadcast(totals)).crossJoin(broadcast(n2))
        .select(col("w1"), col("w2"), col("c_xy"),
          round(log(col("c_xy") * col("n1") * col("n1") /
            (col("n2") * col("c1") * col("c2"))), 6).as("pmi"))
    }),

    // T5 span corruption: deterministic md5-coin masks per (salt, doc,
    // pos), contiguous masked runs collapse to numbered sentinels in the
    // input and reappear behind them (plus a terminal sentinel) in the
    // target — the denoising-pretraining pair as ONE row-local fold per
    // document, zero exchanges
    "q165_span_corruption" -> ((s, dir) =>
      SpanCorruption.corrupt(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        ratePercent = 15, salt = "span")
        .select(col("doc_id"), col("corrupted_input"), col("target"))),

    // fill-in-the-middle rearrangement (PSM): two md5-coin cut points per
    // selected doc, slice + one concat_ws — row-local, zero exchanges;
    // rate 50 exercises both the transformed and pass-through branches
    "q166_fim" -> ((s, dir) =>
      FimTransform.transform(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        ratePercent = 50, salt = "fim")
        .select(col("doc_id"), col("fim_text"), col("fim_applied"))),

    // coverage-bounded vocabulary (GatherEncoder's strict-< coverage scan
    // applied to tokens): smallest (count desc, term asc) prefix covering
    // 95% of token mass — no global window, no driver vocabulary
    "q85_vocab" -> ((s, dir) => {
      new VocabBuilder(cover = 0.95).vocab(Tables.documents(s, dir))
    }),

    // per-source diversity: token/type counts, type-token ratio, Shannon
    // entropy of the token distribution (+ normalized form)
    "q86_entropy" -> ((s, dir) => {
      new CorpusDiversity(groupCol = "source").stats(Tables.documents(s, dir))
    }),

    // edit-distance-1 entity pairs over distinct customer names via
    // deletion-neighborhood blocking (never the O(n²) cross join the
    // oracle runs)
    "q88_edit_join" -> ((s, dir) => {
      new EditDistanceJoin().pairs(Tables.customer(s, dir), "c_name")
    }),

    // edit-distance-≤2 pairs (depth-2 deletion neighborhoods) on a strided
    // name subset — k=2 fan-out is ~len²/2 variants, so the subset keeps
    // the demo honest while the oracle stays the naive cross join
    "q95_edit_join2" -> ((s, dir) => {
      new EditDistanceJoin(k = 2)
        .pairs(Tables.customer(s, dir).where(col("c_custkey") % 25 === 0), "c_name")
    }),

    // CCNet-style perplexity bucketing: per-language nll tertiles over the
    // corpus's own unigram LM — the head/middle/tail split used to mix
    // pretraining data by quality. A window partitioned by lang would sort
    // the dominant language's whole corpus in ONE task, so the tertile is
    // a two-phase grouped ntile (GroupedNtile: value-bucketed parallel
    // ranks + row-local tile closed form); ties broken by doc_id so the
    // assignment is deterministic and identical to the oracle's ntile
    "q96_ccnet_buckets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = new UnigramLM(alpha = 0.5).fitScore(docs)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      graft.sql.GroupedNtile
        .ntile(scored, 3, "lang", "avg_nll", Seq(col("doc_id")), "bucket")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("avg_nll")), 6).as("mean_nll"))
    }),

    // distributed BPE tokenizer training: 10 merge rounds over the corpus's
    // distinct-word table — each round is one pair-count shuffle + a
    // single-row driver argmax. The oracle replays ALL TEN rounds as
    // unrolled CTE stages (greedy merge = leftmost non-overlapping string
    // replace on double-space-delimited symbols), so the whole iterative
    // training loop is hash-verified
    "q97_bpe" -> ((s, dir) => {
      new BpeTrainer(numMerges = 10).fit(Tables.documents(s, dir))
    }),

    // interpolated bigram LM (Jelinek-Mercer): per-doc mean nll under
    // lambda·P(w|prev) + (1-lambda)·P_uni(w) — the perplexity-filter
    // upgrade when unigram scores saturate. First token of each doc is
    // excluded (no predecessor), deterministically on both sides
    "q100_bigram_lm" -> ((s, dir) => {
      new graft.text.BigramLM(lambda = 0.7, alpha = 0.5)
        .fitScore(Tables.documents(s, dir))
    }),

    // fastText-style hashing-trick features (unigrams + bigrams →
    // md5-bucket counts): the quality-classifier front-end, in long
    // format so the oracle replays the hash arithmetic exactly
    "q101_hashed_features" -> ((s, dir) => {
      new graft.text.HashedNgramFeaturizer(dim = 4096)
        .features(Tables.documents(s, dir))
    }),

    // quality-classifier SCORING end-to-end: hashed features → linear
    // margin → sigmoid → keep decision. Weights are a deterministic
    // integer function of the bucket ((bucket % 7) - 3), so the margin
    // sum is EXACT integer arithmetic on both engines before the one
    // float division — the q41 fixed-coefficient pattern applied to the
    // hashing-trick pipeline
    "q102_quality_classifier" -> ((s, dir) => {
      val margins = new graft.text.HashedNgramFeaturizer(dim = 4096)
        .features(Tables.documents(s, dir))
        .groupBy(col("doc_id"))
        .agg(sum((col("bucket") % 7 - 3) * col("n")).as("m"))
        .select(col("doc_id"), (col("m") / 10.0 - 0.3).as("margin"))
      margins.select(col("doc_id"),
        round(col("margin"), 6).as("margin"),
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6).as("prob"),
        (col("margin") > 0).as("kept"))
    }),

    // REAL-tokenizer shard packing: segment the corpus against the
    // committed 64-merge BPE fixture (64 > segmentExprMerges, so this is
    // the broadcast rank-priority encoder — the vocabulary-scale serving
    // path), count actual subwords per doc, and budget TokenPacker on
    // those counts instead of TextFunctions' regex estimate. q48
    // (estimate packing) and q97 (BPE training) were both green but never
    // met; production shard packing budgets on the real tokenizer.
    "q168_bpe_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = s.read.parquet(Goldens.path("q168_bpe") + "/merges")
      val counts = new BpeTrainer().segment(docs, merges)
        .groupBy(col("doc_id"))
        .agg(sum(size(col("subwords"))).as("bpe_tokens"))
      val counted = docs.select(col("doc_id"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
      new TokenPacker().setIdCol("doc_id").setTokensCol("bpe_tokens")
        .setBudget(2048L).transform(counted)
        .select(col("doc_id"), col("n_tokens"), col("prefix_tokens"), col("chunk"))
    }),

    // the loader-facing half of real-tokenizer packing: the same
    // committed-fixture BPE subword counts drive SequencePacker's span
    // table — which token range of which document lands in which
    // fixed-length training sequence (q138's arithmetic on REAL counts)
    "q169_bpe_seq_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = s.read.parquet(Goldens.path("q168_bpe") + "/merges")
      val counts = new BpeTrainer().segment(docs, merges)
        .groupBy(col("doc_id"))
        .agg(sum(size(col("subwords"))).as("bpe_tokens"))
      val counted = docs.select(col("doc_id"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("bpe_tokens"), lit(0L)).as("n_tokens"))
      new SequencePacker(seqLen = 128L).spansOnCounts(counted)
    })
  )

  /** Unrolled k-stage BPE oracle. Symbols ride as a double-space-delimited
    * string ("  h  u  g  "); a merge is `replace(' l  r ', ' lr ')`, whose
    * leftmost-non-overlapping scan (each boundary contributes one space to
    * each side, so consecutive merges don't starve each other of
    * separators) equals the trainer's greedy left-to-right fold. Each
    * stage: re-split, count adjacent pairs weighted by word count, argmax
    * with (n desc, l, r) ties — identical to the Spark loop.
    */
  private def bpeOracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb.append(normSql)
    sb.append("""
      |, tok AS (SELECT unnest(tl) AS word FROM toks)
      |, w0 AS (
      |  SELECT word, count(*) AS cnt,
      |    '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS syms
      |  FROM tok WHERE length(word) > 0 GROUP BY word
      |)""".stripMargin)
    for (i <- 0 until k) {
      sb.append(s"""
        |, sl$i AS (
        |  SELECT cnt, list_filter(string_split(syms, '  '), x -> x <> '') AS sl
        |  FROM w$i
        |), pr$i AS (
        |  SELECT sl[CAST(j AS INT)] AS l, sl[CAST(j AS INT) + 1] AS r,
        |    CAST(sum(cnt) AS BIGINT) AS n
        |  FROM sl$i CROSS JOIN range(1, 64) t(j)
        |  WHERE j <= len(sl) - 1
        |  GROUP BY 1, 2
        |), m$i AS (
        |  SELECT l, r, n FROM pr$i ORDER BY n DESC, l, r LIMIT 1
        |)""".stripMargin)
      if (i < k - 1) sb.append(s"""
        |, w${i + 1} AS (
        |  SELECT word, cnt,
        |    replace(syms, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ') AS syms
        |  FROM w$i CROSS JOIN m$i m
        |)""".stripMargin)
    }
    sb.append("\nSELECT * FROM (\n")
    sb.append((0 until k).map(i =>
      s"""SELECT CAST(${i + 1} AS BIGINT) AS "rank", l AS "left", r AS "right",
         |  l || r AS merged, n AS pair_count FROM m$i""".stripMargin)
      .mkString("\nUNION ALL\n"))
    sb.append("\n)\nUNION ALL -- guard: loud mismatch if a word outgrows the range(1,64) pair bound\n")
    sb.append("SELECT -1, '', '', '', -1 WHERE (SELECT max(len(string_split(word, ''))) FROM w0) > 64")
    sb.toString
  }

  private def hitSql(lang: String): String = {
    val list = TextFunctions.stopwords.toMap.apply(lang)
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(tl, t -> list_contains($list, t)))"
  }

  /** Unrolled k-stage segment-and-pack oracle against the COMMITTED
    * q168_bpe merge fixture: apply the fixture's merges in rank order to
    * the distinct-word table (the same double-space replace mechanism as
    * [[bpeOracleSql]] — rank-order folding equals the engine's
    * rank-priority encoder for a trained table, pinned by
    * BpeTrainerSpec), sum subwords per doc over word INSTANCES, then
    * replay TokenPacker's exclusive-prefix chunking. A missing rank
    * (early-stopped training) replaces chr(1) — a no-op on both engines.
    */
  /** Shared CTE chain for the q168/q169 fixture-BPE compositions:
    * normalize → distinct words → k unrolled rank-order merge stages
    * against the committed merge table → per-doc REAL subword counts
    * (`cnt`). Ends with `cnt`, callers append their pack/span tail.
    */
  private def bpeCntCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(normSql)
    sb.append(s"""
      |, mt AS (
      |  SELECT "rank", "left", "right"
      |  FROM read_parquet('${Goldens.path("q168_bpe")}/merges/*.parquet')
      |), tok AS (SELECT doc_id, unnest(tl) AS word FROM toks)
      |, s0 AS (
      |  SELECT DISTINCT word,
      |    '  ' || array_to_string(string_split(word, ''), '  ') || '  ' AS syms
      |  FROM tok WHERE length(word) > 0
      |)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s"""
        |, s$i AS (
        |  SELECT word, replace(syms,
        |    coalesce((SELECT ' ' || "left" || '  ' || "right" || ' ' FROM mt WHERE "rank" = $i), chr(1)),
        |    coalesce((SELECT ' ' || "left" || "right" || ' ' FROM mt WHERE "rank" = $i), chr(1))) AS syms
        |  FROM s${i - 1}
        |)""".stripMargin)
    }
    sb.append(s"""
      |, seg AS (
      |  SELECT word,
      |    CAST(len(list_filter(string_split(syms, '  '), x -> x <> '')) AS BIGINT) AS n_sub
      |  FROM s$k
      |), cnt AS (
      |  SELECT d.doc_id, CAST(coalesce(sum(seg.n_sub), 0) AS BIGINT) AS n_tokens
      |  FROM documents d
      |  LEFT JOIN tok ON tok.doc_id = d.doc_id
      |  LEFT JOIN seg ON seg.word = tok.word
      |  GROUP BY d.doc_id
      |)""".stripMargin)
    sb.toString
  }

  private def bpePackOracleSql(k: Int, budget: Long): String =
    bpeCntCtes(k) + s"""
      |, pref AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS prefix_tokens
      |  FROM cnt
      |)
      |SELECT doc_id, n_tokens, prefix_tokens,
      |  CAST(floor(prefix_tokens / $budget.0) AS BIGINT) AS chunk
      |FROM pref
      |UNION ALL -- guard: loud mismatch if the fixture outgrows the replayed ranks
      |SELECT -1, -1, -1, -1 WHERE (SELECT max("rank") FROM mt) > $k""".stripMargin

  /** q169 tail: [[graft.text.SequencePacker]] span arithmetic over the
    * REAL subword counts (the q138 replay with `cnt` swapped in).
    */
  private def bpeSeqPackOracleSql(k: Int, seqLen: Long): String =
    bpeCntCtes(k) + s"""
      |, pre AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS start
      |  FROM cnt
      |), nz AS (SELECT * FROM pre WHERE n_tokens > 0),
      |spans AS (
      |  SELECT doc_id, n_tokens, start,
      |    unnest(generate_series(start // $seqLen, (start + n_tokens - 1) // $seqLen))
      |      AS seq_id
      |  FROM nz
      |)
      |SELECT doc_id, n_tokens, seq_id,
      |  greatest(start, seq_id * $seqLen) - seq_id * $seqLen AS seq_off,
      |  greatest(start, seq_id * $seqLen) - start AS doc_off,
      |  least(start + n_tokens, (seq_id + 1) * $seqLen)
      |    - greatest(start, seq_id * $seqLen) AS len
      |FROM spans
      |UNION ALL -- guard: loud mismatch if the fixture outgrows the replayed ranks
      |SELECT -1, -1, -1, -1, -1, -1 WHERE (SELECT max("rank") FROM mt) > $k""".stripMargin

  val oracles: Map[String, String] = Map(
    // same md5 coins (selection + two boundary draws), list_slice + list
    // concatenation + array_to_string — byte-identical PSM strings
    "q166_fim" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS tl
        |  FROM documents
        |), coins AS (
        |  SELECT doc_id, tl,
        |    ('0x' || substr(md5('fim:' || CAST(doc_id AS VARCHAR) || ':sel'), 1, 8))::BIGINT % 100 < 50 AS applied,
        |    ('0x' || substr(md5('fim:' || CAST(doc_id AS VARCHAR) || ':a'), 1, 8))::BIGINT % (len(tl) + 1) AS ca,
        |    ('0x' || substr(md5('fim:' || CAST(doc_id AS VARCHAR) || ':b'), 1, 8))::BIGINT % (len(tl) + 1) AS cb
        |  FROM toks
        |), cuts AS (
        |  SELECT doc_id, tl, applied,
        |    CAST(least(ca, cb) AS INT) AS c1, CAST(greatest(ca, cb) AS INT) AS c2
        |  FROM coins
        |)
        |SELECT doc_id,
        |  CASE WHEN applied THEN array_to_string(
        |    ['<fim_prefix>'] || list_slice(tl, 1, c1)
        |      || ['<fim_suffix>'] || list_slice(tl, c2 + 1, len(tl))
        |      || ['<fim_middle>'] || list_slice(tl, c1 + 1, c2), ' ')
        |  ELSE array_to_string(tl, ' ') END AS fim_text,
        |  applied AS fim_applied
        |FROM cuts""".stripMargin,

    // window-based replay of the row-local fold: same md5 coin (q38's
    // integer idiom), lag() finds span starts, a running count numbers
    // them, string_agg in position order rebuilds both strings; the LEFT
    // JOIN restores zero-token documents ('' / bare terminal sentinel)
    "q165_span_corruption" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS tl
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, CAST(i AS INT) - 1 AS p, tl[CAST(i AS INT)] AS tok
        |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(tl) + 1)) AS i) t
        |), flag AS (
        |  SELECT doc_id, p, tok,
        |    (('0x' || substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'
        |       || CAST(p AS VARCHAR)), 1, 8))::BIGINT % 100 < 15) AS m
        |  FROM pos
        |), marked AS (
        |  SELECT doc_id, p, tok, m,
        |    (m AND NOT coalesce(lag(m) OVER (PARTITION BY doc_id ORDER BY p), false)) AS st
        |  FROM flag
        |), sp AS (
        |  SELECT doc_id, p, tok, m, st,
        |    CAST(sum(CASE WHEN st THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p) AS INT) - 1 AS sid
        |  FROM marked
        |), agg AS (
        |  SELECT doc_id,
        |    string_agg(CASE WHEN NOT m THEN tok
        |                    WHEN st THEN '<extra_id_' || sid || '>' END,
        |               ' ' ORDER BY p) AS inp,
        |    string_agg(CASE WHEN st THEN '<extra_id_' || sid || '> ' || tok
        |                    WHEN m THEN tok END,
        |               ' ' ORDER BY p) AS tgt,
        |    CAST(sum(CASE WHEN st THEN 1 ELSE 0 END) AS INT) AS nsp
        |  FROM sp GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  coalesce(a.inp, '') AS corrupted_input,
        |  CASE WHEN coalesce(a.tgt, '') = ''
        |    THEN '<extra_id_' || coalesce(a.nsp, 0) || '>'
        |    ELSE a.tgt || ' <extra_id_' || a.nsp || '>' END AS target
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "q23_text_stats" ->
      (normSql +
        s"""
           |SELECT doc_id,
           |  len(tl) AS n_tokens,
           |  round(list_sum(list_transform(tl, t -> length(t))) * 1.0 / len(tl), 6) AS avg_word_len,
           |  round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
           |    * 1.0 / length(text), 6) AS punct_ratio,
           |  round(${hitSql("en")} * 1.0 / len(tl), 6) AS stopword_ratio,
           |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
           |  round((
           |    least(len(tl) / 100.0, 1.0) +
           |    greatest(0.0, 1.0 - ((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
           |      * 1.0 / length(text)) * 4.0) +
           |    least((${hitSql("en")} * 1.0 / len(tl)) * 3.0, 1.0) +
           |    (CASE WHEN (list_sum(list_transform(tl, t -> length(t))) * 1.0 / len(tl))
           |      BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
           |  ) / 4.0, 6) AS quality
           |FROM toks""".stripMargin),
    "q30_lang_id" ->
      (normSql +
        s"""
           |, hits AS (
           |  SELECT doc_id,
           |    ${hitSql("en")} AS en_hits,
           |    ${hitSql("de")} AS de_hits,
           |    ${hitSql("fr")} AS fr_hits,
           |    ${hitSql("es")} AS es_hits
           |  FROM toks
           |)
           |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
           |  CASE
           |    WHEN en_hits > 0 AND en_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'en'
           |    WHEN de_hits > 0 AND de_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'de'
           |    WHEN fr_hits > 0 AND fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'fr'
           |    WHEN es_hits > 0 AND es_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'es'
           |    ELSE 'und'
           |  END AS lang_guess
           |FROM hits""".stripMargin),
    "q31_fingerprint" ->
      (normSql +
        """
          |SELECT doc_id,
          |  list_reduce(
          |    list_concat([CAST(0 AS BIGINT)],
          |      list_transform(tl, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
          |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
          |FROM toks""".stripMargin),
    "q45_repetition" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT doc_id, unnest(tl) AS tok FROM toks
          |), ts AS (
          |  SELECT doc_id, count(*) AS n_tokens,
          |         count(DISTINCT tok) AS n_distinct_tokens
          |  FROM tok GROUP BY 1
          |), bg AS (
          |  SELECT doc_id,
          |    array_to_string(list_slice(tl, CAST(i AS INT), CAST(i AS INT) + 1), ' ') AS b
          |  FROM toks CROSS JOIN range(1, 200) t(i)
          |  WHERE i <= len(tl) - 1
          |), bc AS (
          |  SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
          |), bs AS (
          |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count,
          |         CAST(sum(c) AS BIGINT) AS n_bigrams
          |  FROM bc GROUP BY 1
          |)
          |SELECT ts.doc_id, n_tokens, n_distinct_tokens,
          |  round(1.0 - n_distinct_tokens * 1.0 / n_tokens, 6) AS dup_token_ratio,
          |  coalesce(top_bigram_count, 0) AS top_bigram_count,
          |  coalesce(n_bigrams, 0) AS n_bigrams,
          |  round(coalesce(top_bigram_count * 1.0 / n_bigrams, 0), 6) AS top_bigram_frac
          |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,200) token bound
          |SELECT -1, -1, -1, -1.0, -1, -1, -1.0
          |  WHERE (SELECT max(len(tl)) FROM toks) > 200""".stripMargin),
    "q48_token_pack" ->
      (normSql +
        """
          |, counted AS (
          |  SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_tokens FROM toks
          |), pref AS (
          |  SELECT doc_id, n_tokens,
          |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |      AS prefix_tokens
          |  FROM counted
          |)
          |SELECT doc_id, n_tokens, prefix_tokens,
          |  CAST(floor(prefix_tokens / 4096.0) AS BIGINT) AS chunk
          |FROM pref""".stripMargin),
    "q49_contamination" ->
      (normSql +
        """
          |, dg AS (
          |  SELECT DISTINCT doc_id,
          |    array_to_string(list_slice(tl, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS gram
          |  FROM toks CROSS JOIN range(1, 200) t(i)
          |  WHERE len(tl) >= 5 AND i <= len(tl) - 4
          |), bg AS (
          |  SELECT DISTINCT gram FROM dg WHERE doc_id % 97 = 0
          |), counts AS (
          |  SELECT dg.doc_id, count(*) AS n_grams,
          |    CAST(sum(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          |      AS hit_grams
          |  FROM dg LEFT JOIN bg ON dg.gram = bg.gram
          |  GROUP BY dg.doc_id
          |)
          |SELECT n.doc_id,
          |  coalesce(n_grams, 0) AS n_grams,
          |  coalesce(hit_grams, 0) AS hit_grams,
          |  round(coalesce(hit_grams * 1.0 / n_grams, 0), 6) AS overlap_ratio
          |FROM norm n LEFT JOIN counts ON n.doc_id = counts.doc_id
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,200) token bound
          |SELECT -1, -1, -1, -1.0 WHERE (SELECT max(len(tl)) FROM toks) > 204""".stripMargin),
    "q60_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[^ ]+"
      val num = "[0-9]{6,}"
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN text || ' contact user' || doc_id || '@example.com or call 5551234567'
         |      ELSE text END AS text
         |  FROM documents
         |), r1 AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '$email', '<email>', 'g') AS t1
         |  FROM seeded
         |), r2 AS (
         |  SELECT doc_id, text, t1,
         |    regexp_replace(t1, '$url', '<url>', 'g') AS t2
         |  FROM r1
         |)
         |SELECT doc_id,
         |  regexp_replace(t2, '$num', '<num>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(text, '$email'))
         |    + len(regexp_extract_all(t1, '$url'))
         |    + len(regexp_extract_all(t2, '$num')) AS BIGINT) AS n_redactions
         |FROM r2""".stripMargin
    },
    "q61_lang_confusion" ->
      (normSql +
        s"""
           |, hits AS (
           |  SELECT n.lang, ${hitSql("en")} AS en_hits, ${hitSql("de")} AS de_hits,
           |    ${hitSql("fr")} AS fr_hits, ${hitSql("es")} AS es_hits
           |  FROM toks JOIN (SELECT doc_id, lang FROM documents) n USING (doc_id)
           |)
           |SELECT lang,
           |  CASE
           |    WHEN en_hits > 0 AND en_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'en'
           |    WHEN de_hits > 0 AND de_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'de'
           |    WHEN fr_hits > 0 AND fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'fr'
           |    WHEN es_hits > 0 AND es_hits = greatest(en_hits, de_hits, fr_hits, es_hits) THEN 'es'
           |    ELSE 'und'
           |  END AS lang_guess,
           |  count(*) AS n
           |FROM hits GROUP BY 1, 2""".stripMargin),
    "q72_chunker" ->
      (normSql +
        """
          |SELECT doc_id, CAST(i AS INT) AS chunk_id,
          |  array_to_string(list_slice(tl, CAST(i*24+1 AS INT), CAST(i*24+32 AS INT)), ' ') AS chunk_text,
          |  CAST(least(32, len(tl) - i*24) AS BIGINT) AS chunk_tokens
          |FROM toks CROSS JOIN range(0, 32) t(i)
          |WHERE i <= ceil(greatest(len(tl) - 32, 0) / 24.0)
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(0,32) chunk bound
          |SELECT -1, -1, '', -1 WHERE (SELECT max(len(tl)) FROM toks) > 776""".stripMargin),
    "q74_cms_topk" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT unnest(tl) AS tok FROM toks
          |), counts AS (
          |  SELECT tok, count(*) AS exact_n FROM tok GROUP BY 1
          |), top AS (
          |  SELECT tok, exact_n FROM counts ORDER BY exact_n DESC, tok LIMIT 20
          |), buckets AS (
          |  SELECT j, ('0x' || substr(md5(j::VARCHAR || ':' || tok), 1, 14))::BIGINT % 1024 AS b,
          |    count(*) AS c
          |  FROM tok CROSS JOIN range(0, 4) t(j) GROUP BY 1, 2
          |)
          |SELECT top.tok, top.exact_n, CAST(min(bk.c) AS BIGINT) AS cms_n
          |FROM top CROSS JOIN range(0, 4) r(j)
          |JOIN buckets bk ON bk.j = r.j
          |  AND bk.b = ('0x' || substr(md5(r.j::VARCHAR || ':' || top.tok), 1, 14))::BIGINT % 1024
          |GROUP BY 1, 2""".stripMargin),
    "q76_unigram_lm" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT doc_id, unnest(tl) AS tok FROM toks
          |), counts AS (
          |  SELECT tok, count(*) AS c FROM tok GROUP BY 1
          |), tot AS (
          |  SELECT CAST(sum(c) AS DOUBLE) AS n_total, CAST(count(*) AS DOUBLE) AS v_size
          |  FROM counts
          |)
          |SELECT doc_id, count(*) AS n_tokens,
          |  round(avg(-ln((c + 0.5) / (n_total + 0.5 * v_size))), 6) AS avg_nll
          |FROM tok JOIN counts USING (tok) CROSS JOIN tot
          |GROUP BY doc_id""".stripMargin),
    "q80_hll" ->
      s"""WITH nrm AS (
        |  SELECT source,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), tok AS (
        |  SELECT source, unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS tok FROM nrm
        |), hd AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(tok), 1, 14))::BIGINT AS hv FROM tok
        |), rr AS (
        |  SELECT source, hv >> 46 AS reg,
        |    CASE WHEN (hv & ((1::BIGINT << 46) - 1)) = 0 THEN 47
        |         ELSE 47 - length(format('{:b}', hv & ((1::BIGINT << 46) - 1))) END AS rho
        |  FROM hd
        |), regs AS (
        |  SELECT source, reg, max(rho) AS mj FROM rr GROUP BY 1, 2
        |), st AS (
        |  SELECT source,
        |    sum(pow(2.0, -mj)) + (1024 - count(*)) AS harm,
        |    1024 - count(*) AS zero_regs
        |  FROM regs GROUP BY 1
        |)
        |SELECT source, CAST(zero_regs AS INT) AS zero_regs,
        |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm <= 2560.0
        |              AND zero_regs > 0
        |    THEN 1024.0 * ln(1024.0 / zero_regs)
        |    ELSE 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm END, 6) AS est_distinct
        |FROM st""".stripMargin,
    // every scope's registers derived DIRECTLY from the token hashes (the
    // q80 replay) — the Spark side must arrive at identical registers by
    // every scope sampled DIRECTLY (distinct doc_ids ranked by the same
    // 56-bit md5 order) — equality with the Spark side's merged sketches
    // pins the bottom-k merge identity
    "q131_bottomk_sample" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS hv
        |  FROM documents
        |), ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY hv, CAST(doc_id AS VARCHAR)) AS rn
        |  FROM h
        |), g AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY hv, CAST(doc_id AS VARCHAR)) AS rn
        |  FROM (SELECT DISTINCT doc_id, hv FROM h)
        |)
        |SELECT source, CAST(rn - 1 AS INT) AS pos, doc_id FROM ranked
        |WHERE rn <= 8
        |UNION ALL
        |SELECT '__all__' AS source, CAST(rn - 1 AS INT) AS pos, doc_id FROM g
        |WHERE rn <= 8""".stripMargin,
    "q157_source_hhi" ->
      """WITH bs AS (
        |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
        |), bl AS (
        |  SELECT lang, CAST(sum(n) AS DOUBLE) AS tot, count(*) AS n_sources
        |  FROM bs GROUP BY 1
        |)
        |SELECT lang, max(n_sources) AS n_sources,
        |  round(sum((CAST(n AS DOUBLE) / tot) * (CAST(n AS DOUBLE) / tot)), 9)
        |    AS hhi
        |FROM bs JOIN bl USING (lang)
        |GROUP BY lang""".stripMargin,
    // same margins-cross cell set (zero cells contribute e) and formula
    "q149_chi2" ->
      """WITH obs AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2
        |), rt AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS DOUBLE) AS nn FROM obs),
        |cells AS (
        |  SELECT rt.lang, ct.source,
        |    CAST(coalesce(o, 0) AS DOUBLE) AS oo,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / nn AS e
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
        |  CROSS JOIN n
        |), dims AS (
        |  SELECT count(DISTINCT lang) AS r, count(DISTINCT source) AS c
        |  FROM obs
        |)
        |SELECT round(sum((oo - e) * (oo - e) / e), 6) AS chi2,
        |  (SELECT (r - 1) * (c - 1) FROM dims) AS dof
        |FROM cells""".stripMargin,
    // q88's exact pair set + the SAME driver-computed weight literals
    // (Double.toString round-trips, so DuckDB parses identical doubles —
    // no libm in either engine's scoring path)
    "q145_record_linkage" -> {
      val f1 = LinkageField(lit(true), 0.9, 0.04)
      val f2 = LinkageField(lit(true), 0.8, 0.2)
      val f3 = LinkageField(lit(true), 0.7, 0.1)
      s"""WITH n AS (SELECT DISTINCT c_name AS s FROM customer),
        |p AS (
        |  SELECT a.s AS a, b.s AS b
        |  FROM n a JOIN n b
        |    ON a.s < b.s
        |   AND abs(length(a.s) - length(b.s)) <= 1
        |   AND levenshtein(a.s, b.s) = 1
        |), j AS (
        |  SELECT p.a, p.b,
        |    (CASE WHEN ca.c_nationkey = cb.c_nationkey
        |       THEN CAST(${f1.wAgree} AS DOUBLE)
        |       ELSE CAST(${f1.wDisagree} AS DOUBLE) END
        |     + CASE WHEN ca.c_mktsegment = cb.c_mktsegment
        |       THEN CAST(${f2.wAgree} AS DOUBLE)
        |       ELSE CAST(${f2.wDisagree} AS DOUBLE) END)
        |     + CASE WHEN abs(ca.c_acctbal - cb.c_acctbal) <= 500.0
        |       THEN CAST(${f3.wAgree} AS DOUBLE)
        |       ELSE CAST(${f3.wDisagree} AS DOUBLE) END AS weight
        |  FROM p
        |  JOIN customer ca ON ca.c_name = p.a
        |  JOIN customer cb ON cb.c_name = p.b
        |)
        |SELECT a, b, round(weight, 6) AS weight,
        |  CASE WHEN weight >= 6.0 THEN 'match'
        |       WHEN weight >= 0.0 THEN 'possible'
        |       ELSE 'non_match' END AS verdict
        |FROM j""".stripMargin
    },
    // k-gram streams per phrase length replayed with list indexing
    "q143_blocklist" ->
      s"""WITH nrm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS tl
        |  FROM nrm
        |), g1 AS (
        |  SELECT doc_id, 1 AS k, unnest(tl) AS gram FROM toks
        |), g2 AS (
        |  SELECT doc_id, 2 AS k, tl[i] || ' ' || tl[i + 1] AS gram
        |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(tl))) AS i) t
        |), g3 AS (
        |  SELECT doc_id, 3 AS k, tl[i] || ' ' || tl[i + 1] || ' ' || tl[i + 2] AS gram
        |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(tl) - 1)) AS i) t
        |), p(gram, k) AS (
        |  VALUES ('table scan', 2), ('slow query', 2), ('hash join', 2),
        |    ('big table', 2), ('window', 1), ('sort merge join', 3)
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_hits, count(DISTINCT g.gram) AS n_phrases
        |  FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2
        |        UNION ALL SELECT * FROM g3) g
        |  JOIN p ON g.gram = p.gram AND g.k = p.k
        |  GROUP BY 1
        |)
        |SELECT d.doc_id, coalesce(n_hits, 0) AS n_hits,
        |  coalesce(n_phrases, 0) AS n_phrases
        |FROM documents d LEFT JOIN hits USING (doc_id)""".stripMargin,
    // the same packing arithmetic over a plain ordered window (the oracle
    // is allowed the single-task luxury the Spark side is not)
    "q138_sequence_pack" ->
      s"""WITH nrm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), cnt AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(norm, ' '), t -> t <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM nrm
        |), pre AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start
        |  FROM cnt
        |), nz AS (SELECT * FROM pre WHERE n_tokens > 0),
        |spans AS (
        |  SELECT doc_id, n_tokens, start,
        |    unnest(generate_series(start // 64, (start + n_tokens - 1) // 64))
        |      AS seq_id
        |  FROM nz
        |)
        |SELECT doc_id, n_tokens, seq_id,
        |  greatest(start, seq_id * 64) - seq_id * 64 AS seq_off,
        |  greatest(start, seq_id * 64) - start AS doc_off,
        |  least(start + n_tokens, (seq_id + 1) * 64)
        |    - greatest(start, seq_id * 64) AS len
        |FROM spans""".stripMargin,
    // every scope ranked directly by the A-Res key; ln/division replayed
    // with the identical (hv+1)/2^56 coin
    "q136_weighted_sample_sketch" ->
      """WITH h AS (
        |  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS w,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS hv
        |  FROM documents
        |), keyed AS (
        |  SELECT lang, doc_id, w,
        |    -ln((hv + 1) / 72057594037927936.0) / w AS key
        |  FROM h WHERE w > 0
        |), ranked AS (
        |  SELECT lang, doc_id, w,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY key, CAST(doc_id AS VARCHAR)) AS rn
        |  FROM keyed
        |), g AS (
        |  SELECT doc_id, w,
        |    row_number() OVER (ORDER BY key, CAST(doc_id AS VARCHAR)) AS rn
        |  FROM keyed
        |)
        |SELECT lang, CAST(rn - 1 AS INT) AS pos, doc_id, w FROM ranked
        |WHERE rn <= 6
        |UNION ALL
        |SELECT '__all__' AS lang, CAST(rn - 1 AS INT) AS pos, doc_id, w
        |FROM g WHERE rn <= 6""".stripMargin,
    // per-scope histogram + cumulative-bin interpolation replayed from the
    // raw rows; only nonzero bins exist as rows, so "first bin with
    // cum >= target" matches the Spark fold's c > 0 guard
    "q133_hist_quantiles" ->
      """WITH d AS (
        |  SELECT source,
        |    greatest(0, least(31, CAST(floor(n_chars / 20.0) AS INT))) AS b
        |  FROM documents
        |), scoped AS (
        |  SELECT source, b, count(*) AS c FROM d GROUP BY 1, 2
        |  UNION ALL
        |  SELECT '__all__' AS source, b, count(*) AS c FROM d GROUP BY 2
        |), cum AS (
        |  SELECT source, b, CAST(c AS DOUBLE) AS c,
        |    CAST(sum(c) OVER (PARTITION BY source ORDER BY b) AS DOUBLE) AS cum_incl,
        |    CAST(sum(c) OVER (PARTITION BY source ORDER BY b) - c AS DOUBLE) AS cum_b,
        |    CAST(sum(c) OVER (PARTITION BY source) AS DOUBLE) AS total
        |  FROM scoped
        |)
        |SELECT source, CAST(max(total) AS BIGINT) AS n,
        |  round(min_by((b + greatest(0.0, 0.5 * total - cum_b) / c) * 20.0, b)
        |    FILTER (WHERE cum_incl >= 0.5 * total), 9) AS p50,
        |  round(min_by((b + greatest(0.0, 0.9 * total - cum_b) / c) * 20.0, b)
        |    FILTER (WHERE cum_incl >= 0.9 * total), 9) AS p90,
        |  round(min_by((b + greatest(0.0, 0.99 * total - cum_b) / c) * 20.0, b)
        |    FILTER (WHERE cum_incl >= 0.99 * total), 9) AS p99
        |FROM cum GROUP BY source""".stripMargin,
    // merging (source, lang) sub-sketches
    "q122_sketch_rollup" ->
      s"""WITH nrm AS (
        |  SELECT source,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), tok AS (
        |  SELECT source, unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS tok FROM nrm
        |), hd0 AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(tok), 1, 14))::BIGINT AS hv FROM tok
        |), hd AS (
        |  SELECT source, hv FROM hd0
        |  UNION ALL
        |  SELECT '__all__' AS source, hv FROM (SELECT DISTINCT hv FROM hd0)
        |), rr AS (
        |  SELECT source, hv >> 46 AS reg,
        |    CASE WHEN (hv & ((1::BIGINT << 46) - 1)) = 0 THEN 47
        |         ELSE 47 - length(format('{:b}', hv & ((1::BIGINT << 46) - 1))) END AS rho
        |  FROM hd
        |), regs AS (
        |  SELECT source, reg, max(rho) AS mj FROM rr GROUP BY 1, 2
        |), st AS (
        |  SELECT source,
        |    sum(pow(2.0, -mj)) + (1024 - count(*)) AS harm,
        |    1024 - count(*) AS zero_regs
        |  FROM regs GROUP BY 1
        |)
        |SELECT source, CAST(zero_regs AS INT) AS zero_regs,
        |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm <= 2560.0
        |              AND zero_regs > 0
        |    THEN 1024.0 * ln(1024.0 / zero_regs)
        |    ELSE 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 / harm END, 6) AS est_distinct
        |FROM st""".stripMargin,
    "q81_pmi" ->
      s"""WITH nrm AS (
        |  SELECT trim(regexp_replace(regexp_replace(translate(
        |    lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), toks AS (
        |  SELECT list_filter(string_split(norm, ' '), t -> t <> '') AS tl FROM nrm
        |), uni AS (
        |  SELECT w, count(*) AS cw FROM (SELECT unnest(tl) AS w FROM toks) GROUP BY 1
        |), n1 AS (
        |  SELECT CAST(sum(cw) AS DOUBLE) AS n1 FROM uni
        |), bg AS (
        |  SELECT tl[i] AS w1, tl[i + 1] AS w2
        |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(tl))) AS i) t
        |), bgc AS (
        |  SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2
        |), n2 AS (
        |  SELECT CAST(sum(c_xy) AS DOUBLE) AS n2 FROM bgc
        |), top AS (
        |  SELECT w1, w2, c_xy FROM bgc ORDER BY c_xy DESC, w1, w2 LIMIT 20
        |)
        |SELECT w1, w2, c_xy,
        |  round(ln(c_xy * n1 * n1 / (n2 * u1.cw * u2.cw)), 6) AS pmi
        |FROM top
        |JOIN uni u1 ON u1.w = top.w1
        |JOIN uni u2 ON u2.w = top.w2
        |CROSS JOIN n1 CROSS JOIN n2""".stripMargin,
    "q78_bm25" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT doc_id, len(tl) AS len, unnest(tl) AS term FROM toks
          |), tc AS (
          |  SELECT doc_id, len, term, count(*) AS c FROM tok
          |  WHERE term IN ('spark', 'query', 'join', 'stream')
          |  GROUP BY 1, 2, 3
          |), df AS (
          |  SELECT term, count(DISTINCT doc_id) AS df FROM tc GROUP BY 1
          |), corpus AS (
          |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(tl)) AS avgdl
          |  FROM toks
          |)
          |SELECT doc_id, count(*) AS n_terms,
          |  round(sum(
          |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
          |    (c * (1.2 + 1)) / (c + 1.2 * (1 - 0.75 + 0.75 * len / avgdl))
          |  ), 6) AS score
          |FROM tc JOIN df USING (term) CROSS JOIN corpus
          |GROUP BY doc_id""".stripMargin),
    "q111_bm25_retrieval" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT doc_id, len(tl) AS len, unnest(tl) AS term FROM toks
          |), qt(query_id, term) AS (
          |  VALUES ('q_engine', 'spark'), ('q_engine', 'query'),
          |         ('q_engine', 'join'), ('q_engine', 'stream'),
          |         ('q_exec', 'hash'), ('q_exec', 'merge'),
          |         ('q_exec', 'sort'), ('q_exec', 'group'),
          |         ('q_vector', 'vector'), ('q_vector', 'window'),
          |         ('q_vector', 'filter'), ('q_vector', 'dup')
          |), tc AS (
          |  SELECT doc_id, len, term, count(*) AS c FROM tok
          |  WHERE term IN (SELECT term FROM qt)
          |  GROUP BY 1, 2, 3
          |), df AS (
          |  SELECT term, count(DISTINCT doc_id) AS df FROM tc GROUP BY 1
          |), corpus AS (
          |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(tl)) AS avgdl
          |  FROM toks
          |), scored AS (
          |  SELECT query_id, doc_id,
          |    round(sum(
          |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
          |      (c * (1.2 + 1)) / (c + 1.2 * (1 - 0.75 + 0.75 * len / avgdl))
          |    ), 6) AS score
          |  FROM tc JOIN qt USING (term) JOIN df USING (term) CROSS JOIN corpus
          |  GROUP BY 1, 2
          |)
          |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
          |FROM (
          |  SELECT query_id, doc_id, score,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY score DESC, doc_id) AS rnk
          |  FROM scored)
          |WHERE rnk <= 10""".stripMargin),

    // q180: the q111 BM25 leg (new query ids, k=20) + the q21 cosine leg
    // (anchors 0/7/42, self excluded, k=20), full-outer fused on
    // (query_id, id), rrf added in the engine's fixed leg order
    // (lex first), ranked (rrf desc, id)
    "q180_hybrid_rrf" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT doc_id, len(tl) AS len, unnest(tl) AS term FROM toks
          |), qt(query_id, term) AS (
          |  VALUES ('0', 'spark'), ('0', 'query'),
          |         ('0', 'join'), ('0', 'stream'),
          |         ('7', 'hash'), ('7', 'merge'),
          |         ('7', 'sort'), ('7', 'group'),
          |         ('42', 'vector'), ('42', 'window'),
          |         ('42', 'filter'), ('42', 'dup')
          |), tc AS (
          |  SELECT doc_id, len, term, count(*) AS c FROM tok
          |  WHERE term IN (SELECT term FROM qt)
          |  GROUP BY 1, 2, 3
          |), df AS (
          |  SELECT term, count(DISTINCT doc_id) AS df FROM tc GROUP BY 1
          |), corpus AS (
          |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(tl)) AS avgdl
          |  FROM toks
          |), scored AS (
          |  SELECT query_id, doc_id,
          |    round(sum(
          |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
          |      (c * (1.2 + 1)) / (c + 1.2 * (1 - 0.75 + 0.75 * len / avgdl))
          |    ), 6) AS score
          |  FROM tc JOIN qt USING (term) JOIN df USING (term) CROSS JOIN corpus
          |  GROUP BY 1, 2
          |), lex AS (
          |  SELECT query_id, doc_id AS id, CAST(rnk AS BIGINT) AS r
          |  FROM (
          |    SELECT query_id, doc_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY score DESC, doc_id) AS rnk
          |    FROM scored)
          |  WHERE rnk <= 20
          |), e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |qv AS (SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id IN (0, 7, 42)),
          |sims AS (
          |  SELECT qid, vec_id, list_cosine_similarity(qvec, v) AS cos
          |  FROM qv JOIN e ON vec_id != qid
          |), vecleg AS (
          |  SELECT CAST(qid AS VARCHAR) AS query_id, vec_id AS id,
          |    CAST(rnk AS BIGINT) AS r
          |  FROM (
          |    SELECT qid, vec_id,
          |      row_number() OVER (PARTITION BY qid
          |        ORDER BY cos DESC, vec_id) AS rnk
          |    FROM sims)
          |  WHERE rnk <= 20
          |), fused AS (
          |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
          |    coalesce(l.id, v.id) AS id, l.r AS rank_lex, v.r AS rank_vec
          |  FROM lex l FULL OUTER JOIN vecleg v
          |    ON l.query_id = v.query_id AND l.id = v.id
          |), rrfd AS (
          |  SELECT query_id, id,
          |    coalesce(1.0 / (60.0 + CAST(rank_lex AS DOUBLE)), 0.0) +
          |    coalesce(1.0 / (60.0 + CAST(rank_vec AS DOUBLE)), 0.0) AS rrf_score,
          |    rank_lex, rank_vec
          |  FROM fused
          |)
          |SELECT query_id, id, rrf_score, CAST(rnk AS INT) AS rank,
          |  rank_lex, rank_vec
          |FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY rrf_score DESC, id) AS rnk
          |  FROM rrfd)
          |WHERE rnk <= 10""".stripMargin),
    "q67_distinct_sketch" ->
      s"""WITH nrm AS (
        |  SELECT source,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), tok AS (
        |  SELECT source, unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS tok FROM nrm
        |), hd AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(tok), 1, 14))::BIGINT AS hv
        |  FROM tok
        |), r AS (
        |  SELECT source, hv,
        |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY source) AS nd
        |  FROM hd
        |)
        |SELECT source,
        |  round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
        |    ELSE 63 * 72057594037927936.0 / max(CASE WHEN rn = 64 THEN hv END)
        |  END, 6) AS est_distinct
        |FROM r GROUP BY source""".stripMargin,
    "q85_vocab" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT unnest(tl) AS term FROM toks
          |), counts AS (
          |  SELECT term, count(*) AS c FROM tok GROUP BY 1
          |), ord AS (
          |  SELECT term, c,
          |    coalesce(sum(c) OVER (ORDER BY c DESC, term
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl,
          |    sum(c) OVER () AS total
          |  FROM counts
          |)
          |SELECT term, c FROM ord WHERE excl < 0.95 * total""".stripMargin),
    "q86_entropy" ->
      s"""WITH nrm AS (
        |  SELECT source,
        |    trim(regexp_replace(regexp_replace(translate(
        |      lower(text), $WSMAP), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), tok AS (
        |  SELECT source, unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS term FROM nrm
        |), tc AS (
        |  SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2
        |)
        |SELECT source,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  round(count(*) * 1.0 / sum(n), 6) AS ttr,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy,
        |  round(CASE WHEN count(*) > 1
        |    THEN (ln(sum(n)) - sum(n * ln(n)) / sum(n)) / ln(count(*))
        |    ELSE 0.0 END, 6) AS norm_entropy
        |FROM tc GROUP BY source""".stripMargin,
    "q88_edit_join" ->
      """WITH n AS (SELECT DISTINCT c_name AS s FROM customer)
        |SELECT a.s AS a, b.s AS b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM n a JOIN n b
        |  ON a.s < b.s
        | AND abs(length(a.s) - length(b.s)) <= 1
        | AND levenshtein(a.s, b.s) = 1""".stripMargin,
    "q95_edit_join2" ->
      """WITH n AS (
        |  SELECT DISTINCT c_name AS s FROM customer WHERE c_custkey % 25 = 0
        |)
        |SELECT a.s AS a, b.s AS b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM n a JOIN n b
        |  ON a.s < b.s
        | AND abs(length(a.s) - length(b.s)) <= 2
        | AND levenshtein(a.s, b.s) BETWEEN 1 AND 2""".stripMargin,
    "q96_ccnet_buckets" ->
      (normSql +
        """
          |, tok AS (
          |  SELECT doc_id, unnest(tl) AS tok FROM toks
          |), counts AS (
          |  SELECT tok, count(*) AS c FROM tok GROUP BY 1
          |), tot AS (
          |  SELECT CAST(sum(c) AS DOUBLE) AS n_total, CAST(count(*) AS DOUBLE) AS v_size
          |  FROM counts
          |), scored AS (
          |  SELECT doc_id,
          |    round(avg(-ln((c + 0.5) / (n_total + 0.5 * v_size))), 6) AS avg_nll
          |  FROM tok JOIN counts USING (tok) CROSS JOIN tot
          |  GROUP BY doc_id
          |), lb AS (
          |  SELECT d.lang, s.avg_nll,
          |    ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_nll, s.doc_id) AS bucket
          |  FROM scored s JOIN documents d USING (doc_id)
          |)
          |SELECT lang, CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
          |  round(avg(avg_nll), 6) AS mean_nll
          |FROM lb GROUP BY 1, 2""".stripMargin),
    "q97_bpe" -> bpeOracleSql(10),
    "q168_bpe_pack" -> bpePackOracleSql(64, 2048L),
    "q169_bpe_seq_pack" -> bpeSeqPackOracleSql(64, 128L),
    "q100_bigram_lm" ->
      (normSql +
        """
          |, pos AS (
          |  SELECT doc_id, tl[CAST(i AS INT)] AS prev, tl[CAST(i AS INT) + 1] AS tok
          |  FROM toks CROSS JOIN range(1, 256) t(i)
          |  WHERE i <= len(tl) - 1
          |), bi AS (
          |  SELECT prev, tok, count(*) AS cbi FROM pos GROUP BY 1, 2
          |), pt AS (
          |  SELECT prev, sum(cbi) AS cprev FROM bi GROUP BY 1
          |), uni AS (
          |  SELECT tok, count(*) AS c
          |  FROM (SELECT unnest(tl) AS tok FROM toks) GROUP BY 1
          |), tot AS (
          |  SELECT CAST(sum(c) AS DOUBLE) AS n_total,
          |         CAST(count(*) AS DOUBLE) AS v_size
          |  FROM uni
          |)
          |SELECT doc_id, count(*) AS n_scored,
          |  round(avg(-ln(
          |    0.7 * (CAST(cbi AS DOUBLE) / CAST(cprev AS DOUBLE)) +
          |    0.3 * ((CAST(c AS DOUBLE) + 0.5) / (n_total + 0.5 * v_size)))), 6) AS avg_nll
          |FROM pos JOIN bi USING (prev, tok) JOIN pt USING (prev)
          |  JOIN uni USING (tok) CROSS JOIN tot
          |GROUP BY doc_id
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,256) bound
          |SELECT -1, count(*), 0.0 FROM toks WHERE len(tl) > 256 HAVING count(*) > 0""".stripMargin),
    "q101_hashed_features" ->
      (normSql +
        """
          |, uni AS (
          |  SELECT doc_id, unnest(tl) AS gram FROM toks
          |), bi AS (
          |  SELECT doc_id, tl[CAST(i AS INT)] || ' ' || tl[CAST(i AS INT) + 1] AS gram
          |  FROM toks CROSS JOIN range(1, 256) t(i)
          |  WHERE i <= len(tl) - 1
          |), grams AS (
          |  SELECT * FROM uni UNION ALL SELECT * FROM bi
          |)
          |SELECT doc_id,
          |  ('0x' || substring(md5('hng:' || gram), 1, 8))::BIGINT % 4096 AS bucket,
          |  count(*) AS n
          |FROM grams GROUP BY 1, 2
          |UNION ALL -- guard: loud mismatch if a doc outgrows the range(1,256) bound
          |SELECT -1, count(*), 0 FROM toks WHERE len(tl) > 256 HAVING count(*) > 0""".stripMargin),
    "q102_quality_classifier" ->
      (normSql +
        """
          |, uni AS (
          |  SELECT doc_id, unnest(tl) AS gram FROM toks
          |), bi AS (
          |  SELECT doc_id, tl[CAST(i AS INT)] || ' ' || tl[CAST(i AS INT) + 1] AS gram
          |  FROM toks CROSS JOIN range(1, 256) t(i)
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
          |)
          |SELECT doc_id, round(margin, 6) AS margin,
          |  round(1.0 / (1.0 + exp(-margin)), 6) AS prob,
          |  margin > 0 AS kept
          |FROM m""".stripMargin)
  )
}
