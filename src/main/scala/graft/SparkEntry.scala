package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.kg._
import graft.ops._

/** Driver contract (see SURVEY.md §7 and the builder prompt).
  *
  * `queries` = one entry per implemented operator family; `oracleSql` = the
  * DuckDB-equivalent SQL for every SQL-expressible query (same column names,
  * same types — aggregates over doubles are cast to DECIMAL(38,6) BEFORE
  * summation on BOTH sides so results are exact and order-independent).
  * KG / LSH / ANN queries are not SQL-expressible → rows-only checks.
  */
object SparkEntry {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Flagship: full extract→parse→produce over synthetic pages at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    TripleExtraction.run(PagesSource.pages(spark, 500)).toDF()

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- KG construction pipeline (SURVEY.md §2; not SQL-expressible) ---
    "kg_triples" -> ((s, d) =>
      TripleExtraction.run(PagesSource.pages(s, PagesSource.countForSfDir(d))).toDF()),
    "kg_roundtrip" -> ((s, d) =>
      // one self-evident row: the byte-identity gate holds iff violations=0
      // (driver sees the gate, not an opaque per-block row count)
      TripleExtraction.roundTrip(PagesSource.pages(s, PagesSource.countForSfDir(d))).toDF()
        .agg(count(lit(1)).as("blocks"),
          sum(when(col("parsed"), 1L).otherwise(0L)).as("parsed"),
          sum(when(col("byte_identical"), 1L).otherwise(0L)).as("identical"),
          sum(when(col("parsed") && !col("byte_identical"), 1L).otherwise(0L))
            .as("violations"))),
    "kg_pred_counts" -> ((s, d) =>
      TripleExtraction.run(PagesSource.pages(s, PagesSource.countForSfDir(d)))
        .toDF().filter(col("error").isNull)
        .groupBy(col("pred")).agg(count(lit(1)).as("n"))),
    "kg_two_hop" -> ((s, d) => {
      // basic graph pattern over the extracted KG: the 2-hop predicate
      // path census (?a p1 ?b . ?b p2 ?c) over distinct iri→iri triples —
      // the SPARQL-BGP-shaped consumer query. Contracted form: the path
      // count for (p1, p2) is Σ over bridging nodes b of
      // (#distinct triples ·→b via p1) × (#distinct triples b→· via p2),
      // so the join runs over the COMPACT (node, pred, count) relations
      // instead of self-joining full triple rows — the wide-string
      // triple-pair shuffle disappears, hub-entity skew shrinks to one
      // multiply per (b, p1, p2). Both count branches share the distinct's
      // exchange (identical subtree → ReusedExchange), so extraction runs
      // once. Every joined term has c1, c2 ≥ 1, so no zero-count pair can
      // appear — row set identical to the pairwise self-join census.
      // ONE extraction pass: each triple is exploded into its two bridge
      // roles (side 0: arrives at b via p; side 1: leaves b via p) and a
      // single aggregation computes both distinct-triple counts per (b, p)
      // — countDistinct over a when() is null-skipping, so each side
      // counts only its own role. Exchange reuse can NOT be relied on
      // through the extraction subtree (object-typed operators never
      // canonicalize equal — the before-plan ran extraction twice), so
      // the compact (b, p, c1, c2) relation is localCheckpoint'ed (eager,
      // node×pred-scale — far below the triple relation) and the pair
      // join reads the cache. c1, c2 ≥ 1 on every joined term, so no
      // zero-count (p1, p2) row can appear — row set identical to the
      // original pairwise self-join census.
      val cnts = TripleExtraction
        .run(PagesSource.pages(s, PagesSource.countForSfDir(d))).toDF()
        .filter(col("error").isNull &&
          col("subj_kind") === "iri" && col("obj_kind") === "iri")
        .select(explode(array(
          struct(col("obj_value").as("b"), col("pred").as("p"),
            lit(0).as("side"), col("subj").as("o")),
          struct(col("subj").as("b"), col("pred").as("p"),
            lit(1).as("side"), col("obj_value").as("o")))).as("e"))
        .select(col("e.b").as("b"), col("e.p").as("p"),
          col("e.side").as("side"), col("e.o").as("o"))
        .groupBy(col("b"), col("p"))
        .agg(
          countDistinct(when(col("side") === 0, col("o"))).as("c1"),
          countDistinct(when(col("side") === 1, col("o"))).as("c2"))
        .localCheckpoint()
      val x = cnts.filter(col("c1") > 0)
        .select(col("b"), col("p").as("p1"), col("c1"))
      val y = cnts.filter(col("c2") > 0)
        .select(col("b"), col("p").as("p2"), col("c2"))
      x.join(y, "b")
        .groupBy(col("p1"), col("p2"))
        .agg(sum(col("c1") * col("c2")).as("n_paths"))
    }),
    "kg_link" -> ((s, d) =>
      EntityLinking.run(
        TripleExtraction.run(PagesSource.pages(s, PagesSource.countForSfDir(d))))),
    "kg_canonical" -> ((s, d) =>
      Canonicalize.connectedComponents(
        Canonicalize.sameAsEdges(
          TripleExtraction.run(PagesSource.pages(s, PagesSource.countForSfDir(d)))))),
    "kg_entity_mentions" -> ((s, d) =>
      SkewOps.entityMentionCounts(
        EntityLinking.run(
          TripleExtraction.run(PagesSource.pages(s, PagesSource.countForSfDir(d)))))),
    "kg_triples_sql" -> ((s, d) => {
      // the custom-Catalyst path: parse_turtle_triples Generator via SQL
      graft.functions.GraftFunctions.register(s)
      PagesSource.pages(s, math.min(PagesSource.countForSfDir(d), 5000))
        .createOrReplaceTempView("graft_pages")
      s.sql("""SELECT url, t.* FROM graft_pages
             LATERAL VIEW parse_turtle_triples(text, url) t""")
    }),
    "kg_turtle_source" -> ((s, d) => {
      // the V2 file source: materialize the fixture corpus as .ttl files
      // once, then spark.read.format("turtle"). The dir name is
      // CONTENT-ADDRESSED (fnv64 over names+bytes): a corpus change can
      // never silently reuse a stale dir (a file-count probe could — same
      // count, different fixtures), and concurrent JVMs writing the same
      // hash write identical bytes, so a re-write race is benign.
      val expected = graft.kg.FixtureCorpus.all
      val corpusHash = java.lang.Long.toHexString(graft.kg.PagesSource.fnv64(
        expected.map(x => x._1 + " " + x._2 + " ").mkString))
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft-ttl-corpus-$corpusHash")
      val complete = java.nio.file.Files.isDirectory(dir) && {
        val ls = java.nio.file.Files.list(dir)
        try ls.count() == expected.size finally ls.close()
      }
      if (!complete) {
        java.nio.file.Files.createDirectories(dir)
        expected.foreach { case (name, text) =>
          // write-to-temp + atomic move: a reader listing mid-write sees
          // either the old (incomplete -> rewritten) or the full file
          val target = dir.resolve(name.replace('/', '_'))
          val tmp = java.nio.file.Files.createTempFile(dir, ".wrt", ".tmp")
          java.nio.file.Files.write(tmp,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
      // project the file column to its basename: the oracle is a static
      // reference-anchored VALUES relation and must not depend on where the
      // corpus was materialized (tmpdir, scheme prefix)
      s.read.format("turtle").load(dir.toString)
        .withColumn("file", substring_index(col("file"), "/", -1))
    }),
    "kg_errors" -> ((s, d) =>
      // stable aggregate: error-class histogram (classes are the fixed
      // prefixes emitted by TripleExtraction: NotFullyParsed / ProduceError)
      TripleExtraction.run(PagesSource.pages(s, PagesSource.countForSfDir(d)))
        .toDF().filter(col("error").isNotNull)
        .groupBy(substring_index(col("error"), ":", 1).as("error_class"))
        .agg(count(lit(1)).as("n"))),

    // --- relational core (oracled against DuckDB) ---
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(dec(col("l_quantity"))) * 1000000).cast("long").as("sum_qty_micro"),
          (sum(dec(col("l_extendedprice"))) * 1000000).cast("long").as("sum_price_micro"),
          count(lit(1)).as("n_rows"))),
    "q2_join_broadcast" -> ((s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          (sum(dec(col("o_totalprice"))) * 1000000).cast("long").as("sum_total_micro"))),
    "q3_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          (dec(col("o_totalprice")) * 1000000).cast("long").as("top_price_micro"))
    }),
    "q4_sort_limit" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * 1000000).cast("long").as("price_micro"))),
    "q5_setop" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .union(c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey")))
        .except(c.filter(col("c_acctbal") < 0).select(col("c_custkey")))
    }),
    "q6_time_agg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(dec(col("value"))) * 1000000).cast("long").as("sum_value_micro"))),
    "q7_distinct_agg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))),
    "q8_semi_join" -> ((s, d) =>
      t(s, d, "orders").join(
        t(s, d, "lineitem").filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))),
    "q9_anti_join" -> ((s, d) =>
      t(s, d, "customer").join(
        t(s, d, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),
    "q11_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(dec(col("l_quantity"))) * 1000000).cast("long").as("sum_qty_micro"))),
    "q13_pivot" -> ((s, d) => {
      // crosstab: per-source n_chars totals pivoted across the 5 langs.
      // Explicit value list keeps the output schema static (no extra
      // distinct-scan job); absent combos coalesce to 0 on BOTH sides so
      // every pivot column is non-null BIGINT (mixed null/non-null columns
      // read back as different pandas dtypes and break value hashing)
      val langs = Seq("de", "en", "es", "fr", "zh")
      t(s, d, "documents")
        .groupBy(col("source"))
        .pivot("lang", langs)
        .agg(sum(col("n_chars")))
        .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
    }),
    "q12_profile" -> ((s, d) => {
      // column profiling with EXACT percentiles (sort-based `percentile`,
      // not approx_percentile): quartiles only, because p∈{.25,.5,.75}
      // makes the interpolation fraction g = frac(p·(n−1)) exactly
      // representable — both engines then compute bit-identical doubles
      val qm = (dec(col("l_quantity")) * 1000000).cast("long")
      t(s, d, "lineitem")
        .select(col("l_returnflag"), qm.as("qm"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min(col("qm")).as("min_q"), max(col("qm")).as("max_q"),
          percentile(col("qm"), lit(0.25)).as("p25"),
          percentile(col("qm"), lit(0.5)).as("p50"),
          percentile(col("qm"), lit(0.75)).as("p75"))
    }),
    "q10_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev_ts").isNull, lit(0))
            .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, lit(1))
            .otherwise(lit(0)))
        .withColumn("session_id", sum(col("brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
            .as("duration_sec"))
    }),

    // --- training-data ops: text analysis (oracled where SQL-expressible) ---
    "text_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))),
    "text_quality" -> ((s, d) =>
      TextOps.qualityCounts(t(s, d, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("n_punct"),
          col("n_upper"), col("n_digits"), col("n_stopwords"))),
    "text_subwords" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          TextOps.subwordCount(col("text")).as("n_subwords"))),
    "text_langid" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.langId(col("text")).as("lang_pred"))),
    "text_winnow" -> ((s, d) =>
      TextOps.winnowFingerprints(t(s, d, "documents"))),
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),
    "text_repetition" -> ((s, d) =>
      // Gopher-style intra-document repetition counters: exact integers +
      // the modal bigram (count desc / bigram desc tie-break)
      TextOps.repetitionStats(t(s, d, "documents"))),
    "text_chunks" -> ((s, d) =>
      // sliding-window chunking (32-token windows, 8-token overlap) —
      // context-window prep; narrow, no shuffle
      PackOps.chunkByTokenBudget(t(s, d, "documents"), 32, 8)),
    "curate_sources" -> ((s, d) =>
      // source-level composition + quality gate (domain filtering):
      // threshold 150 chars splits the synthetic sources 17 kept / 3 not
      TextOps.sourceStats(t(s, d, "documents"), shortChars = 150)),
    "text_index_stats" -> ((s, d) =>
      // inverted-index statistics: (doc, term) tf + vocabulary df — the
      // integer TF-IDF/BM25 backbone; df derived from tf (one scan), AQE
      // broadcasts the vocabulary-sized df side of the join
      TextOps.docTermStats(t(s, d, "documents"))),
    "text_collocations" -> ((s, d) =>
      // PMI/LLR collocation backbone: adjacent-bigram counts + unigram
      // marginals + corpus total, all integers, from ONE scan and ONE
      // token-scale shuffle (marginals derived from the pair aggregate
      // via a last-token marker row, ReusedExchange)
      TextOps.collocationStats(t(s, d, "documents"), minPair = 5L)),
    "stats_quantiles" -> ((s, d) =>
      // threshold-derivation primitive: exact per-source n_chars
      // quantiles from the value histogram — no per-row sort, no
      // approx_percentile
      StatsOps.groupQuantiles(t(s, d, "documents"), "source", "n_chars")),
    "stats_top_terms" -> ((s, d) => {
      // per-source top-5 terms (domain signature / composition drift
      // monitor): one corpus-scale count shuffle, then the ranked window
      // runs on the compact (source, term) relation
      val tf = t(s, d, "documents")
        .select(col("source"), explode(TextOps.normTokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      StatsOps.topKPerGroup(tf, "source", "n", "term", 5)
    }),
    "curate_adaptive" -> ((s, d) => {
      // data-derived curation gate: keep documents at or above their
      // source's p25 length — the threshold comes from groupQuantiles in
      // the SAME job (source-level relation, AQE-broadcast back), no
      // driver round-trip, no hard-coded constant
      val docs = t(s, d, "documents")
      val thr = StatsOps.groupQuantiles(docs, "source", "n_chars", Seq(250))
        .select(col("source"), col("quantile_value").as("thr"))
      docs.join(thr, "source")
        .filter(col("n_chars") >= col("thr"))
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),
    "stats_percentile_rank" -> ((s, d) =>
      // cross-source score normalization: every document's n_chars as a
      // permille rank WITHIN ITS SOURCE's distribution — integer-exact
      // floor(1000·cum/n) via the histogram, corpus never sorted
      StatsOps.percentileRanks(
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        "source", "n_chars")),
    "sketch_hll" -> ((s, d) =>
      // mergeable HLL register sketch of distinct users per event type:
      // one 2^12-int buffer per group crosses the shuffle regardless of
      // group size; oracle re-derives every register from staged XXH64
      SketchOps.hllRegisters(t(s, d, "events"), "event_type", "user_id")),
    "sketch_cms" -> ((s, d) =>
      // count-min frequency table of user ids (4x1024): deterministic
      // integer counters, mergeable by addition, bounded by depth*width
      // no matter the key cardinality
      SketchOps.countMinTable(t(s, d, "events"), "user_id")),
    "text_oov_rate" -> ((s, d) =>
      // LM-statistics quality gate, integer form: permille of each doc's
      // trigrams whose corpus frequency is < 3 (rare dictionary join —
      // common heavy trigrams die at the join, no skew amplification)
      TextOps.rareTrigramRate(t(s, d, "documents"))),
    "text_ngrams" -> ((s, d) => {
      // corpus trigram counts (LM-statistics / contamination primitive):
      // explode → map-side-combined count → TakeOrdered top-100 with a
      // deterministic (count desc, ngram asc) tie-break.
      // `toks` is materialized as a COLUMN before the higher-order lambda:
      // a subexpression referenced inside transform()'s lambda is
      // re-evaluated per array element (no subexpression elimination
      // across lambda boundaries), which re-ran split+filter per trigram
      // — measured 13 s → 0.4 s at sf0.1 for this one-line restructure
      val toks = col("toks")
      val tris = when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i),
            element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))
      t(s, d, "documents")
        .select(TextOps.normTokens(col("text")).as("toks"))
        .select(explode(tris).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram").asc)
        .limit(100)
    }),
    "text_contamination" -> ((s, d) => {
      // benchmark decontamination: flag documents sharing >= 8 distinct
      // winnowing fingerprints with a designated benchmark subset
      // (doc_id % 97 == 0 stands in for the eval-set table). Fingerprint
      // sets are position-robust (TextOps.winnow), the join is
      // fingerprint-keyed (AQE broadcasts the benchmark side), and the
      // per-doc distinct count is one map-side-combined aggregation.
      val fps = TextOps.winnowFingerprints(t(s, d, "documents"))
      val bench = fps.filter(col("doc_id") % 97 === 0)
        .select(col("fp")).distinct()
      fps.filter(col("doc_id") % 97 =!= 0)
        .join(bench, Seq("fp"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("fp")).as("shared_fps"))
        .filter(col("shared_fps") >= 8)
    }),
    "text_pii" -> ((s, d) => {
      // the corpus is synthetic word-salad with no PII, so both engine and
      // oracle graft the SAME deterministic email/phone/id substrings onto
      // each document before scrubbing — guaranteed positives at any scale
      val id = col("doc_id").cast("string")
      val aug = concat(col("text"),
        lit(" contact user"), id, lit("@example.com or 555-01"), id,
        lit(" ref "), (col("doc_id") * 1000000L + 123456L).cast("string"))
      t(s, d, "documents").select(
        col("doc_id"),
        TextOps.piiScrub(aug).as("scrubbed"),
        TextOps.matchCount(aug, TextOps.PII_EMAIL).as("n_emails"),
        TextOps.matchCount(aug, TextOps.PII_PHONE).as("n_phones"),
        TextOps.matchCount(aug, TextOps.PII_NUM).as("n_nums"))
    }),

    // --- training-data ops: dedup ---
    "dedup_group_signature" -> ((s, d) => {
      // custom typed Aggregator: per-source MinHash signature (mergeable
      // sketch, map-side partial aggregation). Exploded to scalar rows
      // (source, slot, min_hash) — the driver compare requires hashable
      // (non-array) column types.
      val sig = udaf(graft.ops.MinHashAggregator)
      t(s, d, "documents").groupBy(col("source"))
        .agg(sig(col("text")).as("signature"))
        .select(col("source"), posexplode(col("signature")))
        .toDF("source", "slot", "min_hash")
    }),
    "dedup_exact" -> ((s, d) =>
      DedupOps.exactDedup(dupCorpus(s, d, perturb = false))),
    "dedup_minhash" -> ((s, d) =>
      DedupOps.minhashDedup(dupCorpus(s, d, perturb = true), 0.5)),
    "dedup_incremental" -> ((s, d) => {
      // daily-ingestion shape: an arriving shard (new docs + re-crawled
      // corpus copies + its own internal dups) against the existing
      // corpus; survivors = min-id per fingerprint, anti-joined on
      // fingerprints the corpus already holds
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val shard = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(docs
          .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + lit(2000000000L)))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + lit(3000000000L)))
      DedupOps.incrementalDedup(shard, corpus)
    }),
    "dedup_collapse" -> ((s, d) => {
      // pair emission → deduplicated corpus: connected components over
      // the minhash duplicate pairs (chains A≈B≈C collapse together),
      // canonical = min doc_id, singletons map to themselves
      val corpus = dupCorpus(s, d, perturb = true)
      DedupOps.collapseDuplicates(corpus, DedupOps.minhashDedup(corpus, 0.5))
    }),
    "dedup_simhash" -> ((s, d) =>
      DedupOps.simhashDedup(dupCorpus(s, d, perturb = true), 3)),
    "dedup_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccardDedup(dupCorpus(s, d, perturb = true), 0.8)),
    "dedup_spans" -> ((s, d) =>
      // span-granularity exact dedup census (Lee et al. ACL'22): every
      // 10-token span shared by >= 2 documents; one pass, one Exchange on
      // (md5, len) — never span text (see DedupOps.duplicatedSpans)
      DedupOps.duplicatedSpans(t(s, d, "documents"), 10)),
    "dedup_span_coverage" -> ((s, d) =>
      // per-document duplicated-span coverage (the removal metric): token
      // positions covered by cross-document 10-token spans; semi join on
      // the 32-byte md5, interval union as countDistinct over positions
      DedupOps.spanDupCoverage(t(s, d, "documents"), 10)),
    // sampled (doc_id % 25) variants: the same LSH operators with an
    // all-pairs oracle that stays tractable at BENCH scale (sf0.1) — the
    // hash-compare axis is not pinned to the sf0.01 corpus size
    "dedup_minhash_sampled" -> ((s, d) =>
      DedupOps.minhashDedup(dupCorpus(s, d, perturb = true, mod = 25), 0.5)),
    "dedup_collapse_sampled" -> ((s, d) => {
      // the cluster-collapse composition on the mod-25 subsample: keeps
      // its all-pairs + closure oracle tractable at sf0.1, so the CC
      // composition has a bench-scale hash-compare axis too
      val corpus = dupCorpus(s, d, perturb = true, mod = 25)
      DedupOps.collapseDuplicates(corpus, DedupOps.minhashDedup(corpus, 0.5))
    }),
    "dedup_simhash_sampled" -> ((s, d) =>
      DedupOps.simhashDedup(dupCorpus(s, d, perturb = true, mod = 25), 3)),
    "dedup_embedding" -> ((s, d) =>
      SimilarityOps.embeddingDedup(embCorpus(s, d), 0.95)),

    "curate_corpus" -> ((s, d) => {
      // end-to-end curation fused to ONE scan + ONE shuffle (round-6
      // VERDICT #6): the quality counters are pure functions of the text,
      // so an exact-text group passes the gate all-or-nothing — filter
      // map-side (failing rows never shuffle), then take the keeper
      // (min doc_id) AND its counters (identical across the group) in one
      // aggregation keyed on (length, md5) — ~36-byte shuffle key, same
      // collision bound as DedupOps.exactDedup (expected colliding pairs
      // n²/2^129, ignorable). Replaces the round-6 two-scan
      // filter → keeper-groupBy → self-join plan; same rows out.
      TextOps.qualityCounts(t(s, d, "documents"))
        .filter(col("n_tokens") >= 10 &&
          col("n_punct") * 5 <= col("n_tokens") &&
          col("n_digits") * 2 <= col("n_tokens"))
        .groupBy(length(col("text")), md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id"),
          min(col("n_tokens")).as("n_tokens"),
          min(col("n_stopwords")).as("n_stopwords"))
        .select(col("doc_id"), col("n_tokens"), col("n_stopwords"))
    }),

    // --- training-data ops: temporal / mixing / packing ---
    "asof_join" -> ((s, d) => {
      // attribution: each purchase joined to the user's most recent click
      // at-or-before it (backward inclusive as-of join, one shuffle)
      val e = t(s, d, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // right side reduced to one row per (user, ts) — the asofJoin
      // determinism contract
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      TemporalOps.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), inner = true)
        .select(col("event_id"), col("user_id"), col("click_id"),
          // ts is TIMESTAMP_NTZ in the parquet; the cast is safe for the
          // difference (both sides shift identically, session TZ is UTC)
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("__asof_ts").cast("timestamp"))).as("gap_us"))
    }),
    "interval_join" -> ((s, d) => {
      // error-burst attribution: clicks by the same user within 2 hours
      // after each error (bucketized range join — equi-join at any scale)
      val e = t(s, d, "events")
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("start_us"))
        .withColumn("end_us", col("start_us") + lit(7200L * 1000000L))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      TemporalOps.intervalJoin(errors, clicks, Seq("user_id"),
        "start_us", "end_us", "ts_us", granularityUs = 7200L * 1000000L)
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(col("r_event_id")).as("n_clicks"))
    }),
    "mix_budget" -> ((s, d) =>
      // per-source TOKEN budget: deterministic doc_id-ordered prefix whose
      // cumulative token count fits 800 tokens (~55% of each source's
      // 1.3-1.5k total at sf0.01 — the budget bites on every source)
      MixOps.budgetSelect(t(s, d, "documents"), budgetTokens = 800L)),
    "mix_weighted" -> ((s, d) =>
      MixOps.weightedMix(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), mixWeights)
        .select(col("doc_id"), col("source"), col("copy"))),
    "mix_splits" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        MixOps.assignSplit(col("doc_id"),
          Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)).as("split"))),
    "mix_stratified" -> ((s, d) =>
      MixOps.stratifiedSample(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), stratifiedRates)),
    "pack_sequences" -> ((s, d) =>
      PackOps.packSequences(t(s, d, "documents"), "doc_id",
        TextOps.tokenCount(col("text")), budget = 2048L, partitions = 8)),

    // --- training-data ops: similarity search ---
    "ann_brute_topk" -> ((s, d) =>
      SimilarityOps.bruteForceTopK(t(s, d, "embeddings"), 8, 10)),
    "ann_lsh_topk" -> ((s, d) =>
      SimilarityOps.lshTopK(t(s, d, "embeddings"), 8, 10)),
    "embed_diverse" -> ((s, d) =>
      // cluster-balanced diversity sample: perCell lowest ids from every
      // k-means cell — uniform embedding-space coverage, not density
      SimilarityOps.diverseSample(t(s, d, "embeddings"))),
    "embed_clusters" -> ((s, d) =>
      // corpus clustering in embedding space: per-vector cell under the
      // deterministic fixed-point Lloyd codebook (topic bucketing /
      // diversity sampling / IVF routing)
      SimilarityOps.kmeansAssign(t(s, d, "embeddings"))),
    "ann_ivf_topk" -> ((s, d) =>
      SimilarityOps.ivfTopK(t(s, d, "embeddings"), 8, 10)),

    // --- graph analytics over the part co-purchase graph (parts sharing
    //     an order): degree census, degree-ordered triangle counts,
    //     integer-credit PageRank — the KG-consumer analytics tier ---
    "graph_degrees" -> ((s, d) =>
      GraphOps.degreeCensus(coPurchaseEdges(s, d))),
    "graph_triangles" -> ((s, d) =>
      GraphOps.triangleCounts(coPurchaseEdges(s, d))
        .select(col("n").as("part_id"), col("n_triangles"))),
    "graph_pagerank" -> ((s, d) =>
      GraphOps.pageRankCredits(coPurchaseEdges(s, d))
        .select(col("n").as("part_id"), col("c").as("credit"))),
    "graph_components" -> ((s, d) =>
      // hash-min connected components; label = smallest part id in the
      // component (deterministic integer fixpoint, oracle-exact)
      GraphOps.connectedComponents(coPurchaseEdges(s, d))
        .select(col("n").as("part_id"), col("component"))),

    // --- multimodal: REAL container decode (BMP/WAV/PPM synthesized and
    //     parsed as wire formats; oracled via generator arithmetic). Page
    //     count is a FIXED 2000 (pages are synthetic — independent of the
    //     sf dir), because the static oracle SQL (mmBaseSql) hardcodes the
    //     same range; a min(countForSfDir, 2000) here silently diverged
    //     from the oracle for dirs under 2000 pages ---
    "mm_features" -> ((s, d) => {
      import s.implicits._
      MultimodalOps.extractFeatures(
        MultimodalOps.mediaFromPages(PagesSource.pages(s, MM_PAGES)))
        .toDF().select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("sample_rate"),
          col("n_units"), col("content_sum"))
    }),
    "mm_frames" -> ((s, d) =>
      MultimodalOps.frameSample(
        MultimodalOps.mediaFromPages(PagesSource.pages(s, MM_PAGES)))))

  /** Fixed page count shared by the mm_* queries AND their oracles. */
  private val MM_PAGES = 2000L

  /** Part co-purchase graph: undirected edges between parts sharing an
    * order (distinct, u < v, per-order membership capped at
    * [[GraphOps.GROUP_CAP]] smallest part ids — inactive on TPC-H-ish
    * orders, ≤ 7 lines each; the oracle mirrors the cap). */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    GraphOps.coOccurrenceEdges(t(s, d, "lineitem"), "l_orderkey", "l_partkey")

  /** Per-source training-mix weights for `mix_weighted`: numeric suffix
    * mod 4 cycles {0.25, 1.0, 1.7, 2.5} (downsample / keep / fractional
    * epochs / full epochs); src19 deliberately absent so the
    * missing-stratum → dropped path is exercised. */
  private val mixWeights: Map[String, Double] =
    (0 until 19).map(k => s"src$k" -> (k % 4 match {
      case 0 => 0.25
      case 1 => 1.0
      case 2 => 1.7
      case _ => 2.5
    })).toMap

  /** Per-source sampling rates for `mix_stratified`: suffix mod 4 cycles
    * {0.2, 0.5, 0.8, 1.0}; src19 deliberately absent so the
    * missing-stratum → dropped path is exercised. */
  private val stratifiedRates: Map[String, Double] =
    (0 until 19).map(k => s"src$k" -> (k % 4 match {
      case 0 => 0.2
      case 1 => 0.5
      case 2 => 0.8
      case _ => 1.0
    })).toMap

  /** The dedup corpus: documents plus deterministic near-duplicate copies
    * (id + 10^9, last token dropped) so near-dup detection has guaranteed
    * positives at every scale. perturb=false → exact copies. */
  private def dupCorpus(s: SparkSession, d: String, perturb: Boolean,
      mod: Long = 1): DataFrame = {
    // mod > 1: deterministic subsample keyed on doc_id — the "capped
    // subset" oracle mode that keeps the all-pairs DuckDB oracle tractable
    // at sf0.1 (50k docs would be 2.5B pairs; /25 is ~2.4M)
    val base0 = t(s, d, "documents").select(col("doc_id"), col("text"))
    val docs = if (mod > 1) base0.filter(col("doc_id") % mod === 0) else base0
    val dups = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L))
      .withColumn("text",
        if (perturb) regexp_replace(col("text"), "\\s+\\S+\\s*$", "")
        else col("text"))
    docs.unionByName(dups)
  }

  /** Embedding corpus with guaranteed near-dups: every 10th vector gets a
    * slightly-scaled copy (cosine 1.0 with its source). */
  private def embCorpus(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val dups = e.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000000L))
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.01f)))
    e.unionByName(dups)
  }

  // ------------------------------------------------------------- oracle SQL

  private def dedupJaccardOracle(thresholdPct: Int, mod: Int = 1): String =
    s"""WITH corpus AS (
         SELECT doc_id, text FROM documents WHERE doc_id % $mod = 0
         UNION ALL
         SELECT doc_id + 1000000000, regexp_replace(text, '\\s+\\S+\\s*$$', '')
         FROM documents WHERE doc_id % 10 = 0 AND doc_id % $mod = 0),
       toks AS (
         SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 0) AS t
         FROM corpus),
       sh AS (
         SELECT doc_id,
           CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                ELSE list_transform(generate_series(1, len(t) - 2),
                  i -> array_to_string(t[i:i+2], ' '))
           END AS shingles
         FROM toks),
       pairs AS (
         SELECT a.doc_id AS a, b.doc_id AS b,
           len(list_intersect(a.shingles, b.shingles)) AS inter,
           len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
             - len(list_intersect(a.shingles, b.shingles)) AS uni
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       SELECT a, b,
         CAST(trunc((CAST(inter AS DOUBLE) / uni) * 100) AS BIGINT) AS jacc_pct
       FROM pairs WHERE uni > 0
         AND CAST(trunc((CAST(inter AS DOUBLE) / uni) * 100) AS BIGINT) >= $thresholdPct"""

  /** simhash64 in DuckDB SQL: wrapping 64-bit arithmetic via UBIGINT with
    * HUGEINT split multiplication (a*C mod 2^64 = lo32(a)*C + (hi32(a)*C
    * mod 2^32)<<32, all within INT128 range). Corpus text is ASCII, so
    * Scala's UTF-16-unit FNV equals the codepoint FNV here. */
  private def simhashOracle(mod: Int = 1): String = {
    val mix = splitmixSql("fh")
    s"""WITH corpus AS (
         SELECT doc_id, text FROM documents WHERE doc_id % $mod = 0
         UNION ALL
         SELECT doc_id + 1000000000, regexp_replace(text, '\\s+\\S+\\s*$$', '')
         FROM documents WHERE doc_id % 10 = 0 AND doc_id % $mod = 0),
       toks AS (
         SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 0)) AS tok
         FROM corpus),
       fnv AS (
         SELECT doc_id,
           list_reduce(
             list_prepend(CAST(14695981039346656037 AS UBIGINT),
               list_transform(range(1, length(tok) + 1),
                 i -> CAST(unicode(tok[i]) AS UBIGINT))),
             (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)
                            % 18446744073709551616 AS UBIGINT)
           ) AS fh
         FROM toks),
       mixed AS (SELECT doc_id, $mix AS h FROM fnv),
       votes AS (
         SELECT doc_id, b.b AS bit,
           sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM mixed, (SELECT unnest(range(0, 64)) AS b) b
         GROUP BY doc_id, b.b),
       sigs AS (
         SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << bit
                         ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sig
         FROM votes GROUP BY doc_id),
       -- token-less documents have signature 0 in the Scala path (zero
       -- votes); re-join the corpus so they pair too instead of vanishing
       allsigs AS (
         SELECT c.doc_id, COALESCE(s.sig, CAST(0 AS UBIGINT)) AS sig
         FROM corpus c LEFT JOIN sigs s USING (doc_id)),
       pairs AS (
         SELECT a.doc_id AS a, b.doc_id AS b,
                bit_count(xor(a.sig, b.sig)) AS hamming
         FROM allsigs a JOIN allsigs b ON a.doc_id < b.doc_id)
       SELECT a, b, CAST(hamming AS BIGINT) AS hamming
       FROM pairs WHERE hamming <= 3"""
  }

  /** Shared SQL for the splitmix64 finalizer over `xor(base, seed)` —
    * mod-2^64 arithmetic as in [[simhashOracle]]. */
  private def splitmixSql(inputExpr: String): String = {
    def mulmod(a: String, c: String): String =
      s"(( (($a) % 4294967296) * $c + " +
        s"((( ($a) // 4294967296) * $c) % 4294967296) * 4294967296 ) % 18446744073709551616)"
    val z0 = s"((CAST($inputExpr AS HUGEINT) + 11400714819323198485) % 18446744073709551616)"
    val z0u = s"CAST($z0 AS UBIGINT)"
    val z1 = mulmod(s"CAST(xor($z0u, $z0u >> 30) AS HUGEINT)", "13787848793156543929")
    val z1u = s"CAST($z1 AS UBIGINT)"
    val z2 = mulmod(s"CAST(xor($z1u, $z1u >> 27) AS HUGEINT)", "10723151780598845931")
    val z2u = s"CAST($z2 AS UBIGINT)"
    s"xor($z2u, $z2u >> 31)"
  }

  /** XXH64 of an 8-byte long — bit-exact Spark `xxhash64(longCol)`
    * re-derived in DuckDB SQL. Single-lane XXH64:
    * acc = seed + P5 + 8; k1 = rotl31(v·P2)·P1; acc = rotl27(acc⊕k1)·P1 +
    * P4; then the 33/29/32 avalanche. Wrapping 64-bit multiplies use the
    * same HUGEINT split-multiplication as [[splitmixSql]]; rotations are
    * disjoint-bit adds of (x·2^r mod 2^64) and (x >> 64−r).
    *
    * Emitted as a chain of NESTED SUBQUERIES — every intermediate binds to
    * a column referenced by name by the next stage, so the SQL is LINEAR
    * in the number of stages (~2 KB). A pure expression tree was measured
    * at 0.8 MB per hash invocation: each `mulmod`/rotation references its
    * operand twice, doubling the text at every one of ~8 stages.
    *
    * Returns (fromClause, outCol): select `outCol` (a signed BIGINT —
    * Spark longs compare signed) from `fromClause`, which nests `base`.
    * `seedCol` chains multi-argument xxhash64 (Spark computes
    * hash(b, seed = hash(a, 42)) for xxhash64(a, b)). */
  private def xxhash64LongStages(base: String, inputExpr: String,
      out: String, seedCol: String = "42"): (String, String) = {
    val M64 = "18446744073709551616"
    def mulmod(a: String, c: BigInt): String =
      s"(( ((CAST($a AS HUGEINT)) % 4294967296) * $c + " +
        s"((( (CAST($a AS HUGEINT)) // 4294967296) * $c) % 4294967296) * 4294967296 ) % $M64)"
    def u(e: String) = s"CAST($e AS UBIGINT)"
    def rotl(x: String, r: Int): String =
      u(s"(CAST((CAST($x AS HUGEINT) * ${BigInt(1) << r}) % $M64 AS UBIGINT) + ($x >> ${64 - r}))")
    val P1 = BigInt("9E3779B185EBCA87", 16)
    val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
    val P3 = BigInt("165667B19E3779F9", 16)
    val P4 = BigInt("85EBCA77C2B2AE63", 16)
    val P5 = BigInt("27D4EB2F165667C5", 16)
    val o = out
    val stages: Seq[(String, String)] = Seq(
      s"${o}_v" -> u(s"(CAST(($inputExpr) AS HUGEINT) + $M64) % $M64"),
      s"${o}_k1" -> rotl(u(mulmod(s"${o}_v", P2)), 31),
      s"${o}_km" -> u(mulmod(s"${o}_k1", P1)),
      // signed seed → unsigned, acc = seed + P5 + 8 mod 2^64
      s"${o}_s" -> u(s"((((CAST(($seedCol) AS HUGEINT) + $M64) % $M64) + ${(P5 + 8).toString}) % $M64)"),
      s"${o}_a0" -> rotl(s"xor(${o}_s, ${o}_km)", 27),
      s"${o}_a1" -> u(s"(${mulmod(s"${o}_a0", P1)} + $P4) % $M64"),
      s"${o}_a2" -> u(mulmod(s"xor(${o}_a1, ${o}_a1 >> 33)", P2)),
      s"${o}_a3" -> u(mulmod(s"xor(${o}_a2, ${o}_a2 >> 29)", P3)),
      s"${o}_a4" -> s"xor(${o}_a3, ${o}_a3 >> 32)",
      o -> (s"CAST(CASE WHEN ${o}_a4 >= 9223372036854775808 " +
        s"THEN CAST(${o}_a4 AS HUGEINT) - $M64 " +
        s"ELSE CAST(${o}_a4 AS HUGEINT) END AS BIGINT)"))
    val from = stages.foldLeft(base) { case (inner, (col, expr)) =>
      s"(SELECT *, $expr AS $col FROM $inner)"
    }
    (from, o)
  }

  /** Cluster-collapse oracle: the (sampled) all-pairs Jaccard pair oracle
    * as a subquery, closed under recursive reachability, min per
    * component, singletons self-mapped. */
  private def collapseOracle(mod: Int): String =
    s"""WITH RECURSIVE corpus AS (
         SELECT doc_id FROM documents WHERE doc_id % $mod = 0
         UNION ALL
         SELECT doc_id + 1000000000 FROM documents
         WHERE doc_id % 10 = 0 AND doc_id % $mod = 0),
       p AS (SELECT a, b FROM (${dedupJaccardOracle(50, mod = mod)})),
       sym AS (SELECT a AS s, b AS d FROM p UNION SELECT b, a FROM p),
       reach(n, r) AS (
         SELECT DISTINCT s, s FROM sym
         UNION
         SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.n),
       comp AS (SELECT n, min(r) AS c FROM reach GROUP BY n)
       SELECT corpus.doc_id, coalesce(comp.c, corpus.doc_id) AS canonical
       FROM corpus LEFT JOIN comp ON comp.n = corpus.doc_id"""

  /** HLL register oracle: the full register state of sketch_hll re-derived
    * from staged XXH64 — bucket = low 12 bits (unsigned), rho from the
    * binary length of the remaining 52 bits (bin() renders minimal digits
    * in both engines, so 53 − length(bin(x)) = nlz within the 52-bit
    * field + 1, exactly [[graft.ops.SketchOps.HllAggregator]]'s spec). */
  private def hllOracle: String = {
    val (from, h) = xxhash64LongStages(
      "(SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL)",
      "user_id", "hh")
    s"""SELECT event_type, CAST(hu & CAST(4095 AS UBIGINT) AS BIGINT) AS bucket,
         CAST(max(CASE WHEN (hu >> 12) = CAST(0 AS UBIGINT) THEN 53
                       ELSE 53 - length(bin(hu >> 12)) END) AS BIGINT) AS register
       FROM (SELECT event_type,
               CAST((CAST($h AS HUGEINT) + 18446744073709551616)
                    % 18446744073709551616 AS UBIGINT) AS hu
             FROM $from)
       GROUP BY 1, 2"""
  }

  /** Count-min oracle: row d's counters re-derived with the chained
    * two-stage hash (Spark's xxhash64(lit(d), key) seeds the key hash
    * with hash(d, 42)), one staged chain per depth, UNION ALL, count. */
  private def cmsOracle(depth: Int = 4, width: Int = 1024): String = {
    val parts = (0 until depth).map { d =>
      val (f1, s1) = xxhash64LongStages(
        "(SELECT user_id FROM events WHERE user_id IS NOT NULL)",
        d.toString, s"s$d")
      val (f2, h2) = xxhash64LongStages(f1, "user_id", s"h$d", seedCol = s1)
      s"""SELECT CAST($d AS BIGINT) AS depth,
           ((($h2) % $width) + $width) % $width AS bucket FROM $f2"""
    }
    s"""SELECT depth, bucket, count(*) AS n
       FROM (${parts.mkString(" UNION ALL ")}) GROUP BY 1, 2"""
  }

  /** The staged xxhash64(doc_id, purpose) gate over documents: nested
    * subqueries computing h1 = xxh64(doc_id, 42) then the purpose hash
    * with seed h1 (exactly Spark's multi-arg chaining), projected to
    * (doc_id, source, gate). */
  private def mixGateFrom(purpose: Long): String = {
    val (f1, h1) = xxhash64LongStages("documents", "doc_id", "h1")
    val (f2, h2) = xxhash64LongStages(f1, purpose.toString, "h2", seedCol = h1)
    s"""(SELECT doc_id, source, ((($h2) % 10000) + 10000) % 10000 AS gate
        FROM $f2)"""
  }

  /** [[MixOps.weightedMix]] over documents with [[mixWeights]]: the gate is
    * pmod(xxhash64(doc_id, PURPOSE_MIX), 10000) on both sides; weights
    * quantized to 1e-4 so the whole compare is integer. */
  private def mixWeightedOracle: String =
    // MATERIALIZED: a plain CTE gets inlined and DuckDB's subquery
    // flattening then re-substitutes the staged gate expressions into
    // every downstream reference — planner blow-up (measured: hang)
    s"""WITH gates AS MATERIALIZED (
         SELECT * FROM ${mixGateFrom(graft.ops.MixOps.PURPOSE_MIX)} gsub),
       g AS (
         SELECT doc_id, source, gate,
           CASE WHEN source = 'src19' THEN 0
                WHEN CAST(substr(source, 4) AS INT) % 4 = 0 THEN 2500
                WHEN CAST(substr(source, 4) AS INT) % 4 = 1 THEN 10000
                WHEN CAST(substr(source, 4) AS INT) % 4 = 2 THEN 17000
                ELSE 25000 END AS wq
         FROM gates),
       c AS (
         SELECT doc_id, source,
           CAST(wq // 10000
                + CASE WHEN gate < wq % 10000 THEN 1 ELSE 0 END AS BIGINT)
             AS n
         FROM g)
       SELECT doc_id, source,
         CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS "copy"
       FROM c WHERE n > 0"""

  /** [[MixOps.stratifiedSample]] over documents with [[stratifiedRates]]:
    * keep rows whose PURPOSE_SAMPLE gate lands under the stratum's
    * quantized rate; src19 (absent stratum) drops entirely. */
  private def mixStratifiedOracle: String =
    s"""WITH gates AS MATERIALIZED (
         SELECT * FROM ${mixGateFrom(graft.ops.MixOps.PURPOSE_SAMPLE)} gsub)
       SELECT doc_id, source FROM gates
       WHERE gate < CASE WHEN source = 'src19' THEN 0
            WHEN CAST(substr(source, 4) AS INT) % 4 = 0 THEN 2000
            WHEN CAST(substr(source, 4) AS INT) % 4 = 1 THEN 5000
            WHEN CAST(substr(source, 4) AS INT) % 4 = 2 THEN 8000
            ELSE 10000 END"""

  /** [[MixOps.assignSplit]] with 98/1/1 train/val/test fractions: gate
    * bucket ranges [0,9800) / [9800,9900) / [9900,10000); the gate chains
    * xxhash64(doc_id, PURPOSE_SPLIT) exactly as the engine side. */
  private def mixSplitsOracle: String =
    s"""WITH gates AS MATERIALIZED (
         SELECT * FROM ${mixGateFrom(graft.ops.MixOps.PURPOSE_SPLIT)} gsub)
       SELECT doc_id,
         CASE WHEN gate < 9800 THEN 'train'
              WHEN gate < 9900 THEN 'val'
              ELSE 'test' END AS split
       FROM gates"""

  /** [[PackOps.packSequences]] over documents (budget 2048): a plain
    * window cumsum in id order — the oracle can afford the single-partition
    * form the distributed implementation exists to avoid. Token counts are
    * the text_tokens oracle expression. */
  private def packSequencesOracle: String =
    """WITH tok AS (
         SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT
             AS n_tokens
         FROM documents),
       c AS (
         SELECT doc_id, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER
             (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS BIGINT) AS start_token
         FROM tok)
       SELECT doc_id, n_tokens, start_token,
         CAST(start_token // 2048 AS BIGINT) AS bin_id
       FROM c"""

  private def groupSignatureOracle: String = {
    def mulmod(a: String, c: String): String =
      s"(( (($a) % 4294967296) * $c + " +
        s"((( ($a) // 4294967296) * $c) % 4294967296) * 4294967296 ) % 18446744073709551616)"
    val seed = mulmod("CAST(s.slot AS HUGEINT)", "11400714819323198485")
    s"""WITH toks AS (
         SELECT doc_id, source, list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 0) AS t
         FROM documents),
       sh AS (
         SELECT doc_id, source,
           unnest(CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                ELSE list_transform(generate_series(1, len(t) - 2),
                  i -> array_to_string(t[i:i+2], ' '))
           END) AS shingle
         FROM toks),
       fnv AS (
         SELECT source, shingle,
           list_reduce(
             list_prepend(CAST(14695981039346656037 AS UBIGINT),
               list_transform(range(1, length(shingle) + 1),
                 i -> CAST(unicode(shingle[i]) AS UBIGINT))),
             (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)
                            % 18446744073709551616 AS UBIGINT)
           ) AS base
         FROM sh),
       slotted AS (
         SELECT source, base, s.slot,
           CAST($seed AS UBIGINT) AS seed
         FROM fnv, (SELECT unnest(range(0, 16)) AS slot) s),
       hashed AS (
         SELECT source, slot, ${splitmixSql("xor(base, seed)")} AS hu FROM slotted),
       signedh AS (
         SELECT source, slot,
           CAST(CASE WHEN hu >= 9223372036854775808
                THEN CAST(hu AS HUGEINT) - 18446744073709551616
                ELSE CAST(hu AS HUGEINT) END AS BIGINT) AS hv
         FROM hashed)
       SELECT source, CAST(slot AS INT) AS slot, min(hv) AS min_hash
       FROM signedh GROUP BY source, slot"""
  }

  /** Winnowing (TextOps.winnow, k=8 w=16) as pure SQL: three cases exactly
    * as the Scala — normalized text shorter than k → one FNV fingerprint;
    * k-gram count n ≤ w → one min; else the rightmost-min of each sliding
    * window (signed 64-bit compares). */
  /** Shared CTE prefix of the graph_* oracles: the co-purchase edge set —
    * distinct (order, part) memberships, per-order cap of the
    * [[GraphOps.GROUP_CAP]] SMALLEST part ids (mirrors BoundedMinK), then
    * distinct u < v pairs within an order. */
  private def graphEdgesSql: String =
    s"""op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem),
       kept AS (SELECT g, it FROM (
           SELECT g, it, row_number() OVER (PARTITION BY g ORDER BY it) AS rn
           FROM op) WHERE rn <= ${GraphOps.GROUP_CAP}),
       e AS (SELECT DISTINCT a.it AS u, b.it AS v
             FROM kept a JOIN kept b ON a.g = b.g AND a.it < b.it)"""

  private def winnowOracle: String =
    """WITH norm AS (
         SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
         FROM documents),
       caseA AS (
         SELECT doc_id,
           CAST(CASE WHEN hu >= 9223372036854775808
                THEN CAST(hu AS HUGEINT) - 18446744073709551616
                ELSE CAST(hu AS HUGEINT) END AS BIGINT) AS fp
         FROM (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS UBIGINT),
                 list_transform(range(1, length(s) + 1),
                   i -> CAST(unicode(s[i]) AS UBIGINT))),
               (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)
                              % 18446744073709551616 AS UBIGINT)
             ) AS hu
           FROM norm WHERE length(s) < 8)),
       grams AS (
         SELECT doc_id, gp,
           CAST(CASE WHEN hu >= 9223372036854775808
                THEN CAST(hu AS HUGEINT) - 18446744073709551616
                ELSE CAST(hu AS HUGEINT) END AS BIGINT) AS hv
         FROM (
           SELECT n.doc_id, lat.gp,
             list_reduce(
               list_prepend(CAST(0 AS UBIGINT),
                 list_transform(range(1, 9),
                   j -> CAST(unicode(n.s[lat.gp + j]) AS UBIGINT))),
               (h, c) -> CAST(((CAST(h AS HUGEINT) * 1000003) + c)
                              % 18446744073709551616 AS UBIGINT)
             ) AS hu
           FROM norm n, LATERAL (SELECT unnest(range(0, length(n.s) - 7)) AS gp) lat
           WHERE length(n.s) >= 8)),
       counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       caseB AS (
         SELECT g.doc_id, min(g.hv) AS fp
         FROM grams g JOIN counts c USING (doc_id)
         WHERE c.n <= 16 GROUP BY g.doc_id),
       winmin AS (
         SELECT g.doc_id, w.i, g.gp, g.hv,
           row_number() OVER (PARTITION BY g.doc_id, w.i
             ORDER BY g.hv ASC, g.gp DESC) AS rn
         FROM counts c
         JOIN LATERAL (SELECT unnest(range(0, c.n - 15)) AS i) w ON c.n > 16
         JOIN grams g ON g.doc_id = c.doc_id AND g.gp BETWEEN w.i AND w.i + 15),
       caseC AS (
         SELECT DISTINCT doc_id, gp, hv FROM winmin WHERE rn = 1)
       SELECT doc_id, fp FROM caseA
       UNION ALL SELECT doc_id, fp FROM caseB
       UNION ALL SELECT doc_id, hv AS fp FROM caseC"""

  /** SRP-LSH ANN as exact SQL: the hyperplanes are a pure function of
    * mix64(0x5EED ^ h<<32 ^ i) (SimilarityOps.hyperplane), evaluated here
    * with the same splitmix machinery as [[simhashOracle]]; components are
    * exact in FLOAT ((r & 0x1FFFFF)/2^20 - 1 has ≤21 significant bits), the
    * per-plane dot replicates the Scala loop bit-for-bit (FLOAT×FLOAT
    * product — DuckDB preserves single precision — widened to DOUBLE and
    * accumulated in index order via list_reduce), and the Hamming-1 probe
    * set {b} ∪ {b^(1<<i)} is equivalently `bit_count(xor(bq,bv)) <= 1`. */
  private def annLshOracle: String = {
    val seed = "xor(xor(CAST(24301 AS UBIGINT), " +
      "CAST((t.t * 64 + b.b) AS UBIGINT) * 4294967296), CAST(i.i AS UBIGINT))"
    s"""WITH dims AS (SELECT unnest(range(0, 64)) AS i),
       bits AS (SELECT unnest(range(0, 8)) AS b),
       tbls AS (SELECT unnest(range(0, 8)) AS t),
       comps AS (
         SELECT t.t, b.b, i.i,
           CAST(CAST((${splitmixSql(seed)}) & 2097151 AS DOUBLE) / 1048576.0
                - 1.0 AS FLOAT) AS comp
         FROM tbls t, bits b, dims i),
       planes AS (
         SELECT t, b, list(comp ORDER BY i) AS p FROM comps GROUP BY t, b),
       dots AS (
         SELECT e.vec_id, pl.t, pl.b,
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, 65),
                 j -> CAST(e.embedding[j] * pl.p[j] AS DOUBLE))),
             (a, x) -> a + x) AS dot
         FROM embeddings e, planes pl),
       buckets AS (
         SELECT vec_id, t,
           sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END)::BIGINT AS bucket
         FROM dots GROUP BY vec_id, t),
       qb AS (SELECT vec_id AS q_id, t, bucket FROM buckets WHERE vec_id < 8),
       cand AS (
         SELECT DISTINCT qb.q_id, vb.vec_id
         FROM qb JOIN buckets vb ON qb.t = vb.t
           AND bit_count(xor(qb.bucket::UBIGINT, vb.bucket::UBIGINT)) <= 1
         WHERE vb.vec_id <> qb.q_id),
       scored AS (
         SELECT c.q_id, c.vec_id,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                  CAST(v.embedding AS DOUBLE[])) AS score
         FROM cand c
         JOIN embeddings q ON q.vec_id = c.q_id
         JOIN embeddings v ON v.vec_id = c.vec_id),
       r AS (
         SELECT q_id, vec_id, score,
           row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, vec_id ASC) AS rnk
         FROM scored)
       SELECT q_id, CAST(rnk AS BIGINT) AS rank, vec_id,
         CAST(trunc(score * 1000) AS BIGINT) AS score_permille
       FROM r WHERE rnk <= 10"""
  }

  /** One Lloyd iteration of the IVF oracle: centroids `cin` → `cout`.
    * Assignment = argmax cosine (first cell wins ties, as
    * SimilarityOps.nearestCell); update accumulates the SAME fixed-point
    * longs as the Scala (floor(x·2^20 + 0.5) = Math.round), so the new
    * centroids are bit-identical; empty cells keep the previous centroid. */
  private def lloydIterSql(cin: String, cout: String): String =
    s"""a_$cout AS (
         SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(c.c AS DOUBLE[]),
                        CAST(e.embedding AS DOUBLE[])) DESC,
                      c.cell ASC) AS rn
         FROM embeddings e CROSS JOIN $cin c),
       asg_$cout AS (SELECT vec_id, cell FROM a_$cout WHERE rn = 1),
       sums_$cout AS (
         SELECT s.cell, d.j,
           SUM(CAST(floor(CAST(e.embedding[d.j] AS DOUBLE) * 1048576 + 0.5)
               AS BIGINT)) AS sm,
           COUNT(*) AS n
         FROM asg_$cout s JOIN embeddings e USING (vec_id),
           (SELECT unnest(range(1, 65)) AS j) d
         GROUP BY s.cell, d.j),
       newc_$cout AS (
         SELECT cell, list(CAST(CAST(sm AS DOUBLE) / CAST(n * 1048576 AS DOUBLE)
           AS FLOAT) ORDER BY j) AS c
         FROM sums_$cout GROUP BY cell),
       $cout AS (
         SELECT p.cell, COALESCE(n.c, p.c) AS c
         FROM $cin p LEFT JOIN newc_$cout n USING (cell))"""

  /** IVF ANN as exact SQL: deterministic init (32 lowest-id vectors), three
    * unrolled fixed-point Lloyd iterations ([[lloydIterSql]]), nprobe=4
    * probe cells per query (cosine desc, cell asc), candidates = vectors
    * whose final cell is probed, then the same top-k as brute force. */
  /** Per-vector k-means assignment under the same 3-iteration unrolled
    * fixed-point Lloyd codebook the IVF oracle derives — the vassign CTE
    * promoted to a full query (ties broken toward the lowest cell on both
    * sides). */
  private def embedClustersOracle: String =
    s"""WITH c0 AS (
         SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                embedding AS c
         FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 32)),
       ${lloydIterSql("c0", "c1")},
       ${lloydIterSql("c1", "c2")},
       ${lloydIterSql("c2", "c3")}
       SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM (
         SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(c.c AS DOUBLE[]),
                        CAST(e.embedding AS DOUBLE[])) DESC,
                      c.cell ASC) AS rn
         FROM embeddings e CROSS JOIN c3 c) WHERE rn = 1"""

  private def annIvfOracle: String =
    s"""WITH c0 AS (
         SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                embedding AS c
         FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 32)),
       ${lloydIterSql("c0", "c1")},
       ${lloydIterSql("c1", "c2")},
       ${lloydIterSql("c2", "c3")},
       qp AS (
         SELECT q.vec_id AS q_id, c.cell,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(c.c AS DOUBLE[]),
                        CAST(q.embedding AS DOUBLE[])) DESC,
                      c.cell ASC) AS rn
         FROM embeddings q CROSS JOIN c3 c WHERE q.vec_id < 8),
       probes AS (SELECT q_id, cell FROM qp WHERE rn <= 4),
       vassign AS (
         SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(CAST(c.c AS DOUBLE[]),
                          CAST(e.embedding AS DOUBLE[])) DESC,
                        c.cell ASC) AS rn
           FROM embeddings e CROSS JOIN c3 c) WHERE rn = 1),
       scored AS (
         SELECT p.q_id, v.vec_id,
           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                  CAST(v.embedding AS DOUBLE[])) AS score
         FROM probes p
         JOIN vassign a ON a.cell = p.cell
         JOIN embeddings v ON v.vec_id = a.vec_id AND v.vec_id <> p.q_id
         JOIN embeddings q ON q.vec_id = p.q_id),
       r AS (
         SELECT q_id, vec_id, score,
           row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, vec_id ASC) AS rnk
         FROM scored)
       SELECT q_id, CAST(rnk AS BIGINT) AS rank, vec_id,
         CAST(trunc(score * 1000) AS BIGINT) AS score_permille
       FROM r WHERE rnk <= 10"""

  /** mod-2^64 addition for splitmix seeds (ds + j wraps in the Scala). */
  private def addModSql(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + ($b)) % 18446744073709551616 AS UBIGINT)"

  /** Shared CTE prefix of the multimodal oracles: reconstructs, per page
    * index i < 2000, the media id (FNV-1a of the synthetic url — same SQL
    * FNV as [[simhashOracle]]), the kind routing (id & 3) and the payload
    * seed mix64(id ^ 0x5EEDFACE) — i.e. MultimodalOps.mediaFromPages +
    * synthMedia's parameter arithmetic, independent of the JVM codec code
    * being verified. */
  private def mmBaseSql: String =
    s"""pages AS (SELECT unnest(range(0, $MM_PAGES)) AS i),
       urls AS (SELECT i,
         'https://site' || (i % 1000) || '.example/page/' || i AS url
         FROM pages),
       ids AS (
         SELECT i, list_reduce(
           list_prepend(CAST(14695981039346656037 AS UBIGINT),
             list_transform(range(1, length(url) + 1),
               k -> CAST(unicode(url[k]) AS UBIGINT))),
           (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)
                          % 18446744073709551616 AS UBIGINT)) AS u
         FROM urls),
       m AS (
         SELECT u,
           CAST(CASE WHEN u >= 9223372036854775808
                THEN CAST(u AS HUGEINT) - 18446744073709551616
                ELSE CAST(u AS HUGEINT) END AS BIGINT) AS media_id,
           CASE WHEN (${splitmixSql("u")} & 3) = 1 THEN 'audio'
                WHEN (${splitmixSql("u")} & 3) = 2 THEN 'video'
                ELSE 'image' END AS kind,
           ${splitmixSql(s"xor(u, ${0x5EEDFACEL})")} AS ds
         FROM ids),
       vid AS (SELECT media_id, ds,
           2 + CAST(${splitmixSql("xor(u, 193)")} & 7 AS INT) AS n_frames,
           4 + CAST(${splitmixSql("xor(u, 194)")} & 15 AS INT) AS w,
           4 + CAST(${splitmixSql("xor(u, 195)")} & 15 AS INT) AS h
         FROM m WHERE kind = 'video'),
       vidp AS (SELECT *,
           9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) AS header_len,
           3 * w * h AS frame_data
         FROM vid)"""

  /** mm_features oracle: every feature column the JVM decoder emits is
    * re-derived from the generator's arithmetic (dimensions, header sizes,
    * payload byte/sample sums over the same splitmix64 stream) — the BMP /
    * WAV / PPM encode+decode round trip must reproduce these exactly. */
  private def mmFeaturesOracle: String =
    s"""WITH ${mmBaseSql},
       img AS (SELECT media_id, ds,
           4 + CAST(${splitmixSql("xor(u, 177)")} & 31 AS INT) AS w,
           4 + CAST(${splitmixSql("xor(u, 178)")} & 31 AS INT) AS h
         FROM m WHERE kind = 'image'),
       imgp AS (SELECT media_id, ds, w, h,
           ((3 * w + 3) // 4) * 4 * h AS data_size FROM img),
       imgsum AS (
         SELECT p.media_id,
           CAST(SUM(CAST(${splitmixSql(addModSql("p.ds", "j.j"))} & 255 AS BIGINT)) AS BIGINT) AS content_sum
         FROM imgp p, LATERAL (SELECT unnest(range(0, p.data_size)) AS j) j
         GROUP BY p.media_id),
       imgf AS (
         SELECT p.media_id, 'image' AS kind,
           CAST(54 + p.data_size AS BIGINT) AS byte_len,
           p.w AS width, p.h AS height, 0 AS sample_rate,
           CAST(p.w * p.h AS BIGINT) AS n_units, s.content_sum
         FROM imgp p JOIN imgsum s USING (media_id)),
       aud AS (SELECT media_id, ds,
           8000 + CAST((${splitmixSql("xor(u, 161)")} & 7) * 1000 AS INT) AS sample_rate,
           256 + CAST(${splitmixSql("xor(u, 162)")} & 1023 AS INT) AS n_samples
         FROM m WHERE kind = 'audio'),
       audsum AS (
         SELECT media_id,
           CAST(SUM(CASE WHEN x >= 32768 THEN CAST(x AS BIGINT) - 65536
                    ELSE CAST(x AS BIGINT) END) AS BIGINT) AS content_sum
         FROM (SELECT p.media_id,
                 ${splitmixSql(addModSql("p.ds", "j.j"))} & 65535 AS x
               FROM aud p, LATERAL (SELECT unnest(range(0, p.n_samples)) AS j) j)
         GROUP BY media_id),
       audf AS (
         SELECT p.media_id, 'audio' AS kind,
           CAST(44 + 2 * p.n_samples AS BIGINT) AS byte_len,
           0 AS width, 0 AS height, p.sample_rate,
           CAST(p.n_samples AS BIGINT) AS n_units, s.content_sum
         FROM aud p JOIN audsum s USING (media_id)),
       vidsum AS (
         SELECT p.media_id,
           CAST(SUM(CAST(${splitmixSql(addModSql("p.ds", "j.j"))} & 255 AS BIGINT)) AS BIGINT) AS content_sum
         FROM vidp p, LATERAL
           (SELECT unnest(range(0, p.n_frames * p.frame_data)) AS j) j
         GROUP BY p.media_id),
       vidf AS (
         SELECT p.media_id, 'video' AS kind,
           CAST(p.n_frames * (p.header_len + p.frame_data) AS BIGINT) AS byte_len,
           p.w AS width, p.h AS height, 0 AS sample_rate,
           CAST(p.n_frames AS BIGINT) AS n_units, s.content_sum
         FROM vidp p JOIN vidsum s USING (media_id))
       SELECT * FROM imgf
       UNION ALL SELECT * FROM audf
       UNION ALL SELECT * FROM vidf"""

  /** mm_frames oracle: one row per PPM frame with the exact per-frame
    * pixel-byte sum (payload byte (f,j) = mix64(ds + f·3wh + j) & 255). */
  private def mmFramesOracle: String =
    s"""WITH ${mmBaseSql},
       frames AS (
         SELECT p.media_id, f.f, p.w, p.h, p.ds, p.frame_data
         FROM vidp p, LATERAL (SELECT unnest(range(0, p.n_frames)) AS f) f)
       SELECT fr.media_id, CAST(fr.f AS BIGINT) AS frame,
         fr.w AS width, fr.h AS height,
         CAST(SUM(CAST(${splitmixSql(addModSql("fr.ds", "fr.f * fr.frame_data + j.j"))}
             & 255 AS BIGINT)) AS BIGINT) AS frame_sum
       FROM frames fr, LATERAL (SELECT unnest(range(0, fr.frame_data)) AS j) j
       GROUP BY fr.media_id, fr.f, fr.w, fr.h"""

  /** Static reference-anchored oracle (generated by KgOracleGen, verified
    * against the compiled reference binary — see its scaladoc for the
    * anchoring chain). Loaded from the jar so the multi-MB VALUES relations
    * don't live in source. */
  private def staticOracle(name: String): String = {
    val is = getClass.getResourceAsStream(s"/graft/oracles/$name.sql")
    require(is != null, s"missing static oracle resource $name")
    try new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally is.close()
  }

  private val KG_STATIC_ORACLES = Seq("kg_pred_counts", "kg_errors",
    "kg_roundtrip", "kg_canonical", "kg_triples", "kg_triples_sql",
    "kg_turtle_source", "kg_link", "kg_entity_mentions")

  def oracleSql: Map[String, String] =
    KG_STATIC_ORACLES.map(n => n -> staticOracle(n)).toMap ++ Map(
    // 2-hop path census over the reference-anchored kg_triples VALUES
    // relation (so the oracle's triple set is the reference's, while the
    // engine derives its own) — valid at sf0.01 like every kg_* oracle
    "kg_two_hop" ->
      s"""WITH t0 AS (${staticOracle("kg_triples")}),
         t AS (SELECT DISTINCT subj, pred, obj_value AS obj FROM t0
               WHERE error IS NULL AND subj_kind = 'iri' AND obj_kind = 'iri')
         SELECT x.pred AS p1, y.pred AS p2, count(*) AS n_paths
         FROM t x JOIN t y ON x.obj = y.subj GROUP BY 1, 2""",
    // SRP-LSH / IVF ANN verified end-to-end in SQL (hyperplanes + fixed-
    // point Lloyd's re-derived from the same splitmix64 arithmetic; see
    // annLshOracle/annIvfOracle scaladocs for the bit-equality argument)
    "ann_lsh_topk" -> annLshOracle,
    "ann_ivf_topk" -> annIvfOracle,
    "embed_clusters" -> embedClustersOracle,
    "embed_diverse" ->
      s"""WITH assign AS ($embedClustersOracle),
         r AS (SELECT vec_id, cell,
           CAST(row_number() OVER (PARTITION BY cell ORDER BY vec_id)
                AS BIGINT) AS rk
           FROM assign)
         SELECT vec_id, cell, rk FROM r WHERE rk <= 4""",
    // multimodal decode verified against the generator arithmetic: the
    // oracle recomputes headers/dimensions/sums in SQL from the same
    // splitmix64/FNV streams; the JVM side must ENCODE real BMP/WAV/PPM
    // bytes and DECODE them back to these exact features
    "mm_features" -> mmFeaturesOracle,
    "mm_frames" -> mmFramesOracle,
    // as-of join oracled against DuckDB's NATIVE ASOF JOIN — a genuinely
    // independent implementation of the same semantics (backward
    // inclusive, right side pre-reduced to one row per (user, ts))
    "asof_join" ->
      """WITH purchases AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         clicks AS (
           SELECT user_id, ts, max(event_id) AS click_id FROM events
           WHERE event_type = 'click' GROUP BY user_id, ts)
         SELECT p.event_id, p.user_id, c.click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         FROM purchases p ASOF JOIN clicks c
           ON p.user_id = c.user_id AND p.ts >= c.ts""",
    // bucketized interval join vs the plain inequality join DuckDB runs
    "interval_join" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS start_us FROM events
           WHERE event_type = 'error'),
         c AS (
           SELECT user_id, epoch_us(ts) AS ts_us FROM events
           WHERE event_type = 'click')
         SELECT e.event_id, e.user_id, count(*) AS n_clicks
         FROM e JOIN c
           ON c.user_id = e.user_id
           AND c.ts_us >= e.start_us
           AND c.ts_us < e.start_us + 7200000000
         GROUP BY e.event_id, e.user_id""",
    // deterministic weighted mix: Spark's xxhash64(long) re-derived in SQL
    // (XXH64 single-lane: one wrapped-multiply round + avalanche, seed 42)
    "stats_top_terms" ->
      """WITH tf AS (
           SELECT source, unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0)) AS term
           FROM documents),
         c AS (SELECT source, term, count(*) AS n FROM tf GROUP BY 1, 2),
         r AS (SELECT source, term, n,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY n DESC, term ASC) AS BIGINT) AS rk FROM c)
         SELECT source, term, n, rk FROM r WHERE rk <= 5""",
    // adaptive gate: per-source p25 threshold re-derived with
    // quantile_disc (ceil(q*n) rank semantics, same as stats_quantiles)
    "curate_adaptive" ->
      """WITH thr AS (
           SELECT source, quantile_disc(n_chars, 0.250) AS t
           FROM documents GROUP BY source)
         SELECT d.doc_id, d.source, d.n_chars
         FROM documents d JOIN thr USING (source)
         WHERE d.n_chars >= thr.t""",
    "sketch_hll" -> hllOracle,
    "sketch_cms" -> cmsOracle(),
    // percentile rank: cumulative histogram counts per (source, n_chars),
    // floor(1000*cum/n) in integer arithmetic, joined back per document
    "stats_percentile_rank" ->
      """WITH h AS (
           SELECT source, n_chars AS v, count(*) AS c
           FROM documents GROUP BY 1, 2),
         cum AS (
           SELECT source, v,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
           FROM h)
         SELECT d.doc_id, d.source, d.n_chars,
           CAST((cum.cum * 1000) // cum.n AS BIGINT) AS permille_rank
         FROM documents d
         JOIN cum ON cum.source = d.source AND cum.v = d.n_chars""",
    // token-budget prefix: same whitespace token count as text_tokens,
    // windowed prefix sum per source, inclusive-budget filter
    "mix_budget" ->
      """WITH tok AS (
           SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+'))
             END::BIGINT AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                  AS BIGINT) AS cum_tokens
           FROM tok)
         SELECT doc_id, source, n_tokens, cum_tokens FROM c
         WHERE cum_tokens <= 800""",
    "mix_weighted" -> mixWeightedOracle,
    "mix_splits" -> mixSplitsOracle,
    "mix_stratified" -> mixStratifiedOracle,
    "pack_sequences" -> packSequencesOracle,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty_micro,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_price_micro,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_join_broadcast" ->
      """SELECT n_name, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_total_micro
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q3_window" ->
      """SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS top_price_micro
         FROM (SELECT *, row_number() OVER
           (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn = 1""",
    "q4_sort_limit" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS price_micro
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",
    "q5_setop" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
         EXCEPT
         SELECT c_custkey FROM customer WHERE c_acctbal < 0""",
    "q6_time_agg" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_value_micro
         FROM events GROUP BY 1, 2""",
    "q13_pivot" ->
      """SELECT source,
         CAST(coalesce(sum(n_chars) FILTER (lang = 'de'), 0) AS BIGINT) AS de,
         CAST(coalesce(sum(n_chars) FILTER (lang = 'en'), 0) AS BIGINT) AS en,
         CAST(coalesce(sum(n_chars) FILTER (lang = 'es'), 0) AS BIGINT) AS es,
         CAST(coalesce(sum(n_chars) FILTER (lang = 'fr'), 0) AS BIGINT) AS fr,
         CAST(coalesce(sum(n_chars) FILTER (lang = 'zh'), 0) AS BIGINT) AS zh
         FROM documents GROUP BY source""",
    "q12_profile" ->
      """SELECT l_returnflag, count(*) AS n,
         min(qm) AS min_q, max(qm) AS max_q,
         quantile_cont(qm, 0.25) AS p25,
         quantile_cont(qm, 0.5) AS p50,
         quantile_cont(qm, 0.75) AS p75
         FROM (SELECT l_returnflag,
           CAST(CAST(l_quantity AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS qm
           FROM lineitem)
         GROUP BY l_returnflag""",
    "q7_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
         count(*) AS n_events
         FROM events GROUP BY event_type""",
    "q8_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_orderkey IN
           (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""",
    "q9_anti_join" ->
      // NOT EXISTS (not NOT IN): matches Spark left_anti's NULL semantics —
      // a NULL o_custkey must not blank the whole result
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS
           (SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "q10_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CASE WHEN lag(ts) OVER w IS NULL THEN 0
                  WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 THEN 1
                  ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         sess AS (
           SELECT user_id, sec,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM e)
         SELECT user_id, session_id, count(*) AS n_events,
           CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec
         FROM sess GROUP BY user_id, session_id""",
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty_micro
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "text_tokens" ->
      """SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT AS n_tokens
         FROM documents""",
    "text_quality" ->
      """SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT AS n_tokens,
         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::BIGINT AS n_punct,
         (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::BIGINT AS n_upper,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits,
         len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
           x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as')))::BIGINT AS n_stopwords
         FROM documents""",
    "curate_corpus" ->
      """WITH q AS (
           SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END::BIGINT AS n_tokens,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::BIGINT AS n_punct,
             (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits,
             len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
               x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as')))::BIGINT AS n_stopwords
           FROM documents),
         f AS (SELECT * FROM q WHERE n_tokens >= 10
               AND n_punct * 5 <= n_tokens AND n_digits * 2 <= n_tokens),
         keepers AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text)
         SELECT f.doc_id, n_tokens, n_stopwords FROM f JOIN keepers USING (doc_id)""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper, count(*) AS n_dups
         FROM (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 10 = 0)
         GROUP BY text""",
    // Spark uses lookaround splits (java.util.regex); DuckDB's RE2 has no
    // lookaround, so the oracle inserts spaces at the same class transitions
    // with 4 capture-group replace passes — equivalent segmentation (same-
    // type transitions can never overlap, so sequential passes find all).
    "text_subwords" ->
      """SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                  '([a-zA-Z])([0-9])', '\1 \2', 'g'),
                  '([0-9])([a-zA-Z])', '\1 \2', 'g'),
                  '([a-zA-Z0-9])([^a-zA-Z0-9\s])', '\1 \2', 'g'),
                  '([^a-zA-Z0-9\s])([a-zA-Z0-9])', '\1 \2', 'g')
              ), '\s+')) END AS BIGINT) AS n_subwords
         FROM documents""",
    // marker-occurrence scoring identical to TextOps.langId: per-family sum
    // of non-overlapping marker counts, best (score, code) wins with
    // lexicographically-greatest code breaking ties (greatest(struct(s,c))
    // semantics), 'und' when every score is zero
    "text_langid" ->
      """WITH p AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents),
         s AS (SELECT doc_id, lang,
           CAST((length(t) - length(replace(t, ' the ', ''))) / 5.0
              + (length(t) - length(replace(t, ' and ', ''))) / 5.0
              + (length(t) - length(replace(t, ' of ', ''))) / 4.0
              + (length(t) - length(replace(t, ' to ', ''))) / 4.0
              + (length(t) - length(replace(t, ' is ', ''))) / 4.0 AS BIGINT) AS s_en,
           CAST((length(t) - length(replace(t, ' le ', ''))) / 4.0
              + (length(t) - length(replace(t, ' la ', ''))) / 4.0
              + (length(t) - length(replace(t, ' les ', ''))) / 5.0
              + (length(t) - length(replace(t, ' et ', ''))) / 4.0
              + (length(t) - length(replace(t, ' est ', ''))) / 5.0 AS BIGINT) AS s_fr,
           CAST((length(t) - length(replace(t, ' el ', ''))) / 4.0
              + (length(t) - length(replace(t, ' los ', ''))) / 5.0
              + (length(t) - length(replace(t, ' las ', ''))) / 5.0
              + (length(t) - length(replace(t, ' es ', ''))) / 4.0
              + (length(t) - length(replace(t, ' y ', ''))) / 3.0 AS BIGINT) AS s_es,
           CAST((length(t) - length(replace(t, ' der ', ''))) / 5.0
              + (length(t) - length(replace(t, ' die ', ''))) / 5.0
              + (length(t) - length(replace(t, ' und ', ''))) / 5.0
              + (length(t) - length(replace(t, ' ist ', ''))) / 5.0
              + (length(t) - length(replace(t, ' das ', ''))) / 5.0 AS BIGINT) AS s_de
           FROM p)
         SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_fr, s_es, s_de) <= 0 THEN 'und'
                WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) THEN 'fr'
                WHEN s_es = greatest(s_en, s_fr, s_es, s_de) THEN 'es'
                WHEN s_en = greatest(s_en, s_fr, s_es, s_de) THEN 'en'
                ELSE 'de' END AS lang_pred
         FROM s""",
    "text_fingerprint" ->
      """SELECT doc_id,
         md5(array_to_string(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 0), ' ')) AS fp
         FROM documents""",
    // repetition counters: same tokenization as text_fingerprint; the modal
    // bigram's (n DESC, bg DESC) tie-break mirrors Spark's
    // max(struct(n, bg)); all-ASCII tokens make the string orders identical
    "text_repetition" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         base AS (
           SELECT doc_id, len(t)::BIGINT AS total_words,
             len(list_distinct(t))::BIGINT AS distinct_words, t FROM toks),
         bg AS (
           SELECT doc_id, t[u.g] || ' ' || t[u.g+1] AS bg
           FROM base, UNNEST(range(1, len(t))) AS u(g)),
         cnt AS (
           SELECT doc_id, bg, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
         top AS (
           SELECT doc_id, bg AS top_bigram, n AS top_bigram_n,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY n DESC, bg DESC) AS rn
           FROM cnt)
         SELECT b.doc_id, b.total_words, b.distinct_words,
           t.top_bigram, t.top_bigram_n
         FROM base b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t
           USING (doc_id)""",
    "curate_sources" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
         sum(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT AS n_tokens,
         sum(CASE WHEN length(text) < 150 THEN 1 ELSE 0 END)::BIGINT AS n_short,
         (sum(CASE WHEN length(text) < 150 THEN 1 ELSE 0 END) * 4 <= count(*)) AS kept
         FROM documents GROUP BY source""",
    // chunking: exact integer arithmetic only — ceil via (a + b - 1) // b,
    // 1-based inclusive list slicing on both sides
    "text_chunks" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         base AS (
           SELECT doc_id, t, len(t)::BIGINT AS n FROM toks WHERE len(t) > 0),
         chunks AS (
           SELECT doc_id, n, u.g AS chunk_id,
             t[(u.g*24+1):(CASE WHEN u.g*24+32 < n THEN u.g*24+32 ELSE n END)] AS ct
           FROM base,
             UNNEST(range(0, greatest(1, (n - 8 + 23) // 24))) AS u(g))
         SELECT doc_id, chunk_id::INT AS chunk_id,
           array_to_string(ct, ' ') AS chunk_text,
           len(ct)::BIGINT AS chunk_tokens
         FROM chunks""",
    // PII scrub: patterns restricted to the Java∩RE2 regex subset so the
    // replace/count semantics match byte-for-byte; 'g' flag because DuckDB
    // regexp_replace is first-match-only by default (Spark replaces all)
    "text_pii" ->
      """WITH aug AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-01' || CAST(doc_id AS VARCHAR)
                  || ' ref ' || CAST(doc_id * 1000000 + 123456 AS VARCHAR)
               AS t
           FROM documents)
         SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}\b', '<PHONE>', 'g'),
             '\b[0-9]{6,}\b', '<NUM>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(t,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t,
             '\b[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}\b')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '\b[0-9]{6,}\b')) AS BIGINT)
             AS n_nums
         FROM aug""",
    // LSH near-dup output is oracle-able as ALL-PAIRS exact word-3-gram
    // Jaccard: banding recall is 1.0 on the (deterministic, fixed) sf0.01
    // corpus — measured exhaustively — so the candidate pruning drops
    // nothing the threshold keeps; truncation order replicates the Scala
    // (inter/union)*100 toLong exactly. DuckDB brute-forces the ~151k
    // pairs; Spark never does (that is the point of LSH).
    "dedup_minhash" -> dedupJaccardOracle(50),
    // incremental dedup: same shard/corpus construction, grouped min-id
    // per (length, md5) fingerprint, NOT EXISTS against corpus prints
    "dedup_incremental" ->
      """WITH corpus AS (
           SELECT text FROM documents WHERE doc_id % 5 <> 0),
         shard AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 2000000000, text FROM documents
           WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0
           UNION ALL
           SELECT doc_id + 3000000000, text FROM documents
           WHERE doc_id % 10 = 0),
         g AS (
           SELECT length(text) AS len, md5(text) AS h,
             min(doc_id) AS doc_id, count(*) AS n_shard_dups
           FROM shard GROUP BY 1, 2),
         c AS (SELECT DISTINCT length(text) AS len, md5(text) AS h FROM corpus)
         SELECT g.doc_id, g.n_shard_dups FROM g
         WHERE NOT EXISTS
           (SELECT 1 FROM c WHERE c.len = g.len AND c.h = g.h)""",
    // cluster collapse: the dedup_minhash pair oracle as a subquery CTE,
    // closed under reachability (recursive UNION dedups, cycles fine),
    // min per component, singletons self-mapped
    "dedup_collapse" -> collapseOracle(1),
    // mod-25 subsample: same closure composition with the tractable
    // sampled all-pairs oracle — bench-scale (sf0.1) hash-compare axis
    "dedup_collapse_sampled" -> collapseOracle(25),
    "dedup_ngram_jaccard" -> dedupJaccardOracle(80),
    // same normTokens derivation as text_ngrams; spans as 1-based inclusive
    // list slices t[i:i+9] (10 tokens), keyed by md5 like the engine
    "dedup_spans" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         spans AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 9),
             i -> array_to_string(t[i:i+9], ' '))) AS span
           FROM toks WHERE len(t) >= 10)
         SELECT md5(span) AS span_md5, length(span)::BIGINT AS span_len,
           count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
         FROM spans GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2""",
    // positioned variant of the spans CTE; coverage = distinct token
    // positions under any cross-document duplicated span (interval union)
    "dedup_span_coverage" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         pos AS (
           SELECT doc_id, len(t)::BIGINT AS n_tokens, t,
             unnest(generate_series(1, len(t) - 9)) AS i
           FROM toks WHERE len(t) >= 10),
         spans AS (
           SELECT doc_id, n_tokens, i,
             md5(array_to_string(t[i:i+9], ' ')) AS span_md5
           FROM pos),
         dup AS (
           SELECT span_md5 FROM spans
           GROUP BY span_md5 HAVING count(DISTINCT doc_id) >= 2),
         cov AS (
           SELECT doc_id, n_tokens, unnest(generate_series(i, i + 9)) AS p
           FROM spans JOIN dup USING (span_md5))
         SELECT doc_id, max(n_tokens) AS n_tokens,
           count(DISTINCT p) AS covered_tokens
         FROM cov GROUP BY doc_id""",
    // SimHash verified end-to-end in pure SQL: FNV-1a + the splitmix64
    // finalizer re-implemented with mod-2^64 arithmetic (UBIGINT + HUGEINT
    // split multiplication), per-token bit votes, then ALL-PAIRS Hamming.
    // Equality preconditions (both MEASURED true on the fixed sf0.01
    // corpus the driver compares at): banding recall for Hamming <= 3 is
    // 1.0 by pigeonhole, AND no band bucket exceeds DedupOps.MAX_BUCKET
    // (the cap would otherwise drop intra-bucket pairs the all-pairs
    // oracle emits — same caveat applies to the Jaccard oracles above).
    "dedup_simhash" -> simhashOracle(),
    // sampled variants (doc_id % 25 on both sides): hash-compare coverage
    // at bench scale — verified manually at sf0.1 (BENCH.md)
    "dedup_minhash_sampled" -> dedupJaccardOracle(50, mod = 25),
    "dedup_simhash_sampled" -> simhashOracle(mod = 25),
    // group MinHash sketch verified in SQL: per-shingle FNV base, 16
    // slot-seeded splitmix64 hashes, SIGNED 64-bit minima per (source,slot)
    // — the mergeable-Aggregator output equals a global min by definition
    "dedup_group_signature" -> groupSignatureOracle,
    // co-purchase graph analytics: the oracle derives the SAME edge set
    // (distinct, u < v, per-order cap mirrored as row_number <= cap over
    // ascending part ids — BoundedMinK keeps exactly the cap smallest).
    // Triangles are enumerated id-oriented here vs degree-oriented in
    // GraphOps — the triangle SET is orientation-independent.
    "graph_degrees" ->
      s"""WITH $graphEdgesSql,
         nodes AS (SELECT u AS n FROM e UNION ALL SELECT v FROM e),
         deg AS (SELECT n, count(*) AS dg FROM nodes GROUP BY 1)
         SELECT dg AS degree, count(*) AS n_nodes FROM deg GROUP BY 1""",
    "graph_triangles" ->
      s"""WITH $graphEdgesSql,
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
           FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
           JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         x AS (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri)
         SELECT n AS part_id, count(*) AS n_triangles FROM x GROUP BY 1""",
    // integer-credit PageRank: BIGINT floor division each hop on BOTH
    // sides (DuckDB `//` == Spark DIV for positive operands) — bit-exact,
    // no float summation drift. 3 unrolled iterations, seed 1e9, damp .85.
    "graph_pagerank" ->
      s"""WITH $graphEdgesSql,
         eb AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
         deg AS (SELECT s, count(*) AS dg FROM eb GROUP BY 1),
         r0 AS (SELECT s AS n, CAST(1000000000 AS BIGINT) AS c FROM deg),
         i1 AS (SELECT eb.d AS n, sum((r.c * 85) // (100 * deg.dg)) AS inc
                FROM eb JOIN r0 r ON r.n = eb.s JOIN deg ON deg.s = eb.s
                GROUP BY eb.d),
         r1 AS (SELECT deg.s AS n,
                  CAST(150000000 + coalesce(i1.inc, 0) AS BIGINT) AS c
                FROM deg LEFT JOIN i1 ON i1.n = deg.s),
         i2 AS (SELECT eb.d AS n, sum((r.c * 85) // (100 * deg.dg)) AS inc
                FROM eb JOIN r1 r ON r.n = eb.s JOIN deg ON deg.s = eb.s
                GROUP BY eb.d),
         r2 AS (SELECT deg.s AS n,
                  CAST(150000000 + coalesce(i2.inc, 0) AS BIGINT) AS c
                FROM deg LEFT JOIN i2 ON i2.n = deg.s),
         i3 AS (SELECT eb.d AS n, sum((r.c * 85) // (100 * deg.dg)) AS inc
                FROM eb JOIN r2 r ON r.n = eb.s JOIN deg ON deg.s = eb.s
                GROUP BY eb.d),
         r3 AS (SELECT deg.s AS n,
                  CAST(150000000 + coalesce(i3.inc, 0) AS BIGINT) AS c
                FROM deg LEFT JOIN i3 ON i3.n = deg.s)
         SELECT n AS part_id, c AS credit FROM r3""",
    // connected components as a recursive min-reachability closure:
    // reach(n, r) enumerates every node r reachable from n (UNION dedups
    // across rounds, so cycles terminate); min over r = smallest node id
    // in n's component — the same fixpoint hash-min propagation reaches.
    // Closure size is bounded by sum of component sizes squared — fine at
    // the sf0.01 oracle scale, and the ORACLE only (the engine side never
    // materializes a closure).
    "graph_components" ->
      s"""WITH RECURSIVE $graphEdgesSql,
         sym AS (SELECT u AS s, v AS d FROM e UNION SELECT v, u FROM e),
         reach(n, r) AS (
           SELECT DISTINCT s, s FROM sym
           UNION
           SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.n)
         SELECT n AS part_id, min(r) AS component FROM reach GROUP BY n""",
    // winnowing verified in SQL: k-gram polynomial hashes (wrapping 64-bit),
    // rightmost-min of every sliding window via row_number ordered
    // (hash ASC, pos DESC), distinct selected positions — equals the
    // sequential minIdx!=last dedup because the rightmost-min index is
    // non-decreasing as the window slides
    "text_winnow" -> winnowOracle,
    // collocation stats: unigram marginals computed from a plain unnest
    // (independent of the engine's last-token-marker derivation); bigrams
    // joined as 'w1 w2' strings — tokens are [a-z0-9]+ so the space is
    // unambiguous
    "text_collocations" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         ucnt AS (
           SELECT w, count(*) AS n FROM (SELECT unnest(t) AS w FROM toks)
           GROUP BY 1),
         bi AS (
           SELECT unnest(list_transform(generate_series(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1])) AS b
           FROM toks WHERE len(t) >= 2),
         pcnt AS (
           SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
             count(*) AS n_pair
           FROM bi GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT p.w1, p.w2, p.n_pair, u1.n AS n_w1, u2.n AS n_w2,
           CAST((SELECT sum(n) FROM ucnt) AS BIGINT) AS n_tokens
         FROM pcnt p
         JOIN ucnt u1 ON p.w1 = u1.w
         JOIN ucnt u2 ON p.w2 = u2.w""",
    // exact per-source n_chars quantiles: DuckDB's quantile_disc is
    // rank = ceil(q*n) under exact rational arithmetic (probed at the
    // 0.9*10 / 0.99*100 float-boundary traps), the same spec as
    // StatsOps.groupQuantiles' integer ranks
    "stats_quantiles" ->
      """WITH agg AS (
           SELECT source,
             quantile_disc(n_chars, 0.250) AS q250,
             quantile_disc(n_chars, 0.500) AS q500,
             quantile_disc(n_chars, 0.750) AS q750,
             quantile_disc(n_chars, 0.900) AS q900,
             quantile_disc(n_chars, 0.990) AS q990,
             count(*) AS n_rows
           FROM documents GROUP BY source)
         SELECT source, CAST(q AS BIGINT) AS q_permille,
           CASE q WHEN 250 THEN q250 WHEN 500 THEN q500 WHEN 750 THEN q750
                  WHEN 900 THEN q900 ELSE q990 END AS quantile_value,
           n_rows
         FROM agg, (SELECT unnest([250, 500, 750, 900, 990]) AS q)""",
    // inverted-index stats: df computed FROM the tf relation (rows already
    // distinct (doc, term)) on both sides; minDf = 2 as HAVING
    "text_index_stats" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0)) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
                FROM tf GROUP BY 1 HAVING count(*) >= 2)
         SELECT tf.doc_id, tf.term, tf.tf, df.df, df.cf
         FROM tf JOIN df USING (term)""",
    // rare-trigram rate: same trigram derivation as text_ngrams; rare set
    // = corpus count < 3; left join + integer permille
    "text_oov_rate" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         dt AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
           FROM toks WHERE len(t) >= 3),
         rare AS (
           SELECT tri FROM (SELECT tri, count(*) AS n FROM dt GROUP BY 1)
           WHERE n < 3),
         agg AS (
           SELECT dt.doc_id, count(*) AS n_trigrams,
             CAST(sum(CASE WHEN rare.tri IS NULL THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_rare
           FROM dt LEFT JOIN rare ON rare.tri = dt.tri
           GROUP BY dt.doc_id)
         SELECT doc_id, n_trigrams, n_rare,
           CAST((n_rare * 1000) // n_trigrams AS BIGINT) AS rare_permille
         FROM agg""",
    "text_ngrams" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> length(x) > 0) AS t
           FROM documents),
         tris AS (
           SELECT unnest(list_transform(generate_series(1, len(t) - 2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ngram
           FROM toks WHERE len(t) >= 3)
         SELECT ngram, count(*) AS n FROM tris GROUP BY ngram
         ORDER BY n DESC, ngram ASC LIMIT 100""",
    // decontamination over the same winnow-fingerprint derivation the
    // text_winnow oracle verifies (embedded as a CTE)
    "text_contamination" ->
      s"""WITH fps AS ($winnowOracle),
         bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
         cand AS (SELECT doc_id, fp FROM fps WHERE doc_id % 97 <> 0)
         SELECT c.doc_id, CAST(count(DISTINCT c.fp) AS BIGINT) AS shared_fps
         FROM cand c JOIN bench b USING (fp)
         GROUP BY c.doc_id HAVING count(DISTINCT c.fp) >= 8""",
    // embedding near-dup: all-pairs cosine in DuckDB (multi-table SRP
    // recall is 1.0 for the scaled-copy duplicates, which collide in every
    // table); ROUNDED permille — duplicates sit exactly at cosine 1.0,
    // where truncation is ulp-fragile across engines
    "dedup_embedding" ->
      """WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 1000000000,
                  list_transform(embedding, x -> CAST(x * 1.01 AS FLOAT))
           FROM embeddings WHERE vec_id % 10 = 0),
         pairs AS (
           SELECT a.vec_id AS a, b.vec_id AS b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cos
           FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
         SELECT a, b, CAST(round(cos * 1000) AS BIGINT) AS cos_permille
         FROM pairs WHERE CAST(round(cos * 1000) AS BIGINT) >= 950""",
    // brute-force cosine top-k is exactly expressible: DOUBLE[] casts make
    // DuckDB's list_cosine_similarity accumulate in double like the Scala
    // loop; trunc matches Spark's cast-to-long truncation semantics
    "ann_brute_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qv
                    FROM embeddings WHERE vec_id < 8),
         s AS (SELECT q_id, e.vec_id,
                 list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])) AS score
               FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
         r AS (SELECT q_id, vec_id, score,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY score DESC, vec_id ASC) AS rnk
               FROM s)
         SELECT q_id, CAST(rnk AS BIGINT) AS rank, vec_id,
                CAST(trunc(score * 1000) AS BIGINT) AS score_permille
         FROM r WHERE rnk <= 10""")
}
