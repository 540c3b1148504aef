package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.kg.PagesSource.{fnv64, mix64}

/** Deduplication operators for training-data curation over `documents`.
  *
  * Four families, each with the scale-path shape:
  *  - exact: hash-groupBy on content (partial agg map-side; one shuffle)
  *  - MinHash+LSH: shingle → minhash → band → self-join on band key —
  *    candidate pairs only, never O(n²)
  *  - SimHash: 64-bit signature, banded into 4×16-bit keys → Hamming-near
  *    pairs collide on ≥1 band (pigeonhole, ≤3 bit flips)
  *  - n-gram Jaccard: exact verification on LSH candidates
  */
object DedupOps {

  /** Exact dedup: one keeper doc per distinct text. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
      .select(col("keeper"), col("n_dups"))

  // ---- MinHash + LSH ---------------------------------------------------

  val NUM_HASHES = 16
  val BAND_ROWS = 4
  val NUM_BANDS = NUM_HASHES / BAND_ROWS

  /** Per-(band,key) bucket membership cap for the LSH self-joins. Without a
    * cap, a corpus with k identical boilerplate documents puts all k in one
    * bucket → O(k²) candidate pairs (the classic Common-Crawl blowup). With
    * the cap, a bucket contributes at most cap·(cap-1)/2 pairs; members of a
    * hot bucket beyond the cap still pair with the kept ones through their
    * OTHER bands, so duplicate CLUSTERS are usually still discovered — only
    * redundant intra-clique pairs are dropped.
    *
    * Measured recall vs the exact all-pairs oracle at sf0.1 (5,000 docs;
    * `graft.ops.BucketProbe` census, round 4):
    *  - minhash: 818/821 pairs (99.6%) with ZERO buckets over the cap
    *    (max bucket 4) — the 3 missing pairs are inherent banded-LSH
    *    near-threshold recall (P[share a band] = 1-(1-s^r)^b < 1 just
    *    above the Jaccard threshold), NOT cap loss;
    *  - simhash: 1,430/2,059 pairs (69%) with 27 buckets over the cap
    *    (max 240) on this deliberately tiny synthetic vocabulary — the
    *    cap breaks the 4-band pigeonhole guarantee for pairs whose only
    *    agreeing band is hot. The drop count is observable per run via
    *    the `observe()` metric below; a deployment that needs full
    *    boilerplate-clique recall raises the cap or clusters hot buckets
    *    by chaining instead of pairing.
    * The sf0.01 driver-oracle corpus has no bucket near the cap
    * (precondition test in OpsSpec), so the hash-exact gate is unaffected. */
  val MAX_BUCKET = 64

  /** Cap LSH bucket membership at `cap` rows per key (deterministic keep
    * set: lowest ids). NOT silent: every action on the result reports the
    * number of dropped rows as the named observed metric `metricName`
    * (visible to QueryExecutionListeners and the Spark UI). */
  def capBuckets(bands: DataFrame, keyCols: Seq[String], idCol: String,
      cap: Int, metricName: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    bands.withColumn("_rn", row_number().over(w))
      .observe(metricName,
        sum(when(col("_rn") > cap, 1L).otherwise(0L)).as("dropped_rows"))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  def wordShingles(text: String, k: Int = 3): Array[String] = {
    val safe = if (text == null) "" else text // null text = empty doc, not an NPE
    val toks = safe.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length <= k) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - k + 1)(i => toks.slice(i, i + k).mkString(" "))
  }

  def minhashSig(sh: Array[String]): Array[Long] = minhashSig(sh, NUM_HASHES)

  /** MinHash signature: min over shingles of h_i(s), h_i = mix64(fnv(s)^seed_i).
    * Shared by document dedup and entity-linking LSH (different widths). */
  def minhashSig(sh: Array[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = fnv64(sh(i))
      var h = 0
      while (h < numHashes) {
        val v = mix64(base ^ (h * 0x9E3779B97F4A7C15L))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** (bandId, FNV-folded band hash) LSH blocking keys for a signature. */
  def bandKeys(sig: Array[Long], numBands: Int, bandRows: Int): Array[(Int, Long)] =
    Array.tabulate(numBands) { b =>
      var h = 0xCBF29CE484222325L
      var r = 0
      while (r < bandRows) {
        h = (h ^ sig(b * bandRows + r)) * 0x100000001B3L
        r += 1
      }
      (b, h)
    }

  /** Exact Jaccard of two shingle sets. */
  def jaccardSets(a: Array[String], b: Array[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Near-duplicate pairs via MinHash banding, verified with exact n-gram
    * Jaccard. Returns (a, b, jacc_pct) with a < b; jacc_pct an integer
    * percentage (stable for hashing). */
  def minhashDedup(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    val docs = documents.select($"doc_id".cast("long"), $"text").as[(Long, String)]
    val bandsDs = docs.flatMap { case (id, text) =>
      val sig = minhashSig(wordShingles(text))
      bandKeys(sig, NUM_BANDS, BAND_ROWS).iterator.map { case (b, h) => (id, b, h) }
    }.toDF("doc_id", "band", "bandhash")

    val capped = capBuckets(bandsDs, Seq("band", "bandhash"), "doc_id",
      MAX_BUCKET, "minhash_lsh_bucket_cap")

    val cand = capped.as("l").join(capped.as("r"),
        $"l.band" === $"r.band" && $"l.bandhash" === $"r.bandhash" &&
          $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("a"), $"r.doc_id".as("b")).distinct()

    verifyJaccard(cand, documents, threshold)
  }

  /** Exact word-3-gram Jaccard verification of candidate (a,b) pairs. */
  def verifyJaccard(cand: DataFrame, documents: DataFrame, threshold: Double): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val texts = documents.select($"doc_id".cast("long"), $"text")
    val joined = cand
      .join(texts.withColumnRenamed("doc_id", "a").withColumnRenamed("text", "ta"), "a")
      .join(texts.withColumnRenamed("doc_id", "b").withColumnRenamed("text", "tb"), "b")
      .as[(Long, Long, String, String)]
    joined.map { case (b, a, ta, tb) =>
      val j = jaccardSets(wordShingles(ta), wordShingles(tb))
      (a, b, (j * 100).toLong)
    }.toDF("a", "b", "jacc_pct")
      .filter($"jacc_pct" >= (threshold * 100).toLong)
  }

  // ---- SimHash -----------------------------------------------------------

  def simhash64(text: String): Long = {
    val safe = if (text == null) "" else text
    val toks = safe.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = mix64(fnv64(toks(i)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, blocked on
    * 4×16-bit bands (any pair within Hamming 3 shares >=1 intact band). */
  def simhashDedup(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sigs = documents.select($"doc_id".cast("long"), $"text")
      .as[(Long, String)]
      .map { case (id, t) => (id, simhash64(t)) }
      .toDF("doc_id", "sig")

    val bandedRaw = sigs.select($"doc_id", $"sig",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright($"sig", b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band", $"bk.key")

    val banded = capBuckets(bandedRaw, Seq("band", "key"), "doc_id",
      MAX_BUCKET, "simhash_lsh_bucket_cap")

    val pairs = banded.as("l").join(banded.as("r"),
        $"l.band" === $"r.band" && $"l.key" === $"r.key" &&
          $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("a"), $"r.doc_id".as("b"),
        $"l.sig".as("sa"), $"r.sig".as("sb")).distinct()

    pairs
      .withColumn("hamming", bit_count($"sa".bitwiseXOR($"sb")))
      .filter($"hamming" <= maxHamming)
      .select($"a", $"b", $"hamming".cast("long").as("hamming"))
  }

  /** n-gram Jaccard dedup: LSH candidates verified at a high threshold. */
  def ngramJaccardDedup(documents: DataFrame, threshold: Double = 0.8): DataFrame =
    minhashDedup(documents, threshold)
}
