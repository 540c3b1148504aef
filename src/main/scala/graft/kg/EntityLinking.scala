package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import Model._

/** Mention detection + dictionary entity linking (SURVEY.md §2.5).
  *
  * Two-phase, Spark-first:
  *  1. EXACT: normalized-surface equi-join against the dictionary. The
  *     dictionary is tiny relative to the corpus → `broadcast()` — no
  *     shuffle of the (huge) mention side.
  *  2. LSH fallback for near-matches: MinHash over character-3-gram shingles,
  *     banded (b bands × r rows) so that near-duplicate surfaces collide on
  *     at least one band key with high probability; candidates verified with
  *     exact Jaccard, best match per surface picked by a deterministic
  *     `max(struct(jaccard, entity))` aggregation (no window needed).
  *
  * Round-3 shape: EVERYTHING per-surface-form (normalize lambda, MinHash,
  * banding, Jaccard) runs on the distinct-surface relation — vocabulary-
  * scale — and folds into one size-gated (surface → entity, method) map.
  * The mention OCCURRENCE stream (corpus-scale: 10^12 rows at target) is
  * touched by exactly two codegen'd column plans: one map-side-combined
  * distinct() and one broadcast-probe projection. No occurrence-side
  * shuffle, no occurrence-side lambdas.
  */
object EntityLinking {

  val NUM_HASHES = 12
  val BAND_ROWS = 3
  val NUM_BANDS = NUM_HASHES / BAND_ROWS
  val JACCARD_THRESHOLD = 0.35

  /** Size gate (rows) for the driver-local linking path: both the
    * distinct-surface set and the dictionary must fit (strings; 2M rows ≈
    * low hundreds of MB — stay well under driver heap). */
  val MAX_LOCAL_NORM_MATCHES = 2000000

  def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)
      .map(c => if (c.isLetterOrDigit) c else ' ')
      .split("\\s+").filter(_.nonEmpty).mkString(" ")

  def shingles(norm: String, k: Int = 3): Array[String] =
    // short norms hash as a single whole-string shingle
    if (norm.length <= k) Array(norm)
    else Array.tabulate(norm.length - k + 1)(i => norm.substring(i, i + k))

  /** MinHash / banding / Jaccard shared with DedupOps (same math, linking
    * widths: 12 hashes x 3-row bands). */
  def minhash(sh: Array[String]): Array[Long] =
    graft.ops.DedupOps.minhashSig(sh, NUM_HASHES)

  def bands(sig: Array[Long]): Array[(Int, Long)] =
    graft.ops.DedupOps.bandKeys(sig, NUM_BANDS, BAND_ROWS)

  def jaccard(a: Array[String], b: Array[String]): Double =
    graft.ops.DedupOps.jaccardSets(a, b)

  /** Detect mentions in the triple stream: literal objects of the mention
    * predicate. PURE column projection — no typed map, no shuffle: the
    * filter and two-column projection push down to the (parquet) triple
    * source and the pass stays inside whole-stage codegen. Normalization
    * deliberately does NOT happen here: it runs per DISTINCT surface
    * inside [[link]] — at 10^12 mentions a per-occurrence normalize
    * lambda was the occurrence stream's only non-codegen operator. */
  def mentions(triples: Dataset[TripleRow]): DataFrame =
    triples.toDF()
      .filter(col("error").isNull && col("pred") === PagesSource.MENTIONS_PRED &&
        col("obj_kind") === "literal")
      .select(col("url"), col("obj_value").as("surface"))

  /** Link mentions `(url, surface)` against the dictionary. Returns one row
    * per mention occurrence that found a match (exact preferred over lsh).
    *
    * ALL per-surface-form work — normalization, MinHash, banding, Jaccard
    * verification — runs on the DISTINCT surface set (vocabulary-shaped,
    * zipf), never per occurrence: the result is a (surface → entity) map
    * that the occurrence stream consumes with a single broadcast join. The
    * occurrence-scale passes are therefore one distinct() (map-side
    * combined) and one broadcast-join projection, both codegen'd column
    * plans with zero lambdas. */
  def link(mentions: DataFrame, dict: Dataset[DictEntry],
      maxLocal: Int = MAX_LOCAL_NORM_MATCHES): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._

    // ONE capped collect doubles as the size-gate probe AND the data fetch
    // (CollectLimit over the map-side-combined distinct short-circuits).
    // Both the distinct-surface set and the dictionary must fit the gate
    // for the local path; the dictionary already has to fit the driver for
    // the exact phase's broadcast join either way.
    val distinctSurfaces = mentions.select($"surface").distinct()
    val surfProbe = distinctSurfaces.limit(maxLocal + 1).as[String].collect()
    val dictProbe =
      if (surfProbe.length <= maxLocal) dict.limit(maxLocal + 1).collect()
      else Array.empty[DictEntry]

    val surfaceMap: DataFrame =
      if (surfProbe.length <= maxLocal && dictProbe.length <= maxLocal)
        broadcast(spark.createDataset(
            localSurfaceMap(surfProbe, dictProbe).toSeq)
          .toDF("surface", "entity_iri", "method"))
      else distributedSurfaceMap(distinctSurfaces, dict)

    // ONE pass over the mention occurrence stream: a broadcast hash probe
    // on the raw surface string — no normalize, no lambdas.
    mentions
      .join(surfaceMap, Seq("surface"))
      .select($"url", $"surface", $"entity_iri", $"method")
  }

  /** Driver-local (surface → entity, method) map — the under-gate path.
    * The whole linking decision is a pure function of (distinct surfaces,
    * dictionary), both vocabulary-scale here; computing it locally
    * replaces ~10 tiny scheduler stages (distinct → normalize → exact
    * join → anti join → band flatMaps → band join → dedup → UDF → groupBy
    * → collect) — the same tiny-data-wants-a-local-algorithm trade as
    * Canonicalize's union-find path. Semantics are identical to
    * [[distributedSurfaceMap]] (tested both ways): exact matches emit one
    * row per matching dict entry; misses take the best LSH candidate by
    * (jaccard, iri) — the tuple ordering Spark's
    * max(struct(jaccard, cand_iri)) applies.
    *
    * Cost at the gate: per-surface normalize+MinHash+banding is ~1-10 µs,
    * so at the 2M-surface gate the map is seconds of CPU, NOT microseconds
    * — which is why the two hot loops (dictionary banding, per-surface
    * matching) run on parallel streams over the driver's cores. The result
    * is index-assembled, so output order (and therefore the broadcast
    * relation) is bit-identical to the sequential computation. */
  private[kg] def localSurfaceMap(surfaces: Array[String],
      dictArr: Array[DictEntry]): Array[(String, String, String)] = {
    val byNorm = dictArr.groupBy(_.surface)
    // dictionary banding: the MinHash per entry dominates → parallel map
    // into a fixed slot per entry, then one cheap sequential groupBy
    val dictBands = new Array[Array[((Int, Long), DictEntry)]](dictArr.length)
    java.util.stream.IntStream.range(0, dictArr.length).parallel().forEach { i =>
      val d = dictArr(i)
      dictBands(i) = bands(minhash(shingles(d.surface))).map(bh => bh -> d)
    }
    val bandIdx = dictBands.iterator.flatten.toArray
      .groupBy(_._1).map { case (bh, es) => bh -> es.map(_._2) }
    val out = new Array[Seq[(String, String, String)]](surfaces.length)
    java.util.stream.IntStream.range(0, surfaces.length).parallel().forEach { i =>
      val s = surfaces(i)
      val norm = normalize(s)
      out(i) = byNorm.get(norm) match {
        case Some(entries) =>
          entries.toSeq.map(e => (s, e.entity_iri, "exact"))
        case None =>
          val nsh = shingles(norm)
          val scored = bands(minhash(nsh))
            .flatMap(bh => bandIdx.getOrElse(bh, Array.empty[DictEntry]))
            .distinct
            .map(d => (jaccard(nsh, shingles(d.surface)), d.entity_iri))
            .filter(_._1 >= JACCARD_THRESHOLD)
          if (scored.isEmpty) Nil else List((s, scored.max._2, "lsh"))
      }
    }
    out.flatten
  }

  /** The at-scale path: the same decision as [[localSurfaceMap]] as a
    * distributed plan (used verbatim when the distinct-surface set or the
    * dictionary exceeds the local gate). */
  private def distributedSurfaceMap(distinctSurfaces: DataFrame,
      dict: Dataset[DictEntry]): DataFrame = {
    val spark = distinctSurfaces.sparkSession
    import spark.implicits._

    val dictDf = dict.toDF("dict_surface", "entity_iri")

    // the one typed map in the stage, on distinct surfaces only
    val surfaceNorm = distinctSurfaces
      .as[String].map(s => (s, normalize(s))).toDF("surface", "norm")

    val exact = surfaceNorm
      .join(broadcast(dictDf), $"norm" === $"dict_surface", "left")
      .select($"surface", $"norm", $"entity_iri")

    val missNorms = exact.filter($"entity_iri".isNull)
      .select($"norm").distinct().as[String]

    val normBands = missNorms.flatMap { norm =>
      bands(minhash(shingles(norm))).iterator.map { case (b, h) => (norm, b, h) }
    }.toDF("norm", "band", "bandhash")

    // dictionary bands are a pure function of the vocabulary — computed
    // DISTRIBUTED (a real linker dictionary has 10^7 surfaces; collecting
    // it to the driver to band it would bottleneck driver memory and
    // serialization). No forced broadcast on the band join either: a
    // forced hint would pull NUM_BANDS×|dict| rows through the driver —
    // the same at-scale OOM class the hint removal elsewhere fixes. AQE
    // broadcasts when runtime stats fit the threshold (they do for small
    // dictionaries), else shuffles both band-keyed sides.
    val dictBands = dict.flatMap { dEntry =>
      bands(minhash(shingles(dEntry.surface))).iterator.map { case (b, h) =>
        (dEntry.surface, dEntry.entity_iri, b, h)
      }
    }.toDF("dict_surface", "cand_iri", "band", "bandhash")

    val jac = udf((a: String, b: String) => jaccard(shingles(a), shingles(b)))

    // best entity per distinct norm (deterministic: lexicographic max of
    // (jaccard, entity)); vocabulary-bounded → broadcast back to mentions
    val bestPerNormPlan = normBands
      .join(dictBands, Seq("band", "bandhash"))
      .select($"norm", $"dict_surface", $"cand_iri").distinct()
      .withColumn("jaccard", jac($"norm", $"dict_surface"))
      .filter($"jaccard" >= JACCARD_THRESHOLD)
      .groupBy($"norm")
      .agg(max(struct($"jaccard", $"cand_iri")).as("best"))
      .select($"norm", $"best.cand_iri".as("lsh_iri"))

    // exact matches preferred over LSH. Both branches derive from the same
    // distinct shuffle — ReusedExchange executes it once.
    exact
      .join(bestPerNormPlan, Seq("norm"), "left")
      .filter($"entity_iri".isNotNull || $"lsh_iri".isNotNull)
      .select($"surface",
        coalesce($"entity_iri", $"lsh_iri").as("entity_iri"),
        when($"entity_iri".isNotNull, lit("exact")).otherwise(lit("lsh"))
          .as("method"))
  }

  /** End-to-end: triples → linked mentions. */
  def run(triples: Dataset[TripleRow]): DataFrame = {
    val spark = triples.sparkSession
    link(mentions(triples), PagesSource.dictionary(spark))
  }
}
