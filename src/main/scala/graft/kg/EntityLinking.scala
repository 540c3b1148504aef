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
  *     exact Jaccard, best match per mention picked by a deterministic
  *     `max(struct(jaccard, entity))` aggregation (no window needed).
  *
  * At 10^12-document scale the mention side never shuffles: both joins are
  * broadcast (dict and dict-bands are bounded by vocabulary size, not corpus
  * size). The only wide op is the final per-mention groupBy, keyed by
  * (url, surface) — uniformly distributed by construction of url.
  */
object EntityLinking {

  val NUM_HASHES = 12
  val BAND_ROWS = 3
  val NUM_BANDS = NUM_HASHES / BAND_ROWS
  val JACCARD_THRESHOLD = 0.35

  /** Size gate for collecting the per-norm LSH match table to the driver
    * (strings; 2M rows ≈ low hundreds of MB — stay well under that). */
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
    * predicate. Pure projection, no shuffle — and expressed as column ops
    * BEFORE the typed map so filter/projection push down to the (parquet)
    * triple source; the typed map runs on two pruned columns only. */
  def mentions(triples: Dataset[TripleRow]): Dataset[Mention] = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.toDF()
      .filter($"error".isNull && $"pred" === PagesSource.MENTIONS_PRED &&
        $"obj_kind" === "literal")
      .select($"url", $"obj_value")
      .as[(String, String)]
      .map { case (url, sv) => Mention(url, sv, normalize(sv)) }
  }

  /** Link mentions against the dictionary. Returns one row per mention that
    * found a match (exact preferred over lsh). */
  def link(mentions: Dataset[Mention], dict: Dataset[DictEntry]): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._

    val dictDf = dict.toDF("dict_surface", "entity_iri")

    // LSH near-matching runs per DISTINCT normalized surface, not per
    // mention occurrence. Candidate generation and Jaccard verification
    // cost is inherently per-surface-form; running it per occurrence
    // multiplies the band-collision blowup by corpus size. The distinct-norm
    // set is vocabulary-shaped (zipf), so this turns an O(mentions ×
    // collisions) explosion into O(|distinct norms| × collisions).
    // distinct() partial-aggregates map-side: one cheap pass.
    val missNorms = mentions.toDF().select($"norm").distinct()
      .join(broadcast(dictDf), $"norm" === $"dict_surface", "left_anti")
      .as[String]

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

    // bestPerNorm is bounded by corpus-distinct near-miss norms that
    // matched the dictionary — usually vocabulary-ish but not structurally
    // bounded. Size-gate with a capped collect (same pattern as the CC
    // local path): under the cap the result becomes a LOCAL relation, so
    // the mention-stream join below is a guaranteed broadcast with no
    // mention-side shuffle and no recompute of the distinct-norm pass;
    // over the cap, fall back to the distributed plan and let AQE decide.
    val bestRows = bestPerNormPlan
      .limit(MAX_LOCAL_NORM_MATCHES + 1).as[(String, String)].collect()
    val bestPerNorm =
      if (bestRows.length <= MAX_LOCAL_NORM_MATCHES)
        broadcast(spark.createDataset(bestRows.toSeq).toDF("norm", "lsh_iri"))
      else bestPerNormPlan

    // ONE pass over the mention stream: the exact dictionary is a broadcast
    // lookup (vocabulary-bounded by construction).
    mentions.toDF()
      .join(broadcast(dictDf), $"norm" === $"dict_surface", "left")
      .join(bestPerNorm, Seq("norm"), "left")
      .filter($"entity_iri".isNotNull || $"lsh_iri".isNotNull)
      .select($"url", $"surface",
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
