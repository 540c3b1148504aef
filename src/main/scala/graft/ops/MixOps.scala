package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing: stratified sampling and weighted
  * replication ("epochs") per stratum — the operators that turn a curated
  * pool into a training mixture with fixed per-source proportions.
  *
  * All decisions are a pure function of the row key via `xxhash64`
  * (codegen'd, no RNG): re-running the job, re-partitioning the input, or
  * retrying a stage can never change which rows are kept or how often —
  * the property `rand()`-based sampling loses on stage retry. Rates are
  * quantized to 1e-4 (integer basis points of basis points) so the gate
  * compare is integer-exact on both engine and oracle sides.
  */
object MixOps {

  /** Gate resolution: rates/weights are quantized to 1/10000. */
  val BUCKETS = 10000L

  /** Purpose salts: each decision kind hashes (key, purpose), not the bare
    * key — otherwise composed decisions on the same key are perfectly
    * correlated (e.g. a 98% sample followed by a 98/1/1 split would leave
    * val and test EMPTY, because the dropped 2% and the non-train 2% would
    * be exactly the same gate range). */
  val PURPOSE_SAMPLE = 1L
  val PURPOSE_MIX = 2L
  val PURPOSE_SPLIT = 3L

  /** Uniform deterministic bucket in [0, BUCKETS) from (row key, purpose):
    * Spark chains multi-arg xxhash64 as hash(purpose, seed = hash(key, 42)),
    * so distinct purposes give independent buckets for the same key. */
  def gate(key: Column, purpose: Long): Column =
    pmod(xxhash64(key, lit(purpose)), lit(BUCKETS))

  private def quantized(m: Map[String, Double]): Column =
    typedLit(m.map { case (k, v) => k -> math.round(v * BUCKETS) })

  /** Token-budget selection: the deterministic prefix of each source (by
    * doc_id order) whose cumulative token count fits the budget — how a
    * training mixture caps a source's contribution in TOKENS rather than
    * documents (budget semantics: a document is kept iff the running total
    * INCLUDING it is within budget). Output carries (n_tokens, cum_tokens)
    * for mixture accounting.
    *
    * Scale shape: the windowed prefix sum runs over the 3-column
    * (doc_id, source, n_tokens) projection — ~24 bytes/row crosses the
    * source-keyed shuffle, never text. The per-source sort is inherent to
    * DETERMINISTIC budgeting (a reproducible mixture needs a total order);
    * a run that doesn't care which documents fill the budget could use a
    * count-based two-phase cut instead and skip the sort. */
  def budgetSelect(documents: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    documents
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  /** Keep each row with its stratum's probability (strata missing from
    * `rates` are dropped). A narrow filter — no shuffle, pushes past
    * column pruning to the scan. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double]): DataFrame =
    df.filter(gate(key, PURPOSE_SAMPLE) <
      coalesce(try_element_at(quantized(rates), strata), lit(0L)))

  /** Deterministic train/val/test split assignment: the gate bucket maps
    * to consecutive ranges sized by `fractions` (in listed order, last
    * split absorbs rounding). A pure function of the key — re-runs,
    * repartitions, and incremental corpus growth never move an existing
    * row between splits (the property that prevents eval-set leakage when
    * a corpus is re-snapshotted). Narrow projection, no shuffle. */
  def assignSplit(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fractions")
    val g = gate(key, PURPOSE_SPLIT)
    val bounds = fractions.map(_._2).scanLeft(0L) {
      (acc, f) => acc + math.round(f * BUCKETS)
    }.tail
    fractions.init.zip(bounds).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), bound), fallback) => when(g < bound, name).otherwise(fallback)
    }
  }

  /** Weighted mix with fractional epochs: weight 2.7 emits 2 copies of
    * every row plus a third copy for a deterministic 70% of keys; weight
    * 0.25 keeps 25% of rows; strata missing from `weights` are dropped.
    * Adds `copyCol` (0-based replica index) so downstream shuffles spread
    * replicas. Narrow (generate-only) — no shuffle. */
  def weightedMix(df: DataFrame, strata: Column, key: Column,
      weights: Map[String, Double], copyCol: String = "copy"): DataFrame = {
    // withColumn silently REPLACES a same-named input column — a collision
    // would corrupt pass-through data, so refuse it loudly. Spark resolves
    // column names case-INSENSITIVELY by default, so the guard must too
    // (an input column 'Copy' would otherwise be silently replaced)
    val lower = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    require(!lower.contains(copyCol.toLowerCase(java.util.Locale.ROOT)) &&
        !lower.contains("__n_copies"),
      s"weightedMix adds columns '$copyCol' and '__n_copies'; the input " +
        "already has one of them (case-insensitive) — rename it or pass a " +
        "different copyCol")
    val wq = coalesce(try_element_at(quantized(weights), strata), lit(0L))
    // integer floor/remainder split of the quantized weight: wq = full
    // epochs * BUCKETS + fractional gate threshold
    val frac = pmod(wq, lit(BUCKETS))
    val full = (wq - frac) / lit(BUCKETS) // exact: numerator is a multiple
    val copies = full.cast("long") +
      when(gate(key, PURPOSE_MIX) < frac, lit(1L)).otherwise(lit(0L))
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }
}
