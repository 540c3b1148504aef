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

  /** Uniform deterministic bucket in [0, BUCKETS) from the row key. */
  def gate(key: Column): Column = pmod(xxhash64(key), lit(BUCKETS))

  private def quantized(m: Map[String, Double]): Column =
    typedLit(m.map { case (k, v) => k -> math.round(v * BUCKETS) })

  /** Keep each row with its stratum's probability (strata missing from
    * `rates` are dropped). A narrow filter — no shuffle, pushes past
    * column pruning to the scan. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double]): DataFrame =
    df.filter(gate(key) < coalesce(try_element_at(quantized(rates), strata),
      lit(0L)))

  /** Weighted mix with fractional epochs: weight 2.7 emits 2 copies of
    * every row plus a third copy for a deterministic 70% of keys; weight
    * 0.25 keeps 25% of rows; strata missing from `weights` are dropped.
    * Adds `copyCol` (0-based replica index) so downstream shuffles spread
    * replicas. Narrow (generate-only) — no shuffle. */
  def weightedMix(df: DataFrame, strata: Column, key: Column,
      weights: Map[String, Double], copyCol: String = "copy"): DataFrame = {
    val wq = coalesce(try_element_at(quantized(weights), strata), lit(0L))
    // integer floor/remainder split of the quantized weight: wq = full
    // epochs * BUCKETS + fractional gate threshold
    val frac = pmod(wq, lit(BUCKETS))
    val full = (wq - frac) / lit(BUCKETS) // exact: numerator is a multiple
    val copies = full.cast("long") +
      when(gate(key) < frac, lit(1L)).otherwise(lit(0L))
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }
}
