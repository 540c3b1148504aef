package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north_rule: "partitioning / shuffle / skew handled
  * explicitly"). AQE's skew-join splitting covers sort-merge paths at
  * runtime; these utilities handle the cases AQE can't: skewed shuffle joins
  * where the small side must be replicated, and the general salted-key
  * pattern for hot aggregation keys.
  */
object SkewOps {

  /** Join `big` (skewed on `key`) with `small` by salting: the big side gets
    * a random-but-deterministic salt in [0, salt), the small side is
    * replicated `salt` times, and the join key becomes (key, salt). Each hot
    * key's rows spread over `salt` reducers instead of one.
    *
    * Use when `small` is too big to broadcast but tiny relative to `big`
    * (replication cost = |small| × salt rows).
    *
    * Equivalence-preserving ONLY for inner/left/left_semi: with right/full
    * joins every unmatched small-side row would be emitted once per salt
    * replica (duplicate output rows), so those types are rejected. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 8, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"saltedJoin is equivalence-preserving only for $allowed, got $joinType")
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salt)).cast("int"))
    val saltsDf = small.sparkSession.range(0, salt)
      .select(col("id").cast("int").as("_salt"))
    val smallSalted = small.crossJoin(saltsDf)
    bigSalted.join(smallSalted, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase aggregation for a skewed group key: pre-aggregate on
    * (key, salt) — spreading each hot key over `salt` partial groups — then
    * combine. Spark's hash aggregate already does map-side partials; the
    * explicit salt additionally splits a hot key ACROSS reducers when a
    * single reducer's final-merge state would be the bottleneck (e.g.
    * count-distinct-style states, collect-style aggregates). */
  def saltedCount(df: DataFrame, key: Column, salt: Int = 16): DataFrame = {
    // salt from a content hash (as saltedJoin does), NOT rand(seed): seeded
    // rand is deterministic only per partition LAYOUT, so a stage retry
    // under a different partitioning would re-salt rows differently —
    // harmless for a pure count (salt only routes) but it makes plans
    // non-reproducible run-to-run. xxhash64 over all input columns is a
    // pure row function: same rows → same salt under any partitioning.
    //
    // LIMIT of the pure-row-function approach: if a hot key's rows are
    // BYTE-IDENTICAL across every column (e.g. the caller pre-projected df
    // to just the key), they all hash to one salt value and the two-phase
    // spread degenerates to a single reducer for that key — results stay
    // correct, only the skew mitigation is lost. Callers must keep at
    // least one high-entropy payload column (url, offset, event id) in df;
    // every retry-stable alternative has the same blind spot, because
    // identical rows are indistinguishable to any deterministic function.
    // (For plain COUNT states this degeneration is also harmless — the
    // map-side partial count already collapses identical rows per
    // partition; the salt matters for wide merge states.)
    val pre = df
      .withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(salt)).cast("int"))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("_c"))
    pre.groupBy(col("k")).agg(sum(col("_c")).as("n"))
  }

  /** Mention counts per linked entity — the canonical hub-skew aggregation
    * of the KG pipeline (~20% of mentions hit 5 hub entities). */
  def entityMentionCounts(linked: DataFrame, salt: Int = 16): DataFrame =
    saltedCount(linked, col("entity_iri"), salt)
      .withColumnRenamed("k", "entity_iri")
}
