package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics over pipeline tables — the primitives a curation
  * loop needs to DERIVE its thresholds (length gates, quality cutoffs)
  * instead of hard-coding them.
  */
object StatsOps {

  /** Guard for the histogram-statistics family (round-7 VERDICT #5): the
    * "compact histogram" scale argument — distinct values orders of
    * magnitude below row count — holds for integral pipeline columns
    * (lengths, token counts) but silently evaporates on a continuous
    * double column, where the (group, value) histogram becomes
    * row-count-sized and the window sorts the corpus after all. Fail fast
    * instead; quantize/bucket a continuous column first. */
  private def requireIntegralValue(df: DataFrame, valueCol: String,
                                   op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(valueCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(dt),
      s"$op: value column '$valueCol' must be integral, got $dt — the " +
      "histogram scale premise (distinct values << rows) does not hold " +
      "for continuous columns; quantize or bucket the column first")
  }

  /** Exact per-group discrete quantiles of an integer-valued column,
    * computed from the (group, value) count histogram — never a per-row
    * sort. Output: one row per (group, quantile) with the discrete
    * quantile value (smallest v whose cumulative count reaches
    * ceil(q·n), q expressed in permille so every rank is exact integer
    * arithmetic — no float ceil off-by-ones) and the group's row count.
    *
    * Scale shape: the only corpus-scale operation is the partial-agg
    * histogram `groupBy(group, value)` — integer-valued pipeline columns
    * (lengths, token counts, scores) have distinct-value cardinality
    * orders of magnitude below row count, so everything downstream (the
    * per-group cumulative window, the rank pick) runs on the compact
    * histogram relation. This is how a 100 TB corpus gets exact — not
    * approx_percentile — quantiles: the full sort that makes exact
    * quantiles "expensive" never happens.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qPermille: Seq[Int] = Seq(250, 500, 750, 900, 990)): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q > 0 && q <= 1000),
      s"quantiles must be permille in (0, 1000]: $qPermille")
    requireIntegralValue(df, valueCol, "groupQuantiles")
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("v"))))
      .withColumn("n", sum(col("cnt")).over(byGroup))
    // rank of quantile q‰ in a group of n rows: ceil(q*n/1000), exact in
    // integer arithmetic; the histogram row holding that rank is the one
    // where the cumulative count first reaches it
    // `div`, not `/`: Spark's `/` on longs is double division — exact
    // integer ranks must never round through a float
    val rank = expr("(q_permille * n + 999) div 1000")
    cum
      .select(col(groupCol), col("v"), col("cnt"), col("cum"), col("n"),
        explode(array(qPermille.map(q => lit(q.toLong)): _*)).as("q_permille"))
      .filter(col("cum") >= rank && col("cum") - col("cnt") < rank)
      .select(col(groupCol), col("q_permille"),
        col("v").as("quantile_value"), col("n").as("n_rows"))
  }

  /** Integer-exact percentile rank of every row within its group:
    * permille_rank = floor(1000 · |rows ≤ v| / n) — the cross-group score
    * normalizer (compare a quality score against its SOURCE's distribution
    * before applying a global threshold; raw scores aren't comparable
    * across sources with different baselines). All-integer arithmetic, so
    * oracle-exact — no cume_dist float.
    *
    * Scale shape: the histogram trick again, inverted. ONE corpus-scale
    * partial-agg shuffle builds the (group, value) histogram; cumulative
    * and total counts are windowed over the COMPACT histogram; every row
    * then picks up its rank through a histogram-keyed join that AQE
    * broadcasts. The corpus is never sorted and never re-shuffled — it IS
    * read twice (once pruned to (group, value) for the histogram, once to
    * emit rows), the unavoidable two passes of any derive-then-apply
    * shape; both scans are column-pruned.
    *
    * PRECONDITION (round-7 ADVICE): group and value must be NON-NULL.
    * The histogram keeps null keys but the rank join is strict equality,
    * so null-group/null-value rows would silently vanish from the output;
    * filter or impute nulls upstream if they can occur. */
  def percentileRanks(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    requireIntegralValue(df, valueCol, "percentileRanks")
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("v"))))
      .withColumn("n", sum(col("cnt")).over(byGroup))
      .select(col(groupCol).as("_rk_g"), col("v").as("_rk_v"),
        expr("(cum * 1000) div n").as("permille_rank"))
    df.join(ranked,
        col(groupCol) === col("_rk_g") && col(valueCol) === col("_rk_v"))
      .drop("_rk_g", "_rk_v")
  }

  /** Top-k rows per group by a count/score column, with a deterministic
    * tiebreak column — ranked output (rank 1 = largest). The expected
    * input is an already-AGGREGATED relation (term counts, edge weights,
    * similarity scores): the per-group window sort then runs on compact
    * vocabulary-scale data, and the single corpus-scale pass is whatever
    * aggregation produced the input. Feeding raw corpus rows through this
    * would sort them per group — aggregate first. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   tieCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
