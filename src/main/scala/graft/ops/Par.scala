package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor for CPU-heavy per-row operators.
  *
  * The bench tables are single-file / single-ROW-GROUP parquet: Spark can
  * split a file into byte-range tasks, but a row group is assigned to the
  * one task containing its midpoint, so these scans are effectively
  * unsplittable — every downstream narrow computation (tokenization, md5,
  * shingling, span generation) serializes on one core no matter the
  * cluster size. The guide's fix for unsplittable inputs (§2.5 "Input
  * skew": one huge unsplittable file — repartition immediately after the
  * read) applies: hash-repartition the scan output to `defaultParallelism`
  * BEFORE the heavy per-row work, so only the cheap scan+shuffle-write is
  * serial.
  *
  * Scale gate: the repartition fires ONLY when the scan has fewer
  * partitions than `defaultParallelism`. A 100 TB corpus arrives in
  * thousands of splits, so the gate disqualifies itself there — this can
  * never become a full-corpus shuffle at scale. Keyed (hash) repartition,
  * not round-robin: round-robin pays the deterministic-retry local sort
  * (SPARK-23207) inside the single scan task — exactly the serial stage
  * being removed.
  */
object Par {

  /** `df` hash-repartitioned on `key` to the session's default parallelism,
    * iff the current plan would execute in fewer partitions. `key` should
    * be high-cardinality (a row id) so the spread is even. */
  def widen(df: DataFrame, key: Column): DataFrame = {
    if (sys.env.contains("GRAFT_WIDEN_OFF")) return df // A/B kill switch
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}
