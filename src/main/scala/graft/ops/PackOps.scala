package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end in a deterministic global
  * order and cut the concatenated token stream into fixed-budget bins —
  * the standard "pack short documents into full context windows" step of
  * an LLM training-data pipeline. Each document is assigned the bin its
  * first token falls in, plus its global start offset.
  *
  * The naive Spark expression — `sum(n_tokens) over (ORDER BY id)` with no
  * partitionBy — funnels the whole corpus through ONE window partition
  * (Spark even warns "No Partition Defined for Window operation"): a
  * single-task sort of 100 TB. This implementation is the distributed
  * two-phase prefix sum instead:
  *
  *  1. split the id domain into P ranges at quantile cutpoints;
  *  2. one tiny aggregation computes each range's token sum; the P sums
  *     (P rows — bounded by the range count, not the data) come to the
  *     driver and become exclusive per-range offsets in a literal map;
  *  3. a per-range window (partitionBy range — P-way parallel) computes
  *     local running sums, shifted by the range's offset.
  *
  * Determinism note (learned from an sf0.1 oracle catch): the obvious
  * `repartitionByRange + spark_partition_id` formulation is WRONG here —
  * the range partitioner samples its boundaries with an RDD-id-dependent
  * seed, so the aggregation pass and the window pass can assign the same
  * row to different ranges and corrupt offsets near boundaries. The
  * cutpoints must be computed ONCE and embedded as plan literals; the
  * range of a row is then a pure function of its id in both passes.
  */
object PackOps {

  /** Assign (start_token, bin_id) to every document.
    *
    * @param idCol     numeric, unique per row — the global packing order
    * @param tokenExpr token count per row (codegen'd expression, e.g.
    *                  [[TextOps.tokenCount]])
    * @param budget    bin capacity in tokens
    * @param partitions number of ranges (= parallelism of the big pass;
    *                  driver-side state is `partitions` longs)
    */
  def packSequences(docs: DataFrame, idCol: String, tokenExpr: Column,
      budget: Long, partitions: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")

    // quantile cutpoints, computed once → literals shared by BOTH passes.
    // Balance (not correctness) depends on their quality: any fixed
    // cutpoints give the right answer, skewed ones only skew task sizes.
    val cuts: Array[Double] =
      if (partitions <= 1) Array.empty
      else docs.stat.approxQuantile(idCol,
        (1 until partitions).map(_.toDouble / partitions).toArray, 0.001)
    // O(log P) codegen'd binary search over the cut literals — the naive
    // per-cut indicator sum is O(P) in plan size AND per-row work, which
    // breaks down when partitions is scaled to thousands (SearchBucket
    // scaladoc). Ties land in the lower bucket, same as `id > cut`.
    val rangeOf: Column =
      if (cuts.isEmpty) lit(0)
      else graft.functions.SearchBucket.bucket(col(idCol), cuts)

    val base = docs.select(col(idCol), tokenExpr.as("n_tokens"))
      .withColumn("__range", rangeOf)

    // phase 1: per-range token sums — P rows, a bounded collect (the same
    // class as AQE's own stats collection, not a data-sized collect)
    val sums = base.groupBy(col("__range"))
      .agg(sum(col("n_tokens")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val ranges = sums.keys.toSeq.sorted
    val offsets = ranges.zip(ranges.scanLeft(0L)((acc, p) => acc + sums(p)))
      .toMap
    val offMap = typedLit(offsets)

    // phase 2: local exclusive running sum within each sorted range + the
    // range's global offset
    val w = Window.partitionBy(col("__range")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start_token",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) +
          coalesce(try_element_at(offMap, col("__range")), lit(0L)))
      .withColumn("bin_id", expr(s"start_token div ${budget}L"))
      .select(col(idCol), col("n_tokens"), col("start_token"), col("bin_id"))
  }

  /** Sliding-window document chunking: split each document's token stream
    * into chunks of `chunkTokens` tokens advancing by `chunkTokens -
    * overlap` — the context-window preparation step that PRECEDES
    * [[packSequences]] for documents longer than one window.
    *
    * Chunk count per doc: `max(1, ceil((n - overlap) / step))` in exact
    * integer arithmetic (no float division anywhere — the oracle must
    * hash-match); the last chunk may be short. Empty documents (zero
    * tokens after filtering) produce no chunks.
    *
    * Scale shape: narrow — one projection, one explode; no shuffle at all.
    * The token array is materialized once before slicing (the text_ngrams
    * higher-order-lambda lesson). */
  def chunkByTokenBudget(documents: DataFrame, chunkTokens: Int = 32,
      overlap: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val step = chunkTokens - overlap
    documents.select(col(idCol), TextOps.normTokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        size(col("__t")).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"), col("__n"),
        explode(sequence(lit(0L),
          greatest(lit(1L),
            expr(s"(__n - $overlap + ${step - 1}) div $step")) - 1))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        concat_ws(" ", slice(col("__t"),
          (col("chunk_id") * step + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens.toLong),
          col("__n") - col("chunk_id") * step).as("chunk_tokens"))
  }
}
