package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed aggregate: the MinHash signature of a GROUP of texts — the sketch
  * union of per-document signatures (element-wise minima), usable to
  * estimate Jaccard similarity BETWEEN groups (sources, domains, shards)
  * from one pass over the corpus:
  *
  * {{{
  *   val sig = udaf(MinHashAggregator)
  *   docs.groupBy($"source").agg(sig($"text").as("signature"))
  * }}}
  *
  * The sketch is mergeable (associative, commutative element-wise min), so
  * Spark executes it with map-side partial aggregation — one shuffle of
  * NUM_HASHES longs per group, independent of group size. Estimated
  * Jaccard(a, b) = fraction of agreeing signature slots.
  */
object MinHashAggregator extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(DedupOps.NUM_HASHES)(Long.MaxValue)

  override def reduce(buf: Array[Long], text: String): Array[Long] = {
    if (text == null) return buf // errors-as-data: a NULL text must not kill the task
    val sig = DedupOps.minhashSig(DedupOps.wordShingles(text))
    var i = 0
    while (i < buf.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Estimated Jaccard similarity from two group signatures. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    var agree = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree.toDouble / a.length
  }
}
