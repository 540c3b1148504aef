package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Result of [[BoundedMinK]]: the group's total row count plus its `cap`
  * smallest ids, sorted ascending. */
case class MinKResult(cnt: Long, ids: Array[Long])

/** Typed aggregate: the `cap` SMALLEST ids of a group plus the group's total
  * count, in one mergeable pass — `groupBy(key).agg(udaf(new BoundedMinK(k)))`.
  *
  * This is the scale-safe replacement for `collect_list` + window-cap
  * patterns: a `collect_list` materializes the ENTIRE group in one
  * aggregation buffer before any cap applies (a 10^7-member boilerplate
  * clique = a 10^7-element array in executor memory), and a
  * `row_number().over(Window.partitionBy(key))` pays a full shuffle + sort
  * of every row. This aggregator's buffer is bounded at `cap` longs
  * regardless of group size, it is associative/commutative (Spark plans
  * map-side partial aggregation — identical keys collapse BEFORE the
  * shuffle), and the kept set (the cap smallest ids) is partition-invariant
  * and deterministic — the same keep-lowest-ids contract the window version
  * had.
  *
  * Reduce cost: ids at or above the current kept maximum are rejected O(1)
  * (the common case once the buffer fills — Spark feeds rows in partition
  * order, roughly ascending for our synthesized ids); an accepted id pays
  * one binary search + arraycopy, O(cap).
  */
class BoundedMinK(cap: Int) extends Aggregator[Long, MinKResult, MinKResult]
    with Serializable {
  require(cap > 0, "cap must be positive")

  override def zero: MinKResult = MinKResult(0L, Array.emptyLongArray)

  /** Insert `id` into sorted `ids`, keeping at most `cap` smallest. */
  private def insert(ids: Array[Long], id: Long): Array[Long] = {
    if (ids.length >= cap && id >= ids(ids.length - 1)) return ids
    val at = {
      val i = java.util.Arrays.binarySearch(ids, id)
      if (i >= 0) i else -(i + 1)
    }
    val outLen = math.min(ids.length + 1, cap)
    val out = new Array[Long](outLen)
    System.arraycopy(ids, 0, out, 0, at)
    out(at) = id
    System.arraycopy(ids, at, out, at + 1, outLen - at - 1)
    out
  }

  override def reduce(buf: MinKResult, id: Long): MinKResult =
    MinKResult(buf.cnt + 1L, insert(buf.ids, id))

  override def merge(a: MinKResult, b: MinKResult): MinKResult = {
    // merge two sorted arrays, keep the cap smallest
    val out = new Array[Long](math.min(a.ids.length + b.ids.length, cap))
    var i = 0; var j = 0; var k = 0
    while (k < out.length) {
      out(k) =
        if (j >= b.ids.length || (i < a.ids.length && a.ids(i) <= b.ids(j))) {
          i += 1; a.ids(i - 1)
        } else { j += 1; b.ids(j - 1) }
      k += 1
    }
    MinKResult(a.cnt + b.cnt, out)
  }

  override def finish(buf: MinKResult): MinKResult = buf

  override def bufferEncoder: Encoder[MinKResult] = Encoders.product[MinKResult]
  override def outputEncoder: Encoder[MinKResult] = Encoders.product[MinKResult]
}
