package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Result of [[BoundedMinK]]: the group's total row count plus its `cap`
  * smallest ids, sorted ascending. */
case class MinKResult(cnt: Long, ids: Array[Long])

/** Aggregation buffer of [[BoundedMinK]]: `heap(0, size)` is a binary
  * MAX-heap of the `size` smallest ids seen so far (root = largest kept =
  * the eviction candidate). The array is grown geometrically up to the cap,
  * so small groups never pay a cap-sized allocation, and it is MUTATED in
  * place by reduce/merge — each buffer has exactly one owner inside Spark's
  * aggregation (ObjectAggregationIterator hands merge an input buffer that
  * is discarded afterwards), which is what makes in-place mutation safe. */
case class MinKBuf(cnt: Long, size: Int, heap: Array[Long])

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
  * Reduce cost is input-order-INDEPENDENT (round-6 ADVICE: the previous
  * sorted-array buffer re-allocated and copied the full cap-sized array on
  * every accept, so a descending id feed cost O(rows × cap) copies): once
  * the buffer is full, an id at or above the kept maximum (the heap root)
  * is rejected O(1), and an accepted id replaces the root in O(log cap)
  * sift-down with ZERO allocation. Ordering only appears in `finish`, which
  * sorts the ≤cap survivors once per group.
  */
class BoundedMinK(cap: Int) extends Aggregator[Long, MinKBuf, MinKResult]
    with Serializable {
  require(cap > 0, "cap must be positive")

  override def zero: MinKBuf = MinKBuf(0L, 0, Array.emptyLongArray)

  private def siftUp(h: Array[Long], from: Int): Unit = {
    var i = from
    while (i > 0) {
      val p = (i - 1) >> 1
      if (h(p) < h(i)) { val t = h(p); h(p) = h(i); h(i) = t; i = p }
      else return
    }
  }

  private def siftDown(h: Array[Long], size: Int): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      if (l >= size) done = true
      else {
        val m = if (l + 1 < size && h(l + 1) > h(l)) l + 1 else l
        if (h(m) > h(i)) { val t = h(m); h(m) = h(i); h(i) = t; i = m }
        else done = true
      }
    }
  }

  /** Insert one id, mutating (and growing if needed) the buffer's heap;
    * returns the buffer's new (size, heap). */
  private def push(size: Int, heap: Array[Long], id: Long): (Int, Array[Long]) =
    if (size >= cap) {
      if (id < heap(0)) { heap(0) = id; siftDown(heap, size) } // evict max
      (size, heap) // else reject O(1): id is not among the cap smallest
    } else {
      val h =
        if (size < heap.length) heap
        else java.util.Arrays.copyOf(heap,
          math.min(cap, math.max(8, heap.length * 2)))
      h(size) = id
      siftUp(h, size)
      (size + 1, h)
    }

  override def reduce(buf: MinKBuf, id: Long): MinKBuf = {
    val (size, heap) = push(buf.size, buf.heap, id)
    MinKBuf(buf.cnt + 1L, size, heap)
  }

  override def merge(a: MinKBuf, b: MinKBuf): MinKBuf = {
    // fold the smaller member set into the larger one's heap — ≤ cap
    // O(log cap) pushes, no concatenation array
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    var size = into.size
    var heap = into.heap
    var i = 0
    while (i < from.size) {
      val r = push(size, heap, from.heap(i))
      size = r._1; heap = r._2
      i += 1
    }
    MinKBuf(a.cnt + b.cnt, size, heap)
  }

  override def finish(buf: MinKBuf): MinKResult = {
    val out = java.util.Arrays.copyOf(buf.heap, buf.size)
    java.util.Arrays.sort(out)
    MinKResult(buf.cnt, out)
  }

  override def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
  override def outputEncoder: Encoder[MinKResult] = Encoders.product[MinKResult]
}
