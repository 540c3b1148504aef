package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** [[BoundedMinK]] is the one aggregation simhashDedup's fused groupBy
  * rides; its contract — exactly the cap smallest ids, sorted, count exact,
  * PARTITION-INVARIANT — is what makes the clique keep-set deterministic
  * across shuffles. Pure tests (no Spark needed: Aggregator is plain code). */
class BoundedMinKSpec extends AnyFunSuite {

  private def aggregate(agg: BoundedMinK, ids: Seq[Long], splits: Int): MinKResult = {
    val parts =
      if (splits <= 1) Seq(ids)
      else ids.grouped(math.max(1, ids.length / splits)).toSeq
    agg.finish(parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge))
  }

  test("keeps exactly the cap smallest, sorted, with exact count") {
    val agg = new BoundedMinK(4)
    val r = aggregate(agg, Seq(9L, 3L, 7L, 1L, 8L, 2L, 6L), splits = 1)
    assert(r.cnt == 7L)
    assert(r.ids.toSeq == Seq(1L, 2L, 3L, 6L))
  }

  test("group smaller than cap keeps everything") {
    val agg = new BoundedMinK(10)
    val r = aggregate(agg, Seq(5L, 2L), splits = 1)
    assert(r.cnt == 2L && r.ids.toSeq == Seq(2L, 5L))
  }

  test("result is invariant to partitioning and input order (merge associativity)") {
    val agg = new BoundedMinK(8)
    val gen = for {
      ids <- Gen.listOf(Gen.chooseNum(0L, 500L))
      splits <- Gen.chooseNum(1, 7)
      seed <- Gen.long
    } yield (ids, splits, seed)
    val prop = Prop.forAll(gen) { case (ids, splits, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ids)
      val a = aggregate(agg, ids, 1)
      val b = aggregate(agg, shuffled, splits)
      val expected = ids.sorted.take(8)
      a.cnt == ids.length.toLong && b.cnt == a.cnt &&
        a.ids.toSeq == expected && b.ids.toSeq == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("rejection fast path: ascending feed beyond the cap never grows the buffer") {
    val agg = new BoundedMinK(3)
    val buf = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    val r = agg.finish(buf)
    assert(r.cnt == 100L && r.ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("descending feed is allocation-free past the cap (in-place root eviction)") {
    // round-6 ADVICE: the sorted-array buffer paid an O(cap) copy per accept,
    // so a DESCENDING feed (every id accepted) cost O(rows × cap). The heap
    // buffer evicts in place: once full, the array object never changes.
    val agg = new BoundedMinK(16)
    var buf = (1000L to 985L by -1).foldLeft(agg.zero)(agg.reduce) // fill to cap
    val frozen = buf.heap
    buf = (984L to 1L by -1).foldLeft(buf)(agg.reduce)
    assert(buf.heap eq frozen, "accepts past the cap must mutate in place")
    val r = agg.finish(buf)
    assert(r.cnt == 1000L && r.ids.toSeq == (1L to 16L))
  }

  test("small groups never allocate a cap-sized buffer") {
    val agg = new BoundedMinK(1024)
    val buf = Seq(7L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(buf.heap.length <= 8, "buffer must grow geometrically, not start at cap")
    assert(agg.finish(buf).ids.toSeq == Seq(3L, 7L))
  }
}
