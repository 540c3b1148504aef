package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the cardinality / frequency estimation
  * primitives a 100 TB pipeline needs when exact `groupBy` state would not
  * fit (distinct users per segment across shards, heavy-hitter detection
  * over unbounded key domains). Both sketches here are register-exact
  * deterministic functions of `xxhash64`, so their full register state is
  * re-derivable in independent SQL — the oracle checks the sketch CONTENT
  * bit-for-bit, not just an estimate within tolerance.
  */
object SketchOps {

  /** HyperLogLog register aggregator over PRE-HASHED keys (hash with the
    * codegen'd `xxhash64` column before aggregating — the aggregator only
    * does the register update, so the hot loop stays trivial). Buffer =
    * 2^p int registers (16 KB at p=12) per group per partition; merge is
    * element-wise max, so Spark runs it with map-side partial aggregation:
    * ONE fixed-size buffer per group crosses the shuffle, independent of
    * group size — that is the entire point of the sketch at 100 TB.
    *
    * Register layout: bucket = low p bits of the hash, rho = leading-zero
    * count of the remaining 64−p bits + 1 (= nlz(h >>> p) − p + 1 for
    * nonzero, 64−p+1 for zero).
    */
  final class HllAggregator(p: Int)
      extends Aggregator[Long, Array[Int], Array[Int]] {
    require(p >= 4 && p <= 16, s"HLL precision out of range: $p")
    private val m = 1 << p

    override def zero: Array[Int] = new Array[Int](m)

    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      val bucket = (h & (m - 1)).toInt
      val rest = h >>> p
      val rho = if (rest == 0L) 64 - p + 1
                else java.lang.Long.numberOfLeadingZeros(rest) - p + 1
      if (rho > buf(bucket)) buf(bucket) = rho
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Int]): Array[Int] = buf

    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  }

  /** Per-group HLL register sketch of a long key column, emitted SPARSE:
    * one (group, bucket, register) row per non-zero register — join-ready
    * for cross-shard merging (max per bucket) and exactly what the SQL
    * oracle re-derives. The dense 2^p buffer exists only inside the
    * aggregation. */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   p: Int = 12): DataFrame = {
    val sketch = udaf(new HllAggregator(p), Encoders.scalaLong)
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol), xxhash64(col(keyCol)).as("h"))
      .groupBy(col(groupCol))
      .agg(sketch(col("h")).as("regs"))
      .select(col(groupCol), posexplode(col("regs")).as(Seq("bucket", "register")))
      .filter(col("register") > 0)
      .select(col(groupCol), col("bucket").cast("long").as("bucket"),
        col("register").cast("long").as("register"))
  }

  /** Cardinality estimate from sparse register rows (the standard HLL
    * estimator + linear counting in the small range). Float — for human
    * consumption and accuracy tests, not for oracle hashing. */
  def hllEstimate(registers: Seq[(Long, Long)], p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val regs = new Array[Int](m)
    registers.foreach { case (b, r) => regs(b.toInt) = r.toInt }
    var harmonic = 0.0
    var zeros = 0
    regs.foreach { r => harmonic += math.pow(2.0, -r); if (r == 0) zeros += 1 }
    val raw = alpha * m * m / harmonic
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Count-min sketch table of a long key column: `depth` independent
    * hash rows of `width` counters, emitted as (depth, bucket, n) rows.
    * Point estimate of any key's frequency = min over rows of its bucket
    * counter — an overestimate by at most ~N/width per row in
    * expectation. Row d hashes with `xxhash64(lit(d), key)` (Spark's
    * multi-arg chaining seeds row d's hash with hash(d), so the rows are
    * independent and the whole table is a deterministic integer function
    * of the input — exactly re-derivable in SQL).
    *
    * Scale shape: the explode is a ×depth narrow amplification feeding a
    * partial-agg shuffle bounded by depth×width rows per partition; the
    * table itself is depth×width counters no matter how many rows or
    * distinct keys flow in. Mergeable across shards by adding counters. */
  def countMinTable(df: DataFrame, keyCol: String,
                    depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape: $depth x $width")
    val rows = (0 until depth).map { d =>
      struct(lit(d.toLong).as("d"),
        pmod(xxhash64(lit(d.toLong), col(keyCol)), lit(width.toLong)).as("b"))
    }
    df.filter(col(keyCol).isNotNull)
      .select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.d").as("depth"), col("e.b").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point-query a collected CMS table: estimated count of `key`. */
  def cmsEstimate(table: Seq[(Long, Long, Long)], key: Long,
                  depth: Int = 4, width: Int = 1024): Long = {
    val m = table.map { case (d, b, n) => (d, b) -> n }.toMap
    (0 until depth).map { d =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(key, org.apache.spark.sql.types.LongType,
          org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(d.toLong, org.apache.spark.sql.types.LongType, 42L))
      val b = ((h % width) + width) % width
      m.getOrElse((d.toLong, b), 0L)
    }.min
  }
}
