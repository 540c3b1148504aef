package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kg.SparkTestSession

class MinHashAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("group signature equals element-wise min of member signatures") {
    import spark.implicits._
    val docs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("a", "pack my box with five dozen liquor jugs"),
      ("b", "completely different content lives here today")).toDF("g", "text")
    val sig = udaf(MinHashAggregator)
    val out = docs.groupBy($"g").agg(sig($"text").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val expA = {
      val s1 = DedupOps.minhashSig(DedupOps.wordShingles("the quick brown fox jumps over the lazy dog"))
      val s2 = DedupOps.minhashSig(DedupOps.wordShingles("pack my box with five dozen liquor jugs"))
      s1.zip(s2).map { case (x, y) => math.min(x, y) }
    }
    assert(out("a").sameElements(expA))
  }

  test("similar groups estimate high Jaccard; disjoint groups low") {
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // group x and group y share the same texts; group z is reversed tokens
    val x = base.withColumn("g", lit("x"))
    val y = base.withColumn("g", lit("y"))
    val z = base.withColumn("g", lit("z"))
      .withColumn("text", concat_ws(" ", reverse(split($"text", " "))))
    val sig = udaf(MinHashAggregator)
    val sigs = x.unionByName(y).unionByName(z)
      .groupBy($"g").agg(sig($"text").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    assert(MinHashAggregator.estimateJaccard(sigs("x"), sigs("y")) == 1.0)
    // reversed token order destroys most word-3-gram shingles
    assert(MinHashAggregator.estimateJaccard(sigs("x"), sigs("z")) < 0.6)
  }

  test("partial aggregation: result independent of partitioning") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source", $"text")
    val sig = udaf(MinHashAggregator)
    val a = docs.repartition(1).groupBy($"source").agg(sig($"text").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val b = docs.repartition(16).groupBy($"source").agg(sig($"text").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }
}
