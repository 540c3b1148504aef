package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kg.SparkTestSession

class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("saltedJoin equals plain join on skewed keys") {
    import spark.implicits._
    // power-law: key 0 carries 80% of rows
    val big = spark.range(0, 10000)
      .select((when($"id" % 5 =!= 0, $"id" % 100).otherwise(0L)).as("k"),
        $"id".as("v"))
    val small = spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("w"))
    val plain = big.join(small, "k").agg(count(lit(1)), sum($"w")).collect()
    val salted = SkewOps.saltedJoin(big, small.withColumnRenamed("k", "k"), "k", 8)
      .agg(count(lit(1)), sum($"w")).collect()
    assert(plain.sameElements(salted))
  }

  test("saltedCount equals plain count on a hub-skewed column") {
    import spark.implicits._
    val df = spark.range(0, 20000)
      .select(when($"id" % 5 === 0, lit("hub")).otherwise(concat(lit("e"), $"id" % 50)).as("entity_iri"))
    val plain = df.groupBy($"entity_iri").agg(count(lit(1)).as("n"))
      .orderBy($"entity_iri").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = SkewOps.entityMentionCounts(df, 16)
      .orderBy($"entity_iri").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(plain.sameElements(salted))
  }

  test("saltedCount on fully-duplicate hot-key rows: counts stay correct; " +
      "the salt spread degenerates without a payload column and recovers with one") {
    import spark.implicits._
    // 10k byte-identical rows of one hot key and nothing else
    val bare = spark.range(0, 10000).select(lit("hub").as("entity_iri"))
    val counted = SkewOps.saltedCount(bare, $"entity_iri", 16).collect()
    assert(counted.length == 1 && counted.head.getLong(1) == 10000L)
    // the documented degeneration: identical rows -> identical salt
    def distinctSalts(df: org.apache.spark.sql.DataFrame): Long =
      df.select(pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(16)))
        .distinct().count()
    assert(distinctSalts(bare) == 1L)
    // a high-entropy payload column (the documented requirement) restores it
    val withPayload = spark.range(0, 10000)
      .select(lit("hub").as("entity_iri"), $"id".as("offset"))
    assert(distinctSalts(withPayload) == 16L)
    val counted2 = SkewOps.saltedCount(withPayload, $"entity_iri", 16).collect()
    assert(counted2.length == 1 && counted2.head.getLong(1) == 10000L)
  }

  test("saltedCount output is invariant under input repartitioning") {
    import spark.implicits._
    val df = spark.range(0, 5000)
      .select(when($"id" % 3 === 0, lit("hub")).otherwise(concat(lit("e"), $"id" % 20)).as("entity_iri"),
        ($"id" % 7).as("extra"))
    def run(d: org.apache.spark.sql.DataFrame) =
      SkewOps.saltedCount(d, $"entity_iri", 16)
        .orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1)))
    val base = run(df)
    assert(base.sameElements(run(df.repartition(3))))
    assert(base.sameElements(run(df.repartition(17, $"extra"))))
  }
}
