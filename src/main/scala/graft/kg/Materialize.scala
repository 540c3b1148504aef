package graft.kg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Graph materialization: partitioned triple tables + per-partition lineage
  * + a resumable checkpoint manifest (SURVEY.md §2.5 / §7 step 10).
  *
  * Iceberg-style semantics without the Iceberg runtime (not on the sandbox
  * classpath): hash-bucketed directory layout, a JSON manifest written LAST
  * (write-temp + atomic rename) as the commit point, and resume via
  * bucket-set difference against the manifest — exactly the
  * partition-level atomic-commit + resumability contract of the north_rule.
  *
  * Scale notes:
  *  - bucket = pmod(hash(subj), numBuckets): co-locates all triples of a
  *    subject → downstream subject-keyed joins and dedup are co-partitioned.
  *  - repartition on the bucket column before partitionBy → exactly one
  *    file per bucket per write, no small-file explosion at 1000 executors.
  *  - dedup happens per document inside the parse stage (the triple
  *    identity key includes url+block, so duplicates cannot span documents)
  *    — no cluster-wide dedup shuffle or sort exists at all.
  */
object Materialize {

  val NUM_BUCKETS = 32

  def bucketed(triples: DataFrame): DataFrame =
    triples.withColumn("bucket",
      pmod(xxhash64(coalesce(col("subj"), col("url"))), lit(NUM_BUCKETS)).cast("int"))

  /** Write buckets not yet present in the manifest; returns lineage rows. */
  def write(triples: DataFrame, outDir: String): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._

    val done: Set[Int] = readManifest(outDir)
    val withBucket = bucketed(triples)
    val pending =
      if (done.isEmpty) withBucket
      else withBucket.filter(!col("bucket").isin(done.toSeq: _*))

    // exactly-once per bucket: a crash between data write and manifest
    // commit leaves orphan bucket dirs; removing not-yet-committed buckets
    // before (re)writing makes the retry idempotent
    (0 until NUM_BUCKETS).filterNot(done).foreach { b =>
      val dir = Paths.get(outDir, "triples", s"bucket=$b")
      if (Files.exists(dir)) {
        val walk = Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally walk.close()
      }
    }

    // ONE shuffle (on bucket), then straight to parquet. Triples are
    // already exactly-once: the identity key includes (url, block) and
    // in-document duplicates are removed inside the parse flatMap
    // (TripleExtraction), so no cluster-wide dedup sort is needed here.
    val deduped = pending.repartition(col("bucket"))

    deduped.write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(s"$outDir/triples")

    // per-bucket lineage (counts of pages/blocks/triples/errors), computed
    // from the parquet just written: a pruned 3-column scan of the
    // materialized table instead of a full re-pass over the pipeline
    // schema given explicitly so an empty write (zero input rows) still
    // reads back as an empty frame instead of failing schema inference
    val written = spark.read.schema(withBucket.schema)
      .parquet(s"$outDir/triples")
      .select($"bucket", $"url", $"block", $"error")
    val lineage = written.groupBy($"bucket").agg(
      countDistinct($"url").as("pages"),
      countDistinct($"url", $"block").as("blocks"),
      count(when($"error".isNull, 1)).as("triples"),
      count(when($"error".isNotNull, 1)).as("errors"))
    lineage.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/_lineage")

    writeManifest(outDir, done ++ (0 until NUM_BUCKETS))
    spark.read.parquet(s"$outDir/_lineage")
  }

  /** Manifest = commit point. Written to a temp file then atomically renamed. */
  def writeManifest(outDir: String, buckets: Set[Int]): Unit = {
    val p = Paths.get(outDir)
    Files.createDirectories(p)
    val json =
      s"""{"format":"graft-triples-v1","numBuckets":$NUM_BUCKETS,"completedBuckets":[${buckets.toSeq.sorted.mkString(",")}]}"""
    val tmp = p.resolve("_manifest.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p.resolve("_manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifest(outDir: String): Set[Int] = {
    val f = Paths.get(outDir, "_manifest.json")
    if (!Files.exists(f)) Set.empty
    else {
      val s = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val m = "\"completedBuckets\":\\[([0-9,]*)\\]".r.findFirstMatchIn(s)
      m.map(_.group(1)).filter(_.nonEmpty)
        .map(_.split(",").map(_.toInt).toSet).getOrElse(Set.empty)
    }
  }

  def readTriples(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/triples")
}
