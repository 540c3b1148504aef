package graft.kg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = KgPipeline.session("local[4]", 4)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class KgPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark

  test("pages generation is deterministic and invariant holds") {
    import spark.implicits._
    val a = PagesSource.pages(spark, 100).collect().sortBy(_.url)
    val b = PagesSource.pages(spark, 100).collect().sortBy(_.url)
    assert(a.map(_.url).sameElements(b.map(_.url)))
    assert(a.map(_.text).sameElements(b.map(_.text)))
    // extraction invariant: extractText(html) == text, byte-identical
    a.foreach { p => assert(Extract.extractText(p.html) == p.text, p.url) }
    // mix of block shapes exists
    assert(a.exists(p => Extract.extractBlocks(p.html).isEmpty))
    assert(a.exists(p => Extract.extractBlocks(p.html).size == 2))
  }

  test("triple extraction yields triples and error rows, deterministically") {
    import spark.implicits._
    val pages = PagesSource.pages(spark, 200)
    val t1 = TripleExtraction.run(pages).collect()
    val t2 = TripleExtraction.run(pages).collect()
    assert(t1.sortBy(r => (r.url, r.block, r.subj, r.pred, r.obj_value))
      .sameElements(t2.sortBy(r => (r.url, r.block, r.subj, r.pred, r.obj_value))))
    val ok = t1.filter(_.error == null)
    val err = t1.filter(_.error != null)
    assert(ok.nonEmpty && err.nonEmpty)
    assert(err.forall(e => e.error.startsWith("NotFullyParsed") ||
      e.error.startsWith("ProduceError")))
    // blank node labels are globally unique per (url, block)
    val bnodes = ok.filter(_.subj_kind == "bnode").map(_.subj)
    bnodes.foreach(b => assert(b.startsWith("_:h")))
  }

  test("round-trip audit: every well-formed block is byte-identical") {
    import spark.implicits._
    val rt = TripleExtraction.roundTrip(PagesSource.pages(spark, 200)).collect()
    val parsedOk = rt.filter(_.parsed)
    assert(parsedOk.nonEmpty)
    assert(parsedOk.forall(_.byte_identical))
    assert(rt.exists(!_.parsed)) // malformed rows present
  }

  test("entity linking: exact + lsh paths both link correctly") {
    import spark.implicits._
    val triples = TripleExtraction.run(PagesSource.pages(spark, 300))
    val linked = EntityLinking.run(triples).collect()
    assert(linked.nonEmpty)
    val methods = linked.map(_.getString(3)).toSet
    assert(methods.contains("exact"))
    assert(methods.contains("lsh"))
    // every link points at the entity whose surface generated the mention
    linked.foreach { r =>
      val surface = r.getString(1)
      val iri = r.getString(2)
      val e = iri.stripPrefix(PagesSource.ENTITY_NS).toInt
      assert(PagesSource.surfaceVariants(e).exists(v =>
        EntityLinking.normalize(v) == EntityLinking.normalize(surface)),
        s"mention '$surface' linked to wrong entity $iri")
    }
  }

  test("entity linking: local and distributed surface-map paths agree") {
    import spark.implicits._
    val triples = TripleExtraction.run(PagesSource.pages(spark, 300))
    val m = EntityLinking.mentions(triples)
    val dict = PagesSource.dictionary(spark)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, String, String, String)].collect().sorted.toSeq
    val local = rows(EntityLinking.link(m, dict))
    val dist = rows(EntityLinking.link(m, dict, maxLocal = 0))
    assert(local.nonEmpty && local == dist)
  }

  test("connected components: aliases collapse to canonical ids") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), // component {a,b,c}
      ("x", "y"), // component {x,y}
      ("q", "q")).toDF("src", "dst")
    val labels = Canonicalize.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels("a") == "a" && labels("b") == "a" && labels("c") == "a")
    assert(labels("x") == "x" && labels("y") == "x")
    // the at-scale distributed loop must produce the identical labeling
    val dist = Canonicalize.distributedCC(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dist == labels)
  }

  test("local and distributed CC agree on a chain (multi-iteration case)") {
    import spark.implicits._
    // a 12-vertex path graph needs several hash-min iterations; both paths
    // must converge to min-vertex labeling
    val vs = (0 until 12).map(i => f"v$i%02d")
    val edges = vs.zip(vs.tail).toDF("src", "dst")
    val local = Canonicalize.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = Canonicalize.distributedCC(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(local == dist)
    assert(vs.forall(v => local(v) == "v00"))
  }

  test("canonicalizeTriples size-gates the label join (no forced broadcast)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val triples = TripleExtraction.run(PagesSource.pages(spark, 50))
    // corpus-scale labels (estimated size >> autoBroadcastJoinThreshold):
    // the plan must NOT hard-code a broadcast — a forced hint here is a
    // driver OOM at 100 TB (round-1 verdict)
    val big = spark.range(0, 5000000L)
      .select(concat(lit("http://kb.example/entity/"), $"id").as("id"),
        concat(lit("http://kb.example/canon/"), $"id").as("canonical"))
    val bigPlan = Canonicalize.canonicalizeTriples(triples, big)
      .queryExecution.sparkPlan.toString
    assert(bigPlan.contains("SortMergeJoin"), bigPlan.take(600))
    assert(!bigPlan.contains("BroadcastHashJoin"), bigPlan.take(600))

    // vocabulary-scale labels (local relation with known tiny size) must
    // still broadcast — the planner sees real stats, no hint needed
    val tiny = Seq(("http://kb.example/entity/1", "http://kb.example/canon/1"))
      .toDF("id", "canonical")
    val tinyPlan = Canonicalize.canonicalizeTriples(triples, tiny)
      .queryExecution.sparkPlan.toString
    assert(tinyPlan.contains("BroadcastHashJoin"), tinyPlan.take(600))
  }

  test("crashed write is idempotent: orphan bucket dirs are replaced on retry") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val triples = Canonicalize.canonicalizeTriples(
      TripleExtraction.run(PagesSource.pages(spark, 100)),
      spark.emptyDataFrame.selectExpr("'' as id", "'' as canonical").limit(0))
    // simulate a crash: data written but manifest missing for 2 buckets
    Materialize.write(triples, out)
    val full = Materialize.readTriples(spark, out).count()
    Materialize.writeManifest(out,
      (0 until Materialize.NUM_BUCKETS).toSet -- Set(0, 1))
    // retry: buckets 0 and 1 must be rewritten WITHOUT duplication
    Materialize.write(triples, out)
    assert(Materialize.readTriples(spark, out).count() == full)
    assert(Materialize.readManifest(out) == (0 until Materialize.NUM_BUCKETS).toSet)
  }

  test("identity bucket repartition: shuffle partition index == bucket id") {
    import org.apache.spark.sql.functions._
    // the write-stage scaling fix (round-7): salts invert murmur3 mod nb so
    // every bucket gets its OWN reduce task — no empty slots, no 2-bucket
    // tasks. This pins the inversion against Spark's actual HashPartitioning
    // (if the partitioner's hash ever changes, this fails loudly).
    for (nb <- Seq(7, 32, 256)) {
      val salts = Materialize.identitySalts(nb)
      assert(salts.distinct.length == nb)
      val df = spark.range(2000).toDF("id")
        .withColumn("bucket", pmod(xxhash64(col("id")), lit(nb)).cast("int"))
      val placed = Materialize.repartitionByBucketIdentity(df, nb)
        .select(col("bucket"), spark_partition_id().as("pid"))
        .filter(col("bucket") =!= col("pid"))
      assert(placed.count() == 0L,
        s"nb=$nb: some rows landed outside their bucket's own partition")
    }
  }

  test("lost manifest cannot change bucketing: sidecar pins numBuckets") {
    val out = java.nio.file.Files.createTempDirectory("graft-sidecar").toString
    val triples = Canonicalize.canonicalizeTriples(
      TripleExtraction.run(PagesSource.pages(spark, 100)),
      spark.emptyDataFrame.selectExpr("'' as id", "'' as canonical").limit(0))
    // first write with an explicit non-default bucket count
    Materialize.write(triples, out, numBuckets = 7)
    val full = Materialize.readTriples(spark, out).count()
    assert(Materialize.readManifestFull(out)._1.contains(7))
    // crash window: manifest lost between delete and rename
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_manifest.json"))
    // resume in auto mode (numBuckets=0): the sidecar must pin nb=7 —
    // without it autoBuckets(parallelism) would orphan dirs >= newNb
    Materialize.write(triples, out)
    assert(Materialize.readManifestFull(out)._1.contains(7))
    assert(Materialize.readTriples(spark, out).count() == full)
    // exactly buckets 0..6 on disk — no orphans
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(out, "triples"))
    val buckets = try {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("bucket=")).toSet
    } finally dirs.close()
    assert(buckets == (0 until 7).map(b => s"bucket=$b").toSet)
  }

  test("metadata-less dir with stale bucket data is rebuilt, not merged") {
    val out = java.nio.file.Files.createTempDirectory("graft-dirty").toString
    val triples = Canonicalize.canonicalizeTriples(
      TripleExtraction.run(PagesSource.pages(spark, 100)),
      spark.emptyDataFrame.selectExpr("'' as id", "'' as canonical").limit(0))
    Materialize.write(triples, out, numBuckets = 7)
    val full = Materialize.readTriples(spark, out).count()
    // wipe ALL commit metadata (manifest + sidecar) but leave data dirs
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_manifest.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_buckets.json"))
    // rewrite with a different bucket count: old dirs must not survive
    Materialize.write(triples, out, numBuckets = 5)
    assert(Materialize.readTriples(spark, out).count() == full)
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(out, "triples"))
    val buckets = try {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("bucket=")).toSet
    } finally dirs.close()
    assert(buckets == (0 until 5).map(b => s"bucket=$b").toSet)
    // the foreign data was renamed ASIDE (auditably recoverable), not deleted
    val aside = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("triples.foreign-")).toSeq
      } finally ls.close()
    }
    assert(aside.size == 1)
    val asideBuckets = {
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(out, aside.head))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("bucket=")).toSet
      } finally ls.close()
    }
    assert(asideBuckets == (0 until 7).map(b => s"bucket=$b").toSet)
  }

  test("localSurfaceMap is parallel-deterministic and linear at scale") {
    // 120k distinct surfaces against the standard dictionary: completes in
    // bounded time (a quadratic regression would take hours) and the
    // index-assembled parallel result is run-to-run identical
    val surfaces = Array.tabulate(120000) { i =>
      if (i % 3 == 0) s"entity ${i % 2000}" // exact path
      else if (i % 3 == 1) s"the entity ${i % 2000}" // lsh path
      else s"no such thing $i" // miss
    }
    val dict = PagesSource.dictionaryLocal.toArray
    val t0 = System.nanoTime()
    val a = EntityLinking.localSurfaceMap(surfaces, dict)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120, s"localSurfaceMap took ${secs}s for 120k surfaces")
    val b = EntityLinking.localSurfaceMap(surfaces, dict)
    // 40k exact hits + 40k lsh hits; the 40k nonsense surfaces miss
    assert(a.length == 80000 && java.util.Arrays.equals(
      a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]]))
  }

  test("per-group commits preserve PARTIAL progress and resume completes it") {
    val out = java.nio.file.Files.createTempDirectory("graft-partial").toString
    val triples = Canonicalize.canonicalizeTriples(
      TripleExtraction.run(PagesSource.pages(spark, 100)),
      spark.emptyDataFrame.selectExpr("'' as id", "'' as canonical").limit(0))
    Materialize.write(triples, out)
    val full = Materialize.readTriples(spark, out).count()
    val nb = Materialize.readManifestFull(out)._1.get

    // simulate a crash AFTER the first commit group: only the first group's
    // buckets are committed; later buckets' data is gone with staging
    val firstGroup = (0 until nb / 4).toSet
    Materialize.writeManifest(out, nb, firstGroup)
    (nb / 4 until nb).foreach { b =>
      val dir = java.nio.file.Paths.get(out, "triples", s"bucket=$b")
      if (java.nio.file.Files.exists(dir)) {
        val walk = java.nio.file.Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally walk.close()
      }
    }
    // the committed group's data survived the crash (partition-level
    // progress, not all-or-nothing)
    val partial = Materialize.readTriples(spark, out).count()
    assert(partial > 0 && partial < full)

    // resume: only the missing buckets are rewritten; totals restore exactly
    Materialize.write(triples, out)
    assert(Materialize.readTriples(spark, out).count() == full)
    assert(Materialize.readManifest(out) == (0 until nb).toSet)
  }

  test("full pipeline: run, materialize, manifest, resume") {
    val out = java.nio.file.Files.createTempDirectory("graft-kg").toString
    val r = KgPipeline.run(spark, 300, out)
    assert(r.triples > 0)
    assert(r.errors > 0)
    assert(r.linkedMentions > 0)
    assert(r.components > 0)
    assert(Materialize.readManifest(out) == (0 until Materialize.NUM_BUCKETS).toSet)
    val written = Materialize.readTriples(spark, out)
    assert(written.count() > 0)
    // resume: a second write is a no-op (all buckets committed)
    val before = written.count()
    Materialize.write(
      Canonicalize.canonicalizeTriples(
        TripleExtraction.run(PagesSource.pages(spark, 300)),
        spark.emptyDataFrame.selectExpr("'' as id", "'' as canonical").limit(0)),
      out)
    assert(Materialize.readTriples(spark, out).count() == before)
  }
}
