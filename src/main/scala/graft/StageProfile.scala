package graft

import org.apache.spark.sql.functions._
import graft.kg._

/** Per-stage wall-clock profile of the KG pipeline (tuning aid). Mirrors
  * KgPipeline.run exactly (cache-free), but forces each stage with a
  * separate action so stage costs are attributable. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = KgPipeline.session(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = java.nio.file.Paths.get("/dev/shm/graft-bench")
    java.nio.file.Files.createDirectories(base)
    val out = java.nio.file.Files.createTempDirectory(base, "profile").toString

    // `mentions` mode: the Bench staged-table kg_entity_mentions flow in
    // isolation (stage once untimed, then query twice — cold+warm)
    if (args.length > 2 && args(2) == "mentions") {
      Materialize.write(
        TripleExtraction.run(PagesSource.pages(spark, n)).toDF(), out)
      def q() = graft.ops.SkewOps.entityMentionCounts(EntityLinking.run(
        Materialize.readTriples(spark, out).drop("bucket").as[Model.TripleRow]))
      timed("mentions(cold)")(q().count())
      timed("mentions(warm)")(q().count())
      timed("mentions(warm2)")(q().count())
      // piece attribution (each recomputes upstream — cache-free)
      def staged = Materialize.readTriples(spark, out).drop("bucket")
        .as[Model.TripleRow]
      timed("scan+filter")(EntityLinking.mentions(staged).count())
      timed("distinct-surfaces")(
        EntityLinking.mentions(staged).select($"surface").distinct().count())
      timed("link-only")(EntityLinking.run(staged).count())
      val dict = PagesSource.dictionary(spark)
      println(s"COUNT dict=${dict.count()}")
      val sn = EntityLinking.mentions(staged).select($"surface").distinct()
        .as[String].map(s => (s, EntityLinking.normalize(s)))
        .toDF("surface", "norm")
      println(s"COUNT distinct_surfaces=${sn.count()}")
      val miss = sn.join(broadcast(dict.toDF("dict_surface", "entity_iri")),
        $"norm" === $"dict_surface", "left_anti")
      println(s"COUNT miss_norms=${miss.select($"norm").distinct().count()}")
      Bench.rmTree(new java.io.File(out))
      spark.stop()
      return
    }

    val pages = PagesSource.pages(spark, n)
    val triples = TripleExtraction.run(pages)
    timed("parse(1 pass)")(triples.filter($"error".isNull).count())
    val linked = EntityLinking.run(triples)
    timed("linking+count")(linked.count())
    val edges = Canonicalize.sameAsEdges(triples)
    val labels = timed("cc")(Canonicalize.connectedComponents(edges))
    val canonical = Canonicalize.canonicalizeTriples(triples, labels)
    timed("write+lineage")(Materialize.write(canonical, out))
    timed("components")(labels.agg(countDistinct($"canonical")).head())
    spark.stop()
  }
}
