package graft

import org.apache.spark.sql.functions._
import graft.kg._

/** Per-stage wall-clock profile of the KG pipeline (tuning aid). */
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

    val out = java.nio.file.Files.createTempDirectory("profile").toString
    val pages = PagesSource.pages(spark, n)
    val triples = TripleExtraction.run(pages).cache()
    timed("parse+cache")(triples.count())
    val linked = EntityLinking.run(triples)
    timed("linking")(linked.count())
    val edges = timed("edges")(Canonicalize.sameAsEdges(triples))
    val labels = Canonicalize.connectedComponents(edges).cache()
    timed("cc")(labels.count())
    val canonical = Canonicalize.canonicalizeTriples(triples, labels)
    timed("canonicalize+write")(Materialize.write(canonical, out).count())
    timed("counts") {
      triples.filter($"error".isNotNull).count()
      triples.filter($"error".isNull).count()
      labels.select($"canonical").distinct().count()
    }
    spark.stop()
  }
}
