package graft

import graft.kg._

/** Scaling probe for the materialization chain (canonicalize join → bucket
  * shuffle → staged parquet → grouped commit → lineage): warm JVM,
  * back-to-back levels. Usage: runMain graft.WriteScale [pages] [cpusCsv] */
object WriteScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val levels = (if (args.length > 1) args(1) else "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val base = java.nio.file.Paths.get("/dev/shm/graft-bench")
    java.nio.file.Files.createDirectories(base)

    def once(cpus: Int, pages: Long, tag: String): Unit = {
      val s = KgPipeline.session(s"local[$cpus]", 2 * cpus)
      s.sparkContext.setLogLevel("WARN")
      val out = java.nio.file.Files.createTempDirectory(base, "ws-").toString
      val triples = TripleExtraction.run(PagesSource.pages(s, pages))
      val labels = Canonicalize.connectedComponents(Canonicalize.sameAsEdges(triples))
      val canonical = Canonicalize.canonicalizeTriples(triples, labels)
      val t0 = System.nanoTime()
      Materialize.write(canonical, out)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"WRITESCALE $tag cpus=$cpus%2d write_secs=$dt%7.2f")
      s.stop()
      Bench.rmTree(new java.io.File(out))
    }

    once(levels.max, 20000, "warmup")
    for (rep <- 1 to 2; cpus <- levels) once(cpus, n, s"rep=$rep")
  }
}
