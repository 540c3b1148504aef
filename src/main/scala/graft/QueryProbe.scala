package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kg.{EntityLinking, KgPipeline, Materialize, Model, PagesSource, TripleExtraction}
import graft.ops.SkewOps

/** Same-window re-measurement probe (round-5 VERDICT #6): times a named
  * subset of [[SparkEntry.queries]] back-to-back in ONE JVM, interleaving
  * every rep across the whole set so each query's reps sample the same
  * weather windows as its controls. Use to attribute a single query's bench
  * swing to host weather vs a real regression: pick the suspect plus one
  * memory-light control (e.g. q1_agg) and one allocation-heavy control
  * (e.g. dedup_minhash) and compare each against its BENCH.md round-4 row.
  *
  * `runMain graft.QueryProbe [reps] [query,query,...]` — defaults to the
  * VERDICT-#6 set. Reads SPARK_GRAFT_SF_DIR (default sf0.1) at local[32],
  * the driver bench's query-phase shape. kg_entity_mentions gets Bench's
  * staged-table override (the deployment shape: link over materialized
  * triples, not a re-parse). Prints per-rep seconds + host steal, then a
  * median line per query.
  */
object QueryProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      else Seq("kg_entity_mentions", "q1_agg", "dedup_minhash")

    val spark = KgPipeline.session(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val stageBase = java.nio.file.Paths.get("/dev/shm/graft-bench")
    java.nio.file.Files.createDirectories(stageBase)
    val stageDir =
      java.nio.file.Files.createTempDirectory(stageBase, "qprobe-").toString
    Materialize.write(
      TripleExtraction.run(
        PagesSource.pages(spark, PagesSource.countForSfDir(sfDir))).toDF(),
      stageDir)
    val overrides: Map[String, (SparkSession, String) => DataFrame] = Map(
      "kg_entity_mentions" -> ((s, _) => {
        import s.implicits._
        val staged = Materialize.readTriples(s, stageDir)
          .drop("bucket").as[Model.TripleRow]
        SkewOps.entityMentionCounts(EntityLinking.run(staged))
      }))

    def steal(): (Long, Long) =
      try {
        val line = {
          val src = scala.io.Source.fromFile("/proc/stat")
          try src.getLines().next() finally src.close()
        }
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } catch { case _: Exception => (0L, 1L) }

    val fns = names.map { n =>
      n -> overrides.getOrElse(n,
        SparkEntry.queries.getOrElse(n,
          sys.error(s"unknown query '$n' — keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")))
    }
    // untimed warmup pass (JIT + parquet footer caches), then interleaved reps
    fns.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val times =
      scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    for (rep <- 1 to reps; (name, fn) <- fns) {
      val (s0, t0j) = steal()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (s1, t1j) = steal()
      val st = (s1 - s0).toDouble / math.max(1L, t1j - t0j)
      times(name) = times(name) :+ dt
      println(f"QPROBE rep=$rep $name%-24s ${dt}%7.3f s  steal=${st}%5.3f")
    }
    spark.stop()
    Bench.rmTree(new java.io.File(stageDir))
    for ((name, _) <- fns) {
      val v = times(name).sorted
      val med = v(v.length / 2)
      println(f"QPROBE median $name%-24s ${med}%7.3f s  best=${v.head}%7.3f  worst=${v.last}%7.3f")
    }
  }
}
