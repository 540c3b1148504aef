package graft

import graft.kg._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

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

  /** Separate-JVM write-stage probe (round-5 VERDICT #7 follow-up to
    * ScalePreview's finding that the 40M-page e2e is materialize-dominated):
    * times `Materialize.write` ALONE at 1 vs 4 local-cluster workers over
    * the SAME staged canonical-triple parquet, isolating the claimed
    * trivial write parallelism (independent bucket files, staged-rename
    * commit) from parse/link/cc. Usage:
    * `runMain graft.WriteScaleCluster [pages] [reps]`. */
  private[graft] def clusterProbe(n: Long, reps: Int): Unit = {
    val base = java.nio.file.Paths.get("/dev/shm/graft-bench")
    java.nio.file.Files.createDirectories(base)
    // stage once, locally: the probe input is identical bytes for every run
    val stagedDir = java.nio.file.Files.createTempDirectory(base, "wsc-stage-").toString
    locally {
      val s = KgPipeline.session("local[16]", 32)
      s.sparkContext.setLogLevel("WARN")
      val triples = TripleExtraction.run(PagesSource.pages(s, n))
      val labels = Canonicalize.connectedComponents(Canonicalize.sameAsEdges(triples))
      Canonicalize.canonicalizeTriples(triples, labels)
        .write.mode("overwrite").parquet(stagedDir)
      s.stop()
    }
    // interleaved pairs, same protocol as ClusterScale: each session runs
    // one untimed warm write (fresh executor JVMs) then the timed one
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    for (_ <- 1 to reps; w <- Seq(1, 4)) {
      val s = ClusterScale.session(w, 1, 8192)
      s.sparkContext.setLogLevel("WARN")
      // the staged table is one ~continuous parquet dir; left to the default
      // 128 MB split size the scan coalesces into ~3 partitions and the probe
      // measures task-granularity luck, not the write path. 16 MB splits give
      // every worker count >= 4 tasks/core of scan parallelism.
      s.conf.set("spark.sql.files.maxPartitionBytes", "16m")
      val staged = s.read.parquet(stagedDir)
      for (pass <- Seq("warm", "timed")) {
        val out = java.nio.file.Files.createTempDirectory(base, s"wsc-$w-").toString
        // per-task metric accounting over the timed write (round-6 VERDICT
        // #1a): quantifies how much of the staging_write residual the
        // cross-JVM shuffle fetch actually explains, instead of asserting
        // it from one phase split.
        val acc = new MetricsAccumulator
        if (pass == "timed") s.sparkContext.addSparkListener(acc)
        val t0 = System.nanoTime()
        Materialize.write(staged, out)
        val dt = (System.nanoTime() - t0) / 1e9
        if (pass == "timed") {
          // listener bus is async (and its drain API is private[spark]);
          // tasks all ended before write() returned, so a short sleep is
          // enough for the queue to flush
          Thread.sleep(2000)
          s.sparkContext.removeSparkListener(acc)
          rows += ((w, dt))
          println(f"WRITESCALE_CLUSTER w=$w%d write_secs=$dt%7.2f ${acc.report}")
        }
        Bench.rmTree(new java.io.File(out))
      }
      s.stop()
    }
    Bench.rmTree(new java.io.File(stagedDir))
    val pairs = rows.filter(_._1 == 1).map(_._2).zip(rows.filter(_._1 == 4).map(_._2))
    pairs.foreach { case (t1, t4) =>
      println(f"WRITESCALE_CLUSTER pair eff=${t1 / (4.0 * t4)}%5.3f (1w=$t1%.2f s, 4w=$t4%.2f s)")
    }
  }
}

/** Sums the task metrics that attribute a write's wall time: executor
  * run/cpu/GC, shuffle fetch wait + remote/local bytes, shuffle write. */
private class MetricsAccumulator extends SparkListener {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def add(k: String, v: Long): Unit = { m.merge(k, v, (a, b) => a + b); () }
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val tm = te.taskMetrics
    if (tm != null) {
      add("run_ms", tm.executorRunTime)
      add("cpu_ms", tm.executorCpuTime / 1000000L)
      add("gc_ms", tm.jvmGCTime)
      add("fetch_wait_ms", tm.shuffleReadMetrics.fetchWaitTime)
      add("remote_mb", tm.shuffleReadMetrics.remoteBytesRead / (1 << 20))
      add("local_mb", tm.shuffleReadMetrics.localBytesRead / (1 << 20))
      add("shuf_write_mb", tm.shuffleWriteMetrics.bytesWritten / (1 << 20))
      add("shuf_write_ms", tm.shuffleWriteMetrics.writeTime / 1000000L)
      add("tasks", 1L)
    }
  }
  def report: String = {
    import scala.jdk.CollectionConverters._
    m.asScala.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")
  }
}

/** `runMain graft.WriteScaleCluster [pages] [reps]` — see
  * [[WriteScale.clusterProbe]]. */
object WriteScaleCluster {
  def main(args: Array[String]): Unit =
    WriteScale.clusterProbe(
      if (args.nonEmpty) args(0).toLong else 2000000L,
      if (args.length > 1) args(1).toInt else 2)
}
