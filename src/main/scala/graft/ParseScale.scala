package graft

import graft.kg.{KgPipeline, PagesSource, TripleExtraction}

/** Focused scaling probe for the synthesize→extract→parse→produce pass
  * (the pipeline's dominant compute): same input counted at several
  * parallelism levels back-to-back in one JVM, so the numbers share the
  * host weather. Usage: runMain graft.ParseScale [pages] [cpusCsv] */
object ParseScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val levels = (if (args.length > 1) args(1) else "8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    // warmup JIT at the highest level
    locally {
      val s = KgPipeline.session(s"local[${levels.max}]", 2 * levels.max)
      s.sparkContext.setLogLevel("WARN")
      TripleExtraction.run(PagesSource.pages(s, 20000)).count()
      s.stop()
    }
    for (rep <- 1 to 2; cpus <- levels) {
      val s = KgPipeline.session(s"local[$cpus]", 2 * cpus)
      s.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val c = TripleExtraction.run(PagesSource.pages(s, n)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PARSESCALE rep=$rep cpus=$cpus%2d secs=$dt%7.2f pages_per_sec=${n / dt}%,.0f rows=$c")
      s.stop()
    }
  }
}
