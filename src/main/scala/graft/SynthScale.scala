package graft

import graft.kg.{KgPipeline, PagesSource}

/** Attribution probe: synthesize-only vs synthesize+parse at several
  * parallelism levels (same JVM, warm). Separates the page-generation cost
  * from the parse/produce cost in the scaling picture. */
object SynthScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val levels = (if (args.length > 1) args(1) else "8,32")
      .split(",").map(_.trim.toInt).toSeq
    locally {
      val s = KgPipeline.session(s"local[${levels.max}]", 2 * levels.max)
      s.sparkContext.setLogLevel("WARN")
      PagesSource.pages(s, 20000).count()
      graft.kg.TripleExtraction.run(PagesSource.pages(s, 20000)).count()
      s.stop()
    }
    for (rep <- 1 to 2; cpus <- levels) {
      val s = KgPipeline.session(s"local[$cpus]", 2 * cpus)
      s.sparkContext.setLogLevel("WARN")
      var t0 = System.nanoTime()
      PagesSource.pages(s, n).count()
      val synth = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      graft.kg.TripleExtraction.run(PagesSource.pages(s, n)).count()
      val full = (System.nanoTime() - t0) / 1e9
      println(f"SYNTHSCALE rep=$rep cpus=$cpus%2d synth=$synth%6.2f full=$full%6.2f parse_delta=${full - synth}%6.2f")
      s.stop()
    }
  }
}
