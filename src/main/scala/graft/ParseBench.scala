package graft
import graft.turtle._
object ParseBench {
  def main(args: Array[String]): Unit = {
    // `dump <dir>`: write the exact bench corpus to disk so the reference
    // binary (tools/refgen/refbench) can be timed over the SAME documents
    if (args.length >= 2 && args(0) == "dump") {
      val dir = java.nio.file.Paths.get(args(1))
      java.nio.file.Files.createDirectories(dir)
      graft.kg.FixtureCorpus.productionSafe.zipWithIndex.foreach { case (d, i) =>
        java.nio.file.Files.write(dir.resolve(f"doc$i%03d.ttl"),
          d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      println(s"dumped ${graft.kg.FixtureCorpus.productionSafe.size} docs to $dir")
      return
    }
    val docs = graft.kg.FixtureCorpus.productionSafe
    val totalBytes = docs.map(_.length).sum
    // warmup
    (1 to 300).foreach(_ => docs.foreach(d => TurtleParser.parseFull(d)))
    // parse-only split
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val reps = 2000
      var chars = 0L
      (1 to reps).foreach(_ => docs.foreach { d => TurtleParser.parseFull(d); chars += d.length })
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"parse-only round $round: ${chars / dt / 1e6}%.1f MB/s/core")
    }
    for (round <- 1 to 2) {
      val parsed = docs.map(d => TurtleParser.parseFull(d).toOption.get)
      val t0 = System.nanoTime()
      val reps = 2000
      var triples = 0L
      (1 to reps).foreach(_ => parsed.foreach { ast => TripleProducer.produce(ast).foreach(ts => triples += ts.size) })
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"produce-only round $round: ${triples / dt}%.0f triples/s/core")
    }
    for (round <- 1 to 2) {
      val parsed = docs.map(d => TurtleParser.parseFull(d).toOption.get)
      val t0 = System.nanoTime()
      val reps = 2000
      var chars = 0L
      (1 to reps).foreach(_ => parsed.foreach { ast => chars += TurtleSerializer.render(ast).length })
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"render-only round $round: ${chars / dt / 1e6}%.1f MB/s/core")
    }
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var triples = 0L
      val reps = 2000
      (1 to reps).foreach { _ =>
        docs.foreach { d =>
          TurtleParser.parseFull(d) match {
            case Right(ast) => TripleProducer.produce(ast).foreach(ts => triples += ts.size)
            case Left(_) => ()
          }
        }
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val nDocs = reps.toLong * docs.size
      println(f"round $round: ${nDocs / dt}%.0f docs/s/core  ${totalBytes.toLong * reps / dt / 1e6}%.1f MB/s/core  ${triples / dt}%.0f triples/s/core")
    }
  }
}
