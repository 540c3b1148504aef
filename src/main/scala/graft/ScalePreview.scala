package graft

import graft.kg.{Canonicalize, EntityLinking, KgPipeline, Materialize, PagesSource, TripleExtraction}

/** Pipeline scale preview (round-4 VERDICT stretch): the full e2e pipeline
  * (`KgPipeline.run`) at increasing page counts back-to-back in ONE JVM
  * (shared weather + JIT), printing triples/s per level so a departure
  * from linear throughput — the next knee — is visible directly; then a
  * stage-timed pass at the TOP level to attribute it. The parse output
  * stays lazy (too big to pin), so the link/cc/materialize rows each
  * INCLUDE one re-parse — subtract the parse row to isolate a stage. The
  * CC labels, by contrast, are vocabulary-scale, so they are eagerly
  * localCheckpoint'ed: the materialize row measures write + one re-parse,
  * NOT a second CC fixpoint.
  *
  * Output goes to tmpfs and is removed per level; sized so the largest
  * level's staged parquet + shuffle files fit /dev/shm comfortably.
  *
  * Usage: runMain graft.ScalePreview [levelsCsv] [cpus]
  * (default levels 4M,12M,40M at local[32]; ~30 min wall on a quiet host)
  */
object ScalePreview {
  def main(args: Array[String]): Unit = {
    val levels = (if (args.nonEmpty) args(0) else "4000000,12000000,40000000")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = if (args.length > 1) args(1).toInt else 32
    val base = java.nio.file.Paths.get("/dev/shm/graft-preview")
    java.nio.file.Files.createDirectories(base)
    val spark = KgPipeline.session(s"local[$cpus]", 2 * cpus)
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // JIT warmup (all measurements share this JVM)
    KgPipeline.run(spark, 20000,
      java.nio.file.Files.createTempDirectory(base, "warm-").toString)

    for (n <- levels) {
      val out = java.nio.file.Files.createTempDirectory(base, s"run-$n-").toString
      val (r, dt) = timed(KgPipeline.run(spark, n, out))
      println(f"PREVIEW pages=$n%,d secs=$dt%8.1f triples=${r.triples}%,d " +
        f"triples_per_sec=${r.triples / dt}%,.0f linked=${r.linkedMentions}%,d " +
        f"components=${r.components}%,d")
      Bench.rmTree(new java.io.File(out))
    }

    // stage attribution at the top level
    val n = levels.max
    val pages = PagesSource.pages(spark, n)
    val triples = TripleExtraction.run(pages)
    val (_, tParse) = timed(triples.count())
    val (_, tLink) = timed(EntityLinking.run(triples).count())
    val (labels, tCc) = timed {
      // eager: pins the vocabulary-scale label table so the materialize row
      // below doesn't silently re-run the whole CC fixpoint
      Canonicalize.connectedComponents(Canonicalize.sameAsEdges(triples))
        .localCheckpoint()
    }
    val out = java.nio.file.Files.createTempDirectory(base, s"stage-$n-").toString
    val (_, tMat) =
      timed(Materialize.write(Canonicalize.canonicalizeTriples(triples, labels), out))
    println(f"STAGES pages=$n%,d parse=$tParse%.1f link=$tLink%.1f " +
      f"cc=$tCc%.1f materialize=$tMat%.1f " +
      "(link/cc/materialize each include one re-parse of the lazy triple " +
      "stream; labels are checkpointed so materialize excludes the CC fixpoint)")
    Bench.rmTree(new java.io.File(out))
    spark.stop()
  }
}
