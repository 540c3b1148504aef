package graft

/** Dumps `.explain("formatted")` of named [[SparkEntry.queries]] to
  * `plans/<tag>/<query>_<suffix>.txt` — the per-round optimization evidence
  * (before/after plan shapes: Exchange count, join strategy, PushedFilters /
  * ReadSchema, WholeStageCodegen spans).
  *
  * `runMain graft.PlanDump <tag> <suffix> <query,query,...>`
  * e.g. `runMain graft.PlanDump r08 before graph_triangles,kg_two_hop`.
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) and SPARK_GRAFT_CPUS (default
  * 32) so the dumped plan is the bench-shaped one.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <q1,q2,...>")
    val tag = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = kg.KgPipeline.session(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/$tag/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
