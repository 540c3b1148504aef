package graft

/** Prints formatted physical plans of headline queries so plan properties
  * (PushedFilters / ReadSchema pruning, broadcast joins, WholeStageCodegen
  * spans) can be audited per round. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set("q1_agg", "q2_join_broadcast", "q8_semi_join", "text_tokens")
    val spark = kg.KgPipeline.session("local[4]", 4)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
