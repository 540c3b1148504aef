package graft

/** Smoke-runs the driver contract: `SparkEntry.entry` must return >0 rows on
  * sf0.001-scale input (the driver's t1 check). Exits nonzero on violation. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = kg.KgPipeline.session("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY ROWS=$n")
    df.show(5, 120)
    // kg queries must tolerate an unknown sf dir (default page count)
    println("KG_ANY_DIR ROWS=" +
      SparkEntry.queries("kg_triples")(spark, "/no/such/dir").count())
    // oracle-backed query at the smallest scale
    println("Q1_SF0001 ROWS=" +
      SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001").count())
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
