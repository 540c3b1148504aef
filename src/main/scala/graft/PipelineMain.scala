package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point: runs the full KG pipeline over n synthetic
  * pages and prints the run metrics (see bin/spark-submit-pipeline.sh). */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-out").toString
    // spark-submit provides master/conf; builder only fills local-run gaps
    val spark = SparkSession.builder().appName("graft-kg-pipeline")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = kg.KgPipeline.run(spark, n, out)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"pages=${r.pages} triples=${r.triples} errors=${r.errors} " +
      f"linked=${r.linkedMentions} components=${r.components} " +
      f"secs=$secs%.1f triples_per_sec=${r.triples / secs}%.0f out=$out")
    spark.stop()
  }
}
