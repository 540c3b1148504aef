package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Model._

/** End-to-end KG construction (north_star): synthesize/scan pages → extract
  * embedded Turtle → parse + produce triples → entity-link mentions →
  * canonicalize via connected components → materialize partitioned triple
  * tables with lineage + manifest.
  *
  * Session defaults for scale are set in [[session]]: AQE on (coalescing +
  * skew-join splitting), shuffle partitions sized to cores (overridable),
  * broadcast threshold left at default — all broadcast decisions in this
  * code are explicit `broadcast()` hints.
  */
object KgPipeline {

  def session(master: String, shufflePartitions: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    b.getOrCreate()
  }

  final case class Result(
      pages: Long,
      triples: Long,
      errors: Long,
      linkedMentions: Long,
      components: Long,
      lineage: DataFrame)

  /** Run the full pipeline over n synthetic pages, materializing to outDir. */
  def run(spark: SparkSession, n: Long, outDir: String): Result = {
    import spark.implicits._

    val pages: Dataset[Page] = PagesSource.pages(spark, n)

    // parse+produce is the expensive CPU stage and feeds three consumers
    // (linking, canonicalization, materialization) → cache it once
    val triples: Dataset[TripleRow] = TripleExtraction.run(pages).cache()

    val linked = EntityLinking.run(triples)

    val edges = Canonicalize.sameAsEdges(triples)
    val labels = Canonicalize.connectedComponents(edges).cache()

    val canonical = Canonicalize.canonicalizeTriples(triples, labels)

    val lineage = Materialize.write(canonical, outDir)

    // totals come out of the (tiny, already-written) lineage table — one
    // small collect instead of two extra passes over the triple stream
    val totals = lineage.agg(sum($"triples"), sum($"errors")).head()
    val linkedCount = linked.count()
    val componentCount = labels.agg(countDistinct($"canonical")).head().getLong(0)

    val r = Result(n, totals.getLong(0), totals.getLong(1), linkedCount,
      componentCount, lineage)
    triples.unpersist()
    labels.unpersist()
    r
  }
}
