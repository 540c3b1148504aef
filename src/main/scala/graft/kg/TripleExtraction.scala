package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.turtle.{TurtleParser, TurtleSerializer, TripleProducer}
import graft.turtle.TripleProducer.{TIri, TBnode, TLit}
import Model._

/** Parse + triple-produce stage: `Dataset[Page] → Dataset[TripleRow]`
  * (SURVEY.md §2.3 T1-T9 as one typed flatMap — embarrassingly parallel per
  * document, no shuffle, document-scoped state lives in local variables).
  *
  * Error semantics as data (SURVEY.md §7 "hard parts"): a poison document
  * yields an error row, never a task failure. Blank-node ids are derived from
  * (url-hash, block index, traversal sequence) — deterministic under retries.
  */
object TripleExtraction {

  /** Render one producer term into flat columns. */
  private def bnodeLabel(urlHash: Long, block: Int, id: Int): String =
    "_:h" + java.lang.Long.toHexString(urlHash) + "b" + block + "_" + id

  def triplesForPage(page: Page): Iterator[TripleRow] = {
    val blocks = Extract.extractBlocks(page.html)
    val urlHash = PagesSource.fnv64(page.url)
    blocks.iterator.zipWithIndex.flatMap { case (block, bi) =>
      TurtleParser.parseFull(block) match {
        case Left(err) =>
          Iterator.single(TripleRow(page.url, bi, null, null, null, null,
            null, null, null,
            err match {
              case TurtleParser.NotFullyParsed(rest) =>
                "NotFullyParsed: " + rest.take(64)
              case e => e.toString.take(128)
            }))
        case Right(doc) =>
          TripleProducer.produce(doc) match {
            case Left(err) =>
              Iterator.single(TripleRow(page.url, bi, null, null, null, null,
                null, null, null, "ProduceError: " + err.take(128)))
            case Right(ts) =>
              // per-document dedup: the triple identity key includes
              // (url, block), so duplicates can only occur WITHIN a
              // document — deduplicating here (a few hundred rows in
              // memory) replaces a cluster-wide sort/shuffle dedup at
              // materialization time
              ts.distinct.iterator.map { t =>
                val (s, sk) = t.subj match {
                  case TIri(i)    => (i, "iri")
                  case TBnode(id) => (bnodeLabel(urlHash, bi, id), "bnode")
                  case _          => (null, null) // literal subject impossible
                }
                val (ok, ov, od, ol) = t.obj match {
                  case TIri(i)       => ("iri", i, null, null)
                  case TBnode(id)    => ("bnode", bnodeLabel(urlHash, bi, id), null, null)
                  case TLit(l, d, g) => ("literal", l, d.orNull, g.orNull)
                }
                TripleRow(page.url, bi, s, sk, t.pred, ok, ov, od, ol, null)
              }
          }
      }
    }
  }

  def run(pages: Dataset[Page]): Dataset[TripleRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(triplesForPage _)
  }

  /** Per-page body of [[roundTrip]] (pure — reused by the fuzz harness). */
  def roundTripForPage(page: Page): Vector[RoundTrip] =
    Extract.extractBlocks(page.html).zipWithIndex.map {
      case (block, bi) =>
        TurtleParser.parseFull(block) match {
          case Right(doc) =>
            RoundTrip(page.url, bi, parsed = true,
              byte_identical = TurtleSerializer.render(doc) == block)
          case Left(_) => RoundTrip(page.url, bi, parsed = false, byte_identical = false)
        }
    }

  /** Round-trip audit (the north-star byte-identity gate, per block). */
  def roundTrip(pages: Dataset[Page]): Dataset[RoundTrip] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(roundTripForPage _)
  }
}
