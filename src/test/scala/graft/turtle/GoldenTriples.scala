package graft.turtle

import TripleProducer._

/** Golden-triple machinery for the P/R >= 0.95 gate (BASELINE.md).
  *
  * Triples are rendered to a canonical text form with blank nodes relabeled
  * `_:c0, _:c1, …` in first-appearance order — the bnode-isomorphism-tolerant
  * comparison of FIXTURES.md §4: two producers that emit structurally
  * identical graphs in the same statement order compare equal regardless of
  * their internal bnode ids. */
object GoldenTriples {

  def canonicalLines(ts: Vector[RdfTriple]): Vector[String] = {
    val ids = scala.collection.mutable.HashMap.empty[Int, Int]
    def b(id: Int): String = "_:c" + ids.getOrElseUpdate(id, ids.size)
    ts.map { t =>
      val s = t.subj match {
        case TIri(i)    => s"<$i>"
        case TBnode(id) => b(id)
        case TLit(_, _, _) => "!literal-subject"
      }
      val o = t.obj match {
        case TIri(i)    => s"<$i>"
        case TBnode(id) => b(id)
        case TLit(l, d, g) =>
          val esc = l.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")
          "\"" + esc + "\"" + g.map("@" + _).getOrElse("") +
            d.map("^^<" + _ + ">").getOrElse("")
      }
      s"$s\t<${t.pred}>\t$o"
    }
  }

  /** Precision/recall of `got` vs `want` as multisets of canonical lines. */
  def precisionRecall(got: Vector[String], want: Vector[String]): (Double, Double) = {
    def multiset(v: Vector[String]) = v.groupBy(identity).view.mapValues(_.size).toMap
    val g = multiset(got)
    val w = multiset(want)
    val hit = g.map { case (k, n) => math.min(n, w.getOrElse(k, 0)) }.sum
    val p = if (got.isEmpty) 1.0 else hit.toDouble / got.size
    val r = if (want.isEmpty) 1.0 else hit.toDouble / want.size
    (p, r)
  }

  def producedLines(fixtureText: String): Either[String, Vector[String]] =
    TurtleParser.parseFull(fixtureText) match {
      case Left(e) => Left(s"parse: $e")
      case Right(doc) => TripleProducer.produce(doc).map(canonicalLines)
    }
}

/** Regenerates the golden TSVs from the current producer. Run via
  * `sbt "Test/runMain graft.turtle.GoldenGen"` ONLY after auditing a change
  * against the W3C spec semantics — goldens are the frozen contract.
  * Any regeneration must be re-verified byte-identical against the Rust
  * reference via `tools/refgen` (see tools/refgen/README.md), which is the
  * goldens' source of truth since round 2. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get("src/test/resources/goldens/triples")
    java.nio.file.Files.createDirectories(outDir)
    var n = 0
    for ((name, text) <- graft.kg.FixtureCorpus.all) {
      GoldenTriples.producedLines(text) match {
        case Right(lines) =>
          val f = outDir.resolve(name.replace('/', '_') + ".tsv")
          java.nio.file.Files.write(f,
            lines.mkString("", "\n", "\n").getBytes("UTF-8"))
          n += 1
        case Left(_) => () // refused fixtures have no golden
      }
    }
    println(s"wrote $n goldens to $outDir")
  }
}
