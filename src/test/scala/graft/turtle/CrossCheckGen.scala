package graft.turtle

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Cross-engine fuzz corpus: deterministically generates adversarial Turtle
  * documents (seeded splitmix64 — reproducible byte-for-byte), dumps each
  * doc plus the SCALA engine's outcome (parse/produce status, round-trip
  * flag, canonical triples), in exactly the layout `tools/refgen` consumes —
  * so the actual Rust reference can be run over the SAME corpus and diffed:
  *
  * {{{
  *   sbt "Test/runMain graft.turtle.CrossCheckGen /tmp/xcheck 400"
  *   target/refgen/debug/refgen /tmp/xcheck/docs /tmp/xcheck/ref_out
  *   diff /tmp/xcheck/scala_out /tmp/xcheck/ref_out   # modulo status columns
  * }}}
  *
  * Coverage beyond the 43 fixtures: nested collections/BNPLs, mid-document
  * @base changes with relative-IRI resolution, all four quote styles with
  * ECHAR/UCHAR escapes (incl. surrogate pairs), exotic numeric spellings,
  * langtags, undeclared prefixes (refusal path), PN_LOCAL greediness, and
  * whitespace/comment placement.
  */
object CrossCheckGen {

  private def mix(z0: Long): Long = graft.kg.PagesSource.mix64(z0)

  private final class Rng(seed: Long) {
    private var s = seed
    def next(): Long = { s = mix(s); s }
    def int(n: Int): Int = ((next() >>> 33) % n).toInt
    def pick[A](xs: Seq[A]): A = xs(int(xs.size))
  }

  private val wsChoices = Seq(" ", "\n", "  ", "\t", " # note\n ", "\n\n")
  private val iriRefs = Seq(
    "<http://e.x/a>", "<http://e.x/b#frag>", "<rel/x>", "<../up>", "<#f>",
    "<http://e.x/p?q=1&r=2>", "<urn:uuid:1234>", "<x>",
    "<>") // empty IRIREF: both engines must REJECT (is_not needs >=1 char)
  private val pnames = Seq("p:s", "p:o", ":bare", "ex:a1", "p:l.dotted",
    "p:x-y_z", "q:undeclared")
  private val literals = Seq(
    "\"plain\"", "'single'", "\"\"\"long\n\"quoted\" inner\"\"\"",
    "'''l'ong'''", "\"esc\\n\\t\\\\\"", "\"uni\\u00E9\"",
    "\"astral\\U0001F600\"", "\"tag\"@en", "\"tag2\"@en-US",
    "\"dt\"^^<http://www.w3.org/2001/XMLSchema#date>", "\"dt2\"^^p:t",
    "42", "-7", "+042", "3.14", "-0.5", "+.5", ".25", "1.663E-4", "2e0",
    "-1.E+2", "12E3", "true", "false")
  private val bnodes = Seq("_:b1", "_:b2", "_:x9.y", "[ ]", "[  ]")

  private def obj(r: Rng, depth: Int): String = {
    val roll = r.int(if (depth >= 2) 10 else 14)
    if (roll < 4) r.pick(iriRefs)
    else if (roll < 7) r.pick(pnames)
    else if (roll < 9) r.pick(literals)
    else if (roll < 10) r.pick(bnodes)
    else if (roll < 12) { // collection
      val n = r.int(3)
      val items = Seq.fill(n)(obj(r, depth + 1)).mkString(" ")
      s"( $items )"
    } else { // blank node property list
      s"[ ${r.pick(pnames)} ${obj(r, depth + 1)} ]"
    }
  }

  private def statement(r: Rng): String = {
    val w = r.pick(wsChoices)
    val s = r.int(4) match {
      case 0 => r.pick(iriRefs)
      case 1 => r.pick(pnames)
      case 2 => "_:subj"
      case _ => r.pick(Seq("<http://e.x/s1>", "p:s"))
    }
    val polN = 1 + r.int(2)
    val pol = (0 until polN).map { _ =>
      val v = if (r.int(4) == 0) "a" else r.pick(iriRefs ++ pnames)
      val objN = 1 + r.int(2)
      val objs = (0 until objN).map(_ => obj(r, 0)).mkString(", ")
      s"$v $objs"
    }.mkString(" ; ")
    s"$w$s $pol ."
  }

  private def directive(r: Rng): String = {
    val w = r.pick(wsChoices)
    val d = r.pick(Seq(
      "@prefix p: <http://p.x/> .",
      "@prefix : <http://d.x/ns#> .",
      "@prefix ex: <http://ex.org/> .",
      "@prefix q: <http://q.x/> .",
      "@base <http://base1.x/dir/> .",
      "@base <http://base2.x/other/> .",
      "PREFIX p: <http://pp.x/>",
      "BASE <http://base3.x/>"))
    s"$w$d"
  }

  def genDoc(i: Long): String = {
    val r = new Rng(0xC0FFEE ^ i)
    // half the corpus declares every prefix (+ a base) upfront so the
    // produce path gets real coverage; the other half stays adversarial
    // (undeclared prefixes, mid-doc base changes → refusals/errors)
    val prelude =
      if (i % 2 == 0)
        "@prefix p: <http://p.x/> .\n@prefix : <http://d.x/ns#> .\n" +
          "@prefix ex: <http://ex.org/> .\n@prefix q: <http://q.x/> .\n" +
          "@base <http://base0.x/dir/> .\n"
      else ""
    val n = 2 + r.int(7)
    val parts = (0 until n).map { _ =>
      if (r.int(4) == 0) directive(r) else statement(r)
    }
    prelude + parts.mkString("") + r.pick(Seq("", "\n", " # trailing\n"))
  }

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/xcheck")
    val n = if (args.length > 1) args(1).toInt else 400
    val docsDir = outDir.resolve("docs/reference_examples")
    Files.createDirectories(docsDir)
    Files.createDirectories(outDir.resolve("docs/wildtype_examples"))
    val scalaOut = outDir.resolve("scala_out")
    Files.createDirectories(scalaOut)

    val status = new StringBuilder
    for (i <- 0L until n) {
      val name = f"gen$i%05d.ttl"
      val doc = genDoc(i)
      Files.write(docsDir.resolve(name), doc.getBytes(StandardCharsets.UTF_8))
      TurtleParser.parseFull(doc) match {
        case Left(e) =>
          val kind = e match {
            case TurtleParser.NotFullyParsed(_) => "not_fully_parsed"
            case _                              => "parse_error"
          }
          status.append(s"reference_examples/$name\tparse_err\t-\t0\t$kind\n")
        case Right(ast) =>
          val rt = if (TurtleSerializer.render(ast) == doc) "rt_ok" else "RT_FAIL"
          TripleProducer.produce(ast) match {
            case Left(_) =>
              status.append(s"reference_examples/$name\trefused\t$rt\t0\n")
            case Right(ts) =>
              val lines = GoldenTriples.canonicalLines(ts)
              Files.write(scalaOut.resolve(s"reference_examples_$name.tsv"),
                lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
              status.append(
                s"reference_examples/$name\tproduced\t$rt\t${lines.size}\n")
          }
      }
    }
    Files.write(outDir.resolve("scala_status.tsv"),
      status.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $n docs + scala outcomes to $outDir")
  }
}
