package graft.kg

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.turtle.CrossCheckGen

/** Pipeline-tier cross-engine fuzzing (round-3 ask #8): fuzzes whole PAGES —
  * multi-block HTML with decoy script tags, malformed blocks, unclosed
  * containers, directive-ordering traps — through the REAL extraction +
  * TripleExtraction layer (pure-JVM path of the Spark flatMap), then dumps
  * every extracted block plus the pipeline's per-block outcome in exactly
  * the `tools/refgen` layout, so the compiled Rust reference can be run over
  * the same blocks and diffed:
  *
  * {{{
  *   sbt "Test/runMain graft.kg.PageCrossCheckGen /tmp/pagecheck 500"
  *   target/refgen/release/refgen /tmp/pagecheck/docs /tmp/pagecheck/ref_out
  *   # diff classifications + triples: scala_status.tsv vs ref_out/status.tsv
  * }}}
  *
  * What this anchors beyond the grammar-tier CrossCheckGen corpus: the
  * extraction cut semantics (first `</script>` wins, unclosed block dropped,
  * decoy tags ignored), the error-as-data classification of
  * TripleExtraction (NotFullyParsed / parse error / ProduceError), the
  * per-block bnode allocation (relabeled canonically for comparison), and
  * the zero-triple-produce path that emits no rows.
  */
object PageCrossCheckGen {

  private def mix(z0: Long): Long = PagesSource.mix64(z0)

  private val OPEN = "<script type=\"text/turtle\">"
  private val CLOSE = "</script>"

  /** Deterministic fuzz page i: html + the blocks extraction MUST yield.
    * Block payloads come from the grammar-tier fuzz generator (broad
    * adversarial Turtle), wrapped in adversarial HTML. */
  def genPage(i: Long): (String, Vector[String]) = {
    val r0 = mix(0xBADC0DEL ^ i)
    val nBlocks = (mix(r0 + 1) & 0x7FFFFFFF) % 4 // 0..3
    val blocks = (0L until nBlocks).map { k =>
      val roll = (mix(r0 + 10 + k) & 0x7FFFFFFF) % 10
      if (roll == 0) "" // empty block
      else if (roll == 1) "<unclosed" // malformed
      else if (roll == 2) "@prefix p: <http://p.x/> ." // directives-only: 0 triples
      else if (roll == 3) " \t\n# only a comment\n" // whitespace+comment only
      else CrossCheckGen.genDoc(mix(r0 + 20 + k) & 0xFFFFF)
    }.toVector

    val sb = new StringBuilder("<html><head><title>fuzz ")
    sb.append(i).append("</title>")
    // decoy tags that must NOT be extracted
    if ((mix(r0 + 2) & 3) == 0)
      sb.append("<script type=\"text/javascript\">var x = '<not turtle>';</script>")
    if ((mix(r0 + 3) & 3) == 0)
      sb.append("<SCRIPT TYPE=\"TEXT/TURTLE\">@case sensitive .</SCRIPT>")
    sb.append("</head><body><p>fuzz page ").append(i).append("</p>")
    blocks.foreach { blk =>
      sb.append(OPEN).append(blk).append(CLOSE)
      if ((mix(r0 + 4) & 3) == 0) sb.append("<p>between blocks</p>")
    }
    if ((mix(r0 + 5) & 7) == 0)
      sb.append(OPEN).append("<http://t.x/a> <http://t.x/b> ") // unclosed: dropped
    sb.append("</body></html>")
    (sb.toString, blocks)
  }

  /** Canonical refgen-format line for a success TripleRow, with bnode
    * labels relabeled `_:cN` in first-appearance order per block.
    * (package-visible: KgOracleGen reuses it for the oracle parity check) */
  private[kg] final class Canon {
    private val ids = scala.collection.mutable.HashMap.empty[String, Int]
    private def b(label: String): String =
      "_:c" + ids.getOrElseUpdate(label, ids.size)
    def line(t: Model.TripleRow): String = {
      val s = if (t.subj_kind == "bnode") b(t.subj) else s"<${t.subj}>"
      val o = t.obj_kind match {
        case "iri"   => s"<${t.obj_value}>"
        case "bnode" => b(t.obj_value)
        case _ =>
          val esc = t.obj_value.replace("\\", "\\\\")
            .replace("\n", "\\n").replace("\t", "\\t")
          "\"" + esc + "\"" +
            Option(t.obj_lang).map("@" + _).getOrElse("") +
            Option(t.obj_datatype).map("^^<" + _ + ">").getOrElse("")
      }
      s"$s\t<${t.pred}>\t$o"
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/pagecheck")
    val n = if (args.length > 1) args(1).toInt else 500
    val docsDir = outDir.resolve("docs/reference_examples")
    Files.createDirectories(docsDir)
    Files.createDirectories(outDir.resolve("docs/wildtype_examples"))
    val scalaOut = outDir.resolve("scala_out")
    Files.createDirectories(scalaOut)

    val status = new StringBuilder
    var extractionViolations = 0
    for (i <- 0L until n) {
      val (html, expected) = genPage(i)
      val htmlBytes = html.getBytes(StandardCharsets.UTF_8)

      // 1. extraction semantics: exactly the intended blocks, in order
      //    (decoys ignored, unclosed trailing block dropped)
      val got = Extract.extractBlocks(htmlBytes)
      if (got != expected) {
        extractionViolations += 1
        System.err.println(s"EXTRACTION MISMATCH page $i: got ${got.size} blocks, expected ${expected.size}")
      }
      // 2. the input_hint invariant: text column == concatenated blocks
      require(Extract.extractText(htmlBytes) == expected.mkString,
        s"extractText invariant broken on page $i")

      // 3. pipeline outcomes per block (the REAL flatMap body)
      val url = s"https://fuzz.example/page/$i"
      val page = Model.Page(url, new java.sql.Timestamp(0L), htmlBytes,
        expected.mkString, "en")
      val rows = TripleExtraction.triplesForPage(page).toVector
      val byBlock = rows.groupBy(_.block)
      // per-block round-trip flag via the pipeline's audit path
      val rtFlags = TripleExtraction.roundTripForPage(page)

      expected.indices.foreach { bi =>
        val name = f"fuzz$i%05d_b$bi.ttl"
        Files.write(docsDir.resolve(name),
          expected(bi).getBytes(StandardCharsets.UTF_8))
        val rt =
          if (!rtFlags(bi).parsed) "-"
          else if (rtFlags(bi).byte_identical) "rt_ok"
          else "RT_FAIL"
        val blockRows = byBlock.getOrElse(bi, Vector.empty)
        if (blockRows.isEmpty) {
          // zero rows = parsed + produced zero triples (directives-only /
          // whitespace-only docs); refgen writes an empty tsv for these
          Files.write(scalaOut.resolve(s"reference_examples_$name.tsv"),
            "\n".getBytes(StandardCharsets.UTF_8))
          status.append(s"reference_examples/$name\tproduced\t$rt\t0\t-\n")
        } else if (blockRows.head.error != null) {
          val e = blockRows.head.error
          if (e.startsWith("NotFullyParsed"))
            status.append(s"reference_examples/$name\tparse_err\t-\t0\tnot_fully_parsed\n")
          else if (e.startsWith("ProduceError"))
            status.append(s"reference_examples/$name\trefused\t$rt\t0\t-\n")
          else
            status.append(s"reference_examples/$name\tparse_err\t-\t0\tparse_error\n")
        } else {
          // NOTE for the diff: the pipeline dedups triples per document
          // (TripleExtraction ts.distinct — a documented deviation); the
          // reference emits duplicates. Compare scala lines against the
          // first-occurrence-distinct of the reference's lines (stable:
          // dedup never removes a bnode's first appearance, so canonical
          // labels are unaffected).
          val canon = new Canon
          val lines = blockRows.map(canon.line)
          Files.write(scalaOut.resolve(s"reference_examples_$name.tsv"),
            lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
          status.append(s"reference_examples/$name\tproduced\t$rt\t${lines.size}\t-\n")
        }
      }
    }
    Files.write(outDir.resolve("scala_status.tsv"),
      status.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $n fuzz pages to $outDir; extraction_violations=$extractionViolations")
    require(extractionViolations == 0, "extraction semantics diverged from the generator model")
  }
}
