package graft.kg

import java.nio.charset.StandardCharsets

/** HTML → embedded-Turtle extraction (SURVEY.md §2.5 "Extract" stage).
  *
  * Deterministic scan for `<script type="text/turtle">…</script>` blocks.
  * Per-row invariant (BASELINE.json input_hint): the concatenation of the
  * extracted blocks is byte-identical to the page's `text` column —
  * [[extractText]] is THE definition of that invariant and is asserted in
  * tests and countable in the pipeline.
  */
object Extract {

  private val OPEN = "<script type=\"text/turtle\">"
  private val CLOSE = "</script>"

  def extractBlocks(html: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var going = true
    while (going) {
      val s = html.indexOf(OPEN, from)
      if (s < 0) going = false
      else {
        val contentStart = s + OPEN.length
        val e = html.indexOf(CLOSE, contentStart)
        if (e < 0) going = false
        else {
          out += html.substring(contentStart, e)
          from = e + CLOSE.length
        }
      }
    }
    out.result()
  }

  def extractBlocks(html: Array[Byte]): Vector[String] =
    extractBlocks(new String(html, StandardCharsets.UTF_8))

  /** The byte-identity invariant: blocks concatenated with no separator. */
  def extractText(html: Array[Byte]): String = extractBlocks(html).mkString
}
