package graft.turtle

/** RFC 3986 reference resolution (§5.2), matching the strict resolver the
  * reference uses (oxiri; see /root/reference/src/triple_production.rs:337-343
  * — "Requires parsing the base and the iri").
  *
  * Public-knowledge algorithm: RFC 3986 sections 5.2.1-5.2.4 + 5.3
  * (merge, remove_dot_segments, recomposition). No transformation is applied
  * when no base is set — the reference passes relative IRIs through verbatim
  * in that case (triple_production.rs:339-342).
  */
object IriResolver {

  /** scheme / authority / path / query / fragment split per RFC 3986
    * Appendix B. Never fails — every string decomposes. */
  final case class IriParts(
      scheme: Option[String],
      authority: Option[String],
      path: String,
      query: Option[String],
      fragment: Option[String]) {

    def recompose: String = {
      val sb = new java.lang.StringBuilder
      scheme.foreach { s => sb.append(s).append(':') }
      authority.foreach { a => sb.append("//").append(a) }
      sb.append(path)
      query.foreach { q => sb.append('?').append(q) }
      fragment.foreach { f => sb.append('#').append(f) }
      sb.toString
    }
  }

  def split(s: String): IriParts = {
    var rest = s
    var scheme: Option[String] = None
    var authority: Option[String] = None
    var query: Option[String] = None
    var fragment: Option[String] = None

    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = Some(rest.substring(hash + 1)); rest = rest.substring(0, hash) }
    val qm = rest.indexOf('?')
    if (qm >= 0) { query = Some(rest.substring(qm + 1)); rest = rest.substring(0, qm) }
    // scheme = 1+ chars without :/?# followed by ':'
    val colon = rest.indexOf(':')
    if (colon > 0 && rest.substring(0, colon).forall(c =>
        c != '/' && c != '?' && c != '#') && isSchemeLike(rest.substring(0, colon))) {
      scheme = Some(rest.substring(0, colon))
      rest = rest.substring(colon + 1)
    }
    if (rest.startsWith("//")) {
      val afterAuth = rest.indexWhere(c => c == '/', 2) match {
        case -1 => rest.length
        case i  => i
      }
      authority = Some(rest.substring(2, afterAuth))
      rest = rest.substring(afterAuth)
    }
    IriParts(scheme, authority, rest, query, fragment)
  }

  /** RFC 3986 §3.1: ALPHA (ALPHA|DIGIT|'+'|'-'|'.')* */
  private def isSchemeLike(s: String): Boolean =
    s.nonEmpty && s.head.isLetter && s.forall(c =>
      c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  /** Character-level IRI validation approximating oxiri's RFC 3987 grammar
    * check: characters that can never appear in a valid IRI (space, control
    * chars, and `<>"{}|\^` + backtick) are rejected. The reference's parser
    * accepts ANY character except '>' inside `<...>` (lib.rs:941-957), but
    * its producer then FAILS on such IRIs when oxiri parses them
    * (triple_production.rs:247,341) — this check reproduces that
    * produce-time error. Applied exactly where the reference applies oxiri:
    * base parsing, and reference resolution WHEN a base is set; bare
    * IRIREFs with no base pass through unvalidated
    * (triple_production.rs:339-342). */
  def invalidChar(s: String): Option[Char] =
    s.find(c => c == ' ' || Character.isISOControl(c) ||
      c == '<' || c == '>' || c == '"' || c == '{' || c == '}' ||
      c == '|' || c == '\\' || c == '^' || c == '`')

  /** RFC 3986 §2.1: every '%' must start a pct-encoded triplet
    * (`% HEXDIG HEXDIG`) — oxiri validates this in its grammar.
    * HEXDIG is ASCII-only (RFC 3986 §1.3 / RFC 2234): an explicit ASCII
    * check, NOT Character.digit(c,16), which also accepts non-ASCII
    * Unicode digits and fullwidth hex letters (e.g. U+0663, U+FF46) and
    * would make graft produce IRIs like `<a%٣٣b>` that oxiri rejects. */
  private def isAsciiHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  def invalidPctEncoding(s: String): Boolean = {
    var i = s.indexOf('%')
    while (i >= 0) {
      if (i + 2 >= s.length ||
        !isAsciiHex(s.charAt(i + 1)) ||
        !isAsciiHex(s.charAt(i + 2))) return true
      i = s.indexOf('%', i + 3)
    }
    false
  }

  private def validate(s: String, what: String): Option[String] =
    invalidChar(s) match {
      case Some(c) => Some(s"Invalid $what (character '$c' not allowed): $s")
      case None =>
        if (invalidPctEncoding(s))
          Some(s"Invalid $what (malformed percent-encoding): $s")
        else None
    }

  /** Validate + parse a base IRI (mirrors oxiri Iri::parse failing on
    * relative input — triple_production.rs:247). */
  def parseBase(s: String): Either[String, IriParts] = {
    validate(s, "base IRI") match {
      case Some(msg) => return Left(msg)
      case None      => ()
    }
    val p = split(s)
    if (p.scheme.isEmpty) Left(s"Invalid base IRI (no scheme): $s")
    else Right(p)
  }

  /** RFC 3986 §5.2.2 transform references; Left on an invalid reference
    * (mirrors oxiri base.resolve(ref) failing — triple_production.rs:341). */
  def resolveChecked(base: IriParts, ref: String): Either[String, String] =
    validate(ref, "IRI reference") match {
      case Some(msg) => Left(msg)
      case None      => Right(resolve(base, ref))
    }

  /** RFC 3986 §5.2.2 transform references (no validation — see
    * [[resolveChecked]]). */
  def resolve(base: IriParts, ref: String): String = {
    val r = split(ref)
    val t =
      if (r.scheme.isDefined)
        r.copy(path = removeDotSegments(r.path))
      else if (r.authority.isDefined)
        IriParts(base.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        IriParts(base.scheme, base.authority, base.path,
          if (r.query.isDefined) r.query else base.query, r.fragment)
      else if (r.path.startsWith("/"))
        IriParts(base.scheme, base.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        IriParts(base.scheme, base.authority,
          removeDotSegments(merge(base, r.path)), r.query, r.fragment)
    t.recompose
  }

  /** RFC 3986 §5.2.3 */
  private def merge(base: IriParts, refPath: String): String =
    if (base.authority.isDefined && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** RFC 3986 §5.2.4 */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        // move first segment (incl. leading '/') to output
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }
}
