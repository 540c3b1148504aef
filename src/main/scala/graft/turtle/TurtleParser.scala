package graft.turtle

import Ast._

/** Recursive-descent Turtle parser, production-for-production equivalent to
  * the reference grammar (reference: /root/reference/src/lib.rs, parse fns).
  *
  * Faithfulness notes (these quirks are load-bearing for byte-identical
  * round-trips and for triple P/R vs the reference — do NOT "fix" them):
  *
  *  - Ordered alternatives are PEG-style: first match wins. Orderings that
  *    matter: Double before Decimal before Integer (lib.rs:1154-1158), long
  *    quote styles before short (lib.rs:1516-1527), BlankNode before IRI
  *    (lib.rs:248, 625), RDFLiteral before Boolean before Numeric
  *    (lib.rs:1048-1052), Directive before Triples (lib.rs:94-97).
  *  - PN_LOCAL is the reference's approximation (lib.rs:981-982): after ':'
  *    it greedily takes everything that is not ` \t\r\n,)]` — so it eats `;`
  *    `.` `#`. (This is why `blank_node_object_dot.ttl` fails to parse.)
  *  - A prefix name in a PrefixedName is `many1(PN_CHARS)` — no first-char
  *    restriction (lib.rs:979 TODO).
  *  - `<...>` IRI references take 1+ chars up to `>` with no validation and
  *    no unescaping (lib.rs:956); `<>` does NOT parse (nom is_not needs 1+).
  *  - A Triples statement requires >=1 plain whitespace (no comments) before
  *    the final '.' and that whitespace is DISCARDED (lib.rs:206-208); the
  *    serializer re-emits exactly " ." (lib.rs:219,226).
  *  - Blank node labels: many1(first-class) ++ many0(PN_CHARS|'.') — a
  *    trailing '.' is swallowed into the label (lib.rs:362-405).
  *  - String scanning finds the first closing quote preceded by an even
  *    number of backslashes (lib.rs:1420-1462).
  *  - Whitespace includes `#` comments to end-of-line (lib.rs:141-147).
  *
  * Positions are UTF-16 indices into the input; character-class scans iterate
  * by code point (PN_CHARS_BASE spans #x10000-#xEFFFF, lib.rs:1015).
  */
object TurtleParser {

  sealed trait ParseFailure extends Product with Serializable
  /** No parse at all / malformed prefix of input. */
  final case class SyntaxError(msg: String) extends ParseFailure
  /** Document parsed but input remains (lib.rs:41-44). */
  final case class NotFullyParsed(remainder: String) extends ParseFailure

  /** Lenient parse: consumes the longest valid document prefix, returns the
    * doc and the number of chars consumed (lib.rs:47-58). */
  def parse(input: String): (TurtleDoc, Int) = {
    val p = new Parser(input)
    val (stmts, afterStatements) = p.statements(0)
    val (trail, end) = p.optWs(afterStatements)
    (TurtleDoc(stmts, trail), end)
  }

  /** Strict parse: the whole input must be consumed (lib.rs:38-45). */
  def parseFull(input: String): Either[ParseFailure, TurtleDoc] = {
    val (doc, end) = parse(input)
    if (end != input.length) Left(NotFullyParsed(input.substring(end)))
    else Right(doc)
  }

  // Parse result: Some((node, nextPos)) or None with no input consumed.
  private type R[+T] = Option[(T, Int)]

  /** Max nesting depth of objects (collections / BNPLs). A crawled document
    * with pathological nesting must yield a parse failure (an error row at
    * the pipeline level), never a StackOverflowError that kills the task. */
  val MAX_DEPTH = 512

  private final class Parser(val in: String) {
    private val n = in.length
    private var depth = 0

    // ---- lexical helpers -------------------------------------------------

    /** [161s] WS ::= #x20 | #x9 | #xD | #xA (lib.rs:150-153) */
    @inline private def isWsChar(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\r' || c == '\n'

    /** Whitespace incl. comments, merged into one string (lib.rs:121-148). */
    def ws(pos: Int): R[String] = {
      var i = pos
      while (i < n) {
        val c = in.charAt(i)
        if (isWsChar(c)) i += 1
        else if (c == '#') { // comment to EOL; '\n' belongs to next ws run
          i += 1
          while (i < n && in.charAt(i) != '\n') i += 1
        } else {
          return if (i == pos) None else Some((in.substring(pos, i), i))
        }
      }
      if (i == pos) None else Some((in.substring(pos, i), i))
    }

    def optWs(pos: Int): (Option[String], Int) = ws(pos) match {
      case Some((w, p)) => (Some(w), p)
      case None         => (None, pos)
    }

    /** nom multispace1: 1+ of space/tab/CR/LF, comments NOT included. */
    def multispace1(pos: Int): Int = {
      var i = pos
      while (i < n && isWsChar(in.charAt(i))) i += 1
      if (i == pos) -1 else i
    }

    @inline private def startsWith(pos: Int, s: String): Boolean =
      in.startsWith(s, pos)

    // [163s..166s] character classes (lib.rs:999-1033)
    def isPnCharsBase(cp: Int): Boolean =
      (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0x00C0 && cp <= 0x00D6) || (cp >= 0x00D8 && cp <= 0x00F6) ||
        (cp >= 0x00F8 && cp <= 0x02FF) || (cp >= 0x0370 && cp <= 0x037D) ||
        (cp >= 0x037F && cp <= 0x1FFF) || (cp >= 0x200C && cp <= 0x200D) ||
        (cp >= 0x2070 && cp <= 0x218F) || (cp >= 0x2C00 && cp <= 0x2FEF) ||
        (cp >= 0x3001 && cp <= 0xD7FF) || (cp >= 0xF900 && cp <= 0xFDCF) ||
        (cp >= 0xFDF0 && cp <= 0xFFFD) || (cp >= 0x10000 && cp <= 0xEFFFF)

    def isPnCharsU(cp: Int): Boolean = isPnCharsBase(cp) || cp == '_'

    def isPnChars(cp: Int): Boolean =
      isPnCharsU(cp) || cp == '-' || (cp >= '0' && cp <= '9') ||
        cp == 0x00B7 || (cp >= 0x0300 && cp <= 0x036F) ||
        (cp >= 0x203F && cp <= 0x2040)

    /** Scan 0+ code points matching `pred`; returns end position. */
    private def scanCp(pos: Int, pred: Int => Boolean): Int = {
      var i = pos
      while (i < n) {
        val cp = in.codePointAt(i)
        if (!pred(cp)) return i
        i += Character.charCount(cp)
      }
      i
    }

    // ---- document --------------------------------------------------------

    /** many0(Statement::parse) (lib.rs:52) */
    def statements(pos: Int): (Vector[Statement], Int) = {
      val acc = Vector.newBuilder[Statement]
      var cur = pos
      var go = true
      while (go) statement(cur) match {
        case Some((s, p)) => acc += s; cur = p
        case None         => go = false
      }
      (acc.result(), cur)
    }

    /** alt(Directive, Triples) (lib.rs:94-97). The shared leading `opt(ws)`
      * of every alternative is hoisted — each reference alternative parses
      * the identical opt(Whitespace) first, so this is semantics-preserving
      * and avoids re-lexing the whitespace five times. */
    def statement(pos: Int): R[Statement] = {
      val (w, p) = optWs(pos)
      baseDirective(w, p)
        .orElse(prefixDirective(w, p))
        .orElse(sparqlBaseDirective(w, p))
        .orElse(sparqlPrefixDirective(w, p))
        .map { case (d, np) => (StDirective(d), np) }
        .orElse(triples(w, p).map { case (t, np) => (StTriples(t), np) })
    }

    // ---- directives (lib.rs:711-928) --------------------------------------

    /** ws? "@base" ms1 IRIREF ms1 '.' (lib.rs:754-767) */
    def baseDirective(w: Option[String], pos: Int): R[Directive] =
      for {
        p1 <- if (startsWith(pos, "@base")) Some(pos + 5) else None
        p2 <- Some(multispace1(p1)).filter(_ >= 0)
        (iri, p3) <- iriRef(p2)
        p4 <- Some(multispace1(p3)).filter(_ >= 0)
        p5 <- if (p4 < n && in.charAt(p4) == '.') Some(p4 + 1) else None
      } yield (BaseDirective(w, iri), p5)

    /** ws? "BASE" ms1 IRIREF — no dot (lib.rs:798-809) */
    def sparqlBaseDirective(w: Option[String], pos: Int): R[Directive] =
      for {
        p1 <- if (startsWith(pos, "BASE")) Some(pos + 4) else None
        p2 <- Some(multispace1(p1)).filter(_ >= 0)
        (iri, p3) <- iriRef(p2)
      } yield (SparqlBaseDirective(w, iri), p3)

    /** ws? "@prefix" ms1 (not-':')* ':' ms1 IRIREF ms1 '.'
      * (lib.rs:843-863) — the prefix name is "anything but colon". */
    def prefixDirective(w: Option[String], pos: Int): R[Directive] =
      for {
        p1 <- if (startsWith(pos, "@prefix")) Some(pos + 7) else None
        p2 <- Some(multispace1(p1)).filter(_ >= 0)
        (pfx, p3) <- Some(notColon(p2))
        p4 <- if (p3 < n && in.charAt(p3) == ':') Some(p3 + 1) else None
        p5 <- Some(multispace1(p4)).filter(_ >= 0)
        (iri, p6) <- iriRef(p5)
        p7 <- Some(multispace1(p6)).filter(_ >= 0)
        p8 <- if (p7 < n && in.charAt(p7) == '.') Some(p7 + 1) else None
      } yield (PrefixDirective(w, pfx, iri), p8)

    /** ws? "PREFIX" ms1 (not-':')* ':' ms1 IRIREF (lib.rs:899-915) */
    def sparqlPrefixDirective(w: Option[String], pos: Int): R[Directive] =
      for {
        p1 <- if (startsWith(pos, "PREFIX")) Some(pos + 6) else None
        p2 <- Some(multispace1(p1)).filter(_ >= 0)
        (pfx, p3) <- Some(notColon(p2))
        p4 <- if (p3 < n && in.charAt(p3) == ':') Some(p3 + 1) else None
        p5 <- Some(multispace1(p4)).filter(_ >= 0)
        (iri, p6) <- iriRef(p5)
      } yield (SparqlPrefixDirective(w, pfx, iri), p6)

    /** nom opt(is_not(":")): 1+ chars that aren't ':', or None. */
    private def notColon(pos: Int): (Option[String], Int) = {
      var i = pos
      while (i < n && in.charAt(i) != ':') i += 1
      if (i == pos) (None, pos) else (Some(in.substring(pos, i)), i)
    }

    // ---- triples (lib.rs:179-211) ------------------------------------------

    /** (labeled | blank-subject form) multispace1 '.' — the alt commits:
      * if the labeled form matches but the ' .' tail doesn't, the whole
      * statement fails without retrying the blank form (nom tuple). */
    def triples(w: Option[String], pos: Int): R[Triples] = {
      val head: R[Triples] =
        (for {
          (subj, p1) <- subject(pos)
          (pol, p2) <- predicateObjectList(p1)
        } yield (TriplesLabeled(w, subj, pol): Triples, p2))
          .orElse(for {
            (bnpl, p1) <- blankNodePropertyList(pos)
          } yield {
            val (polOpt, p2) = predicateObjectList(p1) match {
              case Some((pl, pp)) => (Some(pl), pp)
              case None           => (None, p1)
            }
            (TriplesBlank(w, bnpl, polOpt): Triples, p2)
          })
      for {
        (t, p) <- head
        p1 <- Some(multispace1(p)).filter(_ >= 0)
        p2 <- if (p1 < n && in.charAt(p1) == '.') Some(p1 + 1) else None
      } yield (t, p2)
    }

    /** alt(BlankNode, IRI, Collection) — BlankNode first (lib.rs:247-252) */
    def subject(pos: Int): R[Subject] =
      blankNode(pos).map { case (b, p) => (SubjBlankNode(b): Subject, p) }
        .orElse(iri(pos).map { case (i, p) => (SubjIri(i): Subject, p) })
        .orElse(collection(pos).map { case (c, p) =>
          (SubjCollection(c): Subject, p)
        })

    /** alt(IRI, 'a') (lib.rs:279) */
    def verb(pos: Int): R[Verb] =
      iri(pos).map { case (i, p) => (VerbIri(i): Verb, p) }
        .orElse(
          if (pos < n && in.charAt(pos) == 'a') Some((VerbA: Verb, pos + 1))
          else None)

    /** alt(IRIReference, PrefixedName) (lib.rs:307-310) */
    def iri(pos: Int): R[Iri] =
      iriRef(pos).map { case (i, p) => (i: Iri, p) }
        .orElse(prefixedName(pos).map { case (i, p) => (i: Iri, p) })

    /** '<' is_not(">") '>' (lib.rs:956) */
    def iriRef(pos: Int): R[IriRef] = {
      if (pos >= n || in.charAt(pos) != '<') return None
      var i = pos + 1
      while (i < n && in.charAt(i) != '>') i += 1
      if (i >= n || i == pos + 1) None // is_not requires 1+ chars
      else Some((IriRef(in.substring(pos + 1, i)), i + 1))
    }

    /** opt(many1(PN_CHARS)) ':' opt(is_not(" \t\r\n,)]")) (lib.rs:975-988) */
    def prefixedName(pos: Int): R[PrefixedName] = {
      val pEnd = scanCp(pos, isPnChars)
      val prefix = if (pEnd > pos) Some(in.substring(pos, pEnd)) else None
      if (pEnd >= n || in.charAt(pEnd) != ':') return None
      var i = pEnd + 1
      while (i < n && { val c = in.charAt(i)
        c != ' ' && c != '\t' && c != '\r' && c != '\n' &&
          c != ',' && c != ')' && c != ']' }) i += 1
      val name = if (i > pEnd + 1) Some(in.substring(pEnd + 1, i)) else None
      Some((PrefixedName(prefix, name), i))
    }

    /** alt(BlankNodeLabel, BlankNodeAnonymous) (lib.rs:337-340) */
    def blankNode(pos: Int): R[BlankNode] =
      blankNodeLabel(pos).orElse(blankNodeAnon(pos))

    /** "_:" many1(PN_CHARS_U|digit) many0(PN_CHARS|'.') (lib.rs:367-385).
      * The reference's third scan many0(PN_CHARS) always matches empty
      * because PN_CHARS is a subset of the middle class. */
    def blankNodeLabel(pos: Int): R[BlankNode] = {
      if (!startsWith(pos, "_:")) return None
      val s = pos + 2
      val firstEnd = scanCp(s, cp => isPnCharsU(cp) || (cp >= '0' && cp <= '9'))
      if (firstEnd == s) return None
      val midEnd = scanCp(firstEnd, cp => isPnChars(cp) || cp == '.')
      Some((BlankNodeLabel(in.substring(s, midEnd)), midEnd))
    }

    /** '[' ws? ']' (lib.rs:422-427) */
    def blankNodeAnon(pos: Int): R[BlankNode] = {
      if (pos >= n || in.charAt(pos) != '[') return None
      val (w, p) = optWs(pos + 1)
      if (p < n && in.charAt(p) == ']') Some((BlankNodeAnon(w), p + 1))
      else None
    }

    /** many1( ws? Verb ObjectList (ws? ';')? ) (lib.rs:455-473). The ';'
      * presence collapses into its leading-ws Option, exactly like the
      * reference's `.map(|(ws, _)| ws).flatten()`. */
    def predicateObjectList(pos: Int): R[PredicateObjectList] = {
      val items = Vector.newBuilder[PolItem]
      var cur = pos
      var count = 0
      var go = true
      while (go) {
        val (w, p1) = optWs(cur)
        verb(p1) match {
          case None => go = false
          case Some((v, p2)) =>
            objectList(p2) match {
              case None => go = false
              case Some((ol, p3)) =>
                // opt( (ws?, ';') )
                val (sw, p4) = optWs(p3)
                if (p4 < n && in.charAt(p4) == ';') {
                  items += PolItem(w, v, ol, sw)
                  cur = p4 + 1
                } else {
                  items += PolItem(w, v, ol, None)
                  cur = p3
                }
                count += 1
            }
        }
      }
      if (count == 0) None else Some((PredicateObjectList(items.result()), cur))
    }

    /** many1(alt( ws? Object , ws? ',' ws? Object )) (lib.rs:562-590) —
      * the no-comma form is tried first on every iteration. */
    def objectList(pos: Int): R[ObjectList] = {
      val items = Vector.newBuilder[ObjectListItem]
      var cur = pos
      var count = 0
      var go = true
      while (go) {
        val (w, p1) = optWs(cur)
        obj(p1) match {
          case Some((o, p2)) =>
            items += ObjectListItem(None, w, o); cur = p2; count += 1
          case None =>
            if (p1 < n && in.charAt(p1) == ',') {
              val (wa, p2) = optWs(p1 + 1)
              obj(p2) match {
                case Some((o, p3)) =>
                  items += ObjectListItem(w, wa, o); cur = p3; count += 1
                case None => go = false
              }
            } else go = false
        }
      }
      if (count == 0) None else Some((ObjectList(items.result()), cur))
    }

    /** alt(BlankNode, IRI, Collection, BNPL, Literal) (lib.rs:624-631).
      * Depth-guarded: beyond MAX_DEPTH the object fails to parse, which
      * surfaces as NotFullyParsed for the document. */
    def obj(pos: Int): R[Obj] = {
      if (depth >= MAX_DEPTH) return None
      depth += 1
      val r =
        blankNode(pos).map { case (b, p) => (ObjBlankNode(b): Obj, p) }
          .orElse(iri(pos).map { case (i, p) => (ObjIri(i): Obj, p) })
          .orElse(collection(pos).map { case (c, p) => (ObjCollection(c): Obj, p) })
          .orElse(blankNodePropertyList(pos).map { case (b, p) =>
            (ObjBnpl(b): Obj, p)
          })
          .orElse(literal(pos).map { case (l, p) => (ObjLiteral(l): Obj, p) })
      depth -= 1
      r
    }

    /** '(' (ws? Object ws?)* ')' (lib.rs:661-677) */
    def collection(pos: Int): R[Collection] = {
      if (pos >= n || in.charAt(pos) != '(') return None
      val items = Vector.newBuilder[CollectionItem]
      var cur = pos + 1
      var go = true
      while (go) {
        val (w1, p1) = optWs(cur)
        obj(p1) match {
          case Some((o, p2)) =>
            val (w2, p3) = optWs(p2)
            items += CollectionItem(w1, o, w2)
            cur = p3
          case None => go = false
        }
      }
      if (cur < n && in.charAt(cur) == ')')
        Some((Collection(items.result()), cur + 1))
      else None
    }

    /** '[' PredicateObjectList ws? ']' (lib.rs:523-533) */
    def blankNodePropertyList(pos: Int): R[BlankNodePropertyList] = {
      if (pos >= n || in.charAt(pos) != '[') return None
      for {
        (pol, p1) <- predicateObjectList(pos + 1)
        (w, p2) = optWs(p1)
        p3 <- if (p2 < n && in.charAt(p2) == ']') Some(p2 + 1) else None
      } yield (BlankNodePropertyList(pol, w), p3)
    }

    // ---- literals (lib.rs:1036-1683) ---------------------------------------

    /** alt(RDFLiteral, Boolean, Numeric) (lib.rs:1048-1052) */
    def literal(pos: Int): R[Literal] =
      rdfLiteral(pos).map { case (l, p) => (LitRdf(l): Literal, p) }
        .orElse(booleanLiteral(pos))
        .orElse(numericLiteral(pos).map { case (l, p) =>
          (LitNumeric(l): Literal, p)
        })

    /** TurtleString ( '@'langtag | '^^'IRI )? (lib.rs:1076-1107) */
    def rdfLiteral(pos: Int): R[RdfLiteralNode] =
      turtleString(pos).map { case (s, p1) =>
        languageTag(p1) match {
          case Some((tag, p2)) => (RdfLiteralNode(s, Some(tag), None), p2)
          case None =>
            if (startsWith(p1, "^^")) iri(p1 + 2) match {
              case Some((i, p2)) => (RdfLiteralNode(s, None, Some(i)), p2)
              case None          => (RdfLiteralNode(s, None, None), p1)
            }
            else (RdfLiteralNode(s, None, None), p1)
        }
      }

    /** '@' alpha1 ('-' alphanum1)* (lib.rs:1110-1122); parts joined by '-'. */
    def languageTag(pos: Int): R[String] = {
      if (pos >= n || in.charAt(pos) != '@') return None
      var i = pos + 1
      val start = i
      while (i < n && Character.isLetter(in.charAt(i)) &&
        in.charAt(i) < 128) i += 1
      if (i == start) return None
      var cur = i
      var go = true
      while (go) {
        if (cur < n && in.charAt(cur) == '-') {
          var j = cur + 1
          val s2 = j
          while (j < n && in.charAt(j) < 128 &&
            Character.isLetterOrDigit(in.charAt(j))) j += 1
          if (j == s2) go = false else cur = j
        } else go = false
      }
      Some((in.substring(start, cur), cur))
    }

    /** Long quote styles first (lib.rs:1516-1527). */
    def turtleString(pos: Int): R[TurtleString] =
      stringInner(pos, "\"\"\"").map { case (s, p) =>
        (StringLongQuote(s): TurtleString, p)
      }.orElse(stringInner(pos, "'''").map { case (s, p) =>
        (StringLongSingleQuote(s): TurtleString, p)
      }).orElse(stringInner(pos, "\"").map { case (s, p) =>
        (StringQuote(s): TurtleString, p)
      }).orElse(stringInner(pos, "'").map { case (s, p) =>
        (StringSingleQuote(s): TurtleString, p)
      })

    /** Generic quote scanner (lib.rs:1420-1462): first closing quote with an
      * even number of immediately-preceding backslashes; unterminated → fail. */
    private def stringInner(pos: Int, q: String): R[String] = {
      if (!startsWith(pos, q)) return None
      val ql = q.length
      val hay = pos + ql
      if (startsWith(hay, q)) return Some(("", hay + ql)) // empty fast-path
      var from = hay
      while (true) {
        val i = in.indexOf(q, from)
        if (i < 0) return None // nom Incomplete
        var p = i
        while (p > hay && in.charAt(p - 1) == '\\') p -= 1
        if ((i - p) % 2 == 0) return Some((in.substring(hay, i), i + ql))
        from = i + 1
      }
      None // unreachable
    }

    def booleanLiteral(pos: Int): R[Literal] =
      if (startsWith(pos, "true")) Some((LitBoolean(true), pos + 4))
      else if (startsWith(pos, "false")) Some((LitBoolean(false), pos + 5))
      else None

    /** alt(Double, Decimal, Integer) (lib.rs:1154-1158) */
    def numericLiteral(pos: Int): R[NumericLiteral] =
      doubleLit(pos).orElse(decimalLit(pos)).orElse(integerLit(pos))

    @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

    private def optSign(pos: Int): (Option[String], Int) =
      if (pos < n && (in.charAt(pos) == '+' || in.charAt(pos) == '-'))
        (Some(in.substring(pos, pos + 1)), pos + 1)
      else (None, pos)

    /** 0+ digits; returns (digitsOrNone, nextPos). */
    private def optDigits(pos: Int): (Option[String], Int) = {
      var i = pos
      while (i < n && isDigit(in.charAt(i))) i += 1
      if (i == pos) (None, pos) else (Some(in.substring(pos, i)), i)
    }

    /** [eE] sign? digit+ (lib.rs:1345-1368) */
    private def exponent(pos: Int): R[(String, Option[String], String)] = {
      if (pos >= n || (in.charAt(pos) != 'e' && in.charAt(pos) != 'E'))
        return None
      val ec = in.substring(pos, pos + 1)
      val (sg, p1) = optSign(pos + 1)
      val (dg, p2) = optDigits(p1)
      dg.map(d => ((ec, sg, d), p2))
    }

    /** Three alternatives in reference order (lib.rs:1279-1342):
      * d+.d*exp | .d+exp | d*exp */
    def doubleLit(pos: Int): R[NumericLiteral] = {
      val (sg, p0) = optSign(pos)
      // alt 1: digit+ '.' digit* exp
      val a1: R[NumericLiteral] = {
        val (ints, p1) = optDigits(p0)
        ints match {
          case Some(iv) if p1 < n && in.charAt(p1) == '.' =>
            val (fr, p2) = optDigits(p1 + 1)
            exponent(p2).map { case ((ec, es, ei), p3) =>
              (DoubleLit(sg, Some(iv), Some("."), fr, ec, es, ei): NumericLiteral, p3)
            }
          case _ => None
        }
      }
      // alt 2: '.' digit+ exp
      def a2: R[NumericLiteral] =
        if (p0 < n && in.charAt(p0) == '.') {
          val (fr, p1) = optDigits(p0 + 1)
          fr.flatMap { fv =>
            exponent(p1).map { case ((ec, es, ei), p2) =>
              (DoubleLit(sg, None, Some("."), Some(fv), ec, es, ei): NumericLiteral, p2)
            }
          }
        } else None
      // alt 3: digit* exp
      def a3: R[NumericLiteral] = {
        val (ints, p1) = optDigits(p0)
        exponent(p1).map { case ((ec, es, ei), p2) =>
          (DoubleLit(sg, ints, None, None, ec, es, ei): NumericLiteral, p2)
        }
      }
      a1.orElse(a2).orElse(a3)
    }

    /** sign? digit* '.' digit+ (lib.rs:1229-1241) */
    def decimalLit(pos: Int): R[NumericLiteral] = {
      val (sg, p0) = optSign(pos)
      val (ints, p1) = optDigits(p0)
      if (p1 < n && in.charAt(p1) == '.') {
        val (fr, p2) = optDigits(p1 + 1)
        fr.map(fv => (DecimalLit(sg, ints, fv): NumericLiteral, p2))
      } else None
    }

    /** sign? digit+ (lib.rs:1181-1190) */
    def integerLit(pos: Int): R[NumericLiteral] = {
      val (sg, p0) = optSign(pos)
      val (dg, p1) = optDigits(p0)
      dg.map(d => (IntegerLit(sg, d): NumericLiteral, p1))
    }
  }
}
