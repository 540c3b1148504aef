package graft.turtle

/** Lossless Turtle AST.
  *
  * One case class per grammar production of the reference's syntax layer
  * (reference: /root/reference/src/lib.rs — node inventory at lib.rs:26-1698).
  * Every node keeps enough surface detail (whitespace runs incl. comments,
  * quote styles, exact numeric spellings) that [[TurtleSerializer.render]]
  * reproduces the input byte-for-byte.
  *
  * Whitespace is represented as a plain `String` (merged runs of WS chars and
  * `#` comments, cf. lib.rs:109-153); `Option[String]` where the grammar slot
  * is optional.
  */
object Ast {

  /** Root node. lib.rs:26-29 */
  final case class TurtleDoc(
      statements: Vector[Statement],
      trailingWs: Option[String])

  sealed trait Statement extends Product with Serializable
  /** lib.rs:83-87 */
  final case class StDirective(directive: Directive) extends Statement
  final case class StTriples(triples: Triples) extends Statement

  /** lib.rs:169-177. `Labeled` = subject + predicate-object list;
    * `Blank` = blankNodePropertyList used as the subject. */
  sealed trait Triples extends Product with Serializable
  final case class TriplesLabeled(
      leadingWs: Option[String],
      subject: Subject,
      pol: PredicateObjectList) extends Triples
  final case class TriplesBlank(
      leadingWs: Option[String],
      bnpl: BlankNodePropertyList,
      pol: Option[PredicateObjectList]) extends Triples

  /** lib.rs:235-240 */
  sealed trait Subject extends Product with Serializable
  final case class SubjIri(iri: Iri) extends Subject
  final case class SubjBlankNode(bnode: BlankNode) extends Subject
  final case class SubjCollection(coll: Collection) extends Subject

  /** lib.rs:264-272 — `a` is sugar for rdf:type. */
  sealed trait Verb extends Product with Serializable
  case object VerbA extends Verb
  final case class VerbIri(iri: Iri) extends Verb

  /** lib.rs:296-300 */
  sealed trait Iri extends Product with Serializable
  /** `<...>` raw inner text, no unescaping (lib.rs:935-957). */
  final case class IriRef(iri: String) extends Iri
  /** `prefix? ':' local?` (lib.rs:964-968). */
  final case class PrefixedName(prefix: Option[String], name: Option[String])
      extends Iri

  /** lib.rs:326-330 */
  sealed trait BlankNode extends Product with Serializable
  /** `_:label` (lib.rs:354-360) */
  final case class BlankNodeLabel(label: String) extends BlankNode
  /** `[ ws? ]` (lib.rs:412-415) */
  final case class BlankNodeAnon(ws: Option[String]) extends BlankNode

  /** One `verb objectList` group. `preSemiWs` carries the whitespace before a
    * trailing `;` — collapsed exactly like the reference (lib.rs:439-474):
    * a `;` with no preceding whitespace is indistinguishable from no `;`;
    * the serializer re-emits `;` only *between* items (lib.rs:476-491). */
  final case class PolItem(
      leadingWs: Option[String],
      verb: Verb,
      objects: ObjectList,
      preSemiWs: Option[String])

  /** lib.rs:439-448 */
  final case class PredicateObjectList(items: Vector[PolItem])

  /** `(wsBeforeComma, wsAfterComma, object)`; both ws slots None-able, first
    * item has wsBefore = None by construction (lib.rs:546-591). */
  final case class ObjectListItem(
      wsBefore: Option[String],
      wsAfter: Option[String],
      obj: Obj)
  final case class ObjectList(items: Vector[ObjectListItem])

  /** lib.rs:610-617 (recursive) */
  sealed trait Obj extends Product with Serializable
  final case class ObjIri(iri: Iri) extends Obj
  final case class ObjBlankNode(bnode: BlankNode) extends Obj
  final case class ObjCollection(coll: Collection) extends Obj
  final case class ObjBnpl(bnpl: BlankNodePropertyList) extends Obj
  final case class ObjLiteral(literal: Literal) extends Obj

  /** `( (ws? obj ws?)* )` (lib.rs:645-654) */
  final case class CollectionItem(
      wsBefore: Option[String],
      obj: Obj,
      wsAfter: Option[String])
  final case class Collection(items: Vector[CollectionItem])

  /** `[ pol ws? ]` (lib.rs:512-516) */
  final case class BlankNodePropertyList(
      pol: PredicateObjectList,
      trailingWs: Option[String])

  /** lib.rs:700-709 */
  sealed trait Directive extends Product with Serializable
  /** `@base <iri> .` (lib.rs:737-741) */
  final case class BaseDirective(leadingWs: Option[String], iri: IriRef)
      extends Directive
  /** `BASE <iri>` — no dot (lib.rs:781-785) */
  final case class SparqlBaseDirective(leadingWs: Option[String], iri: IriRef)
      extends Directive
  /** `@prefix p: <iri> .` (lib.rs:824-829) */
  final case class PrefixDirective(
      leadingWs: Option[String],
      prefix: Option[String],
      iri: IriRef) extends Directive
  /** `PREFIX p: <iri>` — no dot (lib.rs:880-885) */
  final case class SparqlPrefixDirective(
      leadingWs: Option[String],
      prefix: Option[String],
      iri: IriRef) extends Directive

  /** AST construction/editing aids mirroring the reference's helper surface
    * (its declared goal #2 is easy AST navigation/editing). Whitespace is a
    * plain `String` in this AST, so the canonical single-space constructor
    * (ref lib.rs:115-119 `Whitespace::space()`) is a constant. */
  object Whitespace {
    val space: String = " "
  }

  /** `IRI → Verb` conversion (ref lib.rs:290-294 `impl From<IRI> for Verb`). */
  object Verb {
    def from(iri: Iri): Verb = VerbIri(iri)
  }

  /** lib.rs:1036-1041 */
  sealed trait Literal extends Product with Serializable
  final case class LitRdf(rdf: RdfLiteralNode) extends Literal
  final case class LitNumeric(num: NumericLiteral) extends Literal
  final case class LitBoolean(value: Boolean) extends Literal

  /** string + optional `@langtag` XOR `^^datatype` (lib.rs:1064-1069) */
  final case class RdfLiteralNode(
      string: TurtleString,
      languageTag: Option[String],
      datatypeIri: Option[Iri])

  /** Four quote styles; `raw` is the *escaped* inner text exactly as written
    * (lib.rs:1503-1509, 1564-1683). */
  sealed trait TurtleString extends Product with Serializable {
    def raw: String
    /** Unescaped semantic value (lib.rs:1543-1550). */
    def lexicalForm: Either[String, String] = Unescape(raw)
  }
  final case class StringQuote(raw: String) extends TurtleString
  final case class StringSingleQuote(raw: String) extends TurtleString
  final case class StringLongQuote(raw: String) extends TurtleString
  final case class StringLongSingleQuote(raw: String) extends TurtleString

  /** lib.rs:1142-1147 — spellings kept verbatim, never parsed to numbers. */
  sealed trait NumericLiteral extends Product with Serializable {
    def lexicalForm: String
  }
  /** `sign? digits` (lib.rs:1170-1174) */
  final case class IntegerLit(sign: Option[String], digits: String)
      extends NumericLiteral {
    def lexicalForm: String = sign.getOrElse("") + digits
  }
  /** `sign? digits? '.' digits` (lib.rs:1217-1222) */
  final case class DecimalLit(
      sign: Option[String],
      integer: Option[String],
      fractional: String) extends NumericLiteral {
    def lexicalForm: String =
      sign.getOrElse("") + integer.getOrElse("") + "." + fractional
  }
  /** Every component kept as written (lib.rs:1263-1272). */
  final case class DoubleLit(
      sign: Option[String],
      integer: Option[String],
      fractionalDot: Option[String],
      fractional: Option[String],
      exponentChar: String,
      exponentSign: Option[String],
      exponentInteger: String) extends NumericLiteral {
    def lexicalForm: String =
      sign.getOrElse("") + integer.getOrElse("") +
        fractionalDot.getOrElse("") + fractional.getOrElse("") +
        exponentChar + exponentSign.getOrElse("") + exponentInteger
  }

  /** Turtle ECHAR + UCHAR unescaping (lib.rs:1464-1501). Surrogate-pair safe:
    * `\UXXXXXXXX` above the BMP expands via Character.toChars. */
  object Unescape {
    def apply(s: String): Either[String, String] = {
      if (s.indexOf('\\') < 0) return Right(s)
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) return Left("Invalid escape sequence")
          s.charAt(i + 1) match {
            case 'u' =>
              hex(s, i + 2, 4) match {
                case -1 => return Left("Unclosed escape sequence")
                case cp => sb.appendCodePoint(cp); i += 6
              }
            case 'U' =>
              hex(s, i + 2, 8) match {
                case -1 => return Left("Unclosed escape sequence")
                case cp => sb.appendCodePoint(cp); i += 10
              }
            case 't'  => sb.append('\t'); i += 2
            case 'b'  => sb.append('\b'); i += 2
            case 'n'  => sb.append('\n'); i += 2
            case 'r'  => sb.append('\r'); i += 2
            case 'f'  => sb.append('\f'); i += 2
            case '\'' => sb.append('\''); i += 2
            case '"'  => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case _    => return Left("Invalid escape sequence")
          }
        } else { sb.append(c); i += 1 }
      }
      Right(sb.toString)
    }

    /** Parse exactly `n` hex digits at `from`; -1 if short, non-hex, or not a
      * valid Unicode scalar (mirrors char::from_u32: rejects surrogates and
      * > 0x10FFFF — lib.rs:1493-1501). */
    private def hex(s: String, from: Int, n: Int): Int = {
      if (from + n > s.length) return -1
      var v = 0
      var i = 0
      while (i < n) {
        val d = Character.digit(s.charAt(from + i), 16)
        if (d < 0) return -1
        v = (v << 4) + d
        i += 1
      }
      if (v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) -1 else v
    }
  }
}
