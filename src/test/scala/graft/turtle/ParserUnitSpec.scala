package graft.turtle

import org.scalatest.funsuite.AnyFunSuite
import Ast._

/** Per-production parser/serializer units, mirroring the reference's inline
  * test module (reference src/lib.rs:1694-2919) and covering each operator
  * line of SURVEY.md §2.1 (P1-P31) / §2.2 (S1-S8). */
class ParserUnitSpec extends AnyFunSuite {

  private def parseDoc(s: String): TurtleDoc =
    TurtleParser.parseFull(s).fold(e => fail(s"parse failed: $e"), identity)
  private def rt(s: String): Unit =
    assert(TurtleSerializer.render(parseDoc(s)) == s)

  // P1/P2: document = statements + trailing ws; directive tried before triples
  test("P1 document: empty, ws-only, statements") {
    assert(parseDoc("") == TurtleDoc(Vector.empty, None))
    assert(parseDoc("  \n") == TurtleDoc(Vector.empty, Some("  \n")))
    assert(parseDoc("@base <http://x/> .").statements.size == 1)
  }
  test("P1 parse_full rejects trailing garbage (NotFullyParsed)") {
    // the trailing whitespace is consumed by opt(Whitespace) before the
    // remainder check (reference lib.rs:41-44,52)
    assert(TurtleParser.parseFull("@base <http://x/> . garbage") ==
      Left(TurtleParser.NotFullyParsed("garbage")))
  }

  // P3: whitespace incl. comments merged
  test("P3 whitespace merges runs and comments") {
    val doc = parseDoc("  # a comment\n\t:s :p :o .")
    val StTriples(TriplesLabeled(lead, _, _)) = doc.statements.head
    assert(lead == Some("  # a comment\n\t"))
  }

  // P4: triples require >=1 plain ws before '.', which is discarded
  test("P4 statement dot needs preceding whitespace") {
    assert(TurtleParser.parseFull(":s :p :o.").isLeft) // PN_LOCAL eats the dot
    assert(TurtleParser.parseFull("<http://s> <http://p> <http://o>.").isLeft)
    assert(TurtleParser.parseFull("<http://s> <http://p> <http://o> .").isRight)
  }

  // P5: subject ordering — blank node before IRI
  test("P5 subject alternatives") {
    def subjOf(s: String) = {
      val StTriples(TriplesLabeled(_, subj, _)) = parseDoc(s).statements.head
      subj
    }
    assert(subjOf("_:b :p :o .").isInstanceOf[SubjBlankNode])
    assert(subjOf(":s :p :o .").isInstanceOf[SubjIri])
    assert(subjOf("<http://s> :p :o .").isInstanceOf[SubjIri])
  }

  // P6: 'a' only wins when IRI fails
  test("P6 verb: a vs IRI") {
    def verbOf(s: String) = {
      val StTriples(TriplesLabeled(_, _, pol)) = parseDoc(s).statements.head
      pol.items.head.verb
    }
    assert(verbOf(":s a :o .") == VerbA)
    assert(verbOf(":s a:x :o .") == VerbIri(PrefixedName(Some("a"), Some("x"))))
  }

  // P8: IRIREF permissiveness; <> does not parse
  test("P8 IRI reference") {
    rt("<http://ex/with space and stuff> <http://p> <http://o> .")
    assert(TurtleParser.parseFull("<> <http://p> <http://o> .").isLeft)
  }

  // P9: PN_LOCAL greed — eats ';' '.' '#' until ws/,/)/]
  test("P9 prefixed-name local part greed") {
    val StTriples(TriplesLabeled(_, SubjIri(PrefixedName(p, n)), _)) =
      parseDoc(":a.b;c :p :o .").statements.head
    assert(p.isEmpty && n == Some("a.b;c"))
  }

  // P10: PN char classes incl. supplementary planes
  test("P10 PN chars above the BMP") {
    rt("p:\uD83D\uDE00 q:r \"x\" .") // U+1F600 inside local name (> BMP)
  }

  // P11/P12: blank node label — trailing '.' swallowed by middle class
  test("P12 blank node labels") {
    val StTriples(TriplesLabeled(_, SubjBlankNode(BlankNodeLabel(l)), _)) =
      parseDoc("_:a.b :p :o .").statements.head
    assert(l == "a.b")
    rt("_:0digit :p :o .") // digit first char allowed
  }

  // P13: anonymous blank node preserves inner ws
  test("P13 anonymous blank node") {
    rt(":s :p [ ] .")
    rt(":s :p [] .")
  }

  // P14: ';' sharing + ws-before-';' preservation
  test("P14 predicate-object list") {
    rt(":s :p1 :o1 ; :p2 :o2 .")
    rt(":s :p1 :o1 ;:p2 :o2 .")
  }

  test("P9+P14 quirk: ';' with no preceding space is eaten by PN_LOCAL") {
    // `:o1;:p2` lexes as ONE prefixed name (local "o1;:p2") — the reference
    // behaves identically (is_not stops only at ws , ) ]); such input does
    // not round-trip in either implementation and is absent from the corpus
    val StTriples(TriplesLabeled(_, _, pol)) =
      parseDoc(":s :p1 :o1;:p2 :o2 .").statements.head
    assert(pol.items.size == 1)
    val ObjIri(PrefixedName(_, n)) = pol.items.head.objects.items.head.obj
    assert(n == Some("o1;:p2"))
  }

  // P15: ',' sharing with surrounding ws
  test("P15 object list") {
    rt(":s :p :o1 , :o2,:o3 .")
  }

  // P16/P17: recursive objects, collections
  test("P17 collections incl. nesting and empties") {
    rt(":s :p ( :a :b :c ) .")
    rt(":s :p () .")
    rt(":s :p ( 1 ( 2 ) \"x\" ) .")
  }

  // P18: blank node property list
  test("P18 BNPL nested") {
    rt(":s :p [ :q :r ; :q2 [ :deep \"v\" ] ] .")
    rt("[ :p :o ] .")
    rt("[ :p :o ] :p2 :o2 .")
  }

  // P19-P23: directives
  test("P20-P23 directives, all four forms") {
    rt("@base <http://x/> .")
    rt("BASE <http://x/>")
    rt("@prefix p: <http://x/> .")
    rt("@prefix : <http://x/> .")
    rt("PREFIX p: <http://x/>")
    // SPARQL forms take no dot; a following '.' fails the document
    assert(TurtleParser.parseFull("BASE <http://x/> .").isLeft)
  }

  // P24/P25: literal alternative ordering; langtags; datatypes
  test("P25 RDF literals: langtag and datatype") {
    rt(""":s :p "v"@en .""")
    rt(""":s :p "v"@fr-be-x .""")
    rt(""":s :p "v"^^xsd:int .""")
    rt(""":s :p "v"^^<http://dt> .""")
  }

  // P26/P27: quote styles, long-before-short ordering, escape-aware scan
  test("P26-P27 string styles and escapes") {
    rt(""":s :p "a\"b" .""")
    rt(""":s :p "" .""")
    rt(""":s :p '' .""")
    rt(":s :p \"\"\"multi\nline\"\"\" .")
    rt(":s :p '''x''' .")
    rt(""":s :p "ends with backslash pair\\" .""")
    rt(":s :p \"\"\"inner \" quote\"\"\" .")
  }

  // P28-P30: numeric spellings preserved exactly; double-first ordering
  test("P28-P30 numeric literals keep exact spelling") {
    for (n <- Seq("0", "-7", "+42", "3.14", "-.5", "+0.0", "1.663E-4",
        "2e10", "-1.E+3", ".5e1", "5E0"))
      rt(s":s :p $n .")
  }
  test("P30 double parsed before decimal before integer") {
    val StTriples(TriplesLabeled(_, _, pol)) =
      parseDoc(":s :p 1.5e2 .").statements.head
    val ObjLiteral(LitNumeric(d)) = pol.items.head.objects.items.head.obj
    assert(d.isInstanceOf[DoubleLit])
  }

  // P31: booleans (prefix match, reference behavior)
  test("P31 boolean literals") {
    rt(":s :p true .")
    rt(":s :p false .")
  }

  // S3: directive rendering normalizes inner whitespace to single spaces
  test("S3 directive whitespace normalization") {
    val doc = parseDoc("@base   <http://x/>   .")
    assert(TurtleSerializer.render(doc) == "@base <http://x/> .")
  }

  // S2: triples always render ' .' regardless of parsed pre-dot ws
  test("S2 statement dot normalization") {
    assert(TurtleSerializer.render(parseDoc(":s :p :o\n.")) == ":s :p :o .")
  }

  // unescape (scalar utility, §2.4)
  test("unescape handles ECHAR and UCHAR incl. surrogates") {
    assert(Unescape("""a\tb\nc""") == Right("a\tb\nc"))
    assert(Unescape("""\u0041\U0001F600""") == Right("A\uD83D\uDE00"))
    assert(Unescape("""bad\q""") == Left("Invalid escape sequence"))
    assert(Unescape("\\" + "uD800").isLeft) // lone surrogate rejected
  }
}
