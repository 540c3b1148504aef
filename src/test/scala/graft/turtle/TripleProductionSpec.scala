package graft.turtle

import org.scalatest.funsuite.AnyFunSuite
import TripleProducer._

/** Mirrors /root/reference/tests/triple_production_examples.rs (success /
  * refusal matrix) and adds golden-triple assertions the reference lacks
  * (it only smoke-tests). Goldens are hand-derived from the W3C Turtle spec
  * text, with the reference's documented deviations kept:
  *  - prefix IRIs are NOT resolved against @base (triple_production.rs:317-327)
  *  - language-tagged literals get datatype xsd:string, not rdf:langString
  *    (triple_production.rs:118-123).
  */
class TripleProductionSpec extends AnyFunSuite {

  private def produceFile(sub: String, name: String): Either[String, Vector[RdfTriple]] = {
    val input = Fixtures.read(Fixtures.root.resolve(sub).resolve(name))
    val doc = TurtleParser.parseFull(input)
      .fold(e => fail(s"parse failed for $name: $e"), identity)
    TripleProducer.produce(doc)
  }

  private def fmt(t: Term): String = t match {
    case TIri(i)       => s"<$i>"
    case TBnode(id)    => s"_:b$id"
    case TLit(l, d, g) =>
      s""""$l"""" + g.map("@" + _).getOrElse("") + d.map("^^<" + _ + ">").getOrElse("")
  }
  private def fmt(ts: Vector[RdfTriple]): Vector[String] =
    ts.map(t => s"${fmt(t.subj)} ${fmt(t.pred: String, isPred = true)} ${fmt(t.obj)}")
  private def fmt(p: String, isPred: Boolean): String = s"<$p>"

  // --- success matrix (reference: triple_production_examples.rs) -----------
  private val okReference = (1 to 26)
    .filterNot(Set(16, 23, 24, 25, 26)) // #[ignore]d in the reference
    .map(i => s"example$i.ttl")
  for (f <- okReference)
    test(s"reference_examples/$f produces triples") {
      val r = produceFile("reference_examples", f)
      assert(r.isRight, r.left.getOrElse(""))
    }

  private val okWildtype = Seq(
    "example1_without_a.ttl", "nested_lists.ttl", "nested_lists2.ttl",
    "example24_simple1.ttl", "example24_simple2.ttl",
    "example12_only_decimal.ttl", "example12_only_double.ttl",
    "example12_only_integer.ttl",
    // real ontologies — bulk stress (ours; the reference only round-trips
    // these). bibo.ttl is excluded: it contains a PrefixedName with an empty
    // local part, which the reference producer rejects too
    // (triple_production.rs:321-323).
    "foaf_mirror.ttl", "owl.ttl", "dublin_core_elements.ttl",
    "rdf.ttl", "rdfs.ttl",
    "leading_whitespace_base.ttl", "leading_whitespace_prefix.ttl")
  for (f <- okWildtype)
    test(s"wildtype_examples/$f produces triples") {
      val r = produceFile("wildtype_examples", f)
      assert(r.isRight, r.left.getOrElse(""))
    }

  // --- refusal matrix (kept for P/R alignment; SURVEY.md §2.3 T10) ---------
  test("example16 (BNPL as subject) is refused") {
    assert(produceFile("reference_examples", "example16.ttl").isLeft)
  }
  test("example23 (collection as subject) is refused") {
    assert(produceFile("reference_examples", "example23.ttl").isLeft)
  }
  test("example25 (nested collection as subject) is refused") {
    assert(produceFile("reference_examples", "example25.ttl").isLeft)
  }
  test("example24 (undeclared `:` prefix) is refused") {
    assert(produceFile("reference_examples", "example24.ttl").isLeft)
  }
  test("example26 (undeclared `:` prefix) is refused") {
    assert(produceFile("reference_examples", "example26.ttl").isLeft)
  }
  test("bibo.ttl (empty PrefixedName local part) is refused, like the reference") {
    assert(produceFile("wildtype_examples", "bibo.ttl") ==
      Left("Empty local_name part of PrefixedName"))
  }

  // --- golden triples -------------------------------------------------------

  test("example2: single absolute-IRI triple") {
    val Right(ts) = produceFile("reference_examples", "example2.ttl")
    assert(fmt(ts) == Vector(
      "<http://example.org/#spiderman> <http://www.perceive.net/schemas/relationship/enemyOf> <http://example.org/#green-goblin>"))
  }

  test("example1: base resolution, `a`, object lists, ru langtag") {
    val Right(ts) = produceFile("reference_examples", "example1.ttl")
    assert(fmt(ts) == Vector(
      "<http://example.org/#green-goblin> <http://www.perceive.net/schemas/relationship/enemyOf> <http://example.org/#spiderman>",
      s"<http://example.org/#green-goblin> <$RDF_TYPE> <http://xmlns.com/foaf/0.1/Person>",
      s"""<http://example.org/#green-goblin> <http://xmlns.com/foaf/0.1/name> "Green Goblin"^^<$XSD_STRING>""",
      "<http://example.org/#spiderman> <http://www.perceive.net/schemas/relationship/enemyOf> <http://example.org/#green-goblin>",
      s"<http://example.org/#spiderman> <$RDF_TYPE> <http://xmlns.com/foaf/0.1/Person>",
      s"""<http://example.org/#spiderman> <http://xmlns.com/foaf/0.1/name> "Spiderman"^^<$XSD_STRING>""",
      s"""<http://example.org/#spiderman> <http://xmlns.com/foaf/0.1/name> "Человек-паук"@ru^^<$XSD_STRING>"""))
  }

  test("example12: numeric literals keep exact spellings") {
    val Right(ts) = produceFile("reference_examples", "example12.ttl")
    assert(fmt(ts) == Vector(
      s"""<http://en.wikipedia.org/wiki/Helium> <http://example.org/elementsatomicNumber> "2"^^<$XSD_INTEGER>""",
      s"""<http://en.wikipedia.org/wiki/Helium> <http://example.org/elementsatomicMass> "4.002602"^^<$XSD_DECIMAL>""",
      s"""<http://en.wikipedia.org/wiki/Helium> <http://example.org/elementsspecificGravity> "1.663E-4"^^<$XSD_DOUBLE>"""))
  }

  test("example18: collections expand to rdf:first/rest cons cells") {
    val Right(ts) = produceFile("reference_examples", "example18.ttl")
    val p = "http://example.org/foo"
    assert(fmt(ts) == Vector(
      s"_:b0 <$RDF_FIRST> <${p}a>",
      s"_:b0 <$RDF_REST> _:b1",
      s"_:b1 <$RDF_FIRST> <${p}b>",
      s"_:b1 <$RDF_REST> _:b2",
      s"_:b2 <$RDF_FIRST> <${p}c>",
      s"_:b2 <$RDF_REST> <$RDF_NIL>",
      s"<${p}subject> <${p}predicate> _:b0",
      s"<${p}subject> <${p}predicate2> <$RDF_NIL>"))
  }

  test("example22: escaped and literal newlines unescape to the same value") {
    val Right(ts) = produceFile("reference_examples", "example22.ttl")
    val lexes = ts.collect { case RdfTriple(_, _, TLit(l, _, _)) => l }
    assert(lexes.size == 2)
    assert(lexes(0) == lexes(1))
    assert(lexes(0) == "The first line\nThe second line\n  more")
  }

  test("example9: directive redefinition + prefix-IRI non-resolution deviation") {
    val Right(ts) = produceFile("reference_examples", "example9.ttl")
    val f = fmt(ts)
    assert(f.contains("<http://one.example/subject2> <http://one.example/predicate2> <http://one.example/object2>"))
    assert(f.contains("<http://two.example/subject3> <http://two.example/predicate3> <http://two.example/object3>"))
    // the deviation: p: -> <path/> is NOT resolved against @base
    assert(f.contains("<path/subject4> <path/predicate4> <path/object4>"))
    assert(f.contains("<http://another.example/subject5> <http://another.example/predicate5> <http://another.example/object5>"))
    assert(f.contains(s"<http://another.example/subject6> <$RDF_TYPE> <http://another.example/subject7>"))
  }

  test("example13: boolean literal") {
    val Right(ts) = produceFile("reference_examples", "example13.ttl")
    assert(ts.exists {
      case RdfTriple(_, _, TLit("false", Some(XSD_BOOLEAN), None)) => true
      case _ => false
    })
  }

  test("example14: labeled blank nodes are memoized per label") {
    val Right(ts) = produceFile("reference_examples", "example14.ttl")
    val bnodes = ts.flatMap(t => Seq(t.subj, t.obj)).collect { case b: TBnode => b.id }.distinct
    assert(bnodes.size == 2) // _:alice and _:bob
  }

  test("labeled bnode ids are deterministic across runs") {
    val a = produceFile("reference_examples", "example14.ttl")
    val b = produceFile("reference_examples", "example14.ttl")
    assert(a == b)
  }
}
