package graft.turtle

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY.md §5 point 3): render(parse(x)) == x for generated
  * documents built from the grammar the parser accepts. */
class RoundTripPropertySpec extends AnyFunSuite {

  private def check(gen: Gen[String], n: Int)(f: String => Boolean): Unit = {
    val prop = Prop.forAll(gen)(f)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val ws: Gen[String] = Gen.oneOf(" ", "\n", "  ", "\t\n", " # c\n ")
  private val pname: Gen[String] = for {
    p <- Gen.oneOf("p", "ex", "a1", "")
    l <- Gen.oneOf("s", "o", "x9", "name")
  } yield s"$p:$l"
  private val iriref: Gen[String] =
    Gen.oneOf("<http://e.x/a>", "<http://e.x/b#c>", "<rel/x>")
  private val iri: Gen[String] = Gen.oneOf(pname, iriref)
  private val literal: Gen[String] = Gen.oneOf(
    "\"hi\"", "'single'", "\"\"\"long\nstring\"\"\"", "'''l'''",
    "\"esc\\n\\t\"", "\"tag\"@en", "\"dt\"^^<http://t>", "42", "-7", "3.14",
    "+.5", "1.2e3", "2E-4", "true", "false", "_:b1", "[ ]")
  private val obj: Gen[String] = Gen.oneOf(iri, literal)

  private val statement: Gen[String] = for {
    w1 <- ws
    s <- Gen.oneOf(iri, Gen.const("_:subj"))
    w2 <- ws
    v <- Gen.oneOf(iri, Gen.const("a"))
    w3 <- ws
    o <- obj
    // pre-dot whitespace must be exactly " ": the grammar discards it and
    // the serializer re-emits " ." (reference lib.rs:206-208, 219) — any
    // other spelling round-trips to the normalized form, not the input
  } yield s"$w1$s$w2$v$w3$o ."

  private val directive: Gen[String] = for {
    w <- ws
    d <- Gen.oneOf(
      "@prefix p: <http://p.x/> .",
      "@prefix : <http://d.x/> .",
      "@base <http://b.x/> .",
      "PREFIX q: <http://q.x/>",
      "BASE <http://bb.x/>")
  } yield s"$w$d"

  private val document: Gen[String] = for {
    parts <- Gen.listOfN(6, Gen.oneOf(statement, directive))
    trail <- Gen.oneOf("", "\n", " # trailing\n")
  } yield parts.mkString("") + trail

  test("render(parse(doc)) == doc on generated documents") {
    check(document, 300) { doc =>
      TurtleParser.parseFull(doc) match {
        case Right(ast) => TurtleSerializer.render(ast) == doc
        case Left(_) => true // generator may build genuinely unparseable combos
      }
    }
  }

  test("parse is a pure function (same input → same AST)") {
    check(document, 100) { doc =>
      TurtleParser.parseFull(doc) == TurtleParser.parseFull(doc)
    }
  }

  test("pre-dot whitespace normalizes to ' .' like the reference") {
    val Right(ast) = TurtleParser.parseFull(":s :p :o\n.")
    assert(TurtleSerializer.render(ast) == ":s :p :o .")
  }

  test("unescape round-trips escape-free strings") {
    check(Gen.asciiPrintableStr.suchThat(!_.contains('\\')), 200) { s =>
      Ast.Unescape(s) == Right(s)
    }
  }
}
