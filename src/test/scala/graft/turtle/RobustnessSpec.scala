package graft.turtle

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Crash-freedom: web-scale inputs are adversarial; the parser must return
  * a result (possibly a failure) for ANY input — never throw, never blow
  * the stack. A poison document becomes an error row, not a dead task. */
class RobustnessSpec extends AnyFunSuite {

  test("pathologically nested collections fail cleanly (no StackOverflow)") {
    val deep = "(" * 100000 + ")" * 100000
    val doc = s":s :p $deep ."
    assert(TurtleParser.parseFull(doc).isLeft)
  }

  test("pathologically nested BNPLs fail cleanly") {
    val deep = "[ :p " * 100000 + "\"v\"" + " ]" * 100000
    assert(TurtleParser.parseFull(s":s :p $deep .").isLeft)
  }

  test("documents nested within MAX_DEPTH still parse") {
    val d = 100
    val deep = "( " * d + "1" + " )" * d
    val doc = s":s :p $deep ."
    val r = TurtleParser.parseFull(doc)
    assert(r.isRight, r)
    assert(TurtleSerializer.render(r.toOption.get) == doc)
  }

  test("parser never throws on arbitrary input") {
    val garbage: Gen[String] = Gen.oneOf(
      Gen.asciiStr,
      Gen.listOf(Gen.oneOf('<', '>', '"', '\'', '\\', '(', ')', '[', ']',
        ':', ';', ',', '.', '@', '#', '^', ' ', '\n', 'a', '1', 'é',
        '\uD83D', '\uDE00')).map(_.mkString))
    val prop = Prop.forAll(garbage) { s =>
      TurtleParser.parseFull(s) // Left or Right both fine; throwing is not
      Ast.Unescape(s)
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("producer never throws on parseable fixture mutations") {
    val base = graft.kg.FixtureCorpus.productionSafe.head
    for (cut <- 0 until base.length by 7) {
      val mutated = base.substring(0, cut)
      TurtleParser.parseFull(mutated) match {
        case Right(doc) => TripleProducer.produce(doc) // Either, must not throw
        case Left(_)    => ()
      }
    }
    succeed
  }
}
