package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.SparkTestSession

class TurtleExpressionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.register(s)
    s
  }

  test("turtle_unescape evaluates through SQL (codegen path)") {
    import spark.implicits._
    val rows = Seq("""a\tb""", """A""", """bad\q""", "plain")
      .toDF("s").createOrReplaceTempView("t_esc")
    val out = spark.sql("SELECT s, turtle_unescape(s) AS v FROM t_esc")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("""a\tb""") == "a\tb")
    assert(out("""A""") == "A")
    assert(out("""bad\q""") == null) // invalid escape → null
    assert(out("plain") == "plain")
  }

  test("turtle_unescape stays inside WholeStageCodegen") {
    // a LocalRelation folds eagerly; range() forces a real codegen'd plan
    val df = spark.range(8).selectExpr(
      "turtle_unescape(concat('v\\t', cast(id AS STRING))) AS v")
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().map(_.getString(0)).forall(_.startsWith("v\t")))
  }

  test("serialize_turtle: pure-SQL round-trip is byte-identical on the corpus") {
    import spark.implicits._
    graft.kg.FixtureCorpus.all.toSeq.toDF("name", "text")
      .createOrReplaceTempView("t_corpus")
    val out = spark.sql(
      """SELECT name,
                serialize_turtle(text) IS NULL AS unparsed,
                serialize_turtle(text) = text AS identical
         FROM t_corpus""").collect()
    // the known must-fail fixture yields NULL; every parsed doc re-renders
    // byte-identically (the reference's format-preservation contract, via SQL)
    out.foreach { r =>
      val name = r.getString(0)
      if (name.endsWith("blank_node_object_dot.ttl")) assert(r.getBoolean(1), name)
      else assert(!r.getBoolean(1) && r.getBoolean(2), name)
    }
  }

  test("AST editing helpers: Whitespace.space and Verb.from") {
    import graft.turtle.Ast
    assert(Ast.Whitespace.space == " ")
    val iri = Ast.IriRef("http://e.x/p")
    assert(Ast.Verb.from(iri) == Ast.VerbIri(iri))
    // editing use: rebuild a statement with normalized whitespace
    val doc = graft.turtle.TurtleParser.parseFull("<http://a> <http://b> <http://c> .")
      .toOption.get
    val rendered = graft.turtle.TurtleSerializer.render(doc)
    assert(rendered.contains(Ast.Whitespace.space))
  }

  test("parse_turtle_triples generates triple rows from SQL") {
    import spark.implicits._
    Seq(
      ("u1", "@prefix p: <http://e.x/> .\np:s p:q p:o ."),
      ("u2", "<http://a> <http://b> ( 1 2 ) ."),
      ("u3", "not turtle <<<"))
      .toDF("url", "text").createOrReplaceTempView("t_docs")
    val out = spark.sql(
      """SELECT url, t.* FROM t_docs
         LATERAL VIEW parse_turtle_triples(text, url) t""")
    val rows = out.collect()
    val byUrl = rows.groupBy(_.getString(0))
    // u1: one plain triple
    assert(byUrl("u1").length == 1)
    assert(byUrl("u1").head.getString(3) == "http://e.x/q")
    // u2: collection expands to cons cells: 2×(first,rest) + parent = 5
    assert(byUrl("u2").count(_.getString(8) == null) == 5)
    // u3: single error row
    assert(byUrl("u3").length == 1)
    assert(byUrl("u3").head.getString(8) != null)
    // bnode ids deterministic per url
    val bnodes = byUrl("u2").map(_.getString(1)).filter(_ != null)
      .filter(_.startsWith("_:"))
    assert(bnodes.distinct.length == 2)
  }

  test("generator matches the typed flatMap path on fixture docs") {
    import spark.implicits._
    val docs = graft.kg.FixtureCorpus.productionSafe.take(10).zipWithIndex
      .map { case (text, i) => (s"https://fx.example/$i", text) }
    docs.toDF("url", "text").createOrReplaceTempView("t_fx")
    val sqlCount = spark.sql(
      """SELECT count(*) FROM t_fx
         LATERAL VIEW parse_turtle_triples(text, url) t
         WHERE t.error IS NULL""").head().getLong(0)
    val typedCount = docs.map { case (url, text) =>
      graft.turtle.TurtleParser.parseFull(text).toOption
        .flatMap(d => graft.turtle.TripleProducer.produce(d).toOption)
        .map(_.distinct.size).getOrElse(0)
    }.sum
    assert(sqlCount == typedCount)
  }
}
