package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Drift tripwire for the static kg_* oracles: regenerates every oracle SQL
  * from the current code (KgOracleGen's builders, minus the refgen-anchoring
  * pass, which needs the compiled reference binary and runs out-of-band) and
  * byte-compares against the committed resources. Any semantic change to the
  * parser, producer, extraction, page synthesis, linking, or the V2 source
  * fails here with instructions to re-run the anchored regeneration.
  */
class KgOracleSyncSpec extends AnyFunSuite {

  private def resource(name: String): String = {
    val is = getClass.getResourceAsStream(s"/graft/oracles/$name.sql")
    assert(is != null, s"missing committed oracle $name")
    try new String(is.readAllBytes(), StandardCharsets.UTF_8)
    finally is.close()
  }

  private val HINT = "— oracle out of sync with the pipeline; re-run the " +
    "KgOracleGen dump/refgen/emit chain (see its scaladoc) so the new " +
    "output is re-anchored against the reference binary before freezing"

  test("block-path oracles match a fresh recomputation") {
    val (sqls, _) = KgOracleGen.blockPass(None)
    sqls.foreach { case (name, sql) =>
      assert(sql == resource(name), s"$name $HINT")
    }
  }

  test("kg_turtle_source oracle matches the V2 source's pure path " +
      "(and the frozen refgen TSVs)") {
    assert(KgOracleGen.turtleSourceSql() == resource("kg_turtle_source"),
      s"kg_turtle_source $HINT")
  }

  test("linking oracles match the live Spark queries") {
    val sqls = KgOracleGen.linkingSqls(SparkTestSession.spark)
    sqls.foreach { case (name, sql) =>
      assert(sql == resource(name), s"$name $HINT")
    }
  }
}
