package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every declared query has exactly one oracle,
  * and the `oracleSql` source never re-accumulates duplicate key literals
  * (round 2 shipped ~450 dead lines of repeated map entries — Scala `Map`
  * keeps the last binding, so duplicates are silent).
  */
class EntryContractSpec extends AnyFunSuite {

  /** Queries with no ANSI-SQL-expressible oracle. Empty since round 7:
    * `bpe_merges` (the last exemption) now has a generated unrolled-CTE
    * DuckDB replay ([[graft.operators.BpeTrainer.bpeOracleSql]], the
    * Graph.pagerankOracleSql pattern).
    */
  private val oracleExempt = Set.empty[String]

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet ===
      SparkEntry.queries.keySet -- oracleExempt)
  }

  test("no duplicate oracleSql key literals in the source text") {
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val body = text.substring(text.indexOf("def oracleSql"))
    val keyLiteral = """    "([a-z0-9_]+)" ->""".r
    val keys = keyLiteral.findAllMatchIn(body).map(_.group(1)).toSeq
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicated oracleSql keys: ${dups.mkString(", ")}")
    assert(keys.size === SparkEntry.oracleSql.size)
  }

  test("session registry and GraftExtensions register the same native functions") {
    // VectorExpressions.register (per-session) and GraftExtensions
    // (spark.sql.extensions) are two routes to the same function set; a
    // function added to one but not the other breaks cluster deployments
    // silently. Source-text check (SparkSessionExtensions exposes no getter).
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "src/main/scala/graft/expressions/VectorExpressions.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val name = """"(graft_[a-z0-9_]+)"""".r
    val Array(registryPart, extensionsPart) = src.split("class GraftExtensions")
    val registered = name.findAllMatchIn(registryPart).map(_.group(1)).toSet
    val injected = name.findAllMatchIn(extensionsPart).map(_.group(1)).toSet
    // graft_vec_sum is a UDAF (spark.udf.register), not injectable the same
    // way — exempt from the extensions side
    assert((registered - "graft_vec_sum") === injected)
  }

  test("oracle SQL references only driver-provided tables and its own CTEs") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // \b so a column ending in `_from` before a line break doesn't make
    // the NEXT keyword's text parse as a relation named "from"
    val fromRe = """(?i)\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val cteNames = """(?i)([a-z_][a-z0-9_]*)\s+AS\s*(?:MATERIALIZED\s*)?\(""".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- cteNames
      assert(unknown.isEmpty,
        s"$name references unknown relations: ${unknown.mkString(", ")}")
      assert(refs.intersect(tables).nonEmpty || cteNames.nonEmpty,
        s"$name references no known table")
    }
  }
}
