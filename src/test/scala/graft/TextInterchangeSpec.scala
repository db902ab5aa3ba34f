package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.{Tables, TextInterchange}

/** The interchange contracts the oracle round trips can't express: the
  * quarantine actually catches malformed lines without failing the job,
  * CSV quoting survives every metacharacter, and the ORC path keeps
  * columnar pushdown (the reason it needs no parquet conversion).
  */
class TextInterchangeSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-interchange-$tag")
      .toString

  test("malformed JSONL lines are quarantined, good rows flow on typed") {
    val dir = freshDir("quarantine")
    TextInterchange.writeJsonl(Tables.documents(spark, sf), dir)
    // inject breakage a crawl dump actually exhibits: truncated JSON,
    // non-JSON noise, and a type violation (doc_id as a word)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-zz-injected.json"),
      """{"doc_id": 999999, "text": "truncated
        |not json at all
        |{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "s", "n_chars": 1}
        |{"doc_id": 999998, "text": "fine", "lang": "en", "source": "srcX", "n_chars": 4}
        |""".stripMargin)
    val (good, quarantined) = TextInterchange.readJsonl(spark, dir)
    val n = Tables.documents(spark, sf).count()
    good.count() shouldBe n + 1 // the one well-formed injected row
    quarantined.count() shouldBe 3L
    good.filter(col("doc_id") === 999998L).count() shouldBe 1L
    // good rows carry the explicit schema, not an inferred one
    good.schema.map(f => (f.name, f.dataType.typeName)) shouldBe Seq(
      ("doc_id", "long"), ("text", "string"), ("lang", "string"),
      ("source", "string"), ("n_chars", "long"))
  }

  test("CSV quoting survives commas, quotes, and the escape char itself") {
    import spark.implicits._
    val nasty = Seq(
      (1L, """plain text""", "en", "s1", 10L),
      (2L, """comma, separated, values""", "en", "s1", 24L),
      (3L, """she said "hi" loudly""", "en", "s2", 20L),
      (4L, """quote"comma",mix""", "de", "s2", 16L),
      (5L, "", "de", "s3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = freshDir("csvq")
    TextInterchange.writeCsv(nasty, dir)
    val (good, quarantined) = TextInterchange.readCsv(spark, dir)
    quarantined.count() shouldBe 0L
    val back = good.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    back.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    back(1)._2 shouldBe Some("comma, separated, values")
    back(2)._2 shouldBe Some("""she said "hi" loudly""")
    back(3)._2 shouldBe Some("""quote"comma",mix""")
  }

  test("a CSV written in a different column order fails fast instead of " +
    "silently swapping string columns") {
    import spark.implicits._
    // text/lang/source are all strings — a positional parse of this
    // reordered file would round-trip with swapped columns and an empty
    // quarantine; the header guard must refuse it loudly
    val reordered = Seq((1L, "en", "hello world", "s1", 11L))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val dir = freshDir("csvorder")
    TextInterchange.writeCsv(reordered, dir)
    val (good, quarantined) = TextInterchange.readCsv(spark, dir)
    val e = the[Exception] thrownBy good.collect()
    e.getMessage should include("header order")
    an[Exception] should be thrownBy quarantined.count()
  }

  test("ORC reads keep predicate pushdown and column pruning") {
    val dir = freshDir("orcpd")
    TextInterchange.writeOrc(Tables.documents(spark, sf), dir)
    val q = TextInterchange.readOrc(spark, dir)
      .filter(col("doc_id") < 100L).select("doc_id", "lang")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    plan should include("PushedFilters")
    plan should include("LessThan(doc_id,100)")
    plan should include("ReadSchema: struct<doc_id:bigint,lang:string>")
  }

  test("streaming JSONL ingest: raw crawl files -> quarantine + curated " +
    "store, equal to the one-shot program over the good rows") {
    import graft.operators.{CurationProgram, CurationStore}
    val docs = Tables.documents(spark, sf)
      .orderBy("doc_id").collect()
    // bootstrap the store on the first quarter (applyCurationDelta folds
    // against EXISTING state), stream the rest as two id-ordered files
    val (boot, rest) = docs.splitAt(docs.length / 4)
    val (half1, half2) = rest.splitAt(rest.length / 2)
    def jsonl(rows: Array[org.apache.spark.sql.Row]): String =
      rows.map { r =>
        val txt = r.getString(1).replace("\\", "\\\\").replace("\"", "\\\"")
        s"""{"doc_id": ${r.getLong(0)}, "text": "$txt", "lang": "${r.getString(2)}", "source": "${r.getString(3)}", "n_chars": ${r.getLong(4)}}"""
      }.mkString("\n")
    val inDir = freshDir("ingest-in")
    val qDir = freshDir("ingest-q")
    val storeDir = freshDir("ingest-store")
    // file 1: first half + a malformed line; file 2 arrives after a
    // stream RESTART on the same checkpoint (the file source's
    // processed-file log keeps batch ids monotone, so the store's
    // id-ordered append contract holds across the restart)
    val ckpt = freshDir("ingest-ckpt")
    CurationStore.buildCurationManifest(spark,
      Tables.documents(spark, sf)
        .filter(col("doc_id") < half1.head.getLong(0)), storeDir)
    def run(): Unit = {
      val q = TextInterchange.jsonlIngestStream(spark, inDir, qDir, ckpt) {
        (good, id) => CurationStore.appendCurationBatch(good, storeDir, id)
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inDir/part1.json"),
      jsonl(half1) + "\nnot json at all\n")
    run()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inDir/part2.json"),
      jsonl(half2) + "\n{\"doc_id\": \"bad-type\"}\n")
    run() // restart: only part2 is new
    // the final manifest must equal the one-shot program over ALL docs
    val want = CurationProgram.curationProgramFrom(Tables.documents(spark, sf))
      .collect().toSeq.map(_.toSeq)
    CurationStore.readManifest(spark, storeDir)
      .collect().toSeq.map(_.toSeq) shouldBe want
    // both malformed lines are quarantined with their raw text
    val quarantined = spark.read.parquet(qDir)
      .select("raw_line").collect().map(_.getString(0)).toSet
    quarantined should contain("not json at all")
    quarantined should contain("""{"doc_id": "bad-type"}""")
  }

  test("jsonl/csv/orc round trips profile identically to the source table") {
    val want = TextInterchange
      .roundtripProfile(Tables.documents(spark, sf))
      .collect().toSeq.map(_.toSeq)
    TextInterchange.jsonlRoundtrip(spark, sf)
      .collect().toSeq.map(_.toSeq) shouldBe want
    TextInterchange.csvRoundtrip(spark, sf)
      .collect().toSeq.map(_.toSeq) shouldBe want
    TextInterchange.orcRoundtrip(spark, sf)
      .collect().toSeq.map(_.toSeq) shouldBe want
  }
}
