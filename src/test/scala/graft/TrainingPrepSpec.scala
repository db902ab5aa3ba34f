package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{DataQuality, TextPipeline}

/** The operators compose into the full training-prep program a user of the
  * engine would actually run — gate, dedup, decontaminate, shard — with the
  * conservation laws that make the composition trustworthy:
  *  - the acceptance gate passes the raw snapshot;
  *  - exact-dedup survivors contain no duplicate digests (fixpoint: running
  *    dedup again finds nothing);
  *  - near-dup removal leaves a corpus on which the near-dup detector is
  *    empty (fixpoint again);
  *  - curriculum sharding partitions the survivors exactly.
  */
class TrainingPrepSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("gate -> exact dedup -> near-dedup -> curriculum composes with conservation laws") {
    // inject exact duplicates (the sf0.001 snapshot is dup-free): 10 docs
    // re-ingested under fresh ids, the daily-crawl re-fetch shape
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = base.unionByName(
      base.orderBy("doc_id").limit(10)
        .withColumn("doc_id", col("doc_id") + 1000000L))

    // 1. acceptance gate: the snapshot must pass every check before prep
    val gates = DataQuality.qualityChecksFrom(corpus).collect()
    all(gates.map(_.getBoolean(1))) shouldBe true

    // 2. exact dedup: keep the lowest doc_id per normalized digest
    val survivors = corpus
      .withColumn("h", md5(lower(trim(col("text")))))
      .withColumn("keep",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("h").orderBy("doc_id")) === 1)
      .filter(col("keep")).drop("h", "keep")
    val nRaw = corpus.count()
    val nExact = survivors.count()
    nExact should be < nRaw // the synthetic corpus has exact clusters

    // fixpoint: exact dedup of the survivors removes nothing
    survivors.groupBy(md5(lower(trim(col("text"))))).count()
      .filter(col("count") > 1).count() shouldBe 0L

    // 3. near-dup removal: drop the doc_b side of every verified pair
    val pairs = TextPipeline.dedupPipelineFrom(spark,
      survivors.select($"doc_id", $"text"))
    val dropIds = pairs.select($"doc_b".as("doc_id")).distinct()
    val cleaned = survivors.join(dropIds, Seq("doc_id"), "left_anti")
    val nClean = cleaned.count()
    nClean shouldBe nExact - dropIds.count()

    // fixpoint: the near-dup detector finds nothing on the cleaned corpus
    TextPipeline.dedupPipelineFrom(spark,
      cleaned.select($"doc_id", $"text")).count() shouldBe 0L

    // 4. curriculum: the shards partition the cleaned corpus exactly
    val sharded = TextPipeline.curriculumFrom(spark,
      cleaned.select($"doc_id", $"text"), nShards = 4)
    sharded.count() shouldBe nClean
    sharded.select("doc_id").distinct().count() shouldBe nClean
    val sizes = sharded.groupBy("shard").count()
      .collect().map(_.getLong(1))
    sizes.length shouldBe 4
    (sizes.max - sizes.min) should be <= 1L
  }
}
