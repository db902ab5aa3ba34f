package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline

/** Invariants of the corpus-mixing operators that the oracle hash-compare
  * cannot express: sampling determinism under repartitioning, per-stratum
  * rate direction, and the packing plan's conservation/monotonicity laws.
  */
class PackingSamplingSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and independent of partition layout") {
    val a = TextPipeline.stratifiedSample(spark, sf).collect().toSeq
    val b = TextPipeline.stratifiedSample(spark, sf)
      .repartition(13).orderBy("doc_id").collect().toSeq
    a shouldBe b
  }

  test("stratified sample under-samples the dominant stratum relative to the tails") {
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TextPipeline.stratifiedSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en is cut to ~5%, the tails keep ~20%; hash buckets are uniform enough
    // at this corpus size for a coarse band assertion
    val enRate = sampled.getOrElse("en", 0L).toDouble / total("en")
    enRate should be < 0.12
    (total.keySet - "en").foreach { lang =>
      val rate = sampled.getOrElse(lang, 0L).toDouble / total(lang)
      withClue(s"$lang: ") { rate should be > enRate }
    }
  }

  test("pack_chunks conserves tokens and docs, and chunks are contiguous per stream") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunks = TextPipeline.packChunks(spark, sf).collect()

    // every document lands in exactly one chunk
    chunks.map(_.getAs[Long]("n_docs")).sum shouldBe docs.count()

    // per-lang: chunk ids start at 0, are dense, and doc ranges do not
    // overlap (first_doc of chunk i+1 is after last_doc of chunk i — packing
    // is a contiguous split of the doc_id-ordered stream)
    chunks.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      withClue(s"$lang: ") {
        sorted.map(_.getAs[Long]("chunk_id")).toSeq shouldBe
          (0L until sorted.length).toSeq
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            b.getAs[Long]("first_doc") should be > a.getAs[Long]("last_doc")
          case _ => ()
        }
      }
    }
  }

  test("corpus_shuffle is a permutation: every doc once, dense positions per shard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = TextPipeline.corpusShuffle(spark, sf).collect()
    rows.map(_.getAs[Long]("doc_id")).distinct.length shouldBe docs.count()
    rows.groupBy(_.getAs[Long]("shard_id")).foreach { case (shard, rs) =>
      withClue(s"shard $shard: ") {
        rs.map(_.getAs[Long]("pos")).sorted.toSeq shouldBe
          (1L to rs.length).toSeq
      }
    }
  }

  test("split_train covers every doc with ~90/5/5 rates, independent of layout") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count().toDouble
    val bys = TextPipeline.splitTrain(spark, sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bys.values.sum.toDouble shouldBe n
    bys("train") / n should (be > 0.8 and be < 0.97)
    bys("val") / n should be < 0.12
    bys("test") / n should be < 0.12
    // layout-independence: same assignment after an arbitrary repartition
    val a = TextPipeline.splitTrain(spark, sf).collect().toSeq
    val b = TextPipeline.splitTrain(spark, sf)
      .repartition(7).orderBy("doc_id").collect().toSeq
    a shouldBe b
  }

  test("pack_chunks two-level prefix sum equals the per-lang running sum, with the dominant lang split across shards") {
    // reference: the O(n)-per-stream single cumsum, computed driver-side.
    // shardWidth=8 forces the dominant language across MANY (lang, shard)
    // window partitions — the exact layout the 100 TB design requires —
    // and the chunk assignment must still be the per-lang running sum.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        expr("size(split(text, ' '))").cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val assigned = docs.toSeq.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      var run = 0L
      rows.sortBy(_._1).map { case (id, _, nt) =>
        val chunk = run / 512
        run += nt
        ((lang, chunk), (id, nt))
      }
    }
    val expected = assigned.groupBy(_._1).map { case ((lang, chunk), members) =>
      val ids = members.map(_._2._1)
      val nts = members.map(_._2._2)
      (lang, chunk, members.size.toLong, nts.sum, ids.min, ids.max)
    }.toSet
    val shardsUsed = TextPipeline.packChunks(spark, sf, shardWidth = 8)
    val got = shardsUsed.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    got shouldBe expected
    // and the dominant lang really does span multiple shards at this width
    val nShards = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en")
      .select(expr("doc_id div 8")).distinct().count()
    nShards should be > 1L
  }

  test("weighted sample: two-level top-k equals the naive per-lang rank") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val got = TextPipeline.weightedSampleFrom(docsDf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    // the naive shape the operator refuses to run at scale: one global
    // per-lang window over the whole corpus; selection must be identical
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("es_key").desc, col("doc_id"))
    val naive = docsDf
      .select(col("doc_id"), col("lang"),
        TextPipeline.esKey(col("doc_id"), col("n_chars")).as("es_key"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
      .select(col("doc_id"), col("lang"), round(col("es_key"), 6)
        .as("es_key"), col("rk"))
      .orderBy("lang", "rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    got shouldBe naive
    got.nonEmpty shouldBe true
  }

  test("weighted sample admits a dominant-weight document a uniform draw would miss") {
    import spark.implicits._
    // 1 heavy doc (w = 100000) among 400 single-char docs: its A-ES key
    // u^(1/100000) ~ 1 beats every unit-weight key u, so it MUST rank 1
    // (deterministic — keys are fixed functions of doc_id)
    val corpus = ((1L to 400L).map(id => (id, "en", 1L)) :+ (999L, "en", 100000L))
      .toDF("doc_id", "lang", "n_chars")
    val top = TextPipeline.weightedSampleFrom(corpus, k = 1).collect()
    top.map(_.getLong(0)).toSeq shouldBe Seq(999L)
  }

  test("pack_chunks chunk token totals bracket the context length") {
    // a chunk closes once the running count crosses a 512 boundary, so every
    // non-final chunk holds >= the distance to the boundary and the sum of
    // chunk_tokens equals the corpus token total
    val chunks = TextPipeline.packChunks(spark, sf).collect()
    val totalTokens = TextPipeline.textStats(spark, sf)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    chunks.map(_.getAs[Long]("chunk_tokens")).sum shouldBe totalTokens
    chunks.foreach { r => r.getAs[Long]("chunk_tokens") should be > 0L }
  }
}
