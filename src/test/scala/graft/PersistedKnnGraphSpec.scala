package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, SimilarityPipeline}
import graft.sources.Tables

/** The persisted kNN-graph store's contract: append(base, batches) ==
  * recompute(base ∪ batches) under the frozen base-trained centroids,
  * replayed batches are no-ops, maintenance rewrites only the touched
  * cluster partitions, and the streaming ingest is the same fold.
  */
class PersistedKnnGraphSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def vecs: DataFrame = Tables.embeddings(spark, sf)

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-knn-$tag").toString

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** From-scratch edges over `all` under centroids trained on `base` —
    * the recompute every store state must equal. */
  private def recompute(base: DataFrame, all: DataFrame): Seq[Seq[Any]] = {
    val p = freshDir("recompute")
    PersistedIndex.buildKnnGraphStore(spark, base, p)
    PersistedIndex.appendToKnnGraphStore(spark,
      all.join(base.select("vec_id"), Seq("vec_id"), "left_anti"), p)
    rows(PersistedIndex.readKnnGraphStore(spark, p))
  }

  test("append(base, batches) == one-shot recompute; replay is a no-op; " +
    "untouched cluster partitions keep their files") {
    val base = vecs.filter(col("vec_id") % 100 =!= 7)
    val delta = vecs.filter(col("vec_id") % 100 === 7)
    delta.count() should be > 0L

    val dir = freshDir("store")
    PersistedIndex.buildKnnGraphStore(spark, base, dir)

    // granularity probe: find an edge partition the delta will NOT touch
    val touchedClusters = {
      val cents = spark.read.parquet(s"$dir/centroids")
      SimilarityPipeline.assignToCentroids(
          delta.select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v")), cents)
        .select("cluster").distinct().collect().map(_.getLong(0)).toSet
    }
    val allClusters = spark.read.parquet(s"$dir/nodes")
      .select(col("cluster").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val untouched = (allClusters -- touchedClusters)
    untouched should not be empty // the sparse split leaves spare clusters
    // under the segment-manifest discipline the base segment is NEVER
    // rewritten — pin every base edge file's (name, mtime)
    def sig(c: Long): Map[String, Long] = {
      val d = new java.io.File(s"$dir/edges/seg=base/cluster=$c")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = allClusters.map(c => c -> sig(c)).toMap
    // a reader PINNED to version 1 before the fold
    val pinned = PersistedIndex.readKnnGraphStore(spark, dir, version = 1L)
    val pinnedBefore = rows(pinned)

    PersistedIndex.appendToKnnGraphStore(spark, delta, dir)
    val got = rows(PersistedIndex.readKnnGraphStore(spark, dir))
    // equals the one-shot recompute over the union (same frozen model)
    got shouldBe recompute(base, vecs)
    // additive fold: NO base segment file was rewritten — not just the
    // untouched clusters (the old copy-on-write bound), all of them
    allClusters.foreach(c => sig(c) shouldBe before(c))
    // and the pinned version-1 reader re-executes byte-identically
    rows(pinned) shouldBe pinnedBefore
    got should not be pinnedBefore // the fold did change the latest view

    // at-least-once replay: folding the same batch again changes nothing
    PersistedIndex.appendToKnnGraphStore(spark, delta, dir)
    rows(PersistedIndex.readKnnGraphStore(spark, dir)) shouldBe got
    // and node rows were not duplicated by the replay
    val n = spark.read.parquet(s"$dir/nodes")
    n.count() shouldBe n.select("vec_id").distinct().count()
  }

  test("a batch carrying the same vec_id twice lands ONE node row") {
    val base = vecs.filter(col("vec_id") % 100 =!= 7)
    val delta = vecs.filter(col("vec_id") % 100 === 7)
    val dir = freshDir("dupbatch")
    PersistedIndex.buildKnnGraphStore(spark, base, dir)
    // duplicate every delta row INSIDE one batch — the at-least-once
    // world where an upstream retry doubled rows before the fold
    PersistedIndex.appendToKnnGraphStore(spark,
      delta.unionByName(delta), dir)
    val n = spark.read.parquet(s"$dir/nodes")
    n.count() shouldBe n.select("vec_id").distinct().count()
    // and the graph still equals the clean recompute
    rows(PersistedIndex.readKnnGraphStore(spark, dir)) shouldBe
      recompute(base, vecs)
  }

  test("streamed micro-batch ingest equals the one-shot recompute") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = vecs.filter(col("vec_id") % 10 < 6)
    val dir = freshDir("stream")
    PersistedIndex.buildKnnGraphStore(spark, base, dir)

    val rest = vecs.filter(col("vec_id") % 10 >= 6)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)].collect().toSeq
    val (b1, b2) = rest.splitAt(rest.size / 2)

    val mem = MemoryStream[(Long, Array[Float], Int)]
    val q = PersistedIndex.knnGraphIngestStream(
      mem.toDF().toDF("vec_id", "embedding", "label"),
      dir, freshDir("ckpt")).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    rows(PersistedIndex.readKnnGraphStore(spark, dir)) shouldBe
      recompute(base, vecs)
  }
}
