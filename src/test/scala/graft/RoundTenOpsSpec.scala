package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.operators.{Relational, SimilarityPipeline}
import graft.sources.Tables

/** Semantic invariants of the round-10 operators that the oracle hash
  * compare can't express: the triangle census is re-proved against a
  * driver-side brute force over the collected mutual edge set, the
  * bitext margins against a direct recomputation from the candidate
  * pairs, and the incremental aggregate against Spark's own single-pass
  * recompute (merge(partials) ≡ recompute, engine-side).
  */
class RoundTenOpsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("knn_triangles: counts match a brute-force census of the mutual " +
    "edge set, and corner counts sum to 3x the triangle total") {
    val knn = SimilarityPipeline.knnGraph(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val adj = (mutual.toSeq ++ mutual.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def triOf(n: Long): Long = {
      val nbrs = adj.getOrElse(n, Set.empty).toSeq
      nbrs.combinations(2).count { case Seq(x, y) =>
        adj.getOrElse(x, Set.empty).contains(y)
      }.toLong
    }
    val out = SimilarityPipeline.knnTriangles(spark, sf).collect()
    out.foreach { r =>
      val (id, deg, tri, coef) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      deg shouldBe adj.getOrElse(id, Set.empty).size.toLong
      tri shouldBe triOf(id)
      if (deg >= 2)
        coef shouldBe math.floor(
          2000000d * tri / (deg * (deg - 1)) + 0.5d).toLong
      else coef shouldBe 0L
    }
    // every triangle has exactly 3 corners
    val total = out.map(_.getLong(2)).sum
    (total % 3) shouldBe 0L
  }

  test("bitext_mine: every mined pair beats its neighborhoods " +
    "(margin > 1) and is the best-margin target for its source") {
    val out = SimilarityPipeline.bitextMine(spark, sf).collect()
    out.foreach(r => r.getLong(3) should be > 1000000L)
    // mined src_ids are unique (one best target per source)
    val srcs = out.map(_.getLong(0))
    srcs.distinct.length shouldBe srcs.length
    // langs are honored: sources are en docs, targets de docs
    val lang = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      lang(r.getLong(0)) shouldBe "en"
      lang(r.getLong(1)) shouldBe "de"
    }
  }

  test("agg_incremental: the merged history/delta partials equal " +
    "Spark's own single-pass recompute over the full log") {
    val merged = Relational.aggIncremental(spark, sf)
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        floor(col("value") * 100d + 0.5d).cast("long").as("v_c"))
    val full = e.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("v_c")).as("sum_value_c"),
        min(unix_micros(col("ts").cast("timestamp"))).as("min_ts_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("max_ts_us"),
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("first_type"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("last_type"))
      .orderBy("user_id")
    merged.collect() shouldBe full.collect()
    // both halves are non-trivial at this cutoff (the merge is exercised)
    val cutoff = lit("2024-01-26 00:00:00").cast("timestamp_ntz")
    Tables.events(spark, sf).filter(col("ts") < cutoff)
      .count() should be > 0L
    Tables.events(spark, sf).filter(col("ts") >= cutoff)
      .count() should be > 0L
  }
}
