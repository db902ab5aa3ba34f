package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.SimilarityPipeline

/** The learned-IVF contract: Lloyd's assignments are true argmins, the
  * index build is deterministic, and probing the learned clusters recovers
  * most of the brute-force top-k (the exact values are pinned by the
  * emb_kmeans / sim_topk_kmeans DuckDB oracles; these are the semantic
  * invariants the hash compare can't express).
  */
class KmeansSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("every vector is assigned to its true nearest learned centroid (ties to lowest cluster)") {
    val (cents, assigned) = SimilarityPipeline.kmeansModel(spark, sf, k = 8,
      iters = 2)
    val cs = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val rows = assigned.select("vec_id", "v", "cluster").collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val best = cs.map { case (cid, c) =>
        var d2 = 0.0
        var i = 0
        while (i < v.length) { val d = v(i) - c(i); d2 += d * d; i += 1 }
        (d2, cid)
      }.minBy(identity) // (d2, cid) lexicographic: min distance, lowest id
      withClue(s"vec ${r.get(0)}: ") {
        r.getLong(2) shouldBe best._2
      }
    }
  }

  test("the index build is deterministic: two runs produce identical assignments") {
    val a = SimilarityPipeline.embKmeans(spark, sf).collect().toSeq
    val b = SimilarityPipeline.embKmeans(spark, sf).collect().toSeq
    a shouldBe b
  }

  test("probing the learned clusters recovers most of the brute-force top-k") {
    // measured 0.9 at sf0.001 and sf0.01 with k=8/nprobe=2; the floor
    // guards the mechanism (a broken index or probe would crater recall),
    // not the exact figure
    val brute = SimilarityPipeline.simTopK(spark, sf)
      .limit(10).collect().map(_.getAs[Number]("vec_id").longValue).toSet
    val learned = SimilarityPipeline.simTopKKmeans(spark, sf)
      .collect().map(_.getAs[Number]("vec_id").longValue).toSet
    brute.intersect(learned).size.toDouble / 10.0 should be >= 0.7
  }

  test("no more than k clusters survive, and every cluster id is a seed id") {
    val clusters = SimilarityPipeline.embKmeans(spark, sf)
      .select("cluster").distinct().collect().map(_.getLong(0)).toSet
    clusters.size should be <= 8
    clusters.foreach(c => c should (be >= 0L and be < 8L))
  }

  test("knn graph: <=5 in-cluster neighbors each, dense ranks, non-increasing sims") {
    val rows = SimilarityPipeline.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (v, _, n, s) =>
      v should not be n
      s should (be >= -1.0001 and be <= 1.0001)
    }
    val clusterOf = SimilarityPipeline.embKmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (v, _, n, _) => clusterOf(v) shouldBe clusterOf(n) }
    rows.groupBy(_._1).foreach { case (v, nbrs) =>
      withClue(s"vec $v: ") {
        nbrs.length should be <= 5
        val sorted = nbrs.sortBy(_._2)
        sorted.map(_._2) shouldBe (1L to nbrs.length)
        sorted.map(_._4).sliding(2).foreach {
          case Array(a, b) => a should be >= b
          case _ =>
        }
      }
    }
  }

  test("recall grid: full lattice, bounded recall, monotone in over_fetch") {
    val rows = SimilarityPipeline.annRecallGrid(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // one row per (nprobe, over_fetch) cell, every cell over the full panel
    rows.keySet shouldBe (for {np <- Seq(1L, 2L, 4L); of <- Seq(1L, 2L, 4L)}
      yield (np, of)).toSet
    rows.values.foreach { case (nq, avg, min) =>
      nq shouldBe 8L
      avg should (be >= 0.0 and be <= 1.0)
      min should (be >= 0.0 and be <= avg)
    }
    // provable: for a fixed nprobe the stage-1 survivor set only grows
    // with over_fetch, and exact-rerank top-k of a superset can only gain
    // members of the true top-k (anything outscoring the k-th truth row
    // IS a truth row), so recall is non-decreasing in over_fetch
    for (np <- Seq(1L, 2L, 4L)) {
      val byOf = Seq(1L, 2L, 4L).map(of => rows((np, of))._2)
      byOf shouldBe byOf.sorted
    }
    // the widest cell must beat the narrowest on this corpus: the grid's
    // whole point is showing what probing wider buys (label-IVF recall is
    // deliberately mediocre — the learned k-means index exists for that)
    rows((4L, 4L))._2 should be > rows((1L, 1L))._2
  }

  test("knn_graph_delta: delta path equals the full recompute and only " +
    "rebuilds delta-touched clusters") {
    val delta = SimilarityPipeline.knnGraphDelta(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val full = SimilarityPipeline.knnGraphDeltaRecompute(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // append == recompute, row-for-row (the agg_incremental contract)
    delta.map(t => (t._1, t._2, t._3, t._4)).toSeq shouldBe full.toSeq

    // the work bound: every delta vector's rows are recomputed, and the
    // kept (non-recomputed) rows cover at least one untouched cluster —
    // i.e. the delta path did NOT rebuild the whole graph
    val deltaIds = delta.filter(t => t._1 % 100 == 7).map(_._1).toSet
    deltaIds should not be empty
    delta.filter(t => deltaIds.contains(t._1)).map(_._5).toSet shouldBe
      Set(true)
    delta.count(!_._5) should be > 0
    // a vector's rows are all-kept or all-recomputed (cluster-level unit)
    delta.groupBy(_._1).values.foreach { rows =>
      rows.map(_._5).toSet should have size 1
    }
  }
}
