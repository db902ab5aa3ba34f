package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline

/** Convergence of the dedup-cluster label propagation on adversarial graph
  * shapes the LSH pair graph never produces (the oracle only exercises
  * near-cliques): long paths, star unions, and a random graph against a
  * BFS reference.
  */
class ConnectedComponentsSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    TextPipeline.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
      .toMap
  }

  /** Union-find reference. */
  private def reference(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val label = members.min
      members.map(_ -> (label, members.size.toLong))
    }
  }

  test("a 40-node path collapses to one cluster (pointer jumping covers long diameters)") {
    val path = (0L until 39L).map(i => (i, i + 1))
    val got = cc(path)
    got.values.map(_._1).toSet shouldBe Set(0L)
    got.values.map(_._2).toSet shouldBe Set(40L)
  }

  test("disjoint stars and a bridge merge exactly the bridged pair of clusters") {
    val starA = (1L to 5L).map(i => (0L, i))
    val starB = (11L to 15L).map(i => (10L, i))
    val starC = (21L to 25L).map(i => (20L, i))
    val bridge = Seq((5L, 11L)) // joins A and B, C stays apart
    val got = cc(starA ++ starB ++ starC ++ bridge)
    got(15L)._1 shouldBe 0L
    got(15L)._2 shouldBe 12L
    got(25L)._1 shouldBe 20L
    got(25L)._2 shouldBe 6L
  }

  test("an empty pair graph returns an empty labeling (no null-sum crash)") {
    // a clean corpus/batch produces zero near-dup pairs; sum() over the
    // empty label table is SQL null and must read as converged, not NPE
    cc(Seq.empty) shouldBe Map.empty
  }

  test("exhausting maxIters before the fixpoint fails loudly instead of returning wrong labels") {
    import spark.implicits._
    val path = (0L until 39L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      TextPipeline.connectedComponents(path.toDF("doc_a", "doc_b"),
        maxIters = 1).collect()
    }
    ex.getMessage should include("did not converge")
  }

  test("a configured checkpoint dir switches the loop to reliable checkpoints") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val path = (0L until 20L).map(i => (i, i + 1))
      val got = cc(path)
      got.values.map(_._1).toSet shouldBe Set(0L)
      // reliable checkpoint files actually landed in the dir
      val wrote = java.nio.file.Files.walk(dir).count() > 1
      wrote shouldBe true
    } finally {
      // keep the shared session localCheckpoint-only for other suites
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("random graph matches a union-find reference") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    cc(pairs) shouldBe reference(pairs)
  }
}
