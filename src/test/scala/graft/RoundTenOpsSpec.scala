package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.operators.{Relational, SimilarityPipeline, TextPipeline}
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

  test("knn_kcore: membership matches a driver-side peel to " +
    "convergence (the fixed round budget is past the fixpoint)") {
    val knn = SimilarityPipeline.knnGraph(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    var alive = (mutual.map(_._1) ++ mutual.map(_._2)).toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = (mutual.toSeq ++ mutual.toSeq.map(_.swap))
        .filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
      changed = next != alive
      alive = next
      rounds += 1
    }
    // peeling must converge within the engine's fixed round budget
    // (sf0.01 measured at 13 filter applications; budget is 1 + 14)
    rounds should be <= 15
    val out = SimilarityPipeline.knnKcore(spark, sf).collect()
    val coreDeg = (mutual.toSeq ++ mutual.toSeq.map(_.swap))
      .filter { case (a, b) => alive(a) && alive(b) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.size.toLong }
    out.foreach { r =>
      val id = r.getLong(0)
      r.getBoolean(2) shouldBe alive(id)
      r.getLong(3) shouldBe coreDeg.getOrElse(id, 0L)
      if (alive(id)) r.getLong(3) should be >= 3L
    }
  }

  test("emb_drift: one source's drift and norm re-derive from a " +
    "driver-side recompute of the quantization pipeline") {
    val out = SimilarityPipeline.embDrift(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = Tables.embeddings(spark, sf)
      .join(Tables.documents(spark, sf).selectExpr("doc_id AS vec_id",
        "source"), "vec_id")
      .selectExpr("source", "cast(embedding as array<double>) AS v")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    val bySrc = rows.groupBy(_._1)
    // exact replay: per-component micro sums -> means -> quantized
    // deltas -> integer square sum
    val gSums = Array.fill(64)(0L)
    rows.foreach { case (_, v) =>
      v.zipWithIndex.foreach { case (x, i) =>
        gSums(i) += math.floor(x * 1000000d + 0.5d).toLong
      }
    }
    val gN = rows.length
    val src = bySrc.keys.min
    val sRows = bySrc(src).map(_._2)
    val sSums = Array.fill(64)(0L)
    sRows.foreach(v => v.zipWithIndex.foreach { case (x, i) =>
      sSums(i) += math.floor(x * 1000000d + 0.5d).toLong
    })
    val drift = (0 until 64).map { i =>
      val ms = sSums(i).toDouble / sRows.length / 1000000d
      val mg = gSums(i).toDouble / gN / 1000000d
      val d = math.floor((ms - mg) * 1000000d + 0.5d).toLong
      d * d
    }.sum
    val r = out(src)
    r.getLong(1) shouldBe sRows.length.toLong
    r.getLong(2) shouldBe drift
    val nq = sRows.map(v => math.floor(
      v.foldLeft(0.0d)((a, x) => a + x * x) * 1000000d + 0.5d).toLong)
    r.getLong(3) shouldBe
      math.floor(nq.sum.toDouble / nq.length + 0.5d).toLong
  }

  test("zorder_stats: bucket boxes cover their rows, counts sum to the " +
    "table, and the interleave matches a reference Morton encode") {
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .sum
    val li = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0) & 65535L, r.getLong(1) & 65535L))
    val expect = li.groupBy { case (x, y) => morton(x, y) >> 14 }
    val out = Relational.zorderStats(spark, sf).collect()
    out.map(_.getLong(1)).sum shouldBe li.length.toLong
    out.foreach { r =>
      val rows = expect(r.getLong(0))
      r.getLong(1) shouldBe rows.length.toLong
      r.getLong(2) shouldBe rows.map(_._1).min
      r.getLong(3) shouldBe rows.map(_._1).max
      r.getLong(4) shouldBe rows.map(_._2).min
      r.getLong(5) shouldBe rows.map(_._2).max
    }
    // Morton locality: dropping 7 interleaved bit-pairs makes every
    // bucket an exact 128x128 tile, so no box exceeds 16384 cells at
    // ANY data volume
    out.foreach(r => r.getLong(6) should be <= 16384L)
  }

  test("coreset_kcenter: picks replay a driver-side farthest-point " +
    "traversal and the coverage radius never grows") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dq(a: Seq[Double], b: Seq[Double]): Long = math.floor(
      a.zip(b).foldLeft(0.0d) { case (acc, (x, c)) =>
        acc + (x - c) * (x - c)
      } * 1000000d + 0.5d).toLong
    var md = vecs.map { case (id, v) => id -> dq(v, vecs(0L)) }
    var chosen = Vector(0L)
    val expect = scala.collection.mutable.ArrayBuffer(
      (0L, 0L, md.values.max))
    for (r <- 1 until 8) {
      val pick = md.filterNot { case (id, _) => chosen.contains(id) }
        .toSeq.maxBy { case (id, d) => (d, -id) }._1
      md = md.map { case (id, d) =>
        id -> math.min(d, dq(vecs(id), vecs(pick)))
      }
      chosen :+= pick
      expect += ((r.toLong, pick, md.values.max))
    }
    val out = SimilarityPipeline.coresetKcenter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe expect.toSeq
    // monotone coverage: each pick can only shrink the radius
    out.map(_._3).sliding(2).foreach { case Array(a, b) =>
      b should be <= a
    }
  }

  test("quality_propagate: trusted seeds keep score 1e6 halves-capped, " +
    "isolated nodes keep their seed, and scores replay the spreading") {
    val out = SimilarityPipeline.qualityPropagate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val knn = SimilarityPipeline.knnGraph(spark, sf)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val adj = (mutual.toSeq ++ mutual.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val seeds = out.map { case (id, (_, s, _)) => id -> s }
    var score = seeds
    for (_ <- 1 to 3) {
      score = out.keys.map { id =>
        val nbrs = adj.getOrElse(id, Seq.empty)
        val s =
          if (nbrs.isEmpty) seeds(id)
          else math.floor((seeds(id) + math.floor(
            nbrs.map(score).sum.toDouble / nbrs.length)) / 2.0d).toLong
        id -> s
      }.toMap
    }
    out.foreach { case (id, (deg, seed, sc)) =>
      deg shouldBe adj.getOrElse(id, Seq.empty).size.toLong
      sc shouldBe score(id)
      if (deg == 0) sc shouldBe seed
      sc should be <= 1000000L
      sc should be >= 0L
    }
    // the propagation must actually move mass: some untrusted doc with
    // trusted neighbors scores above 0
    out.exists { case (_, (deg, seed, sc)) =>
      seed == 0L && deg > 0 && sc > 0L
    } shouldBe true
  }

  test("rbo_overlap: bounded in [0, 1e6], and identical rankings give " +
    "RBO = 1e6 under the same weight table") {
    val out = graft.operators.Retrieval.rboOverlap(spark, sf).head()
    out.getLong(0) should be >= 0L
    out.getLong(1) should be >= 0L
    out.getLong(1) should be <= 1000000L
    // the normalized weight table sums to the full-agreement mass: doc
    // pairs at ranks (d, d) for d = 1..10 score exactly 1
    val full = graft.operators.Retrieval.RboWeightsQ9.sum
    math.floor(full.toDouble / 1000.0d + 0.5d).toLong shouldBe 1000000L +- 1L
  }

  test("zipf_fit: slope/intercept/r2 replay a driver-side OLS over the " +
    "token head, and the slope is negative (Zipf-shaped)") {
    val out = TextPipeline.zipfFit(spark, sf).head()
    val tf = Tables.documents(spark, sf)
      .selectExpr("explode(split(text, ' ')) AS token")
      .where("length(token) > 0")
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val top = tf.sortBy { case (t, f) => (-f, t) }.take(256)
    val lx = top.indices.map(i =>
      math.floor(math.log((i + 1).toDouble) * 1000000d + 0.5d).toLong)
    val ly = top.map { case (_, f) =>
      math.floor(math.log(f.toDouble) * 1000000d + 0.5d).toLong
    }
    val n = top.length.toLong
    val (sx, sy) = (lx.sum, ly.sum)
    val sxx = lx.map(v => v * v).sum
    val syy = ly.map(v => v * v).sum
    val sxy = lx.zip(ly).map { case (a, b) => a * b }.sum
    val a = n * sxy - sx * sy
    val b = n * sxx - sx * sx
    val c = n * syy - sy * sy
    val slope = a.toDouble / b.toDouble
    out.getLong(0) shouldBe n
    out.getLong(1) shouldBe top.map(_._2).sum
    out.getLong(2) shouldBe tf.map(_._2).sum
    out.getLong(3) shouldBe math.floor(slope * 1000000d + 0.5d).toLong
    out.getLong(4) shouldBe math.floor(
      (sy.toDouble - slope * sx.toDouble) / n.toDouble + 0.5d).toLong
    out.getLong(5) shouldBe math.floor(
      a.toDouble * a.toDouble / (b.toDouble * c.toDouble) * 1000000d
        + 0.5d).toLong
    out.getLong(3) should be < 0L
  }

  test("curation_trace: per-doc outcomes reconcile exactly with the " +
    "funnel's per-stage survivor counts") {
    val trace = graft.operators.CurationProgram.curationTrace(spark, sf)
      .groupBy("outcome").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val funnel = graft.operators.CurationProgram.curationFunnel(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    trace("quality_gate") shouldBe funnel("ingest") - funnel("gated")
    trace("dedup_exact") shouldBe funnel("gated") - funnel("deduped")
    trace("domain_cap") shouldBe funnel("deduped") - funnel("capped")
    trace("token_budget") shouldBe funnel("capped") - funnel("budgeted")
    trace("admitted") shouldBe funnel("budgeted")
    trace.values.sum shouldBe funnel("ingest")
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
