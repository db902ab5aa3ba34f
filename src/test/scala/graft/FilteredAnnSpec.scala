package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, SimilarityPipeline}

/** Filtered ANN (round 13): the metadata predicate belongs INSIDE the
  * persisted-index probe, not on its result — these cases pin (a) that
  * the predicate physically reaches the stage-1 code-column scan
  * (PushedFilters) while partition pruning survives, and (b) a recall
  * floor against the FILTERED brute force across every selectivity
  * class the 10-label corpus offers, including that the widened
  * (over-probe) compensation actually buys recall.
  */
class FilteredAnnSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val ivfDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-fivf").toString
    PersistedIndex.buildIvfIndex(spark, sf, d)
    d
  }

  private lazy val lshDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-flsh").toString
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    PersistedIndex.buildLshIndex(spark, e, d)
    d
  }

  /** Brute-force filtered top-k ids — the ground truth a filtered ANN
    * is graded against. */
  private def exactFilteredIds(label: Int, k: Int): Seq[Long] = {
    graft.expressions.VectorExpressions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("q"))
    e.filter(col("label") === label && col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (graft.expressions.VectorExpressions.dotNative(col("v"), col("q"))
          / (sqrt(graft.expressions.VectorExpressions
              .dotNative(col("v"), col("v")))
            * sqrt(graft.expressions.VectorExpressions
              .dotNative(col("q"), col("q"))))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("filtered IVF probe: the label predicate reaches the stage-1 " +
    "code-column scan's PushedFilters and partition pruning survives") {
    val plan = PersistedIndex
      .probeIvfIndexFiltered(spark, sf, ivfDir, filterLabel = 3)
      .queryExecution.explainString(FormattedMode)
    // the selective filter must shrink the SCAN (row-group skipping at
    // 100 TB), not the result: stage 1's qv scan carries the pushed
    // equality predicate
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList
    val stage1 = scanBlocks.filter(b =>
      b.contains("/vectors") && b.contains("qv"))
    stage1 should not be empty
    stage1.foreach { b =>
      withClue(s"stage-1 scan without the pushed label filter:\n$b\n") {
        b should include("EqualTo(label,3)")
      }
    }
    // and the coarse prune still reaches the directory listing
    plan should include("dynamicpruning")
  }

  test("filtered IVF probe ranks ONLY matching rows and recalls the " +
    "filtered brute force above the floor at every label") {
    val recalls = (0 to 9).map { l =>
      val got = PersistedIndex
        .probeIvfIndexFiltered(spark, sf, ivfDir, filterLabel = l)
        .collect()
      got.length should be <= 10
      val exact = exactFilteredIds(l, 10).toSet
      got.map(_.getLong(1)).toSet.intersect(exact).size.toDouble /
        exact.size
    }
    // per-label floor: a ~10% filter over 4-of-8 probed clusters; the
    // widened probe keeps every label's recall usable
    recalls.min should be >= 0.5
    // and the family-level average is high — the compensation works
    (recalls.sum / recalls.size) should be >= 0.8
  }

  test("the over-probe compensation buys recall: widened nprobe=4 " +
    "never trails the unfiltered default nprobe=2") {
    val deltas = (0 to 9).map { l =>
      val exact = exactFilteredIds(l, 10).toSet
      def recallAt(np: Int): Double = PersistedIndex
        .probeIvfIndexFiltered(spark, sf, ivfDir, filterLabel = l,
          nprobe = np)
        .collect().map(_.getLong(1)).toSet.intersect(exact).size.toDouble /
        exact.size
      recallAt(4) - recallAt(2)
    }
    deltas.foreach(_ should be >= 0.0)
    // and strictly helps somewhere (otherwise the widening is dead code)
    deltas.max should be > 0.0
  }

  test("filtered LSH probe: predicate pushed into the verify scan, " +
    "bucket-directory pruning untouched, audit flags vs filtered exact") {
    val plan = PersistedIndex
      .probeLshIndexFiltered(spark, lshDir, filterLabel = 3)
      .queryExecution.explainString(FormattedMode)
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList
    // the query-vector reads (vec_id = 0) legitimately skip the label
    // predicate; the VERIFY and EXACT-AUDIT scans must both push it
    val filteredScans = scanBlocks.filter(b =>
      b.contains("/vectors") && b.contains("EqualTo(label,3)"))
    withClue(s"expected >= 2 label-pushed vectors scans " +
      s"(verify + audit); plan scans:\n${scanBlocks.mkString("\n")}\n") {
      filteredScans.length should be >= 2
    }
    // the bucket probe still prunes to the query's (band, pfx) dirs
    val bucketScans = scanBlocks.filter(_.contains("/buckets"))
    bucketScans should not be empty
    bucketScans.foreach(_ should include("PartitionFilters: ["))
  }

  test("filtered LSH probe recalls the filtered brute force above the " +
    "floor, averaged over labels; in_exact audits agree") {
    val recalls = (0 to 9).map { l =>
      val got = PersistedIndex
        .probeLshIndexFiltered(spark, lshDir, filterLabel = l).collect()
      val exact = exactFilteredIds(l, 10).toSet
      val hitIds = got.map(_.getLong(1)).toSet
      // the in_exact flag must be exactly membership in the filtered
      // brute-force set
      got.foreach { r =>
        r.getBoolean(4) shouldBe exact.contains(r.getLong(1))
      }
      hitIds.intersect(exact).size.toDouble / exact.size
    }
    // LSH recall is bucket-collision-bound (4 bands, no over-probe
    // lever): measured 0.2-0.5 per label / 0.32 avg at sf0.001 — the
    // floor pins that telemetry so a signature regression (recall
    // collapse to ~0) is caught, and the in_exact column carries the
    // per-release audit. The IVF filtered probe is the high-recall
    // path; this is the cheap-candidate path.
    (recalls.sum / recalls.size) should be >= 0.25
    recalls.min should be >= 0.15
  }

  private lazy val ivfPqDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-fivfpq").toString
    PersistedIndex.buildIvfPqIndex(spark, sf, d)
    d
  }

  test("range-filtered IVF+PQ probe: the vec_id range reaches the " +
    "stage-1 codes scan's PushedFilters under the probed-label pruning") {
    val plan = PersistedIndex
      .probeIvfPqIndexFiltered(spark, sf, ivfPqDir, 100L, 400L)
      .queryExecution.explainString(FormattedMode)
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList
    val stage1 = scanBlocks.filter(b =>
      b.contains("/codes") && b.contains("codes:"))
    stage1 should not be empty
    stage1.foreach { b =>
      withClue(s"stage-1 codes scan without the pushed range:\n$b\n") {
        b should include("GreaterThanOrEqual(vec_id,100)")
        b should include("LessThan(vec_id,400)")
      }
    }
  }

  test("range-filtered IVF+PQ probe returns only in-range ids and " +
    "recalls the range-filtered brute force above the floor") {
    graft.expressions.VectorExpressions.register(spark)
    val got = PersistedIndex
      .probeIvfPqIndexFiltered(spark, sf, ivfPqDir, 100L, 400L).collect()
    got.foreach { r =>
      r.getLong(1) should be >= 100L
      r.getLong(1) should be < 400L
    }
    // range-filtered brute force over the same corpus
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("q"))
    val exact = e
      .filter(col("vec_id") >= 100L && col("vec_id") < 400L &&
        col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (graft.expressions.VectorExpressions.dotNative(col("v"), col("q"))
          / (sqrt(graft.expressions.VectorExpressions
              .dotNative(col("v"), col("v")))
            * sqrt(graft.expressions.VectorExpressions
              .dotNative(col("q"), col("q"))))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = got.map(_.getLong(1)).toSet.intersect(exact).size.toDouble /
      exact.size
    // 3-of-10 probed labels + PQ-approximate stage 1: the floor pins the
    // two compensations keep the range slice retrievable
    recall should be >= 0.5
  }

  test("audit-free LSH serving probe: exactly ONE corpus-sized vectors " +
    "scan, rows equal the audited probe minus in_exact") {
    val audited = PersistedIndex.probeLshIndex(spark, lshDir)
    val serving = PersistedIndex.probeLshIndex(spark, lshDir,
      audit = false)
    serving.columns.toSeq shouldBe Seq("rank", "vec_id", "label", "sim")
    serving.collect().map(_.toSeq).toSeq shouldBe
      audited.drop("in_exact").collect().map(_.toSeq).toSeq
    // corpus-sized vectors scans (no POSITIVE vec_id equality pushed —
    // the verify scan legitimately carries an inferred
    // Not(EqualTo(vec_id, q)) from the candidate join): the audited
    // probe pays one for the brute-force audit and one for the
    // candidate verify; the serving probe pays ONLY the verify
    def corpusScans(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.explainString(FormattedMode)
      """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
        .findAllIn(plan).toList
        .count(b => b.contains("/vectors") &&
          !b.replace("Not(EqualTo(vec_id", "")
            .contains("EqualTo(vec_id"))
    }
    corpusScans(serving) shouldBe 1
    corpusScans(audited) shouldBe 2
  }

  test("audit-free FILTERED LSH probe matches the audited one minus " +
    "the audit column and scan") {
    val audited = PersistedIndex.probeLshIndexFiltered(spark, lshDir,
      filterLabel = 3)
    val serving = PersistedIndex.probeLshIndexFiltered(spark, lshDir,
      filterLabel = 3, audit = false)
    serving.columns.toSeq shouldBe Seq("rank", "vec_id", "label", "sim")
    serving.collect().map(_.toSeq).toSeq shouldBe
      audited.drop("in_exact").collect().map(_.toSeq).toSeq
  }

  /** Brute-force filtered-range top-k for query vec q — the per-query
    * ground truth of the batched filtered probe. */
  private def exactRangeIds(q: Long, lo: Long, hi: Long,
      k: Int): Set[Long] = {
    graft.expressions.VectorExpressions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val qv = e.filter(col("vec_id") === q).select(col("v").as("q"))
    e.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        (graft.expressions.VectorExpressions.dotNative(col("v"), col("q"))
          / (sqrt(graft.expressions.VectorExpressions
              .dotNative(col("v"), col("v")))
            * sqrt(graft.expressions.VectorExpressions
              .dotNative(col("q"), col("q"))))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .collect().map(_.getLong(0)).toSet
  }

  test("batched filtered IVF+PQ probe: the panel-union range rides the " +
    "shared stage-1 codes scan and each query honors its own range") {
    val out = PersistedIndex.probeIvfPqIndexFilteredBatch(spark, sf,
      ivfPqDir)
    val plan = out.queryExecution.explainString(FormattedMode)
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList
    val stage1 = scanBlocks.filter(b =>
      b.contains("/codes") && b.contains("codes:"))
    stage1 should not be empty
    withClue(s"no scan carries the union range:\n" +
      s"${stage1.mkString("\n")}\n") {
      stage1.exists(b => b.contains("GreaterThanOrEqual(vec_id,60)") &&
        b.contains("LessThan(vec_id,450)")) shouldBe true
    }
    val rows = out.collect()
    rows should not be empty
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val v = r.getAs[Long]("vec_id")
      v should be >= (60L + 30L * q)
      v should be < (240L + 30L * q)
    }
    // per-query recall vs the per-query FILTERED brute force: the
    // range-restricted IVFADC envelope (coarse cells + PQ error) is
    // 0.2-0.7 per query / ~0.5 average at sf0.001 — pin it like the
    // LSH bucket-collision floor so a prune/encode regression is caught
    val recalls = (0 until 8).map { q =>
      val got = rows.filter(_.getAs[Long]("q_id") == q)
        .map(_.getAs[Long]("vec_id")).toSet
      val exact = exactRangeIds(q, 60L + 30 * q, 240L + 30 * q, 10)
      val recall = exact.count(got).toDouble / exact.size
      withClue(s"q=$q got=$got exact=$exact") {
        recall should be >= 0.2
      }
      recall
    }
    (recalls.sum / recalls.size) should be >= 0.45
  }

  test("batched filtered LSH probe: the panel's label union rides the " +
    "verify scan's PushedFilters; each hit carries its query's label " +
    "and in_exact audits the per-query filtered brute force") {
    val out = PersistedIndex.probeLshIndexFilteredBatch(spark, lshDir)
    val plan = out.queryExecution.explainString(FormattedMode)
    plan should include("In(label, [")
    val rows = out.collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Int]("label").toLong shouldBe
        (r.getAs[Long]("q_id") * 3) % 10
    }
    // spot-audit one query's in_exact flags against the filtered brute
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val q0 = e.filter(col("vec_id") === 0L).select(col("v").as("q"))
    val exact0 = e
      .filter(col("label") === 0 && col("vec_id") >= 8L)
      .crossJoin(broadcast(q0))
      .select(col("vec_id"),
        (graft.expressions.VectorExpressions.dotNative(col("v"), col("q"))
          / (sqrt(graft.expressions.VectorExpressions
              .dotNative(col("v"), col("v")))
            * sqrt(graft.expressions.VectorExpressions
              .dotNative(col("q"), col("q"))))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
      .collect().map(_.getLong(0)).toSet
    rows.filter(_.getAs[Long]("q_id") == 0L).foreach { r =>
      r.getAs[Boolean]("in_exact") shouldBe
        exact0.contains(r.getAs[Long]("vec_id"))
    }
  }

  test("filtered probe == filter-after-probe NEVER holds structurally: " +
    "post-filtering the unfiltered top-k loses matches the pushed " +
    "predicate keeps") {
    // the reason the operator exists: filtering the unfiltered top-10
    // AFTER retrieval keeps only the few matching rows that happened to
    // rank; the pushed predicate ranks 10 matches. Demonstrate the gap.
    val l = 3
    val post = PersistedIndex.probeIvfIndexQ8(spark, sf, ivfDir)
      .join(spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("label") === l).select(col("vec_id")), "vec_id")
      .collect()
    val pushed = PersistedIndex
      .probeIvfIndexFiltered(spark, sf, ivfDir, filterLabel = l)
      .collect()
    pushed.length should be > post.length
  }
}
