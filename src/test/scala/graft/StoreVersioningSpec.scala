package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.StoreVersioning

/** The shared version-discipline module's own contract — every persisted
  * store builds on exactly these behaviors, so they are pinned once here
  * (the per-store pinned-reader specs prove the composition).
  */
class StoreVersioningSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sv").toString

  test("versions are contiguous, latest resolves, empty store reads 0") {
    val dir = freshDir()
    StoreVersioning.latestVersion(spark, dir) shouldBe 0L
    StoreVersioning.listVersions(spark, dir) shouldBe Seq.empty
    (1 to 3).foreach { i =>
      val v = StoreVersioning.commitNextVersion(spark, dir) { staging =>
        Seq(i).toDF("x").write.parquet(staging)
      }
      v shouldBe i.toLong
    }
    StoreVersioning.listVersions(spark, dir) shouldBe Seq(1L, 2L, 3L)
    StoreVersioning.latestVersion(spark, dir) shouldBe 3L
  }

  test("a staged (uncommitted) write is invisible to version listing and " +
    "partition discovery") {
    val dir = freshDir()
    StoreVersioning.commitNextVersion(spark, dir) { staging =>
      Seq(1).toDF("x").write.parquet(staging)
    }
    // simulate a writer mid-commit: the staging dir exists on disk
    Seq(99).toDF("x").write.parquet(s"$dir/.staging-version-2")
    // readers see neither a new version nor extra rows — dot-prefixed
    // paths are hidden from Spark's file listing AND from the lister
    StoreVersioning.latestVersion(spark, dir) shouldBe 1L
    spark.read.parquet(dir).count() shouldBe 1L // one committed version
  }

  test("version-number collision is first-writer-wins: the second commit " +
    "fails loudly instead of overwriting") {
    val dir = freshDir()
    StoreVersioning.commitNextVersion(spark, dir) { staging =>
      Seq(1).toDF("x").write.parquet(staging)
    }
    val e = intercept[IllegalArgumentException] {
      StoreVersioning.commitNextVersion(spark, dir) { staging =>
        // a racing writer lands version 2 while WE are still staging —
        // i.e. after our latestVersion read, before our publish rename
        Seq(2).toDF("x").write.parquet(StoreVersioning.versionDir(dir, 2L))
        Seq(3).toDF("x").write.parquet(staging)
      }
    }
    e.getMessage should include("version 2")
    // the first writer's version 2 is intact
    spark.read.parquet(StoreVersioning.versionDir(dir, 2L))
      .as[Int].collect().toSeq shouldBe Seq(2)
  }

  test("prune keeps the current version and requireVersion fails fast " +
    "on pruned reads") {
    val dir = freshDir()
    (1 to 3).foreach { i =>
      StoreVersioning.commitNextVersion(spark, dir) { staging =>
        Seq(i).toDF("x").write.parquet(staging)
      }
    }
    StoreVersioning.pruneVersions(spark, dir, keep = 1)
    StoreVersioning.listVersions(spark, dir) shouldBe Seq(3L)
    StoreVersioning.versionExists(spark, dir, 1L) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      StoreVersioning.requireVersion(spark, dir, 1L)
    // keep < 1 still keeps the current version
    StoreVersioning.pruneVersions(spark, dir, keep = 0)
    StoreVersioning.listVersions(spark, dir) shouldBe Seq(3L)
  }

  test("commitTokens/liveTokens round-trip kinds and sort tokens") {
    val dir = freshDir()
    StoreVersioning.commitTokens(spark, dir,
      Seq(("seg", "d2"), ("seg", "base"), ("tomb", "t3")))
    val live = StoreVersioning.liveTokens(spark, dir)
    live("seg") shouldBe Seq("base", "d2")
    live("tomb") shouldBe Seq("t3")
    live.get("bloom") shouldBe None
  }

  test("a dead writer's leftover staging is cleared by the next commit") {
    val dir = freshDir()
    Seq(0).toDF("x").write.parquet(s"$dir/.staging-version-1")
    val v = StoreVersioning.commitNextVersion(spark, dir) { staging =>
      Seq(1).toDF("x").write.parquet(staging)
    }
    v shouldBe 1L
    spark.read.parquet(StoreVersioning.versionDir(dir, 1L))
      .as[Int].collect().toSeq shouldBe Seq(1)
  }

  test("a writer losing the publish race throws AND removes its staged " +
    "tree — no dot-prefixed copy leaks") {
    val dir = freshDir()
    StoreVersioning.commitNextVersion(spark, dir) { st =>
      Seq(1).toDF("x").write.parquet(st)
    }
    val fs = StoreVersioning.fs(spark, dir)
    // simulate the race: version 2 lands between our latestVersion read
    // and our publish — commitNextVersion's write callback runs FIRST,
    // so publish version 2 from inside the callback
    val ex = intercept[IllegalArgumentException] {
      StoreVersioning.commitNextVersion(spark, dir) { st =>
        Seq(2).toDF("x").write.parquet(st)
        fs.mkdirs(new org.apache.hadoop.fs.Path(
          StoreVersioning.versionDir(dir, 2L)))
      }
    }
    ex.getMessage should include("concurrent writer")
    // the loser's staging tree is gone — later commits only ever clear
    // THEIR OWN staging name, so a leak here would live forever
    fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/.staging-version-2")) shouldBe false
  }

  test("gcSegments drops only segments no surviving version references; " +
    "the surviving store still probes") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-gc").toString
    graft.operators.PersistedIndex.buildIvfPqIndex(spark, sf, dir)
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 1)
      .select(org.apache.spark.sql.functions.lit(66666L).as("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.col("embedding"))
    graft.operators.PersistedIndex.appendToIvfPqIndex(spark, delta, dir)
    val fs = StoreVersioning.fs(spark, dir)
    def segs: Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/codes"))
        .map(_.getPath.getName).toSet
    segs shouldBe Set("ingest=base", "ingest=d2")
    // while BOTH versions survive, gc drops nothing (v1 references base)
    graft.operators.PersistedIndex.gcIvfPqSegments(spark, dir)
    segs shouldBe Set("ingest=base", "ingest=d2")
    // prune to the latest version only; base stays referenced by v2 too
    // (appends accumulate tokens), so gc still keeps both — no dangling
    StoreVersioning.pruneVersions(spark, s"$dir/manifest", keep = 1)
    graft.operators.PersistedIndex.gcIvfPqSegments(spark, dir)
    segs shouldBe Set("ingest=base", "ingest=d2")
    // a retention re-commit that references d2 alone, pruned to it,
    // finally strands base — gc removes exactly that segment
    StoreVersioning.commitTokens(spark, s"$dir/manifest",
      Seq(("seg", "d2")))
    StoreVersioning.pruneVersions(spark, s"$dir/manifest", keep = 1)
    graft.operators.PersistedIndex.gcIvfPqSegments(spark, dir)
    segs shouldBe Set("ingest=d2")
    // the surviving store holds exactly the appended segment's row, and
    // a probe against it still executes without error (its result may be
    // empty — the clone's cluster need not be among the probed ones)
    spark.read.parquet(s"$dir/codes")
      .select(org.apache.spark.sql.functions.col("vec_id"))
      .collect().map(_.getLong(0)).toSet shouldBe Set(66666L)
    noException should be thrownBy graft.operators.PersistedIndex
      .probeIvfPqIndex(spark, sf, dir).collect()
  }
}
