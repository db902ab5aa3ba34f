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
}
