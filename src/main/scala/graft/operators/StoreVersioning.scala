package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared version discipline for every persisted store in the engine —
  * the curation store's `manifest/version=N` contract
  * ([[CurationStore.readManifest]]) lifted into one module so the text
  * index and the kNN-graph store fold under the same rules:
  *
  *   - a version directory (`<dir>/version=N/`) is IMMUTABLE once
  *     published — writers stage under a dot-prefixed directory (hidden
  *     from Spark's file listing) and publish with one filesystem
  *     rename, so a concurrent reader either sees the whole version or
  *     none of it, never a torn tree;
  *   - readers pin a version at query start ([[latestVersion]]) and are
  *     never blocked or invalidated by a writer landing version N+1
  *     (snapshot isolation on plain parquet — the lakehouse discipline
  *     without a table format);
  *   - [[pruneVersions]] is the retention lever; the CURRENT version is
  *     never dropped, and [[requireVersion]] turns a read of a pruned or
  *     never-written version into an error instead of a silently-empty
  *     frame.
  *
  * Every filesystem touch resolves the store path's OWN filesystem
  * (`Path.getFileSystem`), never the cluster default — a store on
  * `s3a://` keeps versioning correctly on an HDFS-default cluster.
  */
object StoreVersioning {

  /** The filesystem owning `dir` — resolved from the path's scheme, not
    * `fs.defaultFS`. */
  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versionDir(dir: String, v: Long): String = s"$dir/version=$v"

  /** Every published version under `dir`, ascending; empty when the
    * store has never committed (bounded driver-side listing — one
    * directory of version names). */
  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName).toSeq
      .filter(_.startsWith("version="))
      .map(_.stripPrefix("version=").toLong).sorted
  }

  /** Highest published version at `dir`, or 0 when none exist. */
  def latestVersion(spark: SparkSession, dir: String): Long =
    listVersions(spark, dir).foldLeft(0L)(math.max)

  def versionExists(spark: SparkSession, dir: String, v: Long): Boolean =
    fs(spark, dir).exists(new Path(versionDir(dir, v)))

  /** Fail fast on a read of a pruned or never-written version — the
    * alternative is a silently-empty scan that makes e.g. a version
    * diff look like "everything was added". */
  def requireVersion(spark: SparkSession, dir: String, v: Long): Unit =
    require(versionExists(spark, dir, v),
      s"version $v does not exist under $dir (pruned or never written); " +
        s"published versions: ${listVersions(spark, dir).mkString(", ")}")

  /** Publish the next version: `write` receives a dot-prefixed staging
    * path (invisible to Spark's partition discovery), and the staged
    * tree is renamed into `version=<n+1>` in one filesystem call —
    * readers never observe a partial version. Returns the published
    * version number.
    */
  def commitNextVersion(spark: SparkSession, dir: String)(
      write: String => Unit): Long = {
    val next = latestVersion(spark, dir) + 1
    val stagingName = s".staging-version-$next"
    val staging = s"$dir/$stagingName"
    val f = fs(spark, dir)
    f.delete(new Path(staging), true) // clear a dead writer's leftovers
    write(staging)
    val dest = new Path(versionDir(dir, next))
    // optimistic concurrency, first-writer-wins: if a racing writer
    // published this version while we staged, fail LOUDLY. The explicit
    // existence check matters because a local-filesystem rename onto an
    // existing directory silently moves the staging tree INSIDE it
    // (posix mv-into semantics) instead of refusing like HDFS.
    if (f.exists(dest)) {
      // lost the race — drop our staged tree before throwing, or the
      // dot-prefixed copy (a full segment-sized tree) leaks forever:
      // later commits compute next >= N+1 and only clear THEIR staging
      f.delete(new Path(staging), true)
      throw new IllegalArgumentException(
        s"failed to publish $dir version $next: a concurrent writer " +
          "already committed it (re-read latestVersion and retry)")
    }
    require(f.rename(new Path(staging), dest),
      s"failed to publish $dir version $next (staging rename refused)")
    // post-rename sanity against the residual check-then-rename window:
    // a mv-into leaves the staging name nested under the destination
    val nested = new Path(s"${versionDir(dir, next)}/$stagingName")
    if (f.exists(nested)) {
      f.delete(nested, true)
      throw new IllegalArgumentException(
        s"failed to publish $dir version $next: lost the publish race " +
          "to a concurrent writer (nested staging removed; retry)")
    }
    next
  }

  /** Drop versions older than the `keep` most recent. The current
    * version is never dropped. */
  def pruneVersions(spark: SparkSession, dir: String, keep: Int): Unit = {
    val f = fs(spark, dir)
    listVersions(spark, dir).dropRight(math.max(keep, 1)).foreach { v =>
      f.delete(new Path(versionDir(dir, v)), true)
    }
  }

  /** The common manifest shape for segment stores whose versions are a
    * flat list of (kind, token) rows — which immutable `ingest=<token>`
    * segments (and kind-specific artifacts) a version reads. Publish
    * with [[commitTokens]], resolve with [[liveTokens]].
    */
  def commitTokens(spark: SparkSession, manifestDir: String,
      rows: Seq[(String, String)]): Long =
    commitNextVersion(spark, manifestDir) { staging =>
      import spark.implicits._
      rows.toDF("kind", "token").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staging)
    }

  /** Drop `ingest=<token>` segment directories referenced by NO
    * surviving manifest version — the retention pass run after
    * [[pruneVersions]] (which drops version dirs but must leave
    * segments alone: older surviving versions may still reference
    * them). Bounded: one manifest read per surviving version plus one
    * directory listing per sub-store.
    */
  def gcSegments(spark: SparkSession, path: String, subDirs: Seq[String],
      kind: String = "seg"): Unit = {
    val dir = s"$path/manifest"
    val referenced = listVersions(spark, dir)
      .flatMap(v => liveTokens(spark, dir, v).getOrElse(kind, Seq.empty))
      .toSet
    gcUnreferenced(spark, path, referenced, subDirs)
  }

  /** The deletion half of [[gcSegments]] for stores whose referenced-token
    * set needs a CUSTOM computation (multi-kind manifests, cluster→segment
    * maps): drop every `<prefix><token>` directory under each sub-store
    * whose token is not in `referenced`. One listing per sub-store. */
  def gcUnreferenced(spark: SparkSession, path: String,
      referenced: Set[String], subDirs: Seq[String],
      prefix: String = "ingest="): Unit = {
    val f = fs(spark, path)
    subDirs.foreach { sub =>
      val p = new Path(s"$path/$sub")
      if (f.exists(p))
        f.listStatus(p).map(_.getPath.getName).toSeq
          .filter(_.startsWith(prefix))
          .map(_.stripPrefix(prefix))
          .filterNot(referenced)
          .foreach(t => f.delete(new Path(s"$path/$sub/$prefix$t"), true))
    }
  }

  /** One sub-store family inside a persisted store's layout: which
    * segment directories it owns (`<path>/<subDir>/<prefix><token>`) and
    * how to compute the tokens a given manifest VERSION references —
    * the shape [[retain]] needs to sweep any store under one policy. */
  final case class SubStore(subDirs: Seq[String], prefix: String,
      referenced: (SparkSession, String, Long) => Set[String])

  /** A persisted store's full segment layout. Stores whose versions ARE
    * the data (the curation manifest) have no sub-stores — retention is
    * pure version pruning for them. */
  final case class StoreLayout(subStores: Seq[SubStore])

  /** The common referenced-token computation: one `kind`'s tokens from
    * the shared (kind, token) manifest dialect. */
  def kindTokens(kind: String): (SparkSession, String, Long) => Set[String] =
    (spark, path, v) =>
      liveTokens(spark, s"$path/manifest", v).getOrElse(kind, Seq.empty).toSet

  /** The gc half of [[retain]]: drop segment directories referenced by
    * NO surviving manifest version — the per-store `gcXxxSegments`
    * entry points all delegate here with their store's layout. */
  def gcLayout(spark: SparkSession, path: String,
      layout: StoreLayout): Unit = {
    val versions = listVersions(spark, s"$path/manifest")
    layout.subStores.foreach { ss =>
      val referenced =
        versions.flatMap(v => ss.referenced(spark, path, v)).toSet
      gcUnreferenced(spark, path, referenced, ss.subDirs, ss.prefix)
    }
  }

  /** ONE retention policy for every persisted store (the round-13
    * unification of gcTextIndexSegments / gcLshSegments / gcSegments /
    * pruneManifestVersions): keep the `keep` most recent manifest
    * versions, then drop every segment directory no surviving version
    * references. The CURRENT version is never dropped; a pinned reader
    * of a SURVIVING version keeps every segment it needs, because
    * reference sets are computed across all survivors, not just the
    * head. */
  def retain(spark: SparkSession, path: String, keep: Int,
      layout: StoreLayout): Unit = {
    pruneVersions(spark, s"$path/manifest", keep)
    gcLayout(spark, path, layout)
  }

  /** (kind → tokens) of `version` (latest when -1) — bounded driver-side
    * read, one row per segment. */
  def liveTokens(spark: SparkSession, manifestDir: String,
      version: Long = -1L): Map[String, Seq[String]] = {
    val v = if (version > 0) version else latestVersion(spark, manifestDir)
    requireVersion(spark, manifestDir, v)
    val df = spark.read.parquet(versionDir(manifestDir, v))
    // loud dialect check: a manifest written by a pre-(kind, token) build
    // (the LSH store's bespoke 1-column token schema before round 12)
    // would otherwise be read positionally as kind=<token> rows and
    // resolve to a silently-EMPTY live set — probes would scan zero
    // segments instead of failing. Stores are session-temp today, but
    // the failure mode is too quiet to leave unpinned.
    // column SET check (order-insensitive): a manifest written with the
    // columns in another order is semantically valid — the positional
    // reads below go through a by-name select. The loud dialect check
    // stays for genuinely foreign schemas (the pre-(kind, token) LSH
    // store's 1-column layout would otherwise resolve to a silently
    // EMPTY live set and probes would scan zero segments).
    require(df.columns.toSet == Set("kind", "token"),
      s"manifest $manifestDir version $v has columns " +
        s"${df.columns.mkString("(", ", ", ")")}; expected (kind, token) " +
        "— a store persisted by a pre-(kind, token) build must be rebuilt")
    df.select("kind", "token").collect().toSeq
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).sorted).toMap
  }
}
