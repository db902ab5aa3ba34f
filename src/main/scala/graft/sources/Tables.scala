package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver-generated test tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so every query keeps full Catalyst pushdown:
  * column pruning + predicate pushdown reach the parquet scan (verify with
  * `.explain("formatted")` — PushedFilters / ReadSchema). At cluster scale the
  * same call reads a partitioned directory tree; nothing here assumes a single
  * file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Conf every session touching `events.parquet` needs: its `ts` column is
    * parquet TIMESTAMP(NANOS), which Spark has no native type for. Session
    * builders (Verify/Bench/tests) call this once at startup; [[events]]
    * re-asserts it only when absent so a driver-owned session still works.
    */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** We read nanos as long (legacy conf) and convert to a micros timestamp —
    * lossless here (the generator emits micro-precision values) and cheap
    * (one codegen'd integer divide per row).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    val raw = load(spark, sfDir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** SQL surface: register every table as a temp view (events with its
    * timestamp conversion applied) and the native graft functions, so
    * `spark.sql("SELECT graft_simhash32(text) FROM documents")` is a full
    * user entry point — views stay lazy scans, so pruning/pushdown are
    * identical to the DataFrame route.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    graft.expressions.VectorExpressions.register(spark)
    names.foreach {
      case "events" => events(spark, sfDir).createOrReplaceTempView("events")
      case n => load(spark, sfDir, n).createOrReplaceTempView(n)
    }
  }
}
