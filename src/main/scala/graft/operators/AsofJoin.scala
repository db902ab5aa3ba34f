package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (most-recent-prior) join — an operator Spark SQL lacks natively
  * (SURVEY preference order (a): composed from existing ops, no custom
  * physical plan needed).
  *
  * For each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key. Implementation: union the two
  * sides tagged, sort per key by (ts, side-tag), and carry the right value
  * forward with `last_value(..., ignoreNulls)` — one shuffle on the key,
  * one sort, no join product at all. That union-scan shape is exactly what
  * scales: at 100 TB both sides hash-partition by key once and each
  * partition is a single merge pass (no per-row probe, no range explosion).
  * Right rows at ts == left ts sort BEFORE the left row (tag order), so
  * exact ties match — the same inclusive semantics as DuckDB's ASOF JOIN,
  * which the oracle uses.
  */
object AsofJoin {

  /** Generic as-of join.
    *
    * @param left      probe side
    * @param right     reference side (its `valueCols` get attached)
    * @param keyCols   equi-key columns (same names both sides)
    * @param tsCol     event-time column name (same both sides)
    * @param valueCols right-side columns to carry (renamed as given)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // align schemas: right side gets nulls for the left-only columns
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // tertiary sort on the carried values: with duplicate right rows on
    // the same (key, ts), `last(ignoreNulls)` would otherwise pick an
    // unspecified one. Ordering the ties by value makes OUR pick total
    // (the greatest value tuple); note other engines' ASOF joins choose
    // their own arbitrary tie row, so cross-engine equality on
    // duplicate-(key, ts) right data is not guaranteed by any engine.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(col(tsCol).asc, col("__side").asc) ++
        valueCols.map(c => col(s"__v_$c").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(rAligned)
      .select((Seq(col("*")) ++ valueCols.map(c =>
        last(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"__asof_$c"))): _*)
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** FORWARD as-of join — for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same key (pandas merge_asof
    * direction='forward'; the "what happened next" probe). Same
    * union-scan shape as [[asof]], mirrored: left rows tag 0 so an
    * equal-ts right row sorts at-or-after and the
    * `first(..., ignoreNulls)` over [current, following) frame matches
    * inclusively. One shuffle on the key, no join product.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(0))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(tsCol) :+ lit(1).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // same duplicate-(key, ts) tie-break as [[asof]], mirrored: `first`
    // over the forward frame picks the LEAST value tuple among ties.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(col(tsCol).asc, col("__side").asc) ++
        valueCols.map(c => col(s"__v_$c").asc)): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = l.unionByName(rAligned)
      .select((Seq(col("*")) ++ valueCols.map(c =>
        first(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"__asof_$c"))): _*)
    filled.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** Query entry: every `click` joined to the next purchase value at or
    * after it for the same user — [[clicksAsofPurchases]]' forward twin.
    */
  def clicksNextPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    asofForward(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_purchase_value").as("next_purchase_value"))
      .orderBy("event_id")
  }

  /** Query entry: every `click` event joined to the most recent prior
    * `purchase` value for the same user (events table; user_id is the key).
    */
  def clicksAsofPurchases(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    asof(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_purchase_value"))
      .orderBy("event_id")
  }
}
