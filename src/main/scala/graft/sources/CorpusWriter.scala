package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Write side of the engine: corpus layouts that make the NEXT job cheap.
  *
  * Two shapes cover the 100 TB cases:
  *
  *  - [[writePartitioned]] — hive-style directory partitioning for coarse,
  *    low-cardinality keys (split, lang, date). Readers prune whole
  *    directories; the pre-write `repartition` on the partition columns
  *    means each output directory is written by the tasks that own its
  *    rows instead of every task spraying a small file into every
  *    directory (the classic small-files failure), and
  *    `sortWithinPartitions` gives parquet min/max row-group statistics
  *    readers can skip on.
  *
  *  - [[writeBucketed]] — hash bucketing on a join/dedup key. Two tables
  *    bucketed the same way join with ZERO exchanges (asserted in
  *    CorpusWriterSpec): at 100 TB this converts the recurring
  *    shuffle-per-join of a hot key (doc_id, custkey) into a one-time
  *    layout cost.
  */
object CorpusWriter {

  /** Directory-partitioned parquet, one coherent file set per partition
    * value combination, rows sorted by `sortCol` within files.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCol: String): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Hash-bucketed, per-bucket-sorted external parquet table registered in
    * the session catalog (bucketed reads require catalog metadata — plain
    * `spark.read.parquet` cannot see bucket layout).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
