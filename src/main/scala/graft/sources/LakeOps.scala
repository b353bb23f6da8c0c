package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake maintenance operators: small-file compaction and
  * schema-evolution reads — the two chores every long-lived
  * partitioned lake accumulates (streaming sinks and incremental
  * exports write a file per micro-batch per partition; producers add
  * columns over time).
  */
object LakeOps {

  /** Rewrite a partitioned parquet lake with consolidated files:
    * `filesPerPartition` output files per partition directory (further
    * split only by `maxRecordsPerFile`, the size backstop). Layout
    * changes; CONTENT must not — the compaction gate hash-checks the
    * compacted lake's aggregate against the pre-compaction oracle.
    *
    * Scale shape: one shuffle keyed on (partition columns [, salt]).
    * With `filesPerPartition` = 1 each partition directory is written
    * by one task — right for the common many-tiny-files case; raise it
    * for hot partitions so their write parallelism (and file count)
    * scales, with the salt drawn from a hash of the row so the split
    * is even and deterministic. Compacts to a NEW root: the swap is
    * the caller's atomic rename/repoint, never an in-place overwrite
    * that readers could observe half-done.
    */
  def compact(spark: SparkSession, src: String, dst: String,
      partitionCols: Seq[String], filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val df = spark.read.parquet(src)
    val repartitioned =
      if (filesPerPartition == 1) df.repartition(partitionCols.map(col): _*)
      else {
        // explicit numPartitions: AQE would otherwise coalesce the
        // salted shuffle into fewer tasks and collapse the salt's file
        // split (files per partition = distinct TASKS holding it)
        val keys = partitionCols.map(col) :+
          pmod(hash(struct(df.columns.map(col): _*)), lit(filesPerPartition))
        df.repartition(spark.sessionState.conf.numShufflePartitions, keys: _*)
      }
    repartitioned
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(dst)
  }

  /** Leaf parquet file count per partition directory — the
    * before/after measure of [[compact]]. */
  def parquetFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(dir))
  }

  /** Schema-evolution read: union the lake's batches by COLUMN NAME,
    * with columns absent from older batches read as nulls —
    * `mergeSchema` over the batch-partitioned layout. The reader is
    * where evolution must live at 100 TB: rewriting history to
    * back-fill a new column is a full-lake write, while merge-on-read
    * costs one footer per file at planning time.
    */
  def readEvolved(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(lakeDir)
}
