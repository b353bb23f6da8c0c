package graft.streaming

import graft.sources.VersionedLake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate: a SUM/COUNT
  * group-by over a versioned lake, kept current by folding the
  * [[ChangeFeed]] instead of recomputing — the lakehouse
  * "incremental materialized view" pattern, built from this engine's
  * own parts (CDC diffs in, OCC-committed merge out).
  *
  * Maintenance math: inserts add (+value, +1), deletes subtract
  * (−value, −1) — SUM and COUNT are self-inverting under the
  * delete+insert CDC decomposition, so an update's two rows cancel to
  * the net effect. A group whose maintained count reaches zero is
  * deleted from the view (no ghost rows).
  *
  * The VIEW is itself a versioned lake: every maintenance tick commits
  * one version, so the aggregate has time travel, metadata row counts,
  * and CDC of its own for downstream consumers.
  *
  * Scale shape, per tick:
  *  - the delta aggregate runs over the change batch (churn-sized, the
  *    ChangeFeed guarantee — untouched partitions contribute zero I/O);
  *  - the view read is pruned to the PARTITIONS the delta touches
  *    (manifest-level, before any scan);
  *  - the merge commit rewrites only those partitions.
  * State: the feed watermark file; nothing data-sized on the driver
  * (the touched-partition value list is group-cardinality-bounded,
  * the same metadata class as mergeUpsert's own planning).
  *
  * Delivery: inherits the feed's at-least-once watermark. A crash
  * between the view commit and the watermark advance re-delivers one
  * version's diff; re-folding it would double-count, so the view
  * records the last-folded source version as a batch id in ITS commit
  * (`committedBatchId`) and the handler skips versions at or below
  * it — the same replay guard the streaming sink uses, making the
  * fold exactly-once end to end.
  */
object MaterializedAgg {

  /** Fold every unseen source version into the view; returns versions
    * processed. `groupCols` must include `partitionCol` (the view's
    * layout key). Columns of the view: groupCols..., agg_sum,
    * agg_count. */
  def maintain(spark: SparkSession, srcLake: String, stateDir: String,
      viewLake: String, groupCols: Seq[String], valueCol: String,
      partitionCol: String): Int = {
    require(groupCols.contains(partitionCol),
      s"partitionCol '$partitionCol' must be one of groupCols $groupCols")
    ChangeFeed.processAvailable(spark, srcLake, stateDir) { (changes, _, toV) =>
      // replay guard: the view's own batch-id header records the last
      // source version folded in — a re-delivered diff is skipped
      if (toV > VersionedLake.committedBatchId(viewLake)) {
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val delta = changes.groupBy(groupCols.map(col): _*)
          .agg(sum(sign * col(valueCol)).as("d_sum"),
            sum(sign).as("d_cnt"))
        val rows =
          if (VersionedLake.currentVersion(viewLake) == 0) {
            delta.select(groupCols.map(col) :+
              col("d_sum").as("agg_sum") :+ col("d_cnt").as("agg_count"): _*)
              .withColumn("_deleted", col("agg_count") <= 0)
          } else {
            // read ONLY the view partitions the delta touches
            val touched = delta.select(col(partitionCol).cast("string"))
              .distinct().collect().map(_.getString(0)).toSeq
            val current = VersionedLake.read(spark, viewLake,
              partitions = Some(touched))
            // lit(0) (int) coerces to the value column's own type —
            // an integer-typed measure stays integer-exact through
            // the incremental folds (what lets a hash gate compare
            // the maintained view against a one-shot batch sum)
            current.join(delta, groupCols, "full")
              .select(groupCols.map(col) :+
                (coalesce(col("agg_sum"), lit(0)) +
                  coalesce(col("d_sum"), lit(0))).as("agg_sum") :+
                (coalesce(col("agg_count"), lit(0L)) +
                  coalesce(col("d_cnt"), lit(0L))).as("agg_count"): _*)
              .withColumn("_deleted", col("agg_count") <= 0)
          }
        if (VersionedLake.currentVersion(viewLake) == 0) {
          val keep = rows.filter(!col("_deleted")).drop("_deleted")
          if (!keep.isEmpty)
            VersionedLake.create(keep, viewLake, partitionCol,
              batchId = Some(toV.toLong))
        } else {
          // the folded source version rides the merge commit itself as
          // its batch id — replay detection atomic with visibility
          VersionedLake.mergeUpsert(spark, viewLake, rows, groupCols,
            partitionCol, batchId = Some(toV.toLong))
        }
      }
    }
  }
}
