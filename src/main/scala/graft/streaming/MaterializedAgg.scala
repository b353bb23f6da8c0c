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

  /** A [[graft.sources.VersionedLake.streamingCommit]] `postCommit`
    * hook that keeps the view current from inside the stream itself —
    * no external maintenance tick. Each micro-batch commit drains the
    * change feed up to the version it just produced (plus any
    * interleaved out-of-band commits, which the feed delivers in
    * order). streamingCommit wraps the hook in NonFatal, so a
    * maintenance failure defers to the next tick and never fails the
    * data batch; the view's own batch-id replay guard keeps the fold
    * exactly-once across restarts and re-deliveries. */
  def maintainHook(srcLake: String, stateDir: String, viewLake: String,
      groupCols: Seq[String], valueCol: String, partitionCol: String,
      minMaxCols: Seq[String] = Nil,
      srcPartitionCol: Option[String] = None): (SparkSession, Long) => Unit =
    (spark, _) => {
      maintain(spark, srcLake, stateDir, viewLake, groupCols, valueCol,
        partitionCol, minMaxCols, srcPartitionCol)
      ()
    }

  /** Fold every unseen source version into the view; returns versions
    * processed. `groupCols` must include `partitionCol` (the view's
    * layout key). Columns of the view: groupCols..., agg_sum,
    * agg_count, and for each c in `minMaxCols` a min_c and max_c.
    *
    * MIN/MAX are NOT invertible under deletes (removing the current
    * minimum says nothing about the runner-up), so they maintain by
    * case split per group and batch:
    *  - insert-only groups FOLD: new min = least(old, batch-insert
    *    min), new max = greatest(old, batch-insert max) — no source
    *    I/O;
    *  - groups any delete touches RE-AGGREGATE from the source lake
    *    at the version this batch corresponds to, read pruned to just
    *    those groups' partitions and semi-joined to just those group
    *    keys (group-cardinality-bounded broadcast) — the touched-group
    *    re-read every incremental-view engine does for non-invertible
    *    measures, never a full recompute.
    * The re-aggregate reads source version `toV` exactly, so the fold
    * stays correct even when later source versions have already
    * committed by the time this batch is processed. */
  def maintain(spark: SparkSession, srcLake: String, stateDir: String,
      viewLake: String, groupCols: Seq[String], valueCol: String,
      partitionCol: String, minMaxCols: Seq[String] = Nil,
      srcPartitionCol: Option[String] = None): Int = {
    require(groupCols.contains(partitionCol),
      s"partitionCol '$partitionCol' must be one of groupCols $groupCols")
    // `partitionCol` is the VIEW's layout key; the SOURCE lake may be
    // laid out differently. The touched-group re-read can prune source
    // partitions only when the source's own partition column is a
    // group key — declared via srcPartitionCol; otherwise the re-read
    // plans over the full manifest and prunes rows via the group-key
    // broadcast join (still file-skippable by recorded stats).
    srcPartitionCol.foreach(c => require(groupCols.contains(c),
      s"srcPartitionCol '$c' must be one of groupCols $groupCols"))
    ChangeFeed.processAvailable(spark, srcLake, stateDir) { (changes, _, toV) =>
      // replay guard: the view's own batch-id header records the last
      // source version folded in — a re-delivered diff is skipped
      if (toV > VersionedLake.committedBatchId(viewLake)) {
        val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
        val isIns = col("_change") === "insert"
        val deltaAggs: Seq[org.apache.spark.sql.Column] = Seq(
          sum(sign * col(valueCol)).as("d_sum"),
          sum(sign).as("d_cnt"),
          max(when(!isIns, lit(1)).otherwise(lit(0))).as("d_del")) ++
          minMaxCols.flatMap(c => Seq(
            min(when(isIns, col(c))).as(s"_ins_min_$c"),
            max(when(isIns, col(c))).as(s"_ins_max_$c")))
        val delta = changes.groupBy(groupCols.map(col): _*)
          .agg(deltaAggs.head, deltaAggs.tail: _*)

        // touched-group re-aggregation for the non-invertible measures
        val recomputed: Option[org.apache.spark.sql.DataFrame] =
          if (minMaxCols.isEmpty) None
          else {
            val delKeys = delta.filter(col("d_del") === 1)
              .select(groupCols.map(col): _*).distinct()
            val anyDeletes = !delKeys.isEmpty
            val reAggs = minMaxCols.flatMap(c => Seq(
              min(col(c)).as(s"_re_min_$c"), max(col(c)).as(s"_re_max_$c")))
            if (!anyDeletes)
              // no delete this batch: empty frame with the right shape
              // keeps the fold expressions resolvable, reads nothing
              Some(delta.limit(0).select(groupCols.map(col): _*)
                .select(groupCols.map(col) ++ minMaxCols.flatMap(c => Seq(
                  lit(null).as(s"_re_min_$c"), lit(null).as(s"_re_max_$c"))): _*))
            else {
              val srcParts = srcPartitionCol.map { c =>
                delKeys.select(col(c).cast("string"))
                  .distinct().collect().map(_.getString(0)).toSeq
              }
              val src = VersionedLake.read(spark, srcLake,
                version = Some(toV), partitions = srcParts)
              Some(src.join(broadcast(delKeys), groupCols)
                .groupBy(groupCols.map(col): _*)
                .agg(reAggs.head, reAggs.tail: _*))
            }
          }

        val viewV = VersionedLake.currentVersion(viewLake)
        val viewNullCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
          ("agg_sum" -> delta.schema("d_sum").dataType) ::
            ("agg_count" -> org.apache.spark.sql.types.LongType) ::
            minMaxCols.flatMap(c => Seq(
              s"min_$c" -> delta.schema(s"_ins_min_$c").dataType,
              s"max_$c" -> delta.schema(s"_ins_max_$c").dataType)).toList
        val merged0 =
          if (viewV == 0)
            // bootstrap: same fold expressions over typed-null view
            // columns (coalesce/least absorb them)
            viewNullCols.foldLeft(delta) { case (d, (c, t)) =>
              d.withColumn(c, lit(null).cast(t))
            }
          else {
            // read ONLY the view partitions the delta touches
            val touched = delta.select(col(partitionCol).cast("string"))
              .distinct().collect().map(_.getString(0)).toSeq
            VersionedLake.read(spark, viewLake, partitions = Some(touched))
              .join(delta, groupCols, "full")
          }
        val base = recomputed.fold(merged0)(r => merged0.join(r, groupCols, "left"))
        // lit(0) (int) coerces to the value column's own type — an
        // integer-typed measure stays integer-exact through the
        // incremental folds (what lets a hash gate compare the
        // maintained view against a one-shot batch sum). least/
        // greatest skip nulls, so a new group takes the batch min and
        // an untouched measure keeps the old one.
        val outCols: Seq[org.apache.spark.sql.Column] =
          groupCols.map(col) ++ Seq(
            (coalesce(col("agg_sum"), lit(0)) +
              coalesce(col("d_sum"), lit(0))).as("agg_sum"),
            (coalesce(col("agg_count"), lit(0L)) +
              coalesce(col("d_cnt"), lit(0L))).as("agg_count")) ++
            minMaxCols.flatMap(c => Seq(
              when(col("d_del") === 1, col(s"_re_min_$c"))
                .otherwise(least(col(s"min_$c"), col(s"_ins_min_$c")))
                .as(s"min_$c"),
              when(col("d_del") === 1, col(s"_re_max_$c"))
                .otherwise(greatest(col(s"max_$c"), col(s"_ins_max_$c")))
                .as(s"max_$c")))
        val rows = base.select(outCols: _*)
          .withColumn("_deleted", col("agg_count") <= 0)
        if (viewV == 0) {
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
