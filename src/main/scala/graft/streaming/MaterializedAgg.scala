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
      srcPartitionCol: Option[String] = None,
      hllCol: Option[String] = None, hllP: Int = 10): (SparkSession, Long) => Unit =
    (spark, _) => {
      maintain(spark, srcLake, stateDir, viewLake, groupCols, valueCol,
        partitionCol, minMaxCols, srcPartitionCol, hllCol, hllP)
      ()
    }

  /** The view's maintained register column for [[maintain]]'s
    * `hllCol`: a dense length-2^p int array, 0 = empty bucket. */
  val HllRegsCol = "hll_regs"

  /** HLL distinct estimate from the maintained register column —
    * [[graft.operators.Sketch]]'s estimator arithmetic verbatim
    * (BIGINT-scaled harmonic sum, one final double division), so a
    * view's estimate hash-matches a one-shot [[Sketch.hllDistinct]]
    * over the same rows. */
  def hllEstimate(regs: org.apache.spark.sql.Column,
      p: Int): org.apache.spark.sql.Column = {
    val m = 1L << p
    val present = filter(regs, r => r > 0)
    val sPresent = aggregate(present, lit(0L),
      (acc, r) => acc + pow(lit(2.0), lit(53) - r).cast("long"))
    val sTotal = sPresent + (lit(m) - size(present).cast("long")) * lit(1L << 53)
    graft.functions.Arith.r2(
      lit(graft.operators.Sketch.hllNumerator(p)) / sTotal.cast("double"))
  }

  /** Fold every unseen source version into the view; returns versions
    * processed. `groupCols` must include `partitionCol` (the view's
    * layout key). Columns of the view: groupCols..., agg_sum,
    * agg_count, for each c in `minMaxCols` a min_c and max_c, and —
    * when `hllCol` is set — [[HllRegsCol]], a maintained per-group
    * HLL register array (precision `hllP`) answering APPROX COUNT
    * DISTINCT of that column via [[hllEstimate]]: the canonical
    * distinct-users-per-day view no SUM/COUNT family can serve.
    * Inserts fold by element-wise register max (registers are
    * mergeable — no source I/O); deletes re-read the touched groups,
    * riding the same machinery as min/max.
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
      srcPartitionCol: Option[String] = None,
      hllCol: Option[String] = None, hllP: Int = 10): Int = {
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

        // HLL register state for the distinct column: a dense 2^p int
        // array per group. Inserts MERGE by element-wise register max
        // (HLL's defining property); deletes are NOT invertible (a
        // removed key says nothing about the register's runner-up), so
        // delete-touched groups re-read — the same case split as
        // min/max below, sharing its touched-group machinery.
        val m = 1 << hllP
        def regsOf(df: org.apache.spark.sql.DataFrame, out: String) =
          hllCol.map { c =>
            val (b, r) = graft.operators.Sketch.hllCols(
              col(c).cast("string"), hllP)
            df.select(groupCols.map(col) :+ b.as("_hb") :+ r.as("_hr"): _*)
              .groupBy(groupCols.map(col) :+ col("_hb"): _*)
              .agg(max(col("_hr")).as("_hm"))
              .groupBy(groupCols.map(col): _*)
              .agg(map_from_entries(
                collect_list(struct(col("_hb"), col("_hm")))).as("_hmap"))
              .select(groupCols.map(col) :+
                transform(sequence(lit(0), lit(m - 1)),
                  i => coalesce(element_at(col("_hmap"), i), lit(0))).as(out): _*)
          }
        val insRegs = regsOf(changes.filter(isIns), "_ins_regs")

        // touched-group re-aggregation for the non-invertible measures
        val nonInvertible = minMaxCols.nonEmpty || hllCol.isDefined
        val (recomputed, reRegs): (Option[org.apache.spark.sql.DataFrame],
            Option[org.apache.spark.sql.DataFrame]) =
          if (!nonInvertible) (None, None)
          else {
            val delKeys = delta.filter(col("d_del") === 1)
              .select(groupCols.map(col): _*).distinct()
            val anyDeletes = !delKeys.isEmpty
            if (!anyDeletes) {
              // no delete this batch: empty frames with the right shape
              // keep the fold expressions resolvable, read nothing
              val emptyMm =
                if (minMaxCols.isEmpty) None
                else Some(delta.limit(0).select(groupCols.map(col): _*)
                  .select(groupCols.map(col) ++ minMaxCols.flatMap(c => Seq(
                    lit(null).as(s"_re_min_$c"), lit(null).as(s"_re_max_$c"))): _*))
              val emptyRegs = hllCol.map(_ =>
                delta.limit(0).select(groupCols.map(col) :+
                  lit(null).cast(s"array<int>").as("_re_regs"): _*))
              (emptyMm, emptyRegs)
            } else {
              val srcParts = srcPartitionCol.map { c =>
                delKeys.select(col(c).cast("string"))
                  .distinct().collect().map(_.getString(0)).toSeq
              }
              val src = VersionedLake.read(spark, srcLake,
                version = Some(toV), partitions = srcParts)
              val touched = src.join(broadcast(delKeys), groupCols)
              val mm =
                if (minMaxCols.isEmpty) None
                else {
                  val reAggs = minMaxCols.flatMap(c => Seq(
                    min(col(c)).as(s"_re_min_$c"), max(col(c)).as(s"_re_max_$c")))
                  Some(touched.groupBy(groupCols.map(col): _*)
                    .agg(reAggs.head, reAggs.tail: _*))
                }
              (mm, regsOf(touched, "_re_regs"))
            }
          }

        val viewV = VersionedLake.currentVersion(viewLake)
        val viewNullCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
          ("agg_sum" -> delta.schema("d_sum").dataType) ::
            ("agg_count" -> org.apache.spark.sql.types.LongType) ::
            (minMaxCols.flatMap(c => Seq(
              s"min_$c" -> delta.schema(s"_ins_min_$c").dataType,
              s"max_$c" -> delta.schema(s"_ins_max_$c").dataType)) ++
              hllCol.map(_ => HllRegsCol -> org.apache.spark.sql.types
                .ArrayType(org.apache.spark.sql.types.IntegerType))).toList
        val deltaJ = insRegs.fold(delta)(r => delta.join(r, groupCols, "left"))
        val merged0 =
          if (viewV == 0)
            // bootstrap: same fold expressions over typed-null view
            // columns (coalesce/least absorb them)
            viewNullCols.foldLeft(deltaJ) { case (d, (c, t)) =>
              d.withColumn(c, lit(null).cast(t))
            }
          else {
            // read ONLY the view partitions the delta touches
            val touched = delta.select(col(partitionCol).cast("string"))
              .distinct().collect().map(_.getString(0)).toSeq
            VersionedLake.read(spark, viewLake, partitions = Some(touched))
              .join(deltaJ, groupCols, "full")
          }
        val base0 = recomputed.fold(merged0)(r => merged0.join(r, groupCols, "left"))
        val base = reRegs.fold(base0)(r => base0.join(r, groupCols, "left"))
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
                .as(s"max_$c"))) ++
            hllCol.map { _ =>
              val empty = array_repeat(lit(0), m)
              // insert path: element-wise register max of old ∪ batch;
              // delete-touched path: the re-read registers (null when
              // the group emptied — the row is deleted below anyway)
              when(col("d_del") === 1, col("_re_regs"))
                .otherwise(zip_with(
                  coalesce(col(HllRegsCol), empty),
                  coalesce(col("_ins_regs"), empty),
                  (a, b) => greatest(a, b)))
                .as(HllRegsCol)
            }
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
