package graft.streaming

import graft.sources.VersionedLake
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Changed-data capture over a [[VersionedLake]] as a MICRO-BATCH
  * FEED: each new committed version becomes one batch of
  * `diff(v-1, v)` rows (`_change` ∈ {'delete','insert'}, updates
  * decomposed), delivered in version order with a persisted watermark
  * so a restarted consumer resumes where it left off — the downstream
  * incremental-aggregate pattern the reference's 5-minute export loop
  * approximates (mwaa/mwaa-cdk/dags/timestream-airflow-demo.py:33-93),
  * driven by the lake's own commit log instead of a wall clock.
  *
  * Why a trigger-driven poll rather than a DataSourceV2 stream: each
  * batch's rows come from a manifest-pruned file-level diff resolved
  * with EXCEPT ALLs — a full Catalyst plan, which a source's
  * PartitionReader cannot host. The shape is the same one Structured
  * Streaming's foreachBatch hands user code (a batch DataFrame per
  * increment, exactly-ordered, resumable), and it is precisely how
  * this repo's scheduled exporter (C6) drives its incremental windows.
  *
  * Delivery contract: AT-LEAST-ONCE. The watermark advances (atomic
  * temp-file rename) only AFTER the handler returns, so a crash
  * between handler and watermark re-delivers that version's diff on
  * restart — handlers must be idempotent per version (the same
  * contract foreachBatch gives, and the batch id here IS the version
  * number, so dedup-by-version is one comparison).
  *
  * Scale shape: per batch, I/O = the files present in exactly one of
  * the two manifests (untouched partitions cost nothing); state = one
  * integer watermark file. A compaction version diffs to ZERO rows
  * (files moved, rows identical — the EXCEPT ALLs cancel), so
  * consumers see no phantom changes from maintenance.
  */
object ChangeFeed {

  /** The next version this consumer has NOT yet processed, minus 1 —
    * i.e. the last processed version, 0 when the feed has never run. */
  def watermark(stateDir: String): Int = {
    val f = Paths.get(s"$stateDir/WATERMARK")
    if (Files.exists(f))
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  private def advance(stateDir: String, v: Int): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    val tmp = Paths.get(s"$stateDir/.wm-${java.util.UUID.randomUUID()}")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$stateDir/WATERMARK"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Process every committed-but-unseen version, in order: the handler
    * receives (changes, fromVersion, toVersion) per transition, where
    * `changes` is `diff(from, to)` (version 1's batch is the bootstrap
    * snapshot — every row as an insert). Returns the number of
    * versions processed. Call on whatever trigger fits (a scheduler
    * tick, a commit hook, a loop) — each call drains to the current
    * version, exactly like Trigger.AvailableNow. */
  def processAvailable(spark: SparkSession, lakeDir: String, stateDir: String)(
      handler: (DataFrame, Int, Int) => Unit): Int = {
    val from = watermark(stateDir)
    val cur = VersionedLake.currentVersion(lakeDir)
    var processed = 0
    var v = from + 1
    while (v <= cur) {
      handler(VersionedLake.diff(spark, lakeDir, v - 1, v), v - 1, v)
      advance(stateDir, v) // after the handler: at-least-once
      processed += 1
      v += 1
    }
    processed
  }
}
