package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** A similarity-search index AS A TABLE: the quantized-IVF index
  * persisted in a versioned lake, cell = partition. This is the
  * production shape for ANN over a growing corpus — the quantizer is
  * trained once, new embeddings are ASSIGNED and APPENDED (never a
  * rebuild), and a query batch reads only the partitions its probes
  * name.
  *
  * Layout under `lakeDir`:
  *  - `vectors/` — a [[VersionedLake]] of (doc, v, cell), partitioned
  *    by cell, so every lake capability applies to the index itself:
  *    time travel (search the index as of any version), exactly-once
  *    streaming appends via batch ids, OCC for concurrent writers,
  *    compaction for the one-file-per-increment growth;
  *  - `centroids/` — the frozen (cell, cv) integer centroids of
  *    [[Similarity.quantizedKMeans]] (20-bit fixed point, so the
  *    append-time assignment replays the build-time rule bit-exactly
  *    on any engine).
  *
  * Scale shape: `search` probes centroids first (a query×nlist
  * broadcast product), collects the probed CELL IDS (bounded by nlist
  * — cell metadata, never data), and hands [[VersionedLake.read]] the
  * partition list — so a query batch at nprobe = p reads ~p/nlist of
  * the corpus from disk. Partition pruning and cell probing share one
  * implementation ([[Similarity.quantizedProbe]]), which is what makes
  * the pruned search provably equal to the unpruned one (AnnLakeSpec
  * pins both the equality and the file-count reduction).
  *
  * Freezing the quantizer is the standard IVF contract (FAISS-style):
  * appends shift cell balance, not correctness — full-probe results
  * are centroid-independent, and partial-probe results depend only on
  * the frozen centroids, so incremental and one-shot indexes agree
  * wherever their centroids do. The s_ann_lake_incremental gate pins
  * the end-to-end property: build on half the corpus, append the rest,
  * full-probe search ≡ brute-force cosine.
  */
object AnnLake {

  private def vectorsDir(lakeDir: String) = s"$lakeDir/vectors"
  private def centroidsDir(lakeDir: String) = s"$lakeDir/centroids"

  /** Train the quantizer on `corpus` and materialize the index lake.
    * `trainFraction` < 1 trains the quantizer on a sample; every row
    * is still assigned and stored. */
  def create(corpus: DataFrame, id: String, vec: String, lakeDir: String,
      nlist: Int, dim: Int, iters: Int = 4,
      trainFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (assigned, centroids) = Similarity.quantizedKMeans(
      corpus, id, vec, nlist, dim, iters, trainFraction)
    val rows = corpus.select(col(id).as("doc"), col(vec).as("v"))
      .join(assigned.select(col("doc"), col("cell")), "doc")
    // doc Blooms make the retract path candidate-bounded: a takedown
    // of a handful of ids opens a handful of files, not the index.
    // (search needs no Bloom — its partition column IS the probed
    // cell, so manifest partition pruning is already exact.)
    VersionedLake.create(rows, vectorsDir(lakeDir), "cell",
      blooms = Seq(VersionedLake.BloomSpec("doc")),
      props = Map("nlist" -> nlist.toString))
    centroids.zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cell", "cv").coalesce(1).write.mode("overwrite")
      .parquet(centroidsDir(lakeDir))
  }

  /** Assign new embeddings against the FROZEN centroids and append
    * them — one broadcast argmin over nlist cells per row, then a
    * watermark-guarded lake append (`batchId` arms exactly-once for
    * streaming callers; a replayed increment is a no-op). */
  def append(newVecs: DataFrame, id: String, vec: String, lakeDir: String,
      batchId: Option[Long] = None): Unit = {
    val spark = newVecs.sparkSession
    if (batchId.exists(_ <= VersionedLake.committedBatchId(vectorsDir(lakeDir))))
      return
    val centroids = loadCentroids(spark, lakeDir)
    val qv = newVecs.select(col(id).as("doc"),
      Similarity.quant20(col(vec)).as("qv"))
    val assigned = Similarity.assignCells(qv, centroids)
      .select(col("doc"), col("cell"))
    val rows = newVecs.select(col(id).as("doc"), col(vec).as("v"))
      .join(assigned, "doc")
    VersionedLake.append(rows, vectorsDir(lakeDir), "cell", batchId)
  }

  /** Drive [[append]] from a STREAM of embeddings — the ingest-time
    * form: each micro-batch is assigned against the frozen centroids
    * and lands exactly-once (the batch id arms the lake's replay
    * watermark; a crashed tick re-delivers into a no-op). The lake
    * must exist ([[create]] trains the quantizer) before the stream
    * starts — assignment needs centroids. `compactEvery` > 0 folds
    * per-tick file growth every N batches (maintenance never fails a
    * data batch — a lost OCC race just defers to a later tick). */
  def indexStream(stream: DataFrame, id: String, vec: String,
      lakeDir: String, checkpointDir: String, compactEvery: Int = 0,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "AnnLake.indexStream expects a streaming DataFrame")
    require(VersionedLake.currentVersion(vectorsDir(lakeDir)) >= 1,
      s"create($lakeDir) first: streaming appends assign against the frozen centroids")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        append(b.toDF(), id, vec, lakeDir, batchId = Some(batchId))
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          try { compact(b.sparkSession, lakeDir); () }
          catch { case scala.util.control.NonFatal(_) => () }
        ()
      }
      .start()
  }

  /** Probe, prune, rank: each query's `nprobe` nearest cells by the
    * shared probe rule; only those cells' PARTITIONS are read from the
    * lake; exact-cosine top-k over the probed members. `version`
    * searches the index as of an earlier lake version — ANN time
    * travel for free. */
  def search(spark: SparkSession, queries: DataFrame, id: String,
      vec: String, lakeDir: String, k: Int, nprobe: Int,
      version: Option[Int] = None): DataFrame = {
    val cdf = spark.read.parquet(centroidsDir(lakeDir))
    val cells = Similarity.quantizedProbe(queries, id, vec, nprobe, cdf)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0).toString).toSeq // nlist-bounded metadata
    val rows = VersionedLake.read(spark, vectorsDir(lakeDir), version,
      partitions = Some(cells))
      .select(col("doc"), col("v"), col("cell").cast("int").as("cell"))
    Similarity.ivfQuantizedSearch(
      rows.select(col("doc").as(id), col("v").as(vec)),
      queries, id, vec, k, nprobe,
      rows.select(col("doc"), col("cell")), cdf)
  }

  /** Fold per-increment file growth back to one file per cell (OCC
    * compaction; search unchanged by construction). */
  def compact(spark: SparkSession, lakeDir: String): Unit = {
    VersionedLake.compactPartitions(spark, vectorsDir(lakeDir), "cell")
    ()
  }

  /** RETRACT embeddings from the index (takedown shape): a copy-on-
    * write MERGE rewrites only the cells holding the named docs; the
    * frozen centroids are untouched (cell geometry is independent of
    * membership), so subsequent appends and searches are unaffected
    * beyond the removed rows. Pre-delete versions stay searchable via
    * `search(version = ...)` until vacuumed. */
  def delete(docs: DataFrame, id: String, lakeDir: String,
      batchId: Option[Long] = None): Unit = {
    val spark = docs.sparkSession
    if (batchId.exists(_ <= VersionedLake.committedBatchId(vectorsDir(lakeDir))))
      return
    val ids = docs.select(col(id).as("doc")).distinct()
    val dir = vectorsDir(lakeDir)
    // candidate-bounded rows-to-delete read: only files whose doc
    // Bloom might hold a named id (pre-Bloom lakes fall back to the
    // full read; key sets past the driver bound do too)
    val candRows = VersionedLake.pointReadOrFull(spark, dir, "doc", ids)
    val changes = candRows
      .join(ids, Seq("doc"), "left_semi")
      .withColumn("_deleted", lit(true))
    VersionedLake.mergeUpsert(spark, vectorsDir(lakeDir), changes,
      Seq("doc"), "cell", batchId = batchId)
  }

  /** Per-cell population from MANIFEST METADATA alone — no data scan:
    * the drift signal for a long-lived index. Appends assign against
    * frozen centroids, so as the corpus distribution moves, cells
    * skew; a skewed cell means partial-probe searches read more data
    * for the same recall. One row per cell: (cell, files, rows).
    * `rows` is null for any cell holding at least one file written
    * before row counts were recorded in the manifest — null, not a
    * silent partial sum over only the counted files, so a drift check
    * can never compare fabricated populations (compact the lake to
    * refresh the counts). Check max(rows)/avg(rows) on a cadence and
    * [[reindex]] when it drifts past tolerance. */
  def cellStats(spark: SparkSession, lakeDir: String): DataFrame = {
    import spark.implicits._
    val v = VersionedLake.currentVersion(vectorsDir(lakeDir))
    VersionedLake.manifestEntries(vectorsDir(lakeDir), v)
      .map(e => (e.partition, 1L, e.rows))
      .toDF("cell", "files", "rows")
      .groupBy(col("cell"))
      .agg(sum(col("files")).as("files"),
        // sum() skips nulls; a partial sum presented as the population
        // would silently understate — poison the cell to null instead
        when(count(col("rows")) === count(lit(1)), sum(col("rows")))
          .as("rows"))
  }

  /** REINDEX — the drift repair: retrain the quantizer on the CURRENT
    * corpus and build a fresh index at `newLakeDir`, blue/green style.
    * Deliberately NOT in place:
    *
    *  - time-travel correctness: `search(version = v)` prunes with the
    *    centroids the version's rows were ASSIGNED under; an in-place
    *    centroid swap would probe old assignments with new geometry
    *    and silently read the wrong cells;
    *  - concurrent appends keep landing in the old index (assignments
    *    against its still-frozen centroids stay valid) while the new
    *    one builds; the caller cuts over by swapping the directory
    *    pointer and replaying the append tail, exactly like any
    *    blue/green index rotation.
    *
    * The old lake remains intact and searchable until retired. */
  def reindex(spark: SparkSession, lakeDir: String, newLakeDir: String,
      nlist: Int, dim: Int, iters: Int = 4,
      trainFraction: Double = 1.0): Unit = {
    val corpus = VersionedLake.read(spark, vectorsDir(lakeDir))
      .select(col("doc"), col("v"))
    create(corpus, "doc", "v", newLakeDir, nlist, dim, iters, trainFraction)
  }

  /** The pruned file set a probe plan would read — exposed so specs
    * and operators can reason about I/O without executing a search. */
  def prunedInputFiles(spark: SparkSession, queries: DataFrame, id: String,
      vec: String, lakeDir: String, nprobe: Int): Array[String] = {
    val cdf = spark.read.parquet(centroidsDir(lakeDir))
    val cells = Similarity.quantizedProbe(queries, id, vec, nprobe, cdf)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0).toString).toSeq
    VersionedLake.read(spark, vectorsDir(lakeDir),
      partitions = Some(cells)).inputFiles
  }

  private def loadCentroids(spark: SparkSession, lakeDir: String): Array[Array[Long]] = {
    val rows = spark.read.parquet(centroidsDir(lakeDir))
      .collect().map(r => r.getAs[Int]("cell") ->
        r.getAs[scala.collection.Seq[Long]]("cv").toArray)
    val n = rows.length
    val out = new Array[Array[Long]](n)
    rows.foreach { case (cell, cv) => out(cell) = cv }
    require(out.forall(_ != null), s"centroid table under $lakeDir has gaps")
    out
  }
}
