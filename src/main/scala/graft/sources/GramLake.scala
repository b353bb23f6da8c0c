package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedLake.BloomSpec

/** Benchmark decontamination AS AN INDEX: the word-n-gram inverted
  * index persisted in versioned lakes, so neither side of the
  * contamination join is ever re-shingled.
  * [[graft.operators.Curation.decontaminate]] /
  * [[graft.operators.Curation.contaminationScore]] recompute BOTH
  * sides' shingles on every run — fine for a one-shot audit, wrong for
  * the production reality: the training corpus is huge and mostly
  * static (shingle once), and the benchmark set GROWS in tranches (a
  * new eval suite lands monthly) — each run should pay only for the
  * new tranche's tokenize, never for a corpus-sized re-explode.
  *
  * Layout under `lakeDir`:
  *  - `train/` — (doc_id, g) rows, one per train doc's DISTINCT n-gram
  *    (the same [[graft.functions.TextFunctions.wordShingles]] set the
  *    one-shot operators use), PARTITIONED by
  *    `gp = pmod(xxhash64(g), gramParts)` with per-file Bloom filters
  *    on `g` — a bench-side probe reads only the partitions the bench
  *    grams hash into, and within them only Bloom-admitted files;
  *  - `traindocs/` — (doc_id, n_grams) roster, one row per train doc
  *    INCLUDING zero-gram (too-short) docs, so [[contaminationScore]]
  *    can score every doc without touching text;
  *  - `bench/` — (bench_id, g) rows, appended tranche by tranche.
  *
  * The gram size `n` and `gramParts` are immutable table properties —
  * an append shingled with a different n, or hashed with a different
  * partition count, fails loudly instead of silently corrupting the
  * index. Append-only contract: each document arrives in exactly one
  * increment (per-row distinctness then IS per-doc distinctness, the
  * same argument as [[PostingsLake]]'s tf completeness); `batchId`
  * arms exactly-once redelivery on every leg.
  *
  * The x_decontaminate_incr / x_contamination_score_incr gates hash a
  * two-tranche bench build against the SAME DuckDB oracles as the
  * one-shot x_decontaminate / x_contamination_score.
  */
object GramLake {

  private def trainDir(lakeDir: String) = s"$lakeDir/train"
  private def docsDir(lakeDir: String) = s"$lakeDir/traindocs"
  private def benchDir(lakeDir: String) = s"$lakeDir/bench"

  private def grams(df: DataFrame, id: String, text: String, n: Int,
      idAlias: String, gramParts: Int): DataFrame =
    df.select(col(id).as(idAlias),
      explode(graft.functions.TextFunctions.wordShingles(col(text), n)).as("g"))
      .withColumn("gp", pmod(xxhash64(col("g")), lit(gramParts)))

  /** Shingle one increment of TRAINING documents and append its gram
    * postings and its doc roster. Creates the lakes on first call. */
  def appendTrain(train: DataFrame, id: String, text: String, n: Int,
      lakeDir: String, gramParts: Int = 64,
      batchId: Option[Long] = None): Unit = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    val props = Map("n" -> n.toString, "gramParts" -> gramParts.toString)
    if (batchId.forall(_ > VersionedLake.committedBatchId(trainDir(lakeDir))))
      VersionedLake.append(grams(train, id, text, n, "doc_id", gramParts),
        trainDir(lakeDir), "gp", batchId,
        blooms = Seq(BloomSpec("g", m = 65536)), props = props)
    // the roster keeps zero-gram docs (len < n): they still score, at 0
    val roster = train.select(col(id).as("doc_id"),
      size(graft.functions.TextFunctions.wordShingles(col(text), n))
        .cast("long").as("n_grams"))
      .withColumn("dp", pmod(xxhash64(col("doc_id")), lit(16)))
    if (batchId.forall(_ > VersionedLake.committedBatchId(docsDir(lakeDir))))
      VersionedLake.append(roster, docsDir(lakeDir), "dp", batchId,
        props = Map("n" -> n.toString))
  }

  /** Shingle one TRANCHE of benchmark documents and append its grams —
    * the only tokenize a grown benchmark set ever pays again. */
  def appendBench(bench: DataFrame, id: String, text: String, n: Int,
      lakeDir: String, gramParts: Int = 64,
      batchId: Option[Long] = None): Unit = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    if (batchId.forall(_ > VersionedLake.committedBatchId(benchDir(lakeDir))))
      VersionedLake.append(grams(bench, id, text, n, "bench_id", gramParts),
        benchDir(lakeDir), "gp", batchId,
        props = Map("n" -> n.toString, "gramParts" -> gramParts.toString))
  }

  /** Drive [[appendBench]] from a STREAM of benchmark documents — the
    * production arrival shape (eval suites land as tranches over
    * time): each micro-batch shingles ONLY itself and lands
    * exactly-once (the batch id arms the lake's replay watermark, so a
    * crashed tick re-delivers into a no-op). The train side must exist
    * before querying, not before streaming — the two legs are
    * independent lakes. */
  def benchStream(stream: DataFrame, id: String, text: String, n: Int,
      lakeDir: String, checkpointDir: String, gramParts: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "GramLake.benchStream expects a streaming DataFrame")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        appendBench(b.toDF(), id, text, n, lakeDir, gramParts,
          batchId = Some(batchId))
        ()
      }
      .start()
  }

  /** Both sides of the contamination join, train side PRUNED by the
    * bench grams: partitions from the bench grams' own hash (collected
    * bounded by gramParts), files within them through the g Blooms
    * ([[VersionedLake.pointReadOrFull]]'s maxKeys rule — a huge bench
    * degrades to the partition-pruned read, never a driver blowup).
    * Refuses a lake whose two sides were shingled with different n —
    * the join would be silently meaningless. */
  private def joinSides(spark: SparkSession, lakeDir: String,
      benchVersion: Option[Int]): (DataFrame, DataFrame) = {
    require(VersionedLake.currentVersion(trainDir(lakeDir)) >= 1,
      s"no train grams at $lakeDir — appendTrain first")
    require(VersionedLake.currentVersion(benchDir(lakeDir)) >= 1,
      s"no bench grams at $lakeDir — appendBench first")
    val tProps = VersionedLake.tableProps(trainDir(lakeDir))
    val bProps = VersionedLake.tableProps(benchDir(lakeDir))
    require(tProps.get("n") == bProps.get("n"),
      s"train (n=${tProps.get("n")}) and bench (n=${bProps.get("n")}) grams " +
        s"at $lakeDir were shingled with different sizes")
    val gp = tProps("gramParts").toInt
    val bg = VersionedLake.read(spark, benchDir(lakeDir), benchVersion)
      .select(col("bench_id"), col("g"))
    val tps = bg.select(pmod(xxhash64(col("g")), lit(gp)).as("gp"))
      .distinct().collect().map(_.getLong(0).toString).toSeq // <= gramParts
    val tg = VersionedLake.pointReadOrFull(spark, trainDir(lakeDir), "g",
      bg.select(col("g")), partitions = Some(tps))
      .select(col("doc_id"), col("g"))
    (tg, bg)
  }

  /** [[graft.operators.Curation.decontaminate]] answered from the
    * index: one row per CONTAMINATED train doc — (doc_id, hits =
    * distinct shared n-grams, bench_docs = distinct benchmark docs
    * sharing at least one) — with zero shingling at query time.
    * `benchVersion` pins the bench side to an earlier tranche set
    * ("the contamination report as of suite N" — report time travel,
    * free from the lake). */
  def decontaminate(spark: SparkSession, lakeDir: String,
      benchVersion: Option[Int] = None): DataFrame = {
    val (tg, bg) = joinSides(spark, lakeDir, benchVersion)
    tg.join(bg, "g")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("hits"),
        count_distinct(col("bench_id")).as("bench_docs"))
  }

  /** [[graft.operators.Curation.contaminationScore]] answered from the
    * index: every train doc scored — (doc_id, n_grams, hits,
    * overlap_r4) — the totals coming from the roster leg (no text
    * read), the hits from the pruned gram join. Same half-up 4-dp
    * rounding as the one-shot, so both hash identically. */
  def contaminationScore(spark: SparkSession, lakeDir: String,
      benchVersion: Option[Int] = None): DataFrame = {
    val (tg, bg) = joinSides(spark, lakeDir, benchVersion)
    val hits = tg.join(bg.select(col("g")).distinct(), Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("hits"))
    VersionedLake.read(spark, docsDir(lakeDir))
      .select(col("doc_id"), col("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(floor(coalesce(col("hits"), lit(0L)).cast("double")
            / col("n_grams").cast("double")
            * 10000 + lit(0.5)) / 10000.0).as("overlap_r4"))
  }

  /** The pruned train-gram files a bench probe would read — for I/O
    * reasoning in specs ([[joinSides]]' pruning is what the queries
    * use, but it collects the partition list from the live bench lake;
    * this exposes the same composition for an explicit gram set). */
  def prunedTrainFiles(spark: SparkSession, lakeDir: String,
      benchGrams: Seq[String]): Seq[String] = {
    val gp = VersionedLake.tableProps(trainDir(lakeDir))("gramParts").toInt
    import spark.implicits._
    val tps = benchGrams.toDF("g")
      .select(pmod(xxhash64(col("g")), lit(gp)).as("gp"))
      .distinct().collect().map(_.getLong(0).toString).toSeq
    VersionedLake.prunedPointFiles(trainDir(lakeDir), "g", benchGrams,
      partitions = Some(tps))
  }

  /** Fold per-tranche file growth back to one file per partition on
    * every leg (OCC compaction — queries unchanged by construction). */
  def compact(spark: SparkSession, lakeDir: String): Unit = {
    VersionedLake.compactPartitions(spark, trainDir(lakeDir), "gp")
    VersionedLake.compactPartitions(spark, benchDir(lakeDir), "gp")
    VersionedLake.compactPartitions(spark, docsDir(lakeDir), "dp")
    ()
  }
}
