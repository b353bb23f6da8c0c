package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round scratch tooling: time the candidate-bounded lake
  * reads of one d_dedup_tick increment phase by phase.
  * Usage: runMain graft.ReadProbe
  */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-50s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val fn = SparkEntry.queries("d_dedup_tick")
    time("fixture+first tick")(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    CacheRegistry.clearAll()

    val lakes = Fx.lakesDir(spark, sfDir)
    val idx = s"$lakes/index"
    import graft.sources.VersionedLake
    val v = VersionedLake.currentVersion(idx)
    val files = VersionedLake.manifestEntries(idx, v).map(_.path)
    println(s"[probe] index v$v files: ${files.size}")
    val recorded = VersionedLake.recordedSchema(idx, v)
    println(s"[probe] recorded schema: ${recorded.map(_.simpleString)}")
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val withSchema = time("reader WITH schema (construct)")(
        spark.read.option("basePath", s"$idx/data")
          .schema(recorded.get).parquet(files: _*))
      time("  analyzed")(withSchema.queryExecution.analyzed)
      val noSchema = time("reader WITHOUT schema (construct)")(
        spark.read.option("basePath", s"$idx/data").parquet(files: _*))
      time("  analyzed")(noSchema.queryExecution.analyzed)
      time("pointRead full (DedupStream)")(
        graft.streaming.DedupStream.pointRead(spark, idx, "bucket",
          spark.range(10).select(col("id").cast("string").as("k"))))
    }
    spark.stop()
  }
}

/** Access the cached fixture dir the gate built. */
object Fx {
  def lakesDir(spark: SparkSession, sfDir: String): String =
    graft.queries.Fixtures.dir("dedup_tick", sfDir)(_ => ())
}
