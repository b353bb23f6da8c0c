package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: dump `.explain("formatted")` for the
  * named gates to `<outDir>/<gate>_<tag>.txt` — the plan evidence the
  * judge checks optimization claims against (plans/r20/). Mirrors the
  * bench session config so the captured plan is the one the bench
  * executes. Usage:
  *   runMain graft.PlanDump <outDir> <tag> <gate1,gate2,...>
  * with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir) // builds fixtures on first call
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
      CacheRegistry.clearAll()
    }
    spark.stop()
  }
}
