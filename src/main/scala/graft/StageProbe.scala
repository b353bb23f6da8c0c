package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Optimization-round tooling: run one gate with a stage listener and
  * print per-stage wall time, executor CPU, and the first line of the
  * stage's callsite — the empirical loop of guide §1 without the UI.
  * Usage: runMain graft.StageProbe <gate> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val stages = scala.collection.mutable.ListBuffer
      .empty[(Int, String, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += ((si.stageId,
          si.name.takeWhile(_ != '\n').take(90),
          wall, m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      CacheRegistry.clearAll()
      Thread.sleep(300) // let listener drain
      println(f"%n=== $name rep $rep: total $total%.2f s, ${stages.size} stages ===")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"shR_kb"}%8s ${"shW_kb"}%8s  name")
      stages.toSeq.sortBy(-_._3).take(25).foreach {
        case (id, nm, wall, run, cpu, shr, shw) =>
          println(f"$id%6d $wall%8d $run%8d $cpu%8d ${shr / 1024}%8d ${shw / 1024}%8d  $nm")
      }
    }
    spark.stop()
  }
}
