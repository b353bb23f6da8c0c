package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Optimization-round tooling: run one gate with a JOB listener and
  * print the job timeline — id, start offset, wall, callsite — so
  * driver-side gaps BETWEEN jobs (planning, file listing, collects)
  * are visible, which a stage table can't show.
  * Usage: runMain graft.JobProbe <gate> [reps]
  */
object JobProbe {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val cs = e.stageInfos.headOption.map(_.name.takeWhile(_ != '\n').take(80))
          .getOrElse("?")
        val nStages = e.stageInfos.size
        starts.put(e.jobId, (e.time, s"[$nStages st] $cs"))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, cs) =>
          done.add((e.jobId, t0, e.time, cs))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      done.clear(); starts.clear()
      val w0 = System.currentTimeMillis()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.currentTimeMillis() - w0) / 1e3
      CacheRegistry.clearAll()
      Thread.sleep(500)
      println(f"%n=== $name rep $rep: total $total%.2f s, ${done.size} jobs ===")
      println(f"${"job"}%5s ${"t0_ms"}%8s ${"wall_ms"}%8s  callsite")
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq.sortBy(_._2).foreach { case (id, t0, t1, cs) =>
        println(f"$id%5d ${t0 - w0}%8d ${t1 - t0}%8d  $cs")
      }
    }
    spark.stop()
  }
}
