package graft.queries

/** Once-per-JVM materialization of gate fixtures that require a write
  * (the s5 CSV lake export, the c6 partitioned parquet lake). The gate
  * functions stay pure READS after the first invocation, so:
  *  - bench measures the query, not Hadoop commit overhead (the s5
  *    gate swung 5 s → 49 s between identical runs on per-call writes);
  *  - plan audits can construct the DataFrame without re-running jobs.
  * The write path itself is still exercised — once, by the first
  * invocation, inside the same hash-checked gate.
  */
object Fixtures {
  private val cache = scala.collection.mutable.Map.empty[String, String]

  /** Build `kind`'s fixture for `sfDir` exactly once per JVM; return
    * its directory. `build` receives a fresh temp dir on first call. */
  def dir(kind: String, sfDir: String)(build: String => Unit): String =
    synchronized {
      cache.getOrElseUpdate(s"$kind|$sfDir", {
        val out = java.nio.file.Files.createTempDirectory(s"graft_$kind").toString
        build(out)
        // fail loudly rather than caching a path a failed build left
        // empty — readers would otherwise see confusing glob misses
        require(new java.io.File(out).listFiles() != null &&
          new java.io.File(out).listFiles().nonEmpty,
          s"fixture $kind built nothing under $out")
        out
      })
    }
}
