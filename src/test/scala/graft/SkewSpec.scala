package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: the engine's answer to hot keys that salting
  * can't pre-plan (the dedup operators salt their KNOWN skew classes at
  * build time; arbitrary user joins rely on AQE's runtime split). This
  * pins that the lever actually engages: a deliberately skewed
  * sort-merge join must come out of adaptive execution with its hot
  * partition split — visible as skew-marked nodes in the final plan —
  * and still produce exact results.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one key holds 95% of the left side, padded so the hot shuffle
      // partition is several MB — far beyond the 1 MB skew threshold
      val left = spark.range(200000L)
        .select(
          when(col("id") < 190000L, 0L).otherwise(col("id") % 63 + 1).as("k"),
          col("id").as("v"),
          // incompressible payload: skew detection measures COMPRESSED
          // map-output bytes, so a constant-character pad would vanish
          concat(sha2(col("id").cast("string"), 256),
            sha2((col("id") + 1L).cast("string"), 256),
            sha2((col("id") + 2L).cast("string"), 256),
            sha2((col("id") + 3L).cast("string"), 256)).as("pad"))
      val right = spark.range(64L).select(col("id").as("k"), (col("id") * 10).as("w"))
      // global aggregate downstream (no required distribution on k):
      // a groupBy(k) right after the join would FORBID the skew split —
      // AQE won't break a downstream hash requirement — which is
      // itself part of what this pins
      val joined = left.join(right.hint("merge"), "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"),
          sum(col("w")).as("sw"))
      val row = joined.collect().head

      // exactness: every hot row survived the split exactly once
      assert(row.getLong(0) == 200000L)
      assert(row.getLong(1) == 200000L * 256)
      // Σ w = Σ 10k over rows; hot rows contribute 0
      val swExpect = (190000L until 200000L).map(id => (id % 63 + 1) * 10).sum
      assert(row.getLong(2) == swExpect)

      // and the final adaptive plan actually engaged the skew path
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.toLowerCase.contains("skew"),
        "no skew-marked node in the final adaptive plan:\n" + finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
