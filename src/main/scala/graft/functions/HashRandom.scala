package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-derived randomness — the engine's substitute for
  * `rand()` everywhere reproducibility matters (synthetic data,
  * dataset splits, shuffle keys). Values are pure functions of the
  * input string, so they are identical across partitionings, retries,
  * cluster layouts, AND engines: md5 is the one hash Spark and DuckDB
  * evaluate identically, and the 24-bit fraction is exact in binary,
  * so threshold comparisons agree bit-for-bit with a DuckDB oracle.
  */
object HashRandom {

  /** Uniform [0, 1) from the md5 of a string column: the first 6 hex
    * nibbles read as a 24-bit integer over 2^24. */
  def uniform(key: Column): Column = {
    val md = md5(key)
    val nibs = (1 to 6).map { i =>
      val c = ascii(substring(md, i, 1))
      when(c <= 57, c - 48).otherwise(c - 87) // '0'-'9' → 0-9, 'a'-'f' → 10-15
    }
    nibs.reduce((a, b) => a * 16 + b).cast("double") / 16777216.0
  }
}
