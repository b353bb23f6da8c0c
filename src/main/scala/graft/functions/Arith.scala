package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic float discipline for oracle-checked outputs.
  *
  * Spark's `round` rounds the shortest decimal rendering of the double
  * (BigDecimal HALF_UP on Double.toString), DuckDB's rounds the binary
  * value — they disagree whenever the true value's shortest rendering is
  * exactly x.xx5 (e.g. 73.115 → 73.12 vs 73.11). Both engines evaluate
  * floor(x*100 + 0.5)/100 with identical IEEE ops, so every rounded
  * column uses this form on both sides of the compare.
  */
object Arith {
  /** Half-up round to 2 decimals, bit-identical across engines. */
  def r2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100.0

  /** Half-up round to 4 decimals (similarity scores). */
  def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000.0

  /** The DuckDB spelling of [[r2]] / [[r4]] for oracle SQL. */
  def sqlR2(expr: String): String = s"floor(($expr) * 100 + 0.5) / 100.0"
  def sqlR4(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000.0"
}
