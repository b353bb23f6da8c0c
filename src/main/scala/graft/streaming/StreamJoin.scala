package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution shape ("which clicks
  * led to a purchase within an hour") that batch engines spell as a
  * range join and a streaming engine must run with BOUNDED state.
  *
  * Spark-native form: both sides watermarked, an equi-key conjunct
  * plus a time-range conjunct relating the two event times. The
  * watermark + range bound is what lets the state store evict: a
  * buffered left row can be dropped once the right watermark passes
  * `l.time + after`, and vice versa — without the range conjunct a
  * stream-stream join's state grows without bound and Spark rejects
  * it in append mode. (Reference analog: none — its CEP runs per-key
  * sequences; this is the cross-STREAM correlation the engine adds.)
  *
  * The join itself is the same declarative plan batch uses (hash
  * exchange on the key; micro-batch side state probe), so one
  * implementation serves both: feeding batch frames returns the exact
  * batch range join, and StreamJoinSpec pins stream ≡ batch on the
  * same event set.
  *
  * Inputs must carry DISJOINT column names apart from `key` (the
  * output keeps one copy of the key plus both sides' columns).
  */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, watermark: String,
      before: String, after: String): DataFrame = {
    require(lTime != rTime,
      s"left and right time columns must be named differently, both are '$lTime'")
    val dup = left.columns.toSet.intersect(right.columns.toSet) - key
    require(dup.isEmpty, s"overlapping non-key columns: ${dup.mkString(", ")}")
    val l = if (left.isStreaming) left.withWatermark(lTime, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rTime, watermark) else right
    val cond = l(key) === r(key) &&
      col(rTime) >= col(lTime) - expr(s"INTERVAL $before") &&
      col(rTime) <= col(lTime) + expr(s"INTERVAL $after")
    l.join(r, cond)
      .select(l(key).as(key) +:
        (left.columns.filterNot(_ == key).map(col) ++
          right.columns.filterNot(_ == key).map(col)): _*)
  }
}
