package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle extraction: distinct space-joined word n-grams
  * of a text column, as one compiled loop per row.
  *
  * Replaces the higher-order formulation
  * `array_distinct(transform(sequence(…), i -> concat_ws(' ',
  * element_at(words, i)…)))`, whose per-element interpreted lambdas
  * (plus an intermediate array per gram) made shingle extraction the
  * dominant cost of every dedup pass (~1.5 ms/doc → ~30 µs/doc).
  * Same output: Spark's split-with-trailing-empties word semantics,
  * first-occurrence order, empty array below n words.
  *
  * CodegenFallback is deliberate: the expression is evaluated once per
  * row and its interior is plain JVM code — codegen would only inline
  * the call, not speed up the loop.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty strings — parity with Spark's split()
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) {
      new GenericArrayData(Array.empty[Any])
    } else {
      val seen = new java.util.LinkedHashSet[String](words.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** One-pass word n-gram counts: struct(total, distinct) over the
  * space-split words of a text column.
  *
  * Serves repetition scoring (Gopher-style repeated-n-gram ratio),
  * which only needs the two counts — materializing the gram array
  * just to take `size` and `size(array_distinct(…))` of it costs an
  * interpreted lambda per gram plus a per-row array, and the
  * `when`-guarded gram expression is re-evaluated per referencing
  * column (higher-order functions are CodegenFallback, outside CSE).
  * Same word semantics as [[WordShingles]]: split keeps trailing
  * empties; below n words both counts are 0.
  */
case class ShingleStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    org.apache.spark.sql.types.StructField("total",
      org.apache.spark.sql.types.LongType, nullable = false) ::
    org.apache.spark.sql.types.StructField("distinct",
      org.apache.spark.sql.types.LongType, nullable = false) :: Nil)
  override def prettyName: String = "shingle_stats"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) {
      org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    } else {
      val total = words.length - n + 1
      val seen = new java.util.HashSet[String](total * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(total.toLong, seen.size.toLong)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)
}

/** Rolling polynomial content fingerprint h = (h·31 + codepoint) mod
  * 1e9+7 over the text's characters, as one compiled loop — replaces an
  * interpreted per-character `aggregate(transform(sequence(…)))` chain
  * (which also allocated a boxed-long array the length of the text per
  * row). Modular arithmetic keeps it reproducible in the DuckDB oracle.
  */
case class RollingPolyHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var a = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    a
  }

  override protected def withNewChildInternal(newChild: Expression): RollingPolyHash =
    copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[WordShingles]]. */
  def wordShingles(text: Column, n: Int): Column =
    GraftShim.column(WordShingles(GraftShim.expression(text), n))

  /** Column API for [[ShingleStats]]. */
  def shingleStats(text: Column, n: Int): Column =
    GraftShim.column(ShingleStats(GraftShim.expression(text), n))

  /** Column API for [[RollingPolyHash]]. */
  def rollingPolyHash(text: Column): Column =
    GraftShim.column(RollingPolyHash(GraftShim.expression(text)))
}
