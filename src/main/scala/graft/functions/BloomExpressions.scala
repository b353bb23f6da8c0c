package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native membership test against a PACKED Bloom bitset: the child
  * evaluates to a row's k bucket positions (array<long>, each in
  * [0, m)), `words` is the filter's m bits as m/64 longs riding the
  * expression itself (a reference object in codegen — broadcast to
  * executors with the serialized plan, like a broadcast variable but
  * with zero join machinery). Returns true iff EVERY bucket's bit is
  * set.
  *
  * This is what makes Bloom pruning a MAP-SIDE filter at 100 TB: the
  * probe table is never shuffled, never joined — each row costs k
  * array reads and k bit tests inside whole-stage codegen. The
  * alternatives all lose: an equi-join against a set-bits table
  * shuffles or at best hash-probes per bucket with join overhead; an
  * `array_contains` against a literal bucket list is O(set bits) per
  * row and bloats the plan tree; a UDF pays SerDe per row. A
  * column-valued shift (`bit = word >> (bucket % 64)`) cannot even be
  * spelled with the built-in shiftright, whose shift amount must be a
  * literal.
  *
  * Buckets outside [0, m) (m = 64 × words.length) make the row fail
  * closed (false) rather than read out of bounds; null buckets
  * propagate null.
  */
case class BloomMightContain(child: Expression, words: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires array<bigint> buckets, got ${t.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  private lazy val mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  override def nullable: Boolean = super.nullable || mayHaveNullElements

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (mayHaveNullElements && a.isNullAt(i)) return null
      val b = a.getLong(i)
      val w = (b >>> 6).toInt
      if (b < 0 || w >= words.length ||
        ((words(w) >>> (b & 63L).toInt) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val w = ctx.freshName("w")
      val nullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |${ev.value} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final long $b = $a.getLong($i);
         |  final int $w = (int) ($b >>> 6);
         |  if ($b < 0 || $w >= $wordsRef.length ||
         |      (($wordsRef[$w] >>> (int) ($b & 63L)) & 1L) == 0L) {
         |    ${ev.value} = false; break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** Column API: true iff every bucket position in `buckets`
    * (array<bigint>) has its bit set in `words`. */
  def bloomMightContain(buckets: Column, words: Array[Long]): Column =
    GraftShim.column(BloomMightContain(GraftShim.expression(buckets), words))
}
