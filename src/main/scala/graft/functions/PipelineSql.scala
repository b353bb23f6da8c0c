package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.expr
import org.apache.spark.unsafe.types.UTF8String

/** SQL entry points for the LLM-pipeline extension operators, so a
  * SQL-first user reaches them from `spark.sql` the way the Timestream
  * dialect ([[Dialect]]) exposes the reference's functions — the
  * reference precedent is that EVERY capability is SQL-reachable
  * (timestream-queries/queries.txt, README.md:411-449).
  *
  * Each operator registers as a TABLE-VALUED function callable in a
  * FROM clause; the first argument names the input table or temp view
  * and the rest are the operator's parameters as literals:
  *
  *   SELECT * FROM minhash_lsh_pairs('docs', 'doc_id', 'text', 3, 0.8)
  *   SELECT * FROM pack_shards('docs', 'doc_id', 'size(split(text, " "))', 2000)
  *   SELECT * FROM cap_per_group('docs', 'source', 'doc_id', 10)
  *   SELECT * FROM asof_join('trades', 'quotes', 'sym', 't', 't', 'bid,ask')
  *   SELECT * FROM sessionize('events', 'user_id', 'ts', 'value', '4 hours')
  *
  * The builder resolves the named table THROUGH the session catalog at
  * analysis time and splices the operator's analyzed plan into the
  * outer query — the resulting query plans, optimizes, and scales
  * exactly like the Scala-API form (these are the same DataFrame
  * builders, not a parallel implementation).
  */
object PipelineSql {

  private def fail(fn: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$fn: $msg")

  private def lit(fn: String, e: Expression, what: String): Any = {
    if (!e.foldable) fail(fn, s"$what must be a literal, got $e")
    e.eval()
  }

  private def str(fn: String, e: Expression, what: String): String =
    lit(fn, e, what) match {
      case s: UTF8String => s.toString
      case s: String => s
      case other => fail(fn, s"$what must be a string literal, got $other")
    }

  private def int(fn: String, e: Expression, what: String): Int =
    lit(fn, e, what) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case other => fail(fn, s"$what must be an integer literal, got $other")
    }

  private def long(fn: String, e: Expression, what: String): Long =
    lit(fn, e, what) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => fail(fn, s"$what must be an integer literal, got $other")
    }

  private def dbl(fn: String, e: Expression, what: String): Double =
    lit(fn, e, what) match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => fail(fn, s"$what must be a numeric literal, got $other")
    }

  private def argc(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n) fail(fn, s"expects $n arguments, got ${es.length}")

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Install the pipeline table functions on `spark`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftShim.{analyzedPlan, registerTableFunction}

    def table(fn: String, e: Expression): DataFrame =
      spark.table(str(fn, e, "the table argument"))

    def reg(name: String)(builder: Seq[Expression] => DataFrame): Unit =
      registerTableFunction(spark, name, es => analyzedPlan(builder(es)))

    // dedup family
    reg("minhash_lsh_pairs") { es =>
      argc("minhash_lsh_pairs", es, 5)
      graft.operators.Dedup.minhashLshPairs(
        table("minhash_lsh_pairs", es(0)),
        id = str("minhash_lsh_pairs", es(1), "id column"),
        text = str("minhash_lsh_pairs", es(2), "text column"),
        n = int("minhash_lsh_pairs", es(3), "shingle size n"),
        threshold = dbl("minhash_lsh_pairs", es(4), "jaccard threshold"))
    }
    reg("exact_dedup") { es =>
      argc("exact_dedup", es, 3)
      graft.operators.Dedup.exactDedup(
        table("exact_dedup", es(0)),
        id = str("exact_dedup", es(1), "id column"),
        text = str("exact_dedup", es(2), "text column"))
    }

    // curation / packing family: the tokens argument is a SQL
    // expression string evaluated against the input table's columns
    reg("pack_shards") { es =>
      argc("pack_shards", es, 4)
      graft.operators.Curation.packShards(
        table("pack_shards", es(0)),
        id = str("pack_shards", es(1), "id column"),
        tokens = expr(str("pack_shards", es(2), "tokens expression")),
        budget = long("pack_shards", es(3), "shard budget"))
    }

    // per-source quota family
    reg("cap_per_group") { es =>
      argc("cap_per_group", es, 4)
      graft.operators.Curation.capPerGroup(
        table("cap_per_group", es(0)),
        group = str("cap_per_group", es(1), "group column"),
        id = str("cap_per_group", es(2), "id column"),
        cap = int("cap_per_group", es(3), "cap"))
    }

    // temporal family
    reg("asof_join") { es =>
      argc("asof_join", es, 6)
      graft.operators.Temporal.asOf(
        table("asof_join", es(0)),
        table("asof_join", es(1)),
        keys = csv(str("asof_join", es(2), "keys csv")),
        leftTime = str("asof_join", es(3), "left time column"),
        rightTime = str("asof_join", es(4), "right time column"),
        payload = csv(str("asof_join", es(5), "payload csv")))
    }
    reg("sessionize") { es =>
      argc("sessionize", es, 5)
      graft.operators.Temporal.sessionize(
        table("sessionize", es(0)),
        key = str("sessionize", es(1), "key column"),
        time = str("sessionize", es(2), "time column"),
        value = str("sessionize", es(3), "value column"),
        gap = str("sessionize", es(4), "session gap"))
    }
  }
}
