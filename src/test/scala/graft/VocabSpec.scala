package graft

import graft.operators.Vocab
import org.apache.spark.sql.functions._

/** Vocab-induction semantics the hash gates don't isolate: overlapping
  * pair counting, frequency weighting through the distinct-word
  * compression, and the count-of-counts invariants.
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("bpePairCounts: overlapping pairs, frequency-weighted through the word table") {
    val docs = Seq("aaa bb", "aaa", "x").toDF("text")
    val out = Vocab.bpePairCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aaa" occurs twice, contributes "aa" twice PER OCCURRENCE
    assert(out("aa") == 4L)
    assert(out("bb") == 1L)
    // single-char words carry no pairs
    assert(!out.contains("x"))
    // partition invariance (one-arg repartition only reshuffles)
    val again = Vocab.bpePairCounts(docs.repartition(7), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("ngramCountOfCounts: the table sums back to the distinct n-gram count") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val coc = Vocab.ngramCountOfCounts(docs, "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distinctGrams = docs.select(split(col("text"), " ").as("w"))
      .select(explode(when(size(col("w")) >= 3,
        transform(sequence(lit(0), size(col("w")) - 3),
          i => array_join(slice(col("w"), i + 1, lit(3)), " "))))
        .as("g")).distinct().count()
    assert(coc.values.sum == distinctGrams)
    assert(coc.keys.forall(_ >= 1L))
  }
}
