package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-induction statistics for tokenizer training over a
  * document corpus: BPE pair counts (the counting step of every BPE
  * merge iteration) and Good-Turing count-of-counts tables (the
  * smoothing input for n-gram LM quality filters).
  *
  * Scale discipline shared by both: compress corpus → vocabulary
  * FIRST (one hash aggregate whose shuffle is vocabulary-bounded),
  * then run the per-word/per-gram expansion over the DISTINCT table
  * weighted by its frequency — at 100 TB the explode runs over the
  * vocabulary (thousands of rows), never the corpus.
  */
object Vocab {

  /** Adjacent symbol-pair counts over the initial character alphabet —
    * one BPE training iteration's statistics (the merge rule is
    * "most frequent pair"; ties broken lexicographically by the
    * caller's sort). Overlapping pairs count every occurrence
    * ("aaa" contributes "aa" twice), matching the standard algorithm.
    * Returns the full unordered (pair, cnt) table; rank/limit at the
    * consumer.
    */
  def bpePairCounts(df: DataFrame, text: String): DataFrame = {
    val wordFreq = df.select(explode(split(col(text), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    wordFreq
      .select(col("wf"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("cnt"))
  }

  /** Good-Turing count-of-counts for word n-grams: how many DISTINCT
    * n-grams occur exactly `freq` times. Two hash aggregates, the
    * second over the n-gram-vocabulary-sized first. */
  def ngramCountOfCounts(df: DataFrame, text: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(split(col(text), " ").as("w"))
      .select(explode(
        when(size(col("w")) >= n,
          transform(sequence(lit(0), size(col("w")) - n),
            i => array_join(slice(col("w"), i + 1, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
    grams.groupBy(col("g")).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("n_grams"))
  }
}
