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

  test("bpeTrain: greedy merges with lexicographic tiebreak, replayed by a reference fold") {
    // "abab" x3, "abc" x2: iter 1 most frequent pair is a+b (8 = 3*2+2)
    // -> merge "ab"; iter 2 pairs are ab+ab (3), ab+c (2) -> "abab"
    val docs = Seq("abab abab abab abc", "abc").toDF("text")
    // NB the word split is per-document: doc 1 carries abab x3 + abc
    val out = Vocab.bpeTrain(docs, "text", k = 2).collect()
    assert(out.length == 2)
    val m1 = out.find(_.getAs[Int]("step") == 1).get
    assert(m1.getAs[String]("left_sym") == "a" && m1.getAs[String]("right_sym") == "b")
    assert(m1.getAs[String]("merged") == "ab" && m1.getAs[Long]("cnt") == 8L)
    val m2 = out.find(_.getAs[Int]("step") == 2).get
    assert(m2.getAs[String]("merged") == "abab" && m2.getAs[Long]("cnt") == 3L)

    // greedy left-to-right within a word: "aaa" under (a,a) yields one
    // merge ("aa","a"), so iteration 2's top pair is aa+a
    val tri = Seq("aaa aaa").toDF("text")
    val t = Vocab.bpeTrain(tri, "text", k = 2).collect()
      .sortBy(_.getAs[Int]("step"))
    assert(t(0).getAs[String]("merged") == "aa" && t(0).getAs[Long]("cnt") == 4L)
    assert(t(1).getAs[String]("left_sym") == "aa" && t(1).getAs[String]("right_sym") == "a")
    assert(t(1).getAs[Long]("cnt") == 2L)

    // lexicographic tiebreak at equal counts: "ba" vs "ab" both count 1
    val tie = Seq("ab ba").toDF("text")
    val k1 = Vocab.bpeTrain(tie, "text", k = 1).head()
    assert(k1.getAs[String]("merged") == "ab")

    // exhaustion: fewer pairs than k rounds returns the shorter table
    val tiny = Seq("xy").toDF("text")
    assert(Vocab.bpeTrain(tiny, "text", k = 5).count() <= 2)
  }

  test("bpeApply: trained merges reproduce the training segmentation") {
    val docs = Seq("abab abab abab abc", "abc").toDF("text")
    val merges = Vocab.bpeTrain(docs, "text", k = 2)
      .orderBy(col("step")).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"))).toSeq
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    val tokens = Vocab.bpeApply(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abab -> [abab]; abc -> [ab, c]
    assert(tokens == Map("abab" -> 3L, "ab" -> 2L, "c" -> 2L))
    // no merges: pure character tokens
    val chars = Vocab.bpeApply(docs, "text", Seq.empty)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(chars == Map("a" -> 8L, "b" -> 8L, "c" -> 2L))
  }

  test("bpeEncodeLargeK ≡ bpeApply on random corpora at small k (trained merges)") {
    val rng = new scala.util.Random(42)
    // random words over a tiny alphabet so merges chain deeply
    def corpus(): Seq[String] = Seq.fill(40) {
      Seq.fill(1 + rng.nextInt(6))(
        Seq.fill(2 + rng.nextInt(8))("abcd" (rng.nextInt(4))).mkString).mkString(" ")
    }
    (1 to 3).foreach { trial =>
      val docs = corpus().toDF("text")
      val merges = Vocab.bpeTrain(docs, "text", k = 12)
        .orderBy(col("step")).collect()
        .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"))).toSeq
      val viaReplace = Vocab.bpeApply(docs, "text", merges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaRanks = Vocab.bpeEncodeLargeK(docs, "text", merges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaRanks == viaReplace, s"trial $trial diverged with merges $merges")
    }
    // and on an arbitrary (non-trained) merge list, where the
    // rank-order argument is doing real work
    val docs = Seq("aaabab ababa baaab").toDF("text")
    val weird = Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("b", "ab"))
    val viaReplace = Vocab.bpeApply(docs, "text", weird)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaRanks = Vocab.bpeEncodeLargeK(docs, "text", weird)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaRanks == viaReplace)
  }

  test("bpeEncodeLargeK runs at k=512 (far past the expression-tree form's limit)") {
    // a synthetic 512-rule merge list: chains over a 4-char alphabet
    // built the way training would (each rule's operands exist by its
    // step), exercising deep rank chains without a 512-round train
    val alphabet = Seq("a", "b", "c", "d")
    val rules = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val symbols = scala.collection.mutable.ArrayBuffer[String](alphabet: _*)
    val rng = new scala.util.Random(7)
    while (rules.size < 512) {
      val l = symbols(rng.nextInt(symbols.size))
      val r = symbols(rng.nextInt(symbols.size))
      if (l.length + r.length <= 12 && !rules.contains((l, r))) {
        rules += ((l, r)); symbols += l + r
      }
    }
    val rng2 = new scala.util.Random(11)
    val docs = Seq.fill(30)(
      Seq.fill(1 + rng2.nextInt(4))(
        Seq.fill(2 + rng2.nextInt(10))("abcd" (rng2.nextInt(4))).mkString).mkString(" "))
      .toDF("text")
    val out = Vocab.bpeEncodeLargeK(docs, "text", rules.toSeq)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // a valid segmentation: token character mass equals word character
    // mass (replaces only delete separators, never characters), and
    // multi-char tokens (actual merges) appeared
    val charMass = docs.as[String].collect()
      .flatMap(_.split(" ")).filter(_.length >= 2).map(_.length.toLong).sum
    assert(out.map { case (t, c) => t.length * c }.sum == charMass)
    assert(out.keys.exists(_.length >= 2))
    // and the deep list agrees with the expression-tree fold on its
    // 64-rule prefix where that form is still sound
    val prefix = rules.take(64).toSeq
    val viaReplace = Vocab.bpeApply(docs, "text", prefix)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaFold = Vocab.bpeEncodeLargeK(docs, "text", prefix)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFold == viaReplace)
  }

  test("lmSurprise: hand-computed bigram surprise, short docs zeroed, repetition = low surprise") {
    // corpus: "a b" x3 and "a c" x1 → c(a·)=4, c(a,b)=3, c(a,c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"), (5L, "x"))
      .toDF("doc_id", "text")
    val out = Vocab.lmSurprise(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "a b": surprise = 4*1000 div 3 = 1333; "a c": 4*1000 div 1 = 4000
    assert(out(1L) == ((1L, 1333L, 1333L)))
    assert(out(4L) == ((1L, 4000L, 4000L)))
    // the common transition scores LOWER surprise than the rare one
    assert(out(1L)._2 < out(4L)._2)
    // a one-word doc has no bigrams: all-zero row, still present
    assert(out(5L) == ((0L, 0L, 0L)))
    // multi-bigram doc: sum and floor-average
    val two = Vocab.lmSurprise(Seq((9L, "a b a c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    // within this corpus alone: bigrams (a,b),(b,a),(a,c); c(a·)=2,c(b·)=1
    // surprises: 2000/1=2000, 1000/1=1000, 2000/1=2000 → sum 5000, avg 1666
    assert((two.getLong(1), two.getLong(2), two.getLong(3)) == ((3L, 5000L, 1666L)))
  }

  test("unigram Viterbi: greedy segmentation is cost-optimal vs brute force; total") {
    // hand model: chars cheap-ish, 'ab' cheap, 'abc' cheaper still
    val m = Map("a" -> 12L, "b" -> 12L, "c" -> 14L, "ab" -> 9L, "abc" -> 11L, "bc" -> 30L)
    def cost(p: String): Long = m.getOrElse(p, 1000000000000L)
    def bruteBest(w: String): Long = {
      def go(i: Int): Long =
        if (i == w.length) 0L
        else (1 to math.min(4, w.length - i)).map { l =>
          val c = cost(w.substring(i, i + l))
          if (c >= 1000000000000L) Long.MaxValue / 2 else c + go(i + l)
        }.min
      go(0)
    }
    Seq("abc", "abab", "abcabc", "cab", "aaab", "ccc").foreach { w =>
      val seg = Vocab.unigramSegmentWord(w, cost, 4)
      assert(seg.mkString("") == w, s"$w: segmentation must cover the word")
      assert(seg.map(cost).sum == bruteBest(w),
        s"$w: greedy ${seg.mkString("·")} not optimal")
    }
    // hand-computed: 'abc' single piece wins (11 < ab+c=23 < a+b+c=38)
    assert(Vocab.unigramSegmentWord("abc", cost, 4) == Seq("abc"))
    // ties: 'abab' = ab·ab (18); on-path pieces include both 'ab's
    assert(Vocab.unigramSegmentWord("abab", cost, 4) == Seq("ab", "ab"))
    // lattice support counts multiplicity per position pair
    assert(Vocab.unigramOnPath("abab", cost, 4).count(_ == "ab") == 2)
  }

  test("unigram train: model covers the alphabet, encode is total and deterministic") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(80)
    val model = Vocab.unigramTrain(docs, "text", vocabSize = 100, rounds = 2,
      maxLen = 4, seedSize = 200)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every character of the corpus survives (totality)
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= " ").distinct()
      .collect().map(_.getString(0)).toSet
    val pieces = model.map(_._1).toSet
    assert(chars.subsetOf(pieces), (chars -- pieces).toString)
    // costs all finite-positive; multi-char pieces exist (EM found structure)
    assert(model.forall(_._3 > 0))
    assert(model.exists(_._1.length > 1))
    val enc = Vocab.unigramEncode(docs, "doc_id", "text",
      model.map(t => (t._1, t._3)), maxLen = 4)
    // segmentation concatenates back to the original text
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val got = enc.filter(col("doc_id") === id).head()
      assert(got.getString(3).replace("·", "") ==
        text.split(" ").filter(_.nonEmpty).mkString(" "))
      assert(got.getLong(1) >= text.split(" ").count(_.nonEmpty))
    }
    // partition invariance
    val a = enc.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Vocab.unigramEncode(docs.repartition(7), "doc_id", "text",
      model.map(t => (t._1, t._3)), maxLen = 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("unigramPrune: loss ranking beats count ranking; chars survive; exact target; determinism") {
    import spark.implicits._
    // corpus: 'xy' is rare, 'qz' is common
    val docs = (Seq.fill(2)("xy") ++ Seq.fill(20)("qz"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // model counts: 'xy' LOOKS important (high count → cheap cost, so
    // removing it barely hurts — the char path is nearly as cheap),
    // 'qz' looks unimportant (count 3) but its chars are expensive, so
    // removal costs a lot per occurrence × 20 occurrences
    val model = Seq("x" -> 100L, "y" -> 100L, "q" -> 1L, "z" -> 1L,
      "xy" -> 50L, "qz" -> 3L)
    val pruned = Vocab.unigramPrune(docs, "text", model, targetSize = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact target, all four chars survive with loss 0
    assert(pruned.length == 5)
    assert(pruned.filter(_._1.length == 1).map(_._1).sorted.toSeq ==
      Seq("q", "x", "y", "z"))
    assert(pruned.filter(_._1.length == 1).forall(_._4 == 0L))
    // the count-ranked rule would keep 'xy' (50 > 3); loss ranking
    // keeps 'qz' — the piece whose removal actually hurts the corpus
    assert(pruned.map(_._1).contains("qz") && !pruned.map(_._1).contains("xy"),
      pruned.mkString(","))
    // determinism: same inputs, identical rows
    val again = Vocab.unigramPrune(docs, "text", model, targetSize = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == pruned.toSeq)
    // a piece on NO optimal path prices at 0 and is eliminated first
    // among equals; equal (loss, cnt) ties break lexicographically
    val model2 = Seq("a" -> 10L, "b" -> 10L, "ab" -> 5L, "ba" -> 5L)
    val docs2 = Seq((1L, "ab ab")).toDF("id", "text")
    val p2 = Vocab.unigramPrune(docs2, "text", model2, targetSize = 3)
      .collect().map(_.getString(0)).toSeq
    assert(p2 == Seq("a", "ab", "b"), p2.toString) // 'ba' never on-path, loss 0
    // pruning below the char floor is refused loudly
    intercept[IllegalArgumentException] {
      Vocab.unigramPrune(docs2, "text", model2, targetSize = 1)
    }
    // the pruned model still segments the corpus (totality via chars)
    val seg = Vocab.unigramEncode(docs, "id", "text",
      pruned.map(p => (p._1, p._3)).toSeq)
      .collect()
    assert(seg.length == 22 && seg.forall(_.getAs[Long]("n_pieces") > 0))
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
