package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline
  * (builder brief): token counting, quality scoring, language-ID
  * heuristic, content fingerprinting, and the multimodal binary-column
  * plumbing. All pure column expressions (codegen'd, no UDFs); every
  * formula is spelled identically in the DuckDB oracle.
  *
  * Parity notes: DuckDB 1.0 lacks regexp_count → len(regexp_extract_all)
  * on both sides via Spark's regexp_count (same RE2-safe patterns);
  * rolling hashes build the char-code list with an explicit
  * generate_series/sequence so neither engine's split('') edge cases
  * (trailing empties) are involved; all accumulators are BIGINT.
  */
object TextQueries {

  /** occurrences of `m` in text via length arithmetic — identical
    * integer math in both engines. */
  private def occ(m: String) =
    (length(col("text")) - length(regexp_replace(col("text"), m, ""))) / m.length

  private def occSql(m: String) =
    s"(length(text) - length(replace(text, '$m', ''))) / ${m.length}"

  /** Once-per-JVM BPE training for the encode gate (the merge list is
    * k rows of driver-side model state — the Fixtures discipline
    * applied to a model instead of a directory, so bench measures the
    * ENCODE, not a retrain per invocation). */
  private val bpeMergeCache =
    scala.collection.mutable.Map.empty[String, Seq[(String, String)]]
  private def trainedMerges(s: SparkSession, dir: String, k: Int): Seq[(String, String)] =
    bpeMergeCache.synchronized {
      bpeMergeCache.getOrElseUpdate(s"$dir|$k",
        graft.operators.Vocab.bpeTrain(Tables.documents(s, dir), "text", k)
          .orderBy(col("step")).collect()
          .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
          .toSeq)
    }

  /** Once-per-JVM unigram-LM training for the encode gate — same
    * model-state caching discipline as [[trainedMerges]]. */
  private val unigramModelCache =
    scala.collection.mutable.Map.empty[String, Seq[(String, Long)]]
  private def trainedUnigram(s: SparkSession, dir: String): Seq[(String, Long)] =
    unigramModelCache.synchronized {
      unigramModelCache.getOrElseUpdate(dir,
        graft.operators.Vocab.unigramTrain(Tables.documents(s, dir), "text",
          vocabSize = 200, rounds = 2, maxLen = 5, seedSize = 400)
          .collect()
          .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cost")))
          .toSeq)
    }

  def defs: Seq[QDef] = Seq(

    // Token counting: whitespace tokens + word-regex tokens + a BPE-ish
    // segmentation (letter runs / digit runs / single specials).
    QDef(
      "x_text_tokens",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("word_tokens"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("bpeish_tokens"),
          (length(regexp_replace(col("text"), " ", "")).cast("double") /
            regexp_count(col("text"), lit("[a-z0-9]+"))).as("avg_word_len"))
        .orderBy(col("doc_id")),
      Some(
        """SELECT doc_id,
          |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
          |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS word_tokens,
          |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpeish_tokens,
          |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
          |    / len(regexp_extract_all(text, '[a-z0-9]+')) AS avg_word_len
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length band, stopword ratio, alpha ratio —
    // the length/punct/stopword heuristics of pretraining-data filters.
    QDef(
      "x_text_quality",
      (s, dir) => {
        val words = regexp_count(col("text"), lit("[a-z0-9]+")).cast("double")
        val stops = (occ(" the ") + occ(" a ") + occ(" of ")).cast("double")
        val alpha = regexp_count(col("text"), lit("[a-z]")).cast("double") / length(col("text"))
        val lenScore = least(words / 100.0, lit(1.0))
        val score = lenScore * 0.4 + least(stops / words * 10.0, lit(1.0)) * 0.3 + alpha * 0.3
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            words.cast("long").as("n_words"),
            (floor(stops / words * 10000 + lit(0.5)) / 10000.0).as("stop_ratio_x10k"),
            (floor(alpha * 10000 + lit(0.5)) / 10000.0).as("alpha_ratio"),
            (floor(score * 10000 + lit(0.5)) / 10000.0).as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH q AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS DOUBLE) AS words,
           |    CAST(${occSql(" the ")} + ${occSql(" a ")} + ${occSql(" of ")} AS DOUBLE) AS stops,
           |    CAST(len(regexp_extract_all(text, '[a-z]')) AS DOUBLE) / length(text) AS alpha
           |  FROM documents
           |)
           |SELECT doc_id,
           |  CAST(words AS BIGINT) AS n_words,
           |  floor(stops / words * 10000 + 0.5) / 10000.0 AS stop_ratio_x10k,
           |  floor(alpha * 10000 + 0.5) / 10000.0 AS alpha_ratio,
           |  floor((least(words / 100.0, 1.0) * 0.4
           |       + least(stops / words * 10.0, 1.0) * 0.3
           |       + alpha * 0.3) * 10000 + 0.5) / 10000.0 AS quality_score
           |FROM q ORDER BY doc_id""".stripMargin)),

    // Gopher-style rule filter (Rae et al. 2021 §A1.1): the published
    // DECISION rules, not a blended score — word-count band, mean word
    // length band, symbol-to-word ratio, alphabetic-word ratio, and
    // stop-word presence, each surfaced as its own boolean plus the
    // conjunctive keep. Stop list adapted to the fixture vocabulary
    // ({the, a, of, and, to}; the corpus carries 'the' and 'a') so the
    // presence rule actually splits the corpus. Pure codegen'd column
    // math; the oracle replays every rule.
    QDef(
      "x_quality_gopher",
      (s, dir) => {
        val ws = split(col("text"), " ")
        val nWords = size(ws).cast("long")
        val lenSum = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
        val meanWlen = lenSum.cast("double") / nWords.cast("double")
        val sym = (regexp_count(col("text"), lit("#")) +
          regexp_count(col("text"), lit("\\.\\.\\."))).cast("double")
        val alphaWords = size(filter(ws, w => w.rlike("[a-z]"))).cast("double")
        val padded = concat(lit(" "), col("text"), lit(" "))
        val stopHits = Seq("the", "a", "of", "and", "to")
          .map(sw => when(instr(padded, s" $sw ") > 0, 1L).otherwise(0L))
          .reduce(_ + _)
        val rWc = nWords >= 50L && nWords <= 100000L
        val rMwl = meanWlen >= 3.0 && meanWlen <= 10.0
        val rSym = sym / nWords.cast("double") < 0.1
        val rAlpha = alphaWords / nWords.cast("double") >= 0.8
        val rStop = stopHits >= 2L
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            nWords.as("n_words"),
            (floor(meanWlen * 10000 + lit(0.5)) / 10000.0).as("mean_wlen"),
            stopHits.as("stop_hits"),
            rWc.as("r_word_count"),
            rMwl.as("r_mean_word_len"),
            rSym.as("r_symbol_ratio"),
            rAlpha.as("r_alpha_words"),
            rStop.as("r_stopwords"),
            (rWc && rMwl && rSym && rAlpha && rStop).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(
        """WITH q AS (
          |  SELECT doc_id,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          |    CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS len_sum,
          |    CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS sym,
          |    CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) AS alpha_words,
          |    (CASE WHEN instr(' ' || text || ' ', ' the ') > 0 THEN 1 ELSE 0 END
          |   + CASE WHEN instr(' ' || text || ' ', ' a ') > 0 THEN 1 ELSE 0 END
          |   + CASE WHEN instr(' ' || text || ' ', ' of ') > 0 THEN 1 ELSE 0 END
          |   + CASE WHEN instr(' ' || text || ' ', ' and ') > 0 THEN 1 ELSE 0 END
          |   + CASE WHEN instr(' ' || text || ' ', ' to ') > 0 THEN 1 ELSE 0 END) AS stop_hits,
          |    CAST(len_sum AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_wlen
          |  FROM documents
          |)
          |SELECT doc_id, n_words,
          |  floor(mean_wlen * 10000 + 0.5) / 10000.0 AS mean_wlen,
          |  CAST(stop_hits AS BIGINT) AS stop_hits,
          |  n_words >= 50 AND n_words <= 100000 AS r_word_count,
          |  mean_wlen >= 3.0 AND mean_wlen <= 10.0 AS r_mean_word_len,
          |  sym / CAST(n_words AS DOUBLE) < 0.1 AS r_symbol_ratio,
          |  alpha_words / CAST(n_words AS DOUBLE) >= 0.8 AS r_alpha_words,
          |  stop_hits >= 2 AS r_stopwords,
          |  (n_words >= 50 AND n_words <= 100000)
          |    AND (mean_wlen >= 3.0 AND mean_wlen <= 10.0)
          |    AND (sym / CAST(n_words AS DOUBLE) < 0.1)
          |    AND (alpha_words / CAST(n_words AS DOUBLE) >= 0.8)
          |    AND (stop_hits >= 2) AS keep
          |FROM q ORDER BY doc_id""".stripMargin)),

    // Language-ID: marker-word scoring with deterministic precedence.
    // (The synthetic corpus shares one vocabulary across `lang` values,
    // so the interesting property is the scoring pipeline, not recall.)
    QDef(
      "x_lang_id",
      (s, dir) => {
        val en = occ(" the ") + occ(" a ")
        val fr = occ(" le ") + occ(" et ")
        val de = occ(" der ") + occ(" und ")
        val es = occ(" el ") + occ(" los ")
        Tables.documents(s, dir)
          .select(
            col("doc_id"), col("lang").as("labeled_lang"),
            en.cast("long").as("s_en"), fr.cast("long").as("s_fr"),
            de.cast("long").as("s_de"), es.cast("long").as("s_es"),
            when(greatest(en, fr, de, es) === 0, "und")
              .when(en >= greatest(fr, de, es), "en")
              .when(fr >= greatest(de, es), "fr")
              .when(de >= es, "de")
              .otherwise("es").as("predicted_lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        val (en, fr, de, es) = (
          s"${occSql(" the ")} + ${occSql(" a ")}",
          s"${occSql(" le ")} + ${occSql(" et ")}",
          s"${occSql(" der ")} + ${occSql(" und ")}",
          s"${occSql(" el ")} + ${occSql(" los ")}")
        s"""SELECT doc_id, lang AS labeled_lang,
           |  CAST($en AS BIGINT) AS s_en, CAST($fr AS BIGINT) AS s_fr,
           |  CAST($de AS BIGINT) AS s_de, CAST($es AS BIGINT) AS s_es,
           |  CASE WHEN greatest($en, $fr, $de, $es) = 0 THEN 'und'
           |       WHEN $en >= greatest($fr, $de, $es) THEN 'en'
           |       WHEN $fr >= greatest($de, $es) THEN 'fr'
           |       WHEN $de >= $es THEN 'de'
           |       ELSE 'es' END AS predicted_lang
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // The classifier's quality, measured: label × prediction confusion
    // matrix with per-label recall — the evaluation artifact any
    // heuristic filter ships with. Same scorer as x_lang_id; two hash
    // aggregates (cells, then label totals) + a broadcast-sized join.
    QDef(
      "x_lang_confusion",
      (s, dir) => {
        val en = occ(" the ") + occ(" a ")
        val fr = occ(" le ") + occ(" et ")
        val de = occ(" der ") + occ(" und ")
        val es = occ(" el ") + occ(" los ")
        val pred = when(greatest(en, fr, de, es) === 0, "und")
          .when(en >= greatest(fr, de, es), "en")
          .when(fr >= greatest(de, es), "fr")
          .when(de >= es, "de")
          .otherwise("es")
        val cells = Tables.documents(s, dir)
          .select(col("lang").as("labeled_lang"), pred.as("predicted_lang"))
          .groupBy(col("labeled_lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n_docs"))
        val totals = cells.groupBy(col("labeled_lang"))
          .agg(sum(col("n_docs")).as("n_label"))
        cells.join(totals, Seq("labeled_lang"))
          .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
            graft.functions.Arith.r4(
              col("n_docs").cast("double") / col("n_label")).as("cell_share"))
          .orderBy(col("labeled_lang"), col("predicted_lang"))
      },
      Some {
        val (en, fr, de, es) = (
          s"${occSql(" the ")} + ${occSql(" a ")}",
          s"${occSql(" le ")} + ${occSql(" et ")}",
          s"${occSql(" der ")} + ${occSql(" und ")}",
          s"${occSql(" el ")} + ${occSql(" los ")}")
        s"""WITH pred AS (
           |  SELECT lang AS labeled_lang,
           |         CASE WHEN greatest($en, $fr, $de, $es) = 0 THEN 'und'
           |              WHEN $en >= greatest($fr, $de, $es) THEN 'en'
           |              WHEN $fr >= greatest($de, $es) THEN 'fr'
           |              WHEN $de >= $es THEN 'de'
           |              ELSE 'es' END AS predicted_lang
           |  FROM documents
           |), cells AS (
           |  SELECT labeled_lang, predicted_lang, count(*) AS n_docs
           |  FROM pred GROUP BY 1, 2
           |), totals AS (
           |  SELECT labeled_lang, CAST(sum(n_docs) AS BIGINT) AS n_label
           |  FROM cells GROUP BY 1
           |)
           |SELECT labeled_lang, predicted_lang, n_docs,
           |       ${graft.functions.Arith.sqlR4(
               "CAST(n_docs AS DOUBLE) / n_label")} AS cell_share
           |FROM cells JOIN totals USING (labeled_lang)
           |ORDER BY labeled_lang, predicted_lang""".stripMargin
      }),

    // Content fingerprinting: cryptographic (md5) + rolling polynomial
    // hash (mod 1e9+7) — native expression, one compiled loop per row
    // (graft.functions.RollingPolyHash).
    QDef(
      "x_fingerprint",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          md5(col("text")).as("content_md5"),
          graft.functions.TextFunctions.rollingPolyHash(col("text")).as("rolling_hash"))
        .orderBy(col("doc_id")),
      Some(
        """SELECT doc_id, md5(text) AS content_md5,
          |  list_reduce(
          |    list_prepend(CAST(0 AS BIGINT),
          |      list_transform(generate_series(1, length(text)), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
          |    (a, c) -> (a * 31 + c) % 1000000007) AS rolling_hash
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multimodal metadata surface, oracle-checkable (pure column math).
    // The batch decode/resize/frame-sample plumbing lives in
    // operators/Multimodal.scala (mapPartitions with a stubbed codec,
    // tested in MultimodalSpec); this query checks the schema/bytes
    // path: utf-8 encode, octet length, sha2-256, derived dimensions.
    QDef(
      "x_multimodal_meta",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("payload_bytes"),
          sha2(encode(col("text"), "utf-8"), 256).as("payload_sha256"),
          ((ascii(substring(col("text"), 1, 1)) % 64 + 1) * 16).cast("long").as("fake_width"),
          ((col("n_chars") % 64 + 1) * 16).cast("long").as("fake_height"),
          (col("n_chars") % 10 + 1).cast("long").as("fake_frames"))
        .orderBy(col("doc_id")),
      Some(
        """SELECT doc_id,
          |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_bytes,
          |  sha256(text) AS payload_sha256,
          |  CAST((ascii(substr(text, 1, 1)) % 64 + 1) * 16 AS BIGINT) AS fake_width,
          |  CAST((n_chars % 64 + 1) * 16 AS BIGINT) AS fake_height,
          |  CAST(n_chars % 10 + 1 AS BIGINT) AS fake_frames
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // The mapPartitions batch-decode path itself, oracle-checked: the
    // stub codec is a modular rolling hash over the payload bytes, so
    // DuckDB reproduces width/height/frames/content_hash exactly; the
    // feature vector is compared via its exact integer checksum
    // (features are nibble/255f — float arrays don't hash-compare).
    QDef(
      "x_multimodal_decode",
      // REAL decode, THREE formats: id%3==0 lands as a 24-bit BMP
      // (76-byte stride, genuine padding), 1 as an 8-bit RGB PNG (zlib
      // IDAT, filtered scanlines) — both carrying the document's text
      // bytes as pixels — and 2 as a baseline sequential JPEG (one
      // constant 8×8 block per text byte: DC-only blocks under flat
      // quantization round-trip the lossy format exactly). The oracle
      // PREDICTS every decode arithmetically — dims from each
      // encoding's geometry, content hash over the decoded pixel
      // stream (for JPEG, the block expansion is replayed in closed
      // form via rolling-hash composition with precomputed 31^k mod p
      // constants) — so a stride, row-order, inflate, filter, Huffman,
      // or IDCT bug in ANY parser is a hash mismatch, not a
      // silently-agreeing stub.
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val media = graft.operators.Multimodal.asMixedMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        val checksum = (0 until graft.operators.Multimodal.FeatureDim)
          .map(k => shiftright(col("content_hash"), k * 3).bitwiseAND(lit(255L)))
          .reduce[org.apache.spark.sql.Column](_ + _)
        graft.operators.Multimodal.decode(media).toDF()
          .select(col("media_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"),
            col("content_hash"), checksum.as("feature_checksum"))
          .orderBy(col("media_id"))
      },
      Some {
        val checksum = (0 until graft.operators.Multimodal.FeatureDim)
          .map(k => s"((h >> ${k * 3}) & 255)").mkString(" + ")
        val rowBytes = graft.operators.Multimodal.BmpMediaWidth * 3
        val bpr = graft.operators.Multimodal.JpegBlocksPerRow
        // rolling-hash composition constants for the JPEG block
        // expansion: h over the pixel stream decomposes into a fold
        // over text bytes because every byte occupies a fixed 8×8
        // block — scanline: h*T + b*S8; ×8 scanlines: *R8; block-rows
        // chain with *Q (all mod p; overflow-safe in BIGINT since
        // every operand stays below 2^30 or 2^43).
        val p = 1000000007L
        val t31 = BigInt(31).modPow(8, p)
        val s8 = (0 to 7).map(j => BigInt(31).pow(j)).sum
        val p200 = BigInt(31).modPow(8 * bpr, p)
        val r8 = (0 to 7).map(j => p200.modPow(j, p)).sum % p
        val q = p200.modPow(8, p)
        s"""WITH geom AS (
           |  SELECT doc_id AS media_id, text,
           |         greatest(CAST(ceil(length(text) / $rowBytes.0) AS BIGINT), 1) AS hgt
           |  FROM documents WHERE doc_id % 3 < 2
           |), hashed AS (
           |  SELECT media_id, hgt,
           |         list_reduce(
           |           list_prepend(CAST(0 AS BIGINT),
           |             list_concat(
           |               list_transform(generate_series(1, length(text)),
           |                 i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
           |               list_transform(generate_series(1, hgt * $rowBytes - length(text)),
           |                 i -> CAST(0 AS BIGINT)))),
           |           (a, c) -> (a * 31 + c) % $p) AS h
           |  FROM geom
           |), jg AS (
           |  SELECT doc_id AS media_id, text, length(text) AS len,
           |         greatest(CAST(ceil(length(text) / $bpr.0) AS BIGINT), 1) AS nrows
           |  FROM documents WHERE doc_id % 3 = 2
           |), jr AS (
           |  SELECT media_id, nrows, r,
           |         list_reduce(
           |           list_prepend(CAST(0 AS BIGINT),
           |             list_transform(generate_series(1, $bpr),
           |               c -> CAST(CASE WHEN (r - 1) * $bpr + c <= len
           |                              THEN ascii(substr(text, (r - 1) * $bpr + c, 1))
           |                              ELSE 0 END AS BIGINT))),
           |           (a, b) -> (a * $t31 + b * $s8) % $p) AS hrow
           |  FROM jg, UNNEST(generate_series(1, nrows)) t(r)
           |), jh AS (
           |  SELECT media_id, max(nrows) AS nrows,
           |         list_reduce(
           |           list_prepend(CAST(0 AS BIGINT),
           |             list((hrow * $r8) % $p ORDER BY r)),
           |           (a, h) -> (a * $q + h) % $p) AS h
           |  FROM jr GROUP BY media_id
           |), allrows AS (
           |  SELECT media_id,
           |         CAST(${graft.operators.Multimodal.BmpMediaWidth} AS BIGINT) AS width,
           |         hgt AS height, h
           |  FROM hashed
           |  UNION ALL
           |  SELECT media_id, CAST(${bpr * 8} AS BIGINT) AS width,
           |         nrows * 8 AS height, h
           |  FROM jh
           |)
           |SELECT media_id, width, height,
           |       CAST(1 AS BIGINT) AS n_frames,
           |       h AS content_hash,
           |       CAST($checksum AS BIGINT) AS feature_checksum
           |FROM allrows ORDER BY media_id""".stripMargin
      }),

    // The COLOR decode path, hash-gated end to end: every payload is a
    // 3-component 4:4:4 YCbCr baseline JPEG (one constant color block
    // per text byte — Y/Cb/Cr a fixed arithmetic function of the
    // byte), so interleaved-MCU entropy decode, three DC predictors,
    // and the JFIF YCbCr→RGB conversion all land in the content hash.
    // The oracle recomputes each byte's RGB triple with the identical
    // IEEE sequence and folds the 64×-expanded 3-byte-per-pixel stream
    // via rolling-hash composition constants.
    QDef(
      "x_multimodal_color",
      (s, dir) => {
        // the color fixture is ~9× the mixed gate's codec work (every
        // doc, 3 blocks per byte) and the source is ONE parquet file —
        // spread the encode+decode across the executor threads the way
        // a real many-file corpus would arrive
        val media = graft.operators.Multimodal.asColorJpegMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        val checksum = (0 until graft.operators.Multimodal.FeatureDim)
          .map(k => shiftright(col("content_hash"), k * 3).bitwiseAND(lit(255L)))
          .reduce[org.apache.spark.sql.Column](_ + _)
        graft.operators.Multimodal.decode(media).toDF()
          .select(col("media_id"), col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"),
            col("content_hash"), checksum.as("feature_checksum"))
          .orderBy(col("media_id"))
      },
      Some {
        val checksum = (0 until graft.operators.Multimodal.FeatureDim)
          .map(k => s"((h >> ${k * 3}) & 255)").mkString(" + ")
        val bpr = graft.operators.Multimodal.JpegBlocksPerRow
        val p = 1000000007L
        // composition constants over the 3-byte-per-pixel stream:
        // pixel advance = 31^3; 8 identical pixels, then 8 identical
        // 600-byte scanlines, then block-row chaining
        val t3 = BigInt(31).modPow(3, p)
        val s83 = (0 to 7).map(j => t3.modPow(j, p)).sum % p
        val t24 = t3.modPow(8, p)
        val p600 = BigInt(31).modPow(3 * 8 * bpr, p)
        val r8c = (0 to 7).map(j => p600.modPow(j, p)).sum % p
        val qc = p600.modPow(8, p)
        s"""WITH jg AS (
           |  SELECT doc_id AS media_id, text, length(text) AS len,
           |         greatest(CAST(ceil(length(text) / $bpr.0) AS BIGINT), 1) AS nrows
           |  FROM documents
           |), jb AS (
           |  SELECT media_id, nrows, ((i - 1) // $bpr) + 1 AS r, i,
           |         ((rr * 31 + gg) * 31 + bb) AS hp
           |  FROM (
           |    SELECT media_id, nrows, i,
           |           LEAST(GREATEST(CAST(floor((y + 1.402 * crv) + 0.5) AS BIGINT), 0), 255) AS rr,
           |           LEAST(GREATEST(CAST(floor(((y - 0.344136 * cbv) - 0.714136 * crv) + 0.5) AS BIGINT), 0), 255) AS gg,
           |           LEAST(GREATEST(CAST(floor((y + 1.772 * cbv) + 0.5) AS BIGINT), 0), 255) AS bb
           |    FROM (
           |      SELECT media_id, nrows, i,
           |             CAST(b AS DOUBLE) AS y,
           |             CAST((7 * b + 13) % 256 AS DOUBLE) - 128.0 AS cbv,
           |             CAST((31 * b + 29) % 256 AS DOUBLE) - 128.0 AS crv
           |      FROM (
           |        SELECT media_id, nrows, i,
           |               CASE WHEN i <= len THEN ascii(substr(text, i, 1)) ELSE 0 END AS b
           |        FROM jg, UNNEST(generate_series(1, nrows * $bpr)) t(i))))
           |), jr AS (
           |  SELECT media_id, nrows, r,
           |         list_reduce(
           |           list_prepend(CAST(0 AS BIGINT), list(hp ORDER BY i)),
           |           (a, h) -> (a * $t24 + h * $s83) % $p) AS hrow
           |  FROM jb GROUP BY media_id, nrows, r
           |), jh AS (
           |  SELECT media_id, max(nrows) AS nrows,
           |         list_reduce(
           |           list_prepend(CAST(0 AS BIGINT), list((hrow * $r8c) % $p ORDER BY r)),
           |           (a, h) -> (a * $qc + h) % $p) AS h
           |  FROM jr GROUP BY media_id
           |)
           |SELECT media_id, CAST(${bpr * 8} AS BIGINT) AS width,
           |       nrows * 8 AS height, CAST(1 AS BIGINT) AS n_frames,
           |       h AS content_hash, CAST($checksum AS BIGINT) AS feature_checksum
           |FROM jh ORDER BY media_id""".stripMargin
      }),

    // Sliding-window chunking — the sequence-preparation step before
    // training and the passage split for retrieval indexes: 40-token
    // windows advancing by 32 (8-token overlap), every chunk's full
    // text in the hash. Pure per-row column math, no shuffle.
    QDef(
      "x_chunk_docs",
      (s, dir) => graft.operators.Curation.chunkDocs(
        Tables.documents(s, dir), "doc_id", "text", window = 40, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some(
        """WITH w AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |), g AS (
          |  SELECT doc_id, w,
          |         1 + CAST(ceil(greatest(len(w) - 40, 0) / 32.0) AS INT) AS n
          |  FROM w
          |)
          |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
          |       array_to_string(list_slice(w, i * 32 + 1, i * 32 + 40), ' ') AS chunk_text,
          |       CAST(len(list_slice(w, i * 32 + 1, i * 32 + 40)) AS BIGINT) AS n_tokens
          |FROM g, UNNEST(generate_series(0, n - 1)) t(i)
          |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Statistical LM quality filter: per-doc bigram surprise (the
    // integer-scaled reciprocal of P(w2|w1) under the corpus's own
    // bigram counts) — the role a KenLM perplexity filter plays in a
    // CCNet-style pipeline, in the integer-exact form both engines
    // replay bit-for-bit (perplexity's log-domain mean is not
    // bit-portable; surprise is a monotone transform of the same
    // per-bigram quantity).
    QDef(
      "x_lm_surprise",
      (s, dir) => graft.operators.Vocab.lmSurprise(
        Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(graft.operators.Vocab.lmSurpriseOracleSql(
        "documents", "doc_id", "text") + "\nORDER BY doc_id")),

    // Lexical retrieval 1: the inverted-index build itself, postings
    // for a fixed probe vocabulary hash-checked (term frequencies,
    // per-doc) — one corpus hash aggregate.
    QDef(
      "x_inverted_postings",
      (s, dir) => graft.operators.TextSearch.invertedIndex(
        Tables.documents(s, dir), "doc_id", "text")
        .filter(col("term").isin("spark", "hash", "join"))
        .orderBy(col("term"), desc("tf"), col("doc_id"))
        .limit(100),
      Some(
        """SELECT term, doc_id, count(*) AS tf FROM (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
          |) WHERE term IN ('spark', 'hash', 'join')
          |GROUP BY term, doc_id
          |ORDER BY term, tf DESC, doc_id LIMIT 100""".stripMargin)),

    // Lexical retrieval 2: BM25 top-k for a bag-of-words query — the
    // search capability next to embedding similarity. The gate hashes
    // RANKS plus integer evidence (matched terms, summed tf, doc
    // length), never the float score: BM25's idf is a log, which is
    // not bit-portable across engines, but mathematically distinct
    // scores differ by far more than a ulp and equal ones tie-break on
    // doc_id — so the RANKING is engine-exact (TextSearchSpec pins the
    // scoring behavior in-JVM).
    QDef(
      "x_bm25_topk",
      (s, dir) => graft.operators.TextSearch.bm25TopK(
        Tables.documents(s, dir), "doc_id", "text",
        query = Seq("spark", "hash", "join", "stream"), k = 50),
      Some(graft.operators.TextSearch.bm25OracleSql(
        "documents", "doc_id", "text",
        query = Seq("spark", "hash", "join", "stream"), k = 50))),

    // Lexical retrieval 3: BM25 against a QUERY TABLE — the
    // decontamination-review shape (thousands of benchmark prompts
    // ranked in ONE corpus pass, not one pass per query). The query
    // table is derived from the corpus itself (every 25th document's
    // first five words), so both engines construct it identically; the
    // per-(doc, term) tf aggregate is the only corpus-sized shuffle
    // regardless of query count (PlanSpec pins that), and per-query
    // top-k goes through the bucketed two-phase group-limit. Same
    // log-free hash discipline as x_bm25_topk.
    QDef(
      "x_bm25_batch",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val queries = docs.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
        graft.operators.TextSearch.bm25TopKBatch(
          docs, "doc_id", "text", queries, "query_id", "qtext", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(graft.operators.TextSearch.bm25BatchOracleSql(
        "documents", "doc_id", "text",
        queriesCte =
          """SELECT doc_id AS query_id,
            |         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS qtext
            |  FROM documents WHERE doc_id % 25 = 0""".stripMargin,
        k = 10))),

    // Lexical retrieval 4: the inverted index AS A LAKE, grown in two
    // increments and searched with term-partition pruning — the
    // search-engine shape for a continuously-ingested corpus (the
    // one-shot forms re-tokenize the corpus per call; the lake reads
    // only the query terms' partitions). Must hash against the SAME
    // oracle as x_bm25_topk: append-only ingest makes df/tf/stats over
    // the lake identical to the one-shot computation on the union.
    QDef(
      "x_bm25_lake_incremental",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        graft.sources.PostingsLake.search(s, s"$lake/lake",
          Seq("spark", "hash", "join", "stream"), k = 50)
          .orderBy(col("rank"))
      },
      Some(graft.operators.TextSearch.bm25OracleSql(
        "documents", "doc_id", "text",
        query = Seq("spark", "hash", "join", "stream"), k = 50))),

    // Lexical retrieval 4b: the QUERY-TABLE form against the lake —
    // the decontamination-review shape at index scale (a prompt table
    // ranked in ONE pruned index pass; search()'s isin() literal list
    // is the interactive shape). Reuses the two-increment lake
    // fixture, so equality with x_bm25_batch's oracle proves the
    // whole chain: lake df/tf/ledger-stats over pruned partitions ≡
    // the one-shot corpus computation, per query, hash-checked.
    QDef(
      "x_bm25_lake_batch",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        val queries = Tables.documents(s, dir).filter(col("doc_id") % 25 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
        graft.sources.PostingsLake.searchBatch(s, s"$lake/lake",
          queries, "query_id", "qtext", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(graft.operators.TextSearch.bm25BatchOracleSql(
        "documents", "doc_id", "text",
        queriesCte =
          """SELECT doc_id AS query_id,
            |         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS qtext
            |  FROM documents WHERE doc_id % 25 = 0""".stripMargin,
        k = 10))),

    // Exact PHRASE search — the retrieval primitive bag-of-words BM25
    // cannot express. The phrase is the first three words of the
    // lowest-id document, derived identically by both engines; the
    // anchor-vote formulation (each matching token votes pos − off;
    // an anchor with all offsets distinct-counted is one contiguous
    // occurrence) is replayed by the oracle as the same join + two
    // aggregates — occurrence counts and first positions are exact
    // integers, hash-checked.
    QDef(
      "x_phrase_search",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val phrase = docs.orderBy(col("doc_id")).limit(1)
          .select(array_join(slice(split(col("text"), " "), 1, 3), " "))
          .head().getString(0)
        graft.operators.TextSearch.phraseSearch(docs, "doc_id", "text", phrase)
          .orderBy(col("doc_id"))
      },
      Some(phraseOracleSql)),

    // ORDERED PROXIMITY over the same phrase: the words in order
    // within a len+slop token window (slop 2), decided by the exact
    // greedy-minimal chain per start — the loose matching
    // decontamination review needs where contiguity is too strict.
    // Window counts, first starts, and tightest spans are exact
    // integers; the oracle unrolls the same greedy fold per slot, so
    // one wrong chain step anywhere in the corpus is a hash mismatch.
    QDef(
      "x_proximity_search",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val phrase = docs.orderBy(col("doc_id")).limit(1)
          .select(array_join(slice(split(col("text"), " "), 1, 3), " "))
          .head().getString(0)
        graft.operators.TextSearch.proximitySearch(
          docs, "doc_id", "text", phrase, slop = 2)
          .orderBy(col("doc_id"))
      },
      Some(proximityOracleSql)),

    // The same proximity query answered from the POSITIONAL POSTINGS
    // LAKE — windowed order from the index alone, reading only the
    // words' partitions, multi-tranche postings flattened before the
    // shared chain fold. Must hash against the IDENTICAL oracle as the
    // one-shot x_proximity_search: a position lost or duplicated
    // anywhere in the ingest/compaction path is a mismatch.
    QDef(
      "x_proximity_lake",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        val phrase = Tables.documents(s, dir).orderBy(col("doc_id")).limit(1)
          .select(array_join(slice(split(col("text"), " "), 1, 3), " "))
          .head().getString(0)
        graft.sources.PostingsLake.proximitySearch(s, s"$lake/lake", phrase,
          slop = 2).orderBy(col("doc_id"))
      },
      Some(proximityOracleSql)),

    // The QUERY-TABLE proximity form — the last member of the lake's
    // batch family (BM25, exact phrase, now sloppy phrase):
    // decontamination review runs thousands of loose phrases per pass,
    // and all of them are decided in ONE partition-pruned positional
    // read over the union of their words. Phrase LENGTHS vary (2–4
    // words by doc_id) to exercise the runtime chain fold — the
    // per-phrase greedy-minimal chain is an `aggregate` over each
    // phrase's own slot count, not a compile-time unrolling. The
    // oracle replays the identical greedy fold per phrase (unrolled
    // per length in SQL), so window counts, first starts, and tightest
    // spans hash end to end for every (phrase, doc) pair.
    QDef(
      "x_proximity_lake_batch",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        val phrases = Tables.documents(s, dir).filter(col("doc_id") % 40 === 0)
          .select(col("doc_id").as("phrase_id"),
            array_join(slice(split(col("text"), " "), lit(1),
              (lit(2) + col("doc_id") % 3).cast("int")), " ").as("ptext"))
        graft.sources.PostingsLake.proximitySearchBatch(s, s"$lake/lake",
          phrases, "phrase_id", "ptext", slop = 2)
          .orderBy(col("phrase_id"), col("doc_id"))
      },
      Some(
        """WITH phrases AS (
          |  SELECT doc_id AS phrase_id,
          |         array_to_string(list_slice(string_split(text, ' '), 1,
          |           CAST(2 + doc_id % 3 AS INT)), ' ') AS ptext
          |  FROM documents WHERE doc_id % 40 = 0
          |), pw AS (
          |  SELECT phrase_id, i - 1 AS slot, w[i] AS term, len(w) AS plen
          |  FROM (SELECT phrase_id, string_split(ptext, ' ') AS w FROM phrases),
          |       UNNEST(generate_series(1, len(w))) t(i)
          |), toks AS (
          |  SELECT doc_id, i - 1 AS p, w[i] AS term
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |       UNNEST(generate_series(1, len(w))) t(i)
          |), slotlists AS (
          |  SELECT pw.phrase_id, pw.plen, t.doc_id, pw.slot,
          |         list(t.p ORDER BY t.p) AS ps
          |  FROM toks t JOIN pw ON t.term = pw.term
          |  GROUP BY pw.phrase_id, pw.plen, t.doc_id, pw.slot
          |), m AS (
          |  SELECT phrase_id, plen, doc_id,
          |         any_value(ps) FILTER (WHERE slot = 0) AS ps0,
          |         any_value(ps) FILTER (WHERE slot = 1) AS ps1,
          |         any_value(ps) FILTER (WHERE slot = 2) AS ps2,
          |         any_value(ps) FILTER (WHERE slot = 3) AS ps3
          |  FROM slotlists GROUP BY phrase_id, plen, doc_id
          |  HAVING count(*) = plen
          |), chains AS (
          |  SELECT phrase_id, plen, doc_id, p0,
          |         CASE plen
          |           WHEN 2 THEN list_filter(ps1, x -> x > p0)[1]
          |           WHEN 3 THEN list_filter(ps2, x ->
          |                  x > list_filter(ps1, y -> y > p0)[1])[1]
          |           WHEN 4 THEN list_filter(ps3, x ->
          |                  x > list_filter(ps2, y ->
          |                    y > list_filter(ps1, z -> z > p0)[1])[1])[1]
          |         END AS e
          |  FROM m, UNNEST(ps0) u(p0)
          |), ok AS (
          |  SELECT phrase_id, doc_id, p0, e FROM chains
          |  WHERE e IS NOT NULL AND e - p0 <= plen - 1 + 2
          |)
          |SELECT phrase_id, doc_id, count(*) AS n_windows,
          |       CAST(min(p0) AS BIGINT) AS first_start,
          |       CAST(min(e - p0 + 1) AS BIGINT) AS min_span_tokens
          |FROM ok GROUP BY phrase_id, doc_id
          |ORDER BY phrase_id, doc_id""".stripMargin)),

    // The same phrase answered from the POSITIONAL POSTINGS LAKE —
    // contiguity from the index alone, reading only the phrase words'
    // partitions (PostingsLakeSpec pins the pruned file set). The
    // positions recorded at append index the raw token array, so the
    // lake result must hash against the IDENTICAL oracle as the
    // one-shot x_phrase_search: one anchor off by one anywhere in the
    // ingest path is a mismatch.
    QDef(
      "x_phrase_lake",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        val phrase = Tables.documents(s, dir).orderBy(col("doc_id")).limit(1)
          .select(array_join(slice(split(col("text"), " "), 1, 3), " "))
          .head().getString(0)
        graft.sources.PostingsLake.phraseSearch(s, s"$lake/lake", phrase)
          .orderBy(col("doc_id"))
      },
      Some(phraseOracleSql)),

    // The QUERY-TABLE phrase form — decontamination review at index
    // scale: every 50th document's three-word prefix is a "benchmark
    // phrase", and ALL of them are answered in one partition-pruned
    // pass over the positional postings (the single-string form would
    // re-probe the lake per phrase). The oracle replays the identical
    // anchor-vote per phrase over the same phrase table, so per-phrase
    // occurrence counts and first positions hash end to end — one
    // anchor off by one for any phrase anywhere is a mismatch.
    QDef(
      "x_phrase_lake_batch",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        val phrases = Tables.documents(s, dir).filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("phrase_id"),
            array_join(slice(split(col("text"), " "), 1, 3), " ").as("ptext"))
        graft.sources.PostingsLake.phraseSearchBatch(s, s"$lake/lake",
          phrases, "phrase_id", "ptext")
          .orderBy(col("phrase_id"), col("doc_id"))
      },
      Some(
        """WITH phrases AS (
          |  SELECT doc_id AS phrase_id,
          |         array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS ptext
          |  FROM documents WHERE doc_id % 50 = 0
          |), pw AS (
          |  SELECT phrase_id, i - 1 AS off, w[i] AS term, len(w) AS plen
          |  FROM (SELECT phrase_id, string_split(ptext, ' ') AS w FROM phrases),
          |       UNNEST(generate_series(1, len(w))) t(i)
          |), toks AS (
          |  SELECT doc_id, i - 1 AS p, w[i] AS term
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |       UNNEST(generate_series(1, len(w))) t(i)
          |), votes AS (
          |  SELECT pw.phrase_id, pw.plen, t.doc_id, t.p - pw.off AS anchor, pw.off
          |  FROM toks t JOIN pw ON t.term = pw.term
          |  WHERE t.p - pw.off >= 0
          |), occ AS (
          |  SELECT phrase_id, doc_id, anchor FROM votes
          |  GROUP BY phrase_id, plen, doc_id, anchor
          |  HAVING count(DISTINCT off) = plen
          |)
          |SELECT phrase_id, doc_id, count(*) AS n_occurrences,
          |       CAST(min(anchor) AS BIGINT) AS first_pos
          |FROM occ GROUP BY phrase_id, doc_id
          |ORDER BY phrase_id, doc_id""".stripMargin)),

    // Search-result HIGHLIGHTING: merged ±3-word spans around every
    // hit of the bm25 gates' query terms, reassembled with "…"
    // separators — the last mile of the retrieval stack. The
    // gaps-and-islands merge (new span when hits are > 2·window
    // apart), span clipping at position 0, and the word-level
    // reassembly are all string/integer exact, so the full snippet
    // text hash-checks against the oracle's identical windowed-lag
    // replay.
    QDef(
      "x_highlight",
      (s, dir) => graft.operators.TextSearch.highlight(
        Tables.documents(s, dir), "doc_id", "text",
        terms = Seq("spark", "stream"), window = 3)
        .orderBy(col("doc_id")),
      Some(highlightOracleSql)),

    // The same snippets from the LAKES: hit positions from the
    // positional postings (term-partition pruned, Bloom-admitted),
    // text point-read through the docs lake's doc_id Bloom for ONLY
    // the hit documents — the I/O shape a search UI needs against a
    // corpus-sized index. Must hash against the IDENTICAL oracle as
    // x_highlight: one span boundary or separator off anywhere in the
    // postings-driven reassembly is a mismatch.
    QDef(
      "x_highlight_lake",
      (s, dir) => {
        val plake = Fixtures.dir("bm25_lake_incr", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.append(docs.filter(col("doc_id") % 2 =!= 0),
            "doc_id", "text", s"$o/lake", batchId = Some(1L))
        }
        val dlake = Fixtures.dir("highlight_docs_lake", dir) { o =>
          graft.sources.VersionedLake.create(
            Tables.documents(s, dir).select(col("doc_id"), col("text"))
              .withColumn("dp", pmod(xxhash64(col("doc_id")), lit(16))),
            s"$o/lake", "dp",
            blooms = Seq(graft.sources.VersionedLake.BloomSpec("doc_id")))
        }
        graft.sources.PostingsLake.highlight(s, s"$plake/lake", s"$dlake/lake",
          "doc_id", "text", terms = Seq("spark", "stream"), window = 3)
          .orderBy(col("doc_id"))
      },
      Some(highlightOracleSql)),

    // Retrieval EVALUATION: the harness that scores the stack.
    // Queries are five-word prefixes of every 25th document; the
    // relevance judgments are the documents carrying the exact text
    // the prefix came from (the query doc and its verbatim
    // duplicates) — "did retrieval surface the source?", the standard
    // self-retrieval sanity eval. The BM25 run and the metric
    // arithmetic (1/first_rel_rank, hits/n_rel — single IEEE
    // divisions, no accumulated float sums) are both replayed by the
    // oracle, so per-query MRR terms and recall@k hash end to end.
    QDef(
      "x_retrieval_eval",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val queries = docs.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id").as("query_id"),
            array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
        val run = graft.operators.TextSearch.bm25TopKBatch(
          docs, "doc_id", "text", queries, "query_id", "qtext", k = 10)
        val qrels = docs.filter(col("doc_id") % 25 === 0).alias("q")
          .join(docs.alias("d"), md5(col("q.text")) === md5(col("d.text")))
          .select(col("q.doc_id").as("query_id"), col("d.doc_id").as("doc_id"))
        graft.operators.TextSearch.retrievalMetrics(run, qrels, k = 10)
          .orderBy(col("query_id"))
      },
      Some {
        val runSql = graft.operators.TextSearch.bm25BatchOracleSql(
          "documents", "doc_id", "text",
          queriesCte =
            """SELECT doc_id AS query_id,
              |         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS qtext
              |  FROM documents WHERE doc_id % 25 = 0""".stripMargin,
          k = 10)
        s"""WITH run AS (
           |$runSql
           |), qrels AS (
           |  SELECT q.doc_id AS query_id, d.doc_id
           |  FROM documents q JOIN documents d ON md5(d.text) = md5(q.text)
           |  WHERE q.doc_id % 25 = 0
           |), rels AS (SELECT DISTINCT query_id, doc_id FROM qrels),
           |nrel AS (SELECT query_id, count(*) AS n_rel FROM rels GROUP BY 1),
           |hits AS (
           |  SELECT r.query_id, count(*) AS hits, min(r.rank) AS first_rel_rank
           |  FROM run r JOIN rels USING (query_id, doc_id)
           |  WHERE r.rank <= 10
           |  GROUP BY 1)
           |SELECT n.query_id, n.n_rel,
           |       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           |       CAST(coalesce(h.first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
           |       coalesce(CAST(1.0 AS DOUBLE) / h.first_rel_rank, CAST(0 AS DOUBLE)) AS rr,
           |       CAST(coalesce(h.hits, 0) AS DOUBLE) / n.n_rel AS recall_at_k
           |FROM nrel n LEFT JOIN hits h USING (query_id)
           |ORDER BY query_id""".stripMargin
      }),

    // Lexical retrieval 5: RETRACTION. The index ingests the whole
    // corpus, then half of it is deleted (copy-on-write MERGE touching
    // only the partitions that hold the retracted docs' postings) —
    // search must rank the SURVIVING corpus exactly, with df and the
    // corpus stats shifted accordingly (the oracle recomputes BM25
    // from scratch over the surviving half, so a stale df, avgdl, or
    // an undead posting is a hash mismatch).
    QDef(
      "x_bm25_lake_retract",
      (s, dir) => {
        val lake = Fixtures.dir("bm25_lake_retract", dir) { o =>
          val docs = Tables.documents(s, dir)
          graft.sources.PostingsLake.append(docs, "doc_id", "text",
            s"$o/lake", batchId = Some(0L))
          graft.sources.PostingsLake.delete(
            docs.filter(col("doc_id") % 2 =!= 0), "doc_id",
            s"$o/lake", batchId = Some(1L))
        }
        graft.sources.PostingsLake.search(s, s"$lake/lake",
          Seq("spark", "hash", "join", "stream"), k = 50)
          .orderBy(col("rank"))
      },
      Some(graft.operators.TextSearch.bm25OracleSql(
        "(SELECT * FROM documents WHERE doc_id % 2 = 0) surviving",
        "doc_id", "text",
        query = Seq("spark", "hash", "join", "stream"), k = 50))),

    // The VIDEO arm of the multimodal family: every document lands as
    // a real RIFF/AVI MJPEG container (LIST nesting, avih timing,
    // '00dc' frame chunks), each frame a one-block-row constant-block
    // JPEG of a 25-char text slice. decodeVideoFrames parses the
    // container once and emits every SECOND frame (stride sampling
    // fused into the decode) with its decoded dims and pixel-stream
    // hash — container walk, per-frame Huffman+IDCT, and the sampling
    // arithmetic all land in the hash. The oracle replays each sampled
    // frame's hash in closed form from the text slice (same
    // rolling-hash composition constants as the mixed gate).
    QDef(
      "x_multimodal_video",
      (s, dir) => {
        val media = graft.operators.Multimodal.asAviMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        graft.operators.Multimodal.decodeVideoFrames(media, stride = 2)
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("n_frames").cast("long").as("n_frames"),
            col("us_per_frame"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("frame_hash"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some {
        val bpr = graft.operators.Multimodal.JpegBlocksPerRow
        val p = 1000000007L
        val t31 = BigInt(31).modPow(8, p)
        val s8 = (0 to 7).map(j => BigInt(31).pow(j)).sum
        val p200 = BigInt(31).modPow(8 * bpr, p)
        val r8 = (0 to 7).map(j => p200.modPow(j, p)).sum % p
        s"""WITH g AS (
           |  SELECT doc_id AS media_id, text, length(text) AS len,
           |         greatest(CAST(ceil(length(text) / $bpr.0) AS BIGINT), 1) AS n_frames
           |  FROM documents
           |), fr AS (
           |  SELECT media_id, n_frames, f,
           |         list_reduce(
           |           list_prepend(CAST(0 AS BIGINT),
           |             list_transform(generate_series(1, $bpr),
           |               c -> CAST(CASE WHEN f * $bpr + c <= len
           |                              THEN ascii(substr(text, f * $bpr + c, 1))
           |                              ELSE 0 END AS BIGINT))),
           |           (a, b) -> (a * $t31 + b * $s8) % $p) AS hrow
           |  FROM g, UNNEST(generate_series(0, n_frames - 1)) t(f)
           |  WHERE f % 2 = 0
           |)
           |SELECT media_id, CAST(f AS BIGINT) AS frame_idx, n_frames,
           |       CAST(${graft.operators.Multimodal.AviMicroSecPerFrame} AS BIGINT) AS us_per_frame,
           |       CAST(${bpr * 8} AS BIGINT) AS width,
           |       CAST(8 AS BIGINT) AS height,
           |       (hrow * $r8) % $p AS frame_hash
           |FROM fr ORDER BY media_id, frame_idx""".stripMargin
      }),

    // Video near-dup: the curation capability over the VIDEO modality
    // — container re-encodes and trimmed cuts of the same footage
    // found by set-Jaccard over sampled frame fingerprints. The
    // fixture re-encodes every document three ways (plain AVI; same
    // frames behind a JUNK-chunk container re-encode; a copy with the
    // last frame slice cut) and the operator chain is the 100 TB
    // shape end to end: stride sampling FUSED into the MJPEG decode
    // (half the codec work before any shuffle), then the generic
    // inverted-index Jaccard with the stop-element df-cap — a shared
    // blank/boilerplate frame can never become a quadratic join key.
    // The oracle replays every sampled frame hash in closed form from
    // the text slices and brute-forces the same capped candidate set,
    // so the container walk, per-frame decode, sampling arithmetic,
    // fingerprint composition, AND the Jaccard scoring all land in
    // the hash.
    QDef(
      "x_video_neardup",
      (s, dir) => {
        val media = graft.operators.Multimodal.asRencodedVideoMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        val frames = graft.operators.Multimodal.decodeVideoFrames(media, stride = 2)
          .select(col("media_id").as("doc"), col("frame_hash").as("s"))
        graft.operators.Dedup.setJaccardPairs(frames, "doc", "s",
          threshold = 0.5, maxElemDf = Some(100L))
          .orderBy(col("d1"), col("d2"))
      },
      Some {
        val bpr = graft.operators.Multimodal.JpegBlocksPerRow
        val p = 1000000007L
        val t31 = BigInt(31).modPow(8, p)
        val s8 = (0 to 7).map(j => BigInt(31).pow(j)).sum
        val p200 = BigInt(31).modPow(8 * bpr, p)
        val r8 = (0 to 7).map(j => p200.modPow(j, p)).sum % p
        s"""WITH g AS (
           |  SELECT doc_id, text,
           |         greatest(CAST(ceil(length(text) / $bpr.0) AS BIGINT), 1) AS n0
           |  FROM documents
           |), gv AS (
           |  SELECT doc_id * 4 + t.v AS media_id,
           |         CASE WHEN t.v = 2 AND n0 >= 2
           |              THEN substr(text, 1, $bpr * (n0 - 1)) ELSE text END AS vtext
           |  FROM g, UNNEST([0, 1, 2]) t(v)
           |), gm AS (
           |  SELECT media_id, vtext, length(vtext) AS len,
           |         greatest(CAST(ceil(length(vtext) / $bpr.0) AS BIGINT), 1) AS nf
           |  FROM gv
           |), fr AS (
           |  SELECT media_id,
           |         (list_reduce(
           |            list_prepend(CAST(0 AS BIGINT),
           |              list_transform(generate_series(1, $bpr),
           |                c -> CAST(CASE WHEN f * $bpr + c <= len
           |                               THEN ascii(substr(vtext, f * $bpr + c, 1))
           |                               ELSE 0 END AS BIGINT))),
           |            (a, b) -> (a * $t31 + b * $s8) % $p) * $r8) % $p AS fh
           |  FROM gm, UNNEST(generate_series(0, nf - 1)) t(f)
           |  WHERE f % 2 = 0
           |), fsets AS (
           |  SELECT media_id, list_distinct(list(fh)) AS fs FROM fr GROUP BY media_id
           |), sh AS (
           |  SELECT DISTINCT media_id, fh AS s FROM fr
           |), hot AS (
           |  SELECT s FROM sh GROUP BY s HAVING count(*) > 100
           |), fcold AS (
           |  SELECT media_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
           |), cand AS (
           |  SELECT DISTINCT a.media_id AS d1, b.media_id AS d2
           |  FROM fcold a JOIN fcold b ON a.s = b.s AND a.media_id < b.media_id
           |), scored AS (
           |  SELECT d1, d2,
           |         CAST(len(list_intersect(s1.fs, s2.fs)) AS BIGINT) AS common,
           |         CAST(len(s1.fs) AS BIGINT) AS sz1,
           |         CAST(len(s2.fs) AS BIGINT) AS sz2
           |  FROM cand
           |  JOIN fsets s1 ON d1 = s1.media_id
           |  JOIN fsets s2 ON d2 = s2.media_id
           |)
           |SELECT d1, d2, common, sz1, sz2,
           |       CAST(common AS DOUBLE) / (sz1 + sz2 - common) AS jaccard
           |FROM scored
           |WHERE CAST(common AS DOUBLE) / (sz1 + sz2 - common) >= 0.5
           |ORDER BY d1, d2""".stripMargin
      }),

    // Incremental visual dedup, oracle-checked: the same re-encoded
    // video corpus arrives in TWO increments (even source docs, then
    // odd) through DedupStream.indexElementsBatch — the element-form
    // ingest index where the (doc, frame-hash) membership lake is
    // both blocking structure and verification evidence. The union of
    // emitted pairs must equal the ground-truth all-pairs frame-set
    // Jaccard (uncapped, so online and one-shot candidate generation
    // coincide exactly — see the operator's maxElemDf scaladoc).
    QDef(
      "x_video_neardup_incr",
      (s, dir) => {
        val out = Fixtures.dir("video_neardup_incr", dir) { o =>
          val media = graft.operators.Multimodal.asRencodedVideoMedia(
            Tables.documents(s, dir)
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", "text")
          val fp = graft.operators.Multimodal.decodeVideoFrames(media, stride = 2)
            .select(col("media_id").as("doc"), col("frame_hash").as("s"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val p1 = graft.streaming.DedupStream.indexElementsBatch(
            fp.filter(expr("(doc div 4) % 2 = 0")), "doc", "s",
            s"$o/elems", threshold = 0.5, appendBatchId = Some(0L))
          val p2 = graft.streaming.DedupStream.indexElementsBatch(
            fp.filter(expr("(doc div 4) % 2 = 1")), "doc", "s",
            s"$o/elems", threshold = 0.5, appendBatchId = Some(1L))
          p1.unionByName(p2).write.parquet(s"$o/pairs")
          fp.unpersist()
          ()
        }
        s.read.parquet(s"$out/pairs").orderBy(col("d1"), col("d2"))
      },
      Some {
        val bpr = graft.operators.Multimodal.JpegBlocksPerRow
        val p = 1000000007L
        val t31 = BigInt(31).modPow(8, p)
        val s8 = (0 to 7).map(j => BigInt(31).pow(j)).sum
        val p200 = BigInt(31).modPow(8 * bpr, p)
        val r8 = (0 to 7).map(j => p200.modPow(j, p)).sum % p
        s"""WITH g AS (
           |  SELECT doc_id, text,
           |         greatest(CAST(ceil(length(text) / $bpr.0) AS BIGINT), 1) AS n0
           |  FROM documents
           |), gv AS (
           |  SELECT doc_id * 4 + t.v AS media_id,
           |         CASE WHEN t.v = 2 AND n0 >= 2
           |              THEN substr(text, 1, $bpr * (n0 - 1)) ELSE text END AS vtext
           |  FROM g, UNNEST([0, 1, 2]) t(v)
           |), gm AS (
           |  SELECT media_id, vtext, length(vtext) AS len,
           |         greatest(CAST(ceil(length(vtext) / $bpr.0) AS BIGINT), 1) AS nf
           |  FROM gv
           |), fr AS (
           |  SELECT media_id,
           |         (list_reduce(
           |            list_prepend(CAST(0 AS BIGINT),
           |              list_transform(generate_series(1, $bpr),
           |                c -> CAST(CASE WHEN f * $bpr + c <= len
           |                               THEN ascii(substr(vtext, f * $bpr + c, 1))
           |                               ELSE 0 END AS BIGINT))),
           |            (a, b) -> (a * $t31 + b * $s8) % $p) * $r8) % $p AS fh
           |  FROM gm, UNNEST(generate_series(0, nf - 1)) t(f)
           |  WHERE f % 2 = 0
           |), fsets AS (
           |  SELECT media_id, list_distinct(list(fh)) AS fs FROM fr GROUP BY media_id
           |), sh AS (
           |  SELECT DISTINCT media_id, fh AS s FROM fr
           |), cand AS (
           |  SELECT DISTINCT a.media_id AS d1, b.media_id AS d2
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.media_id < b.media_id
           |), scored AS (
           |  SELECT d1, d2,
           |         CAST(len(list_intersect(s1.fs, s2.fs)) AS BIGINT) AS common,
           |         CAST(len(s1.fs) AS BIGINT) AS sz1,
           |         CAST(len(s2.fs) AS BIGINT) AS sz2
           |  FROM cand
           |  JOIN fsets s1 ON d1 = s1.media_id
           |  JOIN fsets s2 ON d2 = s2.media_id
           |)
           |SELECT d1, d2, common, sz1, sz2,
           |       CAST(common AS DOUBLE) / (sz1 + sz2 - common) AS jaccard
           |FROM scored
           |WHERE CAST(common AS DOUBLE) / (sz1 + sz2 - common) >= 0.5
           |ORDER BY d1, d2""".stripMargin
      }),

    // The audio arm of the multimodal family: every document lands as
    // a REAL stereo PCM16 WAV (RIFF chunk walk with a junk LIST chunk,
    // sample i = (byte_i − 96)·256 — pure arithmetic a SQL oracle
    // replays per character), and decodeAudio extracts container
    // metadata plus per-channel peak / sum-of-squares / rounded RMS in
    // one streaming mapPartitions pass. The oracle PREDICTS every
    // field in closed form from the text itself, so a chunk-walk,
    // interleave, endianness, or stats bug is a hash mismatch.
    // MultimodalSpec cross-checks the parser against the JDK's
    // javax.sound reference on the same bytes.
    QDef(
      "x_multimodal_audio",
      (s, dir) => {
        import graft.functions.Arith.r2
        val media = graft.operators.Multimodal.asWavMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        graft.operators.Multimodal.decodeAudio(media).toDF()
          .select(col("media_id"),
            col("sample_rate").cast("long").as("sample_rate"),
            col("channels").cast("long").as("channels"),
            col("n_frames"), col("duration_us"),
            col("peak_left"), col("peak_right"),
            col("sumsq_left"), col("sumsq_right"),
            when(col("n_frames") > 0,
              r2(sqrt(col("sumsq_left").cast("double") / col("n_frames"))))
              .as("rms_left"),
            when(col("n_frames") > 0,
              r2(sqrt(col("sumsq_right").cast("double") / col("n_frames"))))
              .as("rms_right"))
          .orderBy(col("media_id"))
      },
      Some(
        """WITH s AS (
          |  SELECT doc_id, text, 2 * (length(text) // 2) AS n_samp FROM documents
          |), samp AS (
          |  SELECT doc_id, (i - 1) % 2 AS ch,
          |         CAST((unicode(substr(text, i, 1)) - 96) * 256 AS BIGINT) AS v
          |  FROM (SELECT doc_id, text, unnest(generate_series(1, n_samp)) AS i FROM s)
          |), agg AS (
          |  SELECT doc_id,
          |         max(CASE WHEN ch = 0 THEN abs(v) END) AS peak_left,
          |         max(CASE WHEN ch = 1 THEN abs(v) END) AS peak_right,
          |         sum(CASE WHEN ch = 0 THEN v * v END) AS sumsq_left,
          |         sum(CASE WHEN ch = 1 THEN v * v END) AS sumsq_right,
          |         count(*) // 2 AS n_frames
          |  FROM samp GROUP BY doc_id
          |)
          |SELECT s.doc_id AS media_id,
          |       CAST(8000 AS BIGINT) AS sample_rate,
          |       CAST(2 AS BIGINT) AS channels,
          |       CAST(coalesce(a.n_frames, 0) AS BIGINT) AS n_frames,
          |       CAST(coalesce(a.n_frames, 0) * 125 AS BIGINT) AS duration_us,
          |       CAST(coalesce(a.peak_left, 0) AS BIGINT) AS peak_left,
          |       CAST(coalesce(a.peak_right, 0) AS BIGINT) AS peak_right,
          |       CAST(coalesce(a.sumsq_left, 0) AS BIGINT) AS sumsq_left,
          |       CAST(coalesce(a.sumsq_right, 0) AS BIGINT) AS sumsq_right,
          |       CASE WHEN coalesce(a.n_frames, 0) > 0 THEN
          |         floor(sqrt(CAST(a.sumsq_left AS DOUBLE) / a.n_frames) * 100 + 0.5) / 100.0
          |       END AS rms_left,
          |       CASE WHEN coalesce(a.n_frames, 0) > 0 THEN
          |         floor(sqrt(CAST(a.sumsq_right AS DOUBLE) / a.n_frames) * 100 + 0.5) / 100.0
          |       END AS rms_right
          |FROM s LEFT JOIN agg a USING (doc_id)
          |ORDER BY media_id""".stripMargin)),

    // Audio SPECTRAL features — the step after WAV parsing that makes
    // the audio column useful for quality filtering. Goertzel bin
    // energies at the three integer-coefficient frequencies (2cosω ∈
    // {1, 0, −1} → Fs/6, Fs/4, Fs/3) over 200-sample windows per
    // channel: the whole filter is exact int64 arithmetic (windowing
    // bounds the recurrence state), so the oracle folds the identical
    // s[n] = x + c·s[n−1] − s[n−2] recurrence per window from the
    // text's closed-form samples and every energy lands in the hash.
    QDef(
      "x_audio_goertzel",
      (s, dir) => {
        val media = graft.operators.Multimodal.asWavMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        graft.operators.Multimodal.audioGoertzel(media, windowSize = 200).toDF()
          .select(col("media_id"), col("channel").cast("long").as("channel"),
            col("n_windows"), col("e_fs6"), col("e_fs4"), col("e_fs3"))
          .orderBy(col("media_id"), col("channel"))
      },
      Some {
        def fold(c: String) =
          s"""list_reduce(
             |  list_prepend([CAST(0 AS BIGINT), 0],
             |    list_transform(xw, v -> [v, CAST(0 AS BIGINT)])),
             |  (acc, x) -> [x[1] + ($c) * acc[1] - acc[2], acc[1]])""".stripMargin
        s"""WITH s AS (
           |  SELECT doc_id, text, 2 * (length(text) // 2) AS n_samp FROM documents
           |), chan AS (
           |  SELECT doc_id, ch.c AS channel,
           |         list_transform(generate_series(0, n_samp // 2 - 1), i ->
           |           CAST((unicode(substr(text, 2 * i + ch.c + 1, 1)) - 96) * 256
           |                AS BIGINT)) AS xs
           |  FROM s, UNNEST([0, 1]) ch(c)
           |), win AS (
           |  SELECT doc_id, channel,
           |         list_slice(xs, w.w * 200 + 1,
           |                    least(len(xs), w.w * 200 + 200)) AS xw
           |  FROM chan,
           |       UNNEST(generate_series(0,
           |         CAST(ceil(len(xs) / 200.0) AS BIGINT) - 1)) w(w)
           |), folds AS (
           |  SELECT doc_id, channel,
           |         ${fold("1")} AS a1,
           |         ${fold("0")} AS a0,
           |         ${fold("-1")} AS am
           |  FROM win
           |), wpow AS (
           |  SELECT doc_id, channel,
           |         a1[1] * a1[1] + a1[2] * a1[2] - a1[1] * a1[2] AS p1,
           |         a0[1] * a0[1] + a0[2] * a0[2] AS p0,
           |         am[1] * am[1] + am[2] * am[2] + am[1] * am[2] AS pm
           |  FROM folds
           |), agg AS (
           |  SELECT doc_id, channel, count(*) AS n_windows,
           |         CAST(sum(p1) AS BIGINT) AS e_fs6,
           |         CAST(sum(p0) AS BIGINT) AS e_fs4,
           |         CAST(sum(pm) AS BIGINT) AS e_fs3
           |  FROM wpow GROUP BY doc_id, channel
           |), grid AS (
           |  SELECT doc_id, channel FROM chan
           |)
           |SELECT g.doc_id AS media_id, CAST(g.channel AS BIGINT) AS channel,
           |       CAST(coalesce(a.n_windows, 0) AS BIGINT) AS n_windows,
           |       CAST(coalesce(a.e_fs6, 0) AS BIGINT) AS e_fs6,
           |       CAST(coalesce(a.e_fs4, 0) AS BIGINT) AS e_fs4,
           |       CAST(coalesce(a.e_fs3, 0) AS BIGINT) AS e_fs3
           |FROM grid g
           |LEFT JOIN agg a ON a.doc_id = g.doc_id AND a.channel = g.channel
           |ORDER BY media_id, channel""".stripMargin
      }),

    // Audio near-dup: the acoustic twin of x_video_neardup. The
    // fixture re-encodes every document's stereo PCM three ways
    // (plain WAV; identical samples behind an extra JUNK container
    // chunk; a copy with each channel's last 50-sample window cut)
    // and near-dup runs set-Jaccard over per-window PCM fingerprints
    // (channel-seeded modular hashes, position deliberately excluded
    // so trimmed copies still match). Chunk walk, interleave,
    // windowing, fingerprint fold, df-cap and Jaccard scoring all
    // land in the hash — the oracle replays every window hash in
    // closed form from the text's (byte−96)·256 sample arithmetic.
    QDef(
      "x_audio_neardup",
      (s, dir) => {
        val media = graft.operators.Multimodal.asRencodedAudioMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text", windowSize = 50)
        val fps = graft.operators.Multimodal.audioFingerprints(media, windowSize = 50)
          .select(col("media_id").as("doc"), col("whash").as("s"))
        graft.operators.Dedup.setJaccardPairs(fps, "doc", "s",
          threshold = 0.5, maxElemDf = Some(100L))
          .orderBy(col("d1"), col("d2"))
      },
      Some(
        """WITH g AS (
          |  SELECT doc_id, text, length(text) // 2 AS n0 FROM documents
          |), gv AS (
          |  SELECT doc_id * 4 + t.v AS media_id,
          |         CASE WHEN t.v = 2 AND CAST(ceil(n0 / 50.0) AS BIGINT) >= 2
          |              THEN substr(text, 1,
          |                     100 * (CAST(ceil(n0 / 50.0) AS BIGINT) - 1))
          |              ELSE text END AS vtext
          |  FROM g, UNNEST([0, 1, 2]) t(v)
          |), gm AS (
          |  SELECT media_id, vtext, length(vtext) // 2 AS n,
          |         CAST(ceil((length(vtext) // 2) / 50.0) AS BIGINT) AS nw
          |  FROM gv
          |), fr AS (
          |  SELECT media_id,
          |         list_reduce(
          |           list_prepend(CAST(ch.c + 1 AS BIGINT),
          |             list_transform(
          |               generate_series(w.w * 50, least(n, w.w * 50 + 50) - 1),
          |               j -> CAST((ascii(substr(vtext, 2 * j + ch.c + 1, 1)) - 96)
          |                         * 256 + 32768 AS BIGINT))),
          |           (a, b) -> (a * 31 + b) % 1000000007) AS fh
          |  FROM gm, UNNEST([0, 1]) ch(c),
          |       UNNEST(generate_series(0, nw - 1)) w(w)
          |), fsets AS (
          |  SELECT media_id, list_distinct(list(fh)) AS fs FROM fr GROUP BY media_id
          |), sh AS (
          |  SELECT DISTINCT media_id, fh AS s FROM fr
          |), hot AS (
          |  SELECT s FROM sh GROUP BY s HAVING count(*) > 100
          |), fcold AS (
          |  SELECT media_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
          |), cand AS (
          |  SELECT DISTINCT a.media_id AS d1, b.media_id AS d2
          |  FROM fcold a JOIN fcold b ON a.s = b.s AND a.media_id < b.media_id
          |), scored AS (
          |  SELECT d1, d2,
          |         CAST(len(list_intersect(s1.fs, s2.fs)) AS BIGINT) AS common,
          |         CAST(len(s1.fs) AS BIGINT) AS sz1,
          |         CAST(len(s2.fs) AS BIGINT) AS sz2
          |  FROM cand
          |  JOIN fsets s1 ON d1 = s1.media_id
          |  JOIN fsets s2 ON d2 = s2.media_id
          |)
          |SELECT d1, d2, common, sz1, sz2,
          |       CAST(common AS DOUBLE) / (sz1 + sz2 - common) AS jaccard
          |FROM scored
          |WHERE CAST(common AS DOUBLE) / (sz1 + sz2 - common) >= 0.5
          |ORDER BY d1, d2""".stripMargin)),

    // Perceptual-hash image near-dup: the visual analog of d_simhash.
    // The fixture re-encodes every document's pixel matrix THREE ways
    // (BMP, PNG — byte-identical pixels, the container-swap duplicate
    // class — and a lightly perturbed BMP, the recompressed
    // near-duplicate class); phash runs the real decoders, the
    // integer-exact 32×32→DCT→median hash, and the pigeonhole Hamming
    // blocking shared with SimHash. The oracle REPLAYS the entire
    // pipeline in SQL — padded byte stream, Rec.601 luma, box
    // downsample, separable DCT over the same inlined cosine
    // constants, upper-median threshold — then brute-forces the exact
    // Hamming-ball pair set, so a decoder, resize-boundary, DCT, or
    // blocking bug is a hash mismatch, and cross-document collisions
    // are decided by ground truth rather than assumed away.
    QDef(
      "x_phash_neardup",
      (s, dir) => {
        val media = graft.operators.Multimodal.asRencodedMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        graft.operators.Dedup.hammingPairs(
          graft.operators.Multimodal.phash(media)
            .select(col("media_id").as("doc"), col("phash").as("h")),
          maxHamming = 3)
          .orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH ${phashPairCtes()}
              |SELECT d1, d2, hamming FROM pr
              |WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin)),

    // Incremental IMAGE near-dup, oracle-checked — the third modality
    // through the streaming ingest index (text via d_incremental_minhash,
    // video via x_video_neardup_incr): perceptual hashes arrive in two
    // increments through DedupStream.indexHammingBatch, whose
    // pre-chunked pigeonhole lake makes cross-increment candidates a
    // (chunk, cv) equi-join and whose blocking is recall-complete — so
    // the union of the increments' pairs must equal the one-shot
    // Hamming-ball scan, hashed against the same full-DCT-replay
    // oracle as x_phash_neardup.
    QDef(
      "x_phash_neardup_incr",
      (s, dir) => {
        val out = Fixtures.dir("phash_neardup_incr", dir) { o =>
          val media = graft.operators.Multimodal.asRencodedMedia(
            Tables.documents(s, dir)
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", "text")
          val hashes = graft.operators.Multimodal.phash(media)
            .select(col("media_id").as("doc"), col("phash").as("h"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val p1 = graft.streaming.DedupStream.indexHammingBatch(
            hashes.filter(expr("(doc div 4) % 2 = 0")), "doc", "h",
            s"$o/hashes", maxHamming = 3, appendBatchId = Some(0L))
          val p2 = graft.streaming.DedupStream.indexHammingBatch(
            hashes.filter(expr("(doc div 4) % 2 = 1")), "doc", "h",
            s"$o/hashes", maxHamming = 3, appendBatchId = Some(1L))
          p1.unionByName(p2).write.parquet(s"$o/pairs")
          hashes.unpersist()
          ()
        }
        s.read.parquet(s"$out/pairs").orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH ${phashPairCtes()}
              |SELECT d1, d2, hamming FROM pr
              |WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin)),

    // Image near-dup taken to the step a curation pipeline acts on:
    // pHash pairs → transitive duplicate CLUSTERS → canonical keeper
    // per cluster (the d_neardup_clusters shape over the visual
    // modality — container-swapped re-encodes and perturbed
    // near-copies of the same document land in one cluster). Oracle:
    // the full DCT pair replay plus a recursive-CTE closure.
    QDef(
      "x_image_dedup_clusters",
      (s, dir) => {
        val media = graft.operators.Multimodal.asRencodedMedia(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text")
        val pairs = graft.operators.Dedup.hammingPairs(
          graft.operators.Multimodal.phash(media)
            .select(col("media_id").as("doc"), col("phash").as("h")),
          maxHamming = 3)
          .select(col("d1"), col("d2"))
        graft.operators.Dedup.neardupClusters(
          media.select(col("media_id")), "media_id", pairs)
          .orderBy(col("doc"))
      },
      Some(s"""WITH RECURSIVE ${phashPairCtes()},
              |pairs AS (SELECT d1, d2 FROM pr WHERE hamming <= 3),
              |nodes AS (SELECT DISTINCT media_id AS doc FROM m),
              |und AS (
              |  SELECT d1 AS a, d2 AS b FROM pairs
              |  UNION ALL
              |  SELECT d2, d1 FROM pairs
              |), reach(doc, label) AS (
              |  SELECT doc, doc FROM nodes
              |  UNION
              |  SELECT u.a, r.label FROM und u JOIN reach r ON r.doc = u.b
              |), comp AS (
              |  SELECT doc, min(label) AS cluster_id FROM reach GROUP BY doc
              |)
              |SELECT doc, cluster_id,
              |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
              |         AS cluster_size,
              |       doc = cluster_id AS is_canonical
              |FROM comp ORDER BY doc""".stripMargin)),

    // Deterministic dataset split + shuffle-key assignment — the last
    // step of every training-data pipeline. Split from an md5-uniform
    // (80/10/10), shuffle order from an independent md5 key: a reader
    // ORDER BY shuffle_key gets a reproducible global shuffle as a
    // range-partitioned sort. Pure codegen'd column math, no window —
    // embarrassingly parallel at any corpus size (a per-split
    // row_number() would serialize 80% of the corpus through one
    // partition, the classic split-rank scale trap).
    QDef(
      "x_train_split",
      (s, dir) => {
        val u = graft.functions.HashRandom.uniform(
          concat(lit("split:"), col("doc_id").cast("string")))
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"),
            md5(concat(lit("shuffle:"), col("doc_id").cast("string"))).as("shuffle_key"))
          .orderBy(col("doc_id"))
      },
      Some {
        val u = mdUniformSql("'split:' || CAST(doc_id AS VARCHAR)")
        s"""SELECT doc_id,
           |       CASE WHEN $u < 0.8 THEN 'train'
           |            WHEN $u < 0.9 THEN 'val'
           |            ELSE 'test' END AS split,
           |       md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Source reputation: the per-domain scorecard a crawler's quota /
    // filter decisions read — volume, exact-dup rate, and mean length
    // per source, one hash aggregate (distinct-inside-group via md5).
    QDef(
      "x_source_reputation",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct"),
          (floor((lit(1.0) - countDistinct(md5(col("text"))).cast("double")
            / count(lit(1)).cast("double")) * 10000 + lit(0.5)) / 10000.0)
            .as("dup_ratio_r4"),
          (floor(sum(size(split(col("text"), " "))).cast("double")
            / count(lit(1)).cast("double") * 100 + lit(0.5)) / 100.0)
            .as("mean_words_r2"))
        .orderBy(col("source")),
      Some(
        """SELECT source,
          |       count(*) AS n_docs,
          |       count(DISTINCT md5(text)) AS n_distinct,
          |       floor((1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
          |              / CAST(count(*) AS DOUBLE)) * 10000 + 0.5) / 10000.0 AS dup_ratio_r4,
          |       floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
          |             / CAST(count(*) AS DOUBLE) * 100 + 0.5) / 100.0 AS mean_words_r2
          |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Curriculum buckets: shortest-first quartiles per language —
    // ntile over the (n_words, doc_id) total order inside each
    // stratum, the deterministic curriculum a staged training run
    // consumes. Per-stratum windows only (no global sort).
    QDef(
      "x_curriculum_buckets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val nWords = size(split(col("text"), " ")).cast("long")
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n_words"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), nWords.as("n_words"))
          .withColumn("bucket", ntile(4).over(w).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some(
        """SELECT doc_id, lang,
          |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          |       CAST(ntile(4) OVER (PARTITION BY lang
          |              ORDER BY len(string_split(text, ' ')), doc_id) AS BIGINT) AS bucket
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // Leakage-safe split: the train/val/test draw keyed by NEAR-DUP
    // CLUSTER id instead of doc id, so a document and its near
    // duplicates can never straddle train and test — the split
    // hygiene that makes held-out evaluation honest. Composes the
    // cluster resolver with the hash-uniform splitter; the oracle
    // chains the recursive closure and the same md5 draw.
    QDef(
      "x_leakage_safe_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Curation.leakageSafeSplit(docs, "doc_id",
          graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.8, maxShingleDf = Some(100L)))
          .select(col("doc"), col("cluster_id"), col("split"))
          .orderBy(col("doc"))
      },
      Some {
        val u = mdUniformSql("'split:' || CAST(cluster_id AS VARCHAR)")
        s"""WITH RECURSIVE ${DedupQueries.clusterCtes(0.8, Some(100L))}
           |SELECT doc, cluster_id,
           |       CASE WHEN $u < 0.8 THEN 'train'
           |            WHEN $u < 0.9 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM comp ORDER BY doc""".stripMargin
      }),

    // The LLM-op family composed end to end — the curation pipeline a
    // training-data run actually executes: quality gate → exact-dedup
    // keepers → near-dup cluster keepers → deterministic split +
    // shuffle key. One gate proves the operators COMPOSE (each is
    // individually gated above/in DedupQueries); the oracle chains the
    // identical SQL pieces, including the recursive-CTE closure.
    QDef(
      "x_curation_pipeline",
      (s, dir) => {
        import graft.operators.Dedup
        val docs = Tables.documents(s, dir)
        val quality = docs.filter(size(split(col("text"), " ")) >= 20)
        val exactKeep = Dedup.exactDedup(quality, "doc_id", "text")
          .filter(col("is_canonical")).select(col("doc_id"))
        // persisted: four downstream stages consume `kept` (shingle
        // candidates, cluster nodes, the final join) — without the
        // cache each re-runs the quality filter + exact-dedup window
        val kept = graft.CacheRegistry.retain(
          quality.join(exactKeep, "doc_id")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val clusters = Dedup.neardupClusters(kept, "doc_id",
          Dedup.jaccardPairs(kept, "doc_id", "text", n = 3, threshold = 0.8,
            maxShingleDf = Some(100L)))
        val keepers = clusters.filter(col("is_canonical"))
          .select(col("doc").as("doc_id"), col("cluster_size"))
        val u = graft.functions.HashRandom.uniform(
          concat(lit("split:"), col("doc_id").cast("string")))
        kept.join(keepers, "doc_id")
          .select(col("doc_id"), col("cluster_size"),
            when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"),
            md5(concat(lit("shuffle:"), col("doc_id").cast("string"))).as("shuffle_key"))
          .orderBy(col("doc_id"))
      },
      Some {
        val u = mdUniformSql("'split:' || CAST(s.doc AS VARCHAR)")
        s"""WITH RECURSIVE quality AS (
           |  SELECT doc_id, text FROM documents WHERE len(string_split(text, ' ')) >= 20
           |), exact_keep AS (
           |  SELECT doc_id FROM (
           |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM quality
           |  ) WHERE doc_id = keeper
           |), kept AS (
           |  SELECT q.doc_id, q.text FROM quality q JOIN exact_keep USING (doc_id)
           |), ${DedupQueries.clusterCtes(0.8, Some(100L), "kept")},
           |sized AS (
           |  SELECT doc, cluster_id,
           |         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
           |  FROM comp
           |)
           |SELECT s.doc AS doc_id, s.cluster_size,
           |       CASE WHEN $u < 0.8 THEN 'train'
           |            WHEN $u < 0.9 THEN 'val'
           |            ELSE 'test' END AS split,
           |       md5('shuffle:' || CAST(s.doc AS VARCHAR)) AS shuffle_key
           |FROM sized s WHERE s.doc = s.cluster_id
           |ORDER BY doc_id""".stripMargin
      }),

    // C4-style line-level dedup: 5-word spans repeated anywhere in the
    // corpus collapse to one global keeper (smallest (doc_id, pos));
    // documents reassemble from their surviving spans. The 31-word
    // fixture vocabulary makes span collisions plentiful, so the
    // keeper join and ordered reassembly are both exercised hard. The
    // oracle replays the same keeper rule (doc_id*1e6+pos composite —
    // docs are <= 100 words so pos < 1e6 keeps it exact) and rebuilds
    // the text with string_agg ORDER BY pos.
    QDef(
      "x_line_dedup",
      (s, dir) => graft.operators.Curation.lineDedup(
        Tables.documents(s, dir), "doc_id", "text", spanWords = 5)
        .orderBy(col("doc_id")),
      Some(
        """WITH w AS (
          |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
          |), spans AS (
          |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
          |         array_to_string(words[(i-1)*5+1:(i-1)*5+5], ' ') AS span
          |  FROM w, UNNEST(generate_series(1, CAST(ceil(len(words) / 5.0) AS BIGINT))) AS t(i)
          |), keepers AS (
          |  SELECT span, min(doc_id * 1000000 + pos) AS k
          |  FROM spans GROUP BY span
          |)
          |SELECT doc_id,
          |       coalesce(string_agg(
          |         CASE WHEN doc_id * 1000000 + pos = k THEN span END, ' '
          |         ORDER BY pos), '') AS text,
          |       count(*) AS n_spans,
          |       CAST(sum(CASE WHEN doc_id * 1000000 + pos = k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          |FROM spans JOIN keepers USING (span)
          |GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: training docs sharing any word 5-gram
    // with the held-out benchmark slice (doc_id % 10 = 0 — the same
    // corpus plays both roles, so overlap genuinely occurs through the
    // fixture's duplicated/near-duplicated docs and common phrases).
    // Inverted-index join on the n-gram — no pairwise doc scan; the
    // benchmark side is the small broadcast side at corpus scale.
    QDef(
      "x_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Curation.decontaminate(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 5)
          .orderBy(col("doc_id"))
      },
      Some(decontaminateOracle(n = 5))),

    // BPE pair statistics: the counting step of a BPE merge iteration,
    // computed over the DISTINCT word table weighted by word frequency
    // (vocabulary-sized explode, corpus-sized only in the first
    // aggregate). Top-30 with lexicographic tiebreak at the gate edge.
    QDef(
      "x_bpe_pairs",
      (s, dir) => graft.operators.Vocab.bpePairCounts(
        Tables.documents(s, dir), "text")
        .orderBy(desc("cnt"), col("pair")).limit(30),
      Some(
        """WITH w AS (
          |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
          |), wf AS (
          |  SELECT w, count(*) AS wf FROM w WHERE length(w) >= 2 GROUP BY w
          |), p AS (
          |  SELECT substr(w, i, 2) AS pair, wf
          |  FROM wf, UNNEST(generate_series(1, length(w) - 1)) t(i)
          |)
          |SELECT pair, CAST(sum(wf) AS BIGINT) AS cnt
          |FROM p GROUP BY pair
          |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin)),

    // Full BPE training loop: 8 merge rounds of count → argmax
    // (lexicographic tiebreak) → greedy replace, over the
    // vocab-compressed word table. Every iteration is deterministic,
    // so the DuckDB oracle replays the exact merge sequence as 8
    // unrolled CTE stages.
    QDef(
      "x_bpe_train",
      (s, dir) => graft.operators.Vocab.bpeTrain(
        Tables.documents(s, dir), "text", k = 8),
      Some(graft.operators.Vocab.bpeTrainOracleSql(
        "documents", "text", k = 8))),

    // The encode half of the pipeline: tokenize the corpus with the
    // k=8 trained merges (train once per JVM — the merge list is model
    // state) and emit the top-30 token frequencies. Runs through the
    // PRODUCTION encoder (bpeEncodeLargeK: broadcast merge-rank table
    // in one mapPartitions pass — the path that carries a real
    // 32k-merge vocabulary), hash-gated against the oracle's training
    // replay; VocabSpec pins its equivalence to the chained-replace
    // form at small k and runs it at k=512.
    QDef(
      "x_bpe_encode",
      (s, dir) => graft.operators.Vocab.bpeEncodeLargeK(
        Tables.documents(s, dir), "text", trainedMerges(s, dir, k = 8))
        .orderBy(desc("cnt"), col("token")).limit(30),
      Some(graft.operators.Vocab.bpeEncodeOracleSql(
        "documents", "text", k = 8, topN = 30))),

    // The OTHER tokenizer family real pipelines ship: unigram-LM
    // (SentencePiece-style, Kudo 2018) in the hard-EM variant. All
    // arithmetic is integer (costs are length(bin(..))-1 — a float-
    // free log2 both engines evaluate identically), so the ENTIRE
    // training run — substring seeding, two EM rounds of forward/
    // backward Viterbi lattice-support counting, pruning, final cost
    // table — replays in an unrolled-CTE oracle, like the BPE
    // trainer's. The corpus-sized work is one word-frequency
    // aggregate; EM rounds run over the word vocabulary with the
    // model broadcast.
    QDef(
      "x_unigram_train",
      (s, dir) => graft.operators.Vocab.unigramTrain(
        Tables.documents(s, dir), "text",
        vocabSize = 200, rounds = 2, maxLen = 5, seedSize = 400)
        .orderBy(col("piece")),
      Some(graft.operators.Vocab.unigramTrainOracleSql(
        "documents", "text", vocabSize = 200, rounds = 2,
        maxLen = 5, seedSize = 400))),

    // Viterbi segmentation under the trained unigram model (cached
    // once per JVM — bench measures the ENCODE): per doc the piece
    // count, total integer cost, and the canonical segmentation
    // (longest on-optimal-path piece at each position — the
    // deterministic tie-break both engines share; the oracle's
    // recursive-CTE walk replays it piece by piece).
    QDef(
      "x_unigram_encode",
      (s, dir) => graft.operators.Vocab.unigramEncode(
        Tables.documents(s, dir), "doc_id", "text",
        trainedUnigram(s, dir), maxLen = 5)
        .orderBy(col("doc_id")),
      Some(graft.operators.Vocab.unigramEncodeOracleSql(
        "documents", "doc_id", "text",
        vocabSize = 200, rounds = 2, maxLen = 5, seedSize = 400))),

    // Loss-ranked elimination to an EXACT target size (the
    // SentencePiece prune unigramTrain's count-ranked per-round rule
    // approximates): each multi-char piece priced by the integer
    // corpus-loss delta of a masked re-DP over the words whose
    // optimal lattice uses it, keep-top to the target, deterministic
    // ties, costs re-derived from the survivors. The oracle replays
    // the pricing per (word, piece) — training, lattices, masked
    // folds, elimination, re-costing all land in the hash.
    QDef(
      "x_unigram_prune",
      (s, dir) => {
        val model = graft.operators.Vocab.unigramTrain(
          Tables.documents(s, dir), "text",
          vocabSize = 200, rounds = 2, maxLen = 5, seedSize = 400)
          .select(col("piece"), col("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        graft.operators.Vocab.unigramPrune(
          Tables.documents(s, dir), "text", model,
          targetSize = 40, maxLen = 5)
          .orderBy(col("piece"))
      },
      Some(graft.operators.Vocab.unigramPruneOracleSql(
        "documents", "text", vocabSize = 200, rounds = 2,
        targetSize = 40, maxLen = 5, seedSize = 400))),

    // Good-Turing count-of-counts over word trigrams: the smoothing
    // table an n-gram-LM quality filter is built from. Second
    // aggregate runs over the n-gram vocabulary, not the corpus.
    QDef(
      "x_ngram_count_of_counts",
      (s, dir) => graft.operators.Vocab.ngramCountOfCounts(
        Tables.documents(s, dir), "text", n = 3)
        .orderBy(col("freq")),
      Some(
        """WITH w AS (
          |  SELECT string_split(text, ' ') AS words FROM documents
          |), g AS (
          |  SELECT unnest(CASE WHEN len(words) >= 3 THEN list_transform(
          |           generate_series(1, len(words) - 2),
          |           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
          |         ELSE [] END) AS g
          |  FROM w
          |), f AS (
          |  SELECT g, count(*) AS freq FROM g GROUP BY g
          |)
          |SELECT freq, count(*) AS n_grams
          |FROM f GROUP BY freq ORDER BY freq""".stripMargin)),

    // Graded contamination scoring: the fraction of each train doc's
    // distinct 5-grams that appear in the benchmark slice — the
    // thresholdable form of x_decontaminate (every train doc scored,
    // zero-overlap and too-short docs included at 0).
    QDef(
      "x_contamination_score",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Curation.contaminationScore(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 5)
          .orderBy(col("doc_id"))
      },
      Some(contaminationScoreOracle(n = 5))),

    // The INDEX-BACKED forms: the same decontaminate / score answers
    // from the GramLake (train grams shingled once, bench grams
    // appended in TWO tranches with batch ids — the growing-benchmark
    // production shape, where a new eval suite pays only its own
    // tokenize). Both hash against the SAME oracles as the one-shot
    // gates above, so the whole chain is pinned: per-tranche shingling,
    // exactly-once appends, bench-driven partition + Bloom pruning of
    // the train read, and the join/aggregate itself.
    QDef(
      "x_decontaminate_incr",
      (s, dir) => {
        val lake = Fixtures.dir("gram_lake_incr", dir)(gramLakeBuild(s, dir))
        graft.sources.GramLake.decontaminate(s, s"$lake/lake")
          .orderBy(col("doc_id"))
      },
      Some(decontaminateOracle(n = 5))),

    QDef(
      "x_contamination_score_incr",
      (s, dir) => {
        val lake = Fixtures.dir("gram_lake_incr", dir)(gramLakeBuild(s, dir))
        graft.sources.GramLake.contaminationScore(s, s"$lake/lake")
          .orderBy(col("doc_id"))
      },
      Some(contaminationScoreOracle(n = 5))),

    // Priority sampling: k=100 docs weighted by n_chars, without
    // replacement, each carrying the unbiased max(w, tau) subset-sum
    // estimator. One IEEE division per row + a top-(k+1); the oracle
    // replays priorities, the (k+1)-th threshold, and the estimator
    // bit-for-bit (u is the shared md5-uniform construction).
    QDef(
      "x_priority_sample",
      (s, dir) => graft.operators.Curation.prioritySample(
        Tables.documents(s, dir), "doc_id", "n_chars", k = 100)
        .orderBy(col("doc_id")),
      Some {
        val u = mdUniformSql("'prio:' || CAST(doc_id AS VARCHAR)")
        s"""WITH pr AS (
           |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
           |         CAST(n_chars AS DOUBLE) / $u AS prio
           |  FROM documents
           |), ranked AS (
           |  SELECT * FROM (
           |    SELECT doc_id, weight, prio,
           |           row_number() OVER (ORDER BY prio DESC, doc_id) AS rn
           |    FROM pr) WHERE rn <= 101
           |), tau AS (
           |  SELECT coalesce(min(CASE WHEN rn = 101 THEN prio END), 0.0) AS tau
           |  FROM ranked
           |)
           |SELECT doc_id, weight,
           |       floor(greatest(weight, tau) * 100 + 0.5) / 100.0 AS est_weight
           |FROM ranked, tau WHERE rn <= 100 ORDER BY doc_id""".stripMargin
      }),

    // Data-mixing sampler: per-language target weights incl. an
    // upsampled stratum (en ×1.5 — floor copies + md5-uniform draw for
    // the fraction). All weights exact binary fractions, so the
    // threshold arithmetic is bit-identical in the oracle.
    QDef(
      "x_mix_sample",
      (s, dir) => graft.operators.Curation.mixtureSample(
        Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 1.5, "de" -> 1.0, "es" -> 0.75, "fr" -> 0.5, "zh" -> 0.25))
        .orderBy(col("doc_id")),
      Some {
        val u = mdUniformSql("'mix:' || CAST(doc_id AS VARCHAR)")
        s"""SELECT doc_id, lang AS stratum,
           |       CAST(CASE lang
           |              WHEN 'en' THEN 1 + (CASE WHEN $u < 0.5 THEN 1 ELSE 0 END)
           |              WHEN 'de' THEN 1
           |              WHEN 'es' THEN (CASE WHEN $u < 0.75 THEN 1 ELSE 0 END)
           |              WHEN 'fr' THEN (CASE WHEN $u < 0.5 THEN 1 ELSE 0 END)
           |              WHEN 'zh' THEN (CASE WHEN $u < 0.25 THEN 1 ELSE 0 END)
           |              ELSE 1 END AS BIGINT) AS n_copies
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Per-source quota cap: at most 10 docs per source, chosen as the
    // 10 smallest md5-of-id draws per group — the reproducible uniform
    // selection (insertion order would encode crawl-order bias). The
    // oracle replays the identical hash ranking, so the EXACT kept set
    // is hash-checked, not just the per-source counts.
    QDef(
      "x_source_cap",
      (s, dir) => graft.operators.Curation.capPerGroup(
        Tables.documents(s, dir), "source", "doc_id", cap = 10)
        .select(col("source"), col("doc_id"), col("lang"))
        .orderBy(col("source"), col("doc_id")),
      Some(
        """SELECT source, doc_id, lang FROM (
          |  SELECT source, doc_id, lang,
          |         row_number() OVER (PARTITION BY source
          |           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |  FROM documents)
          |WHERE rn <= 10
          |ORDER BY source, doc_id""".stripMargin)),

    // PII scrubbing: emails and phone-shaped tokens replaced with
    // placeholder tags. The fixture corpus is digit-free, so the gate
    // INJECTS deterministic PII (doc_id-derived email + phone appended
    // to every doc in BOTH engines) — the scrub path is exercised on
    // every row, and a regex divergence becomes a hash failure.
    QDef(
      "x_pii_scrub",
      (s, dir) => {
        val injected = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example or call 555-0"), (col("doc_id") % 100).cast("string"))
        val scrubbed = regexp_replace(
          regexp_replace(injected, "[a-z0-9.]+@[a-z][a-z.]*[a-z]", "<EMAIL>"),
          "[0-9]{3}-[0-9]+", "<PHONE>")
        Tables.documents(s, dir).select(
          col("doc_id"),
          regexp_count(injected, lit("[a-z0-9.]+@[a-z][a-z.]*[a-z]")).cast("long").as("n_emails"),
          regexp_count(injected, lit("[0-9]{3}-[0-9]+")).cast("long").as("n_phones"),
          md5(scrubbed).as("scrubbed_md5"))
          .orderBy(col("doc_id"))
      },
      Some(
        """WITH inj AS (
          |  SELECT doc_id,
          |         text || ' contact user' || CAST(doc_id AS VARCHAR)
          |              || '@mail.example or call 555-0' || CAST(doc_id % 100 AS VARCHAR) AS t
          |  FROM documents
          |)
          |SELECT doc_id,
          |       CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z][a-z.]*[a-z]')) AS BIGINT) AS n_emails,
          |       CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]+')) AS BIGINT) AS n_phones,
          |       md5(regexp_replace(
          |             regexp_replace(t, '[a-z0-9.]+@[a-z][a-z.]*[a-z]', '<EMAIL>', 'g'),
          |             '[0-9]{3}-[0-9]+', '<PHONE>', 'g')) AS scrubbed_md5
          |FROM inj ORDER BY doc_id""".stripMargin)),

    // Markup/boilerplate extraction (graft.operators.Markup) — the
    // entry step of a crawled-text pipeline. Each document is wrapped
    // in a constructed page (title, nav bar, heading, body paragraph
    // with entities, link-farm footer, plus script/style with tag-like
    // code inside); the gate hashes the extracted text and the block
    // accounting. The oracle replays the IDENTICAL pipeline in DuckDB
    // string ops — same regexes (RE2-safe dialect), same entity decode
    // order, same integer link-density rule — so every contract in the
    // Markup scaladoc lands in the hash: script dropping, block
    // segmentation, decode-after-strip, and the density gate that
    // drops the nav and footer while keeping title/heading/prose.
    QDef(
      "x_html_extract",
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>p { color: red; }</style>" +
            "<script>if (1 < 2) { x = \"<div>&amp;</div>\"; }</script></head><body>" +
            "<nav><a href=\"/\">home</a> <a href=\"/about\">about us</a> " +
            "<a href=\"/more\">more links</a></nav>" +
            "<h1>Report &amp; notes for doc "), col("doc_id").cast("string"),
          lit("</h1><p>"), col("text"),
          lit(" &lt;end&gt; &quot;fin&quot; &#39;ok&#39;&nbsp;.</p>" +
            "<footer>copyright <a href=\"/home\">back to the home page</a>" +
            "</footer></body></html>"))
        Tables.documents(s, dir)
          .select(col("doc_id"), graft.operators.Markup.extractText(html).as("e"))
          .select(col("doc_id"),
            col("e.n_blocks").as("n_blocks"),
            col("e.n_kept").as("n_kept"),
            length(col("e.text")).cast("long").as("kept_chars"),
            md5(col("e.text")).as("extracted_md5"))
          .orderBy(col("doc_id"))
      },
      Some {
        val dec = (x: String) =>
          s"""replace(replace(replace(replace(replace(replace(
             |  $x,
             |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             |  '&nbsp;', ' '), '&amp;', '&')""".stripMargin
        val blockTags = graft.operators.Markup.BlockTags.mkString("|")
        s"""WITH h AS (
           |  SELECT doc_id,
           |         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
           |         '</title><style>p { color: red; }</style>' ||
           |         '<script>if (1 < 2) { x = "<div>&amp;</div>"; }</script></head><body>' ||
           |         '<nav><a href="/">home</a> <a href="/about">about us</a> ' ||
           |         '<a href="/more">more links</a></nav>' ||
           |         '<h1>Report &amp; notes for doc ' || CAST(doc_id AS VARCHAR) ||
           |         '</h1><p>' || text ||
           |         ' &lt;end&gt; &quot;fin&quot; &#39;ok&#39;&nbsp;.</p>' ||
           |         '<footer>copyright <a href="/home">back to the home page</a>' ||
           |         '</footer></body></html>' AS html
           |  FROM documents
           |), s AS (
           |  SELECT doc_id,
           |         regexp_replace(regexp_replace(html,
           |           '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
           |           '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS x
           |  FROM h
           |), bl AS (
           |  SELECT doc_id, string_split(regexp_replace(x,
           |           '(?i)</?($blockTags)([ \t][^>]*)?/?>',
           |           chr(10), 'g'), chr(10)) AS bs
           |  FROM s
           |), ub AS (
           |  SELECT doc_id, i, bs[i] AS b
           |  FROM bl, UNNEST(generate_series(1, len(bs))) t(i)
           |), pb AS (
           |  SELECT doc_id, i,
           |         trim(regexp_replace(
           |           ${dec("regexp_replace(b, '<[^>]*>', ' ', 'g')")},
           |           '\\s+', ' ', 'g')) AS txt,
           |         coalesce(list_sum(list_transform(
           |           regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1),
           |           a -> len(${dec("regexp_replace(a, '<[^>]*>', '', 'g')")}))), 0) AS ll
           |  FROM ub
           |), nz AS (
           |  SELECT * FROM pb WHERE len(txt) > 0
           |), m AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
           |         CAST(count(*) FILTER (WHERE ll * 2 <= len(txt)) AS BIGINT) AS n_kept
           |  FROM nz GROUP BY doc_id
           |), e AS (
           |  SELECT doc_id, string_agg(txt, chr(10) ORDER BY i) AS extracted
           |  FROM nz WHERE ll * 2 <= len(txt) GROUP BY doc_id
           |)
           |SELECT d.doc_id,
           |       coalesce(m.n_blocks, 0) AS n_blocks,
           |       coalesce(m.n_kept, 0) AS n_kept,
           |       CAST(len(coalesce(e.extracted, '')) AS BIGINT) AS kept_chars,
           |       md5(coalesce(e.extracted, '')) AS extracted_md5
           |FROM documents d LEFT JOIN m USING (doc_id) LEFT JOIN e USING (doc_id)
           |ORDER BY doc_id""".stripMargin
      }),

    // Link graph + integer PageRank (graft.operators.LinkGraph): the
    // domain-authority signal a crawl scheduler / mixture-weighting
    // stage reads. Each document is given a constructed page linking
    // to two modular-arithmetic hosts (one repeated in UPPERCASE — the
    // case-folding test) plus a single-quoted and an UNQUOTED link
    // (real crawl HTML mixes all three attribute-quoting forms), plus
    // relative/mailto links (no host — must drop out) and a self-link
    // (must drop). The oracle replays href extraction (the shared
    // extractHrefsSql twin), host parsing, the weighted edge
    // aggregate, and all three scaled-integer PageRank rounds as
    // unrolled CTEs.
    QDef(
      "x_link_graph",
      (s, dir) => {
        import graft.operators.LinkGraph
        val html = concat(
          lit("<p>see <a href=\"https://h"), (col("doc_id") % 17).cast("string"),
          lit(".example/p\">one</a> and <a href=\"https://h"),
          (col("doc_id") % 5).cast("string"),
          lit(".example/q?x=1\">two</a> <a href='https://s"),
          (col("doc_id") % 7).cast("string"),
          lit(".example/sq'>sq</a> <a href=https://u"),
          (col("doc_id") % 3).cast("string"),
          lit(".example/uq>uq</a> <a href=\"/relative/skip\">rel</a>" +
            " <a href=\"mailto:a@b.c\">mail</a> <a href=\"HTTPS://H"),
          (col("doc_id") % 17).cast("string"),
          lit(".EXAMPLE/upper\">dup</a> <a href=\"https://"), col("source"),
          lit(".example/self\">self</a></p>"))
        val docs = Tables.documents(s, dir)
          .select(concat(col("source"), lit(".example")).as("host"),
            html.as("html"))
        LinkGraph.pagerank(LinkGraph.domainEdges(docs, "host", "html"),
          iters = 3)
          .orderBy(col("host"))
      },
      Some {
        s"""WITH h AS (
           |  SELECT lower(source || '.example') AS src,
           |         '<p>see <a href="https://h' || CAST(doc_id % 17 AS VARCHAR) ||
           |         '.example/p">one</a> and <a href="https://h' ||
           |         CAST(doc_id % 5 AS VARCHAR) ||
           |         '.example/q?x=1">two</a> <a href=''https://s' ||
           |         CAST(doc_id % 7 AS VARCHAR) ||
           |         '.example/sq''>sq</a> <a href=https://u' ||
           |         CAST(doc_id % 3 AS VARCHAR) ||
           |         '.example/uq>uq</a> <a href="/relative/skip">rel</a>' ||
           |         ' <a href="mailto:a@b.c">mail</a> <a href="HTTPS://H' ||
           |         CAST(doc_id % 17 AS VARCHAR) ||
           |         '.EXAMPLE/upper">dup</a> <a href="https://' || source ||
           |         '.example/self">self</a></p>' AS html
           |  FROM documents
           |), lnk AS (
           |  SELECT src,
           |         unnest(${graft.operators.LinkGraph.extractHrefsSql("html")}) AS u
           |  FROM h
           |), tgt AS (
           |  SELECT src,
           |         CASE WHEN regexp_extract(u, '^(?i)https?://([^/?#]+)', 1) <> ''
           |              THEN lower(regexp_extract(u, '^(?i)https?://([^/?#]+)', 1))
           |         END AS dst
           |  FROM lnk
           |), edges AS (
           |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tgt
           |  WHERE dst IS NOT NULL AND dst <> src GROUP BY src, dst
           |),
           |${graft.operators.LinkGraph.pagerankOracleCtes(3)}
           |SELECT host, out_weight, in_weight, rank FROM prF
           |ORDER BY host""".stripMargin
      }),

    // Learned quality classifier (graft.operators.LearnedQuality):
    // hashed-feature multinomial Naive Bayes, trained and scored in
    // deterministic integer arithmetic (md5 feature hash, ×1024
    // integer log2), so BOTH phases replay in DuckDB — the oracle
    // re-trains the same model from the same labels and must agree on
    // every document's integer score. Label for the gate: the document
    // mentions 'spark' (a content label the bucket weights genuinely
    // learn — LearnedQualitySpec shows separation on disjoint
    // vocabularies; here the hash gate pins the arithmetic).
    QDef(
      "x_quality_learned",
      (s, dir) => {
        import graft.operators.LearnedQuality
        val docs = Tables.documents(s, dir)
        val label = array_contains(split(col("text"), " "), "spark")
        val model = LearnedQuality.train(docs, "doc_id", "text", label,
          buckets = 256)
        LearnedQuality.score(model, docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), label.as("label")), Seq("doc_id"))
          .select(col("doc_id"), col("label"), col("n_toks"),
            col("score"), col("pred"))
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.operators.LearnedQuality.{ilog2Sql, mdBucketSql}
        s"""WITH lab AS (
           |  SELECT doc_id, list_contains(string_split(text, ' '), 'spark') AS good,
           |         text FROM documents
           |), tok AS (
           |  SELECT doc_id, good, t.tok
           |  FROM (SELECT doc_id, good, string_split(text, ' ') AS ws FROM lab),
           |       UNNEST(ws) t(tok)
           |  WHERE len(t.tok) > 0
           |), bt AS (
           |  SELECT doc_id, good, ${mdBucketSql("tok", 256)} AS b FROM tok
           |), cnt AS (
           |  SELECT b, sum(CASE WHEN good THEN 1 ELSE 0 END) AS cg,
           |         sum(CASE WHEN NOT good THEN 1 ELSE 0 END) AS cb
           |  FROM bt GROUP BY b
           |), tot AS (
           |  SELECT sum(cg) AS ng, sum(cb) AS nb FROM cnt
           |), dt AS (
           |  SELECT sum(CASE WHEN good THEN 1 ELSE 0 END) AS dg,
           |         sum(CASE WHEN NOT good THEN 1 ELSE 0 END) AS db FROM lab
           |), wt AS (
           |  SELECT b, ${ilog2Sql("cg + 1")} - ${ilog2Sql("ng + 256")}
           |           - ${ilog2Sql("cb + 1")} + ${ilog2Sql("nb + 256")} AS w
           |  FROM cnt, tot
           |), sc AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks, sum(w) AS sw
           |  FROM bt JOIN wt USING (b) GROUP BY doc_id
           |)
           |SELECT l.doc_id, l.good AS label,
           |       coalesce(sc.n_toks, 0) AS n_toks,
           |       CAST((${ilog2Sql("dg")} - ${ilog2Sql("db")})
           |            + coalesce(sc.sw, 0) AS BIGINT) AS score,
           |       ((${ilog2Sql("dg")} - ${ilog2Sql("db")})
           |            + coalesce(sc.sw, 0)) > 0 AS pred
           |FROM lab l LEFT JOIN sc USING (doc_id), dt
           |ORDER BY doc_id""".stripMargin
      }),

    // Within-document repetition (Gopher-style quality rule): the
    // fraction of repeated word 2-grams — high values flag loopy,
    // low-information text a pretraining filter drops.
    QDef(
      "x_doc_repetition",
      (s, dir) => {
        // one compiled pass per doc (ShingleStats); staged projection so
        // the struct is evaluated once, not once per referencing column
        Tables.documents(s, dir)
          .select(col("doc_id"),
            graft.functions.TextFunctions.shingleStats(col("text"), 2).as("st"))
          .select(
            col("doc_id"),
            col("st.total").as("bigrams"),
            col("st.distinct").as("distinct_bigrams"),
            when(col("st.total") > 0,
              (floor((lit(1.0) - col("st.distinct").cast("double") /
                col("st.total").cast("double")) * 10000 + 0.5) / 10000.0))
              .otherwise(lit(0.0)).as("rep_ratio_r4"))
          .orderBy(col("doc_id"))
      },
      Some(
        """WITH w AS (
          |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
          |), g AS (
          |  SELECT doc_id,
          |         CASE WHEN len(words) >= 2 THEN list_transform(
          |                generate_series(1, len(words) - 1),
          |                i -> words[i] || ' ' || words[i+1])
          |              ELSE [] END AS grams
          |  FROM w
          |)
          |SELECT doc_id,
          |       CAST(len(grams) AS BIGINT) AS bigrams,
          |       CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_bigrams,
          |       CASE WHEN len(grams) > 0
          |            THEN floor((1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
          |                            / len(grams)) * 10000 + 0.5) / 10000.0
          |            ELSE 0.0 END AS rep_ratio_r4
          |FROM g ORDER BY doc_id""".stripMargin)),

    // Token-budget shard packing: documents laid out in md5-shuffle
    // order and cut into ~2,000-token shards. The oracle computes the
    // ONE GLOBAL running sum this logically is; the Spark plan executes
    // it as a two-level distributed prefix sum (256 md5-prefix range
    // buckets → parallel per-bucket windows → 256-row offset
    // broadcast) — bit-identical result, no single-partition window.
    QDef(
      "x_pack_shards",
      (s, dir) => graft.operators.Curation.packShards(
        Tables.documents(s, dir), "doc_id",
        size(split(col("text"), " ")).cast("long"), budget = 2000L)
        .orderBy(col("doc_id")),
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
          |         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk
          |  FROM documents
          |), c AS (
          |  SELECT doc_id, tokens,
          |         sum(tokens) OVER (ORDER BY sk, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM t
          |), g AS (
          |  SELECT doc_id, tokens, cum - tokens AS gstart,
          |         CAST(floor((cum - tokens) / CAST(2000 AS DOUBLE)) AS BIGINT) AS shard_id
          |  FROM c
          |)
          |SELECT doc_id, tokens, shard_id,
          |       CAST(gstart - shard_id * 2000 AS BIGINT) AS shard_pos
          |FROM g ORDER BY doc_id""".stripMargin)),

    // The packing pipeline's LAST step: materialize each shard as one
    // training sequence — documents concatenated in shard-position
    // order with an EOS separator. The cross-engine hazard this gate
    // pins is ORDERED aggregation: collect_list has no order
    // guarantee, so the sequence is built sort_array(struct(pos,
    // text)) → transform → array_join, which IS deterministic — and
    // must equal DuckDB's string_agg(... ORDER BY pos) byte-for-byte
    // (compared by md5; sequences run to ~100 KB).
    QDef(
      "x_pack_concat",
      (s, dir) => {
        val packed = graft.operators.Curation.packShards(
          Tables.documents(s, dir), "doc_id",
          size(split(col("text"), " ")).cast("long"), budget = 2000L)
        packed.join(Tables.documents(s, dir).select(col("doc_id"), col("text")), "doc_id")
          .groupBy(col("shard_id"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("tokens")).as("total_tokens"),
            md5(array_join(
              transform(
                sort_array(collect_list(struct(col("shard_pos"), col("text")))),
                x => x.getField("text")),
              "<|eos|>")).as("seq_md5"))
          .orderBy(col("shard_id"))
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id, text,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
          |         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk
          |  FROM documents
          |), c AS (
          |  SELECT doc_id, text, tokens,
          |         sum(tokens) OVER (ORDER BY sk, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM t
          |), g AS (
          |  SELECT doc_id, text, tokens, cum - tokens AS gstart,
          |         CAST(floor((cum - tokens) / CAST(2000 AS DOUBLE)) AS BIGINT) AS shard_id
          |  FROM c
          |)
          |SELECT shard_id, count(*) AS n_docs,
          |       CAST(sum(tokens) AS BIGINT) AS total_tokens,
          |       md5(string_agg(text, '<|eos|>' ORDER BY gstart - shard_id * 2000, doc_id)) AS seq_md5
          |FROM g GROUP BY shard_id ORDER BY shard_id""".stripMargin)),

    // Loader 1: GPT-style concat-and-chunk packing — the corpus token
    // stream cut into fixed 1,024-token training sequences, documents
    // SPANNING boundaries (packShards keeps documents whole; this is
    // the no-padding form trainers actually consume). The gate hashes
    // the full (doc, sequence) SLICE MAP — sequence id, in-sequence
    // position id, in-document offset, slice length — against the
    // oracle's single global running sum; the Spark side computes the
    // same offsets with the two-level distributed prefix sum
    // (LoaderSpec pins the tiling invariants).
    QDef(
      "x_pack_sequences",
      (s, dir) => graft.operators.Loader.packSequences(
        Tables.documents(s, dir), "doc_id",
        size(split(col("text"), " ")).cast("long"), seqLen = 1024L)
        .orderBy(col("seq_id"), col("seq_pos"), col("doc_id")),
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
          |         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk
          |  FROM documents
          |  WHERE len(string_split(text, ' ')) > 0
          |), c AS (
          |  SELECT doc_id, tokens,
          |         sum(tokens) OVER (ORDER BY sk, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS gstart
          |  FROM t
          |), e AS (
          |  SELECT doc_id, tokens, gstart,
          |         unnest(generate_series(
          |           CAST(floor(gstart / 1024.0) AS BIGINT),
          |           CAST(floor((gstart + tokens - 1) / 1024.0) AS BIGINT))) AS seq_id
          |  FROM c
          |)
          |SELECT doc_id, seq_id,
          |       CAST(greatest(gstart, seq_id * 1024) - seq_id * 1024 AS BIGINT) AS seq_pos,
          |       CAST(greatest(gstart, seq_id * 1024) - gstart AS BIGINT) AS doc_off,
          |       CAST(least(gstart + tokens, (seq_id + 1) * 1024)
          |            - greatest(gstart, seq_id * 1024) AS BIGINT) AS len
          |FROM e ORDER BY seq_id, seq_pos, doc_id""".stripMargin)),

    // Loader 2: the per-EPOCH reshuffle — two epochs of the same
    // corpus re-dealt into 12 loader shards with dense in-shard
    // positions, every assignment a pure md5 function of
    // (seed, epoch, id) so the permutations differ BETWEEN epochs yet
    // replay bit-identically within one (resumable training). The
    // oracle recomputes both epochs' full (shard, pos) layout; a
    // divergence anywhere in the hash→shard→rank chain is a hash
    // mismatch.
    QDef(
      "x_epoch_shuffle",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        (0 to 1).map(e =>
          graft.operators.Loader.epochShuffle(d, "doc_id", epoch = e, shards = 12)
            .withColumn("epoch", lit(e.toLong)))
          .reduce(_ unionByName _)
          .select(col("epoch"), col("shard_id"), col("pos"), col("doc_id"))
          .orderBy(col("epoch"), col("shard_id"), col("pos"))
      },
      Some(epochShuffleOracleSql)),

    // The epoch layouts COMMITTED AS A LAKE: each epoch's shard
    // manifest lands once as a version (batch-id = epoch, so a
    // re-submitted epoch — exercised by the builder — replays into a
    // no-op), partitioned by (epoch, shard) so a resuming loader
    // worker opens exactly its own partition instead of re-deriving
    // the corpus-wide shuffle. Both epochs read BACK from the lake
    // must hash against the IDENTICAL oracle as x_epoch_shuffle: the
    // commit/replay/read path may move bytes, never the permutation.
    QDef(
      "x_epoch_lake",
      (s, dir) => {
        val lake = {
          val out = Fixtures.dir("epoch_lake", dir) { o =>
            val d = Tables.documents(s, dir).select(col("doc_id"))
            graft.operators.Loader.epochLakeAppend(
              d, "doc_id", epoch = 0, shards = 12, s"$o/lake")
            graft.operators.Loader.epochLakeAppend(
              d, "doc_id", epoch = 1, shards = 12, s"$o/lake")
            // replayed epoch: must be a no-op, not a duplicate layout
            graft.operators.Loader.epochLakeAppend(
              d, "doc_id", epoch = 1, shards = 12, s"$o/lake")
            ()
          }
          s"$out/lake"
        }
        (0 to 1).map(e =>
          graft.operators.Loader.readEpoch(s, lake, e)
            .withColumn("epoch", lit(e.toLong)))
          .reduce(_ unionByName _)
          .select(col("epoch"), col("shard_id"), col("pos"), col("doc_id"))
          .orderBy(col("epoch"), col("shard_id"), col("pos"))
      },
      Some(epochShuffleOracleSql)),

    // Loader 3: the packed dataset AS A GROWING LAKE — two tranches of
    // the corpus appended in turn, the second continuing the token
    // stream exactly where the first ended (the trailing partial
    // sequence is FILLED, not padded; earlier slices never rewritten —
    // LoaderSpec pins immutability and exactly-once replay). The gate
    // hashes the whole lake's slice map against an oracle that packs
    // tranche 1's stream then tranche 2's at the carried offset —
    // continuation, block partitioning, and the manifest-pruned offset
    // read all land in one hash.
    QDef(
      "x_pack_incremental",
      (s, dir) => {
        val lake = {
          val out = Fixtures.dir("pack_lake", dir) { o =>
            val d = Tables.documents(s, dir).select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("tokens"))
            graft.operators.Loader.packedLakeAppend(
              d.filter(col("doc_id") % 2 === 0), "doc_id", col("tokens"),
              1024L, s"$o/lake", batchId = Some(0L))
            graft.operators.Loader.packedLakeAppend(
              d.filter(col("doc_id") % 2 =!= 0), "doc_id", col("tokens"),
              1024L, s"$o/lake", batchId = Some(1L))
          }
          s"$out/lake"
        }
        graft.sources.VersionedLake.read(s, lake)
          .select(col("doc_id"), col("seq_id"), col("seq_pos"),
            col("doc_off"), col("len"))
          .orderBy(col("seq_id"), col("seq_pos"), col("doc_id"))
      },
      Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
          |         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk,
          |         doc_id % 2 AS tr
          |  FROM documents
          |  WHERE len(string_split(text, ' ')) > 0
          |), c AS (
          |  SELECT doc_id, tokens, tr,
          |         sum(tokens) OVER (PARTITION BY tr ORDER BY sk, doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS lstart
          |  FROM t
          |), tot AS (
          |  SELECT CAST(coalesce(sum(tokens), 0) AS BIGINT) AS t0 FROM t WHERE tr = 0
          |), g AS (
          |  SELECT doc_id, tokens,
          |         lstart + CASE WHEN tr = 1 THEN t0 ELSE 0 END AS g0
          |  FROM c, tot
          |), e AS (
          |  SELECT doc_id, tokens, g0,
          |         unnest(generate_series(
          |           CAST(floor(g0 / 1024.0) AS BIGINT),
          |           CAST(floor((g0 + tokens - 1) / 1024.0) AS BIGINT))) AS seq_id
          |  FROM g
          |)
          |SELECT doc_id, seq_id,
          |       CAST(greatest(g0, seq_id * 1024) - seq_id * 1024 AS BIGINT) AS seq_pos,
          |       CAST(greatest(g0, seq_id * 1024) - g0 AS BIGINT) AS doc_off,
          |       CAST(least(g0 + tokens, (seq_id + 1) * 1024)
          |            - greatest(g0, seq_id * 1024) AS BIGINT) AS len
          |FROM e ORDER BY seq_id, seq_pos, doc_id""".stripMargin)),

    // Loader 4: ONE EPOCH of training data end to end — quality floor
    // (≥30 tokens), per-language mixture weights (en upsampled ×1.5 via
    // the md5-uniform fractional draw), replication into per-copy
    // rows, and concat-and-chunk packing of the replicated stream into
    // 1,024-token sequences. Every stage is the deterministic operator
    // the standalone gates pin; this gate hashes their COMPOSITION —
    // the full slice map a trainer would consume — against an oracle
    // that replays filter → weights → copies → global cumsum in closed
    // form. The x_curation_pipeline of the loader side.
    QDef(
      "x_loader_epoch",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("tokens"))
          .filter(col("tokens") >= 30)
        val mix = graft.operators.Curation.mixtureSample(d, "doc_id", "lang",
          Map("en" -> 1.5, "de" -> 1.0, "es" -> 0.75, "fr" -> 0.5, "zh" -> 0.25))
        // one row per kept copy; replica ids pack into doc_id × 4 + copy
        // (weights < 4, so the id space never collides)
        val replicas = mix.filter(col("n_copies") > 0)
          .join(d.select(col("doc_id"), col("tokens")), "doc_id")
          .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))
          .select((col("doc_id") * 4 + col("copy")).as("rep_id"), col("tokens"))
        graft.operators.Loader.packSequences(replicas, "rep_id",
          col("tokens"), seqLen = 1024L)
          .orderBy(col("seq_id"), col("seq_pos"), col("doc_id"))
      },
      Some {
        val u = mdUniformSql("'mix:' || CAST(doc_id AS VARCHAR)")
        s"""WITH d AS (
           |  SELECT doc_id, lang,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           |  FROM documents
           |  WHERE len(string_split(text, ' ')) >= 30
           |), mix AS (
           |  SELECT doc_id, tokens,
           |         CAST(CASE lang
           |                WHEN 'en' THEN 1 + (CASE WHEN $u < 0.5 THEN 1 ELSE 0 END)
           |                WHEN 'de' THEN 1
           |                WHEN 'es' THEN (CASE WHEN $u < 0.75 THEN 1 ELSE 0 END)
           |                WHEN 'fr' THEN (CASE WHEN $u < 0.5 THEN 1 ELSE 0 END)
           |                WHEN 'zh' THEN (CASE WHEN $u < 0.25 THEN 1 ELSE 0 END)
           |                ELSE 1 END AS BIGINT) AS n_copies
           |  FROM d
           |), rep AS (
           |  SELECT doc_id * 4 + unnest(generate_series(0, n_copies - 1)) AS rep_id,
           |         tokens
           |  FROM mix WHERE n_copies > 0
           |), t AS (
           |  SELECT rep_id, tokens,
           |         md5('shuffle:' || CAST(rep_id AS VARCHAR)) AS sk
           |  FROM rep WHERE tokens > 0
           |), c AS (
           |  SELECT rep_id, tokens,
           |         sum(tokens) OVER (ORDER BY sk, rep_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS gstart
           |  FROM t
           |), e AS (
           |  SELECT rep_id, tokens, gstart,
           |         unnest(generate_series(
           |           CAST(floor(gstart / 1024.0) AS BIGINT),
           |           CAST(floor((gstart + tokens - 1) / 1024.0) AS BIGINT))) AS seq_id
           |  FROM c
           |)
           |SELECT rep_id AS doc_id, seq_id,
           |       CAST(greatest(gstart, seq_id * 1024) - seq_id * 1024 AS BIGINT) AS seq_pos,
           |       CAST(greatest(gstart, seq_id * 1024) - gstart AS BIGINT) AS doc_off,
           |       CAST(least(gstart + tokens, (seq_id + 1) * 1024)
           |            - greatest(gstart, seq_id * 1024) AS BIGINT) AS len
           |FROM e ORDER BY seq_id, seq_pos, doc_id""".stripMargin
      })
  )

  /** DuckDB replay of the full pHash pipeline, shared by the
    * x_phash_neardup and x_image_dedup_clusters oracles: the CTE chain
    * `ctab, m, lum, down, g, f, med, ph, pr` ending in `pr(d1, d2,
    * hamming)` — the exact all-pairs Hamming table over the re-encoded
    * media fixture (doc × {BMP, PNG, perturbed-BMP} = media_id
    * doc_id*4+v2). Callers splice it after WITH [RECURSIVE] and select
    * from `pr` (pairs) or `m` (the media universe). Every stage —
    * padded byte stream, the v2=2 every-7th-byte xor-1 perturbation,
    * Rec.601 integer luma, 32×32 box downsample, the separable DCT
    * over the same inlined scaled-cosine table the Scala expression
    * uses, upper-median threshold — is integer-exact, so a decoder or
    * blocking bug on the Spark side is a hash mismatch, not a tolerance
    * judgement call. */
  private def phashPairCtes(): String = {
    val w = graft.operators.Multimodal.BmpMediaWidth // 25 px, 75-byte rows
    val rb = w * 3
    val ct = graft.operators.Multimodal.PhashCosTable
      .flatten.mkString("[", ", ", "]")
    // byt(j): 0-based padded pixel-stream byte j of variant v
    def byt(j: String) =
      s"""(CASE WHEN $j < len THEN
         |   (CASE WHEN v2 = 2 AND ($j) % 7 = 0
         |         THEN xor(ascii(substr(text, $j + 1, 1)), 1)
         |         ELSE ascii(substr(text, $j + 1, 1)) END)
         | ELSE 0 END)""".stripMargin.replaceAll("\\s+", " ")
    s"""ctab AS (
       |  SELECT $ct AS ct
       |), m AS (
       |  SELECT doc_id * 4 + t.v2 AS media_id, text, length(text) AS len, t.v2,
       |         greatest(CAST(ceil(length(text) / $rb.0) AS BIGINT), 1) AS hgt
       |  FROM documents, UNNEST([0, 1, 2]) t(v2)
       |), lum AS (
       |  SELECT media_id, hgt,
       |         list_transform(generate_series(0, $w * hgt - 1), i ->
       |           CAST((77 * ${byt("3*i+2")} + 150 * ${byt("3*i+1")} +
       |                 29 * ${byt("3*i")}) // 256 AS BIGINT)) AS lm
       |  FROM m
       |), down AS (
       |  SELECT media_id, vv.dv AS dv, uu.du AS du,
       |         CAST(list_sum(flatten(list_transform(
       |           generate_series((vv.dv * hgt) // 32,
       |             greatest(((vv.dv + 1) * hgt) // 32, (vv.dv * hgt) // 32 + 1) - 1),
       |           y -> list_transform(
       |             generate_series((uu.du * $w) // 32,
       |               greatest(((uu.du + 1) * $w) // 32, (uu.du * $w) // 32 + 1) - 1),
       |             x -> lm[y * $w + x + 1]))))
       |         // ((greatest(((vv.dv + 1) * hgt) // 32, (vv.dv * hgt) // 32 + 1)
       |             - (vv.dv * hgt) // 32)
       |            * (greatest(((uu.du + 1) * $w) // 32, (uu.du * $w) // 32 + 1)
       |             - (uu.du * $w) // 32)) AS BIGINT) AS d
       |  FROM lum, UNNEST(generate_series(0, 31)) vv(dv),
       |       UNNEST(generate_series(0, 31)) uu(du)
       |), g AS (
       |  SELECT media_id, pp.p AS p, dv,
       |         CAST(sum(d * ct[pp.p * 32 + du + 1]) AS BIGINT) AS gval
       |  FROM down, ctab, UNNEST(generate_series(0, 7)) pp(p)
       |  GROUP BY media_id, pp.p, dv
       |), f AS (
       |  SELECT media_id, p, qq.q AS q,
       |         CAST(sum(gval * ct[qq.q * 32 + dv + 1]) AS BIGINT) AS fval
       |  FROM g, ctab, UNNEST(generate_series(0, 7)) qq(q)
       |  GROUP BY media_id, p, qq.q
       |), med AS (
       |  SELECT media_id, list_sort(list(fval))[33] AS med
       |  FROM f GROUP BY media_id
       |), ph AS (
       |  SELECT f.media_id,
       |         list(CASE WHEN fval > med THEN 1 ELSE 0 END ORDER BY p * 8 + q) AS bv
       |  FROM f JOIN med USING (media_id) GROUP BY f.media_id
       |), pr AS (
       |  SELECT a.media_id AS d1, b.media_id AS d2,
       |         CAST(list_sum(list_transform(generate_series(1, 64),
       |           i -> CASE WHEN a.bv[i] <> b.bv[i] THEN 1 ELSE 0 END))
       |           AS BIGINT) AS hamming
       |  FROM ph a JOIN ph b ON a.media_id < b.media_id
       |)""".stripMargin
  }

  /** DuckDB twin of Curation.decontaminate at word n-grams. */
  /** The GramLake gate fixture: train grams (doc_id % 10 <> 0) in one
    * increment, bench grams (doc_id % 10 = 0) in TWO tranches split on
    * mod 20 — their union is exactly the one-shot gates' bench slice,
    * which is what lets both _incr gates reuse the one-shot oracles. */
  private def gramLakeBuild(s: SparkSession, dir: String)(o: String): Unit = {
    val docs = Tables.documents(s, dir)
    graft.sources.GramLake.appendTrain(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "text", n = 5, s"$o/lake", batchId = Some(0L))
    graft.sources.GramLake.appendBench(docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 5, s"$o/lake", batchId = Some(0L))
    graft.sources.GramLake.appendBench(docs.filter(col("doc_id") % 20 === 10),
      "doc_id", "text", n = 5, s"$o/lake", batchId = Some(1L))
  }

  /** Graded-contamination oracle shared by x_contamination_score
    * (one-shot) and x_contamination_score_incr (GramLake): every train
    * doc's distinct-n-gram overlap with the bench slice, half-up 4-dp. */
  private def contaminationScoreOracle(n: Int): String = {
    val gram = (0 until n).map(j => s"words[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(words) >= $n THEN list_distinct(list_transform(
       |           generate_series(1, len(words) - ${n - 1}), i -> $gram))
       |         ELSE [] END) AS ng
       |  FROM w
       |), bench AS (
       |  SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0
       |), totals AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
       |  FROM g WHERE doc_id % 10 <> 0 GROUP BY doc_id
       |), hits AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS hits
       |  FROM g JOIN bench USING (ng)
       |  WHERE g.doc_id % 10 <> 0 GROUP BY g.doc_id
       |)
       |SELECT d.doc_id,
       |       coalesce(t.n_grams, 0) AS n_grams,
       |       coalesce(h.hits, 0) AS hits,
       |       CASE WHEN coalesce(t.n_grams, 0) = 0 THEN 0.0
       |            ELSE floor(CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
       |                       * 10000 + 0.5) / 10000.0 END AS overlap_r4
       |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 <> 0) d
       |LEFT JOIN totals t USING (doc_id)
       |LEFT JOIN hits h USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private def decontaminateOracle(n: Int): String = {
    val gram = (0 until n).map(j => s"words[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(
       |    CASE WHEN len(words) >= $n THEN list_distinct(list_transform(
       |           generate_series(1, len(words) - ${n - 1}), i -> $gram))
       |         ELSE [] END) AS ng
       |  FROM w
       |)
       |SELECT t.doc_id,
       |       CAST(count(DISTINCT t.ng) AS BIGINT) AS hits,
       |       CAST(count(DISTINCT b.doc_id) AS BIGINT) AS bench_docs
       |FROM g t JOIN g b ON t.ng = b.ng
       |WHERE t.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Per-epoch reshuffle oracle shared by x_epoch_shuffle (derived
    * in-flight) and x_epoch_lake (committed layouts read back): the
    * md5-uniform shard deal and the independent md5 order key, epochs
    * 0 and 1, 12 shards, seed 42. */
  private lazy val epochShuffleOracleSql: String = {
    val u = mdUniformSql(
      "'shard:42:' || CAST(ep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    s"""WITH e AS (
       |  SELECT doc_id, 0 AS ep FROM documents
       |  UNION ALL
       |  SELECT doc_id, 1 AS ep FROM documents
       |), k AS (
       |  SELECT CAST(ep AS BIGINT) AS epoch, doc_id,
       |         CAST(floor($u * 12) AS BIGINT) AS shard_id,
       |         md5('epoch:42:' || CAST(ep AS VARCHAR) || ':'
       |             || CAST(doc_id AS VARCHAR)) AS ok
       |  FROM e
       |)
       |SELECT epoch, shard_id,
       |       CAST(row_number() OVER (PARTITION BY epoch, shard_id
       |         ORDER BY ok, doc_id) - 1 AS BIGINT) AS pos,
       |       doc_id
       |FROM k ORDER BY epoch, shard_id, pos""".stripMargin
  }

  /** Greedy-minimal-chain proximity oracle shared by
    * x_proximity_search (one-shot tokenize) and x_proximity_lake
    * (positions from the postings lake): the min-doc 3-word prefix,
    * slop 2 → window limit k-1+slop = 4. */
  private val proximityOracleSql: String =
    """WITH pw AS (
      |  SELECT i - 1 AS slot, w[i] AS term
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents
      |        WHERE doc_id = (SELECT min(doc_id) FROM documents)),
      |       UNNEST(generate_series(1, 3)) t(i)
      |), toks AS (
      |  SELECT doc_id, i - 1 AS p, w[i] AS term
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |       UNNEST(generate_series(1, len(w))) t(i)
      |), slotlists AS (
      |  SELECT t.doc_id, pw.slot, list(t.p ORDER BY t.p) AS ps
      |  FROM toks t JOIN pw ON t.term = pw.term
      |  GROUP BY t.doc_id, pw.slot
      |), m AS (
      |  SELECT doc_id,
      |         any_value(ps) FILTER (WHERE slot = 0) AS ps0,
      |         any_value(ps) FILTER (WHERE slot = 1) AS ps1,
      |         any_value(ps) FILTER (WHERE slot = 2) AS ps2
      |  FROM slotlists GROUP BY doc_id HAVING count(*) = 3
      |), chains AS (
      |  SELECT doc_id, p0,
      |         list_filter(ps2, x ->
      |           x > list_filter(ps1, y -> y > p0)[1])[1] AS e
      |  FROM m, UNNEST(ps0) u(p0)
      |), ok AS (
      |  SELECT doc_id, p0, e FROM chains
      |  WHERE e IS NOT NULL AND e - p0 <= 4
      |)
      |SELECT doc_id, count(*) AS n_windows,
      |       CAST(min(p0) AS BIGINT) AS first_start,
      |       CAST(min(e - p0 + 1) AS BIGINT) AS min_span_tokens
      |FROM ok GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Anchor-vote phrase oracle shared by x_phrase_search (one-shot)
    * and x_phrase_lake (positional postings): the phrase is the first
    * three words of the lowest-id document, each matching token votes
    * anchor = pos − off, and an anchor carrying all three distinct
    * offsets is one contiguous occurrence. */
  private val phraseOracleSql: String =
    """WITH pw AS (
      |  SELECT i - 1 AS off, w[i] AS term
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents
      |        WHERE doc_id = (SELECT min(doc_id) FROM documents)),
      |       UNNEST(generate_series(1, 3)) t(i)
      |), toks AS (
      |  SELECT doc_id, i - 1 AS p, w[i] AS term
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |       UNNEST(generate_series(1, len(w))) t(i)
      |), votes AS (
      |  SELECT t.doc_id, t.p - pw.off AS anchor, pw.off
      |  FROM toks t JOIN pw ON t.term = pw.term
      |  WHERE t.p - pw.off >= 0
      |), occ AS (
      |  SELECT doc_id, anchor FROM votes
      |  GROUP BY doc_id, anchor HAVING count(DISTINCT off) = 3
      |)
      |SELECT doc_id, count(*) AS n_occurrences,
      |       CAST(min(anchor) AS BIGINT) AS first_pos
      |FROM occ GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Gaps-and-islands highlight oracle shared by x_highlight (one-shot
    * re-tokenize) and x_highlight_lake (positions from the postings
    * lake, text point-read through the docs lake): merged ±3-word
    * spans around every 'spark'/'stream' hit, reassembled with " ... "
    * separators — string/integer exact end to end. */
  private val highlightOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, i - 1 AS p, w[i] AS term
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |       UNNEST(generate_series(1, len(w))) t(i)
      |), hits AS (
      |  SELECT doc_id, CAST(p AS BIGINT) AS p FROM toks
      |  WHERE term IN ('spark', 'stream')
      |), g AS (
      |  SELECT doc_id, p,
      |         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 6
      |              THEN 1 ELSE 0 END AS gap
      |  FROM hits
      |), g2 AS (
      |  SELECT doc_id, p,
      |         sum(gap) OVER (PARTITION BY doc_id ORDER BY p
      |                        ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM g
      |), spans AS (
      |  SELECT doc_id, grp, greatest(min(p) - 3, 0) AS s, max(p) + 3 AS e,
      |         count(*) AS nh
      |  FROM g2 GROUP BY doc_id, grp
      |), agg AS (
      |  SELECT doc_id, CAST(sum(nh) AS BIGINT) AS n_hits,
      |         count(*) AS n_spans,
      |         list(struct_pack(s := s, e := e) ORDER BY s) AS sp
      |  FROM spans GROUP BY doc_id
      |)
      |SELECT a.doc_id, n_hits, n_spans,
      |       array_to_string(
      |         list_transform(sp, x ->
      |           array_to_string(list_slice(d.w, CAST(x.s + 1 AS BIGINT),
      |             CAST(x.e + 1 AS BIGINT)), ' ')),
      |         ' ... ') AS snippet
      |FROM agg a
      |JOIN (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d
      |  USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** md5-nibble uniform [0,1) in DuckDB SQL — the oracle twin of
    * graft.functions.HashRandom.uniform. */
  private[queries] def mdUniformSql(key: String): String = {
    val md = s"md5($key)"
    val nibs = (1 to 6).map { k =>
      s"(CASE WHEN ascii(substr($md, $k, 1)) <= 57" +
        s" THEN ascii(substr($md, $k, 1)) - 48" +
        s" ELSE ascii(substr($md, $k, 1)) - 87 END)"
    }
    s"(CAST(${nibs.reduce((a, b) => s"(($a) * 16 + $b)")} AS DOUBLE) / 16777216)"
  }
}
