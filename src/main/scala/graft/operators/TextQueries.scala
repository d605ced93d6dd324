package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Text-analysis operators for LLM training-data pipelines
  * (SURVEY.md §2.9 + the driver mandate): tokenization, corpus stats,
  * TF-IDF, n-grams, language-ID, quality scoring, token counting, and
  * document fingerprinting — all over the `documents` table.
  *
  * Everything is built-in higher-order/codegen functions (no UDFs): the
  * token explode → group pipeline is one shuffle keyed by term, exactly
  * the shape that scales to a 100 TB corpus (partial aggregation
  * collapses per-task term counts before the exchange).
  */
object TextQueries {

  private def tokens: Column = split(col("text"), " ")

  /** Tokenize + global top-20 terms. */
  val qTextTokens: QDef = QDef(
    "q_text_tokens",
    """SELECT w, COUNT(*) AS c
      |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |GROUP BY w
      |ORDER BY c DESC, w
      |LIMIT 20""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(explode(tokens).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(20)
  }

  /** Per-language corpus profile: doc counts, word/char statistics. */
  val qTextStats: QDef = QDef(
    "q_text_stats",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
      |    AS BIGINT) AS total_words,
      |  ROUND(AVG(CAST(len(string_split(text, ' ')) AS BIGINT)), 4)
      |    AS avg_words,
      |  ROUND(AVG(length(text)), 4) AS avg_chars,
      |  ROUND(AVG(length(text) / len(string_split(text, ' '))), 4)
      |    AS avg_token_len
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    // project n_words/n_chars once so the split runs once per row, not
    // once per aggregate expression
    documents(s, d)
      .select(
        col("lang"),
        size(tokens).as("n_words"),
        length(col("text")).as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("bigint")).as("total_words"),
        round(avg(col("n_words").cast("bigint")), 4).as("avg_words"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(avg(col("n_chars") / col("n_words")), 4).as("avg_token_len"))
      .orderBy(col("lang"))
  }

  /** TF-IDF: top-3 scored terms per document (first 100 docs). Pure
    * relational composition — explode, two aggregations, the
    * document-frequency join, and a ranking window.
    *
    * The df side carries NO broadcast hint: its cardinality is the
    * vocabulary, which grows with the corpus — a static hint would pin a
    * driver-OOM plan at 100 TB. AQE picks broadcast at fixture scale on
    * its own (asserted in PlanSpec) and falls back to a shuffle join
    * when the vocabulary outgrows the threshold. The single-row n_docs
    * broadcast is size-invariant and stays. */
  val qTfidf: QDef = QDef(
    "q_tfidf",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
      |df AS (
      |  SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.w,
      |    ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
      |  FROM tf JOIN df USING (w) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, w) AS INT) AS rk
      |  FROM scored)
      |SELECT doc_id, w, score, rk FROM ranked
      |WHERE rk <= 3 AND doc_id < 100
      |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    val tok = documents(s, d).select(col("doc_id"), explode(tokens).as("w"))
    val tf = tok.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    // r15 opt: df derives from tf — COUNT DISTINCT doc_id over tokens
    // is EXACTLY the number of tf rows per term (tf's key IS the
    // distinct (doc_id, w) set). This removes a second corpus explode
    // and the two-phase distinct-aggregate machinery; the q_bm25 twin
    // has had this shape since r12.
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("w"))
    tf.join(df, "w")
      .crossJoin(broadcast(nDocs))
      .select(
        col("doc_id"), col("w"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4)
          .as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3 && col("doc_id") < 100)
      .select(col("doc_id"), col("w"), col("score"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Word bigram counts (top-20). 1-indexed element_at mirrors DuckDB's
    * 1-based list indexing; docs with <2 tokens are filtered (Spark's
    * sequence(2,1) would run DESCENDING — the classic off-by-one). */
  val qNgram: QDef = QDef(
    "q_ngram",
    """SELECT bg, COUNT(*) AS c
      |FROM (
      |  SELECT unnest(list_transform(range(2, len(l) + 1),
      |    i -> l[i-1] || ' ' || l[i])) AS bg
      |  FROM (SELECT string_split(text, ' ') AS l FROM documents)
      |  WHERE len(l) >= 2)
      |GROUP BY bg
      |ORDER BY c DESC, bg
      |LIMIT 20""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(tokens.as("l"))
      .filter(size(col("l")) >= 2)
      .select(
        explode(
          transform(
            sequence(lit(2), size(col("l"))),
            i =>
              concat_ws(
                " ",
                element_at(col("l"), i - 1),
                element_at(col("l"), i)))).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("bg"))
      .limit(20)
  }

  /** Stopword dictionaries for the language-ID heuristic (tiny fixed
    * lists — on real corpora these come from per-language frequency
    * tables; the operator shape is what matters). */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "zh" -> Seq("de", "le", "he", "shi", "bu"))

  /** Language-ID by stopword-hit scoring: count tokens present in each
    * language's dictionary, predict the argmax (ties broken by language
    * code). The SQL twin computes identical hit counts, making this
    * heuristic fully oracle-checkable. */
  val qLangId: QDef = QDef(
    "q_lang_id", {
      val hitExprs = langStops.map { case (lg, ws) =>
        val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), $lst)) AS BIGINT) AS hits_$lg"
      }.mkString(",\n      |  ")
      val pairs = langStops.map { case (lg, _) =>
        s"{'lang': '$lg', 'hits': hits_$lg}"
      }.mkString("[", ", ", "]")
      s"""SELECT doc_id, lang, hits_en, hits_de, hits_es, hits_fr, hits_zh,
         |  (SELECT MIN(x.lang) FROM unnest($pairs) AS t(x)
         |   WHERE x.hits = greatest(hits_en, hits_de, hits_es, hits_fr,
         |                           hits_zh)) AS predicted
         |FROM (
         |  SELECT doc_id, lang,
         |  $hitExprs
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val toks = array_distinct(tokens)
    val hits = langStops.map { case (lg, ws) =>
      size(array_intersect(toks, array(ws.map(lit): _*))).cast("bigint")
        .as(s"hits_$lg")
    }
    val hitCols = langStops.map { case (lg, _) => col(s"hits_$lg") }
    // argmax with MIN(lang) tie-break: filter the (lang, hits) pairs to
    // those equal to the max, take the lexicographically first lang
    val pairs = array(langStops.map { case (lg, _) =>
      struct(lit(lg).as("lang"), col(s"hits_$lg").as("hits"))
    }: _*)
    val best = array_min(
      filter(pairs, p => p.getField("hits") === greatest(hitCols: _*))
    ).getField("lang")
    documents(s, d)
      .select(col("doc_id") +: col("lang") +: hits: _*)
      .withColumn("predicted", best)
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length/stopword/uniqueness ratios composed into a
    * single score — the standard pre-training corpus filter shape. */
  val qQualityScore: QDef = QDef(
    "q_quality_score",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  ROUND(CAST(length(text) AS DOUBLE)
      |    / len(string_split(text, ' ')), 4) AS avg_word_len,
      |  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')), 4) AS uniq_ratio,
      |  ROUND(CAST(len(list_intersect(list_distinct(string_split(text,
      |    ' ')), ['the', 'a', 'of', 'and', 'to'])) AS DOUBLE) / 5, 4)
      |    AS stop_hit,
      |  ROUND(LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50, 1.0)
      |    * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |       / len(string_split(text, ' '))), 4) AS quality
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val n = size(tokens)
    val uniq = size(array_distinct(tokens))
    val stopHit = size(
      array_intersect(
        array_distinct(tokens),
        array(Seq("the", "a", "of", "and", "to").map(lit): _*)))
    documents(s, d)
      .select(
        col("doc_id"),
        n.cast("bigint").as("n_words"),
        round(length(col("text")).cast("double") / n, 4).as("avg_word_len"),
        round(uniq.cast("double") / n, 4).as("uniq_ratio"),
        round(stopHit.cast("double") / 5, 4).as("stop_hit"),
        round(
          least(n.cast("double") / 50, lit(1.0))
            * (uniq.cast("double") / n),
          4).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting two ways: whitespace words and a BPE-ish subword
    * count (≤4-char greedy chunks via regex) — the cheap token-budget
    * estimator for LLM pipelines. */
  val qTokenCount: QDef = QDef(
    "q_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS BIGINT)
      |    AS subword_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        size(tokens).cast("bigint").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]{1,4}"), lit(0)))
          .cast("bigint").as("subword_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set (a
    * bag-of-words fingerprint — robust to token order, portable across
    * engines because md5 is bit-stable; SURVEY §0 fact 4). */
  val qFingerprint: QDef = QDef(
    "q_fingerprint",
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split(text, ' '))), ' ')) AS fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens))).cast("binary"))
          .as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Repetition ratio: fraction of duplicated word bigrams per doc —
    * the compression-style repetition signal used to filter loopy/
    * boilerplate text from training corpora. Pure integer counts
    * divided once at the end, so the oracle matches exactly. */
  val qRepetition: QDef = QDef(
    "q_repetition",
    """SELECT doc_id,
      |  CAST(len(bgs) AS BIGINT) AS n_bigrams,
      |  CAST(len(list_distinct(bgs)) AS BIGINT) AS n_distinct,
      |  ROUND(1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs), 4)
      |    AS rep_ratio
      |FROM (
      |  SELECT doc_id, list_transform(range(2, len(l) + 1),
      |    i -> l[i-1] || ' ' || l[i]) AS bgs
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      |  WHERE len(l) >= 2)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bigrams = transform(
      sequence(lit(2), size(col("l"))),
      i =>
        concat_ws(" ", element_at(col("l"), i - 1), element_at(col("l"), i)))
    documents(s, d)
      .select(col("doc_id"), tokens.as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), bigrams.as("bgs"))
      .select(
        col("doc_id"),
        size(col("bgs")).cast("bigint").as("n_bigrams"),
        size(array_distinct(col("bgs"))).cast("bigint").as("n_distinct"),
        round(
          lit(1.0) - size(array_distinct(col("bgs"))).cast("double")
            / size(col("bgs")),
          4).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Canonicalizing text normalization (the cleanup pass before any
    * dedup/fingerprint stage): lowercase, collapse runs of whitespace,
    * trim. Emitted as md5 + length rather than the full text — the
    * normalized form is what downstream exact-dedup keys on, and md5 is
    * the one cross-engine-stable hash (SURVEY §0). Pure per-row map:
    * zero shuffles except the output sort. */
  val qTextNormalize: QDef = QDef(
    "q_text_normalize",
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
      |    AS norm_md5,
      |  length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
      |    AS norm_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    documents(s, d)
      .select(
        col("doc_id"),
        md5(norm.cast("binary")).as("norm_md5"),
        length(norm).cast("bigint").as("norm_len"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing / rolling-hash fingerprint (the order-SENSITIVE local
    * fingerprint, vs qFingerprint's order-free bag digest): hash every
    * character 8-gram, keep the minimum of each 4-hash window, digest
    * the distinct minima. Matching fingerprints localize SHARED
    * PASSAGES, which is what plagiarism/quote detection needs and a
    * bag digest cannot give. Hashes are md5-derived (the only
    * cross-engine hash) over the first 128 chars — the oracle-checkable
    * demo bound; the full-corpus path swaps in xxhash64 (5× cheaper,
    * engine-internal → no oracle) with identical shape. */
  val qWinnowFingerprint: QDef = QDef(
    "q_winnow_fingerprint",
    """WITH t AS (
      |  SELECT doc_id, substr(lower(text), 1, 128) AS s FROM documents),
      |g AS (
      |  SELECT doc_id, list_transform(range(1, length(s) - 6),
      |    i -> CAST(('0x' || substr(md5(substr(s, CAST(i AS INT), 8)),
      |      1, 8)) AS BIGINT)) AS hs
      |  FROM t WHERE length(s) >= 8),
      |w AS (
      |  SELECT doc_id, list_transform(range(1, len(hs) - 2),
      |    j -> list_min(hs[CAST(j AS BIGINT):CAST(j + 3 AS BIGINT)]))
      |    AS mins
      |  FROM g WHERE len(hs) >= 4)
      |SELECT doc_id,
      |  CAST(len(list_distinct(mins)) AS BIGINT) AS n_fp,
      |  md5(array_to_string(list_sort(list_distinct(mins)), ','))
      |    AS fp_digest
      |FROM w
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // Third form of this query. Round 1 composed transform() lambdas
    // (interpreted per element: ~22 s at sf0.1); round 3 exploded grams
    // through a window-min + collect_set groupBy (codegen'd md5, but
    // ~120 rows/doc shuffled twice and window-sorted: ~1.6 s). The work
    // is strictly per-document over a BOUNDED 128-char prefix, so the
    // fused WinnowFingerprint expression does the whole pipeline in one
    // per-row pass — no explode, no shuffle, no sort (~0.3 s), values
    // bit-identical to both earlier forms and the unchanged oracle.
    val txt = substring(lower(col("text")), 1, 128)
    documents(s, d)
      .select(col("doc_id"), txt.as("s"))
      .filter(length(col("s")) >= 11) // ≥ 4 grams of 8 → ≥ 1 window
      .select(
        col("doc_id"),
        graft.functions.WinnowFingerprint(col("s"), 8, 4).as("fp"))
      .select(
        col("doc_id"), col("fp.n_fp").as("n_fp"),
        col("fp.fp_digest").as("fp_digest"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level Flesch-style readability per language: words per
    * sentence and vowel-group (syllable proxy) per word computed from
    * CORPUS-AGGREGATED integer counts — not an AVG of per-doc doubles,
    * so the ratios are exact BIGINT divisions (order-independent) and
    * only the final linear formula is float. Sentences are guarded
    * with GREATEST(1,·) (the synthetic corpus has no terminal
    * punctuation; real corpora do). One grouped pass; the regex
    * counters are per-row scalar work that scales linearly. */
  val qReadability: QDef = QDef(
    "q_readability",
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
      |  ROUND(CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      AS DOUBLE)
      |    / SUM(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))),
      |    4) AS words_per_sentence,
      |  ROUND(CAST(SUM(CAST(len(regexp_extract_all(lower(text),
      |        '[aeiouy]+')) AS BIGINT)) AS DOUBLE)
      |    / SUM(len(string_split(text, ' '))), 4) AS syll_per_word,
      |  ROUND(206.835
      |    - 1.015 * (CAST(SUM(CAST(len(string_split(text, ' '))
      |        AS BIGINT)) AS DOUBLE)
      |      / SUM(GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))))
      |    - 84.6 * (CAST(SUM(CAST(len(regexp_extract_all(lower(text),
      |        '[aeiouy]+')) AS BIGINT)) AS DOUBLE)
      |      / SUM(len(string_split(text, ' ')))), 4) AS flesch
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val words = size(split(col("text"), " "))
    val sentences = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+")))
    val sylls = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(words.cast("bigint")).as("w"),
        sum(sentences.cast("bigint")).as("st"),
        sum(sylls.cast("bigint")).as("sy"))
      .select(col("lang"), col("docs"),
        round(col("w").cast("double") / col("st"), 4)
          .as("words_per_sentence"),
        round(col("sy").cast("double") / col("w"), 4).as("syll_per_word"),
        round(lit(206.835)
          - lit(1.015) * (col("w").cast("double") / col("st"))
          - lit(84.6) * (col("sy").cast("double") / col("w")), 4)
          .as("flesch"))
      .orderBy(col("lang"))
  }

  /** Per-document bigram-LM perplexity — the model-based quality
    * filter real curation pipelines run after the heuristic ones
    * (q_quality_score): train a maximum-likelihood bigram model on
    * the corpus itself, score every document by
    * exp(−mean log p(wᵢ₊₁|wᵢ)), and the gibberish floats to the top.
    * Self-scoring means no OOV smoothing is needed (every document
    * bigram is in the model by construction).
    *
    * Scale shape: bigram types aggregate with partial map-side
    * combine (vocab²-bounded, not corpus-bounded); the model is one
    * (bigram → log-prob) table the document stream joins on its
    * bigram key — an equi-join Spark shuffles on both sides, no
    * broadcast of a vocabulary-sized table (the q_tfidf lesson).
    *
    * Determinism: c12/c1 is a ratio of exact BIGINTs (identical IEEE
    * divide), LN of it is quantized to integer MICRO-units per bigram
    * TYPE — micro, not nano: the coarser grid keeps the probability
    * that a 1-ulp cross-engine LN wobble crosses a FLOOR boundary
    * below ~1e-9 per type while costing only 1e-6 log-space
    * precision — so the per-doc sum is an exact long. The score is
    * emitted as the mean negative log-likelihood (avg_nll, nats per
    * bigram; perplexity = exp(avg_nll)) rather than exponentiated:
    * EXP is NOT correctly rounded in either libm or java.lang.Math,
    * and measured 1-ulp divergence on 35/500 docs — whereas the two
    * IEEE divides on exact integers, applied in the same order, are
    * bit-identical by the standard. */
  val qBigramPerplexity: QDef = QDef(
    "q_bigram_perplexity",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |b AS (
      |  SELECT doc_id, UNNEST(list_transform(range(1, len(l)),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg
      |  FROM t WHERE len(l) >= 2),
      |cb AS (SELECT bg, COUNT(*) AS c12 FROM b GROUP BY 1),
      |cw AS (
      |  SELECT string_split(bg, ' ')[1] AS w1, SUM(c12) AS c1
      |  FROM cb GROUP BY 1),
      |lm AS (
      |  SELECT bg, CAST(FLOOR(LN(CAST(c12 AS DOUBLE) / c1) * 1e6)
      |    AS BIGINT) AS lp_micro
      |  FROM cb JOIN cw ON string_split(cb.bg, ' ')[1] = cw.w1)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(-SUM(lp_micro) AS DOUBLE) / 1e6 / COUNT(*) AS avg_nll
      |FROM b JOIN lm USING (bg)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val b = documents(s, d)
      .select(col("doc_id"), tokens.as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(l) - 1), " +
          "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
          .as("bg"))
    // r15 MEASURED REFUSAL: localCheckpoint'ing the 931-row cb grain
    // (its two consumers each re-run the corpus explode) was tried and
    // REVERTED — sf1 median went 5.40 → 8.28 s (n=6, steal 320 ms).
    // The eager checkpoint serializes what AQE otherwise overlaps (the
    // cw/lm broadcast builds run concurrently with the probe-side
    // scan), so removing the duplicate passes cost more wall-clock
    // than it saved. The duplicated work is broadcast-BUILD-side and
    // bounded by bigram types, not the corpus.
    val cb = b.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val cw = cb
      .groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val lm = cb
      .join(cw, split(cb("bg"), " ").getItem(0) === cw("w1"))
      .select(col("bg"),
        floor(log(col("c12").cast("double") / col("c1")) * lit(1e6))
          .cast("bigint").as("lp_micro"))
    b.join(lm, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_micro")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        ((-col("slp")).cast("double") / lit(1e6) / col("n_bigrams"))
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Shared SQL CTE chain ending in `dw(doc_id, n_bigrams, slp)` — the
    * per-doc interpolated-KN totals both [[qKneserNey]] and the CCNet
    * bucketing report (SelectionQueries.qCcnetBuckets) build on. */
  private[operators] val knDocSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |b AS (
      |  SELECT doc_id, UNNEST(list_transform(range(1, len(l)),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg
      |  FROM t WHERE len(l) >= 2),
      |cb AS (SELECT bg, COUNT(*) AS c12 FROM b GROUP BY 1),
      |cw AS (
      |  SELECT string_split(bg, ' ')[1] AS w1, SUM(c12) AS c1,
      |    COUNT(*) AS n1w1
      |  FROM cb GROUP BY 1),
      |cont AS (
      |  SELECT string_split(bg, ' ')[2] AS w2, COUNT(*) AS n1w2
      |  FROM cb GROUP BY 1),
      |tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS T FROM cb),
      |lm AS (
      |  SELECT bg, CAST(FLOOR(LN(
      |      GREATEST(CAST(c12 AS DOUBLE) - 0.75, 0) / c1
      |      + (0.75 * CAST(n1w1 AS DOUBLE) / c1) * (n1w2 / T)) * 1e6)
      |    AS BIGINT) AS lp_micro
      |  FROM cb
      |  JOIN cw ON string_split(cb.bg, ' ')[1] = cw.w1
      |  JOIN cont ON string_split(cb.bg, ' ')[2] = cont.w2
      |  CROSS JOIN tt),
      |dw AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp_micro) AS slp
      |  FROM b JOIN lm USING (bg)
      |  GROUP BY doc_id)""".stripMargin

  /** Per-doc interpolated-KN totals: (doc_id, n_bigrams, slp BIGINT =
    * Σ lp_micro) — the Spark twin of [[knDocSql]]'s `dw` CTE, shared
    * with the CCNet perplexity-bucketing report and DoReMi domain
    * reweighting. Memoized per (session, sfDir): the LM is built ONCE
    * and every report that scores with it reads the persisted
    * |docs|-row totals — three consumers, one bigram-join chain. */
  private[operators] def knDocTotals(
      s: SparkSession, d: String): DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(s, ("kn_doc_totals", d)) {
      knDocTotalsOf(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def knDocTotalsOf(s: SparkSession, d: String): DataFrame = {
    val b = documents(s, d)
      .select(col("doc_id"), tokens.as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(l) - 1), " +
          "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
          .as("bg"))
    val cb = b.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val cw = cb
      .groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1w1"))
    val cont = cb
      .groupBy(split(col("bg"), " ").getItem(1).as("w2"))
      .agg(count(lit(1)).as("n1w2"))
    val tt = cb.agg(count(lit(1)).cast("double").as("T"))
    val p =
      greatest(col("c12").cast("double") - lit(0.75), lit(0.0)) /
        col("c1") +
        (lit(0.75) * col("n1w1").cast("double") / col("c1")) *
          (col("n1w2") / col("T"))
    val lm = cb
      .join(cw, split(cb("bg"), " ").getItem(0) === cw("w1"))
      .join(cont, split(cb("bg"), " ").getItem(1) === cont("w2"))
      .crossJoin(broadcast(tt))
      .select(col("bg"),
        floor(log(p) * lit(1e6)).cast("bigint").as("lp_micro"))
    b.join(lm, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_micro")).as("slp"))
  }

  /** Interpolated Kneser–Ney bigram scoring (D = 0.75) — the smoothing
    * actually used by n-gram LM quality filters, upgrading
    * q_bigram_perplexity's raw MLE: probability mass is discounted from
    * observed bigrams and redistributed through the CONTINUATION
    * distribution (how many distinct contexts a word follows — "san
    * francisco"-type words score low as novel continuations no matter
    * how frequent the bigram). P(w2|w1) = max(c12−D,0)/c1 +
    * (D·N1+(w1·)/c1)·(N1+(·w2)/T). All counts are exact integers from
    * three hash aggregates over the distinct-bigram table; per-bigram
    * log-probs quantize to integer micro-units before the per-doc sum
    * (the established order-independence idiom); the double arithmetic
    * inside ln() is structured identically on both engines. Join keys
    * are uniformly-hashed tokens, vocab-sized dims broadcast via AQE —
    * the q_tfidf/q_bm25 shape. */
  val qKneserNey: QDef = QDef(
    "q_kneser_ney",
    s"""$knDocSql
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(-slp AS DOUBLE) / 1e6 / n_bigrams AS avg_nll_kn
      |FROM dw
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    knDocTotals(s, d)
      .select(col("doc_id"), col("n_bigrams"),
        ((-col("slp")).cast("double") / lit(1e6) / col("n_bigrams"))
          .as("avg_nll_kn"))
      .orderBy(col("doc_id"))
  }


  /** Zipf exponent of the corpus word distribution: OLS fit of
    * ln(freq) on ln(rank) over the TOP-100 frequency head (natural
    * language sits near α ≈ 1 — a corpus that doesn't is synthetic,
    * templated, or spam-heavy, which makes α a cheap corpus-health
    * gate). Top-k-FIRST: the vocabulary aggregate takes a 100-row
    * TakeOrdered before any serial work, so the rank window and the
    * regression see 100 rows at any corpus size. Both ln() inputs are
    * quantized to exact integer micro-units before the moment sums
    * (the bigram-perplexity trick) — double sums would be
    * partial-order-dependent. */
  val qZipfAlpha: QDef = QDef(
    "q_zipf_alpha",
    """WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
      |t AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 100),
      |r AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rnk, cnt
      |  FROM t),
      |q AS (
      |  SELECT CAST(FLOOR(LN(rnk) * 1000000) AS BIGINT) AS qx,
      |    CAST(FLOOR(LN(cnt) * 1000000) AS BIGINT) AS qy
      |  FROM r),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
      |    CAST(SUM(qx * qy) AS BIGINT) AS sxy,
      |    CAST(SUM(qx * qx) AS BIGINT) AS sxx
      |  FROM q)
      |SELECT n AS n_terms,
      |  ROUND(-((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)), 4)
      |    AS zipf_alpha
      |FROM s""".stripMargin) { (s, d) =>
    val c = documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val t = c.orderBy(col("cnt").desc, col("word")).limit(100)
    val r = t.select(
      row_number().over(Window.orderBy(col("cnt").desc, col("word")))
        .as("rnk"), col("cnt"))
    val q = r.select(
      floor(log(col("rnk")) * 1000000).cast("bigint").as("qx"),
      floor(log(col("cnt")) * 1000000).cast("bigint").as("qy"))
    q.agg(
      count(lit(1)).as("n"),
      sum(col("qx")).as("sx"), sum(col("qy")).as("sy"),
      sum(col("qx") * col("qy")).as("sxy"),
      sum(col("qx") * col("qx")).as("sxx"))
      .select(col("n").as("n_terms"),
        round(-((col("n") * col("sxy") - col("sx") * col("sy")) *
          lit(1.0) /
          (col("n") * col("sxx") - col("sx") * col("sx"))), 4)
          .as("zipf_alpha"))
  }

  val defs: Seq[QDef] = Seq(
    qTextTokens, qTextStats, qTfidf, qNgram, qLangId, qQualityScore,
    qTokenCount, qFingerprint, qRepetition, qTextNormalize,
    qWinnowFingerprint, qReadability, qBigramPerplexity, qKneserNey,
    qZipfAlpha)
}
