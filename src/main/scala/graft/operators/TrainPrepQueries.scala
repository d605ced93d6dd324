package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Training-batch preparation operators: concat-then-chunk sequence
  * packing, context-window truncation, and the staged curation-yield
  * funnel — the last mile between a curated corpus and model input.
  *
  * Scale shapes: packing runs per-source (each source packs its own
  * token stream — embarrassingly parallel across the partition key,
  * one window sort within it); truncation is pure map-side;
  * the funnel is one scan with cumulative count_if conditions plus a
  * dedup-keeper window on the text hash.
  */
object TrainPrepQueries {

  /** Concat-then-chunk sequence packing (block size 512 tokens): lay
    * every source's documents end-to-end in doc_id order and cut
    * fixed 512-token blocks — the standard LLM pretraining batch
    * layout (documents straddle block boundaries by design). All
    * integer arithmetic: a running token sum gives each document its
    * start offset, floor-division gives its first/last block. */
  val qPackSequences: QDef = QDef(
    "q_pack_sequences",
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS start_tok
      |  FROM t)
      |SELECT doc_id, source, n_tok, start_tok,
      |  start_tok // 512 AS chunk_first,
      |  (start_tok + n_tok - 1) // 512 AS chunk_last,
      |  start_tok // 512 <> (start_tok + n_tok - 1) // 512
      |    AS straddles
      |FROM c
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(w), lit(0L)).cast("long"))
      .select(
        col("doc_id"), col("source"), col("n_tok"), col("start_tok"),
        expr("start_tok div 512").as("chunk_first"),
        expr("(start_tok + n_tok - 1) div 512").as("chunk_last"),
        (expr("start_tok div 512")
          =!= expr("(start_tok + n_tok - 1) div 512")).as("straddles"))
      .orderBy(col("doc_id"))
  }

  /** Context-window truncation (keep the first 64 tokens): the
    * map-side clip every prompt/feature pipeline applies before
    * batching, with a truncation report. Token slicing is 1-based,
    * inclusive, identical on both engines. */
  val qTokenTruncate: QDef = QDef(
    "q_token_truncate",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  len(string_split(text, ' ')) > 64 AS was_truncated,
      |  CAST(length(array_to_string(
      |    list_slice(string_split(text, ' '), 1, 64), ' '))
      |    AS INT) AS n_kept_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    documents(s, d)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (size(toks) > 64).as("was_truncated"),
        length(concat_ws(" ", slice(toks, 1, 64))).as("n_kept_chars"))
      .orderBy(col("doc_id"))
  }

  /** Staged curation-yield funnel per source: total → token-length
    * band → supported language → lexical diversity → exact-dedup
    * keeper. Cumulative conditions (each stage implies all previous)
    * so the report reads as survivor counts; the dedup keeper is a
    * min-doc_id window over the text hash, not a join. The numbers a
    * curation run publishes after every sweep. */
  val qCurationFunnel: QDef = QDef(
    "q_curation_funnel",
    """WITH f AS (
      |  SELECT source,
      |    len(string_split(text, ' ')) BETWEEN 30 AND 80 AS len_ok,
      |    lang IN ('en', 'de', 'fr', 'es') AS lang_ok,
      |    len(list_distinct(string_split(text, ' '))) * 1.0
      |      / len(string_split(text, ' ')) >= 0.5 AS diverse,
      |    doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
      |      AS is_keeper
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE len_ok) AS n_len_ok,
      |  COUNT(*) FILTER (WHERE len_ok AND lang_ok) AS n_lang_ok,
      |  COUNT(*) FILTER (WHERE len_ok AND lang_ok AND diverse)
      |    AS n_diverse,
      |  COUNT(*) FILTER (WHERE len_ok AND lang_ok AND diverse
      |    AND is_keeper) AS n_final
      |FROM f
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    val wDup = Window.partitionBy(md5(col("text").cast("binary")))
    val f = documents(s, d)
      .select(
        col("source"),
        size(toks).between(30, 80).as("len_ok"),
        col("lang").isin("en", "de", "fr", "es").as("lang_ok"),
        (size(array_distinct(toks)) * lit(1.0) / size(toks) >= 0.5)
          .as("diverse"),
        (col("doc_id") === min(col("doc_id")).over(wDup)).as("is_keeper"))
    f.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        count_if(col("len_ok")).as("n_len_ok"),
        count_if(col("len_ok") && col("lang_ok")).as("n_lang_ok"),
        count_if(col("len_ok") && col("lang_ok") && col("diverse"))
          .as("n_diverse"),
        count_if(col("len_ok") && col("lang_ok") && col("diverse")
          && col("is_keeper")).as("n_final"))
      .orderBy(col("source"))
  }

  /** RAG-style document chunking: fixed 64-token windows with stride 48
    * (16-token overlap so no retrieval-relevant span is cut at a hard
    * boundary). Chunk count per doc is closed-form from the token count
    * (1 for short docs, else ceil((n-W)/S)+1), so the fan-out is a
    * per-row sequence+explode — embarrassingly parallel, no shuffle at
    * all until the output sort; at 100 TB this runs entirely map-side.
    * Each chunk carries its token offsets and the md5 of its
    * re-assembled text (the chunk-grain content key downstream
    * chunk-level dedup and embedding jobs join on). */
  /** Shared chunker: one row per (doc, 64-token window at stride 48)
    * with offsets + chunk-text md5 — map-side only (see qChunkOverlap
    * doc). The SQL twin below mirrors it for every consumer's oracle. */
  private def chunked(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val t = documents(s, d)
      .select(col("doc_id"), col("source"), toks.as("toks"),
        size(toks).as("n"))
    val nchunks = when(col("n") <= 64, lit(1))
      .otherwise(ceil((col("n") - lit(64)).cast("double") / 48.0)
        .cast("int") + 1)
    val start = col("chunk_idx") * 48
    t.withColumn("chunk_idx", explode(sequence(lit(0), nchunks - 1)))
      .select(
        col("doc_id"), col("source"), col("chunk_idx"),
        start.as("start_tok"),
        (least(start + 64, col("n")) - start).as("n_tok"),
        md5(array_join(slice(col("toks"), start + 1, lit(64)), " ")
          .cast("binary")).as("chunk_md5"))
  }

  private val chunkedSql =
    """t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, toks, n,
      |    unnest(range(CASE WHEN n <= 64 THEN 1
      |      ELSE CAST(CEIL((n - 64) / 48.0) AS BIGINT) + 1 END))
      |      AS chunk_idx
      |  FROM t),
      |ch AS (
      |  SELECT doc_id, source, CAST(chunk_idx AS INT) AS chunk_idx,
      |    CAST(chunk_idx * 48 AS INT) AS start_tok,
      |    CAST(LEAST(chunk_idx * 48 + 64, n) - chunk_idx * 48 AS INT)
      |      AS n_tok,
      |    md5(array_to_string(list_slice(toks, chunk_idx * 48 + 1,
      |      LEAST(chunk_idx * 48 + 64, n)), ' ')) AS chunk_md5
      |  FROM c)""".stripMargin

  val qChunkOverlap: QDef = QDef(
    "q_chunk_overlap",
    s"""WITH $chunkedSql
      |SELECT doc_id, chunk_idx, start_tok, n_tok, chunk_md5
      |FROM ch
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    chunked(s, d)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tok"), col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Chunk-grain exact dedup audit per source: total vs distinct chunk
    * hashes, the duplicated share, and the heaviest duplicate's count —
    * the chunk-level complement of doc-level q_dedup_exact (RAG indexes
    * dedup at CHUNK grain: a boilerplate header repeated across docs
    * dedups here even when no two whole docs match). Two hash
    * aggregates over the map-side chunker output. */
  val qDedupChunk: QDef = QDef(
    "q_dedup_chunk",
    s"""WITH $chunkedSql,
      |g AS (
      |  SELECT source, chunk_md5, COUNT(*) AS cnt
      |  FROM ch GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(cnt) AS BIGINT) AS n_chunks,
      |  CAST(COUNT(*) AS BIGINT) AS n_uniq,
      |  ROUND(1 - COUNT(*) * 1.0 / SUM(cnt), 4) + 0.0 AS dup_ratio,
      |  CAST(MAX(cnt) AS BIGINT) AS max_dup
      |FROM g GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    chunked(s, d)
      .groupBy(col("source"), col("chunk_md5"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_uniq"),
        (round(lit(1) - count(lit(1)) * lit(1.0) / sum(col("cnt")), 4)
          + lit(0.0)).as("dup_ratio"),
        max(col("cnt")).as("max_dup"))
      .select(col("source"), col("n_chunks"), col("n_uniq"),
        col("dup_ratio"), col("max_dup"))
      .orderBy(col("source"))
  }

  /** Temperature-based source rebalancing (the multilingual/multi-source
    * alpha-sampling rule: sample source i with probability ∝ p_i^α,
    * α = 0.7, so rare sources are boosted and head sources damped).
    * Per-source weights quantize pow(n,0.7) to exact integer
    * micro-units BEFORE summing (a 20-term double sum would be
    * partial-order-dependent across engines; integer sums are not).
    * The totals row broadcasts back — only |sources| rows exist after
    * the first aggregate, at any corpus size. */
  val qTemperatureMix: QDef = QDef(
    "q_temperature_mix",
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(FLOOR(POW(COUNT(*), 0.7) * 1000000) AS BIGINT) AS w
      |  FROM documents GROUP BY source),
      |t AS (
      |  SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
      |    CAST(SUM(w) AS BIGINT) AS z
      |  FROM s)
      |SELECT source, n_docs,
      |  ROUND(n_docs * 1.0 / total, 6) AS p_raw,
      |  ROUND(w * 1.0 / z, 6) AS p_temp,
      |  ROUND((w * 1.0 / z) / (n_docs * 1.0 / total), 4) AS boost
      |FROM s CROSS JOIN t
      |ORDER BY source""".stripMargin) { (s, d) =>
    val s0 = documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        floor(pow(count(lit(1)), lit(0.7)) * 1000000).cast("bigint")
          .as("w"))
    val t = s0.agg(sum(col("n_docs")).cast("bigint").as("total"),
      sum(col("w")).cast("bigint").as("z"))
    s0.crossJoin(broadcast(t))
      .select(
        col("source"), col("n_docs"),
        round(col("n_docs") * lit(1.0) / col("total"), 6).as("p_raw"),
        round(col("w") * lit(1.0) / col("z"), 6).as("p_temp"),
        round((col("w") * lit(1.0) / col("z")) /
          (col("n_docs") * lit(1.0) / col("total")), 4).as("boost"))
      .orderBy(col("source"))
  }

  /** T5/UL2-style SPAN CORRUPTION prep (r12): turn each document into
    * a (input_text, target_text) denoising pair — ~12.5% of tokens
    * masked by a DETERMINISTIC md5 coin per (doc_id, token index),
    * consecutive masked tokens collapsed into one `<extra_id_k>`
    * sentinel in the input, and the targets spelling each sentinel's
    * span back out — the standard denoising-objective data layout,
    * produced relationally: one posexplode, two partitioned windows
    * (run starts → run ids), one sort-deterministic string
    * aggregation. Scale shape: everything is per-document (window
    * partition = doc_id), so the operator is embarrassingly parallel
    * across the corpus with map-side-only rendering after one
    * shuffle on doc_id. The md5 coin makes the DuckDB oracle rebuild
    * the identical masks, runs, sentinels, and strings. */
  val qSpanCorrupt: QDef = QDef(
    "q_span_corrupt",
    """WITH tk AS (
      |  SELECT doc_id,
      |    UNNEST(list_transform(range(1, len(p) + 1),
      |      i -> struct_pack(idx := i - 1, tk := p[i]))) AS u
      |  FROM (SELECT doc_id, string_split(text, ' ') AS p
      |        FROM documents WHERE doc_id % 5 = 0)),
      |m AS (
      |  SELECT doc_id, u.idx AS idx, u.tk AS tk,
      |    substr(md5(doc_id || '-' || u.idx), 1, 1) IN ('0', '1')
      |      AS msk
      |  FROM tk),
      |r AS (
      |  SELECT doc_id, idx, tk, msk,
      |    CASE WHEN msk AND NOT COALESCE(
      |        lag(msk) OVER (PARTITION BY doc_id ORDER BY idx), FALSE)
      |      THEN 1 ELSE 0 END AS run_start
      |  FROM m),
      |g AS (
      |  SELECT doc_id, idx, tk, msk, run_start,
      |    SUM(run_start) OVER (PARTITION BY doc_id ORDER BY idx)
      |      AS run_id
      |  FROM r),
      |pieces AS (
      |  SELECT doc_id, idx, msk, run_id,
      |    CASE WHEN NOT msk THEN tk
      |         WHEN run_start = 1
      |           THEN '<extra_id_' || (run_id - 1) || '>' END
      |      AS in_piece,
      |    CASE WHEN msk AND run_start = 1
      |           THEN '<extra_id_' || (run_id - 1) || '> ' || tk
      |         WHEN msk THEN tk END AS tg_piece
      |  FROM g)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN msk THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_masked,
      |  CAST(MAX(run_id) AS BIGINT) AS n_spans,
      |  string_agg(in_piece, ' ' ORDER BY idx) AS input_text,
      |  COALESCE(string_agg(tg_piece, ' ' ORDER BY idx), '')
      |    AS target_text
      |FROM pieces
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
    val tk = documents(s, d).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("idx", "tk")))
    val m = tk.withColumn("msk",
      substring(md5(concat(col("doc_id").cast("string"), lit("-"),
        col("idx").cast("string")).cast("binary")), 1, 1)
        .isin("0", "1"))
    val r = m.withColumn("run_start",
      (col("msk") &&
        !coalesce(lag(col("msk"), 1).over(w), lit(false))).cast("int"))
    val g = r.withColumn("run_id", sum(col("run_start")).over(w))
    val sentinel =
      concat(lit("<extra_id_"), (col("run_id") - 1).cast("string"),
        lit(">"))
    val pieces = g
      .withColumn("in_piece",
        when(!col("msk"), col("tk"))
          .when(col("run_start") === 1, sentinel))
      .withColumn("tg_piece",
        when(col("msk") && col("run_start") === 1,
          concat(sentinel, lit(" "), col("tk")))
          .when(col("msk"), col("tk")))
    // sort-deterministic string aggregation (the q_agg_string_agg
    // idiom): collect (idx, piece) structs, sort by idx, join —
    // array_join drops the null pieces exactly as string_agg skips
    // NULL inputs in DuckDB
    def agg(piece: String) = array_join(
      transform(
        array_sort(collect_list(struct(col("idx"), col(piece)))),
        x => x.getField(piece)),
      " ")
    pieces.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("msk").cast("int")).as("n_masked"),
        max(col("run_id")).as("n_spans"),
        agg("in_piece").as("input_text"),
        agg("tg_piece").as("target_text"))
      .orderBy(col("doc_id"))
  }

  /** FIM (fill-in-the-middle) pretraining transform (r12; the
    * public Bavarian et al. recipe): split each document at two
    * DETERMINISTIC hash-chosen character cuts into prefix / middle /
    * suffix and emit the PSM rearrangement
    * `<PRE>prefix<SUF>suffix<MID>middle` — the layout that teaches
    * infilling. Cuts come from two md5 draws mod (len+1), ordered by
    * least/greatest, so the split needs no RNG and the oracle
    * reproduces it exactly. Map-side until the output sort (the
    * orderBy exists only for the deterministic gate): the 100 TB
    * shape is a projection. */
  val qFimSplit: QDef = QDef(
    "q_fim_split",
    """WITH c AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    CAST(('0x' || substr(md5(doc_id || '-a'), 1, 6)) AS BIGINT)
      |      % (length(text) + 1) AS u1,
      |    CAST(('0x' || substr(md5(doc_id || '-b'), 1, 6)) AS BIGINT)
      |      % (length(text) + 1) AS u2
      |  FROM documents WHERE doc_id % 3 = 0),
      |k AS (
      |  SELECT doc_id, text, n,
      |    LEAST(u1, u2) AS lo, GREATEST(u1, u2) AS hi FROM c)
      |SELECT doc_id, CAST(lo AS INT) AS cut_a, CAST(hi AS INT) AS cut_b,
      |  CAST(n AS INT) AS n_chars,
      |  '<PRE>' || substr(text, 1, CAST(lo AS INT)) ||
      |  '<SUF>' || substr(text, CAST(hi AS INT) + 1) ||
      |  '<MID>' || substr(text, CAST(lo AS INT) + 1,
      |    CAST(hi - lo AS INT)) AS fim_text
      |FROM k
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    def draw(tag: String) =
      graft.functions.Md5HexSlice(concat(col("doc_id").cast("string"),
        lit(s"-$tag")).cast("binary"), 1, 6)
        .% (length(col("text")) + 1)
    val c = documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"),
        length(col("text")).as("n"),
        draw("a").as("u1"), draw("b").as("u2"))
    val k = c.select(col("doc_id"), col("text"), col("n"),
      least(col("u1"), col("u2")).as("lo"),
      greatest(col("u1"), col("u2")).as("hi"))
    k.select(
      col("doc_id"),
      col("lo").cast("int").as("cut_a"),
      col("hi").cast("int").as("cut_b"),
      col("n").cast("int").as("n_chars"),
      concat(
        lit("<PRE>"),
        substring(col("text"), lit(1), col("lo").cast("int")),
        lit("<SUF>"),
        col("text").substr(col("hi").cast("int") + 1,
          col("n").cast("int")),
        lit("<MID>"),
        col("text").substr(col("lo").cast("int") + 1,
          (col("hi") - col("lo")).cast("int"))).as("fim_text"))
      .orderBy(col("doc_id"))
  }

  val defs: Seq[QDef] = Seq(
    qPackSequences, qTokenTruncate, qCurationFunnel, qChunkOverlap,
    qTemperatureMix, qDedupChunk, qSpanCorrupt, qFimSplit)
}
