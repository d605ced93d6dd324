package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Dataset-splitting and sampling operators for training pipelines
  * (driver mandate, complementing §2.9): a content-hash train/val/test
  * split (reproducible across engines AND across re-runs with changed
  * row order — the property random splits lack) and seeded stratified
  * sampling.
  */
object SamplingQueries {

  /** Deterministic train/val/test assignment from a content hash:
    * bucket = first-16-bits-of-md5(text) mod 100 → 90/5/5. Content
    * hashing (not row numbering) keeps the split stable under
    * repartitioning, re-ingestion, and engine changes — md5 is
    * cross-engine-identical (SURVEY §0 fact 4), so the oracle computes
    * the very same assignment. */
  val qSplitHash: QDef = QDef(
    "q_split_hash",
    """SELECT doc_id,
      |  CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 100 AS INT)
      |    AS bucket,
      |  CASE
      |    WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 100 < 90
      |      THEN 'train'
      |    WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INT) % 100 < 95
      |      THEN 'val'
      |    ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bucket =
      (graft.functions.Md5HexSlice(col("text").cast("binary"), 1, 4)
        .cast("int") % 100).cast("int")
    documents(s, d)
      .select(
        col("doc_id"),
        bucket.as("bucket"),
        when(bucket < 90, "train")
          .when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each doc draws a content-keyed uniform u ∈ (0,1) from its md5
    * (the +1 / 2^32+1 shift keeps u strictly inside the interval),
    * gets key = ln(u)/w for weight w = n_chars, and the k LARGEST keys
    * are the sample — inclusion probability ∝ weight, exactly the
    * length-weighted doc selection a training-mix builder needs, yet
    * fully deterministic and re-runnable (no rand()). Top-k by key is
    * a TakeOrdered, never a global sort. */
  val qSampleWeighted: QDef = QDef(
    "q_sample_weighted",
    """WITH k AS (
      |  SELECT doc_id, n_chars,
      |    ROUND(LN((CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
      |        + 1.0) / 4294967297.0) / n_chars, 8) + 0.0 AS key
      |  FROM documents WHERE n_chars > 0)
      |SELECT doc_id, n_chars, key
      |FROM k
      |ORDER BY key DESC, doc_id
      |LIMIT 50""".stripMargin) { (s, d) =>
    val u = (graft.functions.Md5HexSlice(col("text").cast("binary"),
      1, 8) + lit(1.0)) / lit(4294967297.0)
    documents(s, d)
      .filter(col("n_chars") > 0)
      // round BEFORE the top-k sort: the unrounded keys are tie-free
      // but the 8dp output is not (long docs land on -0.00000000), so
      // sorting the unrounded key lets the two engines break rounded
      // ties differently at the LIMIT boundary — first seen at sf0.1.
      // `+ 0.0` folds IEEE -0.0 to +0.0 in the rendered output.
      .select(col("doc_id"), col("n_chars"),
        (round(log(u) / col("n_chars"), 8) + lit(0.0)).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(50)
  }

  private val stratFractions = Seq(
    "en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.25, "zh" -> 0.1)

  /** Per-stratum sampling on lang, KEY-DETERMINISTIC: a row is kept
    * iff the 60-bit md5 prefix of its doc_id falls under the
    * stratum's integer threshold ⌊frac·2^60⌋. This is the shape a
    * 100 TB pipeline actually wants — membership is a pure function
    * of the key, so the sample reproduces across reruns, engines,
    * partitionings, and incremental batches (a re-ingested doc lands
    * on the same side), where `sampleBy`'s seeded Bernoulli depends
    * on engine RNG state and row order. ORACLE-GATED since round 11
    * (r10 verdict #6): thresholds are integer literals on both
    * sides — no float boundary can disagree. `sampleBy` itself stays
    * spec-covered (SamplingSpec pins its seeded reproducibility). */
  val qSampleStratified: QDef = QDef(
    "q_sample_stratified", {
      val fRows = stratFractions.map { case (l, f) =>
        s"('$l', ${(f * (1L << 60)).toLong})"
      }.mkString(", ")
      s"""WITH f(lang, thr) AS (VALUES $fRows)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN f ON d.lang = f.lang
         |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
         |    1, 15)) AS BIGINT) < f.thr
         |ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
    val thr = stratFractions.foldLeft(lit(-1L)) { case (acc, (l, f)) =>
      when(col("lang") === l, lit((f * (1L << 60)).toLong)).otherwise(acc)
    }
    val h = graft.functions.Md5HexSlice(
      col("doc_id").cast("string").cast("binary"), 1, 15)
    documents(s, d)
      .select(col("doc_id"), col("lang"))
      .filter(h < thr)
      .orderBy(col("doc_id"))
  }

  /** The seeded-Bernoulli API surface (`df.stat.sampleBy`), kept as a
    * library entry for callers who want uniform-random rather than
    * key-deterministic strata; SamplingSpec pins fixed-seed
    * reproducibility and proportions. */
  def sampleByLang(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .stat.sampleBy("lang", stratFractions.toMap, seed = 42L)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val defs: Seq[QDef] = Seq(qSplitHash, qSampleWeighted, qSampleStratified)
}
