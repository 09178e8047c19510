package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import graft.functions.PolyHash.polyHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language ID, quality scoring, token
  * counting, fingerprinting, exact dedup). Row-level outputs avoid
  * double-sum aggregation so every value is order-independent and
  * oracle-checkable.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val stopList =
    EnStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** q72's multilingual decoration: composed + DECOMPOSED accents (the
    * trailing "été" is e+U+0301 twice), a compatibility ligature (ﬁ,
    * untouched by NFC/NFD), Turkish İ, stroked Ł (no decomposition),
    * Greek, Hangul (NFD → Jamo → must RECOMPOSE), and multi-mark stacks
    * (ậ Ḉ ǻ ử ᾷ). Every char's strip_accents/nfc_normalize parity
    * between java.text.Normalizer and DuckDB utf8proc was probed before
    * inclusion.
    */
  private val UnicodeDecor =
    " — naïve café ﬁn İstanbul Łukasz ñü " +
      "ώρα 한국 ậḈǻửᾷ " +
      "ÅÆΩ e\u0301te\u0301"

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // q28: token counting + quality metrics, row-level. Token/stopword
    // counts come from the fused single-pass TextStats expression (the
    // declarative HOF forms re-tokenize per column and filter
    // interpreted); ratio/score arithmetic is identical.
    Q("q28_text_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            textStats(col("text")).as("st"))
          .select(
            col("doc_id"),
            charCount(col("text")).as("n_chars"),
            col("st.n_tokens").as("n_tokens"),
            (length(regexp_replace(trim(col("text")), "\\s+", ""))
              .cast("double") / col("st.n_tokens")).as("avg_token_len"),
            punctRatio(col("text")).as("punct_ratio"),
            stopwordRatioOf(col("st")).as("stopword_ratio"),
            qualityScoreFused(col("text"), col("st")).as("quality"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
        CAST(length(text) AS INTEGER) AS n_chars,
        CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) AS n_tokens,
        CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
          / len(string_split_regex(lower(trim(text)), '\\s+')) AS avg_token_len,
        CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / length(text) AS punct_ratio,
        CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> list_contains($stopList, x))) AS DOUBLE)
          / len(string_split_regex(lower(trim(text)), '\\s+')) AS stopword_ratio,
        least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
          + least(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                       x -> list_contains($stopList, x))) AS DOUBLE)
                  / len(string_split_regex(lower(trim(text)), '\\s+')) * 4.0, 1.0) * 0.4
          + (1.0 - least(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                         / length(text) * 10.0, 1.0)) * 0.2 AS quality
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q29: per-language corpus stats (counts + exact int sums only —
    // no order-dependent double aggregation).
    Q("q29_lang_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .withColumn("avg_chars",
            col("total_chars").cast("double") / col("n_docs"))
          .orderBy(col("lang")),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(min(n_chars) AS BIGINT) AS min_chars,
        CAST(max(n_chars) AS BIGINT) AS max_chars,
        CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    // ------------------------------------------------------------------
    // q30: quality-gate pass rates per source (threshold counts, not
    // double sums → deterministic under any partitioning).
    Q("q30_quality_gate",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("source"),
            qualityScoreFused(col("text"), textStats(col("text"))).as("q"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("q") >= 0.7, lit(1))).as("n_pass"))
          .withColumn("pass_rate",
            col("n_pass").cast("double") / col("n_docs"))
          .orderBy(col("source")),
      Some(s"""WITH scored AS (
          SELECT source,
            least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
              + least(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                           x -> list_contains($stopList, x))) AS DOUBLE)
                      / len(string_split_regex(lower(trim(text)), '\\s+')) * 4.0, 1.0) * 0.4
              + (1.0 - least(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                             / length(text) * 10.0, 1.0)) * 0.2 AS q
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(CASE WHEN q >= 0.7 THEN 1 END) AS BIGINT) AS n_pass,
               CAST(count(CASE WHEN q >= 0.7 THEN 1 END) AS DOUBLE) / count(*) AS pass_rate
        FROM scored GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q31: language-ID heuristic (marker-word hits, argmax with fixed
    // tie order) vs the labeled lang column.
    Q("q31_lang_id",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            langIdFused(col("text")).as("predicted"))
          .withColumn("hit", (col("predicted") === col("lang")).cast("int"))
          .orderBy(col("doc_id")),
      {
        val hitExprs = LangMarkers.map { case (lang, markers) =>
          val lst = markers.map(w => s"'$w'").mkString("[", ", ", "]")
          lang -> s"len(list_filter(toks, x -> list_contains($lst, x)))"
        }
        val best = hitExprs.map(_._2).mkString("greatest(", ", ", ")")
        val caseChain = hitExprs
          .map { case (lang, e) => s"WHEN $e > 0 AND $e = $best THEN '$lang'" }
          .mkString(" ")
        Some(s"""WITH tok AS (
            SELECT doc_id, lang,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents)
          SELECT doc_id, lang,
                 CASE $caseChain ELSE 'und' END AS predicted,
                 CAST(CASE $caseChain ELSE 'und' END = lang AS INTEGER) AS hit
          FROM tok ORDER BY doc_id""")
      }),

    // ------------------------------------------------------------------
    // q32: PolyHash rolling-hash fingerprints (custom codegen'd Catalyst
    // expression). The oracle replays the byte-level fold in DuckDB
    // HUGEINT arithmetic — mod-2^64 per step, two's-complement at the
    // end — so the exact JVM-overflow hash values are gate-checked
    // (testdata text is ASCII, so ord(char) = UTF-8 byte).
    Q("q32_fingerprints",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), polyHash(col("text")).as("fingerprint"),
            polyHash(lower(trim(col("text")))).as("normalized_fingerprint"))
          .orderBy(col("doc_id")),
      Some(s"""WITH n AS (SELECT doc_id, text, lower(trim(text)) AS ntext FROM documents)
        SELECT doc_id,
               ${graft.functions.MulMod61.sqlPh64Signed("text")} AS fingerprint,
               ${graft.functions.MulMod61.sqlPh64Signed("ntext")} AS normalized_fingerprint
        FROM n ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q33: exact dedup via content-hash groupBy (md5), keeping the
    // minimum doc_id per group — the hash-groupBy scales to 100 TB
    // (one shuffle on the digest, no pairwise comparison).
    Q("q33_exact_dedup",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text").cast("binary")).as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash,
        CAST(min(doc_id) AS BIGINT) AS keep_id,
        CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY content_hash""")),

    // ------------------------------------------------------------------
    // q72: Unicode normalization — NFC canonical composition and accent
    // stripping (NFD − Mn marks, NFC recomposed), the corpus-cleaning
    // passes that make visually-identical strings byte-identical before
    // dedup/shingling. The testdata text is ASCII (where both passes are
    // identity and the fused expressions take the zero-copy fast path),
    // so each row is decorated with a fixed multilingual suffix — incl.
    // a DECOMPOSED e+U+0301 and Hangul — to force real normalization
    // work through the gate: DuckDB's nfc_normalize/strip_accents must
    // reproduce java.text.Normalizer byte-for-byte. Row-local, no
    // shuffle: scales as a pure map stage.
    Q("q72_unicode_norm",
      (s, dir) => {
        import graft.functions.UnicodeNorm._
        val decorated = concat(col("text"), lit(UnicodeDecor))
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            nfcNormalize(decorated).as("nfc_text"),
            stripAccentsCol(decorated).as("plain_text"),
            (length(decorated) - length(nfcNormalize(decorated)))
              .cast("int").as("n_composed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id, text || '$UnicodeDecor' AS t FROM documents)
        SELECT doc_id,
               nfc_normalize(t) AS nfc_text,
               strip_accents(t) AS plain_text,
               CAST(length(t) - length(nfc_normalize(t)) AS INTEGER) AS n_composed
        FROM d ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q47: token counting two ways — whitespace and a BPE-ish regex
    // (word / number / punctuation runs with optional leading space,
    // the GPT-2 pre-tokenizer shape, ASCII-simplified so Java regex and
    // RE2 agree). Cost estimation for training pipelines.
    Q("q47_token_regex",
      (s, dir) => {
        val bpe = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_ws_tokens"),
            regexp_count(col("text"), lit(bpe)).cast("int")
              .as("n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS INTEGER) AS n_bpe_tokens
        FROM documents ORDER BY doc_id"""))
  )
}
