package graft.operators

import graft.{Cols, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dataset splitting and stratified sampling for training pipelines.
  *
  * `byHash` is the scale-correct split: a hash of the stable row id, so
  * membership is a pure function of the row — independent of partition
  * layout, cluster size, or read order (unlike `df.sample`, whose seed
  * is only stable for a fixed partitioning). Adding data never moves an
  * existing row between splits.
  */
object DataSplit {
  import Cols._

  /** Split assignment from buckets of a row-id hash:
    * [0,train) → "train", [train,train+val) → "val", rest → "test",
    * out of 100 buckets.
    */
  def byHash(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = pmod(xxhash64(id), lit(100L))
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Corpus-mix keep decision: keep a row iff its scrambled id falls
    * under the per-row sampling threshold `ppm` (parts-per-million).
    * Rates ride as INTEGER ppm, not double fractions, so the threshold
    * compare is exact in every engine (no float rounding at the cast).
    * Monotone in ppm: raising a source's quota only adds documents.
    */
  def mixKeep(id: Column, ppm: Column): Column = {
    import graft.functions.Affine61._
    affine61(id, mixA, mixB) % 1000000L < ppm
  }

  /** Down-sample a corpus to target per-source proportions: `rates` maps
    * source → ppm quota; unlisted sources are dropped. The rates side is
    * a broadcast dim — one map-side hash join + filter, no shuffle of
    * the corpus itself. This is the "data mixing" step of training-set
    * assembly (e.g. 100% wiki, 35% web crawl) made deterministic and
    * incremental: re-running on a grown corpus keeps every previously
    * kept row.
    */
  def mixSample(docs: DataFrame, rates: Map[String, Long],
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val dim = rates.toSeq.toDF(sourceCol, "ppm")
    docs.join(broadcast(dim), sourceCol)
      .filter(mixKeep(col(idCol), col("ppm")))
      .drop("ppm")
  }

  /** The q73 quota table: sources srcN get ppm quotas cycling through
    * 150k/350k/550k/750k by N mod 4 — unequal on purpose, so the gate
    * checks rows move per-source, not just globally.
    */
  def q73Rates: Map[String, Long] =
    (0 until 20).map(i => s"src$i" -> (150000L + 200000L * (i % 4))).toMap

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // q45: deterministic train/val/test split. The oracle-portable form
    // uses modulo buckets; the library's production form (byHash, same
    // dataflow) is covered by DataSplitSpec's stability properties.
    Q("q45_dataset_split",
      (s, dir) => {
        val split = when(col("doc_id") % 10 < 8, "train")
          .when(col("doc_id") % 10 === 8, "val")
          .otherwise("test")
        t(s, dir, "documents")
          .select(split.as("split"), col("n_chars"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("split"))
      },
      Some("""SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
                     WHEN doc_id % 10 = 8 THEN 'val'
                     ELSE 'test' END AS split,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY split ORDER BY split""")),

    // ------------------------------------------------------------------
    // q73: corpus mixing — down-sample each source to its target quota
    // (the training-mix step: so-many-parts web, so-many-parts wiki).
    // Keep decision = affine61(doc_id) % 1e6 < ppm, a pure function of
    // the row, so the oracle recomputes the exact kept SET (checked via
    // per-source counts + the sum of kept ids), not just sizes. Plan
    // shape: broadcast the 20-row quota dim, one map-side join+filter —
    // the 100 TB corpus is never shuffled.
    Q("q73_corpus_mix",
      (s, dir) => {
        import s.implicits._
        import graft.functions.Affine61._
        val dim = q73Rates.toSeq.sorted.toDF("source", "ppm")
        val kept = mixKeep(col("doc_id"), col("ppm"))
        t(s, dir, "documents")
          .join(broadcast(dim), "source")
          .groupBy(col("source"), col("ppm"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(kept, lit(1))).as("n_kept"),
            coalesce(graft.functions.IdSum.idSum(when(kept, col("doc_id"))),
              lit(0L)).as("sum_kept_ids"))
          .select(
            col("source"),
            (col("ppm").cast("double") / 1000000.0).as("target_rate"),
            col("n_docs"), col("n_kept"),
            (col("n_kept").cast("double") / col("n_docs")).as("achieved_rate"),
            col("sum_kept_ids"))
          .orderBy(col("source"))
      },
      {
        import graft.functions.Affine61.{mixA, mixB}
        import graft.functions.MulMod61.P
        val values = q73Rates.toSeq.sorted
          .map { case (src, ppm) => s"('$src', $ppm)" }.mkString(", ")
        Some(s"""WITH rates(source, ppm) AS (VALUES $values),
          flagged AS (
            SELECT d.source, r.ppm, d.doc_id,
                   ((($mixA::HUGEINT * d.doc_id + $mixB) % $P) % 1000000 < r.ppm) AS kept
            FROM documents d JOIN rates r ON d.source = r.source)
          SELECT source,
                 CAST(ppm AS DOUBLE) / 1000000.0 AS target_rate,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
                 CAST(count(CASE WHEN kept THEN 1 END) AS DOUBLE) / count(*) AS achieved_rate,
                 coalesce(${graft.functions.IdSum.sql("CASE WHEN kept THEN doc_id END")}, 0) AS sum_kept_ids
          FROM flagged GROUP BY source, ppm ORDER BY source""")
      }),

    // ------------------------------------------------------------------
    // q46: stratified per-class sampling — k deterministic rows per
    // label via a keyed window (parallel per class, no global sort);
    // the class-balancing primitive for training-set construction.
    Q("q46_stratified_sample",
      (s, dir) => {
        // md5-hex of the id as the pseudo-random sort key: identical in
        // any engine, so the oracle picks the same rows
        val hashOrder = md5(col("vec_id").cast("string").cast("binary"))
        val w = Window.partitionBy(col("label"))
          .orderBy(col("h"), col("vec_id"))
        t(s, dir, "embeddings")
          .select(col("label"), col("vec_id"), hashOrder.as("h"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .drop("h")
          .orderBy(col("label"), col("rn"))
      },
      Some("""SELECT label, vec_id,
               CAST(row_number() OVER (PARTITION BY label
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rn
        FROM embeddings
        QUALIFY rn <= 5 ORDER BY label, rn""")),

    // ------------------------------------------------------------------
    // q84: TEMPERATURE-SCALED corpus mixing (α = 0.5) — q73 with the
    // quotas DERIVED instead of given: each source's per-doc keep rate
    // is K/√(source token mass), so the expected kept token mass is
    // K·√T_s ∝ T_s^α — the multilingual/multi-source rebalancing rule
    // (upsample the tail, downsample the head) used for training-mix
    // construction. Everything stays engine-exact: token counts and
    // masses are integers, the rate is ONE floor(mul/div/sqrt) chain in
    // IEEE doubles (correctly rounded in both engines), and the keep
    // decision is the same affine61-threshold pure function of doc_id
    // as q73/mixSample — deterministic, partition-independent, monotone.
    // Plan shape: per-source mass is a 20-group map-side-combinable agg;
    // the dim broadcasts back; the corpus itself is never shuffled.
    Q("q84_temperature_mix",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(lower(trim(col("text"))), "\\s+")).cast("long")
              .as("n_tokens"))
        val dim = docs.groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("total_tokens"))
          .withColumn("ppm",
            floor(lit(1000000.0) * lit(8.0) /
              sqrt(col("total_tokens").cast("double"))).cast("long"))
        val kept = mixKeep(col("doc_id"), col("ppm"))
        docs.join(broadcast(dim), "source")
          .groupBy(col("source"), col("total_tokens"), col("ppm"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(kept, lit(1))).as("n_kept"),
            coalesce(sum(when(kept, col("n_tokens"))), lit(0L))
              .as("kept_tokens"),
            coalesce(graft.functions.IdSum.idSum(when(kept, col("doc_id"))),
              lit(0L)).as("sum_kept_ids"))
          .select(col("source"), col("total_tokens"),
            (col("ppm").cast("double") / 1000000.0).as("sample_rate"),
            col("n_docs"), col("n_kept"), col("kept_tokens"),
            col("sum_kept_ids"))
          .orderBy(col("source"))
      },
      {
        import graft.functions.Affine61.{mixA, mixB}
        import graft.functions.MulMod61.P
        Some(s"""WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
            FROM documents),
          mass AS (
            SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM toks GROUP BY source),
          dim AS (
            SELECT source, total_tokens,
                   CAST(floor(1000000.0 * 8.0 / sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS ppm
            FROM mass),
          flagged AS (
            SELECT t.source, d.total_tokens, d.ppm, t.doc_id, t.n_tokens,
                   ((($mixA::HUGEINT * t.doc_id + $mixB) % $P) % 1000000 < d.ppm) AS kept
            FROM toks t JOIN dim d ON t.source = d.source)
          SELECT source, total_tokens,
                 CAST(ppm AS DOUBLE) / 1000000.0 AS sample_rate,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
                 CAST(coalesce(sum(CASE WHEN kept THEN n_tokens END), 0) AS BIGINT) AS kept_tokens,
                 coalesce(${graft.functions.IdSum.sql("CASE WHEN kept THEN doc_id END")}, 0) AS sum_kept_ids
          FROM flagged GROUP BY source, total_tokens, ppm
          ORDER BY source""")
      }),

    // ------------------------------------------------------------------
    // q118: QUALITY-WEIGHTED REJECTION SAMPLING — accept each doc with
    // probability equal to its q28/q30 quality score (soft filtering:
    // high-quality docs survive at ~their score, junk is mostly dropped
    // but never deterministically censored — the curation step between
    // a hard quality gate and keeping everything). The accept decision
    // is affine61(doc_id) % 1e6 < floor(quality·1e6): a pure function
    // of the row (partitioning/cluster/read-order independent), on its
    // OWN hash constants so acceptance never correlates with q73/q84's
    // quota sampling. The oracle recomputes the exact accepted SET
    // (counts + id-sum + quality-mass in integer micro-units); the
    // corpus is never shuffled — one row-local pass + a source agg.
    Q("q118_quality_sample",
      (s, dir) => {
        import graft.functions.Affine61.{affine61, qualA, qualB}
        import graft.functions.TextFunctions.{qualityScoreFused, textStats}
        val qmu = floor(col("quality") * 1000000.0).cast("long")
        val kept = affine61(col("doc_id"), qualA, qualB) % 1000000L <
          col("qmu")
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            qualityScoreFused(col("text"), textStats(col("text")))
              .as("quality"))
          .withColumn("qmu", qmu)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(kept, lit(1))).as("n_kept"),
            coalesce(graft.functions.IdSum.idSum(when(kept, col("doc_id"))),
              lit(0L)).as("sum_kept_ids"),
            coalesce(sum(when(kept, col("qmu"))), lit(0L))
              .as("kept_quality_mu"),
            sum(col("qmu")).as("total_quality_mu"))
          .withColumn("achieved_rate",
            col("n_kept").cast("double") / col("n_docs"))
          .orderBy(col("source"))
      },
      {
        import graft.functions.Affine61.{qualA, qualB}
        import graft.functions.MulMod61.P
        Some(s"""WITH scored AS (
            SELECT doc_id, source,
                   CAST(floor((${TextQueries.qualitySqlExpr}) * 1000000.0) AS BIGINT) AS qmu
            FROM documents),
          flagged AS (
            SELECT source, doc_id, qmu,
                   ((($qualA::HUGEINT * doc_id + $qualB) % $P) % 1000000 < qmu) AS kept
            FROM scored)
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_kept,
                 coalesce(${graft.functions.IdSum.sql("CASE WHEN kept THEN doc_id END")}, 0) AS sum_kept_ids,
                 CAST(coalesce(sum(CASE WHEN kept THEN qmu END), 0) AS BIGINT) AS kept_quality_mu,
                 CAST(sum(qmu) AS BIGINT) AS total_quality_mu,
                 CAST(count(CASE WHEN kept THEN 1 END) AS DOUBLE) / count(*) AS achieved_rate
          FROM flagged GROUP BY source ORDER BY source""")
      },
      doc = "Per-doc rejection sampling at rate = quality score (soft curation filter)."),

    // ------------------------------------------------------------------
    // q124: WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis
    // A-ES, IPL 2006) — draw a FIXED-SIZE sample of k=100 docs with
    // inclusion probability proportional to quality weight, the
    // exact-size counterpart to q118's Bernoulli accept (which only
    // controls the EXPECTED kept count). A-ES: key_i = u_i^(1/w_i),
    // keep the k largest — equivalently ln(u_i)/w_i in log space, which
    // avoids pow() and keeps the transcendental surface to ONE ln per
    // row. u_i comes from affine61(doc_id) on the family's own
    // constants (pure function of the row — partitioning/cluster/read-
    // order independent, like every sampler here); w_i is the q28/q30
    // quality score in integer micro-units, floored at 1 µ so zero-
    // quality rows stay sampleable rather than dividing by zero.
    // The key is QUANTIZED to integer micro-units (the q89/q90 rule:
    // floor(x·1e4)·100) with doc_id as the total tie-break, so the
    // selected SET is identical across engines despite 1-ulp libm ln
    // drift. Dataflow: one row-local scoring pass, then a distributed
    // top-k (TakeOrderedAndProject: per-partition heaps, never a global
    // sort) and a rank window over the k survivors — O(k) rows. At
    // 100 TB the corpus is read once and only 100 rows ever leave the
    // executors.
    Q("q124_weighted_sample",
      (s, dir) => {
        import graft.functions.Affine61.{affine61, wsA, wsB}
        import graft.functions.TextFunctions.{qualityScoreFused, textStats}
        import graft.functions.{MathLn, MulMod61}
        val keyed = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            greatest(
              floor(qualityScoreFused(col("text"), textStats(col("text")))
                * 1000000.0).cast("long"),
              lit(1L)).as("wmu"))
          .withColumn("key_unat",
            floor(MathLn.ln(
              (affine61(col("doc_id"), wsA, wsB) + lit(1L)).cast("double")
                / lit(MulMod61.P.toDouble))
              / (col("wmu").cast("double") / 1000000.0) * 1e4) * 100)
        keyed.orderBy(col("key_unat").desc, col("doc_id")).limit(100)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("key_unat").desc, col("doc_id"))).cast("long"))
          .select(col("rk"), col("doc_id"), col("source"), col("wmu"),
            col("key_unat"))
      },
      {
        import graft.functions.Affine61.{wsA, wsB}
        import graft.functions.MulMod61.P
        Some(s"""WITH scored AS (
            SELECT doc_id, source,
                   greatest(CAST(floor((${TextQueries.qualitySqlExpr}) * 1000000.0) AS BIGINT), 1) AS wmu
            FROM documents),
          keyed AS (
            SELECT doc_id, source, wmu,
                   CAST(floor(
                     ln(CAST((($wsA::HUGEINT * doc_id + $wsB) % $P) + 1 AS DOUBLE)
                        / CAST($P AS DOUBLE))
                     / (CAST(wmu AS DOUBLE) / 1000000.0) * 1e4) AS BIGINT) * 100
                     AS key_unat
            FROM scored)
          SELECT CAST(row_number() OVER (ORDER BY key_unat DESC, doc_id)
                   AS BIGINT) AS rk,
                 doc_id, source, wmu, key_unat
          FROM keyed QUALIFY rk <= 100 ORDER BY rk""")
      },
      doc = "Efraimidis–Spirakis weighted top-k sample (exact-size, quality-proportional).")
  )
}
