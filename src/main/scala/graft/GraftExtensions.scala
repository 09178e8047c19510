package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, HyperplaneBucket, LangIdExpr, MinHashSig, PolyHash, PolyHashLongs, Shingles, SimHash61, TextFunctions, TextStats}

/** SparkSessionExtensions registration: exposes the engine's custom
  * Catalyst expressions to SQL (`SELECT poly_hash(text) ...`,
  * `SELECT minhash_sig(shingles, 64) ...`, `SELECT cosine_sim(a, b)`,
  * ...) so a SQL-only consumer of the engine gets the same operators
  * the DataFrame API exposes. Wire with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (done in
  * [[Sessions.local]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"literal int argument expected, got $other")
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      exprs => PolyHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => MinHashSig(exprs.head, intArg(exprs(1)))))
    e.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      exprs => Shingles(exprs.head, intArg(exprs(1)))))
    e.injectFunction((
      new FunctionIdentifier("simhash61"),
      new ExpressionInfo(classOf[SimHash61].getName, "simhash61"),
      exprs => SimHash61(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("poly_hash_longs"),
      new ExpressionInfo(classOf[PolyHashLongs].getName, "poly_hash_longs"),
      exprs => PolyHashLongs(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      exprs => CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      exprs => HyperplaneBucket(exprs.head, intArg(exprs(1)), intArg(exprs(2)))))
    e.injectFunction((
      new FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      exprs => TextStats(exprs.head, TextFunctions.EnStopwords)))
    e.injectFunction((
      new FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
      exprs => LangIdExpr(exprs.head, TextFunctions.LangMarkers)))
    e.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      exprs => graft.functions.NfcNormalize(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[graft.functions.StripAccents].getName, "strip_accents"),
      exprs => graft.functions.StripAccents(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("affine61"),
      new ExpressionInfo(classOf[graft.functions.Affine61].getName, "affine61"),
      exprs => graft.functions.Affine61(exprs.head,
        longArg(exprs(1)), longArg(exprs(2)))))
    e.injectFunction((
      new FunctionIdentifier("math_ln"),
      new ExpressionInfo(classOf[graft.functions.MathLn].getName, "math_ln"),
      exprs => graft.functions.MathLn(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash_features"),
      new ExpressionInfo(classOf[graft.functions.SimHashFeatures].getName,
        "simhash_features"),
      exprs => graft.functions.SimHashFeatures(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("poly_hash61"),
      new ExpressionInfo(classOf[graft.functions.PolyHash61Str].getName,
        "poly_hash61"),
      exprs => graft.functions.PolyHash61Str(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("byte_entropy"),
      new ExpressionInfo(classOf[graft.functions.ByteEntropy].getName,
        "byte_entropy"),
      exprs => graft.functions.ByteEntropy(exprs.head)))
  }

  private def longArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"literal long argument expected, got $other")
    }
}
