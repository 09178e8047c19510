package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{MinHashSig, PolyHash}

/** SparkSessionExtensions registration: exposes the engine's custom
  * Catalyst expressions to SQL (`SELECT poly_hash(text) ...`,
  * `SELECT minhash_sig(shingles, 64) ...`) so a SQL-only consumer of the
  * engine gets the same operators the DataFrame API exposes. Wire with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (done in
  * [[Sessions.local]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      exprs => PolyHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => {
        val k = exprs(1).eval(null).asInstanceOf[Int]
        MinHashSig(exprs.head, k)
      }))
  }
}
