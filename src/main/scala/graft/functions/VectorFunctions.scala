package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over ArrayType(FloatType) columns, built from
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so the
  * arithmetic is codegen'd, order-deterministic (sequential left fold),
  * and identical to a single-threaded reference implementation — no UDF,
  * no linear-algebra dependency.
  *
  * Floats are widened to double before multiplication: exact, and keeps
  * accumulation error at double precision.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def normL2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (normL2(a) * normL2(b))

  /** LSH bucket id from signed random hyperplanes: the sign-bit pattern
    * of `nPlanes` deterministic pseudo-random projections, packed into a
    * long. Planes are derived from xxhash64(seed, dimension index) so the
    * "random" matrix needs no driver-side state and is identical on every
    * executor. Cosine-similar vectors land in the same bucket with high
    * probability → near-dup candidate generation without the O(n²) cross
    * join.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int): Column = {
    val projections = (0 until nPlanes).map { p =>
      // plane p, dim i weight: map xxhash64 to [-0.5, 0.5)
      val weighted = zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) =>
          x.cast("double") *
            ((pmod(xxhash64(lit(seed), lit(p), i), lit(1000000L)).cast("double") /
              1000000.0) - 0.5))
      val proj = aggregate(weighted, lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    projections.reduce(_ + _)
  }
}
