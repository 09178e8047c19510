package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Cols.dec`'s range guard at the exact DECIMAL(12,2) edge: the
  * keep-set must coincide with the representable set — the largest
  * double whose HALF_UP 2-dp rounding fits must cast (not NULL), the
  * next double up must NULL (not throw), and the whole non-finite +
  * finite-overflow class must NULL. One wrong ulp on either side is
  * either a reintroduced ANSI crash or an engine/oracle fork at the
  * decimal ceiling.
  */
class ColsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def decOf(xs: Seq[Double]): Seq[Option[BigDecimal]] =
    xs.toDF("x").select(Cols.dec(col("x")).as("d"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(BigDecimal(r.getDecimal(0))))
      .toSeq

  test("keep-set matches DECIMAL(12,2) exactly at the rounding edge") {
    val edge = 9999999999.995 // literal converts ABOVE the real edge
    val lastIn = Math.nextAfter(edge, 0.0)     // rounds to 9999999999.99
    val out = decOf(Seq(lastIn, edge, -lastIn, -edge))
    assert(out(0).contains(BigDecimal("9999999999.99")), s"lastIn -> ${out(0)}")
    assert(out(1).isEmpty, "the first overflowing double must NULL, not throw")
    assert(out(2).contains(BigDecimal("-9999999999.99")))
    assert(out(3).isEmpty)
  }

  test("non-finite and finite-overflow doubles all route to NULL") {
    val out = decOf(Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e300, -1e300, 1e10, -1e10))
    assert(out.forall(_.isEmpty), s"expected all NULL, got $out")
  }

  test("ordinary money values are exact 2-dp decimals") {
    val out = decOf(Seq(0.0, -0.0, 123.455, 4.9e-324))
    assert(out(0).contains(BigDecimal("0.00")))
    assert(out(1).contains(BigDecimal("0.00")))
    assert(out(2).contains(BigDecimal("123.46")) ||
      out(2).contains(BigDecimal("123.45"))) // depends on the double below/above
    assert(out(3).contains(BigDecimal("0.00"))) // subnormal underflows to 0
  }
}
