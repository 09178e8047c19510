package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("salted join returns exactly the rows of the plain join") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        col("o_totalprice"))
    val customer = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))

    val plain = orders.join(customer, Seq("c_custkey"), "inner")
    val salted = SkewJoin.saltedInnerJoin(orders, customer, "c_custkey", 8)

    assert(salted.count() == plain.count())
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    val diff = salted.select(plain.columns.map(col): _*)
      .exceptAll(plain).count()
    assert(diff == 0)
  }

  test("salt values spread a hot key across buckets") {
    import spark.implicits._
    // one dominant key, rows distinguished by v (the realistic shape:
    // hot customer, unique order ids)
    val hot = (1 to 1000).map(i => ("HOT", i)).toDF("k", "v")
    val dim = Seq(("HOT", "dim")).toDF("k", "d")
    val joined = SkewJoin.saltedInnerJoin(hot, dim, "k", 8)
    assert(joined.count() == 1000)
    // verify spread: recompute the salt the helper assigns
    val spread = hot
      .withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread/8 salt buckets")
  }
}
