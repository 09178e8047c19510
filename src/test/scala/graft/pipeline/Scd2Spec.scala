package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asOf1 = lit(java.sql.Date.valueOf("2025-01-01"))
  private val asOf2 = lit(java.sql.Date.valueOf("2025-02-01"))

  private def batch(rows: (String, String, String)*) =
    rows.toDF("customer_id", "city", "segment")

  test("initial load marks everything current") {
    val dim = Scd2.initial(batch(("C1", "Dhaka", "Premium")), asOf1)
    val r = dim.collect().head
    assert(r.getAs[Boolean]("is_current"))
    assert(r.getAs[java.sql.Date]("effective_date").toString == "2025-01-01")
    // reference sentinel, warehouse_dag.py:69
    assert(r.getAs[java.sql.Date]("expiry_date").toString == "9999-12-31")
  }

  test("merge with an empty tracked list is rejected") {
    val dim = Scd2.initial(batch(("C1", "Dhaka", "Premium")), asOf1)
    assertThrows[IllegalArgumentException] {
      Scd2.merge(dim, batch(("C1", "Dhaka", "Premium")),
        "customer_id", Seq.empty, asOf2)
    }
  }

  test("changed row closes old version and opens a new one") {
    val dim = Scd2.initial(
      batch(("C1", "Dhaka", "Premium"), ("C2", "Sylhet", "Budget")), asOf1)
    val next = Scd2.merge(dim,
      batch(("C1", "Khulna", "Premium"), ("C2", "Sylhet", "Budget")),
      "customer_id", Seq("city", "segment"), asOf2)

    assert(next.count() == 3) // C1 closed + C1 new + C2 untouched
    val c1 = next.filter($"customer_id" === "C1")
      .orderBy($"effective_date").collect()
    assert(c1.length == 2)
    assert(!c1(0).getAs[Boolean]("is_current"))
    assert(c1(0).getAs[java.sql.Date]("expiry_date").toString == "2025-01-31")
    assert(c1(1).getAs[Boolean]("is_current"))
    assert(c1(1).getAs[String]("city") == "Khulna")
    // exactly one current row per key
    val dupCurrent = next.filter($"is_current")
      .groupBy($"customer_id").count().filter($"count" > 1).count()
    assert(dupCurrent == 0)
  }

  test("brand-new key is inserted as current") {
    val dim = Scd2.initial(batch(("C1", "Dhaka", "Premium")), asOf1)
    val next = Scd2.merge(dim, batch(("C1", "Dhaka", "Premium"),
      ("C9", "Sylhet", "Budget")), "customer_id", Seq("city", "segment"), asOf2)
    assert(next.count() == 2)
    val c9 = next.filter($"customer_id" === "C9").collect().head
    assert(c9.getAs[Boolean]("is_current"))
    assert(c9.getAs[java.sql.Date]("effective_date").toString == "2025-02-01")
  }

  test("identical batch is a no-op (idempotence)") {
    val dim = Scd2.initial(
      batch(("C1", "Dhaka", "Premium"), ("C2", "Sylhet", "Budget")), asOf1)
    val next = Scd2.merge(dim,
      batch(("C1", "Dhaka", "Premium"), ("C2", "Sylhet", "Budget")),
      "customer_id", Seq("city", "segment"), asOf2)
    assert(next.count() == 2)
    assert(next.filter(!$"is_current").count() == 0)
  }

  test("NULL on either side of a tracked column is NOT a change (3VL, gotcha 5)") {
    val dim = Scd2.initial(batch(("C1", null, "Premium")), asOf1)
    // staged city NULL vs dim NULL → NULL != NULL is NULL → unchanged;
    // and staged 'Dhaka' vs dim NULL → also NULL (Postgres !=) → unchanged
    val next1 = Scd2.merge(dim, batch(("C1", null, "Premium")),
      "customer_id", Seq("city", "segment"), asOf2)
    assert(next1.count() == 1)
    val next2 = Scd2.merge(dim, batch(("C1", "Dhaka", "Premium")),
      "customer_id", Seq("city", "segment"), asOf2)
    assert(next2.count() == 1) // reference semantics: no new version
  }

  test("surrogate keys are dense, unique, deterministic") {
    val dim = Scd2.initial(batch(("C2", "A", "S"), ("C1", "B", "S"),
      ("C3", "C", "S")), asOf1)
    val keyed = Scd2.withSurrogateKey(dim, "customer_key", "customer_id")
    val keys = keyed.orderBy($"customer_id")
      .select($"customer_key").as[Long].collect()
    assert(keys.toSeq == Seq(1L, 2L, 3L))
  }
}
