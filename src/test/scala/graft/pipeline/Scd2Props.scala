package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the SCD2 snapshot rewrite (SURVEY §5.2):
  * random merge sequences must preserve the dimension invariants the
  * reference's mutable UPDATE/INSERT flow guarantees by construction.
  */
object Scd2Props extends Properties("Scd2") {

  // Spark-backed properties are expensive; a handful of random merge
  // histories exercises the interesting interleavings.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = (1 to 6).map(i => s"C$i")

  private val valueGen: Gen[String] =
    Gen.oneOf("Dhaka", "Khulna", "Sylhet", "Bogra")

  /** A staged batch: subset of the key pool with random tracked values
    * (reference batches never carry NULL keys; values may repeat).
    */
  private val batchGen: Gen[Map[String, String]] = for {
    present <- Gen.someOf(keys).suchThat(_.nonEmpty)
    values <- Gen.listOfN(present.size, valueGen)
  } yield present.toList.zip(values).toMap

  private val historyGen: Gen[List[Map[String, String]]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, batchGen))

  private def toDf(batch: Map[String, String]): DataFrame =
    batch.toSeq.toDF("customer_id", "city")

  private def runHistory(batches: List[Map[String, String]]): DataFrame = {
    val dates = (1 to batches.size)
      .map(i => lit(java.sql.Date.valueOf(f"2025-01-${i * 2}%02d")))
    val init = Scd2.initial(toDf(batches.head), dates.head)
    batches.tail.zip(dates.tail).foldLeft(init) { case (dim, (b, d)) =>
      Scd2.merge(dim, toDf(b), "customer_id", Seq("city"), d)
    }
  }

  property("exactly one current row per live business key") =
    forAll(historyGen) { batches =>
      val dim = runHistory(batches).cache()
      val dup = dim.filter($"is_current")
        .groupBy($"customer_id").count().filter($"count" =!= 1).count()
      val liveKeys = batches.flatMap(_.keys).toSet
      val current = dim.filter($"is_current")
        .select($"customer_id").as[String].collect().toSet
      dim.unpersist()
      Prop(dup == 0) :| "duplicate current rows" &&
        Prop(current == liveKeys) :| s"current=$current live=$liveKeys"
    }

  property("closed versions never overlap their successor") =
    forAll(historyGen) { batches =>
      val dim = runHistory(batches)
      // for each key, sorted versions must satisfy expiry(n) < effective(n+1)
      val bad = dim.as[(String, String, java.sql.Date, java.sql.Date, Boolean)]
        .collect()
        .groupBy(_._1)
        .exists { case (_, rows) =>
          val sorted = rows.sortBy(_._3.toLocalDate.toEpochDay)
          sorted.sliding(2).exists {
            case Array(prev, next) =>
              !prev._4.toLocalDate.isBefore(next._3.toLocalDate)
            case _ => false
          }
        }
      Prop(!bad) :| "overlapping version ranges"
    }

  property("re-merging the final batch is a no-op (idempotence)") =
    forAll(historyGen) { batches =>
      val dim = runHistory(batches)
      val again = Scd2.merge(dim, toDf(batches.last), "customer_id",
        Seq("city"), lit(java.sql.Date.valueOf("2025-02-28")))
      Prop(again.count() == dim.count()) :| "idempotent re-merge grew history"
    }

  property("history only grows, by exactly the changed keys") =
    forAll(historyGen, batchGen) { (batches, extra) =>
      val dim = runHistory(batches).cache()
      val currentCity = dim.filter($"is_current")
        .select($"customer_id", $"city").as[(String, String)]
        .collect().toMap
      val changedOrNew = extra.count { case (k, v) =>
        currentCity.get(k) match {
          case None => true // brand-new key
          case Some(null) => false // NULL tracked value: 3VL != is unknown
          case Some(cur) => cur != v
        }
      }
      val next = Scd2.merge(dim, toDf(extra), "customer_id", Seq("city"),
        lit(java.sql.Date.valueOf("2025-03-15")))
      val grown = next.count() - dim.count()
      dim.unpersist()
      Prop(grown == changedOrNew) :| s"grew $grown, expected $changedOrNew"
    }
}
