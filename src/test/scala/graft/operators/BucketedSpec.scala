package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the bucketed layout buys exchange-free fact⋈fact joins:
  * the whole point of paying one clustering shuffle at write time.
  */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize AQE so the executed plan is real
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      // AQE query stages (Result/Shuffle/Broadcast) keep their subtree
      // in .plan, NOT .children — a plain children walk sees nothing
      case q: ShuffleQueryStageExec => // q.plan IS the exchange: count once
        1 + q.plan.children.map(count).sum
      case q: QueryStageExec => count(q.plan)
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed orders⋈lineitem joins without any shuffle exchange") {
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketed.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8)
    try {
      // force the join path a big-fact join takes (no broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val bucketed = Bucketed.cooperativeJoin(spark, "b_orders",
        "b_lineitem", "o_orderkey", "l_orderkey")
      val plain = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")

      // same relation...
      assert(bucketed.count() == plain.count())
      // ...but the bucketed join needs zero exchanges, the plain one two
      assert(shuffleCount(bucketed) == 0,
        "bucketed join should read co-located buckets, not shuffle")
      assert(shuffleCount(plain) == 2)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucket pruning: equality filter on the bucket key scans one bucket") {
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
    Bucketed.writeBucketed(orders, "b_orders_prune", "o_orderkey", 8)
    try {
      val one = spark.table("b_orders_prune").filter($"o_orderkey" === 7L)
      val expected = orders.filter($"o_orderkey" === 7L).count()
      assert(one.count() == expected)
      // the scan reports bucket pruning: selected buckets 1 of 8
      val scan = one.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.nonEmpty)
      assert(scan.get.optionalBucketSet.exists(_.cardinality() == 1),
        s"expected 1 selected bucket, got ${scan.get.optionalBucketSet}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_prune")
    }
  }
}
