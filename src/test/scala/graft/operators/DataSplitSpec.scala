package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("byHash: partition-layout independent, total, roughly proportioned") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = docs.select($"doc_id",
      DataSplit.byHash($"doc_id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.repartition(13).select($"doc_id",
      DataSplit.byHash($"doc_id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, frac)
    assert(frac.values.sum == 1.0)
  }

  test("byHash: membership is stable when new rows arrive") {
    val docs = Tables.load(spark, sfDir, "documents")
    val before = docs.filter($"doc_id" < 100)
      .select($"doc_id", DataSplit.byHash($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    val after = docs // superset
      .select($"doc_id", DataSplit.byHash($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    before.foreach { case (id, s) => assert(after(id) == s) }
  }

  test("stratified sample: exactly k per class, deterministic") {
    val q = DataSplit.all.find(_.name == "q46_stratified_sample").get
    val got = q.run(spark, sfDir).collect()
    val perLabel = got.groupBy(_.getAs[Int]("label"))
    perLabel.values.foreach(rows => assert(rows.length == 5))
    val again = q.run(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(again == got.map(_.toSeq).toSeq)
  }

  test("mixSample: partition-independent, monotone in quota, rate-accurate") {
    val docs = Tables.load(spark, sfDir, "documents")
    def keptIds(rates: Map[String, Long], df: org.apache.spark.sql.DataFrame) =
      DataSplit.mixSample(df, rates).select($"doc_id")
        .as[Long].collect().toSet

    val half = (0 until 20).map(i => s"src$i" -> 500000L).toMap
    val a = keptIds(half, docs)
    val b = keptIds(half, docs.repartition(17))
    assert(a == b)

    // raising every quota only ADDS rows (threshold form ⇒ monotone)
    val more = (0 until 20).map(i => s"src$i" -> 800000L).toMap
    assert(a.subsetOf(keptIds(more, docs)))

    // unlisted sources are dropped entirely
    val only3 = Map("src3" -> 1000000L)
    val c = DataSplit.mixSample(docs, only3)
    assert(c.select($"source").distinct().as[String].collect().toSeq == Seq("src3"))
    assert(c.count() == docs.filter($"source" === "src3").count())

    // achieved rate tracks the quota (binomial tolerance on 500 docs)
    assert(math.abs(a.size / 500.0 - 0.5) < 0.1)
  }

  test("mixSample plan: quota dim is broadcast, corpus not shuffled") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = DataSplit.mixSample(docs, DataSplit.q73Rates)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q84 temperature mix: rate follows K/sqrt(mass), kept within bounds") {
    val r = graft.SparkEntry.queries("q84_temperature_mix")(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val total = row.getAs[Long]("total_tokens")
      val rate = row.getAs[Double]("sample_rate")
      assert(row.getAs[Long]("n_kept") <= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("kept_tokens") <= total)
      // ppm = floor(1e6·K/√T) ⇒ rate·√T ∈ (K − √T/1e6, K], K = 8
      val rs = rate * math.sqrt(total.toDouble)
      assert(rs <= 8.0 + 1e-9, s"rate·√T=$rs above K")
      assert(rs > 8.0 - math.sqrt(total.toDouble) / 1e6 - 1e-9,
        s"rate·√T=$rs below the floor band")
    }
    // α = 0.5 flattening: heavier sources get strictly lower rates
    val byMass = r.map(row => (row.getAs[Long]("total_tokens"),
      row.getAs[Double]("sample_rate"))).sortBy(_._1)
    byMass.zip(byMass.tail).foreach { case ((t1, r1), (t2, r2)) =>
      if (t1 < t2) assert(r2 <= r1, s"rate not monotone: $t1->$r1, $t2->$r2")
    }
  }

  test("q124 weighted sample: driver replay of A-ES keys picks the same 100") {
    import graft.functions.Affine61.{wsA, wsB}
    import graft.functions.{MulMod61, TextFunctions}
    val stop = TextFunctions.EnStopwords.toSet
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent arithmetic: Math.log + MulMod61.affine on the driver,
    // mirroring qualityScoreFused's exact term order
    val keyed = docs.map { case (id, text) =>
      val w = text.trim.toLowerCase.split("\\s+", -1)
      val lenTerm = math.min(text.length / 500.0, 1.0)
      val stopTerm =
        math.min(w.count(stop).toDouble / w.length * 4.0, 1.0)
      val punctTerm = 1.0 - math.min(
        text.replaceAll("[A-Za-z0-9\\s]", "").length.toDouble /
          text.length * 10.0, 1.0)
      val quality = lenTerm * 0.4 + stopTerm * 0.4 + punctTerm * 0.2
      val wmu = math.max(math.floor(quality * 1000000.0).toLong, 1L)
      val u = (MulMod61.affine(wsA, wsB, id) + 1L).toDouble /
        MulMod61.P.toDouble
      val key = math.floor(
        math.log(u) / (wmu.toDouble / 1000000.0) * 1e4).toLong * 100
      (id, wmu, key)
    }
    val top = keyed.sortBy { case (id, _, k) => (-k, id) }.take(100)
    val got = graft.SparkEntry.queries("q124_weighted_sample")(spark, sfDir)
      .collect()
    assert(got.length == math.min(100, docs.length))
    got.zip(top).zipWithIndex.foreach { case ((r, (id, wmu, key)), i) =>
      assert(r.getAs[Long]("rk") == i + 1)
      assert(r.getAs[Long]("doc_id") == id, s"rank ${i + 1}: $r vs $id")
      assert(r.getAs[Long]("wmu") == wmu)
      assert(r.getAs[Long]("key_unat") == key)
    }
    // weighting is real: the sampled docs' mean quality beats the corpus's
    val meanAll = keyed.map(_._2).sum.toDouble / keyed.length
    val meanTop = top.map(_._2).sum.toDouble / top.length
    assert(meanTop > meanAll, s"selection not quality-biased: $meanTop <= $meanAll")
  }
}
