package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard for the SCALING.md invariant "no unbounded driver
  * collect in any operator path". The doc claim alone is how scale bugs
  * hide (a `.collect()` that pulls a corpus *fraction* to the driver is
  * invisible to the oracle gate and to local benchmarks — it only OOMs
  * at real scale), so this spec greps `src/main` for driver-side
  * materialization calls and fails on ANY occurrence not in the
  * allowlist below. Adding a new collect means adding an allowlist entry
  * whose rationale explains why the result is O(1)/O(k) in corpus size —
  * which is exactly the review this guard exists to force.
  *
  * Scalar `.head()` on a one-row aggregate is deliberately NOT flagged:
  * it ships a single row regardless of data size.
  */
class NoDriverCollectSpec extends AnyFunSuite {

  /** file-name suffix -> (max occurrences, why each is bounded) */
  private val allowlist: Map[String, (Int, String)] = Map(
    "operators/VectorQueries.scala" -> (8,
      "quantizer/model PARAMETER state only: IVF init collect is ~NCells " +
        "rows via a pre-counted stride and its Lloyd update is k*dims " +
        "integer sums; PQ's three (seed init, Lloyd update, and the q100 " +
        "codebook seed) are each O(PqM*PqK*PqSubDim) longs; q108 collects " +
        "the d(d+1)/2 = 2080 covariance cells (the MLlib collect-the-" +
        "Gramian division of labor); q122's two (seed + per-round argmax) " +
        "are each exactly ONE row via limit(1), O(K) rows total — " +
        "codebooks/matrices/centers, never data"),
    "Serve.scala" -> (1,
      "catalog metadata listing (table names), not data"),
    "operators/TextQueries.scala" -> (3,
      "tokenizer MODEL parameters only, never data: q129's merge table " +
        "(top-50 pair rows from the vocab-sized q109 aggregation, baked " +
        "into the fused BpeApply expression), q131's per-round " +
        "training argmax (limit(1) — exactly ONE row per round, 16 " +
        "rows total, the q122 TakeOrdered(1) MO), and q133/q134's " +
        "shared trained merge table (the 16 q131 argmax rows " +
        "re-collected for the BpeApply constant — O(model), bounded " +
        "by the round count)"),
    "operators/TrainingQueries.scala" -> (1,
      "q135's per-round gradient row: an ungrouped five-column " +
        "aggregate collects exactly ONE row per training round " +
        "(QcRounds total) — model parameters, never data; the weight " +
        "update it feeds is O(d) driver arithmetic")
  )

  private val patterns = Seq(".collect()", ".collectAsList(", ".toLocalIterator")

  private def scalaSources(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("src/main has no driver-side collect outside the bounded allowlist") {
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"expected to run from repo root; $root missing")
    val hits: Seq[(String, Int, String)] = for {
      p <- scalaSources(root)
      (line, idx) <- Files.readAllLines(p).asScala.toSeq.zipWithIndex
      if patterns.exists(line.contains)
    } yield (root.relativize(p).toString.replace('\\', '/'), idx + 1, line.trim)

    val byFile = hits.groupBy(_._1)
    val violations = byFile.flatMap { case (file, fileHits) =>
      allowlist.find { case (suffix, _) => file.endsWith(suffix) } match {
        case Some((_, (maxN, _))) if fileHits.size <= maxN => None
        case Some((suffix, (maxN, why))) =>
          Some(s"$file: ${fileHits.size} collects > allowlisted $maxN ($why)\n" +
            fileHits.map(h => s"    line ${h._2}: ${h._3}").mkString("\n"))
        case None =>
          Some(s"$file: collect not allowlisted\n" +
            fileHits.map(h => s"    line ${h._2}: ${h._3}").mkString("\n"))
      }
    }
    assert(violations.isEmpty,
      "driver-side collect outside the bounded allowlist — either make the " +
        "operator distributed or add an allowlist entry with a boundedness " +
        "rationale:\n" + violations.mkString("\n"))
  }

  test("allowlist entries are live (no stale rationale rot)") {
    // If a collect is removed, its entry must go too — a stale allowlist
    // slot is a free pass for the next collect someone adds to that file.
    val root = Paths.get("src/main/scala/graft")
    val files = scalaSources(root).map(p => root.relativize(p).toString.replace('\\', '/'))
    allowlist.foreach { case (suffix, (maxN, _)) =>
      val matching = files.filter(_.endsWith(suffix))
      assert(matching.nonEmpty, s"allowlist entry $suffix matches no source file")
      val n = matching.map { f =>
        Files.readAllLines(root.resolve(f)).asScala
          .count(line => patterns.exists(line.contains))
      }.sum
      assert(n == maxN,
        s"$suffix: allowlist says $maxN collects, source has $n — update the entry")
    }
  }
}
