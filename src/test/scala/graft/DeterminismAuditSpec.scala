package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** CI gate for the SPARK-23207 bug class: an expression whose value depends
  * on physical layout (`monotonically_increasing_id`, `rand`,
  * `spark_partition_id`) silently changes under task retry or stage
  * recomputation; used as a shuffle/join key it can DROP or DOUBLE-COUNT
  * rows mid-query (the round-11 `Skew.saltedJoin` salt). Every use site in
  * `src/main` must be in the audited allowlist below, each with the reason
  * its use is layout-safe; a new unreviewed site fails this spec.
  *
  * (Comments and scaladoc mentioning the names don't count — only code
  * lines do; the scan strips `//`-suffixes and skips `*`-led doc lines.)
  */
class DeterminismAuditSpec extends AnyFunSuite {

  /** file-name -> substring that must appear on the flagged line; the
    * comment states the audit rationale.
    */
  private val allowlist: Seq[(String, String, String)] = Seq(
    // mono_id applied DIRECTLY to a narrow file-scan projection (no
    // shuffle upstream): ids replay identically on retry because the scan
    // re-produces the same rows in the same order; used only as a window
    // ORDER tie-break, never as a shuffle key.
    ("Features.scala", "monotonically_increasing_id()",
      "scan-order window tie-break, pre-shuffle"),
    // spark_partition_id read AFTER repartitionByRange (seeded, hence
    // deterministic boundaries) on a persisted frame; partition identity
    // is part of the global-row-number contract and layout is pinned by
    // the persist.
    ("Split.scala", "spark_partition_id()",
      "range-partitioned + persisted global row number"))

  private def mainSources: Seq[Path] =
    Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  test("every layout-dependent expression site is audited") {
    val pattern = "(monotonically_increasing_id|spark_partition_id|[^a-zA-Z_]rand\\()".r
    val hits = for {
      p <- mainSources
      (line0, idx) <- Files.readAllLines(p).asScala.zipWithIndex
      line = line0.takeWhile(_ != '/') // strip trailing // comments
      if !line0.trim.startsWith("*") && !line0.trim.startsWith("//")
      if pattern.findFirstIn(line).isDefined
    } yield (p.getFileName.toString, idx + 1, line.trim)
    val unaudited = hits.filterNot { case (f, _, line) =>
      allowlist.exists { case (af, frag, _) => af == f && line.contains(frag) }
    }
    assert(unaudited.isEmpty,
      "unaudited layout-dependent expression site(s) — either make them " +
        "content-derived (see Skew.contentSalt) or add an audited " +
        s"allowlist entry with rationale:\n${unaudited.mkString("\n")}")
  }

  test("the allowlist carries no stale entries") {
    val stale = allowlist.filterNot { case (af, frag, _) =>
      mainSources.exists(p => p.getFileName.toString == af &&
        Files.readAllLines(p).asScala.exists(_.contains(frag)))
    }
    assert(stale.isEmpty, s"allowlist entries no longer in source: $stale")
  }
}
