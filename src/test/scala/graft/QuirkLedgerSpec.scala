package graft

import org.scalatest.funsuite.AnyFunSuite

/** Self-verification of the quirk ledger (ARCHITECTURE.md, "Quirk
  * ledger"): the ledger cites engine file:line anchors for every
  * deliberately-replicated reference bug, and those citations rot
  * silently as code moves (VERDICT r16 item 7). Each pinned row asserts
  * three things: (a) ARCHITECTURE.md still carries the citation — the
  * ledger and this spec cannot drift apart unnoticed, (b) the cited file
  * exists, (c) the cited line range still matches a content regex for
  * the quirk — so moving or "fixing" a pinned oddity fails here first,
  * pointing at BOTH places to update.
  */
class QuirkLedgerSpec extends AnyFunSuite {

  private def lines(path: String): Vector[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().toVector
    finally src.close()
  }

  private lazy val arch = lines("ARCHITECTURE.md").mkString("\n")

  private val Cal = "src/main/scala/graft/ops/Calibration.scala"
  private val Feat = "src/main/scala/graft/ops/Features.scala"
  private val Spl = "src/main/scala/graft/ops/Split.scala"
  private val Rel = "src/main/scala/graft/queries/Relational.scala"

  /** (quirk, citation substring in ARCHITECTURE.md, file, 1-based line
    * range, regex the range's content must match).
    */
  private val anchors: Seq[(String, String, String, Range, String)] = Seq(
    ("M3 no-log brightness temperature",
      "Calibration.scala:50-54", Cal, 50 to 54,
      raw"k2 / \(k1 / \(radiance \+ lit\(1\.0\)\)\)"),
    ("J1 first-match ground-truth dedup",
      "Features.scala:32-44", Feat, 32 to 44,
      raw"def firstMatchGroundTruths"),
    ("J1 left-outer join + sentinel fill",
      "Features.scala:32-44", Feat, 58 to 58,
      raw"def joinGroundTruth"),
    ("O1 exact-count shuffled split",
      "Split.scala:312", Spl, 312 to 312,
      raw"def exact\("),
    ("A2 population std (ddof=0)",
      "Relational.scala:30,284", Rel, 30 to 30,
      raw"stddev_pop"),
    ("A2 exact-stats witness",
      "Relational.scala:30,284", Rel, 284 to 284,
      raw"a10_exact_stats"),
    ("M5 thermal constants appended K2 before K1",
      "Calibration.scala:87-95", Cal, 87 to 95,
      raw"K2 before K1"),
    ("M4 11-to-7 band gather order (thermal at position 5)",
      "Calibration.scala:24-27", Cal, 24 to 27,
      raw"Seq\(1, 2, 3, 4, 5, 9, 6\)"),
    ("P3 sentinel equality filter",
      "Features.scala:64-66", Feat, 64 to 66,
      raw"=!= Sentinel"))

  test("every quirk-ledger engine anchor exists and still pins its content") {
    anchors.foreach { case (name, cite, file, range, rx) =>
      assert(arch.contains(cite),
        s"$name: ARCHITECTURE.md no longer cites `$cite` — ledger edited" +
          " without updating QuirkLedgerSpec (or vice versa)")
      val f = new java.io.File(file)
      assert(f.exists, s"$name: cited file $file is gone")
      val ls = lines(file)
      assert(range.end <= ls.size,
        s"$name: $file has ${ls.size} lines, citation reaches ${range.end}")
      val content = range.map(i => ls(i - 1)).mkString("\n")
      assert(rx.r.findFirstIn(content).isDefined,
        s"$name: lines ${range.start}-${range.end} of $file no longer" +
          s" match /$rx/ — the code moved; update the ARCHITECTURE.md" +
          s" ledger row AND this anchor. Current content:\n$content")
    }
  }
}
