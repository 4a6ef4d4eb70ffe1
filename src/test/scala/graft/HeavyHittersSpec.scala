package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HeavyHitters

/** Batched SpaceSaving: hand-computed eviction + floor-credit re-entry,
  * and the true ≤ cnt ≤ true + err guarantee under a multi-batch fold.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(c: (String, Long)*): DataFrame =
    c.toSeq.toDF("token", "bc")

  private def empty: DataFrame =
    Seq.empty[(String, Long, Long)].toDF("token", "cnt", "err")

  test("eviction raises the floor; a re-entering token is floor-credited") {
    // m=2. Batch 1: a=10, b=5, c=3 → keep {a:10, b:5}, evict c → floor 3.
    val (s1, f1) = HeavyHitters.mergeSpaceSaving(
      empty, 0L, counts("a" -> 10L, "b" -> 5L, "c" -> 3L), m = 2)
    assert(f1 == 3L)
    assert(s1.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 10L, 0L), ("b", 5L, 0L)))
    // Batch 2: c=4 re-enters with the floor credit (cnt 3+4=7, err 3),
    // evicting b (cnt 5) → floor rises to 5.
    val (s2, f2) = HeavyHitters.mergeSpaceSaving(
      s1, f1, counts("c" -> 4L), m = 2)
    assert(f2 == 5L)
    assert(s2.as[(String, Long, Long)].collect().toSet ==
      Set(("a", 10L, 0L), ("c", 7L, 3L)))
  }

  test("true <= cnt <= true + err holds for every surviving token") {
    // Three skewed batches over a 9-token alphabet, m=4.
    val batches = Seq(
      Seq("x" -> 9L, "y" -> 7L, "a" -> 2L, "b" -> 2L, "c" -> 1L),
      Seq("x" -> 5L, "c" -> 4L, "d" -> 3L, "e" -> 1L, "f" -> 1L),
      Seq("y" -> 6L, "c" -> 2L, "g" -> 2L, "a" -> 1L, "h" -> 1L))
    var st = empty
    var fl = 0L
    batches.foreach { b =>
      val (ns, nf) = HeavyHitters.mergeSpaceSaving(st, fl, counts(b: _*), 4)
      st = ns; fl = nf
    }
    val truth = batches.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val rows = st.as[(String, Long, Long)].collect()
    assert(rows.length == 4)
    for ((tok, cnt, err) <- rows) {
      assert(cnt >= truth(tok), s"$tok upper bound")
      assert(cnt - err <= truth(tok), s"$tok lower bound")
    }
    // x and y (the real heavy hitters, both > N/m) MUST have survived.
    val kept = rows.map(_._1).toSet
    assert(kept.contains("x") && kept.contains("y"))
    // the floor bounds any evicted token's true count
    truth.filterNot { case (t, _) => kept(t) }
      .foreach { case (t, n) => assert(n <= fl, s"evicted $t") }
  }

  test("ties at the cut break on token, deterministically") {
    val (s1, f1) = HeavyHitters.mergeSpaceSaving(
      empty, 0L, counts("d" -> 5L, "b" -> 5L, "a" -> 5L, "c" -> 5L), m = 2)
    assert(s1.as[(String, Long, Long)].collect().map(_._1).toSet ==
      Set("a", "b"))
    assert(f1 == 5L)
  }
}
