package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the driver's smoke contract: SparkEntry.entry must return rows. */
class EntrySpec extends AnyFunSuite {
  test("flagship entry returns rows with the expected shape") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.columns.toSeq == Seq("station_id", "n", "mean_temp"))
    assert(df.count() > 0)
  }
}
