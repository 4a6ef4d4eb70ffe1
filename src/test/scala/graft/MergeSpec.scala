package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert applies update/insert/keep with column-level COALESCE") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("key", "name", "balance")
    val updates = Seq((2L, 99.0, 5L), (4L, 44.0, 2L))
      .toDF("key", "balance", "n_orders")
    val out = Merge.upsert(base, updates, "key")
      .orderBy("key").collect()

    assert(out.map(_.getString(4)).toSeq ==
      Seq("kept", "updated", "kept", "inserted"))
    // shared column: update wins where present, base carries otherwise
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 99.0, 30.0, 44.0))
    // base-only column: null for inserted rows
    assert(out(3).isNullAt(1) && out(1).getString(1) == "b")
    // update-only column: null for kept rows
    assert(out(0).isNullAt(3) && out(1).getLong(3) == 5L)
  }

  test("upsert labels NULL-key base rows as kept, not inserted") {
    val base = Seq((Some(1L), "a", 10.0), (None, "nul", 20.0))
      .toDF("key", "name", "balance")
    val updates = Seq((1L, 99.0)).toDF("key", "balance")
    val out = Merge.upsert(base, updates, "key")
      .orderBy(col("key").asc_nulls_last).collect()
    assert(out.length == 2)
    assert(out(0).getString(3) == "updated")
    // the NULL-key base row never joins, but it is a carried-forward base
    // row — "kept", with its columns intact
    assert(out(1).isNullAt(0) && out(1).getString(3) == "kept")
    assert(out(1).getString(1) == "nul" && out(1).getDouble(2) == 20.0)
  }

  test("upsert result has exactly the union of keys") {
    val base = (1L to 100L).map(k => (k, k * 1.0)).toDF("key", "balance")
    val updates = (51L to 150L).map(k => (k, k * 2.0)).toDF("key", "balance")
    val out = Merge.upsert(base, updates, "key")
    assert(out.count() == 150)
    assert(out.filter(col("action") === "updated").count() == 50)
    assert(out.filter(col("action") === "inserted").count() == 50)
    assert(out.filter(col("action") === "kept").count() == 50)
  }
}
