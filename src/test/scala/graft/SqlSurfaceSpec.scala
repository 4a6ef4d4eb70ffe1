package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registered function surface through plain `spark.sql` — what a user
  * gets from `spark.sql.extensions=graft.engine.GraftExtensions` (same
  * builders; Session.prepare registers them on this session).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scalar expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT graft_poly_hash('abc') AS h,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       size(graft_shingle_hashes('one two three four', 3)) AS n
        |""".stripMargin).collect().head
    // h = ((('a'*31)+'b')*31+'c') mod 1e9+7 = computed by the same kernel
    assert(r.getLong(0) === graft.functions.PolyHashExpr.hash("abc"))
    assert(r.getDouble(1) === 11.0)
    assert(r.getInt(2) === 2) // two word-3-grams in four words
  }

  test("aggregates are callable from SQL with GROUP BY") {
    spark.sql(
      """SELECT * FROM VALUES (1, array(1.0d, 2.0d)), (1, array(10.0d, 20.0d)),
        |                     (2, array(5.0d, 5.0d)) AS t(g, v)""".stripMargin)
      .createOrReplaceTempView("sqlsurface_v")
    val rows = spark.sql(
      """SELECT g, graft_vec_sum(v) AS s FROM sqlsurface_v GROUP BY g ORDER BY g""")
      .collect()
    assert(rows(0).getSeq[Double](1) === Seq(11.0, 22.0))
    assert(rows(1).getSeq[Double](1) === Seq(5.0, 5.0))

    val freq = spark.sql(
      """SELECT graft_freq_items(w, 2) AS top FROM VALUES ('a'), ('a'), ('b')
        |AS t(w)""".stripMargin).collect().head
    val top = freq.getSeq[org.apache.spark.sql.Row](0)
    assert(top.head.getString(0) === "a" && top.head.getLong(1) === 2L)
  }
}
