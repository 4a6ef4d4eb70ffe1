package graft.engine

import org.apache.spark.sql.SparkSession

import graft.functions.{DotProductExpr, FreqItemsAgg, Int8QuantizeExpr, PolyHashExpr, PolyShinglesExpr, RepetitionStatsExpr, VectorMinAgg, VectorSumAgg}

/** Registers graft's native Catalyst expressions as SQL functions so they are
  * usable from both the Column API (`call_function`) and `spark.sql`.
  * Idempotent per session.
  */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_poly_hash",
      exprs => PolyHashExpr(exprs.head),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProductExpr(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_int8_quantize",
      exprs => Int8QuantizeExpr(exprs.head),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_int8_codes",
      exprs => graft.functions.Int8CodesExpr(exprs.head),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rep_stats",
      exprs => RepetitionStatsExpr(exprs.head),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_stats",
      exprs => graft.functions.TokenStatsExpr(exprs.head),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      exprs => PolyShinglesExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow",
      exprs => graft.functions.WinnowExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_fps",
      exprs => graft.functions.WinnowFpsExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_stats",
      exprs => graft.functions.WinnowStatsExpr(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_multi_shingle_hashes",
      exprs => graft.functions.MultiShinglesExpr(exprs.head,
        exprs(1).eval(null).toString.split(",").toSeq.map(_.trim.toInt)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bands",
      exprs => graft.functions.LshBandsExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int],
        exprs(3).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cut_spans",
      exprs => graft.functions.CutSpansExpr(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int],
        if (exprs.length > 3) exprs(3).eval(null).asInstanceOf[Int] else 0),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode",
      exprs => graft.functions.PqEncodeExpr(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_dist_table",
      exprs => graft.functions.PqDistTableExpr(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_residual",
      exprs => graft.functions.PqResidualExpr(exprs(0), exprs(1), exprs(2)),
      "built-in"
    )
    // Spark's internal runtime-filter kernels, exposed as callable
    // functions for the explicit BloomPrune operator.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    // Aggregates: the analyzer wraps AggregateFunctions into
    // AggregateExpressions during resolution.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum", exprs => VectorSumAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_min", exprs => VectorMinAgg(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_freq_items",
      exprs => FreqItemsAgg(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]),
      "built-in")
    // As-of SQL surface: marker predicates rewritten into the AsOfJoin
    // operator by RewriteAsOfMarkerJoin (see plans/AsOfSql.scala).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_asof",
      exprs => graft.plans.GraftAsOfCond(exprs, forward = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_asof_fwd",
      exprs => graft.plans.GraftAsOfCond(exprs, forward = true),
      "built-in")
  }
}
