package graft.tools

/** Throwaway sizing probe: batched-BPE merge yield per round at a given SF,
  * to pick (rounds, window, batchCap) for the t13b gate.
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local("16")
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for ((r, w, b) <- Seq((8, 48, 16), (6, 64, 24), (8, 64, 24))) {
      val t0 = System.nanoTime()
      val m = graft.ops.Bpe.trainBatched(docs, "text", r, w, b)
      println(f"rounds=$r window=$w cap=$b -> merges=${m.size} " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
