package graft.engine

/** Wall-clock attribution for queries that run heavyweight work at
  * CONSTRUCTION time (store build / append / compact / delete before the
  * returned search frame executes): the lifecycle ops wrap their phases
  * in [[time]], and Bench drains the buffer per timed pass to report
  * `build`/`append`/... rows alongside the query total — so a search
  * regression can't hide inside build noise (VERDICT r13 item 4).
  *
  * Deliberately dumb: a process-wide synchronized map, drained by
  * whoever cares (Bench) and ignored by everyone else (Verify runs the
  * same closures; an undrained buffer is just overwritten next drain).
  */
object PhaseTimer {
  private val buf =
    scala.collection.mutable.LinkedHashMap.empty[String, Double]

  /** Run `f`, accumulating its wall time under `phase`. Same-phase calls
    * within one drain window sum (b5 times its append AND its idempotent
    * replay as one `append` figure — the lifecycle's cost, not a call
    * count).
    */
  def time[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally synchronized {
      buf(phase) = buf.getOrElse(phase, 0.0) + (System.nanoTime() - t0) / 1e9
    }
  }

  /** Snapshot-and-clear: the phases recorded since the last drain. */
  def drain(): Map[String, Double] = synchronized {
    val m = buf.toMap
    buf.clear()
    m
  }
}
