package graft

/** Task-level data-movement accumulator shared by [[Bench]]'s
  * per-query movement record and MovementSpec's byte-budget
  * regression net — one listener, one settle heuristic, so the bench
  * and its net cannot drift. Listener events are asynchronous;
  * [[settled]] polls until the counters stop moving (bounded), which
  * must happen OUTSIDE any timed region.
  */
final class MovementMeter extends org.apache.spark.scheduler.SparkListener {
  private val sr = new java.util.concurrent.atomic.AtomicLong
  private val sw = new java.util.concurrent.atomic.AtomicLong
  private val sp = new java.util.concurrent.atomic.AtomicLong
  private val in = new java.util.concurrent.atomic.AtomicLong

  override def onStageCompleted(
      s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val m = s.stageInfo.taskMetrics
    if (m != null) {
      sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      sp.addAndGet(m.diskBytesSpilled)
      in.addAndGet(m.inputMetrics.bytesRead)
    }
  }

  /** (shuffle read, shuffle write, spilled, input) bytes so far. */
  def state: (Long, Long, Long, Long) = (sr.get, sw.get, sp.get, in.get)

  /** [[state]] after the async listener queue has drained (counters
    * unchanged across a poll interval, bounded at ~1 s).
    */
  def settled: (Long, Long, Long, Long) = {
    var prev = (-1L, -1L, -1L, -1L)
    var cur = state
    var i = 0
    while (cur != prev && i < 40) { Thread.sleep(25); prev = cur; cur = state; i += 1 }
    cur
  }
}
