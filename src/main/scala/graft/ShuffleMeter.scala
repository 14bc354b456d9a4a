package graft

/** Accumulates shuffle write bytes across completed stages — zeroed
  * before each measured query so Bench / ScaleProbe can report per-query
  * shuffle volume, the direct scale signal: a query whose shuffle is a
  * small multiple of its output at the probed SF is one whose plan
  * survives a 1000× scale-up, while a scan-sized shuffle flags a missing
  * broadcast/pushdown. Drain the listener bus (ListenerBridge.drain)
  * before reading `mb`. */
private[graft] final class ShuffleMeter
    extends org.apache.spark.scheduler.SparkListener {
  private val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  def reset(): Unit = bytes.set(0L)
  def mb: Double = bytes.get() / 1e6
}
