package graft

/** Accumulates shuffle write bytes AND executor task CPU time across
  * completed stages — zeroed before each measured query so Bench /
  * ScaleProbe can report per-query values.
  *
  * Shuffle volume is the direct scale signal: a query whose shuffle is
  * a small multiple of its output at the probed SF is one whose plan
  * survives a 1000× scale-up, while a scan-sized shuffle flags a
  * missing broadcast/pushdown.
  *
  * Executor CPU is the spread-INVARIANT cost signal (r13 verdict #1):
  * same-code wall clock differed ~24% between containers even at load
  * ~1 (frequency scaling / steal, invisible to load averages), so
  * round-over-round wall diffs under that spread are noise. The sum of
  * task CPU time barely moves under scheduling contention — compare
  * cpu_sec across rounds, and use the calibration ratio (Bench header)
  * for what CPU time can't see (frequency).
  *
  * Drain the listener bus (ListenerBridge.drain) before reading. */
private[graft] final class ShuffleMeter
    extends org.apache.spark.scheduler.SparkListener {
  private val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
  }
  def reset(): Unit = { bytes.set(0L); cpuNs.set(0L) }
  def mb: Double = bytes.get() / 1e6
  def cpuSec: Double = cpuNs.get() / 1e9
}
