package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd, SparkListenerTaskEnd}

/** Dev-only companion to the memory-pressure sweep: sums every task's
  * spill metrics so a "results are hash-identical under spilling" run
  * can PROVE it actually spilled (a sweep that never left memory would
  * be vacuous). Wire in with the memory-pressure confs:
  *
  *   SPARK_GRAFT_CONF="spark.memory.fraction=0.05;
  *     spark.extraListeners=graft.tools.SpillReportListener"
  *
  * Spilling exercises the code paths a loaded cluster lives in —
  * UnsafeExternalSorter / ExternalAppendOnlyMap flush partial state to
  * disk and merge it back — and a hash-identical result under forced
  * spills is the concrete form of "spill-safe": merge order and
  * on-disk round trips don't leak into declared results. */
class SpillReportListener extends SparkListener {
  private val mem = new AtomicLong
  private val disk = new AtomicLong
  private val tasks = new AtomicLong

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val m = ev.taskMetrics
    if (m != null && (m.memoryBytesSpilled > 0 || m.diskBytesSpilled > 0)) {
      tasks.incrementAndGet()
      mem.addAndGet(m.memoryBytesSpilled)
      disk.addAndGet(m.diskBytesSpilled)
    }
  }

  override def onApplicationEnd(ev: SparkListenerApplicationEnd): Unit =
    // scalastyle:off println
    println(s"[spill] tasks_spilled=${tasks.get} " +
      s"memoryBytesSpilled=${mem.get} diskBytesSpilled=${disk.get}")
    // scalastyle:on println
}
