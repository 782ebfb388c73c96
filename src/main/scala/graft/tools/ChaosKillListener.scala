package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskKilled
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd, SparkListenerTaskStart, SparkListenerTaskEnd}

/** Dev-only chaos harness: kills the FIRST task attempt of every stage
  * (once per stage, via `SparkContext.killTaskAttempt`), forcing the
  * scheduler to re-attempt it. Running the full Verify dump under this
  * listener and then the DuckDB compare proves TASK-RETRY DETERMINISM:
  * no query's declared result depends on which attempt of a task
  * produced its output. That property is what a 1000-executor cluster
  * leans on constantly (preemption, spot loss, speculation, fetch
  * failure) and is the classic place silent corruption hides — e.g. a
  * non-deterministic upstream feeding a round-robin repartition, or a
  * window function over an under-specified sort, recomputed
  * differently on retry. Local-mode speculation can't exercise this
  * (a speculative copy never launches on the host already running the
  * attempt, and local[] has one host), so the kill is injected
  * explicitly.
  *
  * Wire in via the Verify sweep hook — no separate main needed:
  *   SPARK_GRAFT_CONF="spark.extraListeners=graft.tools.ChaosKillListener"
  * Kills are best-effort by design: the listener bus is async, so a
  * sub-millisecond task may finish before the kill lands (the kill is
  * then a no-op). Landed kills are counted from the TaskKilled end
  * reason and reported at application end — a sweep reading is only
  * meaningful alongside that count. Intentionally-killed attempts do
  * not count toward spark.task.maxFailures, so the chaos run cannot
  * fail a query by itself; only a result hash can differ. */
class ChaosKillListener extends SparkListener {
  private val seenStage = ConcurrentHashMap.newKeySet[Integer]()
  private val attempted = new AtomicLong
  private val landed = new AtomicLong

  override def onTaskStart(ev: SparkListenerTaskStart): Unit = {
    val info = ev.taskInfo
    if (info.attemptNumber == 0 && seenStage.add(ev.stageId)) {
      // getDefaultSession: the listener bus thread has no thread-local
      // active session; the default session is process-wide
      org.apache.spark.sql.SparkSession.getDefaultSession
        .map(_.sparkContext).foreach { sc =>
        attempted.incrementAndGet()
        // interruptThread=false: the kill flag is honored at the next
        // record boundary — enough to land mid-stage without tearing
        // writers that would be torn down by interrupt side effects
        try sc.killTaskAttempt(info.taskId, interruptThread = false,
          reason = "graft-chaos: first-attempt kill")
        catch { case _: IllegalArgumentException => () } // already done
      }
    }
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit =
    ev.reason match {
      // count ONLY our own kills: streaming-query stops and stage
      // cancellations also end tasks with a TaskKilled reason, and
      // counting those would inflate the sweep's evidence number
      case k: TaskKilled if k.reason.startsWith("graft-chaos") =>
        landed.incrementAndGet()
      case _ => ()
    }

  override def onApplicationEnd(ev: SparkListenerApplicationEnd): Unit =
    // scalastyle:off println
    println(s"[chaos] kill attempts=${attempted.get} landed=${landed.get}")
    // scalastyle:on println
}
