package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Driver-side phase timing for the table-lifecycle paths (stage / stats /
  * probe / commit / read). Zero overhead when disabled (one volatile read);
  * enabled via `-Dgraft.phase.timing=true` or [[enable]] — the bench and
  * profiling mains flip it to attribute lifecycle seconds to merge phases.
  * Accumulates (sum, count) per label so a chained lifecycle query (two MOR
  * merges + read) shows per-phase totals. Timings are wall-clock driver
  * time: a phase that launches a Spark job includes the job.
  */
object Phase {
  @volatile private var enabled: Boolean =
    java.lang.Boolean.getBoolean("graft.phase.timing")
  private val sums = new ConcurrentHashMap[String, LongAdder]()
  private val counts = new ConcurrentHashMap[String, LongAdder]()

  def enable(): Unit = { enabled = true }
  def disable(): Unit = { enabled = false }
  def reset(): Unit = { sums.clear(); counts.clear() }

  def timed[T](label: String)(f: => T): T = {
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val dt = System.nanoTime() - t0
        sums.computeIfAbsent(label, _ => new LongAdder).add(dt)
        counts.computeIfAbsent(label, _ => new LongAdder).increment()
      }
    }
  }

  /** (label, totalSeconds, invocationCount), descending by time. */
  def snapshot(): Seq[(String, Double, Long)] = {
    import scala.jdk.CollectionConverters._
    sums.asScala.toSeq.map { case (k, v) =>
      (k, v.sum() / 1e9, counts.get(k).sum())
    }.sortBy(-_._2)
  }

  def report(): String =
    snapshot().map { case (k, s, n) => f"$k%-28s $s%8.3f s  x$n%d" }
      .mkString("\n")
}
