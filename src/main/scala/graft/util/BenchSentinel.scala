package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Absolute contention sentinel for the bench artifact (VERDICT r5
  * "What's wrong" #1): the 2×-vs-own-median instability flag sees
  * variance but not LEVEL — three consistently-slow runs on a machine
  * busy with something else pass it silently (BENCH_r05 lifecycle ran
  * ~1.8× over idle truth, unflagged). The fix is a fixed CALIBRATION
  * job with its expected idle time committed to the repo: a pure-CPU
  * `spark.range` + xxhash64 sum across all worker threads — no data
  * dir, no IO, no shuffle — whose runtime moves only with CPU
  * contention. The bench times it at session START and END (contention
  * can arrive mid-run), records both plus `/proc/loadavg`, and sets a
  * top-level `"contended": true` whenever either measurement exceeds
  * [[ContendedRatio]]× the committed expectation — the artifact then
  * self-evidences idle-or-not without a judge re-run.
  */
object BenchSentinel {

  /** Row count sized so the sentinel runs ~1 s idle at local[32] —
    * long enough to smooth scheduler noise, short enough to be free. */
  val Rows: Long = 1L << 32

  /** Expected idle min-of-3 seconds on the build machine (local[32],
    * 128 GiB), calibrated by `graft.tools.SentinelCalibrate` on an idle
    * box. History: 2026-08-13 two sessions gave 0.335/0.310 → 0.32;
    * 2026-08-14 the VM instance REBOOTED onto visibly slower hardware
    * (uptime reset; idle floor 0.778 across repeated min-of-3 sessions,
    * /proc/stat steal flat, process table empty — every post-reboot
    * measurement of the old 0.32 expectation read as "contended 2.2-2.4"
    * including genuinely idle windows) → recalibrated to 0.78. The r9
    * bench's universal contended flags and the r9 "minhash regression"
    * trace to this hardware change, not load: ProfilePerf re-measured
    * minhash 10× at 3.4 s (vs the 6.67 contended recording) on the
    * slower box. Override with SPARK_GRAFT_SENTINEL_SEC after further
    * hardware changes. */
  val ExpectedSec: Double = 0.78

  /** Either sentinel measurement above ExpectedSec × this ⇒ the whole
    * artifact is flagged contended. 1.5 per the r5 verdict ask. */
  val ContendedRatio: Double = 1.5

  def expected: Double = sys.env.get("SPARK_GRAFT_SENTINEL_SEC")
    .map(_.toDouble).getOrElse(ExpectedSec)

  private def once(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    // bit_xor, not sum: ANSI mode (Spark 4 default) faults int64 sum
    // overflow, and 2^29 hash values overflow it almost surely
    spark.range(0L, Rows, 1L, cpus)
      .select(bit_xor(xxhash64(col("id"))))
      .queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Min of three runs after one untimed warm-up — the same discipline
    * as the query timings it guards. */
  def measure(spark: SparkSession, cpus: Int): Double = {
    once(spark, cpus)
    Seq.fill(3)(once(spark, cpus)).min
  }

  /** Raw `/proc/loadavg` (or "unavailable" off Linux) — the 1/5/15-min
    * run-queue context a reader needs to adjudicate a contended flag. */
  def loadavg: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  // ---- IO-sensitive sentinel (r14 verdict #1b) ----
  // The CPU probe read 0.85 ("fast host") in the same session whose
  // commit/IO-heavy lifecycle queries drifted 30-100% vs the prior
  // round — an IO-blind probe cannot see page-cache, storage, or
  // memory-bandwidth weather. This probe writes IoBytes in 8 MiB
  // fsync'd chunks to the SAME filesystem the lifecycle scratch
  // fixtures live on (Scratch.baseDir — tmpfs when available, so the
  // probe tracks memory bandwidth/pressure there, which is exactly the
  // resource those fixtures pay), reads them back, and deletes.

  /** Bytes written+read per IO probe pass. */
  val IoBytes: Long = 256L << 20

  /** Expected idle min-of-3 seconds for one IO pass on the build
    * machine, calibrated by `graft.tools.SentinelCalibrate` (same
    * discipline as [[ExpectedSec]]). 2026-08-16: two idle sessions
    * gave mins 0.208 / 0.215 → 0.21. Override with
    * SPARK_GRAFT_IO_SENTINEL_SEC after hardware changes. */
  val IoExpectedSec: Double = 0.21

  /** IO ratio above this ⇒ `io_contended` in the artifact. Looser than
    * the CPU gate (2.0 vs 1.5): page-cache state makes IO noisier. */
  val IoContendedRatio: Double = 2.0

  def ioExpected: Double = sys.env.get("SPARK_GRAFT_IO_SENTINEL_SEC")
    .map(_.toDouble).getOrElse(IoExpectedSec)

  private def ioOnce(): Double = {
    val dir = new java.io.File(
      s"${graft.queries.Scratch.baseDir}/graft-io-sentinel")
    dir.mkdirs()
    val f = new java.io.File(dir,
      s"probe-${java.util.UUID.randomUUID()}")
    val chunk = new Array[Byte](8 << 20)
    java.util.Arrays.fill(chunk, 0x5a.toByte)
    val t0 = System.nanoTime()
    try {
      val out = new java.io.FileOutputStream(f)
      try {
        var written = 0L
        while (written < IoBytes) {
          out.write(chunk); written += chunk.length
        }
        out.getFD.sync()
      } finally out.close()
      val in = new java.io.FileInputStream(f)
      try {
        var total = 0L
        var n = in.read(chunk)
        while (n > 0) { total += n; n = in.read(chunk) }
        require(total >= IoBytes, s"io probe short read: $total")
      } finally in.close()
      (System.nanoTime() - t0) / 1e9
    } finally f.delete() // also on failure: a leaked 256 MiB probe on
    // tmpfs permanently eats RAM and amplifies the next failure
  }

  /** Min of three passes after one untimed warm-up — same discipline
    * as [[measure]]. */
  def ioMeasure(): Double = {
    ioOnce()
    Seq.fill(3)(ioOnce()).min
  }
}
