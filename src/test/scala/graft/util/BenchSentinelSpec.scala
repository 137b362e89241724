package graft.util

import graft.SparkSpec

/** The contention sentinel must produce a usable measurement (the
  * artifact gate keys on it) and expose the host's loadavg. The
  * committed ExpectedSec is machine-calibrated, so the spec checks
  * shape, not the absolute value. */
class BenchSentinelSpec extends SparkSpec {

  test("sentinel measures a positive CPU-bound time and reads loadavg") {
    val sec = BenchSentinel.measure(spark, cpus = 4)
    assert(sec > 0.0 && sec < 120.0, s"sentinel sec = $sec")
    val la = BenchSentinel.loadavg
    assert(la == "unavailable" || la.split("\\s+").length >= 3, la)
  }

  test("expected time honors the env override contract") {
    // no env set in tests → the committed constant
    if (!sys.env.contains("SPARK_GRAFT_SENTINEL_SEC"))
      assert(BenchSentinel.expected === BenchSentinel.ExpectedSec)
    assert(BenchSentinel.ExpectedSec > 0.0)
    assert(BenchSentinel.ContendedRatio > 1.0)
  }
}
