package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}
import graft.Tables

/** Event-stream (batch view) queries over the events table. The fixture's
  * parquet ts column has shipped as TIMESTAMP(NANOS) (readable only as raw
  * int64 nanos via the nanosAsLong legacy conf) and as plain micros
  * TIMESTAMP / TIMESTAMP_NTZ, so the loader normalizes whatever dtype it
  * finds into one `ts_us` long column (microseconds since epoch) that all
  * queries key on — DuckDB mirrors via epoch_ns(ts)//1000, which accepts
  * both encodings. Streaming semantics (watermarks, windows, stateful
  * sessionization) over the same table live in graft.streaming and are
  * pinned by StreamingSpec.
  */
object EventsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Normalize the ts column to epoch-microseconds, whatever dtype the
    * fixture shipped: raw int64 nanos → exact integer division; (NTZ)
    * timestamps → unix_micros under the UTC session timezone. Fails loud
    * on anything else rather than silently mis-bucketing time. */
  private[queries] def tsMicros(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampType => unix_micros(col("ts"))
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported dtype $other; expected int64 nanos or a timestamp type")
    }

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = Tables.load(s, dir, "events")
    df.withColumn("ts_us", tsMicros(df))
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Per-micro-batch invariant asserts in the streaming lifecycle queries
    * (gold ≡ full recompute after EVERY batch). Default ON — specs and
    * the driver's Verify keep full validation — but the bench harness
    * turns them off for its TIMED passes (-Dgraft.lifecycle.asserts=off):
    * the assertion is a deliberate full-recompute per batch, so with it
    * on the headline "query time" mostly measures assertion cost, not
    * engine work. Bench records one assert-on run beside the timed
    * number so the delta stays in-artifact. */
  private[queries] def lifecycleAsserts: Boolean =
    !sys.props.get("graft.lifecycle.asserts").contains("off")

  /** daily event rollup: counts + exact value sums per (day, type). */
  val qEventsDaily: Q = (s, dir) => {
    events(s, dir)
      .withColumn("day",
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("day"), col("event_type"))
  }
  val qEventsDailySql: String =
    """SELECT strftime(make_timestamp(epoch_ns(ts)//1000), '%Y-%m-%d') AS day,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** JSON-ish property extraction (regexp both sides) + rollup. */
  val qEventsJson: Q = (s, dir) => {
    events(s, dir)
      .withColumn("k",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("k"))
  }
  val qEventsJsonSql: String =
    """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY k ORDER BY k""".stripMargin

  /** top users by total event value (engagement leaderboard). */
  val qEventsTopUsers: Q = (s, dir) => {
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(20)
  }
  val qEventsTopUsersSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id
      |ORDER BY total_value DESC, user_id LIMIT 20""".stripMargin

  /** per-user session count with a 30-minute inactivity gap, via window
    * functions (lag + conditional cumulative sum) — the batch formulation
    * of sessionization; the stateful streaming formulation is in
    * graft.streaming.Sessionize. */
  val qEventsSessions: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    events(s, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }
  val qEventsSessionsSql: String =
    """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, epoch_ns(ts)//1000 AS ts_us,
      |      lag(epoch_ns(ts)//1000) OVER
      |        (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000) AS prev_us
      |    FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Structured Streaming daily rollup, executed synchronously over the
    * events table via a memory sink in complete mode — the streaming
    * formulation must agree exactly with the batch oracle (same counts,
    * same exact decimal sums), which is precisely the cross-engine
    *"all consumers see the same data" contract of the reference. */
  /** Shared mechanics of every streaming oracle query in this file: run
    * one streaming transform over the events FILE stream synchronously
    * into a memory sink, materialize the (small) result, and drop the
    * sink view — it holds the aggregate in driver memory and would leak
    * per invocation. ONE definition: a fix to the sink/stop/cleanup
    * dance applies everywhere. `agg` builds the streaming frame from the
    * raw stream (the file source requires a directory — the sf dir is
    * glob-pinned to events.parquet); `present` shapes the sink table
    * into the final ordered, oracle-matching frame. */
  private def runStream(s: SparkSession, dir: String, label: String,
      mode: String = "complete")(agg: DataFrame => DataFrame)(
      present: DataFrame => DataFrame): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.load(s, dir, "events").schema
    val name = s"graft_stream_${label}_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val q = agg(raw).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    val resultDf = present(s.table(name))
    val rows = resultDf.collect()
    val outSchema = resultDf.schema
    s.catalog.dropTempView(name)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema)
  }

  val qStreamDaily: Q = (s, dir) => runStream(s, dir, "daily") { raw =>
    raw.withColumn("ets", timestamp_micros(tsMicros(raw)))
      .groupBy(window(col("ets"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
  } { sink =>
    sink.select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
      col("event_type"), col("n"), col("total_value"))
      .orderBy(col("day"), col("event_type"))
  }
  // identical to the batch daily rollup — that's the point
  val qStreamDailySql: String = qEventsDailySql

  /** KMV distinct sketches as STREAMING state: per event_type, the
    * distinct-user sketch accumulates across micro-batches (the
    * TypedImperativeAggregate's merge is associative/commutative, so
    * arbitrary micro-batching produces the identical sketch — the same
    * invariance the batch spec pins for partitioning). The oracle
    * rebuilds sketch AND estimate in SQL over the full table: streamed
    * approximate distinct-user counts must equal the batch sketch
    * bit-for-bit. k=64 < distinct users (150), so the ESTIMATOR path is
    * exercised, not the exact path. */
  val qStreamDistinct: Q = (s, dir) =>
    runStream(s, dir, "distinct") { raw =>
      import graft.functions.AggExpressions.kmv_distinct
      import graft.functions.HashExpressions.md5_hash64
      // explicit null filter: the sketch SKIPS null hashes while the
      // oracle's SELECT DISTINCT would keep a NULL row — align both
      // sides on "nulls don't count as a distinct user"
      raw.filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(kmv_distinct(md5_hash64(col("user_id").cast("string")), 64)
          .as("sk"))
    } { sink =>
      sink.select(col("event_type"),
        round(col("sk.est"), 4).as("users_est"),
        col("sk.n_tracked").as("n_tracked"))
        .orderBy(col("event_type"))
    }
  val qStreamDistinctSql: String =
    """WITH h AS (SELECT DISTINCT event_type AS g,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS hv
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (SELECT g, hv,
      |    row_number() OVER (PARTITION BY g ORDER BY hv) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS nd FROM h)
      |SELECT g AS event_type,
      |  round(CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
      |       ELSE 63.0 * (18446744073709551616.0 /
      |          CAST(MAX(CASE WHEN rn = 64 THEN hv END) AS DOUBLE)) END, 4)
      |    AS users_est,
      |  LEAST(MAX(nd), 64) AS n_tracked
      |FROM r GROUP BY g ORDER BY g""".stripMargin

  /** Stream-static join enrichment: the event stream joins a STATIC
    * dimension (customer segment) mid-stream, then aggregates — the
    * standard streaming-enrichment shape (Spark broadcasts or re-plans
    * the static side per micro-batch; at scale the dim is broadcast
    * when small or the stream pre-partitioned on the key). The oracle
    * is the batch join+rollup — the streamed result must equal it
    * exactly. */
  val qStreamEnrich: Q = (s, dir) =>
    runStream(s, dir, "enrich") { raw =>
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      raw.join(dim, raw("user_id") === dim("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total_value"))
    } { sink =>
      sink.select(col("c_mktsegment"), col("event_type"), col("n"),
        col("total_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    }
  val qStreamEnrichSql: String =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** STATEFUL streaming sessionization (flatMapGroupsWithState with
    * explicit cross-batch state — graft.streaming.Streaming.sessionize)
    * run synchronously over the events table. Append mode emits the
    * CLOSED sessions: every session except each user's final open one;
    * the oracle reconstructs exactly that set in SQL. Output columns
    * are integers only (boundaries + counts) — closure math is exact,
    * no float-order sensitivity. */
  val qStreamSessions: Q = (s, dir) =>
    runStream(s, dir, "sessions", mode = "append") { raw =>
      import s.implicits._
      graft.streaming.Streaming.sessionize(
        raw.select(col("user_id"), tsMicros(raw).as("ts_us"),
          col("value").cast("double").as("value"))
          .as[graft.streaming.Streaming.Event],
        30L * 60 * 1000000).toDF()
    } { sink =>
      sink.select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events").cast("long").as("n_events"))
        .orderBy(col("user_id"), col("start_us"))
    }
  val qStreamSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts)//1000 AS ts_us
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM (SELECT user_id, ts_us,
      |          lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
      |            AS prev
      |        FROM e)),
      |sx AS (
      |  SELECT user_id, ts_us,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m),
      |g AS (
      |  SELECT user_id, sid, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
      |    COUNT(*) AS n_events
      |  FROM sx GROUP BY user_id, sid)
      |SELECT user_id, start_us, end_us, n_events
      |FROM g
      |WHERE sid < (SELECT MAX(g2.sid) FROM g g2 WHERE g2.user_id = g.user_id)
      |ORDER BY user_id, start_us""".stripMargin

  /** Window frames + offsets per user: moving 3-event value sum (exact
    * decimal), previous/next event type. Unique order key = (ts, event_id). */
  val qEventsMoving: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // order at microsecond precision to match what DuckDB can see (it
    // truncates nanos at read time)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    events(s, dir)
      .withColumn("moving_sum",
        sum(dec(col("value"))).over(byUser.rowsBetween(-2, 0))
          .cast("double"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .select(col("event_id"), col("user_id"), col("moving_sum"),
        col("prev_type"), col("next_type"))
      .orderBy(col("event_id"))
  }
  val qEventsMovingSql: String =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
      |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events ORDER BY event_id""".stripMargin

  /** As-of join (composed, not a custom operator — the window formulation
    * expresses the semantics exactly, per the build's preference order):
    * for every event, the timestamp of that user's most recent signup at
    * or before it. Raw-nanos longs keep it integer-exact cross-engine. */
  val qAsofSignup: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // microsecond precision: DuckDB truncates TIMESTAMP_NANOS to micros at
    // READ time, so nano-exact values can never agree — floor to micros on
    // both sides (exact integer division)
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, dir)
      .withColumn("last_signup_us",
        max(when(col("event_type") === "signup", col("ts_us")))
          .over(byUser))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("last_signup_us"))
      .orderBy(col("event_id"))
  }
  val qAsofSignupSql: String =
    """SELECT event_id, user_id, event_type,
      |  MAX(CASE WHEN event_type = 'signup' THEN epoch_ns(ts)//1000 END) OVER
      |    (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
      |FROM events ORDER BY event_id""".stripMargin

  /** Ordered funnel: view → click-after-view → purchase-after-click per
    * user, each stage anchored at the min timestamp after the previous
    * stage (strict event-order semantics, not mere presence). Exact
    * timestamp mins + non-null counts — engine-exact. Scale shape:
    * three keyed aggregates + two broadcast-able user-level joins; no
    * window over the raw event stream. */
  val qFunnel: Q = (s, dir) => {
    // Cascaded-window form of the three-stage funnel: the per-stage
    // aggregate + join chain inlined each stage at every reference and
    // scanned events SIX times through ~17 exchanges
    // (plans/r16/q_funnel_before.txt). Each stage's bound is a per-user
    // min over rows the previous bound qualifies, so three stacked
    // full-partition window MINs over ONE user_id exchange compute the
    // identical cascade: v_ts = min view ts; c_ts = min click ts AFTER
    // v_ts (NULL v_ts nulls the comparison — exactly the inner join's
    // absence); p_ts likewise over c_ts. The final counts ignore NULLs,
    // matching the LEFT-JOIN counts (c ⊆ v and p ⊆ c by construction).
    // The DuckDB oracle still runs the join form — hash-checked equal.
    import org.apache.spark.sql.expressions.Window
    val events = Tables.load(s, dir, "events")
    val w = Window.partitionBy("user_id")
    val funnel = events.select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("v_ts",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c_ts",
        min(when(col("event_type") === "click" && col("ts") > col("v_ts"),
          col("ts"))).over(w))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") > col("c_ts"),
          col("ts"))).over(w))
      // window values are constant per user; max() just picks them while
      // reusing the window's partitioning (no extra exchange)
      .groupBy(col("user_id"))
      .agg(max(col("v_ts")).as("v_ts"), max(col("c_ts")).as("c_ts"),
        max(col("p_ts")).as("p_ts"))
    funnel.agg(count(col("v_ts")).as("n_view"),
      count(col("c_ts")).as("n_click"),
      count(col("p_ts")).as("n_purchase"))
  }
  val qFunnelSql: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
      |  JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
      |  JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
      |SELECT COUNT(v_ts) AS n_view, COUNT(c_ts) AS n_click,
      |  COUNT(p_ts) AS n_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  /** Retention cohort matrix: users cohorted by FIRST-event day, then
    * (cohort_day, day_offset) → distinct active users — the product-
    * analytics staple. Scale shape: the first-event aggregation hashes by
    * user_id and the activity join keys on the SAME column, so the
    * cohort side's exchange is reused (co-partitioned join, no second
    * shuffle of the big side); count(distinct user) partial-aggregates
    * map-side. No broadcast hint — at 100 TB the user dim is not
    * assumed small; AQE may still choose one at toy SF. */
  val qRetentionCohorts: Q = (s, dir) => {
    val ev = events(s, dir)
      .select(col("user_id"),
        to_date(timestamp_micros(col("ts_us"))).as("day"))
    val firsts = ev.groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"))
    ev.join(firsts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
      .orderBy("cohort_day", "day_offset")
  }
  val qRetentionCohortsSql: String =
    """WITH e AS (SELECT user_id,
      |    CAST(make_timestamp(epoch_ns(ts)//1000) AS DATE) AS day
      |  FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
      |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
      |  date_diff('day', f.cohort_day, e.day) AS day_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Watermarked STREAM-STREAM inner join (the conversion-attribution
    * shape): views and purchases are two watermarked streams (a
    * self-join of the event stream), joined on user with a time-range
    * condition `purchase within 1 hour of view`. The time bound is what
    * makes the join state FINITE — each side's watermark plus the range
    * lets Spark evict rows that can no longer match, the requirement
    * for an unbounded 100 TB stream. The oracle is the equivalent batch
    * self-join; streamed output must equal it exactly. */
  val qStreamJoin: Q = (s, dir) => runStream(s, dir, "join",
    mode = "append") { raw =>
    val e = raw.withColumn("ets", timestamp_micros(tsMicros(raw)))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ets").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ets").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    views.join(purchases, expr(
      "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"))
  } { sink =>
    sink.select(col("view_id"), col("purchase_id"),
      col("v_user").as("user_id"))
      .orderBy("view_id", "purchase_id")
  }
  val qStreamJoinSql: String =
    """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
      |FROM events v JOIN events p ON v.user_id = p.user_id
      |  AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |ORDER BY view_id, purchase_id""".stripMargin

  /** Watermarked STREAM-STREAM LEFT OUTER time-range join: the outer
    * variant of [[qStreamJoin]], exercising the eviction semantics the
    * inner join never does — an unmatched view may emit its null-padded
    * row ONLY once the watermark proves no future purchase can match
    * (v_ts + 1h < watermark); emitting earlier would retract on a late
    * match, and never emitting would hold state forever. The fixture is
    * finite, so the final windows would never close on their own: a
    * second micro-batch carries two far-future SENTINEL events (one per
    * side — the global watermark is the MIN across both inputs), pushing
    * the watermark past every real window so Spark's no-data trigger
    * flushes every unmatched view. Streamed output (sentinels filtered)
    * must then equal the batch left join EXACTLY — matched pairs AND
    * null rows. */
  val qStreamJoinOuter: Q = (s, dir) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), col("ts_us"))
    val raw = Scratch.dir("streamjoinouter-raw")
    val maxUs = ev0.agg(max(col("ts_us"))).collect()(0).getLong(0)
    import s.implicits._
    val sentinels = Seq(
      (-1L, -999L, "view", maxUs + 30L * 86400000000L),
      (-2L, -999L, "purchase", maxUs + 30L * 86400000000L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    // real events first, sentinels second; mtimes pinned so the file
    // source can never reorder the flush ahead of the data
    val rawDir = new java.io.File(raw)
    var seen = Set.empty[String]
    val t0 = System.currentTimeMillis() - 600000L
    Seq(ev0, sentinels).zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("append").parquet(raw)
      val files = rawDir.listFiles().filter(_.getName.endsWith(".parquet"))
      files.filterNot(f => seen(f.getName))
        .foreach(_.setLastModified(t0 + i * 60000L))
      seen ++= files.map(_.getName)
    }
    val schema = s.read.parquet(raw).schema
    val rawStream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(raw)
      .withColumn("ets", timestamp_micros(col("ts_us")))
    val views = rawStream.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ets").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "1 hour")
    val purchases = rawStream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ets").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases, expr(
      "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour"),
      "left_outer")
    val name = "graft_stream_join_outer_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Scratch.dir("streamjoinouter-ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val resultDf = s.table(name)
      .filter(col("view_id") >= 0) // sentinel flush rows are not output
      // unmatched views surface as -1, not NULL: a nullable numeric
      // column renders as mixed int/NaN across compare engines and
      // makes the row-sort hash fragile — the sentinel is unambiguous
      // (real event ids are non-negative)
      .select(col("view_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        col("v_user").as("user_id"))
      .orderBy("view_id", "purchase_id")
    val rows = resultDf.collect()
    val outSchema = resultDf.schema
    s.catalog.dropTempView(name)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema)
  }
  val qStreamJoinOuterSql: String =
    """SELECT v.event_id AS view_id,
      |  COALESCE(p.event_id, -1) AS purchase_id, v.user_id
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |ORDER BY view_id, purchase_id""".stripMargin

  /** Streaming bronze→gold composition ([[graft.streaming.Streaming
    * .graftRollupSink]]): events arrive as three micro-batches (one file
    * per trigger), each batch lands exactly-once in a bronze graft table
    * AND is folded into the gold per-type aggregate by incremental
    * rollup maintenance — the full always-on bronze→silver→gold story
    * the reference runs as checkpointed batch re-runs
    * (/root/reference/bronze-silver.py:219-321). The afterBatch hook
    * asserts gold == a full bronze recompute AFTER EVERY BATCH (the
    * invariant the final oracle alone can't see), and the step counter
    * proves the stream genuinely micro-batched. */
  val qStreamRollup: Q = (s, dir) => {
    import graft.table.GraftTable
    val ev = events(s, dir)
      .select(col("event_id"), col("event_type"),
        dec(col("value")).as("value_d"))
    val raw = Scratch.dir("streamroll-raw")
    Seq(0, 1, 2).foreach(m => ev.filter(col("event_id") % 3 === m)
      .coalesce(1).write.mode("append").parquet(raw))
    val bronzeLoc = Scratch.dir("streamroll-bronze")
    val goldLoc = Scratch.dir("streamroll-gold")
    val schema = s.read.parquet(raw).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(raw)
    val steps = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.Streaming.graftRollupSink(stream,
      bronzeLoc, goldLoc, "stroll", Seq("event_type"), Seq("value_d"),
      afterBatch = (bronze, gold) => {
        val step = steps.incrementAndGet()
        if (lifecycleAsserts) {
          val want = bronze.read().groupBy("event_type")
            .agg(sum(col("value_d")).as("value_d_sum"),
              count(lit(1)).as("n"))
            .orderBy("event_type").collect().toSeq
          val got = gold.read()
            .select("event_type", "value_d_sum", "n")
            .orderBy("event_type").collect().toSeq
          require(got == want,
            s"gold != bronze recompute after micro-batch $step")
        }
      })
      .option("checkpointLocation", Scratch.dir("streamroll-ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    require(steps.get() >= 3,
      s"expected >= 3 micro-batches, saw ${steps.get()}")
    GraftTable(s, goldLoc).read()
      .select(col("event_type"),
        col("value_d_sum").cast("double").as("value_sum"), col("n"))
      .orderBy("event_type")
  }
  val qStreamRollupSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Streaming bronze→silver MERGE ([[graft.streaming.Streaming
    * .graftMergeSink]]): the reference's keyed CDC upsert
    * (/root/reference/bronze-silver.py:249-286) as an always-on stream.
    * Events arrive as three MICRO-BATCHES in event_id order (the merge
    * order key — WHEN MATCHED replaces unconditionally, so arrival
    * order must follow it, exactly like the reference's checkpointed
    * sequential re-runs); each batch is window-deduped keep-latest per
    * user and MOR-merged into silver with the exactly-once txn stamp.
    * 'purchase' events ride the CDC delete branch (op='D'). Final
    * silver state = per user the globally-latest event — absent if that
    * event was a delete — which is exactly what the SQL oracle
    * reconstructs in one window pass. */
  val qStreamMerge: Q = (s, dir) => {
    import graft.table.GraftTable
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        dec(col("value")).as("value_d"))
    val raw = Scratch.dir("streammerge-raw")
    val nmax = ev.agg(max(col("event_id"))).collect()(0).getLong(0)
    val c1 = nmax / 3; val c2 = 2 * nmax / 3
    val chunks = Seq(col("event_id") <= c1,
      col("event_id") > c1 && col("event_id") <= c2,
      col("event_id") > c2)
    // one file per chunk; mtimes pinned ascending so the file source
    // (which orders by modification time) can never reorder two chunks
    // written within the same clock tick
    val rawDir = new java.io.File(raw)
    var seen = Set.empty[String]
    val t0 = System.currentTimeMillis() - 600000L
    chunks.zipWithIndex.foreach { case (p, i) =>
      ev.filter(p).coalesce(1).write.mode("append").parquet(raw)
      val files = rawDir.listFiles().filter(_.getName.endsWith(".parquet"))
      files.filterNot(f => seen(f.getName))
        .foreach(_.setLastModified(t0 + i * 60000L))
      seen ++= files.map(_.getName)
    }
    val silverLoc = Scratch.dir("streammerge-silver")
    val schema = s.read.parquet(raw).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(raw)
      .withColumn("__op",
        when(col("event_type") === "purchase", lit("D")))
    val steps = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.Streaming.graftMergeSink(stream, silverLoc,
      "smerge", keys = Seq("user_id"), dedupKey = Seq("user_id"),
      orderCol = "event_id", opCol = Some("__op"),
      afterBatch = _ => steps.incrementAndGet())
      .option("checkpointLocation", Scratch.dir("streammerge-ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    require(steps.get() >= 3,
      s"expected >= 3 micro-batches, saw ${steps.get()}")
    GraftTable(s, silverLoc).read()
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value_d").cast("double").as("value"))
      .orderBy("user_id")
  }
  val qStreamMergeSql: String =
    """WITH latest AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id, event_type, value
      |FROM latest WHERE rn = 1 AND event_type <> 'purchase'
      |ORDER BY user_id""".stripMargin

  /** The COMPLETE always-on medallion ([[graft.streaming.Streaming
    * .graftMedallionSink]]): events stream in three event-id-ordered
    * micro-batches; each batch lands RAW in bronze (txn-stamped), merges
    * keep-latest into silver (MOR, purchases ride the CDC delete
    * branch), and gold's per-type aggregate folds SILVER's changelog —
    * inserts AND the merge's retractions — via incremental rollup
    * maintenance. The afterBatch hook asserts gold ≡ a silver recompute
    * after EVERY batch (the invariant the final oracle can't see);
    * bronze must hold every raw row. Final gold = per-type count + sum
    * over each user's globally-latest non-deleted event — exactly what
    * the SQL oracle reconstructs. */
  val qStreamPipeline: Q = (s, dir) => {
    import graft.table.GraftTable
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        dec(col("value")).as("value_d"))
    val raw = Scratch.dir("streampipe-raw")
    val nmax = ev.agg(max(col("event_id"))).collect()(0).getLong(0)
    val c1 = nmax / 3; val c2 = 2 * nmax / 3
    val chunks = Seq(col("event_id") <= c1,
      col("event_id") > c1 && col("event_id") <= c2,
      col("event_id") > c2)
    val rawDir = new java.io.File(raw)
    var seen = Set.empty[String]
    val t0 = System.currentTimeMillis() - 600000L
    chunks.zipWithIndex.foreach { case (p, i) =>
      ev.filter(p).coalesce(1).write.mode("append").parquet(raw)
      val files = rawDir.listFiles().filter(_.getName.endsWith(".parquet"))
      files.filterNot(f => seen(f.getName))
        .foreach(_.setLastModified(t0 + i * 60000L))
      seen ++= files.map(_.getName)
    }
    val bronzeLoc = Scratch.dir("streampipe-bronze")
    val silverLoc = Scratch.dir("streampipe-silver")
    val goldLoc = Scratch.dir("streampipe-gold")
    val schema = s.read.parquet(raw).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet")
      .parquet(raw)
      .withColumn("__op",
        when(col("event_type") === "purchase", lit("D")))
    val steps = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = graft.streaming.Streaming.graftMedallionSink(stream,
      bronzeLoc, silverLoc, goldLoc, "spipe",
      keys = Seq("user_id"), dedupKey = Seq("user_id"),
      orderCol = "event_id", rollupKeys = Seq("event_type"),
      sumCols = Seq("value_d"), opCol = Some("__op"),
      afterBatch = (bronze, silver, gold) => {
        steps.incrementAndGet()
        if (lifecycleAsserts) {
          val want = silver.read().groupBy("event_type")
            .agg(sum(col("value_d")).as("value_d_sum"),
              count(lit(1)).as("n"))
            .orderBy("event_type").collect().toSeq
          val got = gold.read()
            .select("event_type", "value_d_sum", "n")
            .orderBy("event_type").collect().toSeq
          require(got == want,
            s"gold != silver recompute after micro-batch ${steps.get()}")
        }
      })
      .option("checkpointLocation", Scratch.dir("streampipe-ckpt"))
      .start()
    try q.processAllAvailable() finally q.stop()
    require(steps.get() >= 3,
      s"expected >= 3 micro-batches, saw ${steps.get()}")
    // bronze holds the COMPLETE raw history
    require(GraftTable(s, bronzeLoc).read().count() ==
      ev.count(), "bronze lost raw rows")
    GraftTable(s, goldLoc).read()
      .select(col("event_type"),
        col("value_d_sum").cast("double").as("value_sum"), col("n"))
      .orderBy("event_type")
  }
  val qStreamPipelineSql: String =
    """WITH latest AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(value AS DECIMAL(18,2)) AS value_d,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY event_id DESC) AS rn
      |  FROM events)
      |SELECT event_type,
      |  CAST(SUM(value_d) AS DOUBLE) AS value_sum,
      |  COUNT(*) AS n
      |FROM latest WHERE rn = 1 AND event_type <> 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_stream_pipeline", qStreamPipeline, Some(qStreamPipelineSql)),
    ("q_stream_merge", qStreamMerge, Some(qStreamMergeSql)),
    ("q_stream_join", qStreamJoin, Some(qStreamJoinSql)),
    ("q_stream_join_outer", qStreamJoinOuter, Some(qStreamJoinOuterSql)),
    ("q_stream_rollup", qStreamRollup, Some(qStreamRollupSql)),
    ("q_retention_cohorts", qRetentionCohorts, Some(qRetentionCohortsSql)),
    ("q_asof_signup", qAsofSignup, Some(qAsofSignupSql)),
    ("q_funnel", qFunnel, Some(qFunnelSql)),
    ("q_events_moving", qEventsMoving, Some(qEventsMovingSql)),
    ("q_stream_daily", qStreamDaily, Some(qStreamDailySql)),
    ("q_stream_enrich", qStreamEnrich, Some(qStreamEnrichSql)),
    ("q_stream_distinct", qStreamDistinct, Some(qStreamDistinctSql)),
    ("q_stream_sessions", qStreamSessions, Some(qStreamSessionsSql)),
    ("q_events_daily", qEventsDaily, Some(qEventsDailySql)),
    ("q_events_json", qEventsJson, Some(qEventsJsonSql)),
    ("q_events_top_users", qEventsTopUsers, Some(qEventsTopUsersSql)),
    ("q_events_sessions", qEventsSessions, Some(qEventsSessionsSql)),
  )
}
