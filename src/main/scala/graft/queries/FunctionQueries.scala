package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scalar-function and relational-algebra surface queries: pivot,
  * set operations, string functions, JSON extraction — each mirrored
  * exactly in DuckDB SQL. */
object FunctionQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** PIVOT: quantity sums by returnflag × linestatus as columns. */
  val qPivot: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec($"l_quantity")).cast("double"))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy($"l_returnflag")
  }
  val qPivotSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_f,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set operations: customers with 1997 orders vs customers with
    * finished ('F') orders — INTERSECT and EXCEPT, tagged and unioned. */
  val qSetOps: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val in97 = ord.filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_custkey")
    val finished = ord.filter($"o_orderstatus" === "F").select($"o_custkey")
    in97.intersect(finished).withColumn("tag", lit("both"))
      .unionByName(in97.except(finished).withColumn("tag", lit("only_1997")))
      .orderBy($"tag", $"o_custkey")
  }
  val qSetOpsSql: String =
    """WITH in97 AS (SELECT o_custkey FROM orders
      |              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |     fin AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM in97 INTERSECT SELECT * FROM fin)
      |UNION ALL
      |SELECT o_custkey, 'only_1997' AS tag FROM (SELECT * FROM in97 EXCEPT SELECT * FROM fin)
      |ORDER BY tag, o_custkey""".stripMargin

  /** String-function sweep over part names. */
  val qStringFuncs: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "part")
      .select($"p_partkey",
        upper($"p_name").as("uname"),
        substring($"p_name", 1, 5).as("prefix"),
        regexp_replace($"p_name", "a", "@").as("subst"),
        length($"p_name").cast("long").as("len"),
        lpad($"p_brand", 12, "_").as("padded"),
        concat_ws("|", $"p_brand", $"p_type").as("joined"),
        reverse($"p_name").as("rname"),
        instr($"p_name", "o").cast("long").as("first_o"))
      .orderBy($"p_partkey")
  }
  val qStringFuncsSql: String =
    """SELECT p_partkey, upper(p_name) AS uname,
      |  substring(p_name, 1, 5) AS prefix,
      |  regexp_replace(p_name, 'a', '@', 'g') AS subst,
      |  length(p_name) AS len,
      |  lpad(p_brand, 12, '_') AS padded,
      |  concat_ws('|', p_brand, p_type) AS joined,
      |  reverse(p_name) AS rname,
      |  strpos(p_name, 'o') AS first_o
      |FROM part ORDER BY p_partkey""".stripMargin

  /** JSON extraction via real JSON parsing on both sides. */
  val qJsonExtract: Q = (s, dir) => {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.load(s, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .orderBy($"event_id")
  }
  val qJsonExtractSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** Misra-Gries heavy hitters, oracled by its GUARANTEE rather than its
    * merge-order-dependent raw counts: over a deterministically skewed
    * item column (half the mass on 5 heavy items, the rest spread over
    * ~250 light ones, so decrements genuinely fire at k=15), every item
    * with true count > n/(k+1) must be retained with an estimate in
    * [true − n/(k+1), true]. Both engines compute the EXACT counts and
    * the threshold; the sketch's obligations reduce to two booleans that
    * are constant-true iff the guarantee holds — any violation
    * hash-mismatches against the oracle's literal TRUEs. */
  val qHeavyHitters: Q = (s, dir) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val k = 15
    val ev = Tables.load(s, dir, "events")
      .select(when(col("user_id") % 2 === 0, col("event_type"))
        .otherwise(concat(col("event_type"), lit("_"),
          (col("user_id") % 50).cast("string"))).as("item"))
    val thresh = ev.count() / (k + 1) // bounded: one scalar
    val hh = ev.agg(graft.functions.AggExpressions
        .heavy_hitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("est"))
    ev.groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
      .filter(col("exact_cnt") > lit(thresh))
      .join(hh, Seq("item"), "left")
      .select(col("item"), col("exact_cnt"),
        col("est").isNotNull.as("retained"),
        (col("est").isNotNull && col("est") <= col("exact_cnt") &&
          col("exact_cnt") - col("est") <= lit(thresh)).as("within_bound"))
      .orderBy(col("item"))
  }
  val qHeavyHittersSql: String =
    """WITH it AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN event_type
      |    ELSE event_type || '_' || CAST(user_id % 50 AS VARCHAR) END AS item
      |  FROM events),
      |tot AS (SELECT count(*) // 16 AS thresh FROM it),
      |ex AS (SELECT item, count(*) AS exact_cnt FROM it GROUP BY 1)
      |SELECT item, exact_cnt, TRUE AS retained, TRUE AS within_bound
      |FROM ex CROSS JOIN tot WHERE exact_cnt > thresh
      |ORDER BY item""".stripMargin

  /** Window-function breadth: ntile / percent_rank / cume_dist /
    * nth_value over per-customer order sequences — the ranking-family
    * sweep beyond row_number/rank. percent_rank and cume_dist are exact
    * rational doubles (one IEEE division of identical small-int
    * operands in both engines). */
  val qWindowBreadth: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    val wAll = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, dir, "orders").filter($"o_custkey" < 20)
      .select($"o_custkey", $"o_orderkey",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value($"o_orderkey", 2).over(wAll).as("second_order"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val qWindowBreadthSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  CAST(nth_value(o_orderkey, 2) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS BIGINT) AS second_order
      |FROM orders WHERE o_custkey < 20
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** CUBE aggregation: every grouping-set combination of (returnflag,
    * linestatus) incl. both subtotals and the grand total — the
    * grouping-sets companion to q_rollup's ROLLUP. */
  val qCube: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_quantity")).cast("double").as("qty"),
        count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"),
        $"qty", $"n")
      .orderBy($"rf", $"ls")
  }
  val qCubeSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** Temporal-function sweep: month truncation/end, quarter, day name,
    * calendar month arithmetic, day deltas — every output a string or
    * exact integer (timestamps never cross the engine boundary raw). */
  val qDateFuncs: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders").filter($"o_orderkey" < 200)
      .select($"o_orderkey",
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd")
          .as("month_start"),
        date_format(last_day($"o_orderdate"), "yyyy-MM-dd")
          .as("month_end"),
        quarter($"o_orderdate").cast("long").as("qtr"),
        date_format($"o_orderdate", "EEEE").as("day_name"),
        date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd")
          .as("plus3m"),
        datediff($"o_orderdate", lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"))
      .orderBy($"o_orderkey")
  }
  val qDateFuncsSql: String =
    """SELECT o_orderkey,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
      |    AS month_start,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
      |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
      |  strftime(o_orderdate, '%A') AS day_name,
      |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
      |  CAST(date_diff('day', DATE '1995-01-01',
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
      |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin

  /** Array/higher-order-function sweep over quantized embeddings:
    * size / array_max / array_min / slice-aggregate /
    * filter-aggregate / array_contains — all exact integer math. */
  val qArrayFuncs: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "embeddings").filter($"vec_id" < 50)
      .select($"vec_id",
        graft.functions.VectorFunctions.quantize($"embedding").as("qv"))
      .select($"vec_id",
        size($"qv").cast("long").as("dim"),
        array_max($"qv").as("mx"),
        array_min($"qv").as("mn"),
        aggregate(slice($"qv", 1, 8), lit(0L), (a, x) => a + x)
          .as("head_sum"),
        aggregate(filter($"qv", _ > 0L), lit(0L), (a, x) => a + x)
          .as("pos_sum"),
        array_contains($"qv", 0L).as("has_zero"))
      .orderBy($"vec_id")
  }
  val qArrayFuncsSql: String =
    """WITH e AS (SELECT vec_id,
      |  list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings WHERE vec_id < 50)
      |SELECT vec_id, len(qv) AS dim,
      |  CAST(list_max(qv) AS BIGINT) AS mx,
      |  CAST(list_min(qv) AS BIGINT) AS mn,
      |  CAST(list_sum(qv[1:8]) AS BIGINT) AS head_sum,
      |  CAST(list_sum(list_filter(qv, x -> x > 0)) AS BIGINT) AS pos_sum,
      |  list_contains(qv, 0) AS has_zero
      |FROM e ORDER BY vec_id""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_date_funcs", qDateFuncs, Some(qDateFuncsSql)),
    ("q_array_funcs", qArrayFuncs, Some(qArrayFuncsSql)),
    ("q_window_breadth", qWindowBreadth, Some(qWindowBreadthSql)),
    ("q_cube", qCube, Some(qCubeSql)),
    ("q_pivot", qPivot, Some(qPivotSql)),
    ("q_set_ops", qSetOps, Some(qSetOpsSql)),
    ("q_string_funcs", qStringFuncs, Some(qStringFuncsSql)),
    ("q_json_extract", qJsonExtract, Some(qJsonExtractSql)),
    ("q_heavy_hitters", qHeavyHitters, Some(qHeavyHittersSql)),
  )
}
