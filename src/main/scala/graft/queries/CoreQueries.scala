package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Reference-surface queries (SURVEY.md §2) expressed over the driver test
  * tables, each paired with an ANSI-SQL oracle for DuckDB.
  *
  * Numeric-parity discipline: every aggregated double goes through
  * DECIMAL(18,2) (exact arithmetic, identical in Spark and DuckDB) and is
  * cast back to double at the end — both engines then produce bit-identical
  * values regardless of summation order (safe while sum*10^scale < 2^53).
  * Temporal outputs are strings/dates, never raw timestamps, so writer
  * timestamp-encoding differences can't cause oracle mismatches.
  *
  * Scale notes (100 TB): aggregations are partial (map-side combine) by
  * construction of groupBy/agg; dimension joins broadcast the small side;
  * window dedup shuffles once on its partition key. AQE handles skew.
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  type Q = (SparkSession, String) => DataFrame

  /** A1/P2 analogue of TPC-H Q1: pricing summary with exact decimal sums.
    * Mirrors the reference's only aggregate surface (COUNT over tables,
    * /root/reference/README.md:123-125) widened to a full groupBy/agg. */
  val q1Agg: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dec(sum(dec($"l_quantity"))).cast("double").as("sum_qty"),
        dec(sum(dec($"l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** A1: COUNT(*) readback — the reference's cross-engine invariant check
    * (/root/reference/README.md:121-126). */
  val qCount: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem").agg(count(lit(1)).as("n_lineitem"))
    val o = Tables.load(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
    val c = Tables.load(s, dir, "customer").agg(count(lit(1)).as("n_customer"))
    li.crossJoin(o).crossJoin(c)
  }
  val qCountSql: String =
    """SELECT (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
      |       (SELECT COUNT(*) FROM orders)   AS n_orders,
      |       (SELECT COUNT(*) FROM customer) AS n_customer""".stripMargin

  /** P1–P5: star projection + derived columns + conjunctive numeric filter —
    * the reference's ingest enrichment SQL (/root/reference/raw-bronze.py:207-217)
    * re-expressed over lineitem. Derived partition-date string = P5. */
  val qFilterProject: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_quantity" > 0 && $"l_extendedprice" > 0 &&
        $"l_discount" >= lit(0.05))
      .select(
        $"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice",
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_date"),
        (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double").as("revenue"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val qFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_quantity > 0 AND l_extendedprice > 0 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** W1/W2: ROW_NUMBER dedup, keep-latest-per-key — the reference's CDC dedup
    * (/root/reference/bronze-silver.py:254-261) over orders
    * (latest order per customer; o_orderkey DESC tiebreak for determinism). */
  val qWindowDedup: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.load(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .select($"o_custkey", $"o_orderkey", $"o_orderstatus", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
      .orderBy($"o_custkey")
  }
  val qWindowDedupSql: String =
    """SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** J1: MERGE INTO as anti-join + union (the COW upsert rewrite of
    * /root/reference/bronze-silver.py:249-286). Target = even-partkey rows,
    * source = even-suppkey rows, key = (l_orderkey, l_linenumber); matched
    * rows are fully replaced by source (WHEN MATCHED → UPDATE all columns),
    * unmatched source rows inserted. origin marks update-vs-keep lineage. */
  val qMergeUpsert: Q = (s, dir) => {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val cols = Seq($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
      $"l_quantity")
    val target = li.filter($"l_partkey" % 2 === 0).select(cols: _*)
    val source = li.filter($"l_suppkey" % 2 === 0).select(cols: _*)
    val kept = target.join(source, Seq("l_orderkey", "l_linenumber"),
      "left_anti").withColumn("origin", lit("kept"))
    kept.unionByName(source.withColumn("origin", lit("merged")))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  val qMergeUpsertSql: String =
    """WITH target AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
      |                FROM lineitem WHERE l_partkey % 2 = 0),
      |     source AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
      |                FROM lineitem WHERE l_suppkey % 2 = 0)
      |SELECT t.*, 'kept' AS origin FROM target t
      |WHERE NOT EXISTS (SELECT 1 FROM source s
      |                  WHERE s.l_orderkey = t.l_orderkey AND s.l_linenumber = t.l_linenumber)
      |UNION ALL
      |SELECT s.*, 'merged' AS origin FROM source s
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** O1: ORDER BY ts DESC LIMIT 1 — latest-snapshot selection pattern
    * (/root/reference/bronze-silver.py:133-138), key tiebreak for determinism. */
  val qTopk: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      .limit(1)
      .select($"o_orderkey", $"o_custkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
  }
  val qTopkSql: String =
    """SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin

  /** Multi-way dimension join with broadcast (consumer readback widened):
    * revenue per nation/region. nation+region are tiny → broadcast; the fact
    * table never shuffles for the dim joins (scale-critical at 100 TB). */
  val qJoinEnrich: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
    val nat = broadcast(Tables.load(s, dir, "nation"))
    val reg = broadcast(Tables.load(s, dir, "region"))
    val ord = Tables.load(s, dir, "orders")
    ord.join(cust, $"o_custkey" === $"c_custkey")
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("total_price"))
      .orderBy($"r_name", $"n_name")
  }
  val qJoinEnrichSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** TPC-H Q3 adapted (shipping priority): top-10 orders by revenue. */
  val q3Shipping: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_orderpriority")
      .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  val q3ShippingSql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 adapted (local supplier volume): revenue per nation in ASIA,
    * customer and supplier in the same nation. */
  val q5LocalSupplier: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val nat = broadcast(Tables.load(s, dir, "nation"))
    val reg = broadcast(Tables.load(s, dir, "region").filter($"r_name" === "ASIA"))
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(nat, $"s_nationkey" === $"n_nationkey")
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 (forecast revenue change): pure scan+filter+sum — the query
    * whose plan must show parquet predicate pushdown. */
  val q6Forecast: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        dec($"l_discount").between(lit(0.05).cast(DecimalType(18, 2)),
          lit(0.07).cast(DecimalType(18, 2))) &&
        $"l_quantity" < 24)
      .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
        .cast("double").as("revenue"))
  }
  val q6ForecastSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10 adapted (returned items): top-20 customers by lost revenue. */
  val q10Returned: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
    val nat = broadcast(Tables.load(s, dir, "nation"))
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem").filter($"l_returnflag" === "R")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }
  val q10ReturnedSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q4 adapted (order priority with EXISTS): left-semi join —
    * orders having at least one line shipped after the order date. */
  val q4Semi: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem")
    ord.join(li, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }
  val q4SemiSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** ROLLUP aggregation (subtotals + grand total); group keys coalesced to
    * 'ALL' so no NULL-ordering ambiguity reaches the oracle compare. */
  val qRollup: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(dec($"l_quantity")).cast("double").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }
  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** DISTINCT aggregates: exact distinct counts per group. */
  val qCountDistinct: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }
  val qCountDistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** LEFT ANTI join (NOT EXISTS): customers with no orders in a window. */
  val qAntiJoin: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
    Tables.load(s, dir, "customer")
      .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_inactive"))
      .orderBy($"c_mktsegment")
  }
  val qAntiJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_inactive
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** null-handling scalar functions: nullif / coalesce / conditional. */
  val qNullFuncs: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .select($"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("status_or_null"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_label"),
        when($"o_totalprice" > 100000, lit("big"))
          .when($"o_totalprice" > 10000, lit("mid"))
          .otherwise(lit("small")).as("bucket"))
      .orderBy($"o_orderkey")
  }
  val qNullFuncsSql: String =
    """SELECT o_orderkey,
      |  nullif(o_orderstatus, 'O') AS status_or_null,
      |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
      |  CASE WHEN o_totalprice > 100000 THEN 'big'
      |       WHEN o_totalprice > 10000 THEN 'mid'
      |       ELSE 'small' END AS bucket
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** name -> (query, Some(oracleSql)) */
  /** TPC-H Q7 (volume shipping): bidirectional two-nation trade volume
    * by ship year. Both nation dims and the supplier dim broadcast; the
    * only big-side shuffles are lineitem↔orders↔customer on their keys.
    * The nation-pair filter reaches the joins before the aggregate. */
  val q7Volume: Q = (s, dir) => {
    import s.implicits._
    val n1 = broadcast(Tables.load(s, dir, "nation")
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation")))
    val n2 = broadcast(Tables.load(s, dir, "nation")
      .select($"n_nationkey".as("c_nkey"), $"n_name".as("cust_nation")))
    Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.load(s, dir, "supplier")),
        $"l_suppkey" === $"s_suppkey")
      .join(n1, $"s_nationkey" === $"s_nkey")
      .join(n2, $"c_nationkey" === $"c_nkey")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
        ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }
  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 (national market share): NATION_3's share of ASIA-customer
    * ECONOMY-part revenue per order year. The share divides two decimal
    * sums as doubles — the same expression both engines evaluate. */
  val q8MarketShare: Q = (s, dir) => {
    import s.implicits._
    val vol = dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
    Tables.load(s, dir, "lineitem")
      .join(broadcast(Tables.load(s, dir, "part")
        .filter($"p_type" === "ECONOMY")), $"l_partkey" === $"p_partkey")
      .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.load(s, dir, "nation")
        .select($"n_nationkey".as("c_nkey"), $"n_regionkey")),
        $"c_nationkey" === $"c_nkey")
      .join(broadcast(Tables.load(s, dir, "region")
        .filter($"r_name" === "ASIA")), $"n_regionkey" === $"r_regionkey")
      .join(broadcast(Tables.load(s, dir, "supplier")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.load(s, dir, "nation")
        .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"s_nkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        (sum(when($"supp_nation" === "NATION_3", vol)
          .otherwise(dec(lit(0)))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
      .orderBy($"o_year")
  }
  val q8MarketShareSql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q14 (promotion effect): PROMO-part revenue share of a ship
    * year, as a single-row percentage. */
  val q14Promo: Q = (s, dir) => {
    import s.implicits._
    val vol = dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
    Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.load(s, dir, "part")),
        $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) *
        sum(when($"p_type" === "PROMO", vol).otherwise(dec(lit(0))))
          .cast("double") /
        sum(vol).cast("double")).as("promo_revenue"))
  }
  val q14PromoSql: String =
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin

  /** Running total per customer (cumulative window sum over decimal,
    * unique (date, key) order so RANGE ≡ ROWS in every engine). The
    * window partitions by customer — each partition's state is local,
    * nothing global sorts. */
  val qRunningTotal: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    Tables.load(s, dir, "orders")
      .filter($"o_custkey" < 100)
      .withColumn("cum_spend",
        sum(dec($"o_totalprice")).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"cum_spend")
      .orderBy($"o_custkey", $"o_orderkey")
  }
  val qRunningTotalSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |    AS DOUBLE) AS cum_spend
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Top-3 orders per priority (rank-in-group window; per-group state
    * only, deterministic orderkey tie-break). */
  val qRankInGroup: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.load(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
  }
  val qRankInGroupSql: String =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue): correlated-aggregate
    * shape — per-part average quantity re-joined against the fact. The
    * per-part aggregate and the probe join share the l_partkey hash, so
    * the aggregate side's exchange is reused; the brand dim broadcasts.
    * l_quantity carries integral doubles, so AVG is an exact integer
    * sum over an exact count — deterministic in every engine. */
  val q17SmallQty: Q = (s, dir) => {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val avgQ = li.groupBy($"l_partkey".as("pk"))
      .agg((lit(0.2) * avg($"l_quantity")).as("threshold"))
    li.join(broadcast(Tables.load(s, dir, "part")
        .filter($"p_brand" === "Brand#9")), $"l_partkey" === $"p_partkey")
      .join(avgQ, $"l_partkey" === $"pk")
      .filter($"l_quantity" < $"threshold")
      .agg((sum(dec($"l_extendedprice")).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }
  val q17SmallQtySql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#9'
      |JOIN (SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS threshold
      |      FROM lineitem GROUP BY 1) a ON l_partkey = a.pk
      |WHERE l_quantity < threshold""".stripMargin

  /** TPC-H Q18 (large-volume orders): HAVING-filtered fact aggregate
    * joined back to its dimensions, top-100. The orderkey aggregate and
    * the orders join share the key hash. */
  val q18LargeOrders: Q = (s, dir) => {
    import s.implicits._
    val big = Tables.load(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 300.0)
    Tables.load(s, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }
  val q18LargeOrdersSql: String =
    """SELECT c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      |      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300.0) b
      |  ON o_orderkey = b.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** KMV (bottom-k) distinct-count sketch per group — approximate
    * COUNT(DISTINCT) with O(k) mergeable state instead of a full
    * distinct shuffle (the 100 TB shape), yet ORACLE-EXACT: the hash is
    * the md5-prefix UBIGINT any engine reproduces, the sketch state is
    * the k unsigned-smallest distinct hashes, and the estimate is one
    * correctly-rounded conversion + one IEEE division — DuckDB rebuilds
    * the identical sketch in SQL and must produce the identical doubles.
    */
  val qDistinctSketch: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.HashExpressions.md5_hash64
    import graft.functions.AggExpressions.kmv_distinct
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        kmv_distinct(md5_hash64($"l_orderkey".cast("string")), 512)
          .as("sk_o"),
        kmv_distinct(md5_hash64($"l_partkey".cast("string")), 512)
          .as("sk_p"))
      .select($"l_returnflag",
        round($"sk_o.est", 4).as("orderkeys_est"),
        $"sk_o.n_tracked".as("o_tracked"),
        round($"sk_p.est", 4).as("partkeys_est"),
        $"sk_p.n_tracked".as("p_tracked"))
      .orderBy($"l_returnflag")
  }
  val qDistinctSketchSql: String =
    """WITH ho AS (SELECT DISTINCT l_returnflag AS g,
      |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 16))::UBIGINT AS hv
      |  FROM lineitem WHERE l_orderkey IS NOT NULL),
      |ro AS (SELECT g, hv,
      |    row_number() OVER (PARTITION BY g ORDER BY hv) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS nd FROM ho),
      |eo AS (SELECT g,
      |    CASE WHEN MAX(nd) < 512 THEN CAST(MAX(nd) AS DOUBLE)
      |         ELSE 511.0 * (18446744073709551616.0 /
      |            CAST(MAX(CASE WHEN rn = 512 THEN hv END) AS DOUBLE)) END
      |      AS est,
      |    LEAST(MAX(nd), 512) AS n_tracked
      |  FROM ro GROUP BY g),
      |hp AS (SELECT DISTINCT l_returnflag AS g,
      |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 16))::UBIGINT AS hv
      |  FROM lineitem WHERE l_partkey IS NOT NULL),
      |rp AS (SELECT g, hv,
      |    row_number() OVER (PARTITION BY g ORDER BY hv) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS nd FROM hp),
      |ep AS (SELECT g,
      |    CASE WHEN MAX(nd) < 512 THEN CAST(MAX(nd) AS DOUBLE)
      |         ELSE 511.0 * (18446744073709551616.0 /
      |            CAST(MAX(CASE WHEN rn = 512 THEN hv END) AS DOUBLE)) END
      |      AS est,
      |    LEAST(MAX(nd), 512) AS n_tracked
      |  FROM rp GROUP BY g)
      |SELECT eo.g AS l_returnflag,
      |  round(eo.est, 4) AS orderkeys_est, eo.n_tracked AS o_tracked,
      |  round(ep.est, 4) AS partkeys_est, ep.n_tracked AS p_tracked
      |FROM eo JOIN ep ON eo.g = ep.g ORDER BY eo.g""".stripMargin

  /** TPC-H Q13 (customer order-count distribution): left-outer join with
    * a predicate ON THE JOIN (not a post-filter — customers with only
    * urgent orders must still count as zero), then a second aggregate
    * over the first's result. The c_custkey aggregate reuses the join's
    * hash partitioning, so the shape is one customer-keyed shuffle plus
    * one tiny count-keyed exchange. The fixture lacks o_comment, so the
    * classic NOT LIKE filter becomes a priority exclusion. */
  val q13CustDist: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
    val ords = Tables.load(s, dir, "orders")
      .filter($"o_orderpriority" =!= "1-URGENT")
    cust.join(ords, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // nulls don't count
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }
  val q13CustDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q16 (supplier-relationship count): NOT IN null-aware
    * anti-join against an excluded-supplier subquery + COUNT(DISTINCT)
    * under a three-way dimension filter. lineitem stands in for partsupp
    * (the fixture has no partsupp table); negative-balance suppliers
    * stand in for the comment-matched exclusion. SQL-planned so
    * Catalyst's null-aware single-column anti-join strategy is the path
    * under test. */
  val q16PartSupplier: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q16_lineitem")
    Tables.load(s, dir, "part").createOrReplaceTempView("q16_part")
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q16_supplier")
    s.sql(
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM q16_lineitem JOIN q16_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 33, 38, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM q16_supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }
  val q16PartSupplierSql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 33, 38, 45)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q21 (suppliers who kept waiting): the hardest TPC-H join
    * shape — one fact table correlated against ITSELF twice, EXISTS
    * (another supplier contributed to the order) and NOT EXISTS (no
    * OTHER supplier's line is return-flagged). The fixture lacks
    * commit/receipt dates, so `l_returnflag = 'R'` stands in for the
    * late-delivery predicate; the multi-supplier-order semantics are
    * unchanged. Both correlations plan as l_orderkey equi-joins (semi +
    * anti) over the same key hash — three shuffles of the fact on one
    * key, no cartesian anywhere. */
  val q21WaitingSupplier: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q21_lineitem")
    Tables.load(s, dir, "orders").createOrReplaceTempView("q21_orders")
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q21_supplier")
    s.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM q21_supplier, q21_lineitem l1, q21_orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM q21_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
  }
  val q21WaitingSupplierSql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q22 (global sales opportunity): scalar subqueries + NOT
    * EXISTS anti-join. c_nationkey stands in for the phone
    * country code, and "no urgent order" for "no order" (the fixture's
    * generator gives every customer at least one order, which would make
    * the classic anti-join vacuously empty).
    * The above-average test is algebraized to exact decimal arithmetic —
    * `bal * cnt > total` instead of `bal > total/cnt` — so both engines
    * decide threshold-adjacent customers identically (no IEEE division
    * in the predicate); the final sum is the engine-exact
    * decimal-then-double pattern used registry-wide. */
  val q22GlobalSales: Q = (s, dir) => {
    Tables.load(s, dir, "customer").createOrReplaceTempView("q22_customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("q22_orders")
    s.sql(
      """SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM q22_customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND CAST(c_acctbal AS DECIMAL(18,2)) *
        |    (SELECT COUNT(*) FROM q22_customer
        |     WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9)) >
        |    (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |     FROM q22_customer
        |     WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9))
        |  AND NOT EXISTS (SELECT 1 FROM q22_orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY cntry""".stripMargin)
  }
  val q22GlobalSalesSql: String =
    """SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    AS totacctbal
      |FROM customer
      |WHERE c_nationkey IN (1, 3, 5, 7, 9)
      |  AND CAST(c_acctbal AS DECIMAL(18,2)) *
      |    (SELECT COUNT(*) FROM customer
      |     WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9)) >
      |    (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
      |     FROM customer
      |     WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9))
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY cntry""".stripMargin

  /** TPC-H Q15 (top supplier): derived revenue view + scalar-max
    * equality join — the "rows equal to an aggregate of the same
    * derived table" shape. The revenue view computes ONCE and feeds
    * both the max and the equality probe (Catalyst reuses the
    * aggregated subplan); sums are exact decimals, so the max-equality
    * comparison is deterministic in both engines. */
  val q15TopSupplier: Q = (s, dir) => {
    import s.implicits._
    val revenue = Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey".as("supplier_no"))
      .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
        .as("total_revenue"))
    val best = revenue.agg(max($"total_revenue").as("best_rev"))
    Tables.load(s, dir, "supplier")
      .join(revenue, $"s_suppkey" === $"supplier_no")
      .join(broadcast(best), $"total_revenue" === $"best_rev")
      .select($"s_suppkey", $"s_name",
        $"total_revenue".cast("double").as("total_revenue"))
      .orderBy($"s_suppkey")
  }
  val q15TopSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name,
      |  CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q19 (discounted revenue): three-way DISJUNCTION of
    * conjunctive brand/size/quantity clauses — the shape that exercises
    * OR-predicate handling (Catalyst extracts the common l_partkey =
    * p_partkey equi-key so the join stays hash, never nested-loop, and
    * pushes the per-table OR residuals to each scan). */
  val q19Discounted: Q = (s, dir) => {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
    li.join(p, $"l_partkey" === $"p_partkey" && (
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) &&
        $"l_quantity".between(1, 20)) ||
      ($"p_brand" === "Brand#2" && $"p_size".between(11, 25) &&
        $"l_quantity".between(10, 30)) ||
      ($"p_brand" === "Brand#3" && $"p_size".between(26, 50) &&
        $"l_quantity".between(20, 40))))
      .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
        .cast("double").as("revenue"))
  }
  val q19DiscountedSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |  (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
      |       AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
      |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  /** TPC-H Q11 (important stock): group-HAVING against a scalar-subquery
    * FRACTION of a global sum — the "share of total" planner shape.
    * lineitem stands in for partsupp (as in q16): part value =
    * Σ extendedprice×quantity over a two-nation supplier slice; a part
    * qualifies when its value exceeds 1/1000 of the slice's total. The
    * threshold is algebraized to exact decimal arithmetic
    * (`sum*1000 > total`, no IEEE division), so both engines decide
    * threshold-adjacent parts identically. Scale shape: the slice
    * aggregates once behind a CTE and feeds BOTH the per-part rollup and
    * the global sum; the scalar subquery broadcasts as a one-row build
    * side — no second scan of lineitem, no nested loop. */
  val q11ImportantStock: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q11_lineitem")
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q11_supplier")
    Tables.load(s, dir, "nation").createOrReplaceTempView("q11_nation")
    s.sql(
      """WITH nat AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         CAST(l_quantity AS DECIMAL(18,2)) AS val
        |  FROM q11_lineitem JOIN q11_supplier ON l_suppkey = s_suppkey
        |  JOIN q11_nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7')),
        |agg AS (
        |  SELECT l_partkey AS ps_partkey, SUM(val) AS sval
        |  FROM nat GROUP BY l_partkey)
        |SELECT ps_partkey, CAST(sval AS DOUBLE) AS part_value
        |FROM agg
        |WHERE sval * 1000 > (SELECT SUM(val) FROM nat)
        |ORDER BY part_value DESC, ps_partkey""".stripMargin)
  }
  val q11ImportantStockSql: String =
    """WITH nat AS (
      |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) *
      |         CAST(l_quantity AS DECIMAL(18,2)) AS val
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_3', 'NATION_7')),
      |agg AS (
      |  SELECT l_partkey AS ps_partkey, SUM(val) AS sval
      |  FROM nat GROUP BY l_partkey)
      |SELECT ps_partkey, CAST(sval AS DOUBLE) AS part_value
      |FROM agg
      |WHERE sval * 1000 > (SELECT SUM(val) FROM nat)
      |ORDER BY part_value DESC, ps_partkey""".stripMargin

  /** TPC-H Q20 (potential part promotion): nested correlated IN with a
    * 50%-of-SUM threshold join — the hardest remaining decorrelation
    * shape. lineitem stands in for partsupp: availqty = Σ quantity of a
    * pair's non-returned lines; a pair qualifies when that exceeds half
    * the pair's 1996-97 shipped quantity (the correlated scalar
    * aggregate). The inner filter chains a second IN (PROMO parts), and
    * the outer IN feeds a nation-sliced supplier list — three nested
    * subquery levels, every one of which must plan as an equi-keyed
    * hash/semi join (the correlated aggregate decorrelates to a
    * (partkey, suppkey)-keyed aggregate + left join; nothing may go
    * nested-loop). Exact decimal quantities (`avail*2 > shipped`) keep
    * the threshold engine-identical. */
  val q20PartPromotion: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q20_lineitem")
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q20_supplier")
    Tables.load(s, dir, "nation").createOrReplaceTempView("q20_nation")
    Tables.load(s, dir, "part").createOrReplaceTempView("q20_part")
    s.sql(
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
        |  FROM q20_lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2)
        |SELECT s_name
        |FROM q20_supplier JOIN q20_nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4',
        |                 'NATION_5')
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM ps
        |    WHERE ps_partkey IN
        |        (SELECT p_partkey FROM q20_part WHERE p_type = 'PROMO')
        |      AND ps_availqty * 2 > COALESCE((
        |        SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |        FROM q20_lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'), 0))
        |ORDER BY s_name""".stripMargin)
  }
  val q20PartPromotionSql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
      |  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2)
      |SELECT s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4',
      |                 'NATION_5')
      |  AND s_suppkey IN (
      |    SELECT ps_suppkey FROM ps
      |    WHERE ps_partkey IN
      |        (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |      AND ps_availqty * 2 > COALESCE((
      |        SELECT SUM(CAST(l_quantity AS DECIMAL(18,2)))
      |        FROM lineitem
      |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'), 0))
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier): correlated scalar-MIN equality
    * against a region-filtered derived partsupp — the "rows equal to a
    * correlated aggregate" shape at two join depths (the inner MIN
    * re-joins supplier→nation→region per part). lineitem aggregates to
    * partsupp (supplycost = MIN extendedprice per pair, exact decimal).
    * Catalyst decorrelates the scalar subquery to a part-keyed
    * aggregate + join; every edge is equi-keyed. */
  val q2MinCostSupplier: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q2_lineitem")
    Tables.load(s, dir, "part").createOrReplaceTempView("q2_part")
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q2_supplier")
    Tables.load(s, dir, "nation").createOrReplaceTempView("q2_nation")
    Tables.load(s, dir, "region").createOrReplaceTempView("q2_region")
    // Window formulation of the classic correlated-min subquery: Spark
    // INLINES the `ps` CTE at every reference, so the textbook form
    // aggregated lineitem THREE times (outer ps + the decorrelated
    // subquery's two — see plans/r16/q2_min_cost_supplier_before.txt,
    // HashAggregate pairs 7/9, 17/19, 36/38). The subquery's min is
    // correlated only on p_partkey and ranges over exactly the ASIA rows
    // the outer join already produces, so MIN(...) OVER (PARTITION BY
    // ps_partkey) on that one join computes the identical bound in ONE
    // lineitem aggregation + one window shuffle: same rows (ties all
    // kept, NULL costs excluded by the equality either way), same
    // multiplicity (ps is grouped by (partkey, suppkey), so (s_name,
    // p_partkey) is unique and the LIMIT is deterministic). The DuckDB
    // oracle still runs the correlated original — hash-checked equal.
    // The part join sits BELOW the window: p_partkey is unique in part
    // and the filters touch only part columns, so joining first prunes
    // whole window partitions without changing any surviving partition's
    // row set — the window then sorts ~1% of the keys.
    s.sql(
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         MIN(CAST(l_extendedprice AS DECIMAL(18,2)))
        |           AS ps_supplycost
        |  FROM q2_lineitem GROUP BY 1, 2),
        |asia AS (
        |  SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
        |         ps_supplycost,
        |         MIN(ps_supplycost) OVER (PARTITION BY ps_partkey)
        |           AS min_cost
        |  FROM ps, q2_supplier, q2_nation, q2_region, q2_part
        |  WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        |    AND p_partkey = ps_partkey
        |    AND p_size IN (5, 15, 25) AND p_type = 'LARGE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
        |  CAST(ps_supplycost AS DOUBLE) AS supplycost
        |FROM asia
        |WHERE ps_supplycost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
  }
  val q2MinCostSupplierSql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         MIN(CAST(l_extendedprice AS DECIMAL(18,2)))
      |           AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
      |  CAST(ps_supplycost AS DOUBLE) AS supplycost
      |FROM part, ps, supplier, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_size IN (5, 15, 25) AND p_type = 'LARGE'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND ps_supplycost = (
      |    SELECT MIN(ps2.ps_supplycost)
      |    FROM ps ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.ps_partkey = p_partkey
      |      AND s2.s_suppkey = ps2.ps_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 (product type profit): the widest join tree in the suite
    * — lineitem × part × supplier × orders × nation with a substring
    * part filter, profit = revenue − cost, grouped by (nation, year).
    * p_retailprice×quantity×0.1 stands in for supplycost×quantity (the
    * fixture has no partsupp); all arithmetic exact decimal until the
    * final double cast. Scale shape: part/supplier/nation broadcast,
    * lineitem shuffles once on l_orderkey to meet orders, the aggregate
    * partial-aggregates map-side to 25×7 groups. */
  val q9ProductProfit: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q9_lineitem")
    Tables.load(s, dir, "part").createOrReplaceTempView("q9_part")
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q9_supplier")
    Tables.load(s, dir, "orders").createOrReplaceTempView("q9_orders")
    Tables.load(s, dir, "nation").createOrReplaceTempView("q9_nation")
    s.sql(
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (1 - CAST(l_discount AS DECIMAL(18,2))) -
        |       CAST(p_retailprice AS DECIMAL(18,2)) *
        |       CAST(l_quantity AS DECIMAL(18,2)) * 0.1) AS DOUBLE)
        |    AS sum_profit
        |FROM q9_part, q9_supplier, q9_lineitem, q9_orders, q9_nation
        |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)
  }
  val q9ProductProfitSql: String =
    """SELECT n_name AS nation,
      |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |       (1 - CAST(l_discount AS DECIMAL(18,2))) -
      |       CAST(p_retailprice AS DECIMAL(18,2)) *
      |       CAST(l_quantity AS DECIMAL(18,2)) * 0.1) AS DOUBLE)
      |    AS sum_profit
      |FROM part, supplier, lineitem, orders, nation
      |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q12 (shipping modes and order priority): one fact join +
    * conditional aggregation (SUM of CASE) — the pivot-without-pivot
    * shape. l_linestatus stands in for the fixture's absent shipmode;
    * the date window filters the fact side before the join (pushed to
    * the scan), and the two CASE sums fold in one aggregate pass. */
  val q12ShipPriority: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("q12_lineitem")
    Tables.load(s, dir, "orders").createOrReplaceTempView("q12_orders")
    s.sql(
      """SELECT l_linestatus AS shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM q12_orders JOIN q12_lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }
  val q12ShipPrioritySql: String =
    """SELECT l_linestatus AS shipmode,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q2_min_cost_supplier", q2MinCostSupplier, Some(q2MinCostSupplierSql)),
    ("q9_product_profit", q9ProductProfit, Some(q9ProductProfitSql)),
    ("q12_ship_priority", q12ShipPriority, Some(q12ShipPrioritySql)),
    ("q11_important_stock", q11ImportantStock, Some(q11ImportantStockSql)),
    ("q20_part_promotion", q20PartPromotion, Some(q20PartPromotionSql)),
    ("q13_custdist", q13CustDist, Some(q13CustDistSql)),
    ("q15_top_supplier", q15TopSupplier, Some(q15TopSupplierSql)),
    ("q19_discounted", q19Discounted, Some(q19DiscountedSql)),
    ("q16_part_supplier", q16PartSupplier, Some(q16PartSupplierSql)),
    ("q21_waiting_supplier", q21WaitingSupplier,
      Some(q21WaitingSupplierSql)),
    ("q22_global_sales", q22GlobalSales, Some(q22GlobalSalesSql)),
    ("q_distinct_sketch", qDistinctSketch, Some(qDistinctSketchSql)),
    ("q17_small_qty", q17SmallQty, Some(q17SmallQtySql)),
    ("q18_large_orders", q18LargeOrders, Some(q18LargeOrdersSql)),
    ("q7_volume", q7Volume, Some(q7VolumeSql)),
    ("q8_market_share", q8MarketShare, Some(q8MarketShareSql)),
    ("q14_promo", q14Promo, Some(q14PromoSql)),
    ("q_running_total", qRunningTotal, Some(qRunningTotalSql)),
    ("q_rank_in_group", qRankInGroup, Some(qRankInGroupSql)),
    ("q_anti_join", qAntiJoin, Some(qAntiJoinSql)),
    ("q_null_funcs", qNullFuncs, Some(qNullFuncsSql)),
    ("q4_semi", q4Semi, Some(q4SemiSql)),
    ("q_rollup", qRollup, Some(qRollupSql)),
    ("q_count_distinct", qCountDistinct, Some(qCountDistinctSql)),
    ("q1_agg", q1Agg, Some(q1AggSql)),
    ("q_count", qCount, Some(qCountSql)),
    ("q_filter_project", qFilterProject, Some(qFilterProjectSql)),
    ("q_window_dedup", qWindowDedup, Some(qWindowDedupSql)),
    ("q_merge_upsert", qMergeUpsert, Some(qMergeUpsertSql)),
    ("q_topk", qTopk, Some(qTopkSql)),
    ("q_join_enrich", qJoinEnrich, Some(qJoinEnrichSql)),
    ("q3_shipping", q3Shipping, Some(q3ShippingSql)),
    ("q5_local_supplier", q5LocalSupplier, Some(q5LocalSupplierSql)),
    ("q6_forecast", q6Forecast, Some(q6ForecastSql)),
    ("q10_returned", q10Returned, Some(q10ReturnedSql)),
  )
}
