package graft.queries

import graft.{QDef, Tables}
import graft.functions.Arith
import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Scalar / aggregation / join / sort-limit operators (SURVEY.md §2.2,
  * §2.4-2.6) over the TPC-H-ish tables and `events`.
  *
  * Float discipline: sums of money-like doubles are accumulated as
  * DECIMAL — exact and therefore independent of partial-aggregation
  * order, which matters both for oracle parity and for deterministic
  * results on a real cluster — then cast to double for output.
  */
object RelationalQueries {

  /** Shared by the parquet-native and CSV-schema-on-read enrichment
    * queries — both must produce this exact relation. */
  private val enrichmentOracle: String =
    """SELECT c_custkey, c_name, n_name AS nation, r_name AS region,
      |       floor(c_acctbal * 100 + 0.5) / 100.0 AS acctbal,
      |       concat_ws('-', c_mktsegment, n_name) AS segment_key
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE c_acctbal > 0
      |ORDER BY c_custkey""".stripMargin

  def defs: Seq[QDef] = Seq(

    // P1-P13 packed scan: filter (P3/P5), projection+alias (P2), casts
    // (P7), substring guard (P8), rounding (P9), concat_ws (P10),
    // arithmetic (P11), CASE WHEN (P12), partition-key formatting (P13).
    QDef(
      "p_scan_scalar",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(lit("1995-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")) && col("l_returnflag") === "N")
        .filter(substring(col("l_shipdate").cast("string"), 1, 2) === "19")
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("line_no"),
          concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("history"),
          Arith.r2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
          when(col("l_quantity") > 40, "HIGH")
            .when(col("l_quantity") > 20, "MED")
            .otherwise("LOW").as("qty_band"),
          date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm").as("partition_key"))
        .orderBy(col("l_orderkey"), col("line_no")),
      Some(
        """SELECT l_orderkey,
          |       CAST(l_linenumber AS BIGINT) AS line_no,
          |       concat_ws('-', l_returnflag, l_linestatus) AS history,
          |       floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100.0 AS disc_price,
          |       CASE WHEN l_quantity > 40 THEN 'HIGH'
          |            WHEN l_quantity > 20 THEN 'MED'
          |            ELSE 'LOW' END AS qty_band,
          |       strftime(l_shipdate, '%Y-%m-%dT%H:%M') AS partition_key
          |FROM lineitem
          |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
          |  AND l_returnflag = 'N'
          |  AND substr(CAST(l_shipdate AS VARCHAR), 1, 2) = '19'
          |ORDER BY l_orderkey, line_no""".stripMargin)),

    // A1/A2-shape pricing summary (TPC-H Q1 on this schema): exact
    // decimal accumulation, double output. Bench headline.
    QDef(
      "q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast("decimal(18,6)")).cast("double").as("sum_charge"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
          |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // A3 — status histogram pivoted to columns via CASE, per day bin
    // (grafana…json:337).
    QDef(
      "a3_status_hist",
      (s, dir) => Tables.events(s, dir)
        .groupBy(TimeSeries.bin(col("ts"), 86400L).as("day"))
        .agg(
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
          count(lit(1)).as("n_total"))
        .orderBy(col("day")),
      // CAST(sum AS BIGINT): DuckDB's sum over INTEGER yields HUGEINT
      // (float64 via pandas) while Spark emits BIGINT — the driver's
      // dtype-sensitive hash would diverge on equal values.
      Some(
        """SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) * 86400000000) AS day,
          |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
          |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
          |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
          |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
          |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
          |  count(*) AS n_total
          |FROM events GROUP BY day ORDER BY day""".stripMargin)),

    // S4+A6 — wide→narrow unpivot (the Timestream storage model,
    // app.py:54-67) then narrow→wide reconstruction via MAX(CASE)
    // (grafana…json:121).
    QDef(
      "a6_narrow_pivot_roundtrip",
      (s, dir) => {
        val narrow = Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          expr("stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, 'discount', l_discount)")
            .as(Seq("measure_name", "measure_value")))
        narrow.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(
            max(when(col("measure_name") === "quantity", col("measure_value"))).as("quantity"),
            max(when(col("measure_name") === "extendedprice", col("measure_value"))).as("extendedprice"),
            max(when(col("measure_name") === "discount", col("measure_value"))).as("discount"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some(
        """WITH narrow AS (
          |  SELECT l_orderkey, l_linenumber, 'quantity' AS measure_name, l_quantity AS measure_value FROM lineitem
          |  UNION ALL
          |  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
          |  UNION ALL
          |  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
          |)
          |SELECT l_orderkey, l_linenumber,
          |  max(CASE WHEN measure_name = 'quantity' THEN measure_value END) AS quantity,
          |  max(CASE WHEN measure_name = 'extendedprice' THEN measure_value END) AS extendedprice,
          |  max(CASE WHEN measure_name = 'discount' THEN measure_value END) AS discount
          |FROM narrow GROUP BY l_orderkey, l_linenumber
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S5+S8+J5 — the full data-lake path (README.md:359-444): dims
    // exported as headered CSV, registered schema-on-read (all-string,
    // casts in the query — OpenCSVSerde semantics), composed into the
    // persistent enrichment view via SQL text, against the parquet
    // fact. Same result as j_enrichment_view ⇒ same oracle.
    QDef(
      "s5_csv_enrichment_view",
      (s, dir) => {
        // CSV dirs materialize once per JVM (Fixtures); the gate itself
        // is a read — repeated invocations measure the query, not the
        // CSV export's Hadoop commit overhead
        val tmp = Fixtures.dir("csv_lake", dir) { out =>
          graft.sources.CsvLake.exportCsv(Tables.nation(s, dir), s"$out/nation_csv")
          graft.sources.CsvLake.exportCsv(Tables.region(s, dir), s"$out/region_csv")
        }
        graft.sources.CsvLake.registerExternalTable(s, s"$tmp/nation_csv", "csv_nation")
        graft.sources.CsvLake.registerExternalTable(s, s"$tmp/region_csv", "csv_region")
        Tables.customer(s, dir).createOrReplaceTempView("customer_pq")
        s.sql(
          """CREATE OR REPLACE TEMPORARY VIEW sensor_enriched_data AS
            |SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region,
            |       -- 100.0D: Spark SQL parses a bare decimal literal as DECIMAL,
            |       -- which would make the division DECIMAL instead of DOUBLE
            |       floor(c.c_acctbal * 100 + 0.5) / 100.0D AS acctbal,
            |       concat_ws('-', c.c_mktsegment, n.n_name) AS segment_key
            |FROM customer_pq c
            |JOIN csv_nation n ON c.c_nationkey = CAST(n.n_nationkey AS BIGINT)
            |JOIN csv_region r ON CAST(n.n_regionkey AS BIGINT) = CAST(r.r_regionkey AS BIGINT)
            |WHERE c.c_acctbal > 0""".stripMargin)
        s.sql("SELECT * FROM sensor_enriched_data ORDER BY c_custkey")
      },
      Some(enrichmentOracle)),

    // J5 persistent form — the reference's enrichment view is a durable
    // CREATE VIEW in the Athena/Glue catalog (README.md:430-444), not a
    // session-scoped one. This gate registers the CSV dims and the
    // parquet fact as EXTERNAL catalog tables, creates a persistent
    // (non-TEMPORARY) view over them, then reads the view from a FRESH
    // session (spark.newSession() — same warehouse, empty temp-view
    // registry). A temp view would fail to resolve there; only catalog
    // persistence makes this pass. Same relation as j_enrichment_view
    // ⇒ same oracle.
    QDef(
      "j5_persistent_view",
      (s, dir) => {
        val tmp = Fixtures.dir("csv_lake", dir) { out =>
          graft.sources.CsvLake.exportCsv(Tables.nation(s, dir), s"$out/nation_csv")
          graft.sources.CsvLake.exportCsv(Tables.region(s, dir), s"$out/region_csv")
        }
        graft.sources.CsvLake.registerExternalCatalogTable(s, s"$tmp/nation_csv", "lake_nation")
        graft.sources.CsvLake.registerExternalCatalogTable(s, s"$tmp/region_csv", "lake_region")
        graft.sources.CsvLake.registerParquetCatalogTable(s, s"$dir/customer.parquet", "lake_customer")
        s.sql(
          """CREATE OR REPLACE VIEW enriched_customers AS
            |SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region,
            |       floor(c.c_acctbal * 100 + 0.5) / 100.0D AS acctbal,
            |       concat_ws('-', c.c_mktsegment, n.n_name) AS segment_key
            |FROM lake_customer c
            |JOIN lake_nation n ON c.c_nationkey = CAST(n.n_nationkey AS BIGINT)
            |JOIN lake_region r ON CAST(n.n_regionkey AS BIGINT) = CAST(r.r_regionkey AS BIGINT)
            |WHERE c.c_acctbal > 0""".stripMargin)
        s.newSession().sql(
          "SELECT * FROM enriched_customers ORDER BY c_custkey")
      },
      Some(enrichmentOracle)),

    // J1+J2+J5 — the Athena enrichment view shape (README.md:430-444):
    // fact enriched through two small dimensions; dims auto-broadcast.
    QDef(
      "j_enrichment_view",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(col("c_acctbal") > 0)
          .select(
            col("c_custkey"),
            col("c_name"),
            col("n_name").as("nation"),
            col("r_name").as("region"),
            Arith.r2(col("c_acctbal")).as("acctbal"),
            concat_ws("-", col("c_mktsegment"), col("n_name")).as("segment_key"))
          .orderBy(col("c_custkey"))
      },
      Some(enrichmentOracle)),

    // J1/J2 at fact scale — revenue per nation (orders ⋈ customer ⋈
    // nation), exact decimal accumulation. Bench headline.
    QDef(
      "j_orders_revenue",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(desc("revenue"), col("nation"))
      },
      Some(
        """SELECT n_name AS nation,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |       count(*) AS n_orders
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name
          |ORDER BY revenue DESC, nation""".stripMargin),
      headline = true),

    // TPC-H Q3 shape — selective join + aggregate + top-k: unshipped
    // orders' revenue by order, priority date cutoff on BOTH sides
    // (pushed to both scans), exact cents accumulation, and the final
    // top-10 as TakeOrderedAndProject, not a global sort.
    QDef(
      "q3_shipping_priority",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("revenue_cents"))
          .orderBy(desc("revenue_cents"), col("l_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
          |       o_orderpriority,
          |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-06-01'
          |  AND CAST(l_shipdate AS TIMESTAMP) > TIMESTAMP '1997-06-01'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape — the DEEP star join: region→nation filter the
    // customer and supplier dims, which filter orders→lineitem, with
    // the local-supplier condition (c_nationkey = s_nationkey) closing
    // the cycle. The scale story: every dim side broadcasts (region 5
    // rows … customer ~thousands), so the only shuffles are the fact
    // tables' — Catalyst orders the joins from statistics; the date
    // filter pushes to the orders scan. Exact-cents revenue keeps the
    // 6-table sum bit-stable.
    QDef(
      "q5_local_supplier",
      (s, dir) => {
        val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, dir)
          .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val c = Tables.customer(s, dir)
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val su = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("revenue_cents"))
          .orderBy(desc("revenue_cents"), col("n_name"))
      },
      Some(
        """SELECT n_name,
          |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM customer, orders, lineitem, supplier, nation, region
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'ASIA'
          |  AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
          |  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
          |GROUP BY n_name
          |ORDER BY revenue_cents DESC, n_name""".stripMargin)),

    // TPC-H Q10 shape — returned-item revenue: which customers sent
    // the most revenue back last quarter. Fact⋈fact (orders⋈lineitem)
    // shuffles; customer and nation broadcast; the quarter filter and
    // the returnflag filter push to their scans; top-20 plans
    // TakeOrderedAndProject. Exact-cents revenue as everywhere.
    QDef(
      "q10_returned_items",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(sum(expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("revenue_cents"))
          .orderBy(desc("revenue_cents"), col("c_custkey"))
          .limit(20)
      },
      Some(
        """SELECT c_custkey, c_name, c_acctbal, n_name,
          |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM customer, orders, lineitem, nation
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
          |  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-04-01'
          |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
          |GROUP BY c_custkey, c_name, c_acctbal, n_name
          |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q18 shape — large-volume customers: a fact-side aggregate
    // DERIVES the semi-join key set (orders whose line quantities sum
    // past a threshold), which then filters orders⋈customer. The
    // shape to pin: the HAVING aggregate partial-combines map-side
    // before its shuffle, the qualifying-key set is small and joins
    // hash-side, and top-k plans TakeOrderedAndProject. Quantities
    // are integer-valued, so the double sum is exact in any order.
    QDef(
      "q18_large_volume",
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate"), col("o_totalprice"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
        o.join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .limit(100)
      },
      Some(
        """SELECT c_name, c_custkey, o_orderkey,
          |       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
          |       total_qty
          |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
          |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) b
          |JOIN orders ON o_orderkey = b.l_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q17 shape — the DECORRELATED correlated subquery: each
    // lineitem compares against 20% of its part's average quantity.
    // The correlated scalar subquery becomes a per-part aggregate
    // joined back to the fact — one aggregate pass + one equi-join
    // instead of a subquery per row. Quantities are integer-valued
    // doubles, so sum/count (and the ×0.2 threshold) are exact and
    // order-independent in both engines.
    QDef(
      "q17_small_quantity",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val thresh = l.groupBy(col("l_partkey"))
          .agg((avg(col("l_quantity")) * 0.2).as("thresh"))
        l.join(thresh, "l_partkey")
          .filter(col("l_quantity") < col("thresh"))
          .agg(
            count(lit(1)).as("n_small"),
            sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
              .as("revenue_cents"))
      },
      Some(
        """WITH t AS (
          |  SELECT l_partkey, avg(l_quantity) * 0.2 AS thresh
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT count(*) AS n_small,
          |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
          |FROM lineitem JOIN t USING (l_partkey)
          |WHERE l_quantity < thresh""".stripMargin)),

    // TPC-H Q6 shape — pure filter + global aggregate (the "how much
    // would we have made" scan): three band predicates, all pushed to
    // the parquet scan, one exact-cents sum, one output row.
    QDef(
      "q6_forecast_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          sum(expr("CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)"))
            .as("revenue_cents"),
          count(lit(1)).as("n_items")),
      Some(
        """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
          |       count(*) AS n_items
          |FROM lineitem
          |WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
          |  AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
          |  AND l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)),

    // Multi-level OLAP aggregation: one pass produces per-(priority,
    // status) cells, per-priority subtotals, and the grand total, with
    // GROUPING() ids disambiguating genuine NULLs from subtotal rows.
    // Spark expands rollup into a single Expand + hash aggregate — no
    // extra scan per level, which is what makes rollup preferable to
    // N separate GROUP BYs at 100 TB. Exact integer cents, so the
    // multi-level sums are bit-stable.
    QDef(
      "a8_rollup_orders",
      (s, dir) => Tables.orders(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("total_cents"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"))
        .orderBy(
          col("g_priority"), col("g_status"),
          col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first),
      Some(
        """SELECT o_orderpriority, o_orderstatus,
          |       count(*) AS n_orders,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
          |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
          |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
          |FROM orders
          |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
          |ORDER BY g_priority, g_status,
          |         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // Arbitrary GROUPING SETS (beyond a8's ROLLUP lattice): disjoint
    // per-dimension slices plus the grand total in ONE Expand + hash
    // aggregate pass — the cube-fragment shape dashboards issue
    // (N independent GROUP BYs would scan N times at 100 TB).
    // GROUPING() ids disambiguate subtotal rows from genuine NULLs;
    // exact integer cents keep the multi-slice sums bit-stable.
    QDef(
      "a10_grouping_sets",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
        s.sql(
          """SELECT o_orderpriority, o_orderstatus,
            |       count(*) AS n_orders,
            |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
            |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
            |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
            |FROM orders_gs
            |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
            |ORDER BY g_priority, g_status,
            |         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
      },
      Some(
        """SELECT o_orderpriority, o_orderstatus,
          |       count(*) AS n_orders,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
          |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
          |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY g_priority, g_status,
          |         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // Full CUBE (completing the ROLLUP / GROUPING SETS lattice family):
    // all four (priority, status) groupings in ONE Expand + hash
    // aggregate pass, GROUPING() ids disambiguating subtotal rows.
    QDef(
      "a11_cube_orders",
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("total_cents"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"))
        .orderBy(
          col("g_priority"), col("g_status"),
          col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first),
      Some(
        """SELECT o_orderpriority, o_orderstatus,
          |       count(*) AS n_orders,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
          |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
          |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
          |FROM orders
          |GROUP BY CUBE (o_orderpriority, o_orderstatus)
          |ORDER BY g_priority, g_status,
          |         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)),

    // O2+O3 — top-k with a unique tiebreak: Catalyst plans
    // TakeOrderedAndProject (no global sort).
    QDef(
      "o_topk_values",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(desc("value"), col("event_id"))
        .limit(10),
      Some(
        """SELECT event_id, user_id, value
          |FROM events ORDER BY value DESC, event_id LIMIT 10""".stripMargin)),

    // TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join: orders
    // in one quarter having at least one returned line, counted by
    // priority. The semi join never duplicates orders however many
    // lines match (the correctness property EXISTS demands; a plain
    // inner join + distinct would shuffle the duplication first).
    // (The fixture has no l_commitdate/l_receiptdate, so the returned
    // flag plays the late-delivery predicate — identical plan shape.)
    QDef(
      "q4_priority_returns",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        val returned = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
          |  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-04-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q13 shape — LEFT OUTER join with the filter INSIDE the
    // join condition (customers whose only orders are filtered out
    // must still count as zero), then the two-level count-of-counts
    // distribution.
    QDef(
      "q13_order_distribution",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_custkey"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderstatus") =!= "F")
          .select(col("o_custkey"), col("o_orderkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(
        """SELECT c_count, count(*) AS custdist FROM (
          |  SELECT c_custkey, count(o_orderkey) AS c_count
          |  FROM customer
          |  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
          |  GROUP BY c_custkey)
          |GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q14 shape — promo revenue ratio over one month: the join
    // to part is the dimension lookup (broadcast side), the two sums
    // ride as exact cents so the percentage is order-independent
    // (identical double division of two exact integers in both
    // engines).
    QDef(
      "q14_promo_revenue",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        l.join(Tables.part(s, dir).select(col("p_partkey"), col("p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
              expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
              .otherwise(0L)).as("promo_cents"),
            sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
              .as("total_cents"))
          .select(col("promo_cents"), col("total_cents"),
            (floor(col("promo_cents") * 1000000L / col("total_cents")) / 10000.0)
              .as("promo_pct"))
      },
      Some(
        """SELECT CAST(promo_cents AS BIGINT) AS promo_cents,
          |       CAST(total_cents AS BIGINT) AS total_cents,
          |       floor(promo_cents * 1000000 / total_cents) / 10000.0 AS promo_pct
          |FROM (
          |  SELECT sum(CASE WHEN p_type = 'PROMO'
          |                  THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          |                  ELSE 0 END) AS promo_cents,
          |         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total_cents
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-03-01'
          |    AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-04-01')""".stripMargin)),

    // TPC-H Q15 shape — the decorrelated "supplier(s) with maximum
    // revenue": a quarter's per-supplier revenue (exact cents), a
    // 1-row global max, joined back (broadcastable). Ties all emit —
    // the reason this cannot be a LIMIT 1.
    QDef(
      "q15_top_supplier",
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("total_cents"))
        val top = rev.agg(max(col("total_cents")).as("max_cents"))
        rev.join(broadcast(top), col("total_cents") === col("max_cents"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_cents"))
          .orderBy(col("s_suppkey"))
      },
      Some(
        """WITH rev AS (
          |  SELECT l_suppkey,
          |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |  FROM lineitem
          |  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
          |    AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_cents
          |FROM rev JOIN supplier ON l_suppkey = s_suppkey
          |WHERE total_cents = (SELECT max(total_cents) FROM rev)
          |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q19 shape — the OR-of-ANDs join predicate: three disjunct
    // (brand, size band, quantity band) clauses spanning both tables.
    // Catalyst extracts the per-table common factors for pushdown and
    // the rest rides the hash join on p_partkey — never a nested loop.
    QDef(
      "q19_discounted_bands",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        val pt = Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val bands =
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#7" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(1, 40) &&
            col("l_quantity").between(20, 30))
        l.join(pt, col("l_partkey") === col("p_partkey"))
          .filter(bands)
          .agg(
            sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
              .as("revenue_cents"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q21 shape — the double-nested EXISTS / NOT EXISTS: for a
    // multi-supplier order, the supplier whose lines alone were
    // returned takes the blame. One LEFT SEMI (some other supplier on
    // the order) + one LEFT ANTI (no OTHER supplier had a return) over
    // the same narrow (orderkey, suppkey) projections; top-20 blame
    // counts plan as TakeOrderedAndProject.
    QDef(
      "q21_sole_returner",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
        val mine = l.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val others = l.select(col("l_orderkey").as("o2_orderkey"),
          col("l_suppkey").as("o2_suppkey")).distinct()
        val otherReturns = l.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3_orderkey"),
            col("l_suppkey").as("o3_suppkey")).distinct()
        mine
          .join(others,
            col("l_orderkey") === col("o2_orderkey") &&
              col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
          .join(otherReturns,
            col("l_orderkey") === col("o3_orderkey") &&
              col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some(
        """WITH mine AS (
          |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
          |SELECT s_name, count(*) AS numwait
          |FROM mine JOIN supplier ON l_suppkey = s_suppkey
          |WHERE EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = mine.l_orderkey
          |                AND l2.l_suppkey <> mine.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = mine.l_orderkey
          |                    AND l3.l_suppkey <> mine.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 20""".stripMargin)),

    // TPC-H Q22 shape — the scalar-subquery threshold + NOT EXISTS
    // anti join: rich customers (above the positive-balance average)
    // with no 1997 order (every fixture customer has SOME order, so
    // the anti side carries a pushed date filter to keep the gate
    // non-vacuous). The average comparison runs in EXACT integers
    // (acctbal_cents * n > total_cents) so no float-threshold row can
    // flip between engines; the anti join is a hash join on custkey.
    QDef(
      "q22_idle_rich",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("_cents"))
        val thresh = c.filter(col("c_acctbal") > 0)
          .agg(sum(col("_cents")).as("_total"), count(lit(1)).as("_n"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        c.join(broadcast(thresh))
          .filter(col("_cents") * col("_n") > col("_total"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"), sum(col("_cents")).as("totacctbal_cents"))
          .orderBy(col("c_nationkey"))
      },
      Some(
        """WITH t AS (
          |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total,
          |         count(*) AS n
          |  FROM customer WHERE c_acctbal > 0)
          |SELECT c_nationkey, count(*) AS numcust,
          |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
          |FROM customer, t
          |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > total
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey
          |                    AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
          |                    AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-01-01')
          |GROUP BY c_nationkey
          |ORDER BY c_nationkey""".stripMargin)),

    // TPC-H Q7 shape — volume shipping between two nations: the same
    // nation dimension joins TWICE under different roles (supplier
    // side, customer side) with a cross-pair predicate, revenue by
    // (supp nation, cust nation, year). All four dimension hops
    // broadcast; lineitem drives the only data-sized shuffle.
    QDef(
      "q7_volume_shipping",
      (s, dir) => {
        val pair = Seq("NATION_2", "NATION_11")
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"), year(col("l_shipdate")).cast("long").as("l_year"))
        val sn = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cn = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        l.join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
          .filter(
            (col("supp_nation") === pair(0) && col("cust_nation") === pair(1)) ||
              (col("supp_nation") === pair(1) && col("cust_nation") === pair(0)))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
            .as("revenue_cents"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(
        """SELECT supp_nation, cust_nation, l_year,
          |       CAST(sum(volume) AS BIGINT) AS revenue_cents
          |FROM (
          |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
          |         CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
          |         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS volume
          |  FROM lineitem
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ns ON s_nationkey = ns.n_nationkey
          |  JOIN nation nc ON c_nationkey = nc.n_nationkey
          |  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
          |    AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
          |    AND ((ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_11')
          |      OR (ns.n_name = 'NATION_11' AND nc.n_name = 'NATION_2')))
          |GROUP BY supp_nation, cust_nation, l_year
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q8 shape — market share: one nation's fraction of total
    // regional revenue per year, i.e. a ratio of two aggregates over
    // the same joined relation (sum(CASE)/sum). Both sums ride as
    // exact cents; the share divides two exact integers, so the
    // double result is bit-identical in both engines.
    QDef(
      "q8_market_share",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
            col("l_extendedprice"), col("l_discount"))
        val pt = Tables.part(s, dir).filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))
        val sn = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
        l.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_2",
              expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
              .otherwise(0L)).as("nation_cents"),
            sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
              .as("total_cents"))
          .select(col("o_year"), col("nation_cents"), col("total_cents"),
            (floor(col("nation_cents") * 1000000L / col("total_cents")) / 10000.0)
              .as("mkt_share_pct"))
          .orderBy(col("o_year"))
      },
      Some(
        """SELECT o_year, CAST(nation_cents AS BIGINT) AS nation_cents,
          |       CAST(total_cents AS BIGINT) AS total_cents,
          |       floor(nation_cents * 1000000 / total_cents) / 10000.0 AS mkt_share_pct
          |FROM (
          |  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
          |         sum(CASE WHEN n_name = 'NATION_2'
          |                  THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          |                  ELSE 0 END) AS nation_cents,
          |         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total_cents
          |  FROM lineitem
          |  JOIN part ON l_partkey = p_partkey
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  WHERE p_type = 'PROMO'
          |    AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
          |    AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
          |  GROUP BY 1)
          |ORDER BY o_year""".stripMargin))
  )
}
