package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Queries q06-q35: the full relational checklist (SURVEY.md §2.3) —
  * projection, filters, every join shape, aggregation incl. grouping sets,
  * window functions, sort/limit/top-k, set ops, scalar functions, parsing,
  * subqueries. Each is the idiomatic Spark DataFrame form with a DuckDB
  * oracle. */
object Relational {

  val entries: Seq[Entry] = Seq(

    // ---- projection ---------------------------------------------------
    Entry("q06_projection", Some(
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS net_price,
        |       CAST(round(l_quantity * 1000) AS BIGINT) AS qty_mils
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        round(col("l_quantity") * 1000).cast("long").as("qty_mils"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- complex predicates -------------------------------------------
    Entry("q07_filter_complex", Some(
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND o_totalprice BETWEEN 10000 AND 200000
        |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
        |  AND o_orderdate IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      table(s, d, "orders")
        .where(col("o_orderstatus").isin("F", "P") &&
          col("o_totalprice").between(10000, 200000) &&
          (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
          col("o_orderdate").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // ---- joins --------------------------------------------------------
    Entry("q08_join_inner", Some(
      """SELECT o_orderkey, o_totalprice, c_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      table(s, d, "orders")
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
        .orderBy(col("o_orderkey"))
    },

    // star-join with broadcast dimensions: revenue per nation in ASIA.
    Entry("q09_star_join_agg", Some(
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem")
        .join(broadcast(table(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(table(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(
          dbl(sum(dec2(col("l_extendedprice")) * dec4(lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"))
    },

    Entry("q10_left_outer_join", Some(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)) { (s, d) =>
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    Entry("q11_full_outer_join", Some(
      """SELECT coalesce(a.nk, b.nk) AS nk,
        |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) a
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) b
        |  ON a.nk = b.nk
        |ORDER BY nk""".stripMargin)) { (s, d) =>
      val a = table(s, d, "customer").groupBy(col("c_nationkey").as("nk_a"))
        .agg(count(lit(1)).as("n_cust"))
      val b = table(s, d, "supplier").groupBy(col("s_nationkey").as("nk_b"))
        .agg(count(lit(1)).as("n_supp"))
      a.join(b, col("nk_a") === col("nk_b"), "full")
        .select(
          coalesce(col("nk_a"), col("nk_b")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nk"))
    },

    Entry("q12_semi_join", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)) { (s, d) =>
      table(s, d, "customer")
        .join(table(s, d, "orders").where(col("o_orderstatus") === "F"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    Entry("q13_anti_join", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)) { (s, d) =>
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // equi-key + range residual (ship lag > 60 days)
    Entry("q14_range_join", Some(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // as-of join: latest purchase at-or-before each click, per user.
    // Spark-first: single-pass union + running last_value window — no
    // per-row subquery, one shuffle on user_id; scale-safe vs a naive
    // theta-join. DuckDB checks it with a native ASOF JOIN.
    Entry("q15_asof_join", Some(
      """SELECT c.event_id AS click_id, c.user_id,
        |       p.event_id AS purchase_id, epoch_ns(p.ts) // 1000 AS purchase_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY click_id""".stripMargin)) { (s, d) =>
      val ev = table(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts", "ts",
          Map("event_id" -> "purchase_id", "ts" -> "purchase_ts"))
        .select(col("click_id"), col("user_id"),
          col("purchase_id"), expr("purchase_ts div 1000").as("purchase_ts_us"))
        .orderBy(col("click_id"))
    },

    // ---- aggregation --------------------------------------------------
    // TPC-H Q1 shape: decimal-exact sums, avg as exact-sum / count.
    Entry("q16_pricing_summary", Some(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                 * CAST(1 - l_discount AS DECIMAL(6,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                      * CAST(1 - l_discount AS DECIMAL(6,4))
        |                      * CAST(1 + l_tax AS DECIMAL(6,4))), 4) AS DOUBLE) AS sum_charge,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(dec2(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec2(col("l_extendedprice")))).as("sum_base"),
          dbl(sum(col("l_extendedprice").cast(DecimalType(12, 2))
            * (lit(1) - col("l_discount")).cast(DecimalType(6, 4)))).as("sum_disc_price"),
          // round(…,4) before the double cast: DuckDB converts wide decimals
          // to double via int128 (double-rounding above 2^53); at scale 4 the
          // scaled integer stays exact and both engines round identically
          dbl(round(sum(col("l_extendedprice").cast(DecimalType(12, 2))
            * (lit(1) - col("l_discount")).cast(DecimalType(6, 4))
            * (lit(1) + col("l_tax")).cast(DecimalType(6, 4))), 4)).as("sum_charge"),
          (dbl(sum(dec2(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    Entry("q17_distinct_agg", Some(
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))
    },

    Entry("q18_rollup", Some(
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderpriority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP(CAST(year(o_orderdate) AS BIGINT), o_orderpriority)
        |ORDER BY y NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)) { (s, d) =>
      table(s, d, "orders")
        .withColumn("y", year(col("o_orderdate")).cast("long"))
        .rollup(col("y"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dbl(sum(dec2(col("o_totalprice")))).as("total"))
        .orderBy(asc_nulls_first("y"), asc_nulls_first("o_orderpriority"))
    },

    Entry("q19_cube", Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ---- window functions ---------------------------------------------
    Entry("q20_window_rank", Some(
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
        |         CAST(rank()       OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
        |         CAST(dense_rank() OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
        |  FROM orders) t
        |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin)) { (s, d) =>
      val wFull = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wTies = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc)
      table(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(wFull).cast("long"))
        .withColumn("rnk", rank().over(wTies).cast("long"))
        .withColumn("drnk", dense_rank().over(wTies).cast("long"))
        .where(col("rn") <= 5)
        .orderBy(col("o_orderpriority"), col("rn"))
    },

    Entry("q21_window_analytic", Some(
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice)  OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       first_value(o_orderkey) OVER w AS first_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderkey")).over(w).as("first_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    Entry("q22_window_frames", Some(
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
        |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS cnt_4
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("running_spend"),
          count(lit(1)).over(w.rowsBetween(-3, Window.currentRow)).as("cnt_4"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- sort / limit / top-k -----------------------------------------
    Entry("q23_topk", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)) { (s, d) =>
      table(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- set operations ------------------------------------------------
    Entry("q24_union", Some(
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)) { (s, d) =>
      table(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(table(s, d, "supplier").select(col("s_nationkey")))
        .distinct()
        .orderBy(col("nk"))
    },

    Entry("q25_intersect", Some(
      """SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY ck""".stripMargin)) { (s, d) =>
      val o = table(s, d, "orders")
      o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("ck"))
        .intersect(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("ck"))
    },

    Entry("q26_except", Some(
      """SELECT c_custkey AS ck FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY ck""".stripMargin)) { (s, d) =>
      table(s, d, "customer").select(col("c_custkey").as("ck"))
        .except(table(s, d, "orders").select(col("o_custkey")))
        .orderBy(col("ck"))
    },

    Entry("q27_distinct", Some(
      """SELECT DISTINCT o_orderpriority, o_orderstatus
        |FROM orders ORDER BY o_orderpriority, o_orderstatus""".stripMargin)) { (s, d) =>
      table(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"))
        .distinct()
        .orderBy(col("o_orderpriority"), col("o_orderstatus"))
    },

    // ---- scalar functions ---------------------------------------------
    Entry("q28_string_funcs", Some(
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_u,
        |       substr(p_name, 1, 10) AS name10,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('|', p_brand, p_type) AS bt,
        |       replace(p_type, ' ', '_') AS type_u,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin)) { (s, d) =>
      table(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
        .orderBy(col("p_partkey"))
    },

    Entry("q29_date_funcs", Some(
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |       CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
        |       date_trunc('month', o_orderdate) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      table(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("dow_iso"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey"))
    },

    Entry("q30_math_funcs", Some(
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS d_abs,
        |       CAST(floor(l_quantity) AS BIGINT) AS q_floor,
        |       CAST(ceil(l_quantity) AS BIGINT) AS q_ceil,
        |       CAST(floor(l_quantity) AS BIGINT) % 7 AS q_mod,
        |       sqrt(l_extendedprice) AS price_sqrt,
        |       l_quantity * l_quantity AS q_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("d_abs"),
        floor(col("l_quantity")).cast("long").as("q_floor"),
        ceil(col("l_quantity")).cast("long").as("q_ceil"),
        (floor(col("l_quantity")).cast("long") % 7).as("q_mod"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        (col("l_quantity") * col("l_quantity")).as("q_sq"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    Entry("q31_case_coalesce", Some(
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS size_tier,
        |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2
        |FROM orders ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      table(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("size_tier"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"))
        .orderBy(col("o_orderkey"))
    },

    // ---- dictionary encode (reference sensor-log.rs:27-105) ------------
    // rank-by-key id assignment WITHOUT a global window: denseRankIds
    // range-partitions and offsets per-partition row numbers — same values
    // as dense_rank() OVER (ORDER BY key), scale-safe plan.
    Entry("q32_dict_encode", Some(
      """SELECT p_brand, CAST(dense_rank() OVER (ORDER BY p_brand) AS BIGINT) AS brand_id
        |FROM (SELECT DISTINCT p_brand FROM part) t
        |ORDER BY p_brand""".stripMargin)) { (s, d) =>
      graft.ingest.Ingest.denseRankIds(
          table(s, d, "part").select(col("p_brand")).distinct(),
          Seq("p_brand"), "brand_id")
        .orderBy(col("p_brand"))
    },

    // ---- parse + type coercion (reference sensor-log.rs:123-175) --------
    // Round-trip: format ts with am/pm dots (as in the reference's input),
    // normalize 'p.m.' -> 'PM', parse back, fixed-point encode the price.
    Entry("q33_parse_coercion", Some(
      """WITH raw AS (
        |  SELECT o_orderkey,
        |         strftime(o_orderdate, '%d/%m/%Y %I:%M:%S ')
        |           || CASE WHEN strftime(o_orderdate,'%p') = 'AM' THEN 'a.m.' ELSE 'p.m.' END AS line,
        |         o_totalprice
        |  FROM orders)
        |SELECT o_orderkey,
        |       strptime(replace(replace(line, 'a.m.', 'AM'), 'p.m.', 'PM'),
        |                '%d/%m/%Y %I:%M:%S %p') AS parsed_ts,
        |       CAST(round(o_totalprice * 1000) AS BIGINT) AS price_mils
        |FROM raw ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      table(s, d, "orders")
        .withColumn("line",
          concat(date_format(col("o_orderdate"), "dd/MM/yyyy hh:mm:ss "),
            when(date_format(col("o_orderdate"), "a") === "AM", "a.m.").otherwise("p.m.")))
        .select(
          col("o_orderkey"),
          to_timestamp(
            regexp_replace(regexp_replace(col("line"), "a\\.m\\.", "AM"), "p\\.m\\.", "PM"),
            "dd/MM/yyyy hh:mm:ss a").as("parsed_ts"),
          round(col("o_totalprice") * 1000).cast("long").as("price_mils"))
        .orderBy(col("o_orderkey"))
    },

    // ---- time bucketing (streaming-window analog, batch form) ----------
    Entry("q34_time_bucket", Some(
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour_bucket""".stripMargin)) { (s, d) =>
      table(s, d, "events")
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dbl(sum(dec2(col("value")))).as("sum_value"))
        .orderBy(col("hour_bucket"))
    },

    // ---- json functions -------------------------------------------------
    Entry("q38_json_funcs", Some(
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract(props, '$.k') AS BIGINT) * 2 + length(event_type) AS derived
        |FROM events ORDER BY event_id""".stripMargin)) { (s, d) =>
      table(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        get_json_object(col("props"), "$.k").as("k_str"),
        (get_json_object(col("props"), "$.k").cast("long") * 2 +
          length(col("event_type"))).as("derived"))
        .orderBy(col("event_id"))
    },

    // ---- array functions ------------------------------------------------
    Entry("q39_array_funcs", Some(
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS n_dims,
        |       CAST(embedding[1] AS DOUBLE) AS first_dim,
        |       list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS max_dim,
        |       list_reduce(list_transform(list_slice(embedding, 1, 8),
        |                                  x -> CAST(x AS DOUBLE)), (a, b) -> a + b) AS head_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin)) { (s, d) =>
      table(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        element_at(col("embedding"), 1).cast("double").as("first_dim"),
        array_max(transform(col("embedding"), x => x.cast("double"))).as("max_dim"),
        aggregate(transform(slice(col("embedding"), 1, 8), x => x.cast("double")),
          lit(0.0), (a, b) => a + b).as("head_sum"))
        .orderBy(col("vec_id"))
    },

    // ---- grouping sets --------------------------------------------------
    Entry("q36_grouping_sets", Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) { (s, d) =>
      sql(s, d, Seq("lineitem"),
        """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // ---- approximate aggregation (HLL) ----------------------------------
    // No oracle: HLL sketches are implementation-specific; the driver
    // records a rows-only check. The exact counterpart is q17_distinct_agg.
    Entry("q37_approx_distinct", None) { (s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy(col("l_returnflag"))
    },

    // ---- replayable HLL (graft-native sketch, hash-exact oracle) -------
    // Unlike q37's built-in HLL++, graft.operators.Hll defines the sketch
    // in portable integer arithmetic over the battery's 56-bit md5 hash,
    // so DuckDB replays registers, sum, and estimate bit-for-bit.
    Entry("q102_hll_sketch", Some(
      """WITH h AS (SELECT l_returnflag,
        |                  (('0x' || substr(md5('pk:' || CAST(l_partkey AS VARCHAR)), 1, 14))::BIGINT) AS h
        |           FROM lineitem),
        |b AS (SELECT l_returnflag, h % 64 AS b, h // 64 AS w FROM h),
        |r AS (SELECT l_returnflag, b,
        |             max(least(bit_count((w & -w) - 1) + 1, 46)) AS m
        |      FROM b GROUP BY 1, 2),
        |t AS (SELECT l_returnflag,
        |             CAST(sum(1::BIGINT << (46 - m))
        |                  + (64 - count(*)) * (1::BIGINT << 46) AS BIGINT) AS t
        |      FROM r GROUP BY 1),
        |e AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        |      FROM lineitem GROUP BY 1)
        |SELECT t.l_returnflag,
        |       CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |         * CAST(70368744177664 AS DOUBLE) / CAST(t AS DOUBLE) AS est_parts,
        |       e.exact_parts
        |FROM t JOIN e ON t.l_returnflag = e.l_returnflag
        |ORDER BY t.l_returnflag""".stripMargin)) { (s, d) =>
      val li = table(s, d, "lineitem")
      val hashed = li.select(col("l_returnflag"),
        conv(substring(md5(concat(lit("pk:"), col("l_partkey").cast("string"))),
          1, 14), 16, 10).cast("long").as("h"))
      val est = graft.operators.Hll
        .approxDistinct(hashed, Seq("l_returnflag"), "h")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("est_distinct").as("est_parts"),
          col("exact_parts"))
        .orderBy(col("l_returnflag"))
    },

    // ---- replayable Count-Min sketch (hash-exact oracle) ---------------
    // Heavy-hitter frequency estimation: graft.operators.CountMin, like
    // q102's HLL, is defined in portable integer arithmetic (int64 sums
    // and mins over the 56-bit md5 hash — no floating point at all), so
    // DuckDB replays every counter and every estimate exactly. est_cnt ≥
    // exact_cnt always (CM overestimates only, on slot collisions).
    Entry("q104_count_min", Some(
      """WITH d(i) AS (VALUES (0),(1),(2),(3)),
        |pairs AS (SELECT l_partkey, i,
        |                 (('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR)), 1, 14))::BIGINT) % 256 AS slot
        |          FROM lineitem CROSS JOIN d),
        |cms AS (SELECT i, slot, count(*) AS c FROM pairs GROUP BY 1, 2),
        |k AS (SELECT l_partkey, count(*) AS exact_cnt FROM lineitem GROUP BY 1),
        |kslot AS (SELECT DISTINCT l_partkey, i, slot FROM pairs),
        |est AS (SELECT l_partkey, CAST(min(coalesce(c, 0)) AS BIGINT) AS est_cnt
        |        FROM kslot LEFT JOIN cms USING (i, slot) GROUP BY 1)
        |SELECT k.l_partkey, est_cnt, exact_cnt
        |FROM k JOIN est USING (l_partkey)
        |ORDER BY est_cnt DESC, k.l_partkey LIMIT 20""".stripMargin)) { (s, d) =>
      import graft.operators.CountMin
      val keys = table(s, d, "lineitem").select(col("l_partkey"))
      val cms = CountMin.sketch(keys, Nil, "l_partkey")
      val est = CountMin.estimate(cms, keys, Nil, "l_partkey")
      val exact = keys.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("l_partkey"))
        .select(col("l_partkey"), col("est_cnt"), col("exact_cnt"))
        .orderBy(col("est_cnt").desc, col("l_partkey"))
        .limit(20)
    },

    // ---- replayable histogram quantiles (hash-exact oracle) ------------
    // The third mergeable sketch (HLL q102, Count-Min q104): rank
    // statistics from a fixed power-of-two binning — bin = floor(x/64) is
    // an exact exponent shift even on fractional doubles, the rank
    // ceil(p*n) is pure int64 rational arithmetic, and the estimate is a
    // bin lower edge, so DuckDB replays every estimate bit-for-bit where
    // percentile_approx/approx_quantile (KLL/t-digest) could gate
    // rows-only at best. The quantile scan runs over BIN rows (a window
    // over the sketch), never the data. q54 keeps the exact counterpart.
    Entry("q107_hist_quantile", Some(
      """WITH h AS (SELECT l_returnflag,
        |                  CAST(floor(l_extendedprice / 64.0) AS BIGINT) AS bin,
        |                  count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, bin, cnt,
        |             sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
        |             sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |      FROM h),
        |p(p_num, p_den) AS (VALUES (1, 2), (9, 10), (99, 100)),
        |x AS (SELECT l_returnflag, p_num, p_den, min(bin) AS b
        |      FROM c CROSS JOIN p
        |      WHERE cum >= (n * p_num + p_den - 1) // p_den
        |      GROUP BY 1, 2, 3)
        |SELECT l_returnflag, p_num, p_den, CAST(b * 64 AS BIGINT) AS est
        |FROM x ORDER BY l_returnflag, p_num, p_den""".stripMargin)) { (s, d) =>
      import graft.operators.HistQuantile
      val li = table(s, d, "lineitem")
      val h = HistQuantile.histogram(li, Seq("l_returnflag"), "l_extendedprice", 64L)
      HistQuantile.quantiles(h, Seq("l_returnflag"), 64L,
          Seq((1, 2), (9, 10), (99, 100)))
        .orderBy(col("l_returnflag"), col("p_num"), col("p_den"))
    },

    // ---- exact percentiles ---------------------------------------------
    // Over the integer-valued l_quantity so linear interpolation lands on
    // exact .0/.5 doubles — engine-formula differences can't show up.
    Entry("q54_percentiles", Some(
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS median_qty,
        |       quantile_cont(l_quantity, 0.25) AS p25_qty,
        |       quantile_cont(l_quantity, 0.75) AS p75_qty,
        |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) { (s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_quantity"), lit(0.25)).as("p25_qty"),
          percentile(col("l_quantity"), lit(0.75)).as("p75_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    },

    // ---- typed UDAF: per-group top-k with O(k) shuffle ------------------
    // graft.functions.TopKAggregator as a battery query: each partition
    // keeps only its k best (score, id) pairs and the merge is k-way, so
    // the shuffle carries O(k·groups) instead of the full input — the
    // partial-aggregation shape a window row_number() <= k cannot give
    // (a window sorts every row of every group). Same answer as the
    // window form; the oracle IS the window form.
    Entry("q58_grouped_topk", Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)) { (s, d) =>
      import s.implicits._
      val src = table(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .as[(String, Long, Double)]
      val topk = new graft.functions.TopKAggregator(3).toColumn
      src.groupByKey(_._1)
        .mapValues(t => graft.functions.Scored(t._2, t._3))
        .agg(topk)
        .flatMap { case (p, xs) =>
          xs.zipWithIndex.map { case (sc, i) => (p, sc.id, sc.score, (i + 1).toLong) }
        }
        .toDF("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy(col("o_orderpriority"), col("rn"))
    },

    // grouped top-k again, one integration tier deeper than q58's typed
    // Aggregator: graft.functions.TopKScored is a Catalyst
    // TypedImperativeAggregate with a primitive-array buffer (16
    // bytes/entry serialized, no encoder round-trip per merge), registered
    // as SQL function topk_scored(id, score, k). Same O(k)-per-group
    // shuffle story; the oracle is the window form.
    Entry("q74_topk_native_udaf", Some(
      """SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS score, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) rn
        |  FROM documents) t
        |WHERE rn <= 5 ORDER BY source, rn""".stripMargin)) { (s, d) =>
      import graft.functions.TopKScored
      TopKScored.register(s)
      table(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars").cast("double").as("score"))
        .groupBy(col("source"))
        .agg(TopKScored.topkCol(col("doc_id"), col("score"), 5).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"), col("col.score").as("score"),
          (col("pos") + 1).cast("long").as("rn"))
        .orderBy(col("source"), col("rn"))
    },

    // ---- fixed-size per-group sampling (priority sampling) -------------
    // k docs per source, uniform without replacement, DETERMINISTIC:
    // priority = 52-bit md5 hash of the key (exact in a double — 56 bits
    // would not be), take the k highest via the native O(k) top-k
    // aggregate. This is distributed reservoir sampling done right at
    // 100 TB: each partition reduces to ≤ k rows per group map-side, no
    // per-group sort of the data ever happens — the oracle's own
    // window/row_number spelling (which DOES sort each partition) defines
    // the semantics, the TopKScored plan beats it. Complements q61's
    // rate-based Bernoulli hash sampling: here the output SIZE is exact.
    Entry("q110_group_sample", Some(
      """WITH pri AS (SELECT source, doc_id,
        |         CAST(((('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT) // 16) AS DOUBLE) AS pri
        |         FROM documents)
        |SELECT source, doc_id, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id) rn
        |  FROM pri) t
        |WHERE rn <= 10 ORDER BY source, rn""".stripMargin)) { (s, d) =>
      import graft.functions.TopKScored
      TopKScored.register(s)
      val pri = expr(
        "cast((cast(conv(substring(md5(concat('s:', cast(doc_id as string))), 1, 14), 16, 10) as bigint) div 16) as double)")
      table(s, d, "documents")
        .select(col("source"), col("doc_id"), pri.as("pri"))
        .groupBy(col("source"))
        .agg(TopKScored.topkCol(col("doc_id"), col("pri"), 10).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("rn"))
        .orderBy(col("source"), col("rn"))
    },

    // ---- pivot (wide aggregation) --------------------------------------
    // Dataset.pivot with an explicit value list (deterministic columns; an
    // inferred list would be a distinct scan) — one hash aggregate, cells
    // as decimal-exact sums. The oracle is the CASE-sum spelling, which is
    // exactly the rewrite Spark's pivot performs.
    Entry("q59_pivot", Some(
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_F,
        |       CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_O,
        |       CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_F,
        |       CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) { (s, d) =>
      // coalesce the cells: an absent (flag, status) combination is NULL
      // from Spark's pivot rewrite but 0 from the oracle's ELSE-0 CASE
      // spelling — latent on this corpus (all six combos exist at every
      // SF) but a real divergence on e.g. true TPC-H distributions
      table(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").cast("decimal(18,2)").as("p"))
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("p")).as("rev"), count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          coalesce(col("F_rev").cast("double"), lit(0.0)).as("rev_F"),
          coalesce(col("O_rev").cast("double"), lit(0.0)).as("rev_O"),
          coalesce(col("F_n").cast("long"), lit(0L)).as("n_F"),
          coalesce(col("O_n").cast("long"), lit(0L)).as("n_O"))
        .orderBy(col("l_returnflag"))
    },

    // ---- unpivot / melt (long-form reshape, pivot's inverse) -----------
    // Dataset.unpivot — no shuffle at all (a Generate over the scan); the
    // oracle is the UNION-ALL spelling every engine agrees on.
    Entry("q60_unpivot", Some(
      """SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin)) { (s, d) =>
      table(s, d, "part")
        .select(col("p_partkey"),
          col("p_retailprice").cast("double"), col("p_size").cast("double"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    },

    // ---- scalar subquery ------------------------------------------------
    Entry("q35_scalar_subquery", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                             / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)) { (s, d) =>
      sql(s, d, Seq("orders"),
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |                             / count(*) FROM orders)
          |ORDER BY o_orderkey""".stripMargin)
    }
  )
}
