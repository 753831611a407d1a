package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational surface of the engine (SURVEY.md §2B).
  *
  * The reference delegates all of this to Hive/MapReduce over its SerDe
  * (`/root/reference/hadoop-pcap-serde/README.md:21-60`,
  * `/root/reference/hadoop-pcap-lib/README.md:20-81`); here each capability
  * is expressed Spark-first with the DataFrame/Dataset API (or `spark.sql`
  * where the SQL path itself is the thing under test) and verified against a
  * DuckDB oracle.
  *
  * Scale notes (100 TB design intent, per query):
  *   - filters/projections are applied before joins/aggs so parquet scans
  *     get pushdown + pruning;
  *   - small dimensions (region/nation/supplier/part at TPC-H ratios) are
  *     broadcast explicitly; fact-fact joins shuffle on their join key and
  *     rely on AQE for skew;
  *   - aggregations are partial (map-side) automatically since all are
  *     built-in hash aggregates;
  *   - top-k uses orderBy+limit which plans as TakeOrderedAndProject
  *     (per-partition heap, no full sort/shuffle of the data).
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  /** exact decimal sum of a double expression, returned as DOUBLE */
  private def dsum2(c: Column): Column = sum(dec2(c)).cast("double")
  private def dsum6(c: Column): Column = sum(dec6(c)).cast("double")

  val defs: Seq[Q] = Seq(

    // ----- aggregation: hash agg w/ partial+final, multiple aggregates -----
    Q("q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum2($"l_quantity").as("sum_qty"),
            dsum2($"l_extendedprice").as("sum_base_price"),
            dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .as("sum_disc_price"),
            (dsum2($"l_quantity") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus"""),
      headline = true),

    // ----- scan: selective filter + narrow projection (pushdown/pruning) ---
    Q("q02_filter_project",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .filter($"p_size" >= 30 && $"p_type".isin("PROMO", "ECONOMY"))
          .select($"p_partkey", $"p_name", $"p_retailprice")
      },
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
        WHERE p_size >= 30 AND p_type IN ('PROMO','ECONOMY')""")),

    // ----- star join: broadcast dims, shuffle facts (TPC-H Q5 shape) ------
    Q("q03_revenue_by_nation",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord  = Tables.orders(s, d)
        val li   = Tables.lineitem(s, d)
        val nat  = Tables.nation(s, d)
        val reg  = Tables.region(s, d).filter($"r_name" === "EUROPE")
        cust
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .join(ord, $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .groupBy($"n_name")
          .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY n_name"""),
      headline = true),

    // ----- semi join (EXISTS), TPC-H Q4 shape -----------------------------
    Q("q04_semi_join",
      (s, d) => {
        import s.implicits._
        val ord = Tables.orders(s, d)
        val bigItems = Tables.lineitem(s, d)
          .filter($"l_quantity" > 45).select($"l_orderkey")
        ord.join(bigItems, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority""")),

    // ----- anti join (NOT EXISTS) -----------------------------------------
    Q("q05_anti_join",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord  = Tables.orders(s, d)
          .filter($"o_orderstatus" === "P").select($"o_custkey")
        cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY c_mktsegment""")),

    // ----- window: ranking with deterministic tiebreak --------------------
    Q("q06_window_rank",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn <= 3""")),

    // ----- window: running (cumulative) aggregate, exact decimal ----------
    Q("q07_window_running",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select($"event_id", $"user_id",
            sum(dec2($"value")).over(w).cast("double").as("running_value"))
      },
      Some("""SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_value
        FROM events""")),

    // ----- top-k: TakeOrderedAndProject, no full sort ---------------------
    Q("q08_topk",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(10)
          .select($"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // ----- set operations: UNION (distinct) then EXCEPT -------------------
    Q("q09_setops",
      (s, d) => {
        import s.implicits._
        val building = Tables.customer(s, d)
          .filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey".as("custkey"))
        val rich = Tables.customer(s, d)
          .filter($"c_acctbal" > 9000.0)
          .select($"c_custkey".as("custkey"))
        val pending = Tables.orders(s, d)
          .filter($"o_orderstatus" === "P")
          .select($"o_custkey".as("custkey"))
        building.union(rich).distinct().except(pending)
      },
      Some("""SELECT c_custkey AS custkey FROM customer
          WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
          WHERE o_orderstatus = 'P'""")),

    // ----- rollup ---------------------------------------------------------
    Q("q10_rollup",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), dsum2($"l_quantity").as("sum_qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // ----- cube -----------------------------------------------------------
    Q("q11_cube",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ----- grouping sets (SQL path) ---------------------------------------
    Q("q12_grouping_sets",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
          FROM customer
          GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""")
      },
      Some("""SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""")),

    // ----- exact distinct aggregation -------------------------------------
    Q("q13_distinct",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_partkey", $"l_suppkey").as("n_part_supp"),
          count(lit(1)).as("n_rows"))
      },
      Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps,
        COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        COUNT(*) AS n_rows FROM lineitem""")),

    // ----- scalar string functions ----------------------------------------
    Q("q14_string_funcs",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d).select(
          $"p_partkey",
          upper($"p_name").as("up_name"),
          length($"p_name").as("name_len"),
          substring($"p_name", 1, 5).as("name5"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
          regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
          lpad($"p_brand", 12, "*").as("brand_pad"))
      },
      Some("""SELECT p_partkey,
        UPPER(p_name) AS up_name,
        CAST(LENGTH(p_name) AS INT) AS name_len,
        SUBSTR(p_name, 1, 5) AS name5,
        CONCAT(p_brand, ':', p_type) AS brand_type,
        REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
        LPAD(p_brand, 12, '*') AS brand_pad
        FROM part""")),

    // ----- date/time functions --------------------------------------------
    Q("q15_date_funcs",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(
            year($"o_orderdate").as("o_year"),
            month($"o_orderdate").as("o_month"),
            quarter($"o_orderdate").as("o_quarter"))
          .groupBy($"o_year", $"o_month", $"o_quarter")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
        CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS o_quarter,
        COUNT(*) AS n
        FROM orders GROUP BY 1, 2, 3""")),

    // ----- conditional aggregation (TPC-H Q14 shape) ----------------------
    Q("q16_case_agg",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val pt = Tables.part(s, d).select($"p_partkey", $"p_type")
        li.join(broadcast(pt), $"l_partkey" === $"p_partkey")
          .agg(
            (sum(when($"p_type" === "PROMO",
                dec6($"l_extendedprice" * (lit(1.0) - $"l_discount")))
              .otherwise(dec6(lit(0.0)))).cast("double") /
             sum(dec6($"l_extendedprice" * (lit(1.0) - $"l_discount")))
              .cast("double")).as("promo_ratio"))
      },
      Some("""SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
          ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
          AS DOUBLE) AS promo_ratio
        FROM lineitem JOIN part ON l_partkey = p_partkey""")),

    // ----- having ---------------------------------------------------------
    Q("q17_having",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n_items"))
          .filter($"n_items" > 250)
      },
      Some("""SELECT l_suppkey, COUNT(*) AS n_items FROM lineitem
        GROUP BY l_suppkey HAVING COUNT(*) > 250""")),

    // ----- uncorrelated scalar subquery (SQL path) ------------------------
    Q("q18_scalar_subquery",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_totalprice > 1.8 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) FROM orders)""")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.8 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) FROM orders)""")),

    // ----- sessionization: lag + gap detection + two-level agg ------------
    Q("q19_sessionize",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
        Tables.events(s, d)
          .select($"user_id", $"event_id", $"ts")
          .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
          .withColumn("new_session",
            when($"prev_us".isNull ||
                 unix_micros($"ts") - $"prev_us" > 1800000000L, 1L)
              .otherwise(0L))
          .groupBy($"user_id")
          .agg(sum($"new_session").as("n_sessions"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
          COUNT(*) AS n_events
        FROM (
          SELECT user_id,
            CASE WHEN prev_us IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, ts,
              LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
                PARTITION BY user_id ORDER BY event_id ASC) AS prev_us
            FROM events))
        GROUP BY user_id""")),

    // ----- time bucketing (tumbling window, batch form) -------------------
    Q("q20_hourly_events",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(
            dayofmonth($"ts").as("e_day"),
            hour($"ts").as("e_hour"),
            $"event_type")
          .agg(count(lit(1)).as("n"), dsum2($"value").as("sum_value"))
      },
      Some("""SELECT CAST(EXTRACT(day FROM ts) AS INT) AS e_day,
        CAST(EXTRACT(hour FROM ts) AS INT) AS e_hour, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2, 3""")),

    // ----- semi-structured: JSON field extraction -------------------------
    Q("q21_json_extract",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(get_json_object($"props", "$.k").cast("int").as("k"))
          .groupBy($"k")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        COUNT(*) AS n FROM events GROUP BY 1""")),

    // ----- 6-table star join (TPC-H Q5 with local-supplier condition) -----
    Q("q22_local_supplier_volume",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        Tables.customer(s, d)
          .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .join(broadcast(Tables.supplier(s, d)),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(Tables.nation(s, d)),
            $"s_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
          .groupBy($"n_name")
          .agg(dsum6($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("revenue"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name"""),
      headline = true),

    // ----- pivot (conditional-aggregation equivalent in the oracle) -------
    Q("q23_pivot",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .pivot($"o_orderstatus", Seq("F", "O", "P"))
          .count()
      },
      // NULLIF: Spark's pivot yields NULL (not 0) for an empty cell
      Some("""SELECT o_orderpriority,
        NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS "F",
        NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS "O",
        NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS "P"
        FROM orders GROUP BY o_orderpriority""")),

    // ----- correlated scalar subquery (TPC-H Q17 shape, decorrelated) ----
    Q("q25_correlated_subquery",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS total_price,
          COUNT(*) AS n_items
          FROM lineitem
          WHERE l_quantity < (
            SELECT 0.4 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*))
            FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""")
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_price,
        COUNT(*) AS n_items
        FROM lineitem
        WHERE l_quantity < (
          SELECT 0.4 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                        / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""")),

    // ----- range (band) join on event time ------------------------------
    Q("q26_range_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
            $"event_type")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("purchase_id"),
            $"us".as("pus"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id".as("cu"), $"event_id".as("click_id"),
            $"us".as("cus"))
        // clicks within 30 min before each purchase by the same user
        purchases.join(clicks,
            $"user_id" === $"cu" &&
            $"cus" >= $"pus" - 1800000000L && $"cus" < $"pus")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_attributed"),
            countDistinct($"purchase_id").as("n_purchases"))
      },
      Some("""SELECT p.user_id, COUNT(*) AS n_attributed,
        COUNT(DISTINCT p.event_id) AS n_purchases
        FROM (SELECT user_id, event_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS pus FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, event_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS cus FROM events
              WHERE event_type = 'click') c
          ON p.user_id = c.user_id
          AND c.cus >= p.pus - 1800000000 AND c.cus < p.pus
        GROUP BY p.user_id""")),

    // ----- as-of join: latest prior click per purchase -------------------
    Q("q28_asof_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
            $"event_type")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("purchase_id"), $"us".as("pus"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id".as("cu"), $"us".as("cus"))
        // as-of = band join + max-per-left; DuckDB expresses the same
        // operator natively as ASOF JOIN (the oracle)
        purchases.join(clicks, $"user_id" === $"cu" && $"cus" <= $"pus")
          .groupBy($"purchase_id", $"user_id", $"pus")
          .agg(max($"cus").as("prev_click_us"))
          .select($"purchase_id", $"user_id",
            ($"pus" - $"prev_click_us").as("gap_us"))
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
          p.pus - c.cus AS gap_us
        FROM (SELECT user_id, event_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS pus FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS cus FROM events
              WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.pus >= c.cus""")),

    // ----- salted two-phase aggregation (skew mitigation pattern) --------
    // Identical result to a plain groupBy — the oracle is the plain SQL —
    // but phase 1 spreads a hot key over 16 salt buckets before the
    // final combine. Decimal partials keep both phases exact.
    Q("q29_salted_agg",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("salt", pmod($"event_id", lit(16)))
          .groupBy($"event_type", $"salt")
          .agg(count(lit(1)).as("pn"),
            sum(dec2($"value")).as("psum"))
          .groupBy($"event_type")
          .agg(sum($"pn").as("n"),
            sum($"psum").cast("double").as("sum_value"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type""")),

    // ----- outer joins: full outer with nulls on both sides --------------
    Q("q30_outer_join",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
          .filter($"c_acctbal" > 9500.0)
          .select($"c_custkey", $"c_acctbal")
        val bigOrders = Tables.orders(s, d)
          .filter($"o_totalprice" > 450000.0)
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_big"))
        cust.join(bigOrders, $"c_custkey" === $"o_custkey", "full_outer")
          .select(
            coalesce($"c_custkey", $"o_custkey").as("custkey"),
            $"c_acctbal", $"n_big")
      },
      Some("""SELECT COALESCE(c_custkey, o_custkey) AS custkey,
          c_acctbal, n_big
        FROM (SELECT c_custkey, c_acctbal FROM customer
              WHERE c_acctbal > 9500.0) c
        FULL OUTER JOIN (
          SELECT o_custkey, COUNT(*) AS n_big FROM orders
          WHERE o_totalprice > 450000.0 GROUP BY o_custkey) o
        ON c_custkey = o_custkey""")),

    // ----- window RANGE frame: 7-day trailing sum per supplier -----------
    Q("q31_range_frame",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, d)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            (unix_micros($"l_shipdate".cast("timestamp")) / 1000000L)
              .cast("long").as("ship_s"),
            dec2($"l_quantity").as("qty_dec"))
        val w = Window.partitionBy($"l_suppkey").orderBy($"ship_s")
          .rangeBetween(-7L * 86400, 0)
        li.select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            sum($"qty_dec").over(w).cast("double").as("qty_7d"))
          .filter($"l_suppkey" < 20)
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          PARTITION BY l_suppkey ORDER BY epoch(CAST(l_shipdate AS TIMESTAMP))
          RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_7d
        FROM lineitem WHERE l_suppkey < 20""")),

    // ----- deterministic math scalar functions ---------------------------
    // sqrt is IEEE-exact; abs/sign/floor/ceil/mod/greatest/least are
    // integer-or-exact — no libm cross-engine drift (pow/log/exp excluded
    // deliberately).
    Q("q32_math_funcs",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d).select(
          $"p_partkey",
          abs($"p_retailprice" - 1000.0).as("abs_dev"),
          sqrt($"p_retailprice").as("sqrt_price"),
          floor($"p_retailprice").cast("long").as("floor_price"),
          ceil($"p_retailprice").cast("long").as("ceil_price"),
          signum($"p_retailprice" - 1000.0).as("sign_dev"),
          ($"p_size" % 7).as("size_mod7"),
          greatest($"p_size", lit(25)).as("size_floor25"))
      },
      Some("""SELECT p_partkey,
        abs(p_retailprice - 1000.0) AS abs_dev,
        sqrt(p_retailprice) AS sqrt_price,
        CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sign_dev,
        CAST(p_size % 7 AS INT) AS size_mod7,
        CAST(greatest(p_size, 25) AS INT) AS size_floor25
        FROM part""")),

    // ----- approximate sketches: HLL + quantile summaries ----------------
    // DuckDB's approx algorithms differ by construction, so the raw
    // estimates can't hash-match. Instead the query returns the EXACT
    // values (oracled against DuckDB) plus booleans asserting each sketch
    // estimate landed inside its error bound — Spark computes both sketch
    // and exact side, DuckDB re-computes the exact side and pins TRUE.
    Q("q27_sketches",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).agg(
          countDistinct($"l_partkey").as("exact_parts"),
          approx_count_distinct($"l_partkey").as("hll_parts"),
          countDistinct($"l_orderkey").as("exact_orders"),
          approx_count_distinct($"l_orderkey").as("hll_orders"),
          percentile_approx($"l_extendedprice", lit(0.5), lit(10000))
            .as("apx_median"),
          expr("percentile(l_extendedprice, 0.49)").as("p49"),
          expr("percentile(l_extendedprice, 0.51)").as("p51"),
          percentile_approx($"l_quantity", lit(0.95), lit(10000))
            .as("apx_p95"),
          expr("percentile(l_quantity, 0.94)").as("p94"),
          expr("percentile(l_quantity, 0.96)").as("p96"))
          .select(
            $"exact_parts",
            // default HLL++ rsd is 5%; 3x that is a deterministic-pass
            // bound (the sketch itself is deterministic for fixed input)
            (abs($"hll_parts" - $"exact_parts") <=
              $"exact_parts" * 0.15).as("hll_parts_ok"),
            $"exact_orders",
            (abs($"hll_orders" - $"exact_orders") <=
              $"exact_orders" * 0.15).as("hll_orders_ok"),
            ($"apx_median" >= $"p49" && $"apx_median" <= $"p51")
              .as("median_ok"),
            ($"apx_p95" >= $"p94" && $"apx_p95" <= $"p96").as("p95_ok"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS exact_parts,
        TRUE AS hll_parts_ok,
        count(DISTINCT l_orderkey) AS exact_orders,
        TRUE AS hll_orders_ok,
        TRUE AS median_ok,
        TRUE AS p95_ok
        FROM lineitem""")),

    // ----- navigation/distribution window suite: lead, first_value, ntile -
    // (lag is covered by q19 sessionization.) Ordering is total
    // (o_orderkey unique per partition), so every function is
    // deterministic; days_to_next is an exact integer date diff, null on
    // each customer's last order in both engines.
    Q("q35_window_suite",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
        Tables.orders(s, d).filter($"o_custkey" < 50)
          .select($"o_custkey", $"o_orderkey",
            datediff(lead($"o_orderdate", 1).over(w), $"o_orderdate")
              .as("days_to_next"),
            first($"o_totalprice").over(w).as("first_price"),
            ntile(4).over(w).as("cust_quartile"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(date_diff('day', CAST(o_orderdate AS DATE),
          CAST(LEAD(o_orderdate, 1) OVER w AS DATE)) AS INT) AS days_to_next,
        FIRST_VALUE(o_totalprice) OVER w AS first_price,
        CAST(NTILE(4) OVER w AS INT) AS cust_quartile
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""")),

    // ----- ordered funnel: view -> click -> purchase ----------------------
    // Classic product-analytics funnel with ORDER constraints: a click
    // only counts after the user's first view, a purchase only after that
    // click. Three chained min-aggregations, all keyed on user_id — the
    // same hash partitioning is reused across every stage (one shuffle
    // key, Spark reuses the exchange), so at 100 TB the events scan
    // shuffles once per stage on the same key instead of resorting.
    // Timestamps compare as exact micros (BIGINT) on both engines.
    Q("q36_funnel",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"us").as("v_us"))
        val c = ev.filter($"event_type" === "click")
          .join(v, "user_id").filter($"us" >= $"v_us")
          .groupBy($"user_id").agg(min($"us").as("c_us"))
        val p = ev.filter($"event_type" === "purchase")
          .join(c, "user_id").filter($"us" >= $"c_us")
          .groupBy($"user_id").agg(min($"us").as("p_us"))
        ev.select($"user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(when($"p_us".isNotNull, 3).when($"c_us".isNotNull, 2)
            .when($"v_us".isNotNull, 1).otherwise(0).as("depth"))
          .groupBy($"depth").agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH ev AS (
          SELECT user_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        v AS (SELECT user_id, min(us) AS v_us FROM ev
          WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT ev.user_id, min(us) AS c_us FROM ev
          JOIN v USING (user_id)
          WHERE event_type = 'click' AND us >= v_us GROUP BY 1),
        p AS (SELECT ev.user_id, min(us) AS p_us FROM ev
          JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND us >= c_us GROUP BY 1),
        u AS (SELECT DISTINCT user_id FROM ev)
        SELECT CAST(CASE WHEN p_us IS NOT NULL THEN 3
                         WHEN c_us IS NOT NULL THEN 2
                         WHEN v_us IS NOT NULL THEN 1
                         ELSE 0 END AS INT) AS depth,
          COUNT(*) AS n_users
        FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
               LEFT JOIN p USING (user_id)
        GROUP BY 1""")),

    // ----- cohort retention matrix ----------------------------------------
    // Cohort = the epoch-week of a user's first event; each cell counts
    // the cohort's users active `week_offset` weeks later. Week ids are
    // integer floor-division of epoch micros (DIV in Spark, // in DuckDB
    // — identical for non-negative BIGINTs), so the whole query is exact
    // integer arithmetic. The distinct (user, week) reduction runs BEFORE
    // the join back to cohorts: at 100 TB the per-user-week activity set
    // is orders of magnitude smaller than the raw event stream, and both
    // the reduction and the join shuffle on user_id.
    Q("q37_retention",
      (s, d) => {
        import s.implicits._
        val uw = Tables.events(s, d)
          .select($"user_id",
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        val cohort = uw.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
        uw.join(cohort, "user_id")
          .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH uw AS (
          SELECT DISTINCT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
          FROM events),
        cohort AS (
          SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
        SELECT cohort_wk, wk - cohort_wk AS week_offset,
          COUNT(*) AS n_users
        FROM uw JOIN cohort USING (user_id)
        GROUP BY 1, 2""")),

    // ----- unpivot / melt -------------------------------------------------
    // Wide-to-long reshaping with the DataFrame unpivot API (plans as a
    // single Expand — one pass, no join, no shuffle beyond the input
    // aggregation). The oracle spells the same reshape as UNION ALL.
    // Measures are decimal-cast exact sums surfaced as DOUBLE.
    Q("q38_unpivot",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)")
              .as("sum_qty"),
            expr("cast(sum(cast(l_extendedprice as decimal(18,2))) as double)")
              .as("sum_price"),
            expr("cast(sum(cast(l_discount as decimal(18,2))) as double)")
              .as("sum_disc"))
          .unpivot(
            Array($"l_returnflag"),
            Array($"sum_qty", $"sum_price", $"sum_disc"),
            "measure", "value")
      },
      Some("""WITH a AS (
          SELECT l_returnflag,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_price,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_disc
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_disc', sum_disc FROM a""")),

    // ----- exact distributed percentiles ----------------------------------
    // Exact median and p90 by positional selection (row_number against
    // integer positions — no interpolation, no float quantile math, so
    // both engines agree bit-for-bit). The median of an even group is the
    // mean of the two middle values: quantities are integer-valued, so
    // v/2.0 is exact. p90 position is ceil(0.9n) in pure integer
    // arithmetic: (9n+9) div 10. This is the scalable exact-percentile
    // shape: one shuffle to rank within groups, one tiny aggregation —
    // contrast with q27's approx sketches for the 100 TB tradeoff.
    Q("q39_exact_median",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""
          WITH r AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
              ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_quantity) AS rn,
              COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
          SELECT l_returnflag,
            CAST(MAX(n) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2)
                          AND (n % 2 = 1 OR rn * 2 <> n + 1)
                          THEN q ELSE 0 END) AS DOUBLE)
              / CAST(CASE WHEN MAX(n) % 2 = 0 THEN 2 ELSE 1 END AS DOUBLE)
              AS median,
            CAST(MAX(CASE WHEN rn = (9 * n + 9) DIV 10 THEN q END)
                 AS BIGINT) AS p90
          FROM r GROUP BY l_returnflag""")
      },
      Some("""WITH r AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
              ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                 ORDER BY l_quantity) AS rn,
              COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
          SELECT l_returnflag,
            CAST(MAX(n) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2)
                          AND (n % 2 = 1 OR rn * 2 <> n + 1)
                          THEN q ELSE 0 END) AS DOUBLE)
              / CAST(CASE WHEN MAX(n) % 2 = 0 THEN 2 ELSE 1 END AS DOUBLE)
              AS median,
            CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN q END)
                 AS BIGINT) AS p90
          FROM r GROUP BY l_returnflag""")),

    // ----- NOT IN three-valued-logic semantics ----------------------------
    // `x NOT IN (subquery)` is an anti-join ONLY when the subquery is
    // null-free; one NULL makes every comparison UNKNOWN and the result
    // empty. Spark plans the nullable case as NullAwareAntiJoin (broadcast
    // only — the null check needs the whole build side per task, which is
    // exactly why null-free keys matter at 100 TB: the null-free variant
    // is a plain shuffled anti-join). Both counts in one row prove the
    // engine honors ANSI semantics rather than silently deduping NULLs.
    Q("q40_not_in_null",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""
          SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
               (SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'))
              AS n_no_urgent,
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
               (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                            ELSE o_custkey END FROM orders))
              AS n_with_null_probe""")
      },
      Some("""
          SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
               (SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'))
              AS n_no_urgent,
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN
               (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                            ELSE o_custkey END FROM orders))
              AS n_with_null_probe""")),

    // ----- array construction + higher-order functions --------------------
    // Per-order quantity vectors: collect_list is order-nondeterministic
    // under parallel aggregation, so the array is canonicalized with
    // sort_array before anything depends on element order. Higher-order
    // transforms (filter / aggregate) run inside codegen; the JSON
    // rendering makes the array hashable by the driver's pandas compare.
    Q("q41_array_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_quantity".cast("long").as("q"))
          .groupBy($"l_orderkey")
          .agg(sort_array(collect_list($"q")).as("qs"))
          .select($"l_orderkey",
            to_json($"qs").as("qty_json"),
            expr("aggregate(qs, 0L, (acc, x) -> acc + x)").as("qty_sum"),
            expr("size(filter(qs, x -> x >= 25))").cast("long").as("n_big"),
            expr("size(array_distinct(qs))").cast("long").as("n_distinct"))
      },
      Some("""SELECT l_orderkey,
          to_json(list_sort(list(CAST(l_quantity AS BIGINT)))) AS qty_json,
          CAST(list_sum(list(CAST(l_quantity AS BIGINT))) AS BIGINT)
            AS qty_sum,
          CAST(len(list_filter(list(CAST(l_quantity AS BIGINT)),
                               x -> x >= 25)) AS BIGINT) AS n_big,
          CAST(len(list_distinct(list(CAST(l_quantity AS BIGINT))))
               AS BIGINT) AS n_distinct
        FROM lineitem GROUP BY 1""")),

    // ----- built-in session windows (streaming-native sessionization) -----
    // Spark's session_window is the Structured-Streaming-native form of
    // q19's manual lag/cumsum sessionization: gap-merged windows computed
    // by the engine, usable identically under readStream with a
    // watermark. The oracle derives the same sessions manually (new
    // session when the gap is >= 30 min — session_window's half-open
    // [start, last+gap) semantics). Session starts are surfaced as epoch
    // micros (BIGINT) for the driver's pandas compare.
    Q("q42_session_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id", session_window($"ts", "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id",
            unix_micros($"session_window.start").as("start_us"),
            unix_micros($"session_window.end").as("end_us"),
            $"n_events")
      },
      Some("""WITH t AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
            LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
              PARTITION BY user_id ORDER BY ts) AS prev_us
          FROM events),
        s AS (
          SELECT user_id, us,
            SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
                     THEN 1 ELSE 0 END) OVER (
              PARTITION BY user_id ORDER BY us
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM t)
        SELECT user_id, MIN(us) AS start_us,
          MAX(us) + 1800000000 AS end_us, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid""")),

    // ----- map construction + map higher-order functions ------------------
    // MapType surface: per-user event-type count maps built with
    // map_from_entries over sorted entries, then consumed with map_keys /
    // element_at / map_filter. The output projects scalars out of the map
    // (maps don't survive the driver's pandas compare), and the oracle
    // states the same semantics in plain conditional aggregation — the
    // point is that the Spark map expressions produce exactly those
    // numbers.
    // ----- calendar spine + gap fill --------------------------------------
    // Reporting over sparse time series: generate the full day spine
    // between min and max event dates, left-join daily purchase
    // aggregates, zero-fill the gaps. The spine is sequence() over a
    // 2-row bound aggregate (driver-free, executor-generated); days are
    // rendered as strings for the driver compare.
    Q("q50_date_spine",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(to_date($"ts").as("day"), $"event_type", $"value")
        val bounds = ev.agg(min($"day").as("lo"), max($"day").as("hi"))
        val spine = bounds
          .select(explode(expr("sequence(lo, hi, interval 1 day)"))
            .as("day"))
        val daily = ev.filter($"event_type" === "purchase")
          .groupBy($"day")
          .agg(count(lit(1)).as("n_purchases"),
            expr("cast(sum(cast(value as decimal(18,2))) as double)")
              .as("revenue"))
        spine.join(daily, Seq("day"), "left")
          .select(date_format($"day", "yyyy-MM-dd").as("day"),
            coalesce($"n_purchases", lit(0L)).as("n_purchases"),
            coalesce($"revenue", lit(0.0)).as("revenue"))
      },
      Some("""WITH ev AS (
          SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
            event_type, value
          FROM events),
        bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
        spine AS (
          SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
            AS day FROM bounds),
        daily AS (
          SELECT day, COUNT(*) AS n_purchases,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM ev WHERE event_type = 'purchase' GROUP BY 1)
        SELECT strftime(spine.day, '%Y-%m-%d') AS day,
          COALESCE(n_purchases, 0) AS n_purchases,
          COALESCE(revenue, 0.0) AS revenue
        FROM spine LEFT JOIN daily ON spine.day = daily.day""")),

    // ----- mergeable HLL sketches (DataSketches, partial-union path) ------
    // THE distinct-count pattern at 100 TB: build a sketch per partition
    // (here per day), persist/union the sketches, estimate once — no
    // re-scan, no exact-distinct shuffle. Spark 4 ships Apache
    // DataSketches HLL with a real union operator (q27's
    // approx_count_distinct is HLL++ without exposed sketches). DuckDB
    // can't reproduce the sketch bits, so — exactly like q27 — the
    // oracle pins the EXACT count plus the claim that the merged
    // estimate lands within 5%: deterministic booleans, not floats.
    Q("q49_hll_merge",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .select(to_date($"ts").as("day"), $"user_id")
          .groupBy($"day")
          .agg(hll_sketch_agg($"user_id").as("sk"))
        val merged = daily.agg(
          hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
          count(lit(1)).as("n_days"))
        val exact = Tables.events(s, d)
          .agg(countDistinct($"user_id").as("exact_users"))
        merged.crossJoin(exact)
          .select($"exact_users", $"n_days",
            (abs($"est" - $"exact_users") <=
              $"exact_users".cast("double") * 0.05).as("merged_in_5pct"))
      },
      Some("""SELECT COUNT(DISTINCT user_id) AS exact_users,
          (SELECT COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
           FROM events) AS n_days,
          true AS merged_in_5pct
        FROM events""")),

    // ----- register-level mergeable HLL (cross-engine EXACT) --------------
    // q49 proves Spark's built-in DataSketches HLL merges within 5%; the
    // oracle there can only check a tolerance band because the sketch
    // internals are opaque. This is the complementary clean-room HLL
    // (Flajolet et al. 2007) built from relational primitives ONLY, so
    // the ORACLE REPLAYS THE EXACT REGISTER STATE: h = 32-bit
    // engine-portable md5 prefix (the Dedup idiom), register index =
    // h mod 256, rho = leading-zero count of the remaining 24 bits + 1
    // (via length(bin(w)) — identical on both engines), per-day
    // registers = max(rho), cross-day merge = max again (the mergeable-
    // sketch property, exercised for real: daily sketches are built
    // independently then combined), estimate = alpha_256 * m^2 / sum
    // 2^-M_j. The 2^-M_j sum is EXACT integer arithmetic (scaled by
    // 2^25), so the only float ops are correctly-rounded IEEE basics on
    // identical inputs — the estimate hashes bit-identically. Raw
    // estimator only (no ln-based small-range correction — ln is not
    // bit-portable across libm implementations); sketching distinct
    // user-DAYS (~4k at sf0.01) keeps the gate workload out of the
    // linear-counting regime. Scale shape: one partial-agg shuffle to
    // 256·days rows, then to 256 — the whole sketch state is 256 bytes
    // regardless of input size, the point of HLL at 100 TB.
    Q("q51_hll_registers",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(to_date($"ts").as("day"), $"user_id")
        val daily = ev
          .select($"day",
            conv(substring(md5(concat($"user_id".cast("string"),
              lit("@"), $"day".cast("string")).cast("binary")),
              1, 8), 16, 10).cast("long").as("hv"))
          .select($"day", ($"hv" % 256).as("idx"),
            expr("hv div 256").as("w"))
          .groupBy($"day", $"idx")
          .agg(max(when($"w" === 0, lit(25))
            .otherwise(lit(25) - length(bin($"w")))).as("rho"))
        val merged = daily.groupBy($"idx").agg(max($"rho").as("mj"))
        val st = merged.agg(
          (sum(expr("cast(power(2, 25 - mj) as bigint)"))
            + (lit(256) - count(lit(1))) * lit(33554432L)).as("den"),
          count(lit(1)).as("nz"))
        val ex = Tables.events(s, d)
          .agg(countDistinct($"user_id", to_date($"ts"))
            .as("exact_user_days"))
        val est = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
          lit(65536.0) * lit(33554432.0) / col("den").cast("double")
        st.crossJoin(ex).select(
          est.as("hll_est"),
          $"nz".as("nonzero_regs"),
          $"exact_user_days",
          (abs(est - $"exact_user_days".cast("double")) /
            $"exact_user_days".cast("double") * lit(100.0))
            .as("rel_err_pct"))
      },
      Some("""WITH h AS (
          SELECT CAST(ts AS DATE) AS day,
            CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' ||
              CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 8) AS BIGINT) AS hv
          FROM events),
        daily AS (SELECT day, hv % 256 AS idx,
            max(CASE WHEN hv // 256 = 0 THEN 25
                     ELSE 25 - length(bin(hv // 256)) END) AS rho
          FROM h GROUP BY day, hv % 256),
        merged AS (SELECT idx, max(rho) AS mj FROM daily GROUP BY idx),
        s AS (SELECT
            CAST(sum(CAST(power(2, 25 - mj) AS BIGINT)) AS BIGINT)
              + (256 - count(*)) * 33554432 AS den,
            count(*) AS nz
          FROM merged),
        ex AS (SELECT count(DISTINCT (user_id, CAST(ts AS DATE)))
                 AS exact_user_days FROM events)
        SELECT
          0.7213E0 / (1.0E0 + 1.079E0 / 256.0E0) * 65536.0E0
            * 33554432.0E0 / CAST(den AS DOUBLE) AS hll_est,
          nz AS nonzero_regs,
          exact_user_days,
          abs(0.7213E0 / (1.0E0 + 1.079E0 / 256.0E0) * 65536.0E0
            * 33554432.0E0 / CAST(den AS DOUBLE) - exact_user_days)
            / exact_user_days * 100.0E0 AS rel_err_pct
        FROM s, ex""")),

    // ----- grouped + merged HLL in one pass (sketch-algebra rollup) -------
    // q51 proves the register HLL is exact cross-engine; this one
    // exercises the SKETCH ALGEBRA at the plan level: per-source
    // registers AND the all-sources merge computed in a single
    // GROUPING SETS aggregation — the merged registers are max() over
    // the very same partials, which is exactly the algebra that lets a
    // 100 TB pipeline keep per-shard sketches and fold them into any
    // rollup hierarchy without rescanning the corpus. Input is the
    // distinct (source, 3-gram shingle) relation (~16k shingles at
    // sf0.01, all groups safely in the raw-estimator regime). Sketch
    // state: 256 bytes per group regardless of input size.
    Q("q52_hll_rollup",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""
          WITH ws0 AS (
            SELECT source, split(lower(text), '\\s+') AS ws
            FROM documents
            WHERE size(split(lower(text), '\\s+')) >= 3),
          sh AS (
            SELECT DISTINCT source, shingle
            FROM ws0
            LATERAL VIEW explode(transform(sequence(0, size(ws)-3),
              i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) t AS shingle),
          h AS (SELECT source,
              CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT)
                AS hv
            FROM sh),
          r AS (SELECT source, GROUPING(source) AS g_all, hv % 256 AS idx,
              max(CASE WHEN hv div 256 = 0 THEN 25
                       ELSE 25 - length(bin(hv div 256)) END) AS rho
            FROM h GROUP BY GROUPING SETS ((hv % 256, source), (hv % 256))),
          st AS (SELECT
              CASE WHEN g_all = 1 THEN 'ALL' ELSE source END AS source_grp,
              CAST(sum(CAST(power(2, 25 - rho) AS BIGINT)) AS BIGINT)
                + (256 - count(*)) * 33554432 AS den,
              count(*) AS nz
            FROM r GROUP BY 1),
          ex AS (SELECT
              CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END
                AS source_grp,
              count(DISTINCT shingle) AS exact_shingles
            FROM sh GROUP BY GROUPING SETS ((source), ()))
          SELECT st.source_grp,
            0.7213E0 / (1.0E0 + 1.079E0 / 256.0E0) * 65536.0E0
              * 33554432.0E0 / CAST(den AS DOUBLE) AS hll_est,
            nz AS nonzero_regs, exact_shingles
          FROM st JOIN ex
            ON st.source_grp <=> ex.source_grp
          ORDER BY st.source_grp""")
      },
      Some("""WITH sh AS (
          SELECT DISTINCT source,
            unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                    FOR i IN generate_series(1, len(ws)-2)]) AS shingle
          FROM (SELECT source, string_split_regex(lower(text), '\s+') AS ws
                FROM documents)
          WHERE len(ws) >= 3),
        h AS (SELECT source,
            CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS hv
          FROM sh),
        r AS (SELECT source, GROUPING(source) AS g_all, hv % 256 AS idx,
            max(CASE WHEN hv // 256 = 0 THEN 25
                     ELSE 25 - length(bin(hv // 256)) END) AS rho
          FROM h GROUP BY GROUPING SETS ((hv % 256, source), (hv % 256))),
        st AS (SELECT
            CASE WHEN g_all = 1 THEN 'ALL' ELSE source END AS source_grp,
            CAST(sum(CAST(power(2, 25 - rho) AS BIGINT)) AS BIGINT)
              + (256 - count(*)) * 33554432 AS den,
            count(*) AS nz
          FROM r GROUP BY 1),
        ex AS (SELECT
            CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END
              AS source_grp,
            count(DISTINCT shingle) AS exact_shingles
          FROM sh GROUP BY GROUPING SETS ((source), ()))
        SELECT st.source_grp,
          0.7213E0 / (1.0E0 + 1.079E0 / 256.0E0) * 65536.0E0
            * 33554432.0E0 / CAST(den AS DOUBLE) AS hll_est,
          nz AS nonzero_regs, exact_shingles
        FROM st JOIN ex
          ON st.source_grp IS NOT DISTINCT FROM ex.source_grp
        ORDER BY st.source_grp""")),

    // ----- regex extraction family ----------------------------------------
    // regexp_extract_all / regexp_count with a dialect-neutral pattern;
    // match order is left-to-right on both engines, arrays JSON-rendered
    // for the driver compare.
    Q("q47_regex_extract",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            to_json(regexp_extract_all($"text", lit("s[a-z]+"), lit(0)))
              .as("s_words"),
            expr("regexp_count(text, 's[a-z]+')").cast("long").as("n_s"),
            regexp_extract($"text", "(b[a-z]+)", 1).as("first_b"))
      },
      Some("""SELECT doc_id,
          to_json(regexp_extract_all(text, 's[a-z]+', 0)) AS s_words,
          CAST(len(regexp_extract_all(text, 's[a-z]+', 0)) AS BIGINT)
            AS n_s,
          COALESCE(regexp_extract(text, '(b[a-z]+)', 1), '') AS first_b
        FROM documents""")),

    // ----- ordered string aggregation (listagg) ---------------------------
    // listagg WITHIN GROUP (Spark 4) vs string_agg ORDER BY: ordered,
    // distinct string concatenation is deterministic — the canonical
    // "report cell" aggregate.
    Q("q48_listagg",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""SELECT o_orderpriority,
            listagg(DISTINCT o_orderstatus, ',')
              WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
            COUNT(*) AS n
          FROM orders GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority,
          string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
            AS statuses,
          COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority""")),

    // ----- multiset (ALL) set operations ----------------------------------
    // Bag semantics are a different operator from q09's distinct forms:
    // EXCEPT ALL / INTERSECT ALL preserve multiplicities (Spark plans
    // them as aggregate+generate over per-row counts, not joins over
    // distinct keys). Counts of each result prove the multiplicity math.
    Q("q46_setops_all",
      (s, d) => {
        import s.implicits._
        val a = Tables.lineitem(s, d).filter($"l_returnflag" === "A")
          .select($"l_quantity".cast("long").as("q"))
        val r = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
          .select($"l_quantity".cast("long").as("q"))
        val ex = a.exceptAll(r).count()
        val in = a.intersectAll(r).count()
        val un = a.unionAll(r).count()
        import s.implicits._
        Seq((ex, in, un)).toDF("n_except_all", "n_intersect_all",
          "n_union_all")
      },
      Some("""SELECT
          (SELECT COUNT(*) FROM (
            SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem
              WHERE l_returnflag = 'A'
            EXCEPT ALL
            SELECT CAST(l_quantity AS BIGINT) FROM lineitem
              WHERE l_returnflag = 'R')) AS n_except_all,
          (SELECT COUNT(*) FROM (
            SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem
              WHERE l_returnflag = 'A'
            INTERSECT ALL
            SELECT CAST(l_quantity AS BIGINT) FROM lineitem
              WHERE l_returnflag = 'R')) AS n_intersect_all,
          (SELECT COUNT(*) FROM (
            SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem
              WHERE l_returnflag = 'A'
            UNION ALL
            SELECT CAST(l_quantity AS BIGINT) FROM lineitem
              WHERE l_returnflag = 'R')) AS n_union_all""")),

    // ----- relative-rank window functions ---------------------------------
    // percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are single
    // divisions of exact integer window counts — engine-exact doubles.
    // nth_value exercises frame-dependent navigation. Deterministic
    // ordering via the (totalprice, orderkey) tiebreak as everywhere.
    Q("q45_rank_stats",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""
          SELECT o_orderpriority, o_orderkey,
            percent_rank() OVER w AS pr,
            cume_dist() OVER w AS cd,
            nth_value(o_totalprice, 3) OVER (
              PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third
          FROM orders
          WHERE o_orderkey % 37 = 0
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey)""")
      },
      Some("""
          SELECT o_orderpriority, o_orderkey,
            percent_rank() OVER w AS pr,
            cume_dist() OVER w AS cd,
            nth_value(o_totalprice, 3) OVER (
              PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third
          FROM orders
          WHERE o_orderkey % 37 = 0
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey)""")),

    // ----- event-type transition matrix (Markov chain estimate) -----------
    // Per-user next-event transitions via lead() (one shuffle on
    // user_id), then a global count per (from, to) pair — the key space
    // is event_types^2, so the final aggregation collapses map-side at
    // any scale. prob is one division of exact counts (per-from
    // normalization), engine-exact.
    Q("q44_markov_transitions",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
        val steps = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type".as("from_type"))
          .withColumn("to_type", lead($"from_type", 1).over(w))
          .filter($"to_type".isNotNull)
          .groupBy($"from_type", $"to_type")
          .agg(count(lit(1)).as("n"))
        val totals = steps.groupBy($"from_type")
          .agg(sum($"n").as("n_from"))
        steps.join(broadcast(totals), "from_type")
          .select($"from_type", $"to_type", $"n",
            ($"n".cast("double") / $"n_from").as("prob"))
      },
      Some("""WITH steps AS (
          SELECT from_type, to_type, COUNT(*) AS n FROM (
            SELECT event_type AS from_type,
              LEAD(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY event_id ASC) AS to_type
            FROM events)
          WHERE to_type IS NOT NULL GROUP BY 1, 2),
        totals AS (
          SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
          FROM steps GROUP BY 1)
        SELECT from_type, to_type, n,
          CAST(n AS DOUBLE) / n_from AS prob
        FROM steps JOIN totals USING (from_type)""")),

    Q("q43_map_funcs",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("n"))
          .groupBy($"user_id")
          .agg(map_from_entries(
            array_sort(collect_list(struct($"event_type", $"n")))).as("m"))
          .select($"user_id",
            size(map_keys($"m")).cast("long").as("n_types"),
            coalesce(element_at($"m", "view"), lit(0L)).as("n_view"),
            coalesce(element_at($"m", "purchase"), lit(0L)).as("n_purchase"),
            expr("size(map_filter(m, (k, v) -> v >= 20))").cast("long")
              .as("n_heavy"))
      },
      Some("""WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS n_types,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN n END), 0)
               AS BIGINT) AS n_view,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN n END), 0)
               AS BIGINT) AS n_purchase,
          CAST(SUM(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_heavy
        FROM c GROUP BY 1""")),

    // ----- robust hourly-volume anomaly detection (median + MAD) ----------
    // The on-call "is this hour weird" sweep, done ROBUSTLY: per event
    // type, an hour is anomalous when its count deviates from the
    // median hourly count by more than 3× the median absolute
    // deviation — median/MAD because a mean/σ detector is dragged by
    // the very outliers it is meant to find. All arithmetic stays
    // integral via scaling: med2 = 2·median (the q39 positional-
    // selection trick — middle element(s) summed, so a .5 median is an
    // odd integer), dev2 = |2c − med2|, mad4 = 2·median(dev2), and the
    // rule |c − med| > 3·MAD becomes 2·dev2 > 3·mad4 — bit-exact in
    // both engines, no float thresholds. ONE SQL text shared verbatim
    // with the oracle. Scale: the raw scan collapses to O(types ×
    // hours) in the first rollup; both median windows and the joins
    // run on that tiny relation — the window sorts never see raw
    // events.
    {
      val anomalySql = """
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS hour,
            COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT *,
            ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY c, hour) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM hourly),
        med AS (
          SELECT event_type,
            CAST(SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2)
                          AND (n % 2 = 1 OR rn * 2 <> n + 1)
                     THEN c * (CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END)
                     ELSE 0 END) AS BIGINT) AS med2
          FROM ranked GROUP BY 1),
        dev AS (
          SELECT h.event_type, h.hour, h.c,
            abs(2 * h.c - m.med2) AS dev2
          FROM hourly h JOIN med m ON h.event_type = m.event_type),
        rdev AS (
          SELECT *,
            ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY dev2, hour) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev),
        mad AS (
          SELECT event_type,
            CAST(SUM(CASE WHEN rn * 2 IN (n, n + 1, n + 2)
                          AND (n % 2 = 1 OR rn * 2 <> n + 1)
                     THEN dev2 * (CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END)
                     ELSE 0 END) AS BIGINT) AS mad4
          FROM rdev GROUP BY 1)
        SELECT d.event_type, d.hour, CAST(d.c AS BIGINT) AS c,
          CAST(d.dev2 AS BIGINT) AS dev2, m.mad4,
          2 * d.dev2 > 3 * m.mad4 AS is_anomaly
        FROM dev d JOIN mad m ON d.event_type = m.event_type"""
      Q("q53_hourly_anomaly",
        (s, d) => {
          Tables.registerViews(s, d)
          s.sql(anomalySql)
        },
        Some(anomalySql))
    },

    // ----- concurrent-session accounting (two-level prefix sum) -----------
    // "How many sessions were open at once, per hour" — the capacity
    // question behind license counts, connection pools, and peak-load
    // reviews. Sessions come from the q19 gap rule (30 min); each
    // session emits (+1 at start, −1 at last event), boundaries
    // collapse to per-µs NET deltas (so simultaneous opposite
    // boundaries cancel order-independently), and concurrency is the
    // running sum of nets.
    //
    // A GLOBAL ordered running sum is a single-partition window — the
    // classic prefix-sum scale trap. This op does the textbook
    // two-level fix instead: the within-HOUR prefix runs in a window
    // PARTITIONED BY HOUR (parallel across hours), the hour-level
    // carry is a running sum over the tiny O(hours) rollup (8 760
    // rows/year — nothing), and the per-hour peak is carry-in + max
    // within-hour prefix. No operator ever sorts more than one hour's
    // boundaries in one partition. All-integer; both engines replay
    // the identical rule.
    Q("q54_concurrency",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
        val sess = Tables.events(s, d)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
          .withColumn("prev_us", lag($"us", 1).over(w))
          .withColumn("new_session",
            when($"prev_us".isNull || $"us" - $"prev_us" > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sid",
            sum($"new_session").over(w.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"sid")
          .agg(min($"us").as("start_us"), max($"us").as("end_us"))
        val bounds = sess.select($"start_us".as("us"), lit(1L).as("delta"))
          .union(sess.select($"end_us".as("us"), lit(-1L).as("delta")))
          .groupBy($"us").agg(sum($"delta").as("net"))
          .withColumn("hour",
            date_trunc("hour", timestamp_micros($"us")))
        val wh = Window.partitionBy($"hour").orderBy($"us".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val hourly = bounds
          .withColumn("run", sum($"net").over(wh))
          .groupBy($"hour")
          .agg(sum($"net").as("net_h"), max($"run").as("peak_in_h"),
            count(lit(1)).as("n_boundaries"))
        val wc = Window.orderBy($"hour".asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        hourly
          .withColumn("carry", coalesce(sum($"net_h").over(wc), lit(0L)))
          .select($"hour", ($"carry" + $"peak_in_h").as("max_concurrent"),
            $"n_boundaries")
      },
      Some("""WITH ev AS (
          SELECT user_id, event_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        flagged AS (
          SELECT user_id, event_id, us,
            CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, event_id, us,
              LAG(us, 1) OVER (PARTITION BY user_id
                               ORDER BY event_id ASC) AS prev_us
            FROM ev)),
        sid AS (
          SELECT user_id, us,
            SUM(new_session) OVER (PARTITION BY user_id
              ORDER BY event_id ASC ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged),
        sess AS (
          SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us
          FROM sid GROUP BY 1, 2),
        bounds AS (
          SELECT us, CAST(SUM(delta) AS BIGINT) AS net,
            date_trunc('hour', make_timestamp(us)) AS hour
          FROM (
            SELECT start_us AS us, 1 AS delta FROM sess
            UNION ALL
            SELECT end_us, -1 FROM sess)
          GROUP BY us),
        hourly AS (
          SELECT hour, CAST(SUM(net) AS BIGINT) AS net_h,
            CAST(MAX(run) AS BIGINT) AS peak_in_h,
            COUNT(*) AS n_boundaries
          FROM (
            SELECT hour, net,
              SUM(net) OVER (PARTITION BY hour ORDER BY us ASC
                ROWS UNBOUNDED PRECEDING) AS run
            FROM bounds)
          GROUP BY hour)
        SELECT hour,
          CAST(COALESCE(SUM(net_h) OVER (ORDER BY hour ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + peak_in_h AS BIGINT) AS max_concurrent,
          n_boundaries
        FROM hourly"""))
    ,

    // ----- RFM customer segmentation (round 11) ---------------------------
    // The classic marketing-analytics rollup: per customer, Recency
    // (last order date), Frequency (order count), Monetary (lifetime
    // cents — exact BIGINT, never float sums), each scored into
    // quintiles, then the 5x5x5 segment census. The SCALE-critical
    // choice is how quintiles are computed: a global ntile() window is
    // a single-partition sort over every customer — the one plan shape
    // that cannot survive 100x. Instead each metric is quantized to a
    // BOUNDED key space (order dates are finite; order counts are
    // small; monetary rides 5k-dollar buckets), the quintile boundary
    // comes from a cumulative sum over that TINY value histogram
    // (window over O(distinct values) rows, scale-free), and customers
    // pick up scores through three BROADCAST joins. Tie rule: equal
    // quantized values always share a score (score = 1 + 5*|{v' < v}|
    // DIV N) — deterministic under any partitioning, unlike ntile's
    // arbitrary tie split. One custkey shuffle + three broadcast maps
    // + one tiny final aggregation.
    Q("q55_rfm_segments",
      (s, d) => {
        import s.implicits._
        val pc = Tables.orders(s, d)
          .groupBy($"o_custkey")
          .agg(
            datediff(to_date(max($"o_orderdate")),
              lit("1992-01-01").cast("date")).as("r_day"),
            count(lit(1)).as("f"),
            sum(round($"o_totalprice" * 100).cast("long")).as("m_cents"))
          .withColumn("m_bucket", expr("m_cents DIV 500000"))
          // four consumers (three histograms + the final join); the
          // count below materializes the cache before any re-scan
          .cache()
        val n = pc.count()
        def scoreMap(dim: String): DataFrame = {
          // cumulative count over the tiny per-value histogram —
          // the single-partition window is O(distinct values), not
          // O(customers), so it stays flat at any corpus size
          val w = Window.orderBy(col(dim))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          pc.groupBy(col(dim)).agg(count(lit(1)).as("c"))
            .withColumn("cum", sum($"c").over(w))
            .select(col(dim),
              expr(s"CAST(1 + (5 * (cum - c)) DIV ${n}L AS INT)")
                .as(s"${dim.take(1)}_score"))
        }
        pc.join(broadcast(scoreMap("r_day")), "r_day")
          .join(broadcast(scoreMap("f")), "f")
          .join(broadcast(scoreMap("m_bucket")), "m_bucket")
          .groupBy($"r_score", $"f_score", $"m_score")
          .agg(count(lit(1)).as("n_customers"),
            sum($"m_cents").as("monetary_cents"))
      },
      Some("""WITH pc AS (
          SELECT o_custkey,
            datediff('day', DATE '1992-01-01',
              CAST(MAX(o_orderdate) AS DATE)) AS r_day,
            COUNT(*) AS f,
            CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS m_cents
          FROM orders GROUP BY 1),
        pc2 AS (SELECT pc.*, m_cents // 500000 AS m_bucket FROM pc),
        nn AS (SELECT COUNT(*) AS n FROM pc2),
        rs AS (SELECT r_day,
            CAST(1 + (5 * (SUM(c) OVER (ORDER BY r_day) - c)) // n
              AS INT) AS r_score
          FROM (SELECT r_day, COUNT(*) AS c FROM pc2 GROUP BY 1), nn),
        fs AS (SELECT f,
            CAST(1 + (5 * (SUM(c) OVER (ORDER BY f) - c)) // n
              AS INT) AS f_score
          FROM (SELECT f, COUNT(*) AS c FROM pc2 GROUP BY 1), nn),
        ms AS (SELECT m_bucket,
            CAST(1 + (5 * (SUM(c) OVER (ORDER BY m_bucket) - c)) // n
              AS INT) AS m_score
          FROM (SELECT m_bucket, COUNT(*) AS c FROM pc2 GROUP BY 1), nn)
        SELECT r_score, f_score, m_score,
          COUNT(*) AS n_customers,
          CAST(SUM(m_cents) AS BIGINT) AS monetary_cents
        FROM pc2
          JOIN rs USING (r_day)
          JOIN fs USING (f)
          JOIN ms USING (m_bucket)
        GROUP BY 1, 2, 3""")),

    // ----- first/last-touch conversion attribution (round 11) -------------
    // The marketing-analytics question after the funnel (q36): which
    // channel INITIATED the journey and which channel CLOSED it. Per
    // user, the first purchase is the conversion; the first and last
    // non-purchase events strictly before it (ordered by (ts,
    // event_id) — unique, so deterministic) are the first/last touch;
    // users converting with no prior touch land in 'direct'. Emits the
    // (first_touch, last_touch) census with exact integer conversion
    // value (floor-cents — floor has no tie semantics for engines to
    // disagree on). Scale shape: NO windows — the per-user journey
    // endpoints are min/max(struct) argmaxes (map-side partials), two
    // user-keyed shuffles, tiny final census.
    Q("q56_attribution",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
            $"event_id", floor($"value" * 100).cast("long").as("cents"))
        val conv = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(min(struct($"us", $"event_id", $"cents")).as("p"))
          .select($"user_id", $"p.us".as("p_us"),
            $"p.event_id".as("p_eid"), $"p.cents".as("cents"))
        val ends = ev.filter($"event_type" =!= "purchase")
          .join(conv.select($"user_id", $"p_us", $"p_eid"), "user_id")
          .filter($"us" < $"p_us" ||
            ($"us" === $"p_us" && $"event_id" < $"p_eid"))
          .groupBy($"user_id")
          .agg(min(struct($"us", $"event_id", $"event_type")).as("f"),
            max(struct($"us", $"event_id", $"event_type")).as("l"))
          .select($"user_id", $"f.event_type".as("ft"),
            $"l.event_type".as("lt"))
        conv.join(ends, Seq("user_id"), "left")
          .groupBy(coalesce($"ft", lit("direct")).as("first_touch"),
            coalesce($"lt", lit("direct")).as("last_touch"))
          .agg(count(lit(1)).as("n_conversions"),
            sum($"cents").as("value_cents"))
      },
      Some("""WITH ev AS (
          SELECT user_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
            CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events),
        conv AS (
          SELECT user_id, us AS p_us, event_id AS p_eid, cents FROM (
            SELECT user_id, us, event_id, cents,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS rn
            FROM ev WHERE event_type = 'purchase') WHERE rn = 1),
        touch AS (
          SELECT t.user_id, t.event_type, t.us, t.event_id
          FROM ev t JOIN conv c USING (user_id)
          WHERE t.event_type <> 'purchase'
            AND (t.us < c.p_us
                 OR (t.us = c.p_us AND t.event_id < c.p_eid))),
        ranked AS (
          SELECT user_id, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS rf,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us DESC, event_id DESC) AS rl
          FROM touch),
        ends AS (
          SELECT user_id,
            MAX(CASE WHEN rf = 1 THEN event_type END) AS ft,
            MAX(CASE WHEN rl = 1 THEN event_type END) AS lt
          FROM ranked GROUP BY 1)
        SELECT COALESCE(e.ft, 'direct') AS first_touch,
          COALESCE(e.lt, 'direct') AS last_touch,
          COUNT(*) AS n_conversions,
          CAST(SUM(c.cents) AS BIGINT) AS value_cents
        FROM conv c LEFT JOIN ends e USING (user_id)
        GROUP BY 1, 2"""))
  )
}
