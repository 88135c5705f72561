package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query inventory over the driver-generated star schema
  * (TESTDATA.md). The reference has no relational surface at all
  * (SURVEY.md §2.4 — no joins/windows/set-ops anywhere in its src/), so
  * everything here is the extension phase: declarative DataFrame plans that
  * Catalyst optimizes (pushdown, pruning, broadcast, partial agg) with zero
  * hand scheduling.
  *
  * Every query aliases its output columns identically to its DuckDB oracle
  * in [[oracles]] (the driver sorts columns by name before hashing), sorts
  * rows deterministically, and rounds floating aggregates so summation
  * order can never flip a hash.
  *
  * Scale notes (100 TB): every aggregate here partial-aggregates map-side;
  * dimension joins (region/nation/customer/supplier at TPC-H proportions)
  * are explicitly `broadcast()` so the big fact table never shuffles for
  * them; fact-fact joins shuffle on their join key only after filters are
  * pushed to the parquet scan.
  */
object RelationalQueries {

  /** round + alias helper: all money sums to 2 dp, ratios/avgs to 6 dp. */
  private def r2(c: Column, n: String): Column = round(c, 2).as(n)
  private def r6(c: Column, n: String): Column = round(c, 6).as(n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-filter-aggregate with partial map-side agg.
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity")), "sum_qty"),
          r2(sum(col("l_extendedprice")), "sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), "sum_disc_price"),
          r6(avg(col("l_quantity")), "avg_qty"),
          r6(avg(col("l_extendedprice")), "avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q6 shape: highly selective filters that must reach the parquet
    // scan as PushedFilters (verified in PlanSpec).
    "q02_filter_pushdown" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 25)
        .agg(r2(sum(col("l_extendedprice") * col("l_discount")), "revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Broadcast hash join: customer is a dimension — never shuffle orders
    // for it.
    "q03_join_broadcast" -> ((s, d) => {
      orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice")), "sum_total"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q5 shape: star join — one shuffle join (lineitem⋈orders on
    // orderkey), every dimension broadcast.
    "q04_join_star" -> ((s, d) => {
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), "revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Left-semi join (EXISTS): orders having at least one big-quantity item.
    "q05_semi_join" -> ((s, d) => {
      orders(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), r2(col("o_totalprice"), "o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Left-anti join (NOT EXISTS): customers with no URGENT order (plain
    // "no orders at all" is empty on this fixture — every customer orders).
    "q06_anti_join" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Ranking window: top-3 orders per customer. Full tiebreak
    // (totalprice desc, orderkey) keeps row_number deterministic.
    "q07_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          r2(col("o_totalprice"), "o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // Running-frame window: cumulative sum per user over event time.
    // The frame fixes accumulation order, so the float sum is
    // deterministic in both engines.
    "q08_window_running" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_value", round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6))
        .select(col("user_id"), col("rn"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // ROLLUP grouping sets (subtotal rows carry NULL group keys — ordering
    // pins NULLS FIRST to match the oracle's explicit NULLS FIRST).
    "q09_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), r2(sum(col("l_quantity")), "sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q10_distinct" -> ((s, d) => {
      customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),

    // Set operations: INTERSECT / EXCEPT over customer vs supplier nations,
    // tagged and unioned into one result.
    "q11_set_ops" -> ((s, d) => {
      val cn = customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = supplier(s, d).select(col("s_nationkey").as("nationkey"))
      val both = cn.intersect(sn).withColumn("tag", lit("both"))
      val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
      val suppOnly = sn.except(cn).withColumn("tag", lit("supp_only"))
      both.unionByName(custOnly).unionByName(suppOnly)
        .select(col("tag"), col("nationkey"))
        .orderBy(col("tag"), col("nationkey"))
    }),

    // Top-k: global order-by-limit — Spark plans TakeOrderedAndProject
    // (no full sort of the fact table).
    "q12_topk" -> ((s, d) => {
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), r2(col("o_totalprice"), "o_totalprice"))
    }),

    // CUBE grouping sets.
    "q13_cube" -> ((s, d) => {
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice")), "sum_total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // Scalar string functions (all codegen'd builtins — no UDFs).
    "q14_string_funcs" -> ((s, d) => {
      part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_type")).as("type_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), "E", "_").as("type_masked"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time functions; month bucket emitted as a string so the hash
    // compare is timestamp-representation-proof.
    "q15_date_funcs" -> ((s, d) => {
      orders(s, d)
        .select(
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          col("o_totalprice"))
        .groupBy(col("ym"), col("yr"), col("qtr"))
        .agg(count(lit(1)).as("n_orders"), r2(sum(col("o_totalprice")), "sum_total"))
        .orderBy(col("ym"))
    }),

    // JSON extraction from the events.props column. avg over exact integer
    // sums is order-independent.
    "q16_json" -> ((s, d) => {
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), r6(avg(col("k")), "avg_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Math functions + CASE bucketing.
    "q17_math_case" -> ((s, d) => {
      lineitem(s, d)
        .withColumn("qty_bucket",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high"))
        .groupBy(col("qty_bucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(sqrt(col("l_extendedprice"))), 4).as("sum_sqrt_price"),
          round(sum(log(col("l_extendedprice"))), 4).as("sum_ln_price"),
          r6(avg(abs(col("l_discount") - lit(0.05))), "avg_abs_disc_dev"))
        .orderBy(col("qty_bucket"))
    }),

    // Array functions over the 64-d embedding column. Elements are cast to
    // double BEFORE any arithmetic so Spark and the oracle fold the exact
    // same IEEE sequence (higher-order functions stay inside codegen).
    "q18_array_funcs" -> ((s, d) => {
      embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          r6(element_at(col("embedding"), 1).cast("double"), "first_elem"),
          r6(sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)), "l2_norm"))
        .orderBy(col("vec_id"))
    }),

    // RFM BEHAVIORAL FEATURES — the per-user feature table an ML churn/
    // segmentation model trains on: recency (seconds since the user's
    // last event, against the corpus clock), frequency (events + active
    // days), monetary (summed purchase value, rounded per row before
    // the sum per the q150 discipline), and the modal event type with a
    // deterministic (count desc, type asc) tiebreak. ONE user_id
    // exchange serves the type counts, the mode window, and the feature
    // rollup (the q164 subset rule); the corpus clock is a 1-row
    // broadcast.
    "q181_rfm_features" -> ((s, d) => {
      val ev = events(s, d)
      val clock = ev.agg(max(unix_micros(col("ts"))).as("now_us"))
      val typed = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wMode = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      val mode = typed.withColumn("rk", row_number().over(wMode))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("top_type"),
          col("n").as("top_type_n"))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(date_trunc("day", col("ts"))).as("n_active_days"),
          max(unix_micros(col("ts"))).as("last_us"),
          sum(when(col("event_type") === "purchase",
            round(col("value"), 2)).otherwise(0.0)).as("monetary"))
        .join(mode, "user_id")
        .crossJoin(broadcast(clock))
        .select(col("user_id"), col("n_events"), col("n_active_days"),
          expr("(now_us - last_us) div 1000000").as("recency_s"),
          round(col("monetary"), 2).as("monetary"),
          col("top_type"), col("top_type_n"))
        .orderBy(col("user_id"))
    })
  )

  /** DuckDB oracle SQL — same column names, same row order, same rounding. */
  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_extendedprice), 6) AS avg_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_pushdown" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""",
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS sum_total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q04_join_star" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q05_semi_join" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders WHERE EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
         ORDER BY o_orderkey""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q07_window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q08_window_running" ->
      """SELECT user_id, rn, event_id, running_value FROM (
           SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
           FROM events) t
         ORDER BY user_id, rn""",
    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q10_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
         ORDER BY c_mktsegment, c_nationkey""",
    "q11_set_ops" ->
      """SELECT 'both' AS tag, nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           INTERSECT SELECT s_nationkey FROM supplier) a
         UNION ALL
         SELECT 'cust_only' AS tag, nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           EXCEPT SELECT s_nationkey FROM supplier) b
         UNION ALL
         SELECT 'supp_only' AS tag, nationkey FROM (
           SELECT s_nationkey AS nationkey FROM supplier
           EXCEPT SELECT c_nationkey FROM customer) c
         ORDER BY tag, nationkey""",
    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q13_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS sum_total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q14_string_funcs" ->
      """SELECT p_partkey, upper(p_type) AS type_upper,
         substr(p_name, 1, 8) AS name_prefix,
         length(p_name) AS name_len,
         p_brand || '/' || p_type AS brand_type,
         regexp_replace(p_type, 'E', '_', 'g') AS type_masked
         FROM part ORDER BY p_partkey""",
    "q15_date_funcs" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
         FROM orders GROUP BY 1, 2, 3 ORDER BY ym""",
    "q16_json" ->
      """SELECT event_type, count(*) AS n_events,
         round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
         max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q17_math_case" ->
      """SELECT qty_bucket, count(*) AS n_rows,
         round(sum(sqrt(l_extendedprice)), 4) AS sum_sqrt_price,
         round(sum(ln(l_extendedprice)), 4) AS sum_ln_price,
         round(avg(abs(l_discount - 0.05)), 6) AS avg_abs_disc_dev
         FROM (
           SELECT CASE WHEN l_quantity < 10 THEN 'low'
                       WHEN l_quantity < 30 THEN 'mid'
                       ELSE 'high' END AS qty_bucket, *
           FROM lineitem) t
         GROUP BY qty_bucket ORDER BY qty_bucket""",
    "q18_array_funcs" ->
      """SELECT vec_id, len(embedding) AS dim,
         round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
         round(sqrt(list_sum(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
         FROM embeddings ORDER BY vec_id""",

    "q181_rfm_features" ->
      """WITH clock AS (SELECT max(epoch_us(ts)) AS now_us FROM events),
         typed AS (
           SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         mode AS (
           SELECT user_id, event_type AS top_type, n AS top_type_n FROM (
             SELECT user_id, event_type, n, row_number() OVER
               (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
             FROM typed) WHERE rk = 1),
         feats AS (
           SELECT user_id, count(*) AS n_events,
             count(DISTINCT date_trunc('day', ts)) AS n_active_days,
             max(epoch_us(ts)) AS last_us,
             sum(CASE WHEN event_type = 'purchase'
                 THEN round(value, 2) ELSE 0.0 END) AS monetary
           FROM events GROUP BY user_id)
         SELECT f.user_id, f.n_events, f.n_active_days,
           (c.now_us - f.last_us) // 1000000 AS recency_s,
           round(f.monetary, 2) AS monetary, m.top_type, m.top_type_n
         FROM feats f JOIN mode m USING (user_id) CROSS JOIN clock c
         ORDER BY f.user_id"""
  )
}
