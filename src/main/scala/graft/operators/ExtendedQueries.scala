package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of relational operators: explicit GROUPING SETS through the
  * SQL surface, as-of join, pivot, and a banded range join — the temporal
  * operators a training-data/event pipeline needs that plain equi-joins
  * can't express.
  */
object ExtendedQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GROUPING SETS through spark.sql — exercises the SQL entry path of
    // the engine (views + ANSI SQL), not just the DataFrame DSL.
    // Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL-native
    // per-group top-k formulation (the third in the inventory, next to
    // the window idiom q07 and the custom operator q45/q86). Spark plans
    // the correlated limit as a per-group WindowGroupLimit after
    // decorrelation — no manual rewrite needed.
    "q89_lateral_topk" -> ((s, d) => {
      graft.Tables.customer(s, d).createOrReplaceTempView("q89_customer")
      graft.Tables.nation(s, d).createOrReplaceTempView("q89_nation")
      s.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
           FROM q89_nation n,
           LATERAL (SELECT c_name, round(c_acctbal, 2) AS c_acctbal
                    FROM q89_customer c
                    WHERE c.c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_name LIMIT 2) t
           ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    }),

    // Statistical aggregate family: sample stddev, Pearson correlation,
    // sample covariance — one partial-aggregated pass (Spark merges
    // per-partition moment sketches; the shuffle carries one row per
    // group). Rounding margins sized to the values' magnitudes so
    // engine-side summation-order ulps can't flip a digit: corr is in
    // [-1,1] (round 6), stddev ~1e4 (round 2), covar ~1e5 (round 2).
    "q96_stats_agg" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("qty_price_covar"))
        .orderBy(col("l_returnflag"))
    }),

    // Higher central moments — skewness and excess kurtosis complete the
    // moments family (q96 covers mean/stddev/corr/covar). One partial-
    // aggregated pass like every Spark moment aggregate. Spark's
    // definitions are the POPULATION forms (skew = √n·m3/m2^1.5, kurt =
    // n·m4/m2² − 3 over central-moment sums); DuckDB's built-ins are the
    // bias-corrected SAMPLE forms, so the oracle replays the population
    // formulas from explicit two-pass moments — verified digit-exact at
    // round(6) (the moment RATIOS are O(1), ~9 orders above the engines'
    // one-pass-vs-two-pass summation ulps).
    "q108_skew_kurtosis" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(skewness(col("l_extendedprice")), 6).as("price_skew"),
          round(kurtosis(col("l_extendedprice")), 6).as("price_kurt"))
        .orderBy(col("l_returnflag"))
    }),

    // Equi-width histogram: bucket bounds from one scalar min/max
    // aggregate (a 1-row broadcast), bucket assignment map-side, counts
    // partial-aggregated — the profiling primitive for any numeric
    // column at any scale. Identical float arithmetic on both engines
    // makes the bucket function engine-exact.
    "q97_histogram" -> ((s, d) => {
      val li = lineitem(s, d)
      val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.crossJoin(bounds)
        // degenerate range (all values equal): hi-lo = 0 makes the bucket
        // expression 0/0 — Spark's NaN would least() to 9 while DuckDB's
        // division-by-zero NULLs out; pin bucket 0 on BOTH engines
        .select(when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("l_extendedprice") - col("lo")) /
            ((col("hi") - col("lo")) / 10.0)), lit(9.0)).cast("long"))
          .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy(col("bucket"))
    }),

    // UNPIVOT/melt — the inverse of q39's pivot: the per-user event-type
    // count matrix back to long (user_id, event_type, n_events) form,
    // zeros kept explicit. Spark's unpivot plans an Expand (map-side row
    // multiplication — no shuffle beyond the pivot aggregation's own),
    // so wide→long reshaping stays a single-exchange plan at any scale.
    "q100_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      pivoted.unpivot(Array(col("user_id")), types.map(col).toArray,
          "event_type", "n_events")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Distribution window functions — percent_rank / cume_dist round out
    // the window family (q07 rank, q08 running frames, q47 analytics,
    // q48 range frames). Both are exact rational functions of (rank, n):
    // identical integer inputs → identical doubles on both engines; the
    // round(6) is belt-and-braces. One exchange on the partition key.
    "q103_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Map scalar-function family (the one §2.4 scalar family not yet in
    // the inventory): per-user event-type→count map assembled with
    // map_from_entries over SORTED entries (deterministic key order), then
    // map_keys / map_values / size / element_at consume it. The final
    // projection serializes the key/value arrays with concat_ws — map
    // semantics stay exercised in-engine, but the emitted schema is
    // all-scalar so ANY downstream canonicalizer (the driver's pandas
    // sort included, which cannot factorize ndarray cells) can sort it.
    "q104_map_funcs" -> ((s, d) => {
      val counts = events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("user_id"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("event_type"), col("n")))))
          .as("m"))
        .select(col("user_id"),
          concat_ws(",", map_keys(col("m"))).as("types"),
          concat_ws(",", map_values(col("m")).cast("array<string>"))
            .as("counts"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"))
        .orderBy(col("user_id"))
    }),

    // Map TRANSFORMATION family — map_filter / transform_values /
    // map_zip_with complete §2.4's map functions beyond the
    // construction/consumption q104 covers. Both maps are built over
    // SORTED entries with identical key sets, so map_zip_with's
    // first-map-order key walk is deterministic and never sees a null
    // side. All map work happens in-engine; the projection serializes to
    // scalar strings (same driver-sortability contract as q104), and the
    // oracle replays each lambda relationally (CASE filter / n*2 /
    // n+mid) under the same ORDER BY event_type.
    "q109_map_transform" -> ((s, d) => {
      val counts = events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("event_id")).as("mid"))
      counts.groupBy(col("user_id"))
        .agg(
          map_from_entries(
            sort_array(collect_list(struct(col("event_type"), col("n")))))
            .as("m1"),
          map_from_entries(
            sort_array(collect_list(struct(col("event_type"), col("mid")))))
            .as("m2"))
        .select(col("user_id"),
          concat_ws(",",
            map_keys(map_filter(col("m1"), (_, v) => v >= 2)))
            .as("frequent_types"),
          concat_ws(",",
            map_values(transform_values(col("m1"), (_, v) => v * 2))
              .cast("array<string>")).as("doubled_counts"),
          concat_ws(",",
            map_values(map_zip_with(col("m1"), col("m2"), (_, a, b) => a + b))
              .cast("array<string>")).as("count_plus_minid"))
        .orderBy(col("user_id"))
    }),

    "q37_grouping_sets" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
           FROM lineitem_v
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    // As-of join (backward): each purchase matched to the user's most
    // recent strictly-prior click. Implemented as one pass over a
    // (ts, event_id)-ordered per-user window — no join at all, so it
    // scales as a single shuffle on user_id (the classic
    // union-and-carry-forward as-of plan).
    "q38_asof_join" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("prev_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          date_format(col("prev_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("prev_click_ts"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Pivot: per-user event-type counts as columns (fixed value list so
    // the plan is a single pass, no value-discovery job).
    "q39_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    }),

    // Analytic window functions: lag/lead/ntile/first_value over the
    // per-user event ordering.
    "q47_window_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(
          col("user_id"),
          row_number().over(w).as("rn"),
          round(col("value"), 6).as("value"),
          round(lag(col("value"), 1).over(w), 6).as("prev_value"),
          round(lead(col("value"), 1).over(w), 6).as("next_value"),
          round(col("value") - lag(col("value"), 1).over(w), 6).as("delta"),
          ntile(4).over(w).as("quartile"),
          round(first_value(col("value")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6)
            .as("first_val"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // Interval RANGE frame: orders placed by the same customer in the 30
    // days up to (and including) each order. Spark range frames need a
    // numeric ordering — epoch seconds; the oracle uses the equivalent
    // INTERVAL frame over the timestamp.
    "q48_window_range_frame" -> ((s, d) => {
      // o_orderdate reads as TIMESTAMP_NTZ which can't cast straight to
      // long — go via session-UTC timestamp first
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000L, 0L) // 30 days in seconds
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_orders_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Batch sessionization (gaps-and-islands): per-user sessions split at
    // 30-minute inactivity gaps — the batch twin of q35's streaming
    // session windows, with session_window's exact boundary rule (a gap
    // of EXACTLY 30 minutes starts a new session: windows are
    // end-exclusive), so the two engine paths are interchangeable —
    // ExtendedSpec asserts q107 ≡ q35 session-for-session. lag flags
    // session starts, a running sum numbers the islands, and the
    // per-session rollup groups on (user, session).
    // ONE exchange total: both windows and the final aggregation cluster
    // on user_id, so Catalyst reuses the same hash partitioning for all
    // three (the aggregation's (user_id, sess_id) clustering is satisfied
    // by the user_id partitioning).
    "q107_batch_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= 1800000000L,
            1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_end"))
        .orderBy(col("user_id"), col("sess_id"))
    }),

    // Banded range join: same-user event pairs within 30 minutes. The
    // scalable plan: band each event into 30-min buckets, equi-join on
    // (user, bucket) and (user, bucket+1), then filter the exact range —
    // shuffle is keyed, never the O(n²) theta-join. gap in exact micros.
    "q40_range_join" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          (unix_micros(col("ts")) / lit(1800000000L)).cast("long").as("bucket"))
      val left = ev.select(col("user_id"), col("event_id").as("a_id"),
        col("ts").as("a_ts"), col("bucket"))
      val right = ev.select(col("user_id"), col("event_id").as("b_id"),
        col("ts").as("b_ts"), explode(array(col("bucket"), col("bucket") - 1))
          .as("bucket"))
      left.join(right, Seq("user_id", "bucket"))
        .filter(col("b_ts") > col("a_ts")
          && unix_micros(col("b_ts")) - unix_micros(col("a_ts")) <= 1800000000L)
        // no distinct needed: a pair can only match one of b's two band
        // rows (bucket == a.bucket xor bucket-1 == a.bucket)
        .select(col("user_id"), col("a_id"), col("b_id"),
          (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
        .orderBy(col("user_id"), col("a_id"), col("b_id"))
    }),

    // RETENTION COHORTS — the product-analytics staple: users grouped by
    // first-seen week, then for each (cohort, weeks-since-cohort) how
    // many of them were active. Week = integer days-since-Monday-epoch
    // div 7 (all-integer — date_trunc('week') semantics vary across
    // engines). Both aggregations key on user_id, so Catalyst reuses one
    // exchange for the cohort min and the join probe; the final rollup
    // is cohort×offset-sized (tiny). At 100 TB the distinct-user count
    // per cell is the only heavy op and is exactly what it must be.
    "q158_retention_cohorts" -> ((s, d) => {
      val wk = events(s, d).select(col("user_id"),
        expr("datediff(cast(ts as date), date'1970-01-05') div 7")
          .cast("long").as("week"))
      val coh = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      wk.join(coh, "user_id")
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset_weeks"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("offset_weeks"))
    }),

    // TIME-SERIES ANOMALY DETECTION — the volume monitor every ingestion
    // pipeline runs: daily event counts scored against their own 7-day
    // trailing window (mean, sample stddev, z = (n−μ)/σ), flagged at
    // |z| > 3. The trailing frame excludes today (ROWS -7..-1) so an
    // anomalous day can't mask itself, and days without a full 7-day
    // history emit nothing instead of a noisy partial baseline. The
    // window is over the DAILY rollup — date-cardinality rows, so the
    // unpartitioned ordering is a few-row sort, not a corpus sort; the
    // heavy lifting is the partial-aggregated count. σ = 0 (a perfectly
    // flat week) yields z = 0 by convention in BOTH engines rather than
    // an engine-specific division edge case.
    "q161_event_anomalies" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val t7 = Window.orderBy(col("day")).rowsBetween(-7, -1)
      daily
        .withColumn("mu", avg(col("n")).over(t7))
        .withColumn("sd", stddev_samp(col("n")).over(t7))
        .withColumn("n_hist", count(lit(1)).over(t7))
        .filter(col("n_hist") === 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          round(col("mu"), 4).as("mu7"), round(col("sd"), 4).as("sd7"),
          round(when(col("sd") > 0, (col("n") - col("mu")) / col("sd"))
            .otherwise(lit(0.0)), 4).as("z"),
          when(col("sd") > 0 && abs((col("n") - col("mu")) / col("sd")) > 3,
            1).otherwise(0).as("is_anomaly"))
        .orderBy(col("day"))
    }),

    // SCD TYPE-2 DIMENSION BUILD — the warehouse staple: an event log
    // becomes a versioned dimension with validity intervals. The tracked
    // attribute is the user's tier (props.k div 25 — JSON-extracted);
    // consecutive equal tiers collapse into one version
    // (gaps-and-islands: change flag via lag, running sum numbers the
    // versions), each version carries [valid_from, valid_to) chained
    // through lead over the version sequence, open-ended current rows
    // flagged. Everything windows per user on (ts, event_id) — one hash
    // exchange on user_id serves the change detection, the version
    // rollup, and the interval chaining.
    "q164_scd2_dimension" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = events(s, d).select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(get_json_object(props, '$.k') as bigint) div 25").as("tier"))
      val chg = e.withColumn("is_chg",
        when(lag(col("tier"), 1).over(w).isNull
          || lag(col("tier"), 1).over(w) =!= col("tier"), 1L).otherwise(0L))
      val ver = chg.withColumn("v", sum(col("is_chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val dim = ver.groupBy(col("user_id"), col("v"))
        .agg(max(col("tier")).as("tier"), min(col("ts")).as("valid_from"))
      val wv = Window.partitionBy(col("user_id")).orderBy(col("v"))
      dim.select(col("user_id"), col("v").as("ver"), col("tier"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("valid_from"),
          date_format(lead(col("valid_from"), 1).over(wv),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
          lead(col("valid_from"), 1).over(wv).isNull.cast("int").as("is_current"))
        .orderBy(col("user_id"), col("ver"))
    }),

    // BEHAVIORAL PATH MINING — q83's 2-step transition matrix extended
    // to ranked 3-grams: the most common 3-event journeys across user
    // streams (each user's events ordered by (ts, event_id), windows
    // never cross users). One user_id exchange feeds the double lead;
    // the path rollup is |event_types|³-bounded, and the top-10 is a
    // heap cut over that bounded relation, then rank-numbered on the 10
    // survivors — nothing after the window touches event-cardinality
    // data.
    "q165_event_paths" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val paths = events(s, d)
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
      val top = paths.orderBy(col("n").desc, col("path")).limit(10)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("n").desc, col("path"))))
        .select(col("rk"), col("path"), col("n"))
        .orderBy(col("rk"))
    }),

    // POINT-IN-TIME SNAPSHOT over the q164 SCD2 dimension — the
    // temporal lookup a versioned dimension exists to answer: how many
    // users sat in each tier at each midnight? The q163/q132 composition
    // discipline: the dimension relation IS q164's output (one
    // implementation of the versioning), probed at day boundaries that
    // fall MID-interval, so the [valid_from, valid_to) containment does
    // real work (an event-time join would trivially read the event's own
    // tier). The day spine is bounded (the fixture's date range) and
    // broadcast, so the containment join is a broadcast nested-loop over
    // dim × days — dim-sized work, never event-sized; the fixed-width
    // timestamp strings compare chronologically, which is what makes the
    // sibling's formatted output directly joinable. Users whose first
    // version opens after a boundary are absent that day by design.
    "q174_pit_snapshot" -> ((s, d) => {
      val dim = queries("q164_scd2_dimension")(s, d)
      val days = events(s, d)
        .select(date_format(date_trunc("day", col("ts")),
          "yyyy-MM-dd 00:00:00.SSSSSS").as("day_ts")).distinct()
      dim.join(broadcast(days),
          col("valid_from") <= col("day_ts") &&
            (col("valid_to").isNull || col("day_ts") < col("valid_to")))
        .groupBy(substring(col("day_ts"), 1, 10).as("day"), col("tier"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("day"), col("tier"))
    }),

    // LAST-TOUCH ATTRIBUTION — the conversion-analytics staple: each
    // purchase attributes to the user's most recent click within a 24 h
    // lookback. NOT a self-join: the most-recent-click-before-me is a
    // conditional running MAX over the per-user event-time window (ts is
    // monotone within the frame, so max(click ts) IS the latest one),
    // which rides the SAME single user_id exchange every per-user
    // operator here uses; everything after the window is purchase-sized.
    // Delays are floor(microsecond diff / 1e6) — integer seconds both
    // engines compute identically (date_diff counts boundary crossings
    // and would disagree on sub-second offsets).
    "q176_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val buys = events(s, d)
        .withColumn("last_click_us",
          max(when(col("event_type") === "click", unix_micros(col("ts"))))
            .over(w))
        .filter(col("event_type") === "purchase")
        .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
            .as("day"),
          (col("last_click_us").isNotNull &&
            unix_micros(col("ts")) - col("last_click_us") <= 86400000000L)
            .cast("long").as("attributed"),
          expr("(unix_micros(ts) - last_click_us) div 1000000")
            .as("delay_s"))
      buys.groupBy(col("day"))
        .agg(count(lit(1)).as("n_buys"),
          sum(col("attributed")).as("n_attributed"),
          sum(when(col("attributed") === 1, col("delay_s")))
            .as("total_delay_s"))
        .orderBy(col("day"))
    }),

    // CONVERSION FUNNEL — the product-analytics staple the event family
    // still lacked: users progressing view → click → purchase, each step
    // the FIRST qualifying event at-or-after the previous step's
    // timestamp and within a 6-hour step window. Defined DECLARATIVELY
    // as three chained per-user min-timestamps (t1 = first view; t2 =
    // first click in [t1, t1+W]; t3 = first purchase in [t2, t2+W])
    // rather than running-window flags: the min-ts form has no
    // order-tie semantics to diverge on (a click in the same microsecond
    // as t1 qualifies on both engines via >=), and every join is
    // user-keyed — three partial-aggregated rollups riding the same hash
    // exchange, each join's right side user-cardinality, nothing
    // event-pair-sized anywhere. Output is the 3-row funnel: users
    // reached, step-over-step conversion, and total transition delay in
    // integer seconds (floor of the microsecond diff — the q176
    // arithmetic both engines compute identically).
    "q193_funnel" -> ((s, d) => {
      val W = 21600000000L // 6 h in microseconds
      val ev = events(s, d)
      def us(c: Column) = unix_micros(c)
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(us(col("ts")) >= us(col("t1")) &&
          us(col("ts")) - us(col("t1")) <= W)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(us(col("ts")) >= us(col("t2")) &&
          us(col("ts")) - us(col("t2")) <= W)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val s1 = t1.agg(count(lit(1)).as("n1"))
      val s2 = t2.join(t1, "user_id")
        .agg(count(lit(1)).as("n2"),
          sum(expr("(unix_micros(t2) - unix_micros(t1)) div 1000000"))
            .as("d2"))
      val s3 = t3.join(t2, "user_id")
        .agg(count(lit(1)).as("n3"),
          sum(expr("(unix_micros(t3) - unix_micros(t2)) div 1000000"))
            .as("d3"))
      val r1 = s1.select(lit(1L).as("step"), lit("view").as("step_name"),
        col("n1").as("n_users"), lit(null).cast("double").as("conv_rate"),
        lit(null).cast("long").as("total_delay_s"))
      val r2 = s2.crossJoin(s1).select(lit(2L).as("step"),
        lit("click").as("step_name"), col("n2").as("n_users"),
        when(col("n1") === 0, lit(null).cast("double"))
          .otherwise(round(col("n2") / col("n1").cast("double"), 4))
          .as("conv_rate"),
        col("d2").cast("long").as("total_delay_s"))
      val r3 = s3.crossJoin(s2).select(lit(3L).as("step"),
        lit("purchase").as("step_name"), col("n3").as("n_users"),
        when(col("n2") === 0, lit(null).cast("double"))
          .otherwise(round(col("n3") / col("n2").cast("double"), 4))
          .as("conv_rate"),
        col("d3").cast("long").as("total_delay_s"))
      r1.unionByName(r2).unionByName(r3).orderBy(col("step"))
    }),

    // EWMA VOLUME MONITOR — q161's z-score sibling with exponential
    // decay: daily event counts smoothed by e_d = n_d/2 + e_{d-1}/2
    // (α = 1/2), plus the "surprise" ratio n_d / e_{d-1} an ops page
    // alerts on. α = 1/2 is chosen for REPLAYABILITY, not laziness:
    // unrolled, every term is count × 2^-k — an exact dyadic double —
    // and the daily counts' mantissas (≲ 2^20) plus 2^-29 weights span
    // < 53 bits, so the sums are EXACT and immune to accumulation order
    // on both engines (no round() crutch needed on ewma itself). The
    // recursion is computed as its closed-form triangular unroll over
    // the DAILY rollup — date-cardinality rows (the q161 bounded-window
    // discipline: heavy lifting is the partial-aggregated count; the
    // rank/lag windows order a ~30-row relation, never the corpus).
    "q200_ewma_volume" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val wd = Window.orderBy(col("day"))
      val idx = daily.withColumn("i", row_number().over(wd).cast("long"))
      val ew = idx.as("a").join(idx.as("b"), col("b.i") <= col("a.i"))
        .groupBy(col("a.day").as("day"), col("a.n").as("n"),
          col("a.i").as("i"))
        .agg(sum(col("b.n") *
          when(col("b.i") === 1, pow(lit(0.5), col("a.i") - 1))
            .otherwise(pow(lit(0.5), col("a.i") - col("b.i") + 1)))
          .as("ewma"))
      ew.withColumn("prev", lag(col("ewma"), 1).over(Window.orderBy(col("day"))))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
          col("ewma"),
          when(col("prev").isNull, lit(null).cast("double"))
            .otherwise(round(col("n") / col("prev"), 4)).as("surprise"))
        .orderBy(col("day"))
    }),

    // PEAK CONCURRENCY — the interval-overlap aggregation a capacity
    // planner reads: the maximum number of simultaneously-open sessions
    // per day. Sessions are q107's derivation verbatim (≥ 30-min gap
    // splits, the same (ts, event_id) ordering); each session emits a
    // +1/-1 boundary pair and concurrency is the running sum over
    // boundaries ordered (t, delta DESC) — a session starting at the
    // exact instant another ends counts as overlapping, which the
    // tiebreak pins identically on both engines. The running sum is NOT
    // a global window: the q194/q178 two-phase pattern keyed by day —
    // per-day boundary totals cumulated through a bounded triangular
    // join give each day its carry-in concurrency, and the within-day
    // running sum partitions by day — so the sweep distributes while
    // sessions crossing midnight still count via the carry.
    "q201_peak_concurrency" -> ((s, d) => {
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wu))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts"))
              >= 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_sess")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      val b = sess.select(col("t0").as("t"), lit(1L).as("delta"))
        .unionByName(sess.select(col("t1").as("t"), lit(-1L).as("delta")))
        .withColumn("day", col("t").cast("date"))
      val dayTot = b.groupBy(col("day")).agg(sum(col("delta")).as("dt"))
      val offsets = dayTot.as("a")
        .join(dayTot.as("b"), col("b.day") < col("a.day"), "left")
        .groupBy(col("a.day").as("day"))
        .agg(coalesce(sum(col("b.dt")), lit(0L)).as("carry"))
      val wDay = Window.partitionBy(col("day"))
        .orderBy(col("t"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      b.withColumn("run", sum(col("delta")).over(wDay))
        .join(offsets, "day")
        .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(max(col("carry") + col("run")).as("peak"))
        .orderBy(col("day"))
    })
  )

  /** q164's full replay — also embedded verbatim as q174's dimension
    * leg, so the two entries can never drift apart. */
  private val Scd2Oracle: String =
    """WITH e AS (
           SELECT user_id, ts, event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS tier
           FROM events),
         chg AS (
           SELECT user_id, ts, event_id, tier,
             CASE WHEN lag(tier) OVER w IS NULL OR lag(tier) OVER w <> tier
                  THEN 1 ELSE 0 END AS is_chg
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         ver AS (
           SELECT user_id, ts, tier,
             sum(is_chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS v
           FROM chg),
         dim AS (
           SELECT user_id, v, max(tier) AS tier, min(ts) AS valid_from
           FROM ver GROUP BY user_id, v)
         SELECT user_id, CAST(v AS BIGINT) AS ver, tier,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY v),
             '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY v)
             IS NULL AS INT) AS is_current
         FROM dim ORDER BY user_id, ver"""

  val oracles: Map[String, String] = Map(
    "q96_stats_agg" ->
      """SELECT l_returnflag, count(*) AS n,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(stddev_samp(l_extendedprice), 2) AS sd_price,
         round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
         round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q108_skew_kurtosis" ->
      """WITH mu AS (
           SELECT l_returnflag, avg(l_extendedprice) AS m, count(*) AS n
           FROM lineitem GROUP BY 1),
         mom AS (
           SELECT l.l_returnflag,
             sum(pow(l.l_extendedprice - mu.m, 2)) AS m2,
             sum(pow(l.l_extendedprice - mu.m, 3)) AS m3,
             sum(pow(l.l_extendedprice - mu.m, 4)) AS m4,
             any_value(mu.n) AS n
           FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
           GROUP BY 1)
         SELECT l_returnflag, n,
           round(sqrt(n) * m3 / pow(m2, 1.5), 6) AS price_skew,
           round(n * m4 / (m2 * m2) - 3, 6) AS price_kurt
         FROM mom ORDER BY l_returnflag""",
    "q97_histogram" ->
      """WITH bounds AS (
           SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
           FROM lineitem)
         SELECT CASE WHEN hi = lo THEN 0
           ELSE CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 10.0)),
             9.0) AS BIGINT) END AS bucket, count(*) AS n_items
         FROM lineitem CROSS JOIN bounds
         GROUP BY 1 ORDER BY bucket""",
    "q100_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         t(event_type) AS (
           VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')),
         c AS (
           SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n_events
         FROM u CROSS JOIN t
         LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
         ORDER BY u.user_id, t.event_type""",
    "q89_lateral_topk" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_name, round(c_acctbal, 2) AS c_acctbal
                  FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""",
    "q103_window_dist" ->
      """SELECT o_custkey, o_orderkey,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q104_map_funcs" ->
      """WITH c AS (
           SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types,
           string_agg(CAST(n AS VARCHAR), ',' ORDER BY event_type) AS counts,
           count(*) AS n_types,
           coalesce(max(CASE WHEN event_type = 'click' THEN n END), 0) AS clicks
         FROM c GROUP BY user_id ORDER BY user_id""",
    "q109_map_transform" ->
      """WITH c AS (
           SELECT user_id, event_type, count(*) AS n, min(event_id) AS mid
           FROM events GROUP BY 1, 2)
         SELECT user_id,
           coalesce(string_agg(CASE WHEN n >= 2 THEN event_type END, ','
             ORDER BY event_type), '') AS frequent_types,
           string_agg(CAST(n * 2 AS VARCHAR), ',' ORDER BY event_type)
             AS doubled_counts,
           string_agg(CAST(n + mid AS VARCHAR), ',' ORDER BY event_type)
             AS count_plus_minid
         FROM c GROUP BY user_id ORDER BY user_id""",
    "q37_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q38_asof_join" ->
      """SELECT p.user_id, p.event_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
         strftime((SELECT max(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND (c.ts, c.event_id) < (p.ts, p.event_id)),
           '%Y-%m-%d %H:%M:%S.%f') AS prev_click_ts
         FROM events p WHERE p.event_type = 'purchase'
         ORDER BY p.user_id, p.event_id""",
    "q39_pivot" ->
      """SELECT user_id,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q47_window_analytics" ->
      """SELECT user_id,
         row_number() OVER w AS rn,
         round(value, 6) AS value,
         round(lag(value, 1) OVER w, 6) AS prev_value,
         round(lead(value, 1) OVER w, 6) AS next_value,
         round(value - lag(value, 1) OVER w, 6) AS delta,
         ntile(4) OVER w AS quartile,
         round(first_value(value) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS first_val
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, rn""",
    "q48_window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
         count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
           AS n_orders_30d
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q107_batch_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         f AS (
           SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
               THEN 1 ELSE 0 END AS new_sess
           FROM e),
         g AS (
           SELECT user_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS sess_id
           FROM f)
         SELECT user_id, sess_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end
         FROM g GROUP BY 1, 2 ORDER BY user_id, sess_id""",
    "q40_range_join" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
         epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND b.ts > a.ts
           AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
         ORDER BY a.user_id, a_id, b_id""",
    "q158_retention_cohorts" ->
      """WITH wk AS (SELECT user_id,
           date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 AS week
         FROM events),
         coh AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id)
         SELECT c.cohort, w.week - c.cohort AS offset_weeks,
           count(DISTINCT w.user_id) AS n_users
         FROM wk w JOIN coh c ON c.user_id = w.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q161_event_anomalies" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1),
         w AS (
           SELECT day, n,
             avg(n) OVER t7 AS mu, stddev_samp(n) OVER t7 AS sd,
             count(*) OVER t7 AS n_hist
           FROM daily
           WINDOW t7 AS (ORDER BY day
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT strftime(day, '%Y-%m-%d') AS day, n,
           round(mu, 4) AS mu7, round(sd, 4) AS sd7,
           round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END, 4) AS z,
           CAST(sd > 0 AND abs((n - mu) / sd) > 3 AS INT) AS is_anomaly
         FROM w WHERE n_hist = 7 ORDER BY day""",
    "q164_scd2_dimension" -> Scd2Oracle,

    // the q174 replay embeds the SIBLING's oracle verbatim as the
    // dimension leg (q163's composition discipline)
    "q174_pit_snapshot" ->
      s"""WITH dimv AS ($Scd2Oracle),
         days AS (
           SELECT DISTINCT strftime(date_trunc('day', ts),
             '%Y-%m-%d %H:%M:%S.%f') AS day_ts
           FROM events)
         SELECT substring(day_ts, 1, 10) AS day, tier,
           count(*) AS n_users
         FROM dimv JOIN days
           ON valid_from <= day_ts
          AND (valid_to IS NULL OR day_ts < valid_to)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q176_attribution" ->
      """WITH marked AS (
           SELECT ts, event_type,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_us
           FROM events),
         buys AS (
           SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(last_click_us IS NOT NULL AND
               epoch_us(ts) - last_click_us <= 86400000000 AS BIGINT)
               AS attributed,
             (epoch_us(ts) - last_click_us) // 1000000 AS delay_s
           FROM marked WHERE event_type = 'purchase')
         SELECT day, count(*) AS n_buys,
           CAST(sum(attributed) AS BIGINT) AS n_attributed,
           CAST(sum(CASE WHEN attributed = 1 THEN delay_s END) AS BIGINT)
             AS total_delay_s
         FROM buys GROUP BY day ORDER BY day""",
    "q165_event_paths" ->
      """WITH tri AS (
           SELECT event_type AS e1,
             lead(event_type, 1) OVER w2 AS e2,
             lead(event_type, 2) OVER w2 AS e3
           FROM events
           WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
         paths AS (
           SELECT concat(e1, '>', e2, '>', e3) AS path, count(*) AS n
           FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1)
         SELECT rk, path, n FROM (
           SELECT path, n,
             row_number() OVER (ORDER BY n DESC, path) AS rk
           FROM paths)
         WHERE rk <= 10 ORDER BY rk""",
    // the same three chained min-ts definitions; >= plus an epoch_us
    // difference bound, so microsecond ties behave identically
    "q193_funnel" ->
      """WITH t1 AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         t2 AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN t1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= t1.t1
             AND epoch_us(e.ts) - epoch_us(t1.t1) <= 21600000000
           GROUP BY e.user_id),
         t3 AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN t2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
             AND epoch_us(e.ts) - epoch_us(t2.t2) <= 21600000000
           GROUP BY e.user_id),
         s1 AS (SELECT count(*) AS n FROM t1),
         s2 AS (SELECT count(*) AS n,
             CAST(sum((epoch_us(t2.t2) - epoch_us(t1.t1)) // 1000000)
               AS BIGINT) AS delay
           FROM t2 JOIN t1 USING (user_id)),
         s3 AS (SELECT count(*) AS n,
             CAST(sum((epoch_us(t3.t3) - epoch_us(t2.t2)) // 1000000)
               AS BIGINT) AS delay
           FROM t3 JOIN t2 USING (user_id))
         SELECT 1::BIGINT AS step, 'view' AS step_name, n AS n_users,
           CAST(NULL AS DOUBLE) AS conv_rate,
           CAST(NULL AS BIGINT) AS total_delay_s FROM s1
         UNION ALL
         SELECT 2, 'click', s2.n,
           CASE WHEN s1.n = 0 THEN NULL
             ELSE round(s2.n / CAST(s1.n AS DOUBLE), 4) END,
           s2.delay FROM s2, s1
         UNION ALL
         SELECT 3, 'purchase', s3.n,
           CASE WHEN s2.n = 0 THEN NULL
             ELSE round(s3.n / CAST(s2.n AS DOUBLE), 4) END,
           s3.delay FROM s3, s2
         ORDER BY step""",
    // the identical triangular unroll — exact dyadic terms make the sum
    // order-independent, so no rounding is needed on ewma itself
    "q200_ewma_volume" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1),
         idx AS (
           SELECT day, n, row_number() OVER (ORDER BY day) AS i FROM daily),
         ew AS (
           SELECT a.day, a.n, a.i,
             sum(b.n * CASE WHEN b.i = 1 THEN power(0.5, a.i - 1)
               ELSE power(0.5, a.i - b.i + 1) END) AS ewma
           FROM idx a JOIN idx b ON b.i <= a.i
           GROUP BY a.day, a.n, a.i),
         fin AS (
           SELECT e.day, e.n, e.ewma,
             lag(e.ewma) OVER (ORDER BY e.day) AS prev
           FROM ew e)
         SELECT strftime(day, '%Y-%m-%d') AS day, n, ewma,
           CASE WHEN prev IS NULL THEN NULL
             ELSE round(n / prev, 4) END AS surprise
         FROM fin ORDER BY day""",
    // q107's session derivation verbatim, then the boundary sweep as a
    // single window (fine at oracle SF; the engine distributes it) with
    // the same (t, delta DESC) tiebreak
    "q201_peak_concurrency" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM e),
         sess AS (
           SELECT user_id, sid, min(ts) AS t0, max(ts) AS t1
           FROM s GROUP BY 1, 2),
         b AS (
           SELECT t0 AS t, 1 AS delta FROM sess
           UNION ALL SELECT t1, -1 FROM sess),
         c AS (
           SELECT t, sum(delta) OVER (ORDER BY t, delta DESC
             ROWS UNBOUNDED PRECEDING) AS conc
           FROM b)
         SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS day,
           CAST(max(conc) AS BIGINT) AS peak
         FROM c GROUP BY 1 ORDER BY 1"""
  )
}
