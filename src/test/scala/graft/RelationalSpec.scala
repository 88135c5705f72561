package graft

import graft.operators.RelationalQueries
import org.apache.spark.sql.functions._

/** Structural invariants for the relational inventory at sf0.001 (the
  * value-exact check against DuckDB runs driver-side; these are the
  * fast local guards).
  */
class RelationalSpec extends TestSpark {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("every declared query runs and returns rows at sf0.001") {
    // streaming + heavy queries are exercised in their own suites; here
    // cover the relational core cheaply.
    val names = RelationalQueries.queries.keys.toSeq.sorted
    val empty = names.filter(n => run(n).isEmpty)
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("every query key has matching oracle column names or is declared rows-only") {
    val qs = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    assert(oracles.keySet.subsetOf(qs.keySet),
      s"oracle without query: ${oracles.keySet -- qs.keySet}")
  }

  test("q09 rollup grand-total row equals lineitem row count") {
    val total = run("q09_rollup")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .collect()
    assert(total.length == 1)
    assert(total(0).getAs[Long]("n_rows") == Tables.lineitem(spark, sf0001).count())
  }

  test("q05 semi-join returns a subset of orders; q06 anti-join disjoint from orders") {
    val semi = run("q05_semi_join").count()
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(semi > 0 && semi < nOrders)
    val anti = run("q06_anti_join").select("c_custkey")
    val urgentCustomers = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    assert(anti.intersect(urgentCustomers).isEmpty)
  }

  test("q11 set ops partition the nation space") {
    val rows = run("q11_set_ops").collect()
    val byTag = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1)).toSet)
    val both = byTag.getOrElse("both", Set.empty[Int])
    val cust = byTag.getOrElse("cust_only", Set.empty[Int])
    val supp = byTag.getOrElse("supp_only", Set.empty[Int])
    assert((both & cust).isEmpty && (both & supp).isEmpty && (cust & supp).isEmpty)
  }

  test("q12 top-k is ordered descending") {
    val prices = run("q12_topk").collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q07 window rank: at most 3 rows per customer, ranks 1..3") {
    val rows = run("q07_window_rank").collect()
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 3))
    assert(perCust.values.forall(g => g.map(_.getAs[Int]("rk")).sorted
      .sameElements(1 to g.length)))
  }

  test("q158 retention cohorts: offset-0 equals cohort size, retention never exceeds it") {
    val rows = run("q158_retention_cohorts").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort"))
    // users whose first week is W form cohort W — recount directly
    val sizes = Tables.events(spark, sf0001)
      .select(col("user_id"),
        expr("datediff(cast(ts as date), date'1970-01-05') div 7").as("week"))
      .groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      .groupBy(col("cohort")).count().collect()
      .map(r => r.getAs[Long]("cohort") -> r.getAs[Long]("count")).toMap
    assert(byCohort.keySet == sizes.keySet, "cohort set mismatch")
    byCohort.foreach { case (c, rs) =>
      val at0 = rs.find(_.getAs[Long]("offset_weeks") == 0L)
      assert(at0.isDefined, s"cohort $c lacks its offset-0 row")
      assert(at0.get.getAs[Long]("n_users") == sizes(c),
        s"cohort $c offset-0 must equal cohort size")
      assert(rs.forall(_.getAs[Long]("n_users") <= sizes(c)),
        s"cohort $c retains more users than it has")
      assert(rs.forall(_.getAs[Long]("offset_weeks") >= 0L),
        s"cohort $c has activity before its own first week")
    }
  }

  test("q161 anomalies: z agrees with the trailing stats, flag fires exactly at |z| > 3") {
    val rows = run("q161_event_anomalies").collect()
    assert(rows.nonEmpty, "fixture spans > 8 days, output must be non-empty")
    rows.foreach { r =>
      val (n, mu, sd, z) = (r.getAs[Long]("n"), r.getAs[Double]("mu7"),
        r.getAs[Double]("sd7"), r.getAs[Double]("z"))
      if (sd > 0) {
        assert(math.abs(z - (n - mu) / sd) < 1e-2,
          s"day ${r.getAs[String]("day")}: z $z vs recomputed ${(n - mu) / sd}")
      } else assert(z == 0.0, "flat-week convention is z = 0")
      assert((r.getAs[Int]("is_anomaly") == 1) == (sd > 0 && math.abs(z) > 3),
        s"day ${r.getAs[String]("day")}: flag inconsistent with z")
    }
    // the trailing window excludes today: for the first output day, mu7
    // must equal the mean of the 7 PRIOR days' counts, not include today
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("ts").cast("date").as("day")).count()
      .orderBy(col("day")).collect().map(_.getAs[Long]("count"))
    val first = rows.minBy(_.getAs[String]("day"))
    val expectMu = daily.take(7).sum.toDouble / 7
    assert(math.abs(first.getAs[Double]("mu7") - expectMu) < 1e-4,
      "first output day's baseline must be exactly the 7 prior days")
  }

  test("q164 SCD2: one open row per user, intervals chain, versions actually change") {
    val rows = run("q164_scd2_dimension").collect()
    val users = Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(rows.count(_.getAs[Int]("is_current") == 1) == users,
      "exactly one open-ended version per user")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val byVer = rs.sortBy(_.getAs[Long]("ver"))
      assert(byVer.map(_.getAs[Long]("ver")).sameElements(1L to byVer.length),
        s"user $u versions must be dense from 1")
      byVer.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"),
            s"user $u: interval chain broken at ver ${a.getAs[Long]("ver")}")
          assert(a.getAs[Long]("tier") != b.getAs[Long]("tier"),
            s"user $u: consecutive versions with equal tier (not collapsed)")
        case _ =>
      }
      assert(byVer.last.getAs[String]("valid_to") == null
        && byVer.init.forall(_.getAs[Int]("is_current") == 0),
        s"user $u: only the last version may be open")
    }
  }

  test("q165 paths: well-formed ranked 3-grams from the event-type domain") {
    val rows = run("q165_event_paths").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rk")).sorted.sameElements(1 to 10))
    val ns = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n"))
    assert(ns.forall(_ > 0) && ns.zip(ns.tail).forall { case (a, b) => a >= b },
      "counts must be positive and non-increasing in rank")
    val types = Tables.events(spark, sf0001)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      val parts = r.getAs[String]("path").split(">")
      assert(parts.length == 3 && parts.forall(types.contains),
        s"malformed path ${r.getAs[String]("path")}")
    }
  }

  test("q174 PIT snapshot: day totals equal users with an open version") {
    val snap = run("q174_pit_snapshot").collect()
    val dim = run("q164_scd2_dimension").collect()
    assert(snap.nonEmpty)
    // at each midnight, every user contributes AT MOST one version, and
    // exactly one iff their first version opened on or before it
    val perDay = snap.groupBy(_.getAs[String]("day")).view
      .mapValues(_.map(_.getAs[Long]("n_users")).sum).toMap
    val firstOpen = dim.filter(_.getAs[Long]("ver") == 1L)
      .map(_.getAs[String]("valid_from"))
    perDay.foreach { case (day, total) =>
      val boundary = day + " 00:00:00.000000"
      val expected = firstOpen.count(_ <= boundary)
      assert(total == expected.toLong,
        s"$day: snapshot covers $total users, expected $expected")
    }
    // a later snapshot day covers at least as many users (versions only open)
    val days = perDay.toSeq.sortBy(_._1).map(_._2)
    assert(days.zip(days.tail).forall { case (a, b) => a <= b })
  }

  test("q176 attribution: buys recount, rates bounded, delays inside lookback") {
    val rows = run("q176_attribution").collect()
    assert(rows.map(_.getAs[Long]("n_buys")).sum ==
      Tables.events(spark, sf0001)
        .filter(col("event_type") === "purchase").count(),
      "every purchase lands in exactly one day row")
    rows.foreach { r =>
      val (buys, attr) = (r.getAs[Long]("n_buys"), r.getAs[Long]("n_attributed"))
      assert(attr >= 0 && attr <= buys)
      // each attributed purchase's delay is in [0, 86400] s by the
      // lookback definition, so the day total is bounded by attr * 86400
      val delay = Option(r.getAs[java.lang.Long]("total_delay_s"))
        .map(_.longValue).getOrElse(0L)
      assert(delay >= 0 && delay <= attr * 86400L,
        s"day ${r.getAs[String]("day")}: delay $delay outside [0, ${attr * 86400L}]")
    }
    assert(rows.exists(_.getAs[Long]("n_attributed") > 0),
      "fixture must attribute at least one purchase")
  }

  test("q181 RFM features recompute for a sample user; mode ties break asc") {
    val rows = run("q181_rfm_features").collect()
    val ev = Tables.events(spark, sf0001)
    assert(rows.length == ev.select("user_id").distinct().count())
    val u = rows.head.getAs[Long]("user_id")
    val mine = ev.filter(col("user_id") === u).collect()
    val r = rows.find(_.getAs[Long]("user_id") == u).get
    assert(r.getAs[Long]("n_events") == mine.length.toLong)
    // recency against the CORPUS clock, not the user's own
    val nowUs = ev.agg(max(unix_micros(col("ts")))).first().getLong(0)
    val lastUs = mine.map { x =>
      val t = x.getAs[java.sql.Timestamp]("ts")
      // seconds from getTime, sub-second micros from getNanos
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    }.max
    assert(r.getAs[Long]("recency_s") == (nowUs - lastUs) / 1000000L)
    // modal type with the (count desc, type asc) tiebreak
    val counts = mine.groupBy(_.getAs[String]("event_type")).view
      .mapValues(_.length).toSeq.sortBy { case (t, n) => (-n, t) }
    assert(r.getAs[String]("top_type") == counts.head._1)
    assert(r.getAs[Long]("top_type_n") == counts.head._2.toLong)
  }

  test("q193 funnel: per-user recompute of the chained step definitions") {
    val rows = run("q193_funnel").collect().sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[String]("step_name")).toSeq ==
      Seq("view", "click", "purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), "funnel must be monotone")
    // replay the declarative definition per user from raw events
    val W = 21600000000L
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    def firstIn(rs: Array[org.apache.spark.sql.Row], tpe: String,
        lo: Long): Option[Long] = {
      val c = rs.filter(r => r.getAs[String]("event_type") == tpe &&
        r.getAs[Long]("us") >= lo && r.getAs[Long]("us") <= lo + W)
        .map(_.getAs[Long]("us"))
      if (c.isEmpty) None else Some(c.min)
    }
    var (n1, n2, n3, d2, d3) = (0L, 0L, 0L, 0L, 0L)
    ev.values.foreach { rs =>
      val views = rs.filter(_.getAs[String]("event_type") == "view")
        .map(_.getAs[Long]("us"))
      if (views.nonEmpty) {
        n1 += 1
        val t1 = views.min
        firstIn(rs, "click", t1).foreach { t2 =>
          n2 += 1; d2 += (t2 - t1) / 1000000L
          firstIn(rs, "purchase", t2).foreach { t3 =>
            n3 += 1; d3 += (t3 - t2) / 1000000L
          }
        }
      }
    }
    assert(ns.toSeq == Seq(n1, n2, n3), s"counts ${ns.toSeq} != ($n1,$n2,$n3)")
    assert(rows(1).getAs[Long]("total_delay_s") == d2)
    assert(rows(2).getAs[Long]("total_delay_s") == d3)
    if (n1 > 0)
      assert(rows(1).getAs[Double]("conv_rate") ==
        BigDecimal(n2.toDouble / n1)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q200 EWMA: the recursion holds EXACTLY (dyadic arithmetic)") {
    val rows = run("q200_ewma_volume").collect().sortBy(_.getAs[String]("day"))
    assert(rows.length == Tables.events(spark, sf0001)
      .select(col("ts").cast("date")).distinct().count())
    val ns = rows.map(_.getAs[Long]("n"))
    val es = rows.map(_.getAs[Double]("ewma"))
    // e_1 = n_1 and e_d = n_d/2 + e_{d-1}/2, bit-exactly — α = 1/2 makes
    // every term dyadic, so == is the right comparison, not a tolerance
    assert(es(0) == ns(0).toDouble)
    (1 until es.length).foreach { i =>
      assert(es(i) == ns(i) / 2.0 + es(i - 1) / 2.0,
        s"recursion broken at day $i")
    }
    // surprise = n_d / e_{d-1} rounded HALF_UP at 4 dp; first day null
    assert(rows(0).isNullAt(rows(0).fieldIndex("surprise")))
    (1 until rows.length).foreach { i =>
      assert(rows(i).getAs[Double]("surprise") ==
        BigDecimal(ns(i) / es(i - 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q201 peak concurrency: full boundary-sweep recompute") {
    val rows = run("q201_peak_concurrency").collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("peak")).toMap
    // replay: q107 sessions, +1/-1 boundaries, (t, delta desc) sweep
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (t0, t1) = (sorted.head._2, sorted.head._2)
      sorted.tail.foreach { e =>
        if (e._2 - t1 >= 1800000000L) { out += ((t0, t1)); t0 = e._2 }
        t1 = e._2
      }
      out += ((t0, t1)); out
    }.toSeq
    val bounds = sessions.flatMap { case (a, b) => Seq((a, 1L), (b, -1L)) }
      .sortBy { case (t, d) => (t, -d) }
    var conc = 0L
    val peaks = scala.collection.mutable.Map.empty[String, Long]
    bounds.foreach { case (t, d) =>
      conc += d
      val day = java.time.Instant.ofEpochSecond(t / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), conc)
    }
    assert(rows == peaks.toMap, s"peaks diverge: $rows vs $peaks")
    assert(rows.values.forall(_ >= 1L))
  }
}
