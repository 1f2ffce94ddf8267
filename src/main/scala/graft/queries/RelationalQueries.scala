package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational coverage over the TPC-H-ish harness tables. The reference itself
 * has no SQL layer (SURVEY.md §0); these queries exercise the engine surface
 * Spark supplies — filtered aggregation, multi-way joins, windows, semi/anti
 * joins, rollup, event-time bucketing — each with a DuckDB oracle.
 *
 * Scale notes: dimension tables (region/nation/customer/supplier/part) are
 * explicitly `broadcast()`; the fact tables (lineitem/orders/events) are only
 * touched in a single scan each, with filters and column pruning pushed into
 * the parquet reader. Aggregations rely on map-side partial aggregation, so
 * the shuffle carries one row per group, not per input row.
 */
object RelationalQueries {
  import Registry.tbl

  private val ship = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")

  val all: Seq[Q] = Seq(

    // TPC-H Q1 shape: filtered scan → hash agg (partial+final) → sort.
    Q(
      "q_pricing_summary",
      "pricing summary report (filter, multi-agg, group, sort)",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit(ship))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  CAST(count(*) AS BIGINT) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // 3-way join: fact ⋈ fact (shuffle, AQE-planned) ⋈ broadcast dim.
    Q(
      "q_top_customers",
      "top-10 customers by discounted revenue (join fact-fact + broadcast dim)",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(10)
      },
      Some("""SELECT c_custkey, c_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  CAST(count(*) AS BIGINT) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin)),

    // 4-way star join up the region hierarchy, all dims broadcast.
    Q(
      "q_nation_revenue",
      "revenue per nation via star join (broadcast hierarchy dims)",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        val n = tbl(s, dir, "nation")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Window function: per-supplier best-priced line item.
    Q(
      "q_supplier_best_item",
      "per-supplier top line item by price (window rank)",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").filter(col("l_suppkey") < 20)
        val w = Window.partitionBy("l_suppkey")
          .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
        li.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 2).as("price"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
             |FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey
             |        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |      FROM lineitem WHERE l_suppkey < 20)
             |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin)),

    // Semi join (EXISTS): customers that placed a big-ticket order. The
    // filter is pushed below the join so the build side is tiny.
    Q(
      "q_semi_join",
      "customers with a big-ticket order (left semi = EXISTS)",
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 480000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 480000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Anti join (NOT EXISTS): customers with no big-ticket order.
    Q(
      "q_anti_join",
      "customers without a big-ticket order (left anti = NOT EXISTS)",
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 480000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 480000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Bloom-pruned fact join: the dim filter's keys are sketched into a
    // broadcast bloom filter and fact rows that cannot match are dropped at
    // the scan, BEFORE the join exchange. The join still runs, so false
    // positives are removed exactly — result == plain join (which is what
    // the oracle states). See operators.BloomJoin for the 100 TB rationale.
    Q(
      "q_bloom_join",
      "bloom-pruned lineitem x large-parts join, revenue by brand",
      (s, dir) => {
        val dim = tbl(s, dir, "part").filter(col("p_size") >= 48)
        val fact = tbl(s, dir, "lineitem")
        graft.operators.BloomJoin
          .prunedJoin(fact, dim, "l_partkey", "p_partkey", expectedDimKeys = 20000)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size >= 48
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Full outer join: high-balance customers vs big-order counts — both
    // sides have unmatched rows, keys coalesce.
    Q(
      "q_full_outer",
      "full outer join: rich customers vs big-ticket order counts",
      (s, dir) => {
        val rich = tbl(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
          .select(col("c_custkey"), col("c_acctbal"))
        val big = tbl(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
          .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
        rich.join(big, rich("c_custkey") === big("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            round(coalesce(col("c_acctbal"), lit(0.0)), 2).as("acctbal"),
            coalesce(col("n_big"), lit(0L)).as("n_big"))
          .orderBy("custkey")
      },
      Some("""WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0),
             |big AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big
             |        FROM orders WHERE o_totalprice > 400000.0 GROUP BY o_custkey)
             |SELECT coalesce(c_custkey, o_custkey) AS custkey,
             |       round(coalesce(c_acctbal, 0.0), 2) AS acctbal,
             |       coalesce(n_big, 0) AS n_big
             |FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
             |ORDER BY custkey""".stripMargin)),

    // Rollup: subtotal hierarchy (grouping-sets surface).
    Q(
      "q_rollup",
      "rollup subtotals over returnflag/linestatus",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Distinct aggregation: exact distinct counts per segment.
    Q(
      "q_distinct_count",
      "exact distinct order count per market segment",
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             |  CAST(count(*) AS BIGINT) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Event-time tumbling window aggregation (batch form; the streaming form
    // in graft.streaming.Ingest produces the identical frame).
    Q(
      "q_events_hourly",
      "hourly tumbling-window event counts and value sums",
      (s, dir) =>
        EventsTable.load(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .select(col("w.start").cast("string").as("win_start"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy("win_start", "event_type"),
      Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS win_start, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum("value"), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // Pivot: event-type counts as columns per market-segment-sized user
    // cohort (groupBy.pivot compiles to conditional aggregates — one pass).
    Q(
      "q_pivot",
      "pivot event types to columns per user cohort",
      (s, dir) =>
        EventsTable.load(s, dir)
          .withColumn("cohort", (col("user_id") % 5).cast("long"))
          .groupBy("cohort")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("cohort"),
      Some("""SELECT user_id % 5 AS cohort,
             |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin)),

    // Set operations: INTERSECT / EXCEPT (distinct semantics) between two
    // customer populations.
    Q(
      "q_set_ops",
      "customers both high-balance and with orders (intersect), and without (except)",
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders")
        val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        val active = o.select(col("o_custkey").as("c_custkey")).distinct()
        rich.intersect(active).withColumn("tag", lit("rich_active"))
          .unionByName(rich.except(active).withColumn("tag", lit("rich_inactive")))
          .orderBy("tag", "c_custkey")
      },
      Some("""WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
             |active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
             |SELECT c_custkey, 'rich_active' AS tag FROM (SELECT * FROM rich INTERSECT SELECT * FROM active)
             |UNION ALL
             |SELECT c_custkey, 'rich_inactive' AS tag FROM (SELECT * FROM rich EXCEPT SELECT * FROM active)
             |ORDER BY tag, c_custkey""".stripMargin)),

    // Correlated scalar subquery (Catalyst decorrelates to an aggregate +
    // join): orders priced above their customer's own average.
    Q(
      "q_correlated_subquery",
      "orders above their customer's average order value (decorrelated)",
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql(
          """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
            |FROM orders_v o
            |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders_v i
            |                            WHERE i.o_custkey = o.o_custkey)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
             |FROM orders o
             |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders i
             |                            WHERE i.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // Bounded range join via time-bucketization: each error event counts the
    // same user's events within +/-5 minutes. A naive inequality join is
    // O(|L| x |R|) per user; bucketing to 5-minute cells and probing the 3
    // adjacent cells makes it an equi-join whose cost tracks the TRUE match
    // count — the scalable range-join recipe. Oracle does the naive
    // inequality join (same result, different plan).
    Q(
      "q_range_join",
      "events within +/-5 minutes of each error event (bucketized range join)",
      (s, dir) => {
        val win = 300000000L // 5 min in micros
        val ev = EventsTable.load(s, dir)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"),
            col("event_type"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("tsu"))
        // probe side replicated into its own and both adjacent buckets;
        // each reference row lives in exactly one bucket, so every true
        // match is produced exactly once
        val probes = errors
          .withColumn("off", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("pb", (col("tsu") / win).cast("long") + col("off"))
        val others = ev.select(col("user_id").as("u2"), col("tsu").as("tsu2"),
            col("event_id").as("eid2"))
          .withColumn("ob", (col("tsu2") / win).cast("long"))
        probes.join(others,
            col("user_id") === col("u2") && col("pb") === col("ob"))
          .filter(abs(col("tsu2") - col("tsu")) <= win && col("eid2") =!= col("event_id"))
          .groupBy("event_id", "user_id")
          .agg(countDistinct("eid2").as("n_nearby"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type FROM events),
             |err AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'error')
             |SELECT err.event_id, err.user_id, CAST(count(DISTINCT e2.event_id) AS BIGINT) AS n_nearby
             |FROM err JOIN e e2
             |  ON err.user_id = e2.user_id
             | AND abs(e2.tsu - err.tsu) <= 300000000
             | AND e2.event_id <> err.event_id
             |GROUP BY err.event_id, err.user_id
             |ORDER BY err.event_id""".stripMargin)),

    // Analytic window frames: lag/lead deltas + running frame aggregate
    // per user over event time (micros to keep both engines identical).
    Q(
      "q_lag_lead",
      "per-user event deltas (lag) and running value sum (frame)",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        EventsTable.load(s, dir)
          .filter(col("user_id") < 10)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"), col("value"))
          .withColumn("gap_us", col("tsu") - lag("tsu", 1).over(w))
          .withColumn("next_type_n", lead("event_id", 1).over(w))
          .withColumn("run_sum", round(sum("value").over(run), 2))
          .select(col("event_id"), col("user_id"), col("gap_us"),
            col("next_type_n"), col("run_sum"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, "value"
             |          FROM events WHERE user_id < 10)
             |SELECT event_id, user_id,
             |  tsu - lag(tsu, 1) OVER w AS gap_us,
             |  lead(event_id, 1) OVER w AS next_type_n,
             |  round(sum("value") OVER (PARTITION BY user_id ORDER BY tsu, event_id
             |        ROWS UNBOUNDED PRECEDING), 2) AS run_sum
             |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // F12/S3: schema-enforced JSON parsing (from_json) — malformed or
    // mis-typed props become NULL (fail-fast surface), then aggregate.
    Q(
      "q_json_extract",
      "parse JSON props column with schema enforcement, aggregate by type",
      (s, dir) =>
        EventsTable.load(s, dir)
          .withColumn("k",
            from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("k")).as("n_parsed"),
            sum(col("k").cast("long")).as("sum_k"),
            count(when(col("k") > 50, 1)).as("n_high"))
          .orderBy("event_type"),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_parsed,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             |  CAST(count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50 THEN 1 END) AS BIGINT) AS n_high
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Full grouping-sets surface: CUBE over two dimensions.
    Q(
      "q_cube",
      "cube subtotals over returnflag x linestatus",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(round(sum("l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("n"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Gap-based sessionization via session_window (the batch twin of the
    // Structured Streaming session operator). All timestamps compared in
    // epoch MICROSECONDS on both engines (the fixture is nanos parquet;
    // comparing at different precisions would drift at window edges).
    // State per (user, open session) only — watermark-boundable in the
    // streaming form.
    Q(
      "q_sessionize",
      "6-hour-gap sessions per user: start, size, duration, value sum",
      (s, dir) =>
        EventsTable.load(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("w"))
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("sum_value"),
            unix_micros(min(col("ts"))).as("start_us"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
          .select(col("user_id"), col("start_us"), col("n_events"), col("dur_us"), col("sum_value"))
          .orderBy("user_id", "start_us"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, "value" FROM events),
             |flagged AS (
             |  SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
             |                   OR tsu - lag(tsu) OVER w >= 21600000000 THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)),
             |sessioned AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged)
             |SELECT user_id, min(tsu) AS start_us, CAST(count(*) AS BIGINT) AS n_events,
             |       max(tsu) - min(tsu) AS dur_us, round(sum("value"), 2) AS sum_value
             |FROM sessioned GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin))
  )
}
