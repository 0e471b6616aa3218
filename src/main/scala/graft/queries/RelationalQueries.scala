package graft.queries

import graft.model.Tables
import org.apache.spark.sql.functions._

/**
 * Relational surface (SURVEY.md §2.5): the SQL capabilities the reference
 * delegates to Presto/Hive over the landed table, provided natively. Joins
 * declare sizes honestly (explicit `broadcast` on dimension tables) so the
 * physical plan at 100 TB is broadcast-hash where the dim fits and
 * shuffle-hash/sort-merge on the fact-fact edges, with AQE re-planning skew.
 */
object RelationalQueries {

  // TPC-H Q1 shape — the canonical scan-heavy aggregate: one pass over
  // lineitem, map-side partial agg, 4-group final. At 100 TB this is scan-
  // bound; the filter and the 7-column projection reach the parquet reader.
  val q15 = Q(
    "q15_pricing_summary",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity"), 2).as("avg_qty"),
        Det.davg(col("l_extendedprice"), 2).as("avg_price"),
        Det.davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(
      s"""SELECT l_returnflag, l_linestatus,
         |       ${Det.dsumSql("l_quantity")} AS sum_qty,
         |       ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |       ${Det.davgSql("l_quantity", 2)} AS avg_qty,
         |       ${Det.davgSql("l_extendedprice", 2)} AS avg_price,
         |       ${Det.davgSql("l_discount", 4)} AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // TPC-H Q3 shape — selective dim filter, two joins, top-N by aggregate.
  // customer is the small side (broadcast); orders⋈lineitem shuffles on
  // orderkey. Top-10 via sort+limit (TakeOrderedAndProject physically —
  // no global sort at scale).
  val q16 = Q(
    "q16_shipping_priority",
    (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-01-01"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1997-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |       o_orderpriority,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin))

  // TPC-H Q5 shape — five-way snowflake join with broadcast dims
  // (region/nation/supplier/customer) and one fact-fact shuffle edge.
  val q17 = Q(
    "q17_local_supplier_volume",
    (s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(
      s"""SELECT n_name,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin))

  // Left-semi join — EXISTS. Build side is the distinct key set only;
  // Catalyst never materializes the payload of the right side.
  val q18 = Q(
    "q18_semi_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey"),
    Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin))

  // Left-anti join — NOT EXISTS (customers with no high-value order; the
  // exact complement of q18, so the pair partitions `customer`).
  val q19 = Q(
    "q19_anti_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey"),
    Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin))

  // Broadcast-hash dimension join, explicitly hinted: nation is tiny and
  // ships to every executor — zero shuffle of the fact side.
  val q20 = Q(
    "q20_broadcast_join",
    (s, d) => Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey"),
    Some(
      """SELECT s_suppkey, s_name, n_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey""".stripMargin))

  // ROLLUP — hierarchical subtotals in one pass (Expand + single shuffle).
  val q21 = Q(
    "q21_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus"),
    Some(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |       COALESCE(l_linestatus, 'ALL') AS linestatus,
         |       COUNT(*) AS n, ${Det.dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY 1, 2""".stripMargin))

  // CUBE — all grouping-set combinations of (priority, orderstatus).
  val q22 = Q(
    "q22_cube",
    (s, d) => Tables.orders(s, d)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("sum_price"))
      .orderBy("priority", "status"),
    Some(
      s"""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
         |       COALESCE(o_orderstatus, 'ALL') AS status,
         |       COUNT(*) AS n, ${Det.dsumSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
         |ORDER BY 1, 2""".stripMargin))

  // GROUPING SETS — arbitrary subtotal combinations (the general form
  // rollup/cube specialize), with grouping_id() disambiguating which
  // set produced each row — the way a real report distinguishes "NULL
  // key value" from "aggregated over this key".
  val q74 = Q(
    "q74_grouping_sets",
    (s, d) => Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("sum_price"))
      .orderBy("gid", "priority", "status"),
    Some(
      s"""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
         |       COALESCE(o_orderstatus, 'ALL') AS status,
         |       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
         |       COUNT(*) AS n, ${Det.dsumSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY GROUPING SETS (
         |  (o_orderpriority, o_orderstatus), (o_orderpriority), ())
         |ORDER BY gid, priority, status""".stripMargin))

  // Correlated scalar subquery (TPC-H Q17 shape): small-quantity orders
  // below 20% of their part's average. Runs through spark.sql so the
  // surface under test is Catalyst's decorrelation (subquery → aggregate
  // + join, never a per-row re-execution); the SAME SQL text is the
  // DuckDB oracle — the avg is the Det scaled-integer form, valid and
  // bit-identical on both engines.
  private val q75Sql =
    s"""SELECT COUNT(*) AS n, ${Det.dsumSql("l_extendedprice")} AS revenue
       |FROM lineitem l
       |WHERE l_quantity < (SELECT ${Det.davgSql("i.l_quantity", 2)} * 0.2
       |                    FROM lineitem i WHERE i.l_partkey = l.l_partkey)""".stripMargin
  val q75 = Q(
    "q75_correlated_subquery",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(q75Sql)
    },
    Some(q75Sql))

  // Set operations: (high-value clickers ∩ high-value purchasers) ∖
  // high-value errorers. Value thresholds keep each side a proper subset
  // of the user population so the result is non-trivial.
  val q23 = Q(
    "q23_set_ops",
    (s, d) => {
      val e = Tables.events(s, d)
      def users(t: String, minValue: Double) =
        e.filter(col("event_type") === t && col("value") > minValue)
          .select(col("user_id")).distinct()
      users("click", 90).intersect(users("purchase", 90))
        .except(users("error", 95))
        .orderBy("user_id")
    },
    Some(
      """(SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'click' AND value > 90
        | INTERSECT
        | SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND value > 90)
        |EXCEPT
        |SELECT DISTINCT user_id FROM events
        | WHERE event_type = 'error' AND value > 95
        |ORDER BY user_id""".stripMargin))

  // Global sort + limit — physically TakeOrderedAndProject: per-partition
  // top-K then a K-row driver merge, never a full global sort.
  val q24 = Q(
    "q24_top_events",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"), col("event_type").as("name"), col("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(20),
    Some(
      """SELECT event_id, event_type AS name, value FROM events
        |ORDER BY value DESC, event_id LIMIT 20""".stripMargin))

  // Scalar-function surface: string/date/math built-ins in one projection.
  val q25 = Q(
    "q25_scalar_functions",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("bigint").as("name_len"),
        Det.fr(col("p_retailprice") * 1.1, 2).as("price_taxed"),
        (col("p_size") % 7).as("size_mod"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey"),
    Some(
      s"""SELECT p_partkey, UPPER(p_brand) AS brand_upper,
         |       SUBSTRING(p_name, 1, 8) AS name_prefix,
         |       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
         |       ${Det.frSql("p_retailprice * 1.1", 2)} AS price_taxed,
         |       p_size % 7 AS size_mod,
         |       CONCAT_WS('|', p_brand, p_type) AS brand_type
         |FROM part ORDER BY p_partkey""".stripMargin))

  // q60 — pivot: long-to-wide reshape (per-user counts by event type).
  // The value list is EXPLICIT — with an inferred list Spark would run a
  // distinct-collect job first and the output schema would depend on the
  // data; fixed columns keep the plan one-pass (Expand + single agg) and
  // the oracle mirrorable as conditional aggregation.
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  val q60 = Q(
    "q60_pivot",
    (s, d) => Tables.events(s, d)
      .filter(col("user_id") < 200)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy("user_id"),
    Some {
      val cols = eventTypes.map(t =>
        s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"").mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events WHERE user_id < 200
         |GROUP BY 1 ORDER BY 1""".stripMargin
    })

  // q61 — unpivot (the inverse reshape): wide metric columns back to
  // (metric, value) rows via stack/UNPIVOT — pure projection + generate,
  // no shuffle beyond the final sort.
  val q61 = Q(
    "q61_unpivot",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("""stack(3, 'quantity', l_quantity,
                         'extendedprice', l_extendedprice,
                         'discount', l_discount) AS (metric, value)"""))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture,
      // so `value` joins the sort key to make the order total
      .orderBy("l_orderkey", "l_linenumber", "metric", "value"),
    Some(
      """SELECT l_orderkey, l_linenumber, metric, value
        |FROM (SELECT l_orderkey, l_linenumber,
        |             l_quantity AS quantity,
        |             l_extendedprice AS extendedprice,
        |             l_discount AS discount
        |      FROM lineitem WHERE l_orderkey <= 100)
        |UNPIVOT (value FOR metric IN (quantity, extendedprice, discount))
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin))

  // q57 — salted skew-safe equi-join (graft.ops.Salted): the hot-key
  // lever when AQE's skew split can't apply. Result is row-identical to
  // the plain join (the oracle IS the plain join); the salt spreads any
  // hot orderkey over 16 reducers.
  val q57 = Q(
    "q57_salted_join",
    (s, d) => {
      // round-21: the round-20 widen REGRESSED this query in the
      // quiet-window sweep (2.27 → 2.51 s): the salt explode feeds a
      // shuffle anyway, so the extra exchange only added task floor.
      // Narrow scans restored (measured, OPTIMIZATION_r21.md).
      val l = Tables.lineitem(s, d)
        .withColumnRenamed("l_orderkey", "okey")
      val o = Tables.orders(s, d)
        .withColumnRenamed("o_orderkey", "okey")
      // salt source must be roughly uniform with range >= nSalts —
      // l_partkey is; l_linenumber (1-7) would leave most salts unused
      graft.ops.Salted.saltedJoin(l, o, "okey", col("l_partkey"), nSalts = 16)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some(
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |       ${Det.dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin))

  // q67 — column profiling (graft.ops.Profile): the one-scan data-quality
  // summary (counts, nulls, distincts, ranges) per column.
  private val profCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  val q67 = Q(
    "q67_profile",
    // round-21: round-20's widen regressed this 1.63 → 1.93 s quiet
    // (the Expand feeds a shuffle; the exchange bought nothing) —
    // narrow scan restored (measured, OPTIMIZATION_r21.md).
    (s, d) => graft.ops.Profile.numeric(
      Tables.lineitem(s, d), profCols),
    Some(profCols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS vmin, CAST(MAX($c) AS DOUBLE) AS vmax
         |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))

  // q103 — the profile you'd run at 100 TB: approx_count_distinct (HLL
  // sketch) replaces exact COUNT(DISTINCT) so the plan is ONE pass with
  // NO Expand — q67's exact multi-distinct duplicates every scanned row
  // once per profiled column (Expand ×4) to key the distinct aggregates,
  // which is the right exact answer but 4× the shuffled rows. HLL merges
  // fixed-size sketches instead (relative error ~2.3% at the default
  // precision). No cross-engine oracle exists for HLL (like q13), so the
  // row is rows-only; the Expand-free plan is pinned in PlanSpec.
  val q103 = Q(
    "q103_profile_approx",
    (s, d) => graft.ops.Profile.numeric(
      Tables.lineitem(s, d), profCols,
      approx = true),
    None)

  /** DuckDB mirror of ZOrder.zvalue — the identical bit interleave,
    * generated from the same `bits` constant so the two cannot drift.
    * Inputs must be non-negative (both engines then agree on `%`). */
  private def zvalueSql(x: String, y: String, bits: Int): String = {
    val m = (1L << bits).toString
    val xm = s"(CAST($x AS BIGINT) % $m)"
    val ym = s"(CAST($y AS BIGINT) % $m)"
    (0 until bits).map { i =>
      s"((($xm >> $i) & 1) << ${2 * i}) | ((($ym >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  // q90 — Z-order (Morton) cell histogram over orders on
  // (o_custkey, days-since-epoch-of-orderdate): the layout key behind
  // graft.pipeline.ZOrder's clustered rewrite (OPTIMIZE ZORDER BY
  // analog). The oracle pins the bit interleave exactly; PipelineSpec
  // pins the layout property (per-file min/max tight on BOTH dims).
  // Coarse cells: top 16 of the 32 z bits (256x256-key tiles).
  val q90 = Q(
    "q90_zorder_cells",
    (s, d) => {
      val days = datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
      val z = graft.pipeline.ZOrder.zvalue(col("o_custkey"), days, bits = 16)
      Tables.orders(s, d)
        .select(shiftright(z, 16).as("zcell"))
        .groupBy("zcell").agg(count(lit(1)).as("n"))
        .orderBy("zcell")
    },
    Some(
      s"""SELECT zcell, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT ${zvalueSql("o_custkey",
             "date_diff('day', DATE '1992-01-01', o_orderdate)", 16)} >> 16 AS zcell
         |      FROM orders)
         |GROUP BY zcell ORDER BY zcell""".stripMargin))

  // --------------------------------------------------- bucketed layout
  // Build-once bucketed copies of the two FACT tables, both bucketed (and
  // sorted) on the join key into the same bucket count. This is the
  // co-located fact-fact join layout for 100 TB: both sides' bucket files
  // are partitioned identically ON DISK, so the join needs NO exchange on
  // either side (PlanSpec asserts zero ShuffleExchange with broadcast
  // disabled) — at scale that's the difference between re-shuffling
  // terabytes per query and a local merge per bucket pair. Tables are
  // external (data under a reaped temp dir), registered in the session
  // catalog once per (JVM, sf).
  private[graft] val BucketCount = 8
  private val bucketedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def bucketedPair(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    val (lt, ot) = (s"graft_bkt_lineitem_$tag", s"graft_bkt_orders_$tag")
    bucketedDirs.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
      // the generalized operator: drop-if-exists + overwrite, so a stale
      // catalog entry from an earlier JVM (persistent metastore) or a
      // half-failed save never strands TableAlreadyExists; both tables
      // share ONE bucket count (the must-match rule, Bucketed scaladoc)
      graft.pipeline.Bucketed.write(Tables.lineitem(s, d), lt,
        s"$dir/lineitem", "l_orderkey", BucketCount)
      graft.pipeline.Bucketed.write(Tables.orders(s, d), ot,
        s"$dir/orders", "o_orderkey", BucketCount)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(p: java.io.File): Unit = {
          val cs = p.listFiles(); if (cs != null) cs.foreach(rm); p.delete()
        }
        rm(new java.io.File(dir))
      }))
      dir
    })
    (graft.pipeline.Bucketed.read(s, lt), graft.pipeline.Bucketed.read(s, ot))
  }

  // q219 — the co-located join itself: lineitem ⋈ orders on the shared
  // bucket key, rolled up per order priority. The oracle is the plain
  // logical join over the raw parquet — bucketing is a physical layout
  // choice and must never change a result.
  val q219 = Q(
    "q219_bucketed_join",
    (s, d) => {
      val (l, o) = bucketedPair(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some(
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
         |       ${Det.dsumSql("l_quantity")} AS sum_qty,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q234 — the read-side complement of q219's co-located join: a
  // `key = literal` point lookup against the bucketed layout prunes the
  // scan to ONE bucket file (Spark bucket pruning — the planner hashes
  // the literal and opens only `part-…_0000k`), so a point query over a
  // 100 TB fact table reads 1/N of the files before row-group statistics
  // even apply. RelationalSpec pins `SelectedBucketsCount: 1 out of 8`
  // in the executed plan; this query pins the VALUES (layout choices
  // must never change results). The probe key is the corpus minimum —
  // one aggregate-pushdown scan, then a literal filter both engines run.
  val q234 = Q(
    "q234_bucket_point_lookup",
    (s, d) => {
      // keep the bucketed scan ON for point lookups: without a downstream
      // join/agg needing the hash distribution, Spark's
      // DisableUnnecessaryBucketedScan rule would drop the bucketed read
      // and with it the bucket-filter pruning. The override is scoped to
      // THIS query body (prior value restored in a finally): leaking it
      // on the shared session would silently change plans for any later
      // bucketed query in the same sweep/suite — ordering-dependent
      // behavior the plan pins could never catch.
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prior = s.conf.getOption(key)
      s.conf.set(key, "false")
      try {
        val (l, _) = bucketedPair(s, d)
        val k = Tables.lineitem(s, d)
          .agg(org.apache.spark.sql.functions.min(col("l_orderkey"))).head()
          .getLong(0)
        // bucket pruning is a PHYSICAL planning decision taken when the
        // caller executes — a lazily returned frame would plan AFTER the
        // finally restored the flag. localCheckpoint(true) executes the
        // pruned scan here, inside the override (rows: single order key,
        // a handful), and hands the caller the materialized result.
        l.filter(col("l_orderkey") === lit(k))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_returnflag"))
          .orderBy("l_linenumber")
          .localCheckpoint(true)
      } finally {
        prior match {
          case Some(v) => s.conf.set(key, v)
          case None    => s.conf.unset(key)
        }
      }
    },
    Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin))

  val all: Vector[Q] = Vector(q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q57, q60, q61, q67, q74, q75, q90, q103, q219, q234)
}
