package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Core relational operators from SURVEY.md §2.1/2.2/2.3/2.4/2.6:
  * scans, projection, predicates, conditional projection, null fill,
  * dedup, sorts, top-k, limits, global/grouped aggregation, joins
  * (inner / full-outer / semi / anti).
  *
  * Reference behaviors re-expressed Spark-first (citations into
  * /root/reference): grouped agg & describe (Query.ipynb cells 5-6,16-22),
  * range query (Query.ipynb cell 7), key-equality + top-k serving scans
  * (pipeline/API.py:32,44,66), dedup (pipeline/util/util.py:65), null fill
  * (to_db.py:49), conditional projection (pipeline/util/util.py:89-90),
  * outer join (pipeline/util/util.py:97).
  *
  * Scale notes: every query here is a single declarative plan — filters and
  * projections reach the parquet scan (PushedFilters / ReadSchema), grouped
  * aggs get map-side partial aggregation, dimension tables in the join
  * queries are broadcast so the only shuffle is the fact-side aggregation.
  * Top-k compiles to TakeOrderedAndProject (no global sort at scale).
  */
object Relational {

  /** TPC-H Q1 shape: grouped aggregation with map-side combine. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg("l_quantity").as("avg_qty"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Global min/max aggregation (Query.ipynb cells 21-22). */
  def globalMinMax(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      max("l_extendedprice").as("max_price"),
      min("l_extendedprice").as("min_price"),
      max("l_quantity").as("max_qty"),
      min("l_quantity").as("min_qty"))

  /** df.describe() semantics (count/mean/stddev/min/max) as typed columns. */
  def describeStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count("l_quantity").as("cnt_qty"),
      avg("l_quantity").as("mean_qty"),
      stddev_samp("l_quantity").as("std_qty"),
      min("l_quantity").as("min_qty"),
      max("l_quantity").as("max_qty"),
      count("l_extendedprice").as("cnt_price"),
      avg("l_extendedprice").as("mean_price"),
      stddev_samp("l_extendedprice").as("std_price"),
      min("l_extendedprice").as("min_price"),
      max("l_extendedprice").as("max_price"))

  /** Open-interval range predicate + projection (Query.ipynb cell 7). */
  def rangeFilter(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") > lit("1995-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")

  /** Key-equality predicate (API.py:32 `WHERE SYMBOL = ?` shape). */
  def keyFilter(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")

  /** Conditional projection: gain/loss split (util.py:89-90). */
  def condProject(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      when(col("value") > 100.0, col("value") - 100.0).otherwise(0.0).as("gain"),
      when(col("value") <= 100.0, lit(100.0) - col("value")).otherwise(0.0).as("loss"))

  /** Null handling: df.na.fill (to_db.py:49) over an induced-null column. */
  def nullFill(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        col("event_id"),
        when(col("value") < 50.0, lit(null)).otherwise(col("value")).as("value_or_null"))
      .na.fill(Map("value_or_null" -> -1.0))

  /** Full-row dedup on a projection (util.py:65 dropDuplicates). */
  def dedupDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_returnflag", "l_linestatus").dropDuplicates()

  /** Global sort (util.py:67). Driver canonicalizes row order; the point is
    * the operator executes as a range-partitioned sort at scale. */
  def sortAsc(s: SparkSession, d: String): DataFrame =
    supplier(s, d).orderBy(col("s_suppkey").asc)

  /** Top-k by time desc (API.py:44,66) — plans TakeOrderedAndProject;
    * event_id desc as deterministic tie-break. */
  def topK(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(20)
      .select("event_id", "ts", "user_id", "event_type", "value")

  /** Plain limit over a deterministic order (API.py:55 LIMIT shape). */
  def limitSorted(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /** Multi-way inner join, dims broadcast: revenue per nation (TPC-H Q5
    * shape). At 100 TB the only shuffle is the final groupBy on n_name. */
  def joinRevenuePerNation(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** The flagship join over PRE-BUCKETED fact tables: identical plan
    * shape to [[joinRevenuePerNation]], but `lineitem ⋈ orders` reads
    * bucket-aligned lake tables (both bucketed on the order key), so the
    * fact-fact sort-merge join runs with ZERO Exchange below the final
    * groupBy — the write-once/join-often strategy a 100 TB lake uses for
    * its biggest recurring join. Dims still broadcast.
    * [[graft.BucketedJoinSpec]] asserts the no-Exchange plan and value
    * equality with the unbucketed flagship query. */
  def joinRevenuePerNationBucketed(s: SparkSession, d: String,
      lineitemTbl: String = "lineitem_b", ordersTbl: String = "orders_b"): DataFrame =
    s.table(lineitemTbl)
      .join(s.table(ordersTbl), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Equi full-outer join with USING-style coalesced key (util.py:97 —
    * engine keys on the full join key, fixing the reference's
    * join-on-date-only latent bug documented in SURVEY §2.3). */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val custPerNation = customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("customers"))
    val suppPerNation = supplier(s, d)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("suppliers"))
    custPerNation.join(suppPerNation, Seq("nationkey"), "full_outer")
  }

  /** Left-semi join: customers with at least one order (EXISTS). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Fact-to-fact semi-join through the Bloom pre-filter
    * ([[graft.functions.Bloom.bloomSemiJoin]]): lineitems of urgent
    * orders. Neither side broadcasts as rows at corpus scale, but the
    * urgent-order KEY SET compresses to 8 KB of bits that prune the
    * lineitem side map-side before the exact semi-join's shuffle; the
    * result is identical to the plain semi-join (no false negatives +
    * exact join removes false positives), so the oracle is ordinary
    * SQL. */
  def joinBloomSemi(s: SparkSession, d: String): DataFrame =
    graft.functions.Bloom.bloomSemiJoin(
      lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity"),
      orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
      "l_orderkey", "o_orderkey")

  /** Left-anti join: customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Distinct aggregation (engine extension beyond the reference's
    * surface, SURVEY §2.4 ✗ line): exact distinct counts — Spark plans
    * the expand + two-phase aggregate. */
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    // examined r18, deliberately NOT ensureParallel'd: the one-split
    // fixture scan runs the Expand(3×)+partial distinct-agg in a single
    // 0.67 s task, but that task REDUCES everything locally (taskSum
    // 0.8 CPU-s); an A/B with the guarded repartition measured taskSum
    // 11.3 CPU-s and a slower wall — round-robin spreading makes the
    // partial distinct-agg reduce nothing, so the Expand'd stream
    // shuffles whole. At corpus scale the scan is multi-split and
    // parallel on its own.
    lineitem(s, d).agg(
      count_distinct(col("l_orderkey")).as("n_orders"),
      count_distinct(col("l_partkey")).as("n_parts"),
      count_distinct(col("l_suppkey")).as("n_supps"))

  /** Hierarchical rollup totals (engine extension): revenue by
    * (returnflag, linestatus) with subtotals and grand total. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))

  /** Top-k per group via rank over a key-partitioned window: top 3 orders
    * by price per customer — the distributed "per-symbol latest bars". */
  def topKPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }

  /** Set operations: union / intersect / except over projections. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val buyers = orders(s, d).select(col("o_custkey").as("custkey")).distinct()
    val all = customer(s, d).select(col("c_custkey").as("custkey"))
    val both = all.intersect(buyers).withColumn("src", lit("buyer"))
    val only = all.except(buyers).withColumn("src", lit("non_buyer"))
    both.unionByName(only)
  }

  /** Uncorrelated scalar subquery: items priced above the global mean. */
  def aboveAvg(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val avgPrice = li.agg(avg("l_extendedprice").as("ap"))
    li.join(broadcast(avgPrice))
      .where(col("l_extendedprice") > col("ap") * 1.5)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  /** Exact interpolated percentiles per group (engine extension). ONE
    * percentile buffer per group computes all three cut points (the
    * array form shares the value-count map and its sort; three scalar
    * calls each built and sorted their own) — and the partial
    * aggregation is parallelized over the narrow local scan by a
    * conditional round-robin repartition (the group key has 3 distinct
    * values, so keying the exchange on it would cap parallelism at 3;
    * no-op at scale where file splits feed the partials). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    graft.functions.Parallelism.ensureParallel(lineitem(s, d))
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ps"))
      .select(col("l_returnflag"),
        col("ps").getItem(0).as("p50"),
        col("ps").getItem(1).as("p90"),
        col("ps").getItem(2).as("p99"))

  /** The SKETCH path for grouped percentiles: `approx_percentile`
    * (Greenwald–Khanna summaries) holds a bounded sketch per group
    * instead of the exact per-group value-count map, so executor
    * memory is O(accuracy-bound) REGARDLESS of group size. Accuracy
    * 10000 bounds rank error to n/10000 per group. The sketch is
    * engine-specific and not DuckDB-replayable, so this is a LIBRARY
    * function, not a registry row — the registry's exact-at-scale
    * answer is [[percentilesDisc]] (rank selection, also bounded
    * memory, hash-oracled); `AnalyticsSpec` pins |approx − exact|
    * within the rank-error bound against [[percentiles]] on the same
    * data — the verification an approx operator can actually promise.
    * Reach for GK over rank selection when one pass must produce MANY
    * quantiles per group or the extra prefix-sum stage is unwanted. */
  def percentilesApprox(s: SparkSession, d: String): DataFrame =
    graft.functions.Parallelism.ensureParallel(lineitem(s, d))
      .groupBy("l_returnflag")
      .agg(expr(
        "approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)")
        .as("ps"))
      .select(col("l_returnflag"),
        col("ps").getItem(0).as("p50"),
        col("ps").getItem(1).as("p90"),
        col("ps").getItem(2).as("p99"))

  /** EXACT distributed discrete percentiles by RANK SELECTION — the
    * q_token_budget two-level prefix-sum discipline applied to order
    * statistics, so the exact answer needs neither a per-group
    * value-count map ([[percentiles]]' memory boundary) nor a
    * single-partition sort:
    *   1. collapse to (group, value, cnt) — map-side combine does most
    *      of the reduction before the one shuffle;
    *   2. bucket values by a monotone coarse key and run the
    *      within-bucket cumulative counts in windows PARTITIONED by
    *      (group, bucket) — parallel across all buckets;
    *   3. the only ordered-offset pass runs on the tiny per-bucket
    *      totals frame (groups × buckets rows), broadcast back;
    *   4. each target rank r_q = max(1, ceil(q·n)) — DuckDB
    *      `quantile_disc`'s exact rank rule — falls in exactly one
    *      value's run (cum − cnt < r_q ≤ cum); a conditional max per
    *      group picks it.
    * Memory is bounded by the widest (group, bucket) value slice, which
    * the bucket width controls — at 100 TB, narrow the buckets (or add
    * a third level) instead of growing an executor map. */
  def percentilesDisc(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    // materialize the collapsed (group, value, cnt) table ONCE: the
    // within-bucket window branch and the per-bucket offsets branch
    // both consume it, and exchange reuse only shares the exchange —
    // the value-collapse FINAL aggregation itself re-ran per branch
    // (two ~equal 32-task stages in the executed plan, r17). The
    // checkpoint point is the already-collapsed value-count table
    // (distinct values, not rows) — the same truncation pageRank uses.
    // BOUND (r17 verdict item 8): |distinct (flag, price)| rows — here
    // ~1e6 at sf1 (prices quantize to cents), data-dependent in
    // general. localCheckpoint stores MEMORY_AND_DISK on executors
    // (spills, doesn't OOM), but it is NOT fault-tolerant: an executor
    // loss mid-query fails the job instead of recomputing. At a scale
    // where distinct values approach corpus rows, swap this for
    // reliable checkpoint(dir) or accept the 2nd branch recompute.
    val vc = graft.functions.Parallelism.ensureParallel(lineitem(s, d))
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("vb", floor(col("v") / 1000.0).cast("long"))
      .localCheckpoint(true)
    val within = vc.withColumn("within_cum",
      sum(col("cnt")).over(
        Window.partitionBy("l_returnflag", "vb").orderBy(col("v").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-(group, bucket) totals: the ONLY ordered cumsum runs here,
    // partitioned by group over ~#buckets rows, then broadcasts back.
    // The group total n (and with it every target rank) rides in the
    // SAME small frame as two more windows over it — a separate targets
    // branch would be a third consumer of the value-count pipeline, and
    // with no exchange reuse across the branches that is a third full
    // scan+shuffle (measured: 3 scans → 2, the tokenBudgetOf trade)
    val offsets = vc.groupBy("l_returnflag", "vb")
      .agg(sum(col("cnt")).as("bucket_cnt"))
      .withColumn("offset",
        coalesce(sum(col("bucket_cnt")).over(
          Window.partitionBy("l_returnflag").orderBy(col("vb").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("bucket_cnt")).over(
        Window.partitionBy("l_returnflag")))
    val ranked = offsets.select(
      Seq(col("l_returnflag"), col("vb"), col("offset")) ++
        qs.map { case (name, q) =>
          greatest(lit(1L), ceil(lit(q) * col("n"))).as(s"r_$name") }: _*)
    within
      .join(broadcast(ranked), Seq("l_returnflag", "vb"))
      .withColumn("cum", col("offset") + col("within_cum"))
      .groupBy("l_returnflag")
      .agg(
        qs.map { case (name, _) =>
          max(when(col(s"r_$name") > col("cum") - col("cnt") &&
            col(s"r_$name") <= col("cum"), col("v"))).as(name) }.head,
        qs.tail.map { case (name, _) =>
          max(when(col(s"r_$name") > col("cum") - col("cnt") &&
            col(s"r_$name") <= col("cum"), col("v"))).as(name) }: _*)
  }

  /** Pivot: event counts per user across a fixed event-type set. */
  def pivotCounts(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("user_id")
      .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** Statistical aggregates: correlation/covariance/variance. */
  def statsAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("corr_qty_price"),
      covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_qp"),
      var_samp(col("l_discount")).as("var_disc"),
      skewness(col("l_extendedprice")).as("skew_price"))

  /** Full cube over two dimensions (all grouping-set combinations). */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d).cube("o_orderstatus", "o_orderpriority")
      .agg(sum("o_totalprice").as("total"), count(lit(1)).as("n"))

  /** Explicit grouping sets with grouping() markers distinguishing
    * subtotal rows from genuine nulls. */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  /** Conditional/filtered aggregation: per-flag aggregates restricted by
    * independent predicates. */
  def condAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag").agg(
      sum(when(col("l_discount") > 0.05, col("l_extendedprice"))).as("rev_discounted"),
      count(when(col("l_quantity") >= 30, 1)).as("n_bulk"),
      avg(when(col("l_linestatus") === "F", col("l_quantity"))).as("avg_qty_f"))

  /** Ordered string aggregation: sorted distinct statuses per flag. */
  def stringAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"))

  /** Fixed-width histogram binning + per-bin count. */
  def histogram(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select((floor(col("l_extendedprice") / 10000) * 10000).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_distinct_agg"  -> (distinctAgg _),
    "q_cube"          -> (cubeAgg _),
    "q_grouping_sets" -> (groupingSets _),
    "q_cond_agg"      -> (condAgg _),
    "q_string_agg"    -> (stringAgg _),
    "q_histogram"     -> (histogram _),
    "q_percentiles"   -> (percentiles _),
    "q_percentiles_disc" -> (percentilesDisc _),
    "q_pivot"         -> (pivotCounts _),
    "q_stats_agg"     -> (statsAgg _),
    "q_rollup"        -> (rollupAgg _),
    "q_topk_group"    -> (topKPerGroup _),
    "q_set_ops"       -> (setOps _),
    "q_above_avg"     -> (aboveAvg _),
    "q1_agg"          -> (q1Agg _),
    "q_global_minmax" -> (globalMinMax _),
    "q_describe"      -> (describeStats _),
    "q_range_filter"  -> (rangeFilter _),
    "q_key_filter"    -> (keyFilter _),
    "q_cond_proj"     -> (condProject _),
    "q_null_fill"     -> (nullFill _),
    "q_dedup_distinct" -> (dedupDistinct _),
    "q_sort"          -> (sortAsc _),
    "q_topk"          -> (topK _),
    "q_limit"         -> (limitSorted _),
    "q_join_inner"    -> (joinRevenuePerNation _),
    "q_join_outer"    -> (joinFullOuter _),
    "q_join_semi"     -> (joinSemi _),
    "q_join_anti"     -> (joinAnti _),
    "q_bloom_semi"    -> (joinBloomSemi _))

  val oracle: Map[String, String] = Map(
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  sum(o_totalprice) AS total, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "q_cond_agg" ->
      """SELECT l_returnflag,
        |  sum(l_extendedprice) FILTER (l_discount > 0.05) AS rev_discounted,
        |  count(*) FILTER (l_quantity >= 30) AS n_bulk,
        |  avg(l_quantity) FILTER (l_linestatus = 'F') AS avg_qty_f
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_string_agg" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) * 10000 AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  quantile_cont(l_extendedprice, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_percentiles_disc" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.5) AS p50,
        |  quantile_disc(l_extendedprice, 0.9) AS p90,
        |  quantile_disc(l_extendedprice, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q_stats_agg" ->
      """WITH m AS (SELECT avg(l_extendedprice) AS mu FROM lineitem)
        |SELECT corr(l_quantity, l_extendedprice) AS corr_qty_price,
        |  covar_samp(l_quantity, l_extendedprice) AS covar_qp,
        |  var_samp(l_discount) AS var_disc,
        |  avg(pow(l_extendedprice - mu, 3))
        |    / pow(avg(pow(l_extendedprice - mu, 2)), 1.5) AS skew_price
        |FROM lineitem, m""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q_set_ops" ->
      """SELECT custkey, 'buyer' AS src FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  INTERSECT SELECT DISTINCT o_custkey FROM orders)
        |UNION ALL
        |SELECT custkey, 'non_buyer' AS src FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT SELECT DISTINCT o_custkey FROM orders)""".stripMargin,
    "q_above_avg" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_extendedprice >
        |  (SELECT avg(l_extendedprice) FROM lineitem) * 1.5""".stripMargin,
    "q_distinct_agg" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_global_minmax" ->
      """SELECT max(l_extendedprice) AS max_price, min(l_extendedprice) AS min_price,
        |  max(l_quantity) AS max_qty, min(l_quantity) AS min_qty FROM lineitem""".stripMargin,
    "q_describe" ->
      """SELECT count(l_quantity) AS cnt_qty, avg(l_quantity) AS mean_qty,
        |  stddev_samp(l_quantity) AS std_qty, min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  count(l_extendedprice) AS cnt_price, avg(l_extendedprice) AS mean_price,
        |  stddev_samp(l_extendedprice) AS std_price, min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "q_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01'""".stripMargin,
    "q_key_filter" ->
      "SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'",
    "q_cond_proj" ->
      """SELECT event_id,
        |  CASE WHEN value > 100.0 THEN value - 100.0 ELSE 0.0 END AS gain,
        |  CASE WHEN value <= 100.0 THEN 100.0 - value ELSE 0.0 END AS loss
        |FROM events""".stripMargin,
    "q_null_fill" ->
      """SELECT event_id,
        |  coalesce(CASE WHEN value < 50.0 THEN NULL ELSE value END, -1.0) AS value_or_null
        |FROM events""".stripMargin,
    "q_dedup_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_sort" ->
      "SELECT * FROM supplier ORDER BY s_suppkey ASC",
    "q_topk" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 20""".stripMargin,
    "q_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC LIMIT 100""".stripMargin,
    "q_join_inner" ->
      """SELECT n_name,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_join_outer" ->
      """SELECT nationkey, customers, suppliers FROM
        |  (SELECT c_nationkey AS nationkey, count(*) AS customers FROM customer GROUP BY 1) a
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS nationkey, count(*) AS suppliers FROM supplier GROUP BY 1) b
        |USING (nationkey)""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    // the Bloom pre-filter is semantically invisible — plain semi-join SQL
    "q_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin)
}
