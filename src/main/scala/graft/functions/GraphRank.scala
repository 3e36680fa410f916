package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over the near-dup similarity graph — the
  * graph-analytics companion to the pairs→components machinery in
  * [[Dedup]] (min-label / large-star CC): where CC answers "which docs
  * form one duplicate cluster", PageRank answers "which docs are the
  * HUBS of the similarity structure" (centrality for curation: a
  * template page near-dup-linked to thousands of spun variants
  * out-ranks an organic page with two neighbors).
  *
  * Page, Brin et al. 1999, the standard damped formulation on the
  * UNDIRECTED pair graph (each pair contributes both directions, so
  * every vertex has out-degree ≥ 1 — no dangling-mass correction
  * needed): r₀ = 1/N; rᵢ₊₁(v) = (1−d)/N + d·Σ_{u→v} rᵢ(u)/out(u),
  * a FIXED iteration count so the result is deterministic and
  * SQL-expressible (the oracle unrolls the same iterations — no
  * convergence test, no float-threshold divergence between engines).
  *
  * Scale shape: the edge list is hash-partitioned by `src` ONCE and
  * persisted — every iteration's contribution join reuses that one
  * partitioning (the builder brief's "reuse a partitioning across
  * stages"), so an iteration costs one shuffle (the per-dst inflow
  * aggregation) plus a co-partitioned join, and `localCheckpoint`
  * truncates the plan each round (iteration i's lineage would
  * otherwise nest i copies of the join tree — O(2^i) planning).
  * Ranks are |V|-scale rows, edges |E|-scale; nothing corpus-scale
  * ever sits on the driver.
  */
object GraphRank {

  /** PageRank over an undirected pair list (`aCol`, `bCol`) — returns
    * (node, rank). `pairs` must be deduplicated (one row per unordered
    * pair), which [[Dedup.minhashPairs]]'s `doc_a < doc_b` output is by
    * construction. */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
               iters: Int = 8, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("out"))
    val nodes = edges.select(col("src").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one |V| scalar for the teleport term
    val withDeg = edges.join(deg, "src") // co-partitioned: both sides by src
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("rank") / col("out")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      // left join: on an undirected graph every node has inflow, but a
      // directed caller-supplied edge set must not lose sinks
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(true) // truncate the iteration's lineage
    }
    edges.unpersist(); nodes.unpersist()
    ranks
  }

  /** The unrolled-iteration oracle twin: the SAME fixed iteration count
    * and the SAME IEEE operation order — the teleport term is spelled
    * `(1 - d) / n` on both sides (one subtraction, one division, in
    * double), so both engines add bit-identical constants; the damping
    * factor interpolates through Scala's Double.toString, which DuckDB
    * parses back to the identical double. `pairsSql` is any SELECT
    * yielding (doc_a, doc_b) — e.g. [[Dedup.minhashPairsOracleSql]] —
    * wrapped as a subquery. */
  def pageRankOracleSql(pairsSql: String, iters: Int = 8,
                        damping: Double = 0.85): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT nd.node,
         |  (1 - $damping) / nn.n + $damping * coalesce(s.inflow, 0.0) AS rank
         |  FROM nodes nd CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / d.outd) AS inflow
         |    FROM r${i - 1} r JOIN edges e ON r.node = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT * FROM ($pairsSql) q),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT node AS doc_id, rank FROM r$iters""".stripMargin
  }
}
