package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth graph reachability: for every vertex, the set of
  * vertices within `maxHops` directed edges, with the MINIMUM hop
  * count — the transitive-closure slice behind "find everything within
  * N links" questions (duplicate-cluster spill, citation neighborhoods,
  * fraud rings) that SQL expresses only via recursive CTEs.
  *
  * Level-synchronous BFS through the relational engine: the frontier
  * at hop h joins the edge list once, and an anti join against the
  * accumulated reach set keeps only NEWLY discovered (src, dst) pairs —
  * so a pair's first appearance is at its minimum hop count by
  * construction, and revisits (cycles, diamonds) die immediately
  * instead of exploding into per-path work. This is the classic
  * frontier optimization over the naive "join k times and GROUP BY
  * min" form, whose intermediate is every PATH of length <= k (the
  * recursive-CTE oracle pays exactly that — affordable at test scale,
  * ruinous at corpus scale).
  *
  * Scale shape: per hop, one equi-join shuffle on the frontier's dst
  * and one anti-join shuffle on (src, dst); state is O(reachable
  * pairs) + O(E), nothing collects to the driver. Each level is
  * persisted, eagerly materialized, and re-exposed through an RDD
  * boundary so the accumulated union's logical plan stays FLAT —
  * without the boundary it doubles per level (exponential analysis
  * cost with depth), and localCheckpoint is not an option (see the
  * in-method comment).
  *
  * Semantics: hops >= 1 only (a vertex is not reported at hop 0);
  * a cycle back to the source DOES report (v, v, cycle_len). Multi-
  * edges are deduplicated; NULL endpoints are dropped.
  */
object Reachability {

  /** Min-hop reachable pairs: (src, dst, hops) for 1 <= hops <= maxHops.
    * `edges` needs columns (src, dst).
    */
  def kHop(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist()
    e.count() // materialize once; every level joins this frame
    // Lineage control per level is persist + eager count + an RDD
    // boundary, NOT localCheckpoint: a checkpointed frame (LogicalRDD)
    // carries its origin's constraints, and unioning it later trips
    // Union constraint rewriting on the stale attribute ids (observed
    // as NoSuchElementException in rewriteConstraints).
    // `createDataFrame(df.rdd, df.schema)` gives the same flat plan
    // with NO carried constraints; without it the logical plan under
    // the accumulated union doubles per level (each child embeds its
    // predecessors even when cached) — exponential ANALYSIS cost with
    // depth even though execution reads the caches. Reads hit the
    // level's cache through the RDD; each round releases every cache
    // older than the current frontier + reach pair.
    val spark = edges.sparkSession
    val cachedLevels = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // (flat frame, its cache handle, row count): persist + eager count
    // the real plan, then hand back a LogicalRDD view of its cache.
    def materialize(df: DataFrame): (DataFrame, DataFrame, Long) = {
      val cached = df.persist()
      // register BEFORE the count: a count job that fails mid-loop
      // must still leave its persist in cachedLevels for the finally
      // block to release — registering after would leak exactly the
      // failed level's cache
      cachedLevels += cached
      val n = cached.count()
      (spark.createDataFrame(cached.rdd, cached.schema), cached, n)
    }
    var reachCache: DataFrame = null
    var ok = false
    try {
      val (reach0, rc0, n0) = materialize(e.withColumn("hops", lit(1L)))
      var reach = reach0
      reachCache = rc0
      var frontier = reach
      // seed from the count the materialize already ran: a hardcoded 1
      // forced one full (empty) join/distinct/anti-join round on an
      // edgeless graph before the loop noticed
      var frontierSize = n0
      var h = 1
      while (h < maxHops && frontierSize > 0) {
        val (next, nextCache, n) = materialize(frontier.alias("f")
          .join(e.alias("e"), col("f.dst") === col("e.src"))
          .select(col("f.src").as("src"), col("e.dst").as("dst"))
          .distinct()
          .join(reach, Seq("src", "dst"), "left_anti")
          .withColumn("hops", lit((h + 1).toLong)))
        frontierSize = n
        if (n > 0) {
          val (grown, grownCache, _) = materialize(reach.unionByName(next))
          reach = grown
          reachCache = grownCache
          frontier = next
          // the new level's cache supersedes everything older: release
          // now, so peak cache is the CURRENT frontier + reach, not
          // ~maxHops/2 full copies of the final result (an evicted
          // upstream cache only ever degrades a recompute, never the
          // answer)
          while (cachedLevels.size > 2) cachedLevels.remove(0).unpersist()
        } else {
          // exhausted frontier: the empty level has nothing to keep,
          // and unioning it would recompute and double-cache the
          // entire reach set just to produce an identical copy
          cachedLevels -= nextCache
          nextCache.unpersist()
        }
        h += 1
      }
      ok = true
      reach
    } finally {
      // on success only the cache backing the returned frame survives;
      // on failure nothing does (the old path leaked every level cache
      // for the session's lifetime if a count job failed mid-loop)
      cachedLevels.foreach { c =>
        if (!(ok && (c eq reachCache))) c.unpersist()
      }
      e.unpersist()
    }
  }
}
