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
  * pairs) + O(E), nothing collects to the driver. `maxHops` is a small
  * constant, so the plan's linear growth is bounded; the reach set is
  * `localCheckpoint`ed each level (the [[PageRank.ranks]] pattern) to
  * keep lineage flat and stop Spark re-deriving level h-1 at level h.
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
    // Lineage control is persist + eager count per level, NOT
    // localCheckpoint: a checkpointed frame (LogicalRDD) carries its
    // origin's constraints, and unioning it later trips Union
    // constraint rewriting on the stale attribute ids (observed as
    // NoSuchElementException in rewriteConstraints). Depth is bounded
    // by maxHops, so plain cached lineage stays flat enough; superseded
    // reach caches are released as soon as their successor materializes.
    try {
      var reach = e.withColumn("hops", lit(1L)).persist()
      reach.count()
      var frontier = reach
      var frontierSize = 1L
      var h = 1
      val retired = scala.collection.mutable.ListBuffer.empty[DataFrame]
      while (h < maxHops && frontierSize > 0) {
        val next = frontier.alias("f")
          .join(e.alias("e"), col("f.dst") === col("e.src"))
          .select(col("f.src").as("src"), col("e.dst").as("dst"))
          .distinct()
          .join(reach, Seq("src", "dst"), "left_anti")
          .withColumn("hops", lit((h + 1).toLong))
          .persist()
        frontierSize = next.count()
        val grown = reach.unionByName(next).persist()
        grown.count()
        retired += reach
        retired += next // still readable this round; dropped after the loop
        reach = grown
        frontier = next
        h += 1
      }
      retired.foreach(_.unpersist())
      reach // persisted + materialized; caller unpersists when done
    } finally e.unpersist()
  }
}
