package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: the top of the dedup pipeline. LSH/SimHash
  * candidate generation yields PAIRS; deduplicating a corpus needs the
  * transitive closure — connected components over the pair graph — and one
  * survivor per component. (The reference has no counterpart; this is the
  * 100 TB training-data surface, same family as Dedup/Ann.)
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING
  * (label(x) ← min(label(x), label(label(x))) each round), the
  * alternating-star family of MapReduce connected components [Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14]. Plain
  * neighbor propagation needs O(diameter) rounds — a pathological
  * duplicate CHAIN (a~b~c~…) makes that O(n); the pointer-jump step
  * halves label-chains every round, so convergence is O(log n) rounds of
  * 2 shuffles each. Per round the state is one (node, label) frame —
  * persisted and freed lifecycle-style (the only operator state an
  * iterative algorithm can't avoid); everything else is hash joins on
  * node ids, never data rows.
  */
object Clusters {

  /** Connected components of the undirected graph given as pair rows
    * (a, b). Returns (node, cluster) where cluster = the component's
    * minimum node id. Nodes are the pair endpoints; callers wanting
    * singleton clusters for untouched ids coalesce after a left join
    * (see GraftQueries.qDupClusters). Fails loudly after `maxIter`
    * rounds rather than looping silently. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // pre-partition the (static) symmetric edge list by the per-round join
    // key: localCheckpoint preserves the hash partitioning, so every
    // round's neighbor join reuses it instead of re-shuffling the edges
    val sym = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("v"))
      .localCheckpoint()
    // init: each node's label = min(self, direct neighbors) — the first
    // neighbor-propagation round fused into initialization.
    //
    // Every per-round frame is cut to a materialized leaf with an EAGER
    // localCheckpoint: `next` references `labels` three times (self,
    // neighbor pull, pointer jump), so without truncation the LOGICAL
    // plan (not the data) grows ~4x per round — a 64-node chain blew a
    // 2 GB plan string under persist(), which caches rows but keeps the
    // nested plan. This is the one place lineage truncation is mandatory
    // (unlike the tiny-frame diamonds where re-evaluation measured
    // cheaper — see MergeOps notes); old rounds' blocks are reclaimed by
    // the context cleaner, the GraphX-Pregel pattern.
    var labels = sym
      .groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .localCheckpoint()
    // labels are NONINCREASING per node (every update is a min including
    // the current value), so convergence is "the exact decimal label sum
    // stopped falling" — one aggregate per round instead of a
    // change-detection join (measured 30% of the round's cost)
    // empty pair graph: no nodes, nothing to iterate (and labelSum would
    // be SQL-null) — return the empty (node, cluster) frame so callers'
    // left-join/coalesce yields all-singleton clusters
    if (labels.head(1).isEmpty)
      return labels.select(col("node"), col("label").as("cluster"))
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged) {
      iter += 1
      if (iter > maxIter)
        throw new IllegalStateException(
          s"connectedComponents: not converged after $maxIter pointer-jump rounds " +
            "(component chain longer than 2^maxIter?) — raise maxIter")
      // 1. neighbor propagation: pull each neighbor's current label.
      //    shuffle_hash hints on both round joins: sort-merge would sort
      //    10-30M rows EVERY round — the stage trace showed the sorts
      //    dominating round CPU (14µs/row); per-task hash builds are
      //    ~100k rows, trivially in-memory
      val viaNbr = sym
        .join(labels.withColumnRenamed("node", "v").hint("shuffle_hash"), Seq("v"))
        .select(col("u").as("node"), col("label"))
      // 2. pointer jump: label(label(node)). Every node u appears here
      //    (its label l is itself a node carrying a label), and
      //    label(l) <= l <= label(u), so this term subsumes keeping the
      //    old labels in the union — no third union branch needed.
      val viaJump = labels
        .join(
          labels.select(col("node").as("label"), col("label").as("_ll")).hint("shuffle_hash"),
          Seq("label"))
        .select(col("node"), col("_ll").as("label"))
      val next = viaNbr.unionByName(viaJump)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
    }
    labels.select(col("node"), col("label").as("cluster"))
  }

  /** One survivor per duplicate cluster: the member maximizing
    * `scoreCol` (ties → smallest id). Returns
    * (cluster, survivor, cluster_size). `members`: (node, cluster) from
    * [[connectedComponents]] joined with whatever score the caller
    * computes (n_chars, quality, recency…). */
  def survivors(members: DataFrame, scoreCol: String): DataFrame =
    members
      .groupBy("cluster")
      .agg(
        max_by(col("node"), struct(col(scoreCol), -col("node"))).as("survivor"),
        count(lit(1)).as("cluster_size"))
}
