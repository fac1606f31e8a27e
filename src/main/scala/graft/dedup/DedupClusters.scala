package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: duplicate PAIRS (from any detector —
  * exact, Jaccard, MinHash, SimHash) are edges of a graph whose
  * connected components are the duplicate clusters; the canonical
  * survivor per cluster is the minimum id.
  *
  * Algorithm: min-label propagation — every node starts labeled with
  * itself; each round takes the min of its own and its neighbours'
  * labels; converges in O(component diameter) rounds. Labels decrease
  * monotonically, so the global label sum is a convergence metric (one
  * scalar to the driver per round — the only driver traffic).
  *
  * Scale note: rounds are self-joins on the edge list, shuffling on
  * node id — fine while components are small (dedup clusters are).
  * Pathological chain-shaped graphs would want the large-star/
  * small-star variant; duplicate clusters in practice have tiny
  * diameters.
  */
object DedupClusters {

  /** @param pairs edge list (undirected, one row per pair)
    * @return (node, cluster_id) for every node appearing in a pair;
    *         cluster_id = min node id of the component */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 20): DataFrame = {
    // The pair graph is orders of magnitude smaller than the corpus
    // (only detected duplicates appear); run the iteration at a small
    // fixed parallelism so each round is not dominated by empty-task
    // overhead. At genuinely large pair counts, raise `parts` (or use
    // the large-star/small-star variant).
    val parts = 4
    // cache the (possibly expensive) pair detection before the
    // symmetrizing union references it twice
    val p = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .cache()
    val edges = p
      .union(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(parts, col("a"))
      .cache()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .repartition(parts, col("node"))
      .cache()
    var prevSum = labels.agg(sum("label")).head().getLong(0)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // labels = one row per node IN A DUPLICATE PAIR — small relative
      // to the corpus, so broadcast keeps each round shuffle-light
      val neighborMin = edges
        .join(broadcast(labels), edges("b") === labels("node"))
        .groupBy(col("a").as("node")).agg(min(col("label")).as("nmin"))
      val next = labels.join(broadcast(neighborMin), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      val s = next.agg(sum("label")).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    p.unpersist()
    edges.unpersist()
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
