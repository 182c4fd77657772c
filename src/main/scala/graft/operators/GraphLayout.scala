package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-strategy gate for the node-sized frames inside iterative graph
  * algorithms (`graph_pagerank`, `graph_k_core`, `graph_bfs_distance`).
  *
  * The zero-edge-exchange layout those queries use — cache the edge frame
  * pre-partitioned, broadcast the node-sized rank/estimate/frontier frame
  * every round — is optimal while the node frame actually fits a broadcast.
  * At the 100 TB design point the node vector is 10⁸–10⁹ rows and a
  * per-iteration full broadcast dies at the driver, so past
  * [[broadcastNodeLimit]] nodes the queries flip to a shuffled-hash join:
  * the edge cache is then pre-partitioned by the JOIN key, so the shuffle
  * exchanges only the node-sized frame (pagerank/BFS) or the Pregel-minimal
  * per-edge message frame (k-core's gather has no smaller exchange).
  *
  * The limit is a system property so tests can force either mode on tiny
  * data (`PlanAuditSpec` pins both plans structurally).
  */
object GraphLayout {

  /** Max node count for which a node-sized frame may ride the broadcast
    * path. 1M nodes × ~16 B/row ≈ 16 MB serialized — comfortably inside
    * a driver/executor broadcast budget. The r10 on-data A/B
    * (BENCH_SCALE_PROBE.md) measured the crossover: below ~1M nodes
    * every iterative graph query runs faster broadcasting; at ~1.6M the
    * heaviest per-round consumer (pagerank, 8 full-vector broadcasts)
    * already inverts to 0.67× on the shuffle path while the others pay
    * ≤1.2× — so past the measured crossover region the gate errs toward
    * the mode that survives 10⁸-node graphs. */
  def broadcastNodeLimit: Long =
    sys.props.get("graft.graph.broadcastNodeLimit").map(_.toLong)
      .getOrElse(1000000L)

  /** Whether an `nNodes`-row node frame should broadcast. */
  def useBroadcast(nNodes: Long): Boolean = nNodes <= broadcastNodeLimit

  /** The node-frame side of the per-iteration join: explicit broadcast
    * under the limit; an explicit shuffled-hash hint above it (the frame
    * needs no sort, and the hint also stops Catalyst's size estimator from
    * silently re-broadcasting what the gate just refused). */
  def nodeSide(df: DataFrame, nNodes: Long): DataFrame =
    if (useBroadcast(nNodes)) broadcast(df) else df.hint("shuffle_hash")

  /** Test-only plan probe: when set (PlanAuditSpec), the iterative
    * queries leave their FINAL round un-checkpointed so the gated join
    * is visible in the returned plan — at the cost of re-executing that
    * round (against by-then-unpersisted caches) when the frame is
    * collected. The default path checkpoints every round: cheapest, and
    * what Bench measures. */
  def keepFinalPlan: Boolean =
    sys.props.get("graft.graph.keepFinalPlan").contains("true")
}
