package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank power iteration over an edge relation — the link-graph
  * centrality prior web-scale curation pipelines attach to documents
  * (host/URL rank as a quality signal; Brin & Page 1998 §2.1).
  *
  * Semantics: simple-graph PageRank with uniform teleport and full
  * dangling-mass redistribution —
  * {{{
  *   rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u) + D/N )
  * }}}
  * where D = Σ rank(u) over nodes with no out-edges. A fixed iteration
  * count (not convergence-tested) keeps the result deterministic and
  * SQL-replicable; ranks are rounded to 9 dp on OUTPUT only, so
  * engine-side float accumulation-order ULPs can't flip a hash compare
  * while iterations still compound at full precision.
  *
  * Scale shape (the Pregel/GraphX pattern expressed in DataFrame algebra):
  * each iteration is ONE join of the edge relation with the nodes-sized
  * rank relation on `src` (co-partitioned when `edges` is bucketed by
  * `src` — the 100 TB layout) followed by ONE aggregation shuffle on
  * `dst`; the edge relation itself is never re-derived. `nodes` and
  * `outdeg` are computed once and persisted through
  * [[graft.CacheRegistry]]; lineage is cut with `localCheckpoint` every
  * `checkpointEvery` iterations (the iterative-plan lesson from
  * [[graft.pipeline.Bpe]]) so the plan stays bounded by `checkpointEvery`
  * join+agg rounds — each eager checkpoint is a fixed-latency job, so at
  * low SF the cadence, not the data, is the floor (measured: every-2 cut
  * x34 wall time ~35% vs every-1 at sf0.1 with identical output). The
  * teleport constant and dangling mass travel as broadcast 1-row
  * relations — no driver-side collect anywhere.
  */
object PageRank {

  /** @param edges   edge relation; duplicate (src, dst) rows are collapsed
    *                (simple graph)
    * @param srcCol  source node id column (integral)
    * @param dstCol  destination node id column (integral; may overlap
    *                `srcCol`'s id space — caller namespaces if the two are
    *                logically distinct entities)
    * @param iters   fixed power-iteration count
    * @param damping d in [0, 1]
    * @param checkpointEvery cut lineage every k-th iteration (and after
    *                the last); checkpointing is value-neutral, so the
    *                cadence trades bounded plan growth (≤ k join+agg
    *                rounds) against per-checkpoint job latency
    * @param checkpointer applied to the rank relation at each checkpoint
    *                to cut lineage; injectable (identity) so tests can
    *                assert the full multi-iteration plan
    * @return (node, pagerank) — one row per distinct node, ranks summing
    *         to ~1, rounded to 9 dp */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointEvery: Int = 2,
      checkpointer: DataFrame => DataFrame = _.localCheckpoint()): DataFrame = {
    require(iters >= 0, s"PageRank: iters must be >= 0, got $iters")
    require(damping >= 0.0 && damping <= 1.0,
      s"PageRank: damping must be in [0, 1], got $damping")
    require(checkpointEvery >= 1,
      s"PageRank: checkpointEvery must be >= 1, got $checkpointEvery")
    val e = graft.CacheRegistry.persisted(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct())
    val outDeg = graft.CacheRegistry.persisted(
      e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg")))
    // the dangling flag is a property of the GRAPH, not of an iteration:
    // computed once here, carried inside the rank relation, so each
    // iteration's dangling mass is a filtered agg over the checkpointed
    // ranks instead of a per-iteration anti-join (measured -1 join +
    // -1 nodes×nodes shuffle per iteration; arithmetic identical — the
    // same rank values are summed)
    val nodes = graft.CacheRegistry.persisted(
      e.select(col("src").as("node")).union(e.select(col("dst"))).distinct()
        .join(outDeg.select(col("src").as("node"), col("deg")), Seq("node"), "left")
        .select(col("node"), col("deg").isNull.as("is_dangling")))
    // node count as a broadcast 1-row relation (no driver action)
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    // no initial checkpoint: the seed's lineage is just the persisted
    // `nodes` relation plus a broadcast, already a cut point
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), col("is_dangling"), (lit(1.0) / col("n_nodes")).as("rank"))
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cin"))
      val dangling = ranks.where(col("is_dangling"))
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("is_dangling"),
          ((lit(1.0) - damping) / col("n_nodes")
            + lit(damping) * (coalesce(col("cin"), lit(0.0))
              + col("dm") / col("n_nodes"))).as("rank"))
      i += 1
      if (i % checkpointEvery == 0 || i == iters) ranks = checkpointer(ranks)
    }
    // + 0.0 collapses IEEE -0.0 so both engines hash identically
    ranks.select(col("node"), (round(col("rank"), 9) + lit(0.0)).as("pagerank"))
  }
}
