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
  * where D = Σ rank(u) over nodes with no out-edges — computed as
  * 1 − Σ cin (mass not emitted through an edge IS the dangling mass),
  * so no per-iteration pass over the rank relation. A fixed iteration
  * count (not convergence-tested) keeps the result deterministic and
  * SQL-replicable; ranks are rounded to 9 dp on OUTPUT only, so
  * engine-side float accumulation-order ULPs can't flip a hash compare
  * while iterations still compound at full precision.
  *
  * Scale shape (the Pregel/GraphX pattern expressed in DataFrame algebra):
  * each iteration is ONE join of the degree-annotated edge relation
  * (out-degree folded in once at setup — r14) with the nodes-sized rank
  * relation on `src` (the edge side persisted hash-partitioned on `src`,
  * so only ranks are exchanged — the bucketed-by-src 100 TB layout built
  * in-plan) followed by ONE aggregation shuffle on `dst`; the edge
  * relation itself is never re-derived or re-shuffled. `nodes` is
  * persisted hash-partitioned on the node id, so the rank-recompute left
  * join against the identically-partitioned contributions is
  * exchange-free. Lineage is cut with `localCheckpoint` every
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
    // r14 folded the static out-degree INTO the persisted edge relation so
    // each iteration joins ranks against ONE relation instead of two — but
    // built it as a second join over a separately-persisted edge relation
    // plus an explicit repartition(src): three cached relations and four
    // setup exchanges, which the r14 driver measured as a NET LOSS at
    // bench SF (x34 5.6 → 9.5 s). r15: the fold is ONE window count —
    // the distinct's exchange is hash(src,dst), then WindowExec's required
    // hash(src) distribution adds exactly one more, and that SAME
    // hash(src) layout is what every iteration's join reuses from the
    // cache (guide §2.4: operations keyed the same way share one
    // exchange). Net: 2 setup exchanges and ONE cached edge relation
    // instead of 4 and three; deg is the same exact integer count per
    // src, cast once; no second join, no separate edge persist, no
    // repartition.
    val ew = graft.CacheRegistry.persisted(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct()
        .withColumn("deg", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src")))
          .cast("double")))
    // nodes persisted partitioned on the id (the distinct's own hash(node)
    // exchange — no explicit repartition, r14's was redundant): contrib
    // arrives from its groupBy already hash-partitioned on node, so the
    // per-iteration left join is exchange-free on both sides
    val nodes = graft.CacheRegistry.persisted(
      ew.select(col("src").as("node")).union(ew.select(col("dst"))).distinct())
    // node count as a broadcast 1-row relation (no driver action)
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    // no initial checkpoint: the seed's lineage is just the persisted
    // `nodes` relation plus a broadcast, already a cut point
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("rank"))
    var i = 0
    // contribs cached since the last lineage cut: once the checkpointer
    // runs (materializing ranks), nothing references them any more, so
    // they are released eagerly — live cache stays bounded by
    // checkpointEvery relations instead of growing with iters
    val pendingContribs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (i < iters) {
      // dangling mass DERIVED, not measured: each non-dangling u emits
      // exactly rank(u)/deg(u) x deg(u) = rank(u) into the contribution
      // relation, so D = total mass - Σcin = 1 - Σcin. This removes the
      // per-iteration scan of the rank relation (which, between
      // checkpoints, re-executed the previous join+agg lineage — Spark
      // shares no plan subtrees) and the is_dangling bookkeeping
      // entirely. `contrib` is persisted because two consumers read it
      // (the 1-row dm agg and the rank recompute join); it is
      // nodes-sized, registered in CacheRegistry (released by
      // unpersistAll, the operator-persist lifecycle). Float note: 1 -
      // Σcin differs from the measured dangling sum by the iteration's
      // total-mass drift (~1 ulp); the oracle derives dm identically,
      // and output rounds at 9 dp.
      val contrib = graft.CacheRegistry.persisted(ew
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cin")))
      val dangling = contrib
        .agg((lit(1.0) - coalesce(sum(col("cin")), lit(0.0))).as("dm"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          ((lit(1.0) - damping) / col("n_nodes")
            + lit(damping) * (coalesce(col("cin"), lit(0.0))
              + col("dm") / col("n_nodes"))).as("rank"))
      pendingContribs += contrib
      i += 1
      graft.PlanProbe.note(s"pagerank iter $i (pre-checkpoint)", ranks)
      if (i % checkpointEvery == 0 || i == iters) {
        ranks = checkpointer(ranks)
        // safe even under an identity checkpointer (tests): unpersist
        // only forfeits the cache, the lineage recomputes correctly
        pendingContribs.foreach(_.unpersist())
        pendingContribs.clear()
      }
    }
    // the final checkpoint (i == iters) cut the returned relation's
    // lineage, so the setup caches are unreferenced — release them now
    // (§5 bounded caching: a pipeline composing several run() calls must
    // not accumulate edge caches; under an identity checkpointer this
    // merely forfeits a cache, the lineage recomputes correctly).
    // iters == 0 returns the uncut seed, which still reads `nodes`.
    if (iters > 0) { ew.unpersist(); nodes.unpersist() }
    // + 0.0 collapses IEEE -0.0 so both engines hash identically
    ranks.select(col("node"), (round(col("rank"), 9) + lit(0.0)).as("pagerank"))
  }
}
