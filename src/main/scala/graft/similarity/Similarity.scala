package graft.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — driver
  * extension surface (the reference has no vector ops, SURVEY §2.12).
  *
  * Two paths, mirroring how ANN is actually deployed:
  *  - [[bruteForceTopK]]: exact top-k via a broadcast join of the (small)
  *    query set against the (huge) corpus — the correctness baseline. The
  *    corpus is never shuffled: queries broadcast to every executor, the
  *    per-partition top-k is taken before the final k·|queries|-row
  *    aggregation, so the reduction is tiny.
  *  - [[withHyperplaneBuckets]] + [[lshTopK]]: random-hyperplane LSH. Sign
  *    bits of dot products with `planes` fixed pseudo-random hyperplanes
  *    give a bucket id; search only within the query's bucket. At 100 TB
  *    the bucketed corpus is written partitioned by bucket, so a query
  *    touches 1/2^planes of the data (partition pruning on the bucket
  *    column does this for free) — [[writeLshIndex]] / [[lshTopKIndexed]]
  *    are that physical face.
  *
  * All arithmetic is double-precision in deterministic index order, so an
  * external oracle (DuckDB) reproduces results bit-for-bit.
  */
object Similarity {

  /** Elementwise dot product in index order: Σ a[i]·b[i], double — a
    * codegen'd native expression ([[graft.functions.DotProduct]]), not an
    * interpreted higher-order function: it sits inside pairwise joins. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, explicit double-precision formula (not a library
    * intrinsic — identical accumulation order everywhere). */
  def cosine(a: Column, b: Column): Column =
    cosineOf(dot(a, b), l2Norm(a), l2Norm(b))

  /** dot / (|a|·|b|) with the zero-norm case yielding NaN — the value
    * every caller's `!isnan` filter already excludes. A PLAIN division
    * THROWS under ANSI mode (Spark 4 default) the moment a zero vector
    * appears (DIVIDE_BY_ZERO; DedupProps generated the case), so the
    * guard is correctness, not style: one definition for every cosine
    * in the tree. */
  def cosineOf(d: Column, na: Column, nb: Column): Column =
    when(na * nb =!= 0.0, d / (na * nb)).otherwise(lit(Double.NaN))

  /** Deterministic pseudo-random hyperplanes: weight(p, d) = ±1 from the
    * parity of the first hex char of md5("p_d"). Computed at PLAN TIME and
    * embedded as literal arrays — per-row cost is a 64-term dot product in
    * codegen, zero hashing. Any engine can regenerate the same planes. */
  def hyperplaneWeights(planes: Int, dims: Int): Array[Array[Double]] = {
    val digest = MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val hex = digest.digest(s"${p}_$d".getBytes(StandardCharsets.UTF_8))
      val firstHexChar = (hex(0) >> 4) & 0xf
      if (firstHexChar % 2 == 1) 1.0 else -1.0
    }
  }

  /** Bucket id in [0, 2^planes): bit p set iff dot(v, plane_p) > 0.
    * One fused expression (bands=1): the vector converts once and every
    * plane dot runs in a single compiled loop, instead of one
    * DotProduct + cast per plane.
    *
    * Null semantics: a NULL vector yields a NULL bucket (the fused
    * expression is null-intolerant), NOT bucket 0 as the pre-fused
    * `when(dot > 0, …).otherwise(0)` chain produced. This is deliberate:
    * a null embedding has no meaningful hyperplane side, and routing it
    * to bucket 0 only manufactured candidate pairs the cosine verify had
    * to discard. Callers that need the legacy contract can wrap with
    * `coalesce(hyperplaneBucket(v, w), lit(0L))`. A dimension-MISMATCHED
    * (non-null) vector still yields bucket 0, matching the unrolled
    * form. */
  def hyperplaneBucket(vec: Column, weights: Array[Array[Double]]): Column =
    element_at(graft.functions.VectorFunctions.bandBuckets(
      vec, weights, bands = 1, rowsPerBand = weights.length), 1)

  def withHyperplaneBuckets(
      df: DataFrame, vecCol: String, planes: Int, dims: Int): DataFrame =
    df.withColumn("bucket", hyperplaneBucket(col(vecCol), hyperplaneWeights(planes, dims)))

  /** Per-query top-k reduction via the mergeable bounded-buffer aggregator
    * ([[graft.folds.Aggregators.topK]]): map-side partial top-k means at
    * most k (cosine, id) entries per query per partition cross the
    * shuffle — the window row_number formulation shuffles and sorts EVERY
    * scored pair. Same ordering contract (cosine desc, id asc on ties).
    * Ids must be integral (cast to long). */
  private def topKByQuery(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.folds.Aggregators.asColumn(
      graft.folds.Aggregators.topK(k),
      col("cosine"), col("neighbor_id").cast("long"))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    scored
      // NaN (a zero-norm vector: 0/0) as well as null is excluded —
      // cosine is undefined there, and engines disagree on NaN ordering
      // (Spark's total order ranks NaN last, DuckDB's first)
      .where(col("cosine").isNotNull && !isnan(col("cosine")))
      .groupBy(col("query_id"))
      .agg(top.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), col("e._2").as("neighbor_id"), col("e._1").as("cosine"),
        (col("i") + 1).cast("int").as("rank"))
  }

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * broadcast-small (it is hinted); `corpus` is scanned once and reduced
    * through the partial top-k aggregation — never shuffled in full.
    * Self-matches excluded. Ties broken by corpus id for determinism. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms once per vector BEFORE the pairwise join, not once per pair
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_norm"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** Hard-negative mining for contrastive / retrieval training (the
    * in-batch-negatives upgrade — Karpukhin et al. 2020, DPR §3.2, mine
    * the highest-scoring NON-matching candidates as training negatives):
    * for each anchor, the top-k most-cosine-similar corpus vectors with a
    * DIFFERENT label — the maximally confusing negatives.
    *
    * Same scale shape as [[bruteForceTopK]]: anchors broadcast, corpus
    * scanned once and reduced through the bounded partial top-k
    * aggregation; the label-mismatch predicate rides the broadcast join
    * condition, so no extra pass and no full shuffle. For corpora past
    * brute-force reach, mine within [[ivfTopK]] lists first and feed the
    * candidates here.
    *
    * NULL-labeled rows are excluded on BOTH sides (explicitly, matching
    * what the null-unsafe `=!=` predicate would do silently): an
    * unlabeled vector is neither a mineable negative nor an anchor with
    * well-defined negatives — label the data or filter beforehand if
    * other semantics are wanted. */
  def hardNegativeTopK(
      corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = anchors.where(col(labelCol).isNotNull)
      .select(col(idCol).as("query_id"), col(labelCol).as("q_label"),
        col(vecCol).as("q_vec"), l2Norm(col(vecCol)).as("q_norm"))
    val scored = corpus.where(col(labelCol).isNotNull)
      .select(col(idCol).as("neighbor_id"),
        col(labelCol).as("n_label"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_norm"))
      .join(broadcast(q),
        col("neighbor_id") =!= col("query_id") && col("n_label") =!= col("q_label"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path next to hyperplane LSH.
    *
    * Index structure: a coarse quantizer of `nlist` centroids; every corpus
    * vector is assigned to its nearest centroid ("list"); a query probes its
    * `nprobe` nearest centroids and scores only vectors in those lists.
    *
    * Scale shape: the quantizer is driver-small by construction (nlist ≪
    * corpus — FAISS keeps it in RAM on every node for the same reason), so
    * centroids are collected once and held by a single native expression
    * ([[graft.functions.NearestCentroids]]).
    * List assignment is then a pure codegen'd projection — the corpus is NEVER
    * shuffled; probes broadcast; per-query candidates reduce through one
    * small window. At 100 TB the assigned corpus is written partitioned
    * by `list_id` so a probe is a partition-pruned scan —
    * [[writeIvfIndex]] / [[ivfTopKIndexed]] are that physical face.
    *
    * Centroid choice is deterministic (the `nlist` smallest-id corpus
    * vectors) rather than k-means: Lloyd refinement averages vectors in
    * shuffle order, which is float-nondeterministic across runs/engines,
    * and the index's *structure* — not the quality of its centroids — is
    * what this operator contributes. Ties on cosine break toward the
    * larger centroid id (max struct semantics), mirrored in the oracle. */
  /** [[ivfTopK]] with `nlist` auto-scaled to max(8, ⌈√corpus⌉) — the
    * standard IVF sizing rule (lists of ~√n vectors balance quantizer cost
    * against per-probe scan cost). A FIXED nlist stops pruning as the
    * corpus grows: list sizes grow linearly, so each probe rescans a
    * constant fraction of the data. The one `count()` action here is
    * index-BUILD cost, not query cost — the quantizer collect below is
    * already an action, and both run once per index, not per query. */
  def ivfTopKAuto(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val n = corpus.count()
    val nlist = math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    ivfTopK(corpus, queries, idCol, vecCol, k, nlist, nprobe)
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, s"ivfTopK: need 1 <= nprobe <= nlist")
    val cents: Array[(Long, Array[Double])] = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol))
      .limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nprobe,
      cents.map(_._1), cents.map(_._2))
  }

  /** Distributed Lloyd k-means for IVF centroid training — the quality
    * upgrade over the deterministic smallest-id quantizer: data-driven
    * centroids track the corpus distribution, so lists are balanced and a
    * probe's nearest lists actually contain the query's neighborhood.
    *
    * FAISS-shaped at scale: assignment is the shuffle-free
    * [[graft.functions.NearestCentroids]] projection over the full corpus;
    * the update step is ONE partial-aggregated shuffle of (list, dim)
    * cells, and only the nlist×dim centroid matrix (KBs–MBs; nlist ≪
    * corpus) ever reaches the driver — per iteration, exactly like FAISS
    * trains its coarse quantizer in RAM. Init = smallest-id vectors
    * (deterministic); an emptied list keeps its previous centroid.
    *
    * Centroid VALUES are reproducible only up to accumulation order
    * (double sums in shuffle order) — which is why the oracle-checked s3
    * query keeps the deterministic quantizer, and this trainer is spec-
    * verified (convergence + recall) instead. */
  def kmeansCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): (Array[Long], Array[Array[Double]]) = {
    require(iters >= 0, "kmeansCentroids: iters >= 0")
    val cids = Array.tabulate(nlist)(_.toLong)
    var cvecs: Array[Array[Double]] = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    var it = 0
    while (it < iters) {
      val assigned = corpus.select(
        element_at(graft.functions.VectorFunctions.nearestCentroids(
          col(vecCol), cids, cvecs, 1), 1).as("list_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      val cells = assigned
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cvecs.map(_.clone())
      cells.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cvecs = next
      it += 1
    }
    (cids, cvecs)
  }

  /** [[ivfTopK]] with k-means-trained centroids (see [[kmeansCentroids]]).
    * Same index structure and probe plan; only the quantizer differs. */
  def ivfTopKKmeans(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int, nprobe: Int,
      iters: Int = 5): DataFrame = {
    val (cids, cvecs) = kmeansCentroids(corpus, idCol, vecCol, nlist, iters)
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nprobe, cids, cvecs)
  }

  /** [[ivfTopK]] with caller-supplied centroids — the no-retraining face:
    * [[kmeansCentroids]] output (or centroids read back from a
    * [[writeIvfIndex]] directory) plugs in directly, so one training run
    * can serve many query batches without Lloyd re-running per call. */
  def ivfTopKWith(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      cids: Array[Long], cvecs: Array[Array[Double]]): DataFrame =
    ivfWithCentroids(corpus, queries, idCol, vecCol, k, nprobe, cids, cvecs)

  private def ivfWithCentroids(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      cids: Array[Long], cvecs: Array[Array[Double]]): DataFrame = {
    require(nprobe >= 1 && nprobe <= cids.length,
      "ivfWithCentroids: need 1 <= nprobe <= nlist")
    // Nearest-centroid scoring is ONE expression node holding the quantizer
    // as a reference object (graft.functions.NearestCentroids) — an
    // unrolled literal-array formulation grows the plan with nlist (=√n
    // under auto-sizing) and falls out of codegen past a few dozen
    // centroids. Ordering contract unchanged: (cos desc, cid desc).
    def nearest(vec: Column, k: Int): Column =
      graft.functions.VectorFunctions.nearestCentroids(vec, cids, cvecs, k)

    val assigned = corpus.select(
      element_at(nearest(col(vecCol), 1), 1).as("list_id"),
      col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      l2Norm(col(vecCol)).as("n_norm"))
    val probes = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"), l2Norm(col(vecCol)).as("q_norm"),
      explode(nearest(col(vecCol), nprobe)).as("list_id"))
    val scored = assigned.join(broadcast(probes), "list_id")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** IVF index AT REST — the physical layout the [[ivfTopK]] scaladoc
    * promises ("the assigned corpus would be written partitioned by
    * list_id"): every corpus vector lands in a parquet directory per
    * inverted list (`dir/lists/list_id=N/`), with the deterministic
    * smallest-id quantizer persisted beside it (`dir/centroids`). Probing
    * then reads ONLY the probed lists' directories — partition pruning in
    * the scan, the FAISS-on-disk shape, asserted in PlanSpec.
    * Index-build cost: the quantizer collect (nlist rows) plus one
    * assignment pass over the corpus; the write shuffles nothing (the
    * partitioned sink splits files per task). */
  def writeIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Option[Int] = None,
      centroids: Option[(Array[Long], Array[Array[Double]])] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // quality path: pre-trained centroids (e.g. [[kmeansCentroids]]) plug
    // in directly; default = the deterministic smallest-id quantizer (the
    // s3/s9 oracle contract)
    val cents: Array[(Long, Array[Double])] = centroids match {
      case Some((cids, cvecs)) =>
        require(cids.length == cvecs.length && cids.nonEmpty,
          "writeIvfIndex: centroid ids and vectors must align and be non-empty")
        cids.zip(cvecs)
      case None =>
        // the corpus count runs ONLY when auto-sizing — an explicit nlist
        // must not cost a full extra pass at index-build time
        val nl = nlist.getOrElse {
          val n = corpus.count()
          math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
        }
        corpus
          .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
          .orderBy(col(idCol))
          .limit(nl)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    }
    require(cents.nonEmpty,
      "writeIvfIndex: empty corpus — refusing to write a partial index")
    cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    val nearest1 = graft.functions.VectorFunctions
      .nearestCentroids(col(vecCol), cents.map(_._1), cents.map(_._2), 1)
    corpus
      .select(element_at(nearest1, 1).as("list_id"), col(idCol), col(vecCol))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$dir/lists")
  }

  /** Append new vectors to an existing [[writeIvfIndex]] layout — the
    * incremental-ingest face (the [[graft.dedup.Dedup.dedupAgainstRegistry]]
    * shape applied to the ANN index): the PERSISTED quantizer is read back
    * and reused, so new assignments are consistent with the original
    * build (existing lists never reshuffle), and the new rows land in
    * their list directories via dynamic-partition append. Equivalence
    * (spec'd): build(A) then append(B) answers queries identically to
    * build(A ∪ B) under A's quantizer. */
  def appendToIvfIndex(
      newVectors: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = newVectors.sparkSession
    val cents: Array[(Long, Array[Double])] = spark.read
      .parquet(s"$dir/centroids").orderBy(col("cid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(cents.nonEmpty, s"appendToIvfIndex: no centroids under $dir")
    val nearest1 = graft.functions.VectorFunctions
      .nearestCentroids(col(vecCol), cents.map(_._1), cents.map(_._2), 1)
    newVectors
      .select(element_at(nearest1, 1).as("list_id"), col(idCol), col(vecCol))
      .write.mode("append").partitionBy("list_id").parquet(s"$dir/lists")
  }

  /** Query a [[writeIvfIndex]] index without touching unprobed lists: the
    * probed list-id set is computed from the (broadcast-small, same
    * contract as the quantizer collect) query set and pushed into the
    * scan as a PLAN-TIME partition filter, so the read is a
    * partition-pruned subset of the corpus — at 100 TB, nprobe/nlist of
    * the data. Result ≡ [[ivfTopK]] with the same parameters (same
    * quantizer, same ordering contract), which is what the oracle and
    * spec check. */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val cents: Array[(Long, Array[Double])] = spark.read
      .parquet(s"$dir/centroids").orderBy(col("cid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(nprobe >= 1 && nprobe <= cents.length,
      "ivfTopKIndexed: need 1 <= nprobe <= nlist")
    def nearest(vec: Column, m: Int): Column =
      graft.functions.VectorFunctions.nearestCentroids(
        vec, cents.map(_._1), cents.map(_._2), m)
    // persisted: the probe relation is executed TWICE (the partition-id
    // collect below, then the broadcast join) — without pinning, the
    // query scan + centroid scoring run twice, and a nondeterministic
    // query set could probe partitions the collected filter excluded
    val probes = graft.CacheRegistry.persisted(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"),
      explode(nearest(col(vecCol), nprobe)).as("list_id")))
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getLong(0))
    val assigned = spark.read.parquet(s"$dir/lists")
      .where(col("list_id").isin(probedLists.toIndexedSeq.map(Long.box): _*))
      .select(col("list_id"), col(idCol).as("neighbor_id"),
        col(vecCol).as("n_vec"), l2Norm(col(vecCol)).as("n_norm"))
    val scored = assigned.join(broadcast(probes), "list_id")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** SQ8 codebook: per-dimension (min, max) over the corpus (FAISS
    * `ScalarQuantizer` QT_8bit training). ONE partial-aggregated shuffle of
    * `dims` cells; only 2·dims doubles reach the driver — index-build cost,
    * like the IVF quantizer collect. min/max are order-insensitive exact
    * aggregates, so the codebook is bit-reproducible by any engine. */
  def sqTrain(corpus: DataFrame, vecCol: String, dims: Int): (Array[Double], Array[Double]) = {
    val cells = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
    require(cells.nonEmpty, "sqTrain: cannot train a codebook on an empty corpus")
    require(cells.length == dims, s"sqTrain: corpus vectors must all have $dims dims")
    val mn = new Array[Double](dims)
    val mx = new Array[Double](dims)
    cells.foreach { r =>
      mn(r.getInt(0)) = r.getDouble(1)
      mx(r.getInt(0)) = r.getDouble(2)
    }
    (mn, mx)
  }

  /** Scalar-quantized (SQ8) approximate top-k — the compression scale path
    * next to pruning (LSH/IVF): each corpus float32 dimension is stored as
    * ONE byte, `code = floor((v−min)/(max−min)·255 + 0.5)` against the
    * per-dimension [[sqTrain]] codebook, an 8× smaller at-rest corpus (a
    * 100 TB float32 embedding store becomes 12.5 TB — often the difference
    * between spilling and not). Queries stay full-precision; corpus vectors
    * are decoded (`min + code/255·(max−min)`) at scan time in the same
    * plan — asymmetric distance computation, exactly FAISS's SQ8 search.
    *
    * Everything is deterministic IEEE double arithmetic in a fixed
    * evaluation order (`floor`, not `round` — round-half rules differ
    * across engines), so an external oracle reproduces scores bit-for-bit.
    * A constant dimension (max == min) encodes as 0 and decodes to min
    * exactly. Ordering contract as everywhere: (cosine desc, id asc). */
  def sq8TopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int): DataFrame = {
    val (mn, mx) = sqTrain(corpus, vecCol, dims)
    // quantize→decode is ONE fused native expression (SqDequantize): the
    // higher-order-function formulation is interpreted per element and gets
    // collapsed into the pairwise join projection — re-decoding the corpus
    // once per PAIR (19.6 s vs <1 s at sf0.1)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"),
        graft.functions.VectorFunctions.sqDequantize(col(vecCol), mn, mx).as("n_vec"))
      .withColumn("n_norm", l2Norm(col("n_vec")))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** Approximate top-k: as [[bruteForceTopK]] but candidates restricted to
    * the query's hyperplane-LSH bucket (the scale path: the equi-join on
    * `bucket` prunes the corpus scan instead of broadcasting against all
    * of it). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int, dims: Int): DataFrame = {
    val cb = withHyperplaneBuckets(corpus, vecCol, planes, dims)
      .select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
        l2Norm(col(vecCol)).as("n_norm"))
    val qb = withHyperplaneBuckets(queries, vecCol, planes, dims)
      .select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_norm"))
    val scored = cb.join(broadcast(qb), "bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** Hyperplane-LSH index AT REST — [[lshTopK]]'s scaladoc promise ("at
    * 100 TB the bucketed corpus is written partitioned by bucket") made
    * physical, the same move as [[writeIvfIndex]]: the bucketed corpus
    * lands as parquet PARTITIONED BY bucket, with (planes, dims) in a
    * one-row meta table so the reader regenerates the identical
    * deterministic hyperplanes ([[hyperplaneWeights]] is seed-free).
    * A query then reads only its own bucket's directory — 1/2^planes of
    * the corpus via partition pruning. */
  def writeLshIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      planes: Int, dims: Int): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((planes, dims)).toDF("planes", "dims")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    withHyperplaneBuckets(corpus, vecCol, planes, dims)
      .select(col("bucket"), col(idCol), col(vecCol))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/buckets")
  }

  /** Append new vectors to an existing [[writeLshIndex]] layout — the
    * hyperplanes are seed-free deterministic, so consistency with the
    * original build is automatic; (planes, dims) come from the persisted
    * meta table. Same equivalence contract as [[appendToIvfIndex]]. */
  def appendToLshIndex(
      newVectors: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = newVectors.sparkSession
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (planes, dims) = (meta.getAs[Int]("planes"), meta.getAs[Int]("dims"))
    withHyperplaneBuckets(newVectors, vecCol, planes, dims)
      .select(col("bucket"), col(idCol), col(vecCol))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/buckets")
  }

  /** Query a [[writeLshIndex]] index: query buckets are computed with the
    * regenerated hyperplanes, the probed bucket set becomes a plan-time
    * partition filter on the scan, and scoring matches [[lshTopK]]
    * exactly (same buckets, same ordering contract) — the equivalence is
    * what the oracle and spec check. */
  def lshTopKIndexed(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    // by NAME: both fields are Int, so an ordinal read would silently
    // transpose planes/dims if the writer's column order ever changed
    val (planes, dims) = (meta.getAs[Int]("planes"), meta.getAs[Int]("dims"))
    // persisted for the same two-execution reason as ivfTopKIndexed
    val qb = graft.CacheRegistry.persisted(
      withHyperplaneBuckets(queries, vecCol, planes, dims)
        .select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("q_vec"),
          l2Norm(col(vecCol)).as("q_norm")))
    val probed = qb.select(col("bucket")).distinct().collect().map(_.getLong(0))
    val cb = spark.read.parquet(s"$dir/buckets")
      .where(col("bucket").isin(probed.toIndexedSeq.map(Long.box): _*))
      .select(col("bucket"), col(idCol).as("neighbor_id"),
        col(vecCol).as("n_vec"), l2Norm(col(vecCol)).as("n_norm"))
    val scored = cb.join(broadcast(qb), "bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** Deterministic PQ codebooks: subspace `s`'s centroids are the
    * corresponding subvectors of the `ksub` SMALLEST-id corpus vectors —
    * the same oracle-reproducible quantizer face as the IVF default and
    * `semanticDedupPairs`; k-means per subspace (run [[kmeansCentroids]]
    * on each subvector projection) is the quality path. Index-build
    * collect: ksub·dims doubles reach the driver. */
  def pqTrainDeterministic(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, dims: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dims % m == 0, s"pqTrainDeterministic: m must divide dims=$dims")
    require(ksub >= 1, "pqTrainDeterministic: ksub must be >= 1")
    val subDim = dims / m
    val seed = corpus.select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(ksub).collect()
    require(seed.nonEmpty, "pqTrainDeterministic: empty corpus")
    require(seed.forall(_.getSeq[Double](1).length == dims),
      s"pqTrainDeterministic: corpus vectors must all have $dims dims")
    Array.tabulate(m) { s =>
      seed.map(_.getSeq[Double](1).slice(s * subDim, (s + 1) * subDim).toArray)
    }
  }

  /** Per-subspace k-means codebooks — PQ's QUALITY path, mirroring
    * [[ivfTopKKmeans]]: subspace s's centroids come from
    * [[kmeansCentroids]] run on the corpus projected to that subvector
    * range (m independent Lloyd runs, index-build cost; the casted
    * corpus is persisted once through [[graft.CacheRegistry]] so the
    * m·iters aggregate jobs hit cache rather than re-scanning raw
    * input). Note the training assignment is this module's cosine while
    * PQ ENCODING stays squared-L2 per subspace (FAISS semantics) —
    * spherical-trained centroids, L2-assigned codes. The deterministic
    * face ([[pqTrainDeterministic]]) remains the oracle-reproducible
    * baseline, exactly like IVF's smallest-ids quantizer vs s4. */
  def pqTrainKmeans(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, dims: Int, iters: Int = 5): Array[Array[Array[Double]]] = {
    require(m >= 1 && dims % m == 0, s"pqTrainKmeans: m must divide dims=$dims")
    require(ksub >= 1, "pqTrainKmeans: ksub must be >= 1")
    val subDim = dims / m
    val casted = graft.CacheRegistry.persisted(
      corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v")))
    // same fail-fast contract as the deterministic face: an empty or
    // ragged corpus must not train silent-garbage codebooks
    val seed = casted.orderBy(col(idCol)).limit(ksub).collect()
    require(seed.nonEmpty, "pqTrainKmeans: empty corpus")
    require(seed.forall(_.getSeq[Double](1).length == dims),
      s"pqTrainKmeans: corpus vectors must all have $dims dims")
    Array.tabulate(m) { s =>
      val sub = casted.select(col(idCol),
        slice(col("__v"), s * subDim + 1, subDim).as("__sub"))
      kmeansCentroids(sub, idCol, "__sub", ksub, iters)._2
    }
  }

  /** [[pqTopK]] with the deterministic smallest-ids codebooks — the
    * oracle-reproducible default face; contract below. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, ksub: Int, dims: Int): DataFrame =
    pqTopK(corpus, queries, idCol, vecCol, k,
      pqTrainDeterministic(corpus, idCol, vecCol, m, ksub, dims))

  /** Product-quantized (PQ) approximate top-k — the HIGH-ratio
    * compression path next to SQ8's 8×: each corpus vector is stored as
    * `m` centroid indices (m·log2(ksub) bits — dims=64, m=8, ksub=16 is
    * 64 bytes → 8 bytes, 32×; FAISS `IndexPQ`). Queries stay full
    * precision and score against the RECONSTRUCTION (the concatenation
    * of each subspace's assigned centroid) — asymmetric distance, same
    * shape as [[sq8TopK]]. Encode→reconstruct is ONE fused native
    * expression ([[graft.functions.PqReconstruct]]), so byte codes never
    * materialize and the corpus is never shuffled; only per-partition
    * top-k rows cross the final reduction. Codebooks come from
    * [[pqTrainDeterministic]] (oracle face) or [[pqTrainKmeans]]
    * (quality face) — the plan is identical either way.
    *
    * Assignment is squared-L2 per subspace in index order with
    * ties → lowest centroid index; scoring is the module's cosine in
    * index order — every choice an external engine replicates
    * bit-for-bit. Ordering contract as everywhere: (cosine desc, id
    * asc). */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"),
        graft.functions.VectorFunctions.pqReconstruct(col(vecCol), cb).as("n_vec"))
      .withColumn("n_norm", l2Norm(col("n_vec")))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineOf(dot(col("q_vec"), col("n_vec")), col("q_norm"), col("n_norm")).as("cosine"))
    topKByQuery(scored, k)
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * evaluation loop every ANN deployment needs (tune nlist/nprobe/planes
    * until recall clears the bar, then ship). Both inputs are top-k
    * result sets in this module's (query_id, neighbor_id, ...) shape;
    * `k` is the exact side's k.
    *
    * Per query: `n_matched` = |approx ∩ exact top-k| via one equi-join on
    * (query, neighbor), `recall` = n_matched / k (one IEEE division —
    * deterministic in any engine). Every exact-side query appears, 0.0
    * recall included (left join, not semi). Query result sets are k rows
    * each — both sides of the join are already reduced relations, so this
    * costs one shuffle of top-k rows regardless of corpus size.
    * Assumes (query_id, neighbor_id) is unique on each side — true of any
    * top-k result; duplicated pairs would double-count. */
  def recallAtK(
      approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "recallAtK: k must be >= 1")
    val hits = approx.select(col("query_id"), col("neighbor_id"), lit(1).as("__m"))
    exact.select(col("query_id"), col("neighbor_id"))
      .join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("__m")).as("n_matched"))
      .select(col("query_id"), col("n_matched"),
        (col("n_matched") / lit(k.toDouble)).as("recall"))
  }

  /** Johnson–Lindenstrauss random projection with a ±1 sign matrix
    * (Achlioptas 2003's database-friendly projection): out_j =
    * Σ_i v_i · s(i,j) / √outDims, where s(i,j) is a deterministic sign
    * from the md5 parity of "i_j". The matrix is model data: computed
    * ONCE driver-side into `outDims` ±-strings and shipped as tiny plan
    * literals — per row the projection is a pure arithmetic fold, no
    * hashing, no shuffle, codegen-resident; the dimensionality-reduction
    * front end for the ANN family (shrinks the vectors every downstream
    * distance touches).
    *
    * Determinism: each output is ONE left fold in index order
    * (`aggregate`, 0.0 init) and one division by the exact √outDims —
    * bit-reproducible in any engine; callers surface-round. Appends
    * `rp`: array<double> of length `outDims`. */
  def randomProjection(
      df: DataFrame, vecCol: String, inDims: Int, outDims: Int): DataFrame = {
    require(inDims >= 1 && outDims >= 1, "randomProjection: dims must be >= 1")
    val signStrings = (0 until outDims).map { j =>
      (0 until inDims).map { i =>
        val d = MessageDigest.getInstance("MD5")
          .digest(s"${i}_$j".getBytes(StandardCharsets.UTF_8))
        val v = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
        if (v % 2 == 0) '+' else '-'
      }.mkString
    }
    val scale = lit(math.sqrt(outDims.toDouble))
    df.withColumn("rp", array(signStrings.map { s =>
      // '+' = ascii 43, '-' = 45: sign = 44 - ascii(char)
      aggregate(sequence(lit(1), lit(inDims)), lit(0.0), (acc, i) =>
        acc + element_at(col(vecCol), i).cast("double") *
          (lit(44) - ascii(lit(s).substr(i, lit(1)))).cast("double")) / scale
    }: _*))
  }
}
