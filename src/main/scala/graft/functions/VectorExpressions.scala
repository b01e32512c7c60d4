package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding hot path.
  *
  * `aggregate`/`zip_with` higher-order functions are interpreted (no
  * whole-stage codegen, one lambda dispatch per element); a 64-dim dot
  * product inside a pairwise similarity join runs millions of times, so it
  * must be a tight compiled loop. This is preference order (b) from the
  * build brief: a custom `Expression` with `doGenCode`, used only where
  * built-in codegen'd operators genuinely can't express the computation.
  *
  * Accumulation is sequential in index order, double precision — bit-
  * identical to the interpreted formulation and to the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Dimension mismatch → null (SQL-style), never a silent truncated dot:
  // a malformed embedding must not flow a plausible-but-wrong similarity
  // into dedup/topk results.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All LSH band buckets of a vector in ONE expression node.
  *
  * The unrolled formulation — `bands × rowsPerBand` separate
  * [[DotProduct]]s, each wrapping its own `cast(v as array<double>)` —
  * re-materializes the converted vector once PER PLANE (96 allocations
  * of 64 doubles per row at d19's regime) and builds an expression tree
  * whose analysis/codegen cost grows with the plane count. Holding the
  * plane matrix as one flattened reference object and looping inside a
  * single compiled method reads the vector once, keeps the plan O(1) in
  * planes, and stays inside whole-stage codegen (the
  * [[NearestCentroids]] lesson applied to banding).
  *
  * Semantics are bit-identical to the unrolled form and the DuckDB
  * oracles: per plane p, s = Σᵢ v[i]·w[p][i] sequentially in index
  * order, double precision; band p/rowsPerBand gets bit p%rowsPerBand
  * iff s > 0. A dimension-mismatched vector yields all-zero buckets —
  * exactly what the unrolled `when(dot > 0, …).otherwise(0)` produced
  * from [[DotProduct]]'s null (and the final cosine verify filters any
  * such pair anyway). */
case class BandBuckets(
    child: Expression,
    weights: Array[Array[Double]],
    bands: Int,
    rowsPerBand: Int) extends UnaryExpression {

  require(bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 62 &&
    weights.length == bands * rowsPerBand && weights.nonEmpty,
    "BandBuckets: need bands*rowsPerBand planes, 1 <= rowsPerBand <= 62")

  private val dims = weights(0).length
  // plane-major flattened matrix: one cache-friendly pass per row
  private lazy val flat: Array[Double] = {
    val f = new Array[Double](weights.length * dims)
    var p = 0
    while (p < weights.length) {
      System.arraycopy(weights(p), 0, f, p * dims, dims)
      p += 1
    }
    f
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_buckets"

  /** Called from both interpreted eval and generated code. */
  def buckets(a: ArrayData): ArrayData = {
    val out = new Array[Long](bands)
    if (a.numElements() == dims) {
      val v = new Array[Double](dims)
      var i = 0
      while (i < dims) { v(i) = a.getDouble(i); i += 1 }
      val w = flat
      val planes = weights.length
      var p = 0
      while (p < planes) {
        val base = p * dims
        var s = 0.0
        var j = 0
        while (j < dims) { s += v(j) * w(base + j); j += 1 }
        if (s > 0) out(p / rowsPerBand) |= 1L << (p % rowsPerBand)
        p += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    buckets(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandBuckets", this, classOf[BandBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.buckets($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)

  // Array fields default to reference equality, which would make two
  // structurally identical instances never compare equal — defeating
  // Catalyst canonicalization and common-subexpression elimination.
  // Compare (and hash) the flattened plane matrix by content instead.
  override def equals(other: Any): Boolean = other match {
    case b: BandBuckets =>
      child == b.child && bands == b.bands && rowsPerBand == b.rowsPerBand &&
        java.util.Arrays.equals(flat, b.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(bands),
      Integer.valueOf(rowsPerBand), Integer.valueOf(java.util.Arrays.hashCode(flat)))
}

/** Top-`k` nearest centroids of a vector by cosine, as ONE expression node.
  *
  * The naive formulation — an `array(...)` of `nlist` literal structs, each
  * wrapping a [[DotProduct]] against a `typedlit` centroid, then
  * `array_max`/`array_sort` — builds an expression tree that grows with
  * `nlist` (= ⌈√corpus⌉ under auto-sizing). Past a few dozen centroids the
  * generated Janino method blows the JVM's method-size limits, codegen
  * falls back to interpreted evaluation, and analysis/optimization of the
  * huge tree dominates query time (measured: 5.4 s at sf0.1 where the data
  * work is ~6 M flops). Holding the centroid matrix as a reference object
  * and looping inside one compiled method keeps the plan O(1) in `nlist`
  * and stays inside whole-stage codegen (one virtual call per row).
  *
  * Semantics (bit-identical to the unrolled form and the DuckDB oracle):
  * cos(c) = Σ v[i]·c[i] / (‖v‖·‖c‖), all sums sequential in index order,
  * double precision; result ids ordered by (cos DESC, cid DESC) — the
  * `array_max`-over-`struct(cos, cid)` tie rule. Null vector or dimension
  * mismatch → null.
  */
case class NearestCentroids(
    child: Expression,
    cids: Array[Long],
    cvecs: Array[Array[Double]],
    k: Int) extends UnaryExpression {

  require(cids.nonEmpty && cids.length == cvecs.length && k >= 1,
    "NearestCentroids: need >=1 centroid, matching ids, k >= 1")

  // ‖c‖ once per centroid at plan time, index-order accumulation
  private lazy val cnorms: Array[Double] = cvecs.map { cv =>
    var s = 0.0; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroids"

  /** Called from both interpreted eval and generated code. Returns the
    * top-k centroid ids by (cos desc, cid desc), or null on dim mismatch. */
  def topIds(a: ArrayData): ArrayData = {
    val dim = cvecs(0).length
    if (a.numElements() != dim) return null
    var sq = 0.0
    var i = 0
    while (i < dim) { val x = a.getDouble(i); sq += x * x; i += 1 }
    val qn = math.sqrt(sq)
    val m = cids.length
    val kk = math.min(k, m)
    val topCos = new Array[Double](kk)
    val topCid = new Array[Long](kk)
    var filled = 0
    var c = 0
    while (c < m) {
      val cv = cvecs(c)
      var s = 0.0
      var j = 0
      while (j < dim) { s += a.getDouble(j) * cv(j); j += 1 }
      val cos = s / (qn * cnorms(c))
      val cid = cids(c)
      // insertion position in the (cos desc, cid desc)-sorted buffer
      var p = filled
      while (p > 0 && (cos > topCos(p - 1) ||
        (cos == topCos(p - 1) && cid > topCid(p - 1)))) p -= 1
      if (p < kk) {
        val last = math.min(filled, kk - 1)
        var q = last
        while (q > p) { topCos(q) = topCos(q - 1); topCid(q) = topCid(q - 1); q -= 1 }
        topCos(p) = cos
        topCid(p) = cid
        if (filled < kk) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topCid, filled))
  }

  override protected def nullSafeEval(a: Any): Any = topIds(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.topIds($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  // content-based equality for the Array fields (see [[BandBuckets]])
  override def equals(other: Any): Boolean = other match {
    case n: NearestCentroids =>
      child == n.child && k == n.k &&
        java.util.Arrays.equals(cids, n.cids) &&
        cvecs.length == n.cvecs.length &&
        cvecs.indices.forall(i => java.util.Arrays.equals(cvecs(i), n.cvecs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(cids)),
      Integer.valueOf(cvecs.map(java.util.Arrays.hashCode).toSeq.hashCode))
}

/** Fused SQ8 quantize→dequantize against a per-dimension (min, max)
  * codebook, as ONE codegen'd expression: out[i] = mn[i] + clamp₀²⁵⁵(
  * floor((v[i] − mn[i]) / (mx[i] − mn[i]) · 255 + 0.5)) / 255 · (mx[i] −
  * mn[i]), with a zero code when the dimension is constant. The clamp
  * matters when the codebook was trained on a sample or snapshot and a
  * later-ingested vector falls outside [mn, mx]: its stored byte would
  * saturate, so the decode must too. This is the value a scored
  * SQ8 corpus vector reconstructs to — computing it fused means the query
  * path never materializes byte codes, and computing it NATIVELY means one
  * compiled loop per row: the higher-order-function formulation is
  * interpreted per element AND gets collapsed into the pairwise join
  * projection, re-decoding the corpus once per PAIR (measured: 19.6 s vs
  * <1 s at sf0.1). Codebook arrays ride along as reference objects, like
  * [[NearestCentroids]]' quantizer. Dimension mismatch → null.
  *
  * Arithmetic order matches the DuckDB oracle token for token, so decoded
  * values are bit-identical. */
case class SqDequantize(child: Expression, mn: Array[Double], mx: Array[Double])
    extends UnaryExpression {

  require(mn.length == mx.length && mn.nonEmpty, "SqDequantize: need matching non-empty codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq_dequantize"

  /** Called from both interpreted eval and generated code. */
  def decode(a: ArrayData): ArrayData = {
    val n = mn.length
    if (a.numElements() != n) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = mn(i)
      val hi = mx(i)
      // clamp to [0, 255]: a vector OUTSIDE the trained codebook range
      // (codebook from a sample/snapshot, vector ingested later) must
      // decode to what its stored byte would — the saturated endpoint —
      // not to an impossible out-of-range reconstruction
      val code = if (hi == lo) 0.0
      else math.min(255.0, math.max(0.0,
        math.floor((a.getDouble(i) - lo) / (hi - lo) * 255.0 + 0.5)))
      out(i) = lo + code / 255.0 * (hi - lo)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = decode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqDequantize", this, classOf[SqDequantize].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.decode($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SqDequantize =
    copy(child = newChild)

  // content-based equality for the Array fields (see [[BandBuckets]])
  override def equals(other: Any): Boolean = other match {
    case s: SqDequantize =>
      child == s.child && java.util.Arrays.equals(mn, s.mn) &&
        java.util.Arrays.equals(mx, s.mx)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(mn)),
      Integer.valueOf(java.util.Arrays.hashCode(mx)))
}

/** Fused product-quantization encode→reconstruct (FAISS `IndexPQ`
  * semantics), as ONE codegen'd expression: the vector is split into
  * `m` equal subspaces; each subvector is assigned its nearest codebook
  * centroid by squared L2 distance (index-order summation, ties → the
  * LOWEST centroid index — both choices an external engine can
  * replicate), and the output is the concatenation of the assigned
  * centroids' subvectors — the vector the stored m-byte PQ code decodes
  * to. Scoring against this reconstruction is asymmetric distance
  * computation, exactly like [[SqDequantize]]'s path; fusing
  * encode+decode means byte codes never materialize in the plan and the
  * whole per-row loop (m · ksub · subdim multiply-adds) is one compiled
  * call. `codebooks(s)(j)` is centroid `j` of subspace `s`, each of
  * length dims/m. Dimension mismatch → null. */
case class PqReconstruct(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqReconstruct: need >= 1 subspace, each with >= 1 centroid")
  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == subDim)),
    "PqReconstruct: every centroid must have dims/m elements")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_reconstruct"

  /** Called from both interpreted eval and generated code. */
  def reconstruct(a: ArrayData): ArrayData = {
    if (a.numElements() != m * subDim) return null
    val out = new Array[Any](m * subDim)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val cands = codebooks(s)
      var best = 0
      var bestDist = Double.PositiveInfinity
      var j = 0
      while (j < cands.length) {
        val cv = cands(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = a.getDouble(off + i) - cv(i)
          d += diff * diff
          i += 1
        }
        if (d < bestDist) { bestDist = d; best = j } // strict <: ties keep lowest j
        j += 1
      }
      val bv = cands(best)
      var i = 0
      while (i < subDim) { out(off + i) = bv(i); i += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    reconstruct(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", this, classOf[PqReconstruct].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $ref.reconstruct($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)

  // content-based equality for the codebook tensor (see [[BandBuckets]]).
  // bookShape keeps the PER-SUBSPACE boundaries in the comparison: two
  // codebooks with identical flattened centroids but different splits
  // (e.g. 2 subspaces of 4 centroids vs 4 of 2) reconstruct differently
  // and must not be CSE'd into each other.
  private lazy val bookShape: Seq[Int] = codebooks.toSeq.map(_.length)
  private lazy val flatBooks: Seq[Seq[Double]] =
    codebooks.toSeq.flatMap(_.toSeq.map(_.toSeq))
  override def equals(other: Any): Boolean = other match {
    case p: PqReconstruct =>
      child == p.child && bookShape == p.bookShape && flatBooks == p.flatBooks
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, bookShape, flatBooks)
}

object VectorFunctions {

  /** Codegen'd Σ a[i]·b[i] over two array columns (any numeric element
    * type; cast to double first so float→double widening is explicit and
    * exact). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Every LSH band bucket of `vec` under the plane matrix — one plan
    * node and one vector read regardless of plane count. */
  def bandBuckets(
      vec: Column, weights: Array[Array[Double]],
      bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(BandBuckets(
      ColumnBridge.expression(vec.cast("array<double>")), weights, bands, rowsPerBand))

  /** Top-`k` centroid ids nearest to `vec` by cosine, (cos desc, cid desc)
    * order — one plan node regardless of centroid count. */
  def nearestCentroids(
      vec: Column, cids: Array[Long], cvecs: Array[Array[Double]], k: Int): Column =
    ColumnBridge.column(NearestCentroids(
      ColumnBridge.expression(vec.cast("array<double>")), cids, cvecs, k))

  /** The SQ8 reconstruction of `vec` under the (mn, mx) codebook — one
    * plan node, one compiled loop per row. */
  def sqDequantize(vec: Column, mn: Array[Double], mx: Array[Double]): Column =
    ColumnBridge.column(SqDequantize(
      ColumnBridge.expression(vec.cast("array<double>")), mn, mx))

  /** The PQ reconstruction of `vec` under per-subspace codebooks — one
    * plan node, one compiled loop per row. */
  def pqReconstruct(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqReconstruct(
      ColumnBridge.expression(vec.cast("array<double>")), codebooks))
}
