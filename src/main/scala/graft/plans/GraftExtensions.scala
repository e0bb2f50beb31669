package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native Catalyst expression for cosine similarity of two double-array
  * columns — the custom-Expression tier of the extension ladder
  * (SURVEY.md §7.1: compose built-ins where possible, drop to a codegen
  * `Expression` where the built-ins interpret per element). The
  * higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates its lambda per element on every row; a Scala UDF boxes both
  * arrays per call. This expression generates a single fused Java loop
  * over the unsafe array data inside whole-stage codegen.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs two array<double> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y;
         |  $nx += $x * $x;
         |  $ny += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product of two double-array columns — the re-rank kernel of
  * every ANN path (brute force, LSH, IVF) and the SemDeDup pair scan,
  * which score pre-normalized unit vectors where cosine degenerates to
  * the dot. The Scala UDF form boxes both arrays into Seq[Double] per
  * candidate PAIR (the quadratic term); this expression is one fused
  * loop over the unsafe array data inside whole-stage codegen, summing
  * in the same index order as the UDF it replaces — results are
  * bit-identical, so the embedded-constant oracles are unaffected. */
case class DotArrExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_arr needs two array<double> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_arr"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotArrExpr =
    copy(left = newLeft, right = newRight)
}

/** Dense bucket-count vector of a long-array column: counts[i] = how
  * many elements equal i, for i in [0, dim) — the hashing-trick TF
  * kernel ([[graft.functions.TextFunctions.hashingTfVector]]). The
  * higher-order form (`transform(sequence(0, dim-1), i =>
  * size(filter(idx, _ === i)))`) re-scans the token array once PER
  * BUCKET — O(dim·tokens) interpreted lambda evaluations per row; this
  * expression is one O(tokens + dim) loop. Out-of-range and null
  * elements are simply not counted (exactly the filter-count
  * semantics), values are integer counts cast to double — bit-identical
  * output, so the full-precision cosine oracles are unaffected. */
case class BucketCountsExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"bucket_counts: dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_counts needs an array<bigint> arg, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bucket_counts"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val counts = new Array[Double](dim)
    var j = 0
    val n = xs.numElements()
    while (j < n) {
      if (!xs.isNullAt(j)) {
        val v = xs.getLong(j)
        if (v >= 0L && v < dim) counts(v.toInt) += 1.0
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val counts = ctx.freshName("counts")
      s"""
         |int $n = $a.numElements();
         |double[] $counts = new double[$dim];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $v = $a.getLong($j);
         |    if ($v >= 0L && $v < ${dim}L) $counts[(int) $v] += 1.0;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketCountsExpr =
    copy(child = newChild)
}

/** Hilbert curve index (2-D xy→d bit walk) of two non-negative long
  * columns — the native form of the recurrence
  * [[graft.operators.ZOrder.hilbertValue]] previously unrolled as `bits`
  * chained Projects of nested CASE trees. That unrolled form kept the
  * Catalyst tree linear, but 16 stacked Projects still cost seconds of
  * analysis per query and produce a whole-stage-codegen body far past
  * JIT-friendly size over a corpus-scale scan; this expression is one
  * `bits`-iteration integer loop — identical arithmetic, identical
  * integers (every step is exact 64-bit ops in the same order), so the
  * unrolled-CTE SQL oracle replay is unaffected. */
case class HilbertXy2dExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && 2 * bits <= 62,
    s"hilbert_xy2d: $bits bits per axis = ${2 * bits} index bits (max 62)")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.LongType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_xy2d needs two bigint args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hilbert_xy2d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    val n1 = (1L << bits) - 1L
    var h = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      h += (s * s) * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) n1 - y else y
        val ny = if (rx == 1L) n1 - x else x
        x = nx; y = ny
      }
      i -= 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry"); val nx = ctx.freshName("nx")
      val n1 = (1L << bits) - 1L
      s"""
         |long $x = $a; long $y = $b; long $h = 0L;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $s = 1L << $i;
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $h += ($s * $s) * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $nx = ($rx == 1L) ? (${n1}L - $y) : $y;
         |    $y = ($rx == 1L) ? (${n1}L - $x) : $x;
         |    $x = $nx;
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertXy2dExpr =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two SORTED distinct long arrays by merge-count —
  * the verification kernel of the MinHash dedup path, as a codegen
  * expression (the UDF form boxes both arrays per candidate pair). */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted needs two array<bigint> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val union = ctx.freshName("union")
      s"""
         |int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |int $union = $na + $nb - $inter;
         |${ev.value} = $union == 0 ? 1.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign-bit sketch as a native expression: one fused
  * loop over the unsafe vector data against a codegen-referenced plane
  * matrix (closure state rides along as a reference object — the
  * registry/literal route would re-materialize the matrix per row). The
  * UDF form boxed the vector into Seq[Double] per row, and the pure
  * expression form (bits·dim element_at terms) overflows the 64KB
  * generated-method limit; this keeps whole-stage codegen AND the
  * closure matrix. Bit order and arithmetic match the UDF exactly.
  *
  * Plane state is `Seq[Seq[Double]]` (not `Array`): case-class equality
  * on Array fields is by reference, which would make two semantically
  * identical sketch expressions never compare equal and defeat
  * common-subexpression elimination and exchange reuse. */
case class HyperplaneSketchExpr(child: Expression,
    planes: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_sketch"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val planes = planeArr
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var dot = 0.0
      var d = 0
      val n = math.min(pl.length, v.numElements())
      while (d < n) { dot += v.getDouble(d) * pl(d); d += 1 }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pls = ctx.addReferenceObj("planes", planeArr, "double[][]")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val pl = ctx.freshName("pl")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $pls.length; $p++) {
         |  double[] $pl = $pls[$p];
         |  double $dot = 0.0;
         |  int $n = java.lang.Math.min($pl.length, $v.numElements());
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $v.getDouble($d) * $pl[$d];
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketchExpr =
    copy(child = newChild)
}

/** k nearest quantizer cells (IVF assignment / probe set) as a native
  * expression over a codegen-referenced centroid matrix. Output is the
  * cell indices ordered by ascending squared distance, ties to the
  * lower index — EXACTLY the stable `sortBy(distance).take(k)` of the
  * UDF it replaces (successive strict-minimum selection reproduces a
  * stable ascending order). */
case class NearestCellsExpr(child: Expression,
    centroids: Seq[Seq[Double]], k: Int)
    extends UnaryExpression {

  @transient private lazy val centroidArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  private val kk = math.min(k, centroids.length)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val centroids = centroidArr
    val n = centroids.length
    val dist = new Array[Double](n)
    var c = 0
    while (c < n) {
      val ctr = centroids(c)
      var s = 0.0
      var i = 0
      val m = math.min(ctr.length, v.numElements())
      while (i < m) { val t = v.getDouble(i) - ctr(i); s += t * t; i += 1 }
      dist(c) = s
      c += 1
    }
    val out = new Array[Int](kk)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < kk) {
      var best = -1
      var bestD = Double.MaxValue
      var c2 = 0
      while (c2 < n) {
        if (!used(c2) && dist(c2) < bestD) { bestD = dist(c2); best = c2 }
        c2 += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ctrs = ctx.addReferenceObj("centroids", centroidArr, "double[][]")
      val dist = ctx.freshName("dist")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c2 = ctx.freshName("c2")
      val ctr = ctx.freshName("ctr")
      s"""
         |double[] $dist = new double[$ctrs.length];
         |for (int $c = 0; $c < $ctrs.length; $c++) {
         |  double[] $ctr = $ctrs[$c];
         |  double $s = 0.0;
         |  int $m = java.lang.Math.min($ctr.length, $v.numElements());
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $t = $v.getDouble($i) - $ctr[$i];
         |    $s += $t * $t;
         |  }
         |  $dist[$c] = $s;
         |}
         |boolean[] $used = new boolean[$ctrs.length];
         |int[] $out = new int[$kk];
         |for (int $j = 0; $j < $kk; $j++) {
         |  int $best = -1;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c2 = 0; $c2 < $ctrs.length; $c2++) {
         |    if (!$used[$c2] && $dist[$c2] < $bestD) { $bestD = $dist[$c2]; $best = $c2; }
         |  }
         |  $used[$best] = true;
         |  $out[$j] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

/** Product-quantization encoder: argmin code per subspace (Jégou, Douze,
  * Schmid 2011, "Product quantization for nearest neighbor search",
  * IEEE TPAMI). Subspace s covers dims [s·dsub, (s+1)·dsub); output is
  * the m-code array. Same first-index-wins tie rule and index-order
  * squared-L2 accumulation as [[NearestCellsExpr]] — the q_similarity_pq
  * oracle replays both choices exactly. `books` is Seq-shaped (not
  * Array) so equal-codebook expressions compare equal for CSE. */
case class PqEncodeExpr(child: Expression,
    books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bs = bookArr
    val out = new Array[Int](bs.length)
    var s = 0
    while (s < bs.length) {
      val book = bs(s)
      val off = s * book(0).length
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < book.length) {
        val ctr = book(c); var d = 0.0; var i = 0
        val m = math.min(ctr.length, math.max(0, v.numElements() - off))
        while (i < m) { val t = v.getDouble(off + i) - ctr(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("books", bookArr, "double[][][]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val book = ctx.freshName("book")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      s"""
         |int[] $out = new int[$bs.length];
         |for (int $s = 0; $s < $bs.length; $s++) {
         |  double[][] $book = $bs[$s];
         |  int $off = $s * $book[0].length;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $ctr = $book[$c];
         |    double $d = 0.0;
         |    int $m = java.lang.Math.min($ctr.length,
         |      java.lang.Math.max(0, $v.numElements() - $off));
         |    for (int $i = 0; $i < $m; $i++) {
         |      double $t = $v.getDouble($off + $i) - $ctr[$i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Query-side PQ distance table (the "asymmetric distance computation"
  * LUT): squared L2 from each query subvector to every codebook entry,
  * flattened as lut[s·ksub + c]. Computed ONCE per query row (queries ≪
  * corpus); every corpus pair then scores with m lookups via
  * [[PqAdcExpr]] instead of dim multiplies. */
case class PqLutExpr(child: Expression,
    books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bs = bookArr
    val ksub = bs(0).length
    val out = new Array[Double](bs.length * ksub)
    var s = 0
    while (s < bs.length) {
      val book = bs(s)
      val off = s * book(0).length
      var c = 0
      while (c < book.length) {
        val ctr = book(c); var d = 0.0; var i = 0
        val m = math.min(ctr.length, math.max(0, v.numElements() - off))
        while (i < m) { val t = v.getDouble(off + i) - ctr(i); d += t * t; i += 1 }
        out(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("books", bookArr, "double[][][]")
      val out = ctx.freshName("out")
      val ksub = ctx.freshName("ksub")
      val s = ctx.freshName("s")
      val book = ctx.freshName("book")
      val off = ctx.freshName("off")
      val c = ctx.freshName("c")
      val ctr = ctx.freshName("ctr")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      s"""
         |int $ksub = $bs[0].length;
         |double[] $out = new double[$bs.length * $ksub];
         |for (int $s = 0; $s < $bs.length; $s++) {
         |  double[][] $book = $bs[$s];
         |  int $off = $s * $book[0].length;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $ctr = $book[$c];
         |    double $d = 0.0;
         |    int $m = java.lang.Math.min($ctr.length,
         |      java.lang.Math.max(0, $v.numElements() - $off));
         |    for (int $i = 0; $i < $m; $i++) {
         |      double $t = $v.getDouble($off + $i) - $ctr[$i];
         |      $d += $t * $t;
         |    }
         |    $out[$s * $ksub + $c] = $d;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** Sign-bit packing for binary quantization: bit b of word w is set iff
  * vec[w·64 + b] ≥ 0 — a d-dim vector compresses to ⌈d/64⌉ longs (ONE
  * long at d=64: 64× under float32). Pure integer output, so the
  * q_similarity_bq oracle replays packing AND the Hamming ranking
  * bit-exactly with no embedded constants and no float margins. */
case class SignPackExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_pack needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "sign_pack"
  private val nwords = (dim + 63) / 64

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](nwords)
    val n = math.min(dim, v.numElements())
    var i = 0
    while (i < n) {
      if (v.getDouble(i) >= 0.0) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |long[] $out = new long[$nwords];
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.getDouble($i) >= 0.0) $out[$i >>> 6] |= (1L << ($i & 63));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPackExpr =
    copy(child = newChild)
}

/** Per-pair asymmetric PQ distance: Σ_s lut[s·ksub + codes[s]] — the hot
  * loop of a compressed-domain scan (m lookups per pair; summation in
  * subspace order, matching [[PqLutExpr]]'s layout, so two rows with
  * equal codes score bit-identically). */
case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc needs (array<int> codes, array<double> lut), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var d = 0.0
    var s = 0
    val m = codes.numElements()
    while (s < m) {
      val idx = s * ksub + codes.getInt(s)
      if (idx < lut.numElements()) d += lut.getDouble(idx)
      s += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      s"""
         |double $d = 0.0;
         |for (int $s = 0; $s < $a.numElements(); $s++) {
         |  int $idx = $s * $ksub + $a.getInt($s);
         |  if ($idx < $b.numElements()) $d += $b.getDouble($idx);
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (UAX #15) of a string column through the JDK's
  * `java.text.Normalizer` — the canonical-form contract every hash-keyed
  * curation step silently assumes (CCNet normalizes before hashing; a
  * decomposed `e`+U+0301 and a composed `é` are different bytes, so the
  * same sentence fingerprints, shingles, and dedups differently until
  * NFC makes byte equality mean glyph equality). No Spark built-in
  * expresses it, and a Scala UDF crosses the UTF8String↔String boundary
  * OUTSIDE codegen per row; this expression stays inside whole-stage
  * codegen and takes the `isNormalized` fast path first — real web text
  * is overwhelmingly already NFC, and the quick-check scan then skips
  * the normalize allocation entirely, returning the input UTF8String
  * untouched.
  *
  * `form` ∈ NFC | NFD | NFKC | NFKD, validated at analysis time and
  * baked into the generated code as a constant. */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!UnicodeNormalizeExpr.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_norm form must be one of ${UnicodeNormalizeExpr.Forms.mkString("/")}, got '$form'")
    else child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_norm needs a string arg, got ${other.simpleString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "unicode_norm"

  @transient private lazy val normForm = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, normForm)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $v.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.$form)
         |  ? $v
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

/** RFC 9309 robots.txt gate as a native expression:
  * `robots_allowed(robotsTxt, path)` for the crawler product token
  * `agent` (an analysis-time constant baked into the generated code —
  * one pipeline crawls as one agent). The parse/group-select/
  * longest-match walk lives in [[graft.functions.Robots.allowed]]
  * (pure JDK, no regex) and is invoked directly from whole-stage
  * codegen — a Scala UDF would re-cross the UTF8String boundary
  * outside codegen per row. Null robots or null path follow the
  * null-in-null-out contract (a crawl frame with no robots snapshot
  * should coalesce to '' — the protocol is opt-out, so empty means
  * allowed). */
case class RobotsAllowedExpr(left: Expression, right: Expression,
    agent: String) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!agent.matches("[A-Za-z0-9_./-]+"))
      TypeCheckResult.TypeCheckFailure(
        s"robots_allowed agent must be a product token ([A-Za-z0-9_./-]+), got '$agent'")
    else (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed needs (string robotsTxt, string path), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "robots_allowed"

  override protected def nullSafeEval(robots: Any, path: Any): Any =
    graft.functions.Robots.allowed(robots.toString, path.toString, agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, p) => {
      // the agent charset is validated at analysis; it contains no
      // characters needing Java string escaping
      s"""${ev.value} = graft.functions.Robots.allowed(
         |  $r.toString(), $p.toString(), "$agent");
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RobotsAllowedExpr =
    copy(left = newLeft, right = newRight)
}

/** `SparkSessionExtensions` entry point: registers graft's native
  * expressions. Install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `GraftExtensions.register(spark)` on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.jaccardSortedDescriptor)
    ext.injectFunction(GraftExtensions.dotArrDescriptor)
    ext.injectFunction(GraftExtensions.unicodeNormDescriptor)
    ext.injectFunction(GraftExtensions.robotsAllowedDescriptor)
  }
}

object GraftExtensions {
  private[graft] val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim(a, b) takes two array<double> columns")
      CosineSimExpr(children.head, children(1))
    })

  private[graft] val dotArrDescriptor = (
    FunctionIdentifier("dot_arr"),
    new ExpressionInfo(classOf[DotArrExpr].getName, "dot_arr"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_arr(a, b) takes two array<double> columns")
      DotArrExpr(children.head, children(1))
    })

  private[graft] val jaccardSortedDescriptor = (
    FunctionIdentifier("jaccard_sorted"),
    new ExpressionInfo(classOf[JaccardSortedExpr].getName, "jaccard_sorted"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "jaccard_sorted(a, b) takes two array<bigint> columns")
      JaccardSortedExpr(children.head, children(1))
    })

  private[graft] val unicodeNormDescriptor = (
    FunctionIdentifier("unicode_norm"),
    new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "unicode_norm"),
    (children: Seq[Expression]) => {
      require(children.size == 1 || children.size == 2,
        "unicode_norm(s[, form]) takes a string column and an optional literal form")
      val form = children.lift(1).map {
        case lit if lit.foldable && lit.dataType.isInstanceOf[StringType] =>
          String.valueOf(lit.eval(null))
        case other => throw new IllegalArgumentException(
          s"unicode_norm form must be a string literal, got $other")
      }.getOrElse("NFC")
      UnicodeNormalizeExpr(children.head, form)
    })

  private[graft] val hilbertXy2dDescriptor = (
    FunctionIdentifier("hilbert_xy2d"),
    new ExpressionInfo(classOf[HilbertXy2dExpr].getName, "hilbert_xy2d"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "hilbert_xy2d(x, y, bits) takes two bigint columns and a literal bit width")
      val bits = children(2) match {
        case lit if lit.foldable &&
            lit.dataType == org.apache.spark.sql.types.IntegerType =>
          lit.eval(null).asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"hilbert_xy2d bits must be an int literal, got $other")
      }
      HilbertXy2dExpr(children.head, children(1), bits)
    })

  private[graft] val robotsAllowedDescriptor = (
    FunctionIdentifier("robots_allowed"),
    new ExpressionInfo(classOf[RobotsAllowedExpr].getName, "robots_allowed"),
    (children: Seq[Expression]) => {
      require(children.size == 2 || children.size == 3,
        "robots_allowed(robotsTxt, path[, agent]) takes two string columns " +
          "and an optional literal agent token")
      val agent = children.lift(2).map {
        case lit if lit.foldable && lit.dataType.isInstanceOf[StringType] =>
          String.valueOf(lit.eval(null))
        case other => throw new IllegalArgumentException(
          s"robots_allowed agent must be a string literal, got $other")
      }.getOrElse("graftbot")
      RobotsAllowedExpr(children.head, children(1), agent)
    })

  /** Column-level accessors — resolve through the function registry, so
    * `register(spark)` (or the extensions config) must have run. */
  def cosineSim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  def jaccardSorted(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("jaccard_sorted", a, b)
  def dotArr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("dot_arr", a, b)
  def hilbertXy2d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("hilbert_xy2d", x, y,
      org.apache.spark.sql.functions.lit(bits))

  /** Register on an already-built session (local/test convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(cosineSimDescriptor, jaccardSortedDescriptor, dotArrDescriptor,
        unicodeNormDescriptor, robotsAllowedDescriptor,
        hilbertXy2dDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
  }
}
