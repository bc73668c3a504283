package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector hot path.
 *
 * Rationale (SURVEY.md §2.9 note): Spark's higher-order array lambdas
 * (`aggregate`/`zip_with`/`transform`) are CodegenFallback — interpreted —
 * and statically unrolling a 64-dim dot product into `element_at` chains
 * produces ~600-node expression trees that bloat generated code (17 MB
 * task binaries measured) and janino compile time. A custom `Expression`
 * with a compact `doGenCode` loop is the idiomatic escape hatch: tiny
 * generated code, whole-stage codegen participation, same semantics.
 *
 * Element access assumes non-null float/double array elements (embedding
 * vectors); a null/short array yields the dot over the common prefix.
 */
object VectorExpressions {

  private def elemAccessor(dt: DataType, arr: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _)  => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case _ => throw new IllegalArgumentException(s"not a float/double array: $dt")
    }

  private def elemAt(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case ArrayType(FloatType, _)  => arr.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => arr.getDouble(i)
    case _ => throw new IllegalArgumentException(s"not a float/double array: $dt")
  }

  /**
   * cosine(a, b) in one fused loop (dot, |a|, |b| together); 0.0 when
   * either norm is zero. Null-safe: null if either input array is null.
   */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xv = elemAt(left.dataType, x, i)
        val yv = elemAt(right.dataType, y, i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom > 0) dot / denom else 0.0
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = ${elemAccessor(left.dataType, a, i)};
           |  double $yv = ${elemAccessor(right.dataType, b, i)};
           |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
           |}
           |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
           |${ev.value} = $denom > 0 ? $dot / $denom : 0.0;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot(a, b) in one loop. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var i = 0
      while (i < n) {
        dot += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i)
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (${elemAccessor(left.dataType, a, i)})
           |    * (${elemAccessor(right.dataType, b, i)});
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Spark's `round(x, 4)` for doubles, verbatim (BigDecimal.valueOf →
    * HALF_UP → toDouble) — [[TopCells]] must round exactly as the
    * `round()` the literal-tree form it replaces used, or 4dp cosine
    * ties would break differently. Public: called from generated code. */
  def round4(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /**
   * Top-n centroid cells of a vector by (round(cos, 4) DESC, cell ASC)
   * in ONE fused pass — the codegen-healthy replacement for the
   * `array_max(array(struct(round(cosine(v, lit₁)), …)))` literal trees
   * the IVF/k-means family previously built per centroid.
   *
   * The literal-tree form is the Janino 64 KB anti-pattern
   * ([[SignedProject]]'s doc): 16 inlined 64-float literals blow the
   * generated method past the codegen limits and the WHOLE stage
   * silently falls back to interpreted eval (measured 65 µs/row for a
   * 16-cell assignment; and when Catalyst copies the tree into a join
   * stage, every operator in that stage de-codegens with it). Here the
   * centroid matrix and cell ids ride the references array — compact
   * generated code, two nested loops, inside whole-stage codegen.
   *
   * Arithmetic is bit-identical to the tree it replaces: per-cell
   * cosine in [[CosineSimilarity]]'s exact operation order (float
   * elements promoted per element; query norm recomputed per the same
   * accumulation sequence), then [[round4]] — so every oracle that
   * replays `ROUND(list_cosine_similarity(...), 4)` still matches.
   *
   * @return `array<struct<cell: long, cos: double>>`, best first
   */
  private val TopCellsType: DataType = ArrayType(
    StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  /** Interpreted TopCells kernel, shared by the references-array and
    * broadcast-backed forms (identical arithmetic by construction). */
  private def topCellsEval(dt: DataType, input: Any,
      cents: Array[Array[Double]], cellIds: Array[Long], n: Int): Any = {
    val v = input.asInstanceOf[ArrayData]
    val bc = Array.fill(n)(java.lang.Double.NEGATIVE_INFINITY)
    val bi = new Array[Long](n)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val dim = math.min(v.numElements(), cent.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < dim) {
        val xv = elemAt(dt, v, i)
        val yv = cent(i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      val cos = round4(if (denom > 0) dot / denom else 0.0)
      val id = cellIds(c)
      // insertion by (cos DESC, id ASC)
      var p = n
      while (p > 0 && (cos > bc(p - 1) ||
          (cos == bc(p - 1) && id < bi(p - 1)))) p -= 1
      if (p < n) {
        var q = n - 1
        while (q > p) { bc(q) = bc(q - 1); bi(q) = bi(q - 1); q -= 1 }
        bc(p) = cos; bi(p) = id
      }
      c += 1
    }
    val rows = new Array[AnyRef](n)
    var t = 0
    while (t < n) {
      rows(t) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](bi(t), bc(t)))
      t += 1
    }
    new GenericArrayData(rows)
  }

  /** Generated TopCells kernel body; `m`/`ids` are the Java accessor
    * strings for the centroid matrix and cell ids (a references-array
    * slot or a broadcast-initialized field — same generated loop). */
  private def topCellsCode(ctx: CodegenContext, ev: ExprCode, v: String,
      m: String, ids: String, n: Int, dt: DataType): String = {
    val bc = ctx.freshName("bc"); val bi = ctx.freshName("bi")
    val c = ctx.freshName("c"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny"); val dim = ctx.freshName("dim")
    val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
    val denom = ctx.freshName("denom"); val cos = ctx.freshName("cos")
    val id = ctx.freshName("id"); val p = ctx.freshName("p")
    val q = ctx.freshName("q"); val rows = ctx.freshName("rows")
    val t = ctx.freshName("t")
    s"""
       |double[] $bc = new double[$n];
       |long[] $bi = new long[$n];
       |java.util.Arrays.fill($bc, Double.NEGATIVE_INFINITY);
       |for (int $c = 0; $c < $m.length; $c++) {
       |  int $dim = java.lang.Math.min($v.numElements(), $m[$c].length);
       |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
       |  for (int $i = 0; $i < $dim; $i++) {
       |    double $xv = ${elemAccessor(dt, v, i)};
       |    double $yv = $m[$c][$i];
       |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
       |  }
       |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
       |  double $cos = graft.functions.VectorExpressions.round4(
       |    $denom > 0 ? $dot / $denom : 0.0);
       |  long $id = $ids[$c];
       |  int $p = $n;
       |  while ($p > 0 && ($cos > $bc[$p - 1] ||
       |      ($cos == $bc[$p - 1] && $id < $bi[$p - 1]))) $p--;
       |  if ($p < $n) {
       |    for (int $q = $n - 1; $q > $p; $q--) {
       |      $bc[$q] = $bc[$q - 1]; $bi[$q] = $bi[$q - 1];
       |    }
       |    $bc[$p] = $cos; $bi[$p] = $id;
       |  }
       |}
       |Object[] $rows = new Object[$n];
       |for (int $t = 0; $t < $n; $t++) {
       |  $rows[$t] = new org.apache.spark.sql.catalyst.expressions
       |    .GenericInternalRow(new Object[]{$bi[$t], $bc[$t]});
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util
       |  .GenericArrayData($rows);
     """.stripMargin
  }

  case class TopCells(child: Expression, cents: Array[Array[Double]],
      cellIds: Array[Long], n: Int)
      extends UnaryExpression {
    require(cents.nonEmpty && cents.length == cellIds.length,
      "one id per centroid")
    require(n >= 1 && n <= cents.length, s"n in [1,${cents.length}]")

    override def dataType: DataType = TopCellsType
    override def prettyName: String = "graft_top_cells"

    override protected def nullSafeEval(input: Any): Any =
      topCellsEval(child.dataType, input, cents, cellIds, n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      val ids = ctx.addReferenceObj("cellIds", cellIds, "long[]")
      nullSafeCodeGen(ctx, ev,
        v => topCellsCode(ctx, ev, v, m, ids, n, child.dataType))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * [[TopCells]] with the centroid matrix riding a BROADCAST VARIABLE
   * instead of the expression's references array — for production IVF
   * scale (10⁴–10⁵ cells × high dims), where a references-array matrix
   * is re-serialized into EVERY task binary while a broadcast ships
   * once per executor via the torrent protocol. Arithmetic is the
   * [[TopCells]] kernel verbatim (shared eval + codegen bodies); the
   * generated class fetches the matrix once in a lazily-initialized
   * field, so the per-row loop is identical. Wrapper [[topCells]]
   * auto-selects this form above [[BroadcastElemThreshold]] elements.
   */
  case class TopCellsBc(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[
        (Array[Array[Double]], Array[Long])], n: Int)
      extends UnaryExpression {
    require(n >= 1, s"n must be >= 1, got $n")

    @transient private lazy val mats = bc.value

    override def dataType: DataType = TopCellsType
    override def prettyName: String = "graft_top_cells_bc"

    override protected def nullSafeEval(input: Any): Any =
      topCellsEval(child.dataType, input, mats._1, mats._2, n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bcCents", bc,
        "org.apache.spark.broadcast.Broadcast")
      val m = ctx.addMutableState("double[][]", "tcCents",
        v => s"$v = (double[][]) ((scala.Tuple2) $bcRef.value())._1();")
      val ids = ctx.addMutableState("long[]", "tcIds",
        v => s"$v = (long[]) ((scala.Tuple2) $bcRef.value())._2();")
      nullSafeCodeGen(ctx, ev,
        v => topCellsCode(ctx, ev, v, m, ids, n, child.dataType))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * Product-quantization encode, ALL m subspaces in one pass: for each
   * subspace j, the argbest code over the sub-codebook — by rounded
   * raw dot (maximize; the global-codebook PQ form) or by rounded
   * squared-L2 `rr − 2·dot + cc` (minimize; the residual IVF-PQ form).
   * Ties go to the LOWEST code (strict comparison over ascending
   * codes), matching the array_max/array_min literal trees this
   * replaces. The codebook (and precomputed codeword norms for the L2
   * form) ride the references array — compact generated code, no
   * per-subspace union layout, no literal trees, no Janino hazard.
   *
   * Arithmetic parity with the replaced form: subvector element j·sd+i
   * promotes per element exactly as `slice` + the fused-loop dot did;
   * `rr` accumulates over the same subvector order; the score is
   * `((rr − (2·dot)) + cc)` in that association order; [[round4]] is
   * Spark's `round(x, 4)` verbatim.
   *
   * @return `array<int>` of length m — subspace j's chosen code
   */
  /** Interpreted PQ-encode kernel, shared by the references-array and
    * broadcast-backed forms. */
  private def pqEncodeEval(dt: DataType, input: Any,
      codes: Array[Array[Array[Double]]], ccNorms: Array[Array[Double]],
      l2: Boolean, m: Int, sd: Int): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sd
      val dim = math.max(0, math.min(v.numElements() - off, sd))
      var rr = 0.0
      if (l2) {
        var i = 0
        while (i < dim) {
          val xv = elemAt(dt, v, off + i)
          rr += xv * xv; i += 1
        }
      }
      var bs = if (l2) java.lang.Double.POSITIVE_INFINITY
        else java.lang.Double.NEGATIVE_INFINITY
      var bcode = 0
      val sub = codes(j)
      var c = 0
      while (c < sub.length) {
        val cw = sub(c)
        var dot = 0.0; var i = 0
        val d2 = math.min(dim, cw.length)
        while (i < d2) {
          dot += elemAt(dt, v, off + i) * cw(i); i += 1
        }
        val s = round4(
          if (l2) rr - 2.0 * dot + ccNorms(j)(c) else dot)
        if (if (l2) s < bs else s > bs) { bs = s; bcode = c }
        c += 1
      }
      out(j) = bcode
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Generated PQ-encode kernel body; `cbRef`/`ccRef` are Java accessor
    * strings (references-array slots or broadcast-initialized fields). */
  private def pqEncodeCode(ctx: CodegenContext, ev: ExprCode, v: String,
      cbRef: String, ccRef: String, l2: Boolean, m: Int, sd: Int,
      dt: DataType): String = {
    val out = ctx.freshName("out"); val j = ctx.freshName("j")
    val off = ctx.freshName("off"); val dim = ctx.freshName("dim")
    val rr = ctx.freshName("rr"); val bs = ctx.freshName("bs")
    val bcode = ctx.freshName("bcode"); val c = ctx.freshName("c")
    val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    val s = ctx.freshName("s"); val d2 = ctx.freshName("d2")
    val xv = ctx.freshName("xv")
    val offI = s"$off + $i"
    val better = if (l2) s"$s < $bs" else s"$s > $bs"
    val init = if (l2) "Double.POSITIVE_INFINITY"
      else "Double.NEGATIVE_INFINITY"
    val rrLoop = if (l2)
      s"""for (int $i = 0; $i < $dim; $i++) {
         |  double $xv = ${elemAccessor(dt, v, offI)};
         |  $rr += $xv * $xv;
         |}""".stripMargin else ""
    val score = if (l2) s"$rr - 2.0 * $dot + $ccRef[$j][$c]" else dot
    s"""
       |int[] $out = new int[$m];
       |for (int $j = 0; $j < $m; $j++) {
       |  int $off = $j * $sd;
       |  int $dim = java.lang.Math.max(0,
       |    java.lang.Math.min($v.numElements() - $off, $sd));
       |  double $rr = 0.0;
       |  $rrLoop
       |  double $bs = $init;
       |  int $bcode = 0;
       |  for (int $c = 0; $c < $cbRef[$j].length; $c++) {
       |    double $dot = 0.0;
       |    int $d2 = java.lang.Math.min($dim, $cbRef[$j][$c].length);
       |    for (int $i = 0; $i < $d2; $i++) {
       |      $dot += ${elemAccessor(dt, v, offI)}
       |        * $cbRef[$j][$c][$i];
       |    }
       |    double $s = graft.functions.VectorExpressions.round4($score);
       |    if ($better) { $bs = $s; $bcode = $c; }
       |  }
       |  $out[$j] = $bcode;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util
       |  .GenericArrayData($out);
     """.stripMargin
  }

  case class PqEncode(child: Expression,
      codes: Array[Array[Array[Double]]], ccNorms: Array[Array[Double]],
      l2: Boolean)
      extends UnaryExpression {
    require(codes.nonEmpty && codes.forall(_.nonEmpty), "m x cb codebook")
    require(!l2 || (ccNorms != null && ccNorms.length == codes.length),
      "L2 mode needs one norm per codeword")

    private val m = codes.length
    private val sd = codes(0)(0).length

    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_encode"

    override protected def nullSafeEval(input: Any): Any =
      pqEncodeEval(child.dataType, input, codes, ccNorms, l2, m, sd)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("codes", codes, "double[][][]")
      val ccRef = if (l2) ctx.addReferenceObj("ccNorms", ccNorms,
        "double[][]") else "null"
      nullSafeCodeGen(ctx, ev,
        v => pqEncodeCode(ctx, ev, v, cbRef, ccRef, l2, m, sd,
          child.dataType))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * [[PqEncode]] with the codebook (and codeword norms) riding a
   * BROADCAST VARIABLE — the [[TopCellsBc]] rationale applied to the PQ
   * encode: a production m×256×sd codebook re-serialized per task binary
   * becomes one torrent-shipped broadcast fetched once per generated
   * class. Same kernel verbatim; wrapper [[pqEncode]] auto-selects this
   * form above [[BroadcastElemThreshold]] elements.
   */
  case class PqEncodeBc(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[
        (Array[Array[Array[Double]]], Array[Array[Double]])],
      l2: Boolean, m: Int, sd: Int)
      extends UnaryExpression {
    require(m >= 1 && sd >= 1, s"need m,sd >= 1, got ($m, $sd)")

    @transient private lazy val mats = bc.value

    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_encode_bc"

    override protected def nullSafeEval(input: Any): Any =
      pqEncodeEval(child.dataType, input, mats._1, mats._2, l2, m, sd)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bcCodes", bc,
        "org.apache.spark.broadcast.Broadcast")
      val cbRef = ctx.addMutableState("double[][][]", "pqCodes",
        v => s"$v = (double[][][]) ((scala.Tuple2) $bcRef.value())._1();")
      val ccRef = if (l2) ctx.addMutableState("double[][]", "pqNorms",
        v => s"$v = (double[][]) ((scala.Tuple2) $bcRef.value())._2();")
        else "null"
      nullSafeCodeGen(ctx, ev,
        v => pqEncodeCode(ctx, ev, v, cbRef, ccRef, l2, m, sd,
          child.dataType))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * All multi-table LSH sign-bit keys of a vector in ONE pass over the
   * dimensions: returns `array<int>` with one bucket key per table. The
   * plane matrix (numTables × numPlanes rows, each of length dim) rides in
   * the references array — constant per query, no literal tree.
   */
  case class LshKeys(child: Expression, planes: Array[Array[Double]],
      numTables: Int, numPlanes: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_lsh_keys"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = math.min(v.numElements(), planes(0).length)
      val acc = new Array[Double](planes.length)
      var d = 0
      while (d < dim) {
        val x = elemAt(child.dataType, v, d)
        var r = 0
        while (r < planes.length) { acc(r) += x * planes(r)(d); r += 1 }
        d += 1
      }
      val keys = new Array[Int](numTables)
      var r = 0
      while (r < planes.length) {
        if (acc(r) >= 0) keys(r / numPlanes) |= (1 << (r % numPlanes))
        r += 1
      }
      new GenericArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, v => {
        val acc = ctx.freshName("acc"); val keys = ctx.freshName("keys")
        val d = ctx.freshName("d"); val r = ctx.freshName("r")
        val x = ctx.freshName("x"); val dim = ctx.freshName("dim")
        s"""
           |int $dim = java.lang.Math.min($v.numElements(), $m[0].length);
           |double[] $acc = new double[$m.length];
           |for (int $d = 0; $d < $dim; $d++) {
           |  double $x = ${elemAccessor(child.dataType, v, d)};
           |  for (int $r = 0; $r < $m.length; $r++) {
           |    $acc[$r] += $x * $m[$r][$d];
           |  }
           |}
           |int[] $keys = new int[$numTables];
           |for (int $r = 0; $r < $m.length; $r++) {
           |  if ($acc[$r] >= 0) $keys[$r / $numPlanes] |= (1 << ($r % $numPlanes));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /**
   * Signed-projection matrix multiply for Johnson–Lindenstrauss
   * dimensionality reduction: `out[i] = (Σ_j signs[i][j]·v[j]) /
   * sqrt(outDim)` with a ±1 sign matrix riding the references array
   * (constant per query — NO literal tree, and no per-output-dim
   * unrolled projection, which is exactly the Janino 64 KB shape that
   * broke the PQ encode at larger m×k). One fused loop over the input
   * dimensions, all output dims accumulated together, inside
   * whole-stage codegen.
   */
  case class SignedProject(child: Expression, signs: Array[Array[Double]])
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_signed_project"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = math.min(v.numElements(), signs(0).length)
      val acc = new Array[Double](signs.length)
      var d = 0
      while (d < dim) {
        val x = elemAt(child.dataType, v, d)
        var r = 0
        while (r < signs.length) { acc(r) += x * signs(r)(d); r += 1 }
        d += 1
      }
      val scale = math.sqrt(signs.length.toDouble)
      var r = 0
      while (r < acc.length) { acc(r) = acc(r) / scale; r += 1 }
      new GenericArrayData(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("signs", signs, "double[][]")
      nullSafeCodeGen(ctx, ev, v => {
        val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
        val r = ctx.freshName("r"); val x = ctx.freshName("x")
        val dim = ctx.freshName("dim"); val scale = ctx.freshName("scale")
        s"""
           |int $dim = java.lang.Math.min($v.numElements(), $m[0].length);
           |double[] $acc = new double[$m.length];
           |for (int $d = 0; $d < $dim; $d++) {
           |  double $x = ${elemAccessor(child.dataType, v, d)};
           |  for (int $r = 0; $r < $m.length; $r++) {
           |    $acc[$r] += $x * $m[$r][$d];
           |  }
           |}
           |double $scale = java.lang.Math.sqrt((double) $m.length);
           |for (int $r = 0; $r < $m.length; $r++) {
           |  $acc[$r] = $acc[$r] / $scale;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper for [[SignedProject]]. */
  def signedProject(vec: Column, signs: Array[Array[Double]]): Column = {
    require(signs.nonEmpty && signs.forall(_.length == signs(0).length),
      "sign matrix must be rectangular and non-empty")
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      SignedProject(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec), signs))
  }

  /**
   * |a ∩ b| for two SORTED long arrays via a linear merge walk — no
   * per-row hash-set allocation (array_intersect builds one per side per
   * row, which dominated the n-gram Jaccard verify step at 400k+
   * candidate pairs). Inputs must be sorted ascending and duplicate-free
   * (collect_set + sort_array upstream); output is the intersection
   * cardinality as int.
   */
  case class SortedLongIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_sorted_intersect_count"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var n = 0
      while (i < x.numElements() && j < y.numElements()) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { n += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $i = 0, $j = 0, $n = 0;
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  long $xv = $a.getLong($i);
           |  long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $n++; $i++; $j++; }
           |  else if ($xv < $yv) $i++;
           |  else $j++;
           |}
           |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Count of positions where two equal-length long arrays agree — the
    * MinHash Jaccard estimator's inner loop (`zip_with` + `aggregate`
    * HOFs are CodegenFallback and dominated the candidate-verify stage). */
  case class EqualComponentCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_equal_components"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val m = math.min(x.numElements(), y.numElements())
      var i = 0; var n = 0
      while (i < m) {
        if (x.getLong(i) == y.getLong(i)) n += 1
        i += 1
      }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        s"""
           |int $m = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $n = 0;
           |for (int $i = 0; $i < $m; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $n++;
           |}
           |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ------------------------------------------------------------------
  // Column wrappers
  // ------------------------------------------------------------------

  def equalComponentCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      EqualComponentCount(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      SortedLongIntersectCount(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(b)))

  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      CosineSimilarity(org.apache.spark.sql.graftbridge.ColumnBridge.expr(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(b)))

  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      DotProduct(org.apache.spark.sql.graftbridge.ColumnBridge.expr(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(b)))

  /** Above this many matrix ELEMENTS (doubles), [[topCells]]/[[pqEncode]]
    * switch from the references-array expression to the broadcast-backed
    * one: 64k doubles ≈ 512 KB — harmless once per plan in a references
    * array, but a task binary carries the references of EVERY expression
    * in the stage and re-ships per task, so production-scale centroid
    * sets (10⁴ cells × 64 dims = 640k doubles) ride a broadcast. */
  val BroadcastElemThreshold: Long = 1L << 16

  /** Content key for the broadcast cache: two matrices with equal
    * contents share one broadcast regardless of object identity. */
  private final class MatrixKey(private val arrs: Array[AnyRef]) {
    override val hashCode: Int = java.util.Arrays.deepHashCode(arrs)
    override def equals(o: Any): Boolean = o match {
      case k: MatrixKey => java.util.Arrays.deepEquals(arrs, k.arrs)
      case _ => false
    }
  }

  /** Upper bound on live entries in the centroid-broadcast cache: a
    * long session planning over many DISTINCT centroid generations
    * (hyperparameter sweeps re-clustering per trial) would otherwise
    * accumulate one broadcast per generation until someone remembered
    * [[clearCentroidBroadcasts]]. 32 covers every sane number of LIVE
    * centroid sets (the cache exists to dedup re-broadcasts of the SAME
    * matrix, not to pin history); eviction is LRU with the evictee
    * unpersisted — in-flight plans still holding its handle re-fetch
    * lazily, so eviction is invisible to results. */
  val MaxCentroidBroadcasts = 32

  /** One broadcast per DISTINCT matrix content per application: without
    * this, every [[topCells]]/[[pqEncode]] call above the threshold
    * (each `buildIvfIndex` cellOf, each bitext-mine direction) minted a
    * fresh broadcast that lived until the session died — executor and
    * driver broadcast blocks accumulating across bench reps. Keyed by
    * `(applicationId, deep content)`, LRU-bounded at
    * [[MaxCentroidBroadcasts]] (evictees unpersisted);
    * [[clearCentroidBroadcasts]] is the bulk lifecycle hook. The
    * one-time `deepHashCode` per call is microseconds even at 10⁵×10²
    * elements — noise against the broadcast it saves. */
  private val bcCache = new java.util.LinkedHashMap[
      (String, MatrixKey), org.apache.spark.broadcast.Broadcast[_]](
      16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (String, MatrixKey), org.apache.spark.broadcast.Broadcast[_]])
        : Boolean = {
      val evict = size() > MaxCentroidBroadcasts
      if (evict) e.getValue.unpersist(false)
      evict
    }
  }

  private[graft] def centroidBroadcastCacheSize: Int =
    bcCache.synchronized(bcCache.size())

  private def cachedBroadcast[T](sc: org.apache.spark.SparkContext,
      key: Array[AnyRef], value: => T)(
      implicit ct: scala.reflect.ClassTag[T])
      : org.apache.spark.broadcast.Broadcast[T] = bcCache.synchronized {
    val k = (sc.applicationId, new MatrixKey(key))
    val cur = bcCache.get(k) // get refreshes LRU order
    if (cur != null) cur.asInstanceOf[org.apache.spark.broadcast.Broadcast[T]]
    else {
      val b = sc.broadcast(value)
      bcCache.put(k, b)
      b
    }
  }

  /** Release executor copies of every cached centroid/codebook broadcast
    * and empty the cache. Safe at any time: `unpersist` (not `destroy`)
    * keeps the driver-side value, so plans still holding a handle
    * re-fetch lazily on next use; subsequent wrapper calls mint fresh
    * broadcasts. Call between pipeline phases that retire a centroid
    * generation (steady-state growth is already LRU-bounded at
    * [[MaxCentroidBroadcasts]]). */
  def clearCentroidBroadcasts(): Unit = bcCache.synchronized {
    val it = bcCache.values().iterator()
    while (it.hasNext) it.next().unpersist(false)
    bcCache.clear()
  }

  /** Top-n cells of `vec` over `(cellId, centroid)` pairs — see
    * [[TopCells]]. Returns `array<struct<cell, cos>>`, best first.
    * Auto-selects [[TopCellsBc]] above [[BroadcastElemThreshold]]
    * elements (bit-identical results; the broadcast is created here and
    * lives until the session ends — callers with a tight lifecycle can
    * broadcast themselves and build [[TopCellsBc]] directly). */
  def topCells(vec: Column, cents: Seq[(Long, Seq[Double])],
      n: Int): Column = {
    val m = cents.map(_._2.toArray).toArray
    val ids = cents.map(_._1).toArray
    // fail fast on BOTH forms — TopCellsBc can't see the matrix length
    // until executor time and would emit filler rows instead of throwing
    require(n <= cents.length,
      s"topCells: n=$n exceeds the ${cents.length} candidate cells")
    val elems = m.length.toLong * (if (m.isEmpty) 0 else m(0).length)
    // active session is THREAD-LOCAL: a caller thread that never touched
    // the session (a test-runner pool thread, a user's executor service)
    // would silently lose the broadcast path without the default-session
    // fallback
    val sess = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val e = if (elems > BroadcastElemThreshold && sess.isDefined)
      TopCellsBc(org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec),
        cachedBroadcast(sess.get.sparkContext,
          Array[AnyRef](m, ids), (m, ids)), n)
    else
      TopCells(org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec),
        m, ids, n)
    org.apache.spark.sql.graftbridge.ColumnBridge.of(e)
  }

  /** All-subspace PQ encode — see [[PqEncode]]. `array<int>` of m
    * codes; dot-argmax form when `ccNorms` is empty, L2-argmin when
    * provided. Auto-selects [[PqEncodeBc]] above
    * [[BroadcastElemThreshold]] elements (the [[topCells]] contract). */
  def pqEncode(vec: Column, codebook: Seq[Seq[Seq[Double]]],
      ccNorms: Seq[Seq[Double]] = Nil): Column = {
    val cb = codebook.map(_.map(_.toArray).toArray).toArray
    val cc = if (ccNorms.isEmpty) null else ccNorms.map(_.toArray).toArray
    val l2 = ccNorms.nonEmpty
    val elems = cb.map(sub =>
      sub.map(_.length.toLong).sum).sum
    // active session is THREAD-LOCAL: a caller thread that never touched
    // the session (a test-runner pool thread, a user's executor service)
    // would silently lose the broadcast path without the default-session
    // fallback
    val sess = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val e = if (elems > BroadcastElemThreshold && sess.isDefined)
      PqEncodeBc(org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec),
        cachedBroadcast(sess.get.sparkContext,
          Array[AnyRef](cb, cc), (cb, cc)), l2,
        cb.length, cb(0)(0).length)
    else
      PqEncode(org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec),
        cb, cc, l2)
    org.apache.spark.sql.graftbridge.ColumnBridge.of(e)
  }

  def lshKeys(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column = {
    val numTables = planes.length
    val numPlanes = planes.head.length
    val flat = planes.flatten.map(_.toArray).toArray
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      LshKeys(org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec), flat, numTables, numPlanes))
  }

  /**
   * Symmetric int8 scalar quantization (the SQ8 of FAISS's IVF-SQ8,
   * public knowledge): q_i = floor(x_i·127/max|x| + 0.5), one fused
   * two-pass loop per vector. `floor(v + 0.5)` — not `Math.round`'s
   * half-even cousin in any SQL engine — is the rounding both this
   * codegen and the DuckDB oracle state verbatim, so quantized vectors
   * are bit-identical cross-engine. A zero vector quantizes to zeros.
   *
   * COSINE over quantized vectors needs no dequantization: the
   * per-vector scale cancels in the ratio, and with |q_i| ≤ 127 every
   * dot/norm term is an exact small integer — the only inexact step in
   * a quantized cosine is the final division. That is what makes the
   * quantized ANN path (q49) hash-verifiable end-to-end.
   */
  case class QuantizeInt8(child: Expression) extends UnaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_quantize_int8"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        val a = math.abs(elemAt(child.dataType, v, i))
        if (a > s) s = a
        i += 1
      }
      val out = new Array[Int](n)
      if (s > 0) {
        i = 0
        while (i < n) {
          out(i) = math.floor(
            elemAt(child.dataType, v, i) * 127.0 / s + 0.5).toInt
          i += 1
        }
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s"); val a = ctx.freshName("a")
        val out = ctx.freshName("out")
        s"""
           |int $n = $v.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $a = java.lang.Math.abs(${elemAccessor(child.dataType, v, i)});
           |  if ($a > $s) $s = $a;
           |}
           |int[] $out = new int[$n];
           |if ($s > 0) {
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = (int) java.lang.Math.floor(
           |      ${elemAccessor(child.dataType, v, i)} * 127.0 / $s + 0.5);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def quantizeInt8(vec: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      QuantizeInt8(org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec)))

  /**
   * Element-wise difference a − b as a DOUBLE array — the residual step
   * of residual-encoded IVF-PQ (r = v − centroid(cell), Jégou et al.'s
   * IVFADC formulation, public knowledge). `zip_with` would do the same
   * arithmetic but is CodegenFallback; residuals sit on the encode AND
   * serve hot paths, so they get the native loop. Inputs may be float
   * or double arrays (floats widen exactly); length = the common
   * prefix, mirroring [[DotProduct]].
   */
  case class VecDiff(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_vec_diff"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = elemAt(left.dataType, x, i) - elemAt(right.dataType, y, i)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (${elemAccessor(left.dataType, a, i)})
           |    - (${elemAccessor(right.dataType, b, i)});
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def vecDiff(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      VecDiff(org.apache.spark.sql.graftbridge.ColumnBridge.expr(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(b)))

  /**
   * dHash difference bits of a row-major grayscale pixel grid (int
   * array, `h` rows × `w` cols): bit `y·(w−1)+x` = 1 iff
   * `px[y·w+x+1] > px[y·w+x]` — the classic perceptual "difference
   * hash" (widely published; gradient direction survives re-encode,
   * resize and small edits, so near-identical images collide). Packs
   * into one long, so `h·(w−1)` must be ≤ 63 (8×8 → 56 bits) and the
   * hash drops straight into the simhash Hamming machinery
   * ([[graft.operators.Dedup.simhashPairsFromHashes]]). A short array
   * contributes 0-bits past its end (missing pixels read as 0 > x =
   * false), keeping the expression total.
   */
  case class DHashBits(child: Expression, w: Int, h: Int)
      extends UnaryExpression {
    require(w >= 2 && h >= 1 && h * (w - 1) <= 63,
      s"dhash grid must satisfy 2<=w, 1<=h, h*(w-1)<=63, got ${w}x$h")

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_dhash_bits"

    override protected def nullSafeEval(input: Any): Any = {
      val px = input.asInstanceOf[ArrayData]
      val n = px.numElements()
      var bits = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w - 1) {
          val i = y * w + x
          if (i + 1 < n && px.getInt(i + 1) > px.getInt(i))
            bits |= 1L << (y * (w - 1) + x)
          x += 1
        }
        y += 1
      }
      bits
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, px => {
        val n = ctx.freshName("n"); val bits = ctx.freshName("bits")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val i = ctx.freshName("i")
        s"""
           |int $n = $px.numElements();
           |long $bits = 0L;
           |for (int $y = 0; $y < $h; $y++) {
           |  for (int $x = 0; $x < ${w - 1}; $x++) {
           |    int $i = $y * $w + $x;
           |    if ($i + 1 < $n && $px.getInt($i + 1) > $px.getInt($i)) {
           |      $bits |= 1L << ($y * ${w - 1} + $x);
           |    }
           |  }
           |}
           |${ev.value} = $bits;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def dhashBits(px: Column, w: Int, h: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      DHashBits(org.apache.spark.sql.graftbridge.ColumnBridge.expr(px), w, h))

  /**
   * Affine projection `M·(v − shift)` in one fused loop — the whitening
   * / centering / rotation transform of an embedding column
   * ([[graft.operators.Similarity.whitenEmbeddings]]). The matrix and
   * shift ride in the references array (constant per query, no literal
   * tree — the [[SignedProject]] device); output length = M's row
   * count. Inputs may be float or double arrays; a vector shorter than
   * `shift` contributes only its prefix.
   */
  case class AffineProject(child: Expression, m: Array[Array[Double]],
      shift: Array[Double]) extends UnaryExpression {
    require(m.nonEmpty && m.forall(_.length == shift.length),
      "matrix columns must match shift length")

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_affine_project"

    private val outDim = m.length
    private val inDim = shift.length

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = math.min(inDim, v.numElements())
      val centered = new Array[Double](inDim)
      var i = 0
      while (i < n) {
        centered(i) = elemAt(child.dataType, v, i) - shift(i)
        i += 1
      }
      while (i < inDim) { centered(i) = -shift(i); i += 1 }
      val out = new Array[Double](outDim)
      var r = 0
      while (r < outDim) {
        val row = m(r)
        var s = 0.0
        var j = 0
        while (j < inDim) { s += row(j) * centered(j); j += 1 }
        out(r) = s
        r += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("affineM", m, "double[][]")
      val sRef = ctx.addReferenceObj("affineS", shift, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val c = ctx.freshName("centered"); val out = ctx.freshName("out")
        val r = ctx.freshName("r"); val s = ctx.freshName("s")
        val j = ctx.freshName("j"); val row = ctx.freshName("row")
        s"""
           |int $n = java.lang.Math.min($sRef.length, $v.numElements());
           |double[] $c = new double[$sRef.length];
           |for (int $i = 0; $i < $n; $i++) {
           |  $c[$i] = (${elemAccessor(child.dataType, v, i)}) - $sRef[$i];
           |}
           |for (int $i = $n; $i < $sRef.length; $i++) { $c[$i] = -$sRef[$i]; }
           |double[] $out = new double[$mRef.length];
           |for (int $r = 0; $r < $mRef.length; $r++) {
           |  double[] $row = $mRef[$r];
           |  double $s = 0.0;
           |  for (int $j = 0; $j < $row.length; $j++) { $s += $row[$j] * $c[$j]; }
           |  $out[$r] = $s;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def affineProject(vec: Column, m: Array[Array[Double]],
      shift: Array[Double]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      AffineProject(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(vec), m, shift))
}
