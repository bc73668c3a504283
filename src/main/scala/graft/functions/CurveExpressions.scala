package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for space-filling-curve keys.
 *
 * Rationale: the N-dim Hilbert transform (Skilling, "Programming the
 * Hilbert curve", AIP 2004 — public knowledge) is a SEQUENTIAL
 * bit-level state machine: every (level, axis) step mutates axis 0 in
 * a way the next step reads. Expressed as chained `withColumn`s,
 * Catalyst's projection collapse SUBSTITUTES each step into the next,
 * so the final key's expression tree grows multiplicatively with
 * (bits × dims) — at 8 bits × 3 dims the inlined tree costs ~25 µs/row
 * (measured at the 30× ScaleProbe: the hilbert ingest ran 5× slower
 * than the identical z-order ingest, whose interleave tree is
 * linear-size). A compact `doGenCode` loop is the idiomatic escape
 * hatch (the [[VectorExpressions]] argument): tiny generated code,
 * whole-stage codegen participation, identical exact-integer
 * semantics — the q160/q163 21-CTE DuckDB oracles and LayoutSpec's
 * bijection/adjacency properties pin them.
 */
object CurveExpressions {

  /** The Skilling transpose-to-index transform over quantized coords
    * `x` (MUTATED in place), exactly the semantics of the former
    * column chain in [[graft.operators.Layout]]: inverse-undo
    * exchanges level by level (axes sequential within a level), Gray
    * fold against the UPDATED previous axis, the last-axis correction
    * term, then bit interleave with axis 0 taking the most significant
    * bit of each level. Shared by the interpreted path and tests; the
    * codegen emits the same loops inline. */
  def skillingIndex(x: Array[Long], bits: Int): Long = {
    val n = x.length
    var qMask = 1L << (bits - 1)
    while (qMask > 1) {
      val p = qMask - 1
      var i = 0
      while (i < n) {
        if ((x(i) & qMask) != 0) x(0) ^= p
        else if (i > 0) {
          val t = (x(0) ^ x(i)) & p
          x(0) ^= t
          x(i) ^= t
        }
        i += 1
      }
      qMask >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t2 = 0L
    var q2 = 1L << (bits - 1)
    while (q2 > 1) {
      if ((x(n - 1) & q2) != 0) t2 ^= q2 - 1
      q2 >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t2; i += 1 }
    var key = 0L
    i = 0
    while (i < n) {
      var q = 0
      while (q < bits) {
        key += ((x(i) >> q) & 1L) << (q * n + (n - 1 - i))
        q += 1
      }
      i += 1
    }
    key
  }

  /** Hilbert index of an `array<long>` of `n` quantized coordinates at
    * `bits` bits per dimension. */
  case class HilbertKeyN(child: Expression, bits: Int, n: Int)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbert_key"

    /** Typed ANALYSIS error instead of out-of-bounds ArrayData reads:
      * the transform reads exactly `n` LONG elements, so anything but
      * `array<long>` is refused at plan time (a wrong element type
      * would otherwise yield engine-dependent garbage keys). */
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis
            .TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(s"$prettyName expects array<bigint> " +
              s"coordinates, got ${other.simpleString}")
      }

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      // a short array at RUNTIME (the length is data, not schema) must
      // fail loudly — reading past numElements() is undefined ArrayData
      // behavior, not an error
      if (v.numElements() < n)
        throw new IllegalArgumentException(
          s"$prettyName: coordinate array has ${v.numElements()} " +
            s"elements, needs $n")
      // a null ELEMENT is data too (the analysis check accepts
      // containsNull arrays because Spark's array() builder marks them
      // whenever any input is nullable) — ArrayData.getLong on a null
      // slot is undefined, so it must fail loudly, not key as garbage
      var k = 0
      while (k < n) {
        if (v.isNullAt(k))
          throw new IllegalArgumentException(
            s"$prettyName: coordinate $k is null — quantized " +
              "coordinates must be non-null longs")
        k += 1
      }
      val x = Array.tabulate(n)(v.getLong)
      skillingIndex(x, bits)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val x = ctx.freshName("x"); val i = ctx.freshName("i")
        val q = ctx.freshName("q"); val k = ctx.freshName("k")
        val t = ctx.freshName("t"); val t2 = ctx.freshName("t2")
        val qm = ctx.freshName("qm"); val p = ctx.freshName("p")
        s"""
           |if ($v.numElements() < $n) {
           |  throw new IllegalArgumentException(
           |    "graft_hilbert_key: coordinate array has " +
           |      $v.numElements() + " elements, needs $n");
           |}
           |long[] $x = new long[$n];
           |for (int $k = 0; $k < $n; $k++) {
           |  if ($v.isNullAt($k)) {
           |    throw new IllegalArgumentException(
           |      "graft_hilbert_key: coordinate " + $k + " is null - " +
           |        "quantized coordinates must be non-null longs");
           |  }
           |  $x[$k] = $v.getLong($k);
           |}
           |for (long $qm = 1L << ${bits - 1}; $qm > 1; $qm >>= 1) {
           |  long $p = $qm - 1;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if (($x[$i] & $qm) != 0) { $x[0] ^= $p; }
           |    else if ($i > 0) {
           |      long $t = ($x[0] ^ $x[$i]) & $p;
           |      $x[0] ^= $t; $x[$i] ^= $t;
           |    }
           |  }
           |}
           |for (int $i = 1; $i < $n; $i++) $x[$i] ^= $x[$i - 1];
           |long $t2 = 0L;
           |for (long $qm = 1L << ${bits - 1}; $qm > 1; $qm >>= 1) {
           |  if (($x[$n - 1] & $qm) != 0) $t2 ^= $qm - 1;
           |}
           |for (int $i = 0; $i < $n; $i++) $x[$i] ^= $t2;
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  for (int $q = 0; $q < $bits; $q++) {
           |    ${ev.value} +=
           |      (($x[$i] >> $q) & 1L) << ($q * $n + ($n - 1 - $i));
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** The classic 2-D quadrant-rotation Hilbert index (the d2xy form;
    * public knowledge) over quantized coords — the same per-row loop
    * the former column chain in [[graft.operators.Layout.hilbertKey]]
    * unrolled per level; q157's CTE oracle pins the labeling. */
  def rotationIndex2(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0; var y = y0; var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      val nx = if (ry == 0) { if (rx == 1) n - 1 - y else y } else x
      val ny = if (ry == 0) { if (rx == 1) n - 1 - x else x } else y
      x = nx; y = ny
      s >>= 1
    }
    d
  }

  /** 2-D rotation Hilbert index of two quantized long coords. */
  case class HilbertKey2(left: Expression, right: Expression, bits: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbert_key2"

    /** Same analysis-time discipline as [[HilbertKeyN]]: both coords
      * must be LONG, or the unchecked casts below would throw a bare
      * ClassCastException mid-job instead of a plan-time error. */
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName expects two bigint coords, " +
            s"got (${left.dataType.simpleString}, " +
            s"${right.dataType.simpleString})")

    override protected def nullSafeEval(x: Any, y: Any): Any =
      rotationIndex2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xv, yv) => {
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val s = ctx.freshName("s"); val rx = ctx.freshName("rx")
        val ry = ctx.freshName("ry"); val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val n = 1L << bits
        s"""
           |long $x = $xv; long $y = $yv;
           |${ev.value} = 0L;
           |for (long $s = ${n >> 1}L; $s > 0; $s >>= 1) {
           |  long $rx = (($x & $s) != 0) ? 1L : 0L;
           |  long $ry = (($y & $s) != 0) ? 1L : 0L;
           |  ${ev.value} += $s * $s * ((3L * $rx) ^ $ry);
           |  long $nx = ($ry == 0)
           |    ? (($rx == 1) ? ${n - 1}L - $y : $y) : $x;
           |  long $ny = ($ry == 0)
           |    ? (($rx == 1) ? ${n - 1}L - $x : $x) : $y;
           |  $x = $nx; $y = $ny;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column wrapper for [[HilbertKey2]]: two long coords. */
  def hilbertKey2(qx: Column, qy: Column, bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62,
      s"hilbertKey2: 2x$bits bits must fit a long")
    org.apache.spark.sql.graftbridge.ColumnBridge.of(HilbertKey2(
      org.apache.spark.sql.graftbridge.ColumnBridge.expr(qx),
      org.apache.spark.sql.graftbridge.ColumnBridge.expr(qy), bits))
  }

  /** Column wrapper: `coords` must be an `array<long>` of length `n`. */
  def hilbertKeyN(coords: Column, bits: Int, n: Int): Column = {
    require(n >= 2 && bits >= 1 && n * bits <= 62,
      s"hilbertKeyN: $n dims x $bits bits must fit a long")
    org.apache.spark.sql.graftbridge.ColumnBridge.of(HilbertKeyN(
      org.apache.spark.sql.graftbridge.ColumnBridge.expr(coords), bits, n))
  }
}
