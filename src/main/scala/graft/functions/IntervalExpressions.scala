package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native interval-index lookup for the genic-classification join (J1) —
 * the codegen realization of the reference's commented-out binary search
 * (GeneCache.java:53-67).
 *
 * The per-chromosome index (starts sorted ascending, running max of
 * stops) rides in the codegen references array; the generated code is one
 * static call: map lookup + O(log g) binary search per row, inside
 * whole-stage codegen — no UDF serialization barrier, no broadcast-join
 * shuffle. overlap([s,e]) exists ⇔ max{stop(g) : start(g) <= e} >= s.
 */
object IntervalExpressions {

  /** Per-chromosome sorted interval index. */
  final case class IntervalIndex(
      byChrom: Map[String, (Array[Long], Array[Long])])
      extends Serializable {

    def overlaps(chrom: String, start: Long, end: Long): Boolean =
      byChrom.get(chrom) match {
        case None => false
        case Some((starts, maxStops)) =>
          var lo = 0; var hi = starts.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (starts(mid) <= end) { ans = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          ans >= 0 && maxStops(ans) >= start
      }
  }

  object IntervalIndex {
    /** Build from (chromosome, start, stop) triples. */
    def build(rows: Seq[(String, Long, Long)]): IntervalIndex = {
      val byChrom = rows.groupBy(_._1).map { case (chrom, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1).toArray
        val starts = sorted.map(_._1)
        val maxStops = sorted.map(_._2)
        var i = 1
        while (i < maxStops.length) {
          if (maxStops(i) < maxStops(i - 1)) maxStops(i) = maxStops(i - 1)
          i += 1
        }
        chrom -> (starts, maxStops)
      }
      IntervalIndex(byChrom)
    }
  }

  /** `interval_overlaps(chrom, start, end)` against a constant index. */
  case class IntervalOverlaps(first: Expression, second: Expression,
      third: Expression, index: IntervalIndex) extends TernaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_interval_overlaps"

    override protected def nullSafeEval(c: Any, s: Any, e: Any): Any =
      index.overlaps(c.asInstanceOf[UTF8String].toString,
        s.asInstanceOf[Long], e.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val idx = ctx.addReferenceObj("genicIndex", index,
        classOf[IntervalIndex].getName)
      nullSafeCodeGen(ctx, ev, (c, s, e) =>
        s"${ev.value} = $idx.overlaps($c.toString(), $s, $e);")
    }

    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  def intervalOverlaps(chrom: Column, start: Column, end: Column,
      index: IntervalIndex): Column =
    ColumnBridge.of(IntervalOverlaps(ColumnBridge.expr(chrom),
      ColumnBridge.expr(start), ColumnBridge.expr(end), index))
}
