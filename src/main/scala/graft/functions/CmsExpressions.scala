package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Count-Min-sketch frequency predicate — the prefilter half of exact
 * heavy-hitter extraction ([[graft.operators.TextAnalysis.frequentNgrams]]).
 *
 * A CM sketch only ever OVER-estimates, so `estimate ≥ minCount` is a
 * provable superset of the truly-frequent items: filtering with this
 * predicate before an exact count can drop cost, never correctness —
 * the same no-false-negatives contract as
 * [[BloomExpressions.BloomMightContainLong]].
 *
 * The sketch rides serialized inside the expression (≤~100 KB at
 * eps=1e-3, depth 5) and is parsed once per task via a transient lazy
 * field. Probes hash the UTF-8 bytes — the same bytes
 * `DataFrameStatFunctions.countMinSketch` adds for string columns, so
 * build and probe agree exactly.
 */
object CmsExpressions {

  /** `cms.estimateCount(child) >= minCount`; null-safe (null → null). */
  case class CmsAtLeast(child: Expression, cmsBytes: Array[Byte],
      minCount: Long)
      extends UnaryExpression with Predicate {

    override def prettyName: String = "graft_cms_at_least"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires STRING item, got ${child.dataType.catalogString}")
    }

    @transient private lazy val cms: CountMinSketch =
      CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

    /** Shared by the interpreted and generated paths. */
    def atLeast(item: UTF8String): Boolean =
      cms.estimateCount(item.getBytes) >= minCount

    override protected def nullSafeEval(input: Any): Any =
      atLeast(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsPred", this,
        classOf[CmsAtLeast].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.atLeast($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  def atLeast(item: Column, cmsBytes: Array[Byte], minCount: Long): Column =
    ColumnBridge.of(CmsAtLeast(ColumnBridge.expr(item), cmsBytes, minCount))
}
