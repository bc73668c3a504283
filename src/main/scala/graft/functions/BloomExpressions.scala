package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/**
 * Runtime Bloom-filter membership as a native codegen predicate — the
 * "sideways information passing" half of a bloom-pruned join
 * ([[graft.operators.BloomJoin]]).
 *
 * The filter is carried as its serialized bytes (the expression tree is
 * shipped to every executor inside the serialized task), and parsed once
 * per JVM via a transient lazy field — the standard pattern for
 * broadcast-sized reference data embedded in an expression. At a 3%
 * false-positive rate a 10M-key filter is ~7.3 MB; anything larger should
 * arrive via a real `broadcast()` join instead, which
 * [[graft.operators.BloomJoin]] enforces with a size guard.
 *
 * No false negatives ever: `mightContain = false` proves the key cannot
 * join, so pruning with this predicate preserves inner-join semantics
 * exactly.
 */
object BloomExpressions {

  /** `bloom.mightContainLong(child)`; null-safe (null key → null). */
  case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression with Predicate {

    override def prettyName: String = "graft_bloom_might_contain"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires BIGINT key, got ${child.dataType.catalogString}")
    }

    // parsed once per deserialized task closure; shared across rows
    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

    /** Interpreted + codegen entry point (codegen calls back through the
      * referenced expression object so both paths share one parse). */
    def mightContain(key: Long): Boolean = bloom.mightContainLong(key)

    override protected def nullSafeEval(input: Any): Any =
      mightContain(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomPred", this,
        classOf[BloomMightContainLong].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Serialize a built filter for embedding in the predicate. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  def mightContainLong(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.of(BloomMightContainLong(ColumnBridge.expr(key), bloomBytes))
}
