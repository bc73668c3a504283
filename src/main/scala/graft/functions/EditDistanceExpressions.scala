package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deletion-neighborhood hashing for low-threshold edit-distance joins
 * (the FastSS / SymSpell family — public knowledge): two strings are
 * within edit distance `d` only if they share a variant reachable by
 * deleting ≤ `d` characters from each (align the two strings, then
 * delete from each side every substituted/inserted/deleted position of
 * the transcript — at most `d` deletions per side — leaving equal
 * strings). The variants ride as 64-bit hashes; a hash collision only
 * adds a candidate pair, which the exact verify discards.
 *
 * Neighborhood size is Θ(len^d), so this is the SHORT-string weapon
 * (entity names, identifiers, titles); [[graft.operators.StringSimilarity]]
 * routes long strings to the positional q-gram pipeline instead.
 */
object EditDistanceExpressions {

  /** Enumerates distinct ≤d-deletion variants (code-unit deletions) and
    * hashes each with FNV-1a-64 + splitmix finalizer. Deduplicates by
    * STRING, not by hash — a colliding hash must not suppress a branch
    * of the recursion. Rides the codegen references array. */
  final class DeletionNeighborhood(val d: Int) extends Serializable {

    private def mix(z0: Long): Long = {
      // splitmix64 finalizer (public domain, Steele et al.)
      var z = z0
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    private def hash(s: String): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) {
        h = (h ^ s.charAt(i)) * 0x100000001b3L
        i += 1
      }
      mix(h)
    }

    /** Deletion positions enumerated non-decreasingly so each index
      * subset is visited exactly once. */
    private def rec(s: String, left: Int, from: Int,
        seen: java.util.HashSet[String]): Unit = {
      var i = from
      while (i < s.length) {
        val t = s.substring(0, i) + s.substring(i + 1)
        if (seen.add(t) && left > 1) rec(t, left - 1, i, seen)
        i += 1
      }
    }

    def hashes(s: UTF8String): ArrayData = {
      val str = s.toString
      val seen = new java.util.HashSet[String]()
      seen.add(str)
      if (d > 0) rec(str, d, 0, seen)
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { out(i) = hash(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** `array<long>` of deletion-variant hashes of a string, inside
    * whole-stage codegen (the enumeration runs in the referenced
    * helper; no interpreted HOF in the path). */
  case class DeletionVariantHashes(child: Expression, d: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_deletion_variant_hashes"

    @transient private lazy val nbh = new DeletionNeighborhood(d)

    override protected def nullSafeEval(input: Any): Any =
      nbh.hashes(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("deletionNbh", nbh,
        classOf[DeletionNeighborhood].getName)
      nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.hashes($s);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper for [[DeletionVariantHashes]]. */
  def deletionVariantHashes(str: Column, d: Int): Column = {
    require(d >= 0, s"deletion distance must be >= 0, got $d")
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      DeletionVariantHashes(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(str), d))
  }
}
