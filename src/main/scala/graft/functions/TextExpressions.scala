package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native expressions for the text-analysis hot path.
 */
object TextExpressions {

  /**
   * Membership bitmask of a token across a set of word lists: bit i is
   * set when the token occurs in list i. ONE hash lookup per token —
   * the expression-tree alternative (per-list `isInCollection`) costs
   * |lists| × |words| string comparisons per token, which dominated the
   * language-id scan (45 comparisons/token over ~3M exploded tokens at
   * sf0.1). The word → mask table rides in the codegen references array.
   */
  case class WordListMask(child: Expression, words: Array[String],
      masks: Array[Int]) extends UnaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_word_list_mask"

    @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer](words.length * 2)
      var i = 0
      while (i < words.length) {
        m.put(UTF8String.fromString(words(i)), masks(i))
        i += 1
      }
      m
    }

    override protected def nullSafeEval(input: Any): Any = {
      val v = table.get(input.asInstanceOf[UTF8String])
      if (v == null) 0 else v.intValue()
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tbl = ctx.addReferenceObj("wordMaskTable", table,
        "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
      nullSafeCodeGen(ctx, ev, t => {
        val v = ctx.freshName("v")
        s"""
           |Integer $v = (Integer) $tbl.get($t);
           |${ev.value} = $v == null ? 0 : $v.intValue();
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper: bit i of the result marks membership in
    * `lists(i)`. */
  def wordListMask(token: Column, lists: Seq[Seq[String]]): Column = {
    require(lists.length <= 31, "at most 31 word lists per mask")
    val byWord = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach(w => byWord(w) = byWord.getOrElse(w, 0) | (1 << i))
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      WordListMask(org.apache.spark.sql.graftbridge.ColumnBridge.expr(token),
        byWord.keys.toArray, byWord.values.toArray))
  }
}
