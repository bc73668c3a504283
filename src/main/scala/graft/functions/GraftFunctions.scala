package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL registration of graft's native expressions, so `spark.sql` users
 * get them alongside the built-ins:
 *
 *   GraftFunctions.register(spark)
 *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
 */
object GraftFunctions {

  private def register1(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorExpressions", name),
      builder)

  def register(spark: SparkSession): Unit = {
    register1(spark, "graft_cosine",
      es => VectorExpressions.CosineSimilarity(es(0), es(1)))
    register1(spark, "graft_dot",
      es => VectorExpressions.DotProduct(es(0), es(1)))
    // sorted-long-array intersection count (the ngram-Jaccard verify
    // kernel): graft_sorted_intersect(array<bigint>, array<bigint>)
    register1(spark, "graft_sorted_intersect",
      es => VectorExpressions.SortedLongIntersectCount(es(0), es(1)))
    // minhash component-equality count:
    // graft_equal_components(array<bigint>, array<bigint>)
    register1(spark, "graft_equal_components",
      es => VectorExpressions.EqualComponentCount(es(0), es(1)))
    // int8 scalar quantization: graft_quantize_int8(array<float|double>)
    register1(spark, "graft_quantize_int8",
      es => VectorExpressions.QuantizeInt8(es(0)))
    // element-wise difference (residual step of IVFADC):
    // graft_vec_diff(array<float|double>, array<float|double>)
    register1(spark, "graft_vec_diff",
      es => VectorExpressions.VecDiff(es(0), es(1)))
    // perceptual difference hash of an 8x8 row-major gray grid:
    // graft_dhash64(array<int>) — 56 gradient bits
    register1(spark, "graft_dhash64",
      es => VectorExpressions.DHashBits(es(0), 8, 8))
    // language guess over raw text, same kernel as TextAnalysis.langGuess:
    // graft_lang_guess(array<string> tokens)
    val langs = graft.operators.TextAnalysis.LangProfiles.toSeq.sortBy(_._1)
    val byWord = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    langs.zipWithIndex.foreach { case ((_, ws), i) =>
      ws.foreach(w => byWord(w) = byWord.getOrElse(w, 0) | (1 << i))
    }
    register1(spark, "graft_lang_guess",
      es => TextExpressions.WordListArgmax(es(0), byWord.keys.toArray,
        byWord.values.toArray, langs.length, langs.map(_._1).toArray, "und"))
  }
}
