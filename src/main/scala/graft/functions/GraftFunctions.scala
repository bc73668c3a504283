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
  }
}
