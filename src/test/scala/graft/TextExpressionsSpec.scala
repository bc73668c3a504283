package graft

import graft.functions.TextExpressions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordListMask bit i ≡ isInCollection membership in list i") {
    val lists = TextAnalysis.LangProfiles.toSeq.sortBy(_._1).map(_._2)
    val tokens = (lists.flatten ++ Seq("zzz", "", "DE", "the "))
      .zipWithIndex.map(_.swap).toDF("id", "tok")
    val expected = lists.zipWithIndex.map { case (ws, i) =>
      when(col("tok").isInCollection(ws), 1 << i).otherwise(0)
    }.reduce(_ + _)
    val rows = tokens
      .select(TextExpressions.wordListMask(col("tok"), lists).as("mask"),
        expected.as("want"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // "de" appears in several profiles → its mask has >1 bit set
    val deMask = tokens.filter(col("tok") === "de")
      .select(TextExpressions.wordListMask(col("tok"), lists))
      .as[Int].head()
    assert(java.lang.Integer.bitCount(deMask) > 1)
  }
}
