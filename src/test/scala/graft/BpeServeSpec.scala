package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** The BPE serving surfaces: the two-pass partition-offset token-id
  * rank (ids identical to the global-window form, no single-partition
  * exchange), and the encode-once/pack-many artifact split (bucketed
  * round-trip ≡ one-shot pack, token-side shuffles elided). */
class BpeServeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "s1", "low low low lower newest newest"),
    (2L, "s1", "widest newest low a a a b"),
    (3L, "s2", "lower widest newest low low"),
    (4L, "s2", "a b a b newest widest widest lower"),
    (5L, "s2", "low newest widest a lower b low"))
    .toDF("doc_id", "source", "text")

  private def model = Bpe.trainBpe(
    Bpe.wordTypes(corpus, col("text")), rounds = 6)

  test("tokenIds: two-pass rank ≡ global window, ids dense from 0") {
    val m = model
    val got = Bpe.tokenIds(m, numParts = 3)
      .as[(String, Long)].collect().sortBy(_._2)
    val want = Bpe.tokenIdsWindowed(m)
      .as[(String, Long)].collect().sortBy(_._2)
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._2).toSeq === got.indices.map(_.toLong))
  }

  test("tokenIds: no single-partition exchange in the plan") {
    val m = model
    val plan = Bpe.tokenIds(m, numParts = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"two-pass rank still serializes through one task:\n$plan")
    // the reference form DOES have one — the assert above is meaningful
    val planW = Bpe.tokenIdsWindowed(m)
      .queryExecution.executedPlan.toString
    assert(planW.contains("Exchange SinglePartition"), planW)
    graft.operators.Dedup.releasePersisted()
  }

  test("fertilityStats: hand-computed ratios, unseen-word char fallback") {
    // train on a corpus where "low" merges fully (freq 5) but rarer
    // words stay multi-symbol, then score a corpus with an unseen word
    val train = Seq((1L, "en", "low low low low low newest newest"))
      .toDF("doc_id", "lang", "text")
    val m = Bpe.trainBpe(Bpe.wordTypes(train, col("text")), rounds = 2)
    val lens = Bpe.tokenLengths(m).as[(String, Int)].collect().toMap
    val score = Seq(
      (1L, "en", "low low newest"),
      (2L, "de", "low zz"))   // "zz" unseen → 2 chars
    val got = Bpe.fertilityStats(m,
      score.toDF("doc_id", "lang", "text"), "doc_id", col("text"),
      Seq("lang"))
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val en = got("en")
    val enTok = 2L * lens("low") + lens("newest")
    assert(en === (("en", 1L, 3L, 12L, enTok,
      BigDecimal(enTok / 3.0).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(12.0 / enTok).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val de = got("de")
    val deTok = lens("low") + 2L // zz falls back to char count
    assert(de._4 === 5L && de._5 === deTok)
    graft.operators.Dedup.releasePersisted()
  }

  test("encode artifact round-trip: pack-from-bucketed ≡ one-shot pack") {
    val m = model
    val enc = Bpe.encodeDocs(m, corpus, "doc_id", col("text"))
      .join(corpus.select("doc_id", "source"), Seq("doc_id"))

    spark.sql("DROP TABLE IF EXISTS graft_bpe_encoded")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_bpe_encoded")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    Bpe.writeEncoded(enc, "graft_bpe_encoded", "source", "doc_id",
      buckets = 4)
    val back = Bpe.readEncoded(spark, "graft_bpe_encoded")

    // round-trip content: the artifact IS the encoded stream
    assert(back.count() === enc.count())
    assert(back.orderBy("source", "doc_id", "pos")
      .select("doc_id", "pos", "token", "token_id")
      .as[(Long, Long, String, Option[Long])].collect().toSeq
      === enc.orderBy("source", "doc_id", "pos")
      .select("doc_id", "pos", "token", "token_id")
      .as[(Long, Long, String, Option[Long])].collect().toSeq)

    val direct = Bpe.packTokenStream(enc, "source", "doc_id", capacity = 7)
      .as[(String, Long, Long, String)].collect().toSet
    val served = Bpe.packTokenStream(back, "source", "doc_id", capacity = 7)
    assert(served.as[(String, Long, Long, String)].collect().toSet
      === direct)
    assert(direct.nonEmpty)

    // plan shape: the bucketed scan's hash-clustering on the pack key
    // satisfies every token-side distribution requirement — shuffles
    // remain only over doc-level frames (strictly fewer than the
    // unbucketed form's)
    val planServed = served.queryExecution.executedPlan.toString
    val planDirect = Bpe.packTokenStream(enc, "source", "doc_id", 7)
      .queryExecution.executedPlan.toString
    val nServed = "Exchange hashpartitioning".r
      .findAllIn(planServed).length
    val nDirect = "Exchange hashpartitioning".r
      .findAllIn(planDirect).length
    assert(nServed < nDirect,
      s"bucketing elided no shuffle ($nServed vs $nDirect):\n$planServed")
    graft.operators.Dedup.releasePersisted()
  }
}
