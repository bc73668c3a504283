package graft

import graft.functions.{VariantColumns, VariantKernel}
import org.apache.spark.sql.functions._

/** Cross-check: the Catalyst Column expression tree must agree with the
  * pure-Scala kernel on an exhaustive grid of allele pairs. */
class VariantColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeAllele expression ≡ kernel on allele grid") {
    val bases = Seq("A", "C", "G", "T", "AC", "CA", "ACG", "GCA", "ACGT",
      "TTTT", "ACGTA", "*")
    val pairs = for {
      ref <- bases if ref != "*"
      alt <- bases
      if ref != alt
    } yield (1000L, ref, alt)

    val df = pairs.toDF("pos", "ref", "alt")
      .withColumn("n", VariantColumns.normalizeAllele(col("pos"), col("ref"), col("alt")))
      .select($"pos", $"ref", $"alt", $"n.start_pos", $"n.end_pos",
        $"n.ref_nuc", $"n.var_nuc", $"n.padding_base", $"n.variant_type")

    df.collect().foreach { r =>
      val want = VariantKernel.normalizeAllele(r.getLong(0), r.getString(1), r.getString(2))
      val ctx = s"(${r.getString(1)}, ${r.getString(2)})"
      assert(r.getLong(3) === want.startPos, s"$ctx start")
      assert(r.getLong(4) === want.endPos, s"$ctx end")
      assert(Option(r.getString(5)) === want.refNuc, s"$ctx ref_nuc")
      assert(Option(r.getString(6)) === want.varNuc, s"$ctx var_nuc")
      assert(Option(r.getString(7)) === want.paddingBase, s"$ctx padding")
      assert(r.getString(8) === want.variantType, s"$ctx type")
    }
  }

  test("zygosity expression ≡ kernel on (varFreq, depth, gender, chrom) grid") {
    val grid = for {
      depth <- Seq(0, 1, 2, 3, 10, 82, 100)
      varFreq <- Seq(0, 1, 2, 15, 16, 41, 84, 85, 99, 100)
      if varFreq <= depth || depth == 0
      gender <- Seq("U", "M", "F")
      chrom <- Seq("1", "X")
    } yield (varFreq, depth, gender, chrom)

    val df = grid.toDF("var_freq", "depth", "gender", "chrom")
      .withColumn("z", VariantColumns.zygosity(col("var_freq"), col("depth"),
        col("gender"), col("chrom")))
      .select($"var_freq", $"depth", $"gender", $"chrom",
        $"z.zygosity_status", $"z.zygosity_percent_read",
        $"z.zygosity_poss_error", $"z.zygosity_in_pseudo")

    df.collect().foreach { r =>
      val want = VariantKernel.zygosity(r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), 1L)
      val ctx = s"(${r.getInt(0)}, ${r.getInt(1)}, ${r.getString(2)}, ${r.getString(3)})"
      assert(r.getString(4) === want.status, s"$ctx status")
      assert(r.getInt(5) === want.percentRead, s"$ctx pct")
      assert(r.getString(6) === want.possError, s"$ctx err")
      assert(r.getString(7) === want.inPseudo, s"$ctx pseudo")
    }
  }
}
