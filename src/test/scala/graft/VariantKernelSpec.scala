package graft

import graft.functions.VariantKernel._
import graft.model.NormalizedAllele
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven coverage of every branch of the P7 normalizer, §2.7
  * zygosity thresholds, P4 chromosome normalization, and the P12 strain
  * transform (fixture cases per FIXTURES.md §1). */
class VariantKernelSpec extends AnyFunSuite {

  test("chromosome normalization: chr strip, M→MT, contig drop (P3/P4)") {
    assert(normalizeChromosome("chr1").contains("1"))
    assert(normalizeChromosome("12").contains("12"))
    assert(normalizeChromosome("chrM").contains("MT"))
    assert(normalizeChromosome("m").contains("MT"))
    assert(normalizeChromosome("chrX").contains("X"))
    assert(normalizeChromosome("chr1_unplaced_scaffold").isEmpty)
    assert(normalizeChromosome("chrUn_contig_77").isEmpty)
    assert(normalizeChromosome("NW_unloc_4").isEmpty)
    assert(normalizeChromosome("some_scaffold_9").isEmpty)
  }

  // P7 branches — expected values derived by hand-executing
  // HrdpVariants.java:205-280.
  val cases: Seq[(String, Long, String, String, NormalizedAllele)] = Seq(
    ("star deletion", 100L, "ACGT", "*",
      NormalizedAllele(100, 104, Some("ACGT"), None, None, "deletion")),
    ("deletion 1-base alt", 100L, "ACG", "A",
      NormalizedAllele(101, 103, Some("CG"), None, Some("A"), "deletion")),
    ("deletion multi-base shared prefix", 100L, "ACGTT", "AC",
      NormalizedAllele(102, 105, Some("GTT"), None, Some("AC"), "deletion")),
    ("insertion 1-base ref", 100L, "A", "ACGT",
      NormalizedAllele(101, 102, None, Some("CGT"), Some("A"), "insertion")),
    ("insertion multi-base shared prefix", 100L, "AC", "ACGT",
      NormalizedAllele(102, 103, None, Some("GT"), Some("AC"), "insertion")),
    ("snv", 100L, "A", "T",
      NormalizedAllele(100, 101, Some("A"), Some("T"), None, "snv")),
    ("mnv", 100L, "ACG", "TTT",
      NormalizedAllele(100, 103, Some("ACG"), Some("TTT"), None, "mnv")),
    ("delins ref longer, no prefix", 100L, "ACGT", "TG",
      NormalizedAllele(100, 104, Some("ACGT"), Some("TG"), None, "delins")),
    ("delins alt longer, no prefix", 100L, "AC", "TGGG",
      NormalizedAllele(100, 101, Some("AC"), Some("TGGG"), None, "delins")))

  cases.foreach { case (name, pos, ref, alt, want) =>
    test(s"normalizeAllele: $name") {
      assert(normalizeAllele(pos, ref, alt) === want)
    }
  }

  test("normalizeAllele: snp label on multi-allelic path (quirk)") {
    assert(normalizeAllele(5, "A", "G", snvLabel = "snp").variantType === "snp")
  }

  test("normalizeAllele invariants") {
    for (ref <- Seq("A", "AC", "ACG", "ACGTT"); alt <- Seq("A", "T", "TG", "ACG", "*")) {
      val n = normalizeAllele(1000, ref, alt)
      assert(n.endPos >= n.startPos, s"($ref,$alt): end<start")
      if (n.variantType == "deletion") assert(n.varNuc.isEmpty)
      if (n.variantType == "insertion") assert(n.refNuc.isEmpty)
    }
  }

  test("zygosity thresholds (§2.7)") {
    // pct == 100 → homozygous
    assert(zygosity(50, 50, "U", "1", 1).status === "homozygous")
    // 85 <= pct < 100 → possibly homozygous
    assert(zygosity(85, 100, "U", "1", 1).status === "possibly homozygous")
    assert(zygosity(99, 100, "U", "1", 1).status === "possibly homozygous")
    // pct < 85 → heterozygous
    assert(zygosity(84, 100, "U", "1", 1).status === "heterozygous")
    assert(zygosity(1, 2, "U", "1", 1).status === "heterozygous")
    // possible error at pct <= 15
    assert(zygosity(15, 100, "U", "1", 1).possError === "Y")
    assert(zygosity(16, 100, "U", "1", 1).possError === "N")
    // depth 0 → pct 0
    val z0 = zygosity(7, 0, "U", "1", 1)
    assert(z0.status === "heterozygous" && z0.percentRead === 0 &&
      z0.possError === "Y")
    // rounding: 41/82 = 50.0 → 50; 2/3 = 66.67 → 67
    assert(zygosity(41, 82, "U", "1", 1).percentRead === 50)
    assert(zygosity(2, 3, "U", "1", 1).percentRead === 67)
    // male sex-chromosome branch (non-PAR)
    assert(zygosity(10, 10, "M", "X", 1).status === "hemizygous")
    assert(zygosity(9, 10, "M", "Y", 1).status === "probably hemizygous")
    assert(zygosity(1, 10, "M", "X", 1).status === "possibly hemizygous")
    // female / unknown gender on X → diploid branch
    assert(zygosity(10, 10, "U", "X", 1).status === "homozygous")
  }

  test("strain name transform (P12, HrdpVariants.java:140-161)") {
    // e.g. ACI_EurMcwi_2019_NG_xxx_yyy → drop last two segments, ')' appended,
    // >2 underscores → '-', then '/' and ' ('
    assert(strainName("ACI_EurMcwi_2019NG_V1") === "ACI/EurMcwi)")
    assert(strainName("BN_NHsdMcwi_2019_V2_PASS") === "BN/NHsdMcwi)")
    assert(strainName("A_B_C_D_E_F") === "A-B/C (D)")
  }

  test("interval overlap (J1, GeneCache.java:72-77)") {
    assert(intervalsOverlap(10, 20, 5, 25))   // gene contains variant
    assert(intervalsOverlap(10, 20, 15, 25))  // straddle right
    assert(intervalsOverlap(10, 20, 5, 15))   // straddle left
    assert(intervalsOverlap(10, 20, 12, 18))  // variant contains gene
    assert(intervalsOverlap(10, 20, 20, 30))  // touching endpoints
    assert(!intervalsOverlap(10, 20, 21, 30))
    assert(!intervalsOverlap(10, 20, 1, 9))
  }
}
