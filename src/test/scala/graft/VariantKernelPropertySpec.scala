package graft

import graft.functions.VariantKernel
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator invariants for the P7 normalization kernel
  * (SURVEY.md §5.2): pure function, no Spark. Plain scalatest driver
  * (scalatestplus isn't in the offline cache) with a fixed seed — 500
  * samples per property, fully deterministic. */
class VariantKernelPropertySpec extends AnyFunSuite {

  private val nuc = Gen.oneOf('A', 'C', 'G', 'T')
  private val seqGen = Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, nuc))
  private val posGen = Gen.chooseNum(1L, 1000000L)

  private def samples[A](g: Gen[A], n: Int = 500): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def cases: Seq[(Long, String, String)] =
    samples(for { p <- posGen; r <- seqGen; a <- seqGen } yield (p, r, a))

  test("endPos >= startPos >= pos; type in the closed domain") {
    cases.foreach { case (p, ref, alt) =>
      val n = VariantKernel.normalizeAllele(p, ref, alt)
      assert(n.endPos >= n.startPos, s"($p,$ref,$alt)")
      assert(n.startPos >= p, s"($p,$ref,$alt)")
      assert(Set("snv", "mnv", "insertion", "deletion", "delins")
        .contains(n.variantType), s"($p,$ref,$alt)")
    }
  }

  test("deletion => varNuc empty; insertion => refNuc empty") {
    cases.foreach { case (p, ref, alt) =>
      val n = VariantKernel.normalizeAllele(p, ref, alt)
      n.variantType match {
        case "deletion"  => assert(n.varNuc.isEmpty && n.refNuc.nonEmpty)
        case "insertion" => assert(n.refNuc.isEmpty && n.varNuc.nonEmpty)
        case _           => assert(n.refNuc.nonEmpty && n.varNuc.nonEmpty)
      }
    }
  }

  test("equal length => snv/mnv verbatim with matching span") {
    cases.filter { case (_, r, a) => r.length == a.length }
      .foreach { case (p, ref, alt) =>
        val n = VariantKernel.normalizeAllele(p, ref, alt)
        assert(n.refNuc.contains(ref) && n.varNuc.contains(alt))
        assert(n.startPos == p)
        assert(n.variantType == (if (ref.length == 1) "snv" else "mnv"))
        assert(n.endPos - n.startPos ==
          (if (ref.length == 1) 1 else ref.length.toLong))
      }
  }

  test("padding base is the shared prefix the reference trims") {
    cases.foreach { case (p, ref, alt) =>
      val n = VariantKernel.normalizeAllele(p, ref, alt)
      n.paddingBase.foreach { pad =>
        assert(ref.startsWith(pad) || alt.startsWith(pad), s"($p,$ref,$alt)")
      }
    }
  }

  test("star allele is a full-span deletion") {
    samples(for { p <- posGen; r <- seqGen } yield (p, r)).foreach {
      case (p, ref) =>
        val n = VariantKernel.normalizeAllele(p, ref, "*")
        assert(n.variantType == "deletion")
        assert(n.startPos == p && n.endPos == p + ref.length)
        assert(n.varNuc.isEmpty)
    }
  }

  test("zygosity percent bounds and error flag") {
    samples(for {
      vf <- Gen.chooseNum(0, 1000); dp <- Gen.chooseNum(0, 1000)
    } yield (vf, dp)).foreach { case (vf, dp) =>
      val z = VariantKernel.zygosity(vf, dp, "U", "1", 1L)
      if (dp == 0) assert(z.percentRead == 0)
      if (dp > 0 && vf <= dp) assert(z.percentRead >= 0 && z.percentRead <= 101)
      assert((z.possError == "Y") ==
        ((if (dp == 0) 0f else vf * 100f / dp) <= 15f))
    }
  }
}
