package graft.functions

import graft.model.{NormalizedAllele, ZygosityResult}

/**
 * Pure-Scala scalar kernels of the variant pipeline — zero Spark imports, so
 * every branch is unit-testable in isolation and the Column-expression twin
 * ([[VariantColumns]]) can be property-checked against it.
 *
 * Semantics recovered from the reference (SURVEY.md §2.2 P4/P7/P12, §2.7):
 *  - chromosome normalization: HrdpVariants.java:180-185
 *  - allele normalization:     HrdpVariants.java:205-280 (single-allele path;
 *    the multi-allelic copy path :331-405 re-implements it with divergences
 *    we treat as bugs — see model.CompatFlags)
 *  - zygosity:                 decompiled rgdcore:Zygosity
 *  - strain name:              HrdpVariants.java:138-161
 */
object VariantKernel {

  /** P3+P4: contig filter + chromosome normalization.
    * Returns None for unplaced/unlocalized/contig/scaffold entries
    * (HrdpVariants.java:180-182); strips "chr", maps M→MT (:183-185). */
  def normalizeChromosome(raw: String): Option[String] = {
    if (raw.contains("unplaced") || raw.contains("unloc") ||
        raw.contains("contig") || raw.contains("scaffold")) None
    else {
      val c = raw.replace("chr", "")
      Some(if (c.equalsIgnoreCase("M")) "MT" else c)
    }
  }

  /**
   * P7: normalize one (pos, ref, alt) pair into placement + typed alleles.
   * Exactly the single-allele decision tree of HrdpVariants.java:205-280:
   *
   *  - alt == "*"                        → pure deletion, varNuc=null,
   *                                        end = start + len(ref)
   *  - len(ref) > len(alt) && len(alt)==1 → deletion: padding=alt, start+1,
   *                                        ref drops first base, varNuc=null,
   *                                        end = start' + len(ref')
   *  - len(ref) > len(alt) && ref.startsWith(alt)
   *                                      → deletion: padding=alt,
   *                                        start+len(alt), ref drops prefix,
   *                                        end = start' + len(ref')
   *  - len(alt) > len(ref) && len(ref)==1 → insertion: padding=ref,
   *                                        start+1, refNuc=null, alt drops
   *                                        first base, end = start' + 1
   *  - len(alt) > len(ref) && alt.startsWith(ref)
   *                                      → insertion: padding=ref,
   *                                        start+len(ref), refNuc=null, alt
   *                                        drops prefix, end = start' + 1
   *  - len(ref) == len(alt) == 1         → snv, end = start + 1
   *  - len(ref) == len(alt)  > 1         → mnv, end = start + len(ref)
   *  - len(ref) > len(alt) (no prefix)   → delins, end = start + len(ref)
   *  - len(alt) > len(ref) (no prefix)   → delins, end = start + 1
   *
   * `snvLabel` lets callers reproduce the reference's "snp" label on the
   * multi-allelic path (HrdpVariants.java:395) / GenicQc (GenicQc.java:168).
   */
  def normalizeAllele(
      pos: Long,
      ref: String,
      alt: String,
      snvLabel: String = "snv"): NormalizedAllele = {
    if (alt == "*") {
      NormalizedAllele(pos, pos + ref.length, Some(ref), None, None, "deletion")
    } else if (ref.length > alt.length && alt.length == 1) {
      val start = pos + 1
      val newRef = ref.substring(1)
      NormalizedAllele(start, start + newRef.length, Some(newRef), None,
        Some(alt), "deletion")
    } else if (ref.length > alt.length && ref.startsWith(alt)) {
      val start = pos + alt.length
      val newRef = ref.substring(alt.length)
      NormalizedAllele(start, start + newRef.length, Some(newRef), None,
        Some(alt), "deletion")
    } else if (alt.length > ref.length && ref.length == 1) {
      val start = pos + 1
      NormalizedAllele(start, start + 1, None, Some(alt.substring(1)),
        Some(ref), "insertion")
    } else if (alt.length > ref.length && alt.startsWith(ref)) {
      val start = pos + ref.length
      NormalizedAllele(start, start + 1, None, Some(alt.substring(ref.length)),
        Some(ref), "insertion")
    } else if (ref.length == alt.length) {
      if (ref.length > 1)
        NormalizedAllele(pos, pos + ref.length, Some(ref), Some(alt), None, "mnv")
      else
        NormalizedAllele(pos, pos + 1, Some(ref), Some(alt), None, snvLabel)
    } else if (ref.length > alt.length) {
      NormalizedAllele(pos, pos + ref.length, Some(ref), Some(alt), None, "delins")
    } else {
      NormalizedAllele(pos, pos + 1, Some(ref), Some(alt), None, "delins")
    }
  }

  // §2.7 thresholds (decompiled rgdcore:Zygosity static init).
  val HomozygousPercent       = 100.0f
  val PossiblyHomozygousPct   = 85.0f
  val ProbablyHemizygousPct   = 85.0f
  val PossibleErrorPercent    = 15.0f

  /**
   * §2.7: zygosity classification (decompiled rgdcore:Zygosity
   * .computeZygosityStatus). `percentRead` is the rounded percent
   * `(int)(pct + 0.5f)`; the reference then overwrites the stored value with
   * int division (HrdpVariants.java:489-490) — that quirk is applied by the
   * caller under CompatFlags.intDivisionPercentRead, not here.
   *
   * The PAR (pseudo-autosomal region) branch only fires for gender M/P on
   * chromosomes X/Y; the reference's PAR tables are hardcoded for human
   * builds 36/37 and never fire for HRDP rat data (gender always 'U'), so
   * PAR membership is injected (defaults to never).
   */
  def zygosity(
      varFreq: Int,
      depth: Int,
      gender: String,
      chromosome: String,
      startPos: Long,
      inPar: (String, Long) => Boolean = (_, _) => false): ZygosityResult = {
    val pct: Float = if (depth == 0) 0f else varFreq * 100f / depth
    val percentRead = (pct + 0.5f).toInt
    val sexChrom = chromosome == "X" || chromosome == "Y"
    val male = gender == "M" || gender == "P"
    val (status, inPseudo) =
      if (male && sexChrom) {
        if (inPar(chromosome, startPos)) {
          val s = if (pct == HomozygousPercent) "homozygous"
                  else if (pct >= PossiblyHomozygousPct) "possibly homozygous"
                  else "heterozygous"
          (s, "Y")
        } else {
          val s = if (pct == HomozygousPercent) "hemizygous"
                  else if (pct >= ProbablyHemizygousPct) "probably hemizygous"
                  else "possibly hemizygous"
          (s, "N")
        }
      } else {
        val s = if (pct == HomozygousPercent) "homozygous"
                else if (pct >= PossiblyHomozygousPct) "possibly homozygous"
                else "heterozygous"
        (s, "N")
      }
    val possError = if (pct <= PossibleErrorPercent) "Y" else "N"
    ZygosityResult(status, percentRead, possError, inPseudo)
  }

  /**
   * P12: VCF sample-column/file name → strain symbol
   * (HrdpVariants.getStrainName, HrdpVariants.java:140-161):
   * strip all "_PASS"; drop the last two '_'-separated segments; append ")";
   * if >2 underscores remain, first '_'→'-'; then (unconditionally) first
   * '_'→'/'; finally ALL remaining '_'→" (".
   */
  def strainName(fileName: String): String = {
    var s = fileName.replace("_PASS", "")
    s = s.substring(0, s.lastIndexOf('_'))
    s = s.substring(0, s.lastIndexOf('_')) + ")"
    if (s.count(_ == '_') > 2) {
      s = s.replaceFirst("_", "-")
    }
    s = s.replaceFirst("_", "/")
    s.replace("_", " (")
  }

  /** getStrainRgdId's key derivation (HrdpVariants.java:508-512):
    * symbol text before the " (" suffix. */
  def taglessStrainSymbol(sampleName: String): String =
    sampleName.substring(0, sampleName.indexOf('(') - 1)

  /** J1 overlap predicate (GeneCache.java:72-77): variant [s,e] overlaps
    * gene [gs,ge]. The reference's three conditions (containment,
    * left-straddle, right-straddle) reduce to the standard interval test. */
  def intervalsOverlap(s: Long, e: Long, gs: Long, ge: Long): Boolean =
    gs <= e && ge >= s
}
