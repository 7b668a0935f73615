package graft

import org.scalatest.funsuite.AnyFunSuite

/** Consistency of the query surface itself — guards the contract the
  * driver's correctness gate depends on: every query either carries a
  * DuckDB oracle or is on the EXPLICIT no-oracle list (each of those is
  * covered by an exact-reference or bound spec instead), and SURVEY §2
  * never references a query that doesn't exist.
  */
class SurfaceSpec extends AnyFunSuite {

  /** Queries with no cross-engine SQL oracle, each justified in
    * SURVEY §2: sketches and ANN measure error/recall instead; KMeans
    * and SimHash bucketing have exact-equivalence specs.
    */
  private val noOracleAllowed = Set(
    "q_ann_ivfpq", "q_ann_ivfpq_recall",
    // q_ann_lsh / q_ann_lsh_recall moved OFF this list in r9: the
    // Rademacher integer signature made candidate generation
    // DuckDB-replayable, so both are fully oracled now.
    // q_ann_ivf / q_ann_ivf_recall / q_ann_ivf_sweep followed later in
    // r9: the IVF front half moved to the same portable integer
    // discipline (md5 fit draw, integer Lloyd, rank-select radii,
    // integer Rademacher sketch) — fully oracled now.
    // The PQ family stays: its codebook fit is java.util.Random
    // k-means++ over float-normalized subvectors — replaying Java's
    // LCG in SQL is not reasonable, and changing the fit would
    // republish every PQ/IVFPQ recall curve for no correctness gain
    // (SimilaritySpec pins the curves and floors).
    "q_ann_pq", "q_ann_pq_recall",
    // q_approx_distinct / q_approx_quantile moved OFF this list in r8:
    // their bounded-error verdicts are DuckDB-oracled now
    "q_kmeans_clusters",
    // q_semdedup moved OFF this list in r9: the portable integer Lloyd
    // (md5-rank init, quantized components, truncating-div centroids)
    // made the whole operator DuckDB-replayable — full oracle now,
    // with DedupSpec still pinning the invariants
    "q_ann_ivfpq_sweep", "q_ann_ivfpq_grid")

  test("every query has an oracle or a documented exemption") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphanOracles = o -- q
    assert(orphanOracles.isEmpty, s"oracles without a query: $orphanOracles")
    val missing = q -- o -- noOracleAllowed
    assert(missing.isEmpty,
      s"queries with neither oracle nor exemption: $missing")
    val stale = noOracleAllowed -- (q -- o)
    assert(stale.isEmpty, s"exemptions no longer needed (add the oracle!): $stale")
  }

  test("SURVEY §2 headline row count matches the table") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val rows = """(?m)^\|\s*([RE])\d+\s*\|""".r.findAllMatchIn(survey).toSeq
    val (r, e) = (rows.count(_.group(1) == "R"), rows.count(_.group(1) == "E"))
    val headline =
      """Counts \(r\d+\): (\d+) rows — (\d+) R \+ (\d+) E""".r
        .findFirstMatchIn(survey)
        .getOrElse(fail("SURVEY.md headline count line not found"))
    assert(headline.group(1).toInt == r + e,
      s"headline says ${headline.group(1)} rows, table has ${r + e}")
    assert(headline.group(2).toInt == r && headline.group(3).toInt == e,
      s"headline R/E split ${headline.group(2)}/${headline.group(3)} vs table $r/$e")
  }

  test("SURVEY §2 references only real queries, and every query is referenced") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val referenced = "q_[a-z0-9_]+".r.findAllIn(survey).toSet
    val q = SparkEntry.queries.keySet
    val ghosts = referenced -- q
    assert(ghosts.isEmpty, s"SURVEY names nonexistent queries: $ghosts")
    val undocumented = q -- referenced
    assert(undocumented.isEmpty, s"queries missing from SURVEY §2: $undocumented")
  }
}
