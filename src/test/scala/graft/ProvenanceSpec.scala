package graft

import org.apache.spark.sql.functions._

/** q_provenance (E127): the per-survivor lineage record of the corpus
  * curation pipeline. The oracle proves cross-engine value equality;
  * this spec proves the STRUCTURAL contract — families partition the
  * kept set, survivors are family minima, and the rendered transform
  * chain is consistent with the record's own fields.
  */
class ProvenanceSpec extends SparkSpecBase {
  import spark.implicits._

  test("families partition the kept set; survivors are family minima; chain is consistent") {
    val rows = SparkEntry.queries("q_provenance")(spark, Sf0001)
      .select("doc_id", "source", "quality_milli", "n_tokens",
        "n_family", "family_id_sum", "transform_chain")
      .as[(Long, String, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one record per survivor")

    rows.foreach { case (id, src, qm, nt, nf, sum, chain) =>
      assert(nt > 0)
      assert(chain == s"ingest:$src>lang:en>quality:$qm>dedup:family=$nf",
        s"chain for $id diverges from its own fields")
      assert(nf >= 1 && sum >= id)
      // keep-first: the survivor is its family's minimum id, so every
      // absorbed member contributes more than `id` to the checksum
      assert(sum >= id * nf, s"survivor $id is not its family's min id")
      if (nf == 1) assert(sum == id)
    }

    // the families partition the kept set exactly: total membership ==
    // the enrichment filter's kept count, recomputed independently
    val docs = sources.Tables.documents(spark, Sf0001)
    val kept = docs.filter(
      graft.ops.TextAnalysis.langIdHeuristic(col("text")) === "en" &&
        graft.ops.TextAnalysis.qualityScore(col("text")) >= 0.5).count()
    assert(rows.map(_._5).sum == kept,
      s"family sizes sum to ${rows.map(_._5).sum}, kept set is $kept")
  }
}
