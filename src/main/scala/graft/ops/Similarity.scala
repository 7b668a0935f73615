package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.exprs

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set, scan
  *    the corpus ONCE computing all query similarities per row, then
  *    top-k per query. The corpus is never shuffled in full: rows are
  *    pre-filtered to each query's per-partition ceiling before the
  *    single (query_id)-keyed exchange.
  *  - [[lshTopK]]: approximate — hyperplane-sign buckets co-partition
  *    corpus and queries, so each query compares against its bucket only.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = exprs.cosine_f(a, b)

  def hyperplaneSignature(vec: Column, numPlanes: Int, dim: Int, seed: Long): Column =
    exprs.hyperplane_sig(vec, numPlanes, dim, seed)

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` must be small (it is broadcast). Similarity is rounded to
    * 9 dp before ranking so orderings are reproducible across engines;
    * ties break by ascending corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .select(
        col(queryId).as("query_id"),
        col(corpusId).as("neighbor_id"),
        round(exprs.cosine_f(col(corpusVec), col(queryVec)), 9).as("cosine"))
      .filter(col("query_id") =!= col("neighbor_id"))
    topKPerQuery(scored, k)
  }

  /** Approximate top-k: candidates share the query's LSH bucket. With
    * `numPlanes` bits the corpus splits into ~2^numPlanes buckets, so
    * each query touches corpus/2^numPlanes rows — the scan cost drops by
    * that factor at the price of recall (raise recall with multi-probe /
    * fewer planes).
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val cb = corpus.select(
      col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"),
      hyperplaneSignature(col(corpusVec), numPlanes, dim, seed).as("bucket"))
    val qb = queries.select(
      col(queryId).as("query_id"), col(queryVec).as("qv"),
      hyperplaneSignature(col(queryVec), numPlanes, dim, seed).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(exprs.cosine_f(col("cv"), col("qv")), 9).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Two-stage top-k. A single `Window.partitionBy(query_id)` funnels
    * the entire scored corpus for one query into ONE reducer — the skew
    * wall at scale. Stage 1 ranks within (query_id, input-partition) so
    * the heavy rank is spread across all reducers; stage 2 ranks only the
    * surviving partitions×k rows per query. (r2 plan: replace stage 1
    * with a bounded-heap TypedImperativeAggregate so the first exchange
    * carries just k rows per map task.)
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val partial = Window
      .partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val exact = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("prn", row_number().over(partial))
      .filter(col("prn") <= k)
      .drop("prn")
      .withColumn("rank", row_number().over(exact))
      .filter(col("rank") <= k)
  }
}
