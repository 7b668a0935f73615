package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.exprs
import graft.ops.Similarity

/** Streaming retrieval: score query vectors ON ARRIVAL against a
  * static PQ-coded corpus — the embed-and-retrieve shape serving
  * pipelines run (new documents or queries stream in; the index is a
  * periodically rebuilt static table).
  *
  * Per microbatch the incoming vectors get their integer ADC table
  * ([[graft.functions.HashKernels.pqTableQ]] with the codebook riding
  * as a codegen literal — the batch path's exact kernels), the static
  * codes table is scanned in the compressed domain (m integer adds per
  * candidate over an m-byte code), and the bounded-heap shortlist is
  * handed to `process`. Top-k per query is batch-scoped BY SEMANTICS:
  * a query is answered once, on arrival — no cross-batch state, so
  * there is nothing to watermark and the microbatch output is
  * IDENTICAL to what the batch ADC path produces for the same query
  * set (StreamingSpec proves the parity).
  *
  * At 100 TB the codes table is ~32× smaller than the vectors and
  * partition-prunable (pair with [[graft.ops.Similarity.buildPqIndex]]
  * written `partitionBy(cell)` for the IVF+PQ variant); the per-batch
  * driver cost is one job per trigger, like any foreachBatch sink.
  */
object StreamRetrieval {

  /** Start the score-on-arrival query. `queries` must be a STREAMING
    * frame with (`queryId`, `queryVec`); `codes` the static
    * (neighbor_id, codes) table from
    * [[graft.ops.Similarity.buildPqIndex]]; `process` receives each
    * microbatch's (query_id, rank, neighbor_id, cosine=integer ADC as
    * double) shortlist with the batch id.
    */
  def shortlistOnArrival(
      queries: DataFrame, queryId: String, queryVec: String,
      codes: DataFrame, cb: Array[Long], m: Int, codebookSize: Int,
      rerank: Int, checkpoint: String)(
      process: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        val qt = batch.select(col(queryId).as("query_id"),
          exprs.pq_table_q(exprs.quant_norm20(col(queryVec)),
            cb, m, codebookSize).as("qt"))
        val pre = codes.crossJoin(broadcast(qt))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            exprs.pq_adc_score_q(col("codes"), col("qt"), codebookSize)
              .cast("double").as("cosine"))
        process(Similarity.topKPerQuery(pre, rerank), batchId)
      }
      .start()
}
