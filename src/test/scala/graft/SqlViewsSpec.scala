package graft

import org.apache.spark.sql.functions._
import graft.sql.GraftViews

/** The SQL front end must reach the EXTENSION operators (dedup, ANN,
  * corpus pipeline), not just base tables — each view is consumed here
  * through real SQL (filters/joins/aggregates over the view) and checked
  * against the programmatic API's answer. q_sql_neardup is the
  * oracle-checked member of this family.
  */
class SqlViewsSpec extends SparkSpecBase {
  import spark.implicits._

  test("ann_topk view: SQL rank filter matches the programmatic top-k") {
    GraftViews.registerAnnTopK(spark, Sf001)
    val viaSql = spark.sql(
        "SELECT query_id, neighbor_id FROM ann_topk WHERE rank = 1")
      .as[(Long, Long)].collect().toSet
    val prog = SparkEntry.queries("q_ann_topk")(spark, Sf001)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(viaSql === prog)
    assert(viaSql.size === 5, "one rank-1 neighbor per query vector")
  }

  test("dup_components view: SQL aggregates over closure labels match the operator") {
    GraftViews.registerDupComponents(spark, Sf001)
    val viaSql = spark.sql(
        """SELECT root, CAST(count(*) AS BIGINT) AS size
          |FROM dup_components GROUP BY root HAVING count(*) > 1""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val prog = ops.Dedup.componentMinLabels(
        ops.Dedup.minhashNearDupPairs(
          sources.Tables.documents(spark, Sf001), "text", "doc_id"))
      .groupBy("root").agg(count(lit(1)).as("size"))
      .filter(col("size") > 1).as[(Long, Long)].collect().toMap
    assert(viaSql === prog)
    assert(viaSql.nonEmpty, "sf0.01 plants near-dup pairs — components must exist")
  }

  test("corpus_stats + base views: SQL can join pipeline output back to the corpus") {
    GraftViews.registerBase(spark, Sf001)
    GraftViews.registerCorpusStats(spark, Sf001)
    val stats = spark.sql("SELECT * FROM corpus_stats")
    assert(stats.count() > 0)
    // a view consumer can mix operator output with base tables in one query
    val joined = spark.sql(
      """SELECT count(*) AS n FROM corpus_stats cs
        |JOIN (SELECT DISTINCT source FROM documents_v) d
        |  ON cs.source = d.source""".stripMargin).as[Long].head()
    assert(joined > 0)
  }
}
