package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctionRegistry
import graft.functions.exprs

/** SQL front-end parity for the custom expressions: every function the
  * Column API exposes must resolve and agree when called from SQL.
  */
class SqlFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctionRegistry.register(spark)
  }

  test("rolling_hash / simhash64 / shingle_set agree between SQL and Column API") {
    Seq(("the quick brown fox", 1L)).toDF("t", "id").createOrReplaceTempView("sqlfn_t")
    val viaSql = spark.sql(
      """SELECT rolling_hash(t) AS rh, simhash64(t, 3) AS sh,
        |       shingle_set(t, 5) AS ss, minhash_sig(t, 5, 16, 42) AS ms
        |FROM sqlfn_t""".stripMargin)
      .as[(Long, Long, Seq[Int], Seq[Long])].head()
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(exprs.rolling_hash(col("t")), exprs.simhash64(col("t"), 3),
        exprs.shingle_set(col("t"), 5), exprs.minhash_sig(col("t"), 5, 16, 42L))
      .as[(Long, Long, Seq[Int], Seq[Long])].head()
    assert(viaSql === viaCol)
  }

  test("cosine_f and jaccard_sorted callable from SQL with literal arrays") {
    val c = spark.sql(
      """SELECT cosine_f(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c,
        |       jaccard_sorted(array(1, 2, 3), array(2, 3, 4)) AS j""".stripMargin)
      .as[(Double, Double)].head()
    assert(math.abs(c._1 - 1.0) < 1e-12)
    assert(math.abs(c._2 - 0.5) < 1e-12)
  }

  test("production route: SparkSessionExtensions registers functions at session build") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    // a fresh session on the SAME SparkContext, built through the
    // extensions hook exactly as spark.sql.extensions would do it
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT rolling_hash('graft') AS h").collect().head.getLong(0)
      val want = Seq("graft").toDF("t")
        .select(exprs.rolling_hash(col("t"))).as[Long].head()
      assert(got === want)
      // the extension also injects the range-join rewrite rule: a
      // keyless inequality join must not nested-loop on this session
      import s2.implicits._
      val p = Seq((1L, 100L)).toDF("pid", "t")
      val iv = Seq((50L, 300L)).toDF("lo", "hi")
      val rj = p.join(iv, p("t") >= iv("lo") && p("t") <= iv("hi"))
      assert(rj.collect().length === 1)
      val plan = rj.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_bin"),
        s"injectOptimizerRule route must rewrite range joins:\n$plan")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("aggregate kernels reach SQL: topk_by_score and count_min/cm_estimate") {
    Seq((1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 7.0, 12L), (2L, 1.0, 20L))
      .toDF("g", "score", "id").createOrReplaceTempView("sqlfn_agg")
    val top = spark.sql(
      """SELECT g, topk_by_score(score, id, 2) AS top
        |FROM sqlfn_agg GROUP BY g""".stripMargin)
      .select(col("g"), col("top.id"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(top(1L) === Seq(11L, 12L) && top(2L) === Seq(20L))

    Seq("a", "b", "a", "a").toDF("t").createOrReplaceTempView("sqlfn_cm")
    val est = spark.sql(
      """SELECT cm_estimate(count_min(t, 3, 64, 7), 'a', 3, 64, 7) AS e
        |FROM sqlfn_cm""".stripMargin).as[Long].head()
    assert(est === 3L, "exact on a collision-free toy sketch")
  }

  test("percentile_spill and luhn_card_count reach SQL") {
    Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("g", "v").createOrReplaceTempView("sqlfn_pct")
    val got = spark.sql(
      """SELECT g, percentile_spill(v, array(0.5)) AS ps,
        |       percentile(v, array(0.5)) AS builtin
        |FROM sqlfn_pct GROUP BY g""".stripMargin)
      .select(col("g"), col("ps")(0), col("builtin")(0))
      .as[(String, Double, Double)].collect()
    got.foreach { case (g, s, b) => assert(s === b, s"group $g") }

    val luhn = spark.sql(
      "SELECT luhn_card_count('pay 4532015112830366 not 4532015112830367')")
      .as[Int].head()
    assert(luhn === 1)
  }

  test("SQL registry coerces non-canonical input types (int value columns)") {
    // r6 ADVICE: the SQL path passed the value child uncast, so an INT
    // column ClassCastException'd in percentile_spill.update (and
    // luhn_card_count on non-string input likewise) — the registry now
    // casts explicitly; pin both
    Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10))
      .toDF("g", "vi").createOrReplaceTempView("sqlfn_pct_int")
    val got = spark.sql(
      """SELECT g, percentile_spill(vi, array(0.5)) AS ps,
        |       percentile(vi, array(0.5)) AS builtin
        |FROM sqlfn_pct_int GROUP BY g""".stripMargin)
      .select(col("g"), col("ps")(0), col("builtin")(0))
      .as[(String, Double, Double)].collect()
    got.foreach { case (g, s, b) => assert(s === b, s"group $g") }

    val luhn = spark.sql("SELECT luhn_card_count(4532015112830366)")
      .as[Int].head()
    assert(luhn === 1, "digits-of-a-bigint input routes through the string cast")
  }

  test("non-literal shape parameter is rejected with a clear error") {
    Seq(("x", 3)).toDF("t", "n").createOrReplaceTempView("sqlfn_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT simhash64(t, n) FROM sqlfn_bad").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
