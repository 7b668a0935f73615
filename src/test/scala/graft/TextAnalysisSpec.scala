package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("hello world, foo-bar!").toDF("t")
    val ws = df.select(TextAnalysis.tokenCountWs(col("t"))).as[Int].head()
    assert(ws === 3) // "hello", "world,", "foo-bar!"
    val bp = df.select(TextAnalysis.tokenCountBpeish(col("t"))).as[Int].head()
    assert(bp === 7) // hello world , foo - bar !
  }

  test("punct ratio and stopword ratio") {
    val df = Seq("the cat, the dog.").toDF("t")
    val pr = df.select(TextAnalysis.punctRatio(col("t"))).as[Double].head()
    assert(math.abs(pr - 2.0 / 17.0) < 1e-12)
    val sr = df.select(TextAnalysis.stopwordRatio(col("t"))).as[Double].head()
    assert(sr === 0.5) // "the", "the" of 4 tokens
  }

  test("langIdHeuristic identifies real sentences deterministically") {
    val df = Seq(
      "the cat and the dog sat on the mat in that house",
      "el perro y el gato en la casa de los vecinos",
      "der hund und die katze sind nicht in das haus",
      "le chien et le chat sont dans les maisons des voisins",
      "zzz qqq xxx www"
    ).toDF("t")
    val got = df.select(TextAnalysis.langIdHeuristic(col("t"))).as[String].collect()
    assert(got === Array("en", "es", "de", "fr", "und"))
  }

  test("quality score stays in sane range and rewards real prose") {
    val df = Seq(
      "the analysis of spark plans is important for the performance of a query engine and the cost of a shuffle at scale is the dominant factor in most of the workloads that we see in practice today",
      "x"
    ).toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(q(0) > 0.7)
    assert(q(1) < 0.4)
    q.foreach(v => assert(v >= -0.2 && v <= 1.1))
  }

  test("fingerprints: md5 matches a known value, rolling hash distinct") {
    val df = Seq("abc").toDF("t")
    val md5v = df.select(TextAnalysis.fingerprintMd5(col("t"))).as[String].head()
    assert(md5v === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("withTextMetrics adds all columns in one projection") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val got = TextAnalysis.withTextMetrics(docs, "text")
    val cols = got.columns.toSet
    assert(Set("n_tokens_ws", "n_tokens_bpeish", "n_punct", "stopword_hits",
      "quality", "lang_id", "fp_md5").subsetOf(cols))
    assert(got.count() === docs.count())
  }

  test("q_token_budget: two-phase level selection equals the row-level cumsum") {
    // the E147 query splits selection into whole-quality-levels + one
    // ranked boundary level (the scale shape); prove it selects the
    // EXACT same doc set as the direct (quality desc, doc_id) running-
    // total definition, reconstructed here from the raw metrics
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val metrics = docs.select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.round(
          TextAnalysis.qualityScore(col("text")) * 10000).cast("long").as("qm"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("tok"))
      .as[(Long, String, Long, Long)].collect()
    val budget = metrics.map(_._4).sum / 2
    var cum = 0L
    val sel = metrics.sortBy { case (id, _, qm, _) => (-qm, id) }
      .takeWhile { case (_, _, _, tok) => { cum += tok; cum <= budget } }
    val want = sel.groupBy(_._2).map { case (src, rs) =>
      src -> (rs.length.toLong, rs.map(_._4).sum, rs.map(_._3).min) }
    val got = graft.SparkEntry.queries("q_token_budget")(spark, Sf0001)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === want, "two-phase selection must equal the definition")
  }
}
