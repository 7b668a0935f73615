package graft

import graft.ml.Clustering

class ClusteringSpec extends SparkSpecBase {
  import spark.implicits._

  // two well-separated 1-d blobs + the reference's boolean second feature
  private def blobs = (
    (1 to 20).map(i => (i.toLong, -100.0 + i * 0.1, true)) ++
    (1 to 20).map(i => (100 + i.toLong, 100.0 + i * 0.1, false))
  ).toDF("id", "change", "is_reduced")

  test("fitPredict recovers well-separated clusters (k=2)") {
    val fitted = Clustering.fitPredict(blobs, Seq("change", "is_reduced"), k = 2, seed = 1L)
    val sizes = fitted.predictions.groupBy("cluster").count()
      .collect().map(_.getLong(1)).sorted
    assert(sizes === Array(20L, 20L))
    assert(fitted.silhouette > 0.9)
    assert(fitted.centers.length === 2)
  }

  test("clusterInfo labels cluster value ranges (project-co2.py:130-133)") {
    val fitted = Clustering.fitPredict(blobs, Seq("change", "is_reduced"), k = 2, seed = 1L)
    val info = Clustering.clusterInfo(fitted.predictions, "change")
    assert(info.count() === 2)
    val labels = info.select("label").as[String].collect()
    labels.foreach(l => assert(l.matches("-?[\\d,.]+ - -?[\\d,.]+")))
  }

  test("kSweep returns a silhouette per k (project-co2.py:44-49)") {
    val assembled = Clustering.assemble(blobs, Seq("change", "is_reduced"))
    val sweep = Clustering.kSweep(assembled, 2 to 3, sampleFraction = 1.0)
    assert(sweep.map(_._1) === Seq(2, 3))
    sweep.foreach { case (_, s) => assert(s >= -1.0 && s <= 1.0) }
  }

  test("exact-reference check: k=3 recovers the ground-truth partition of separated blobs") {
    // With well-separated blobs and k = blob count, ANY correct k-means
    // converges to the ground-truth partition — an exact oracle that
    // needs no reference implementation.
    import org.apache.spark.sql.functions._
    val pts = (
      (0 until 30).map(i => (i.toLong, 0.0 + (i % 5) * 0.01, 0L)) ++
      (0 until 30).map(i => (100 + i.toLong, 50.0 + (i % 5) * 0.01, 1L)) ++
      (0 until 30).map(i => (200 + i.toLong, -70.0 + (i % 5) * 0.01, 2L))
    ).toDF("id", "change", "truth")
    val fitted = Clustering.fitPredict(pts, Seq("change"), k = 3, seed = 1L)
    // partition equality up to cluster relabeling: each predicted
    // cluster maps to exactly one truth blob and vice versa
    val pairs = fitted.predictions.select("truth", "cluster")
      .distinct().as[(Long, Int)].collect()
    assert(pairs.length === 3)
    assert(pairs.map(_._1).distinct.length === 3)
    assert(pairs.map(_._2).distinct.length === 3)
  }

  test("fitPredict is deterministic under a fixed seed") {
    val a = Clustering.fitPredict(blobs, Seq("change", "is_reduced"), k = 2, seed = 7L)
    val b = Clustering.fitPredict(blobs, Seq("change", "is_reduced"), k = 2, seed = 7L)
    assert(a.centers.map(_.toSeq).toSeq === b.centers.map(_.toSeq).toSeq)
    assert(a.silhouette === b.silhouette)
  }

  test("kSweep elbow runs end-to-end on sf0.001 change data with real seeded sampling") {
    val change = graft.ops.PeriodChange.changeBetween(
      graft.sources.Tables.orders(spark, Sf0001), Seq("o_custkey"),
      org.apache.spark.sql.functions.year(org.apache.spark.sql.functions.col("o_orderdate")),
      org.apache.spark.sql.functions.col("o_totalprice"), 1996, 2000)
    val assembled = Clustering.assemble(change, Seq("change", "is_reduced"))
    val sweep = Clustering.kSweep(assembled, 2 to 6, sampleFraction = 0.5, seed = 42L)
    assert(sweep.map(_._1) === Seq(2, 3, 4, 5, 6))
    sweep.foreach { case (_, s) => assert(s >= -1.0 && s <= 1.0) }
    // the data has genuine cluster structure, so the best silhouette
    // must beat an uninformative 0
    assert(sweep.map(_._2).max > 0.0)
  }

  test("fitPredict fits on the FULL frame (pinned deviation from project-co2.py:65)") {
    // The reference fits its final model on the k-sweep's 10% sample;
    // fitPredict deliberately fits on the full frame (scaladoc records
    // why). Witness: predictions cover EVERY input row with a real
    // cluster assignment, and with two ideally-separated blobs the
    // full-fit centres land inside their blobs — a 10%-sample fit of
    // this 40-row frame (4 rows) could not even guarantee seeing both
    // blobs. If fitPredict ever regresses to sample-fitting, the
    // all-rows-predicted invariant still holds but the centre-accuracy
    // one fails with high probability under any fixed seed.
    val f = Clustering.fitPredict(blobs, Seq("change", "is_reduced"), k = 2, seed = 1L)
    assert(f.predictions.count() === 40L, "every input row gets a prediction")
    val centres = f.centers.map(_.head).sorted
    assert(centres(0) > -101 && centres(0) < -97, s"low blob centre: ${centres(0)}")
    assert(centres(1) > 99 && centres(1) < 103, s"high blob centre: ${centres(1)}")
  }
}
