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
}
