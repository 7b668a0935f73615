package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Skyline}

class GraphSkylineSpec extends SparkSpecBase {
  import spark.implicits._

  test("triangleCount: K4 plus a pendant edge has exactly 4 triangles") {
    // K4 = 4 triangles; the pendant (4,5) joins none. Edges arrive in
    // mixed orientation with a duplicate — triangleCount normalizes.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L), // duplicate of (1,2), reversed
      (4L, 5L)
    ).toDF("u", "v")
    val n = Graph.triangleCount(edges).as[Long].head()
    assert(n === 4L)
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("u", "v")
    assert(Graph.triangleCount(edges).as[Long].head() === 0L)
  }

  test("pareto2d keeps exactly the non-dominated points, ties and dups included") {
    val pts = Seq(
      (1L, 10L, 5), // frontier
      (2L, 20L, 3), // frontier
      (3L, 20L, 3), // duplicate of (20,3): neither dominates — both stay
      (4L, 30L, 1), // frontier
      (5L, 20L, 4), // dominated by (20,3): same x, larger y
      (6L, 25L, 3), // dominated by (20,3): larger x, same y
      (7L, 40L, 1), // dominated by (30,1)
      (8L, 50L, 9)  // dominated by everything
    ).toDF("id", "x", "y")
    // binWidth 10 forces cross-bin domination through the prefix path
    val kept = Skyline.pareto2d(pts, "x", "y", binWidth = 10L)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("pareto2d matches the quadratic definition on random points") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000))).toDF("id", "x", "y")
    val fast = Skyline.pareto2d(pts, "x", "y", binWidth = 100L)
      .select("id").as[Long].collect().toSet
    val brute = pts.as("s").join(pts.as("q"),
        col("q.x") <= col("s.x") && col("q.y") <= col("s.y") &&
          (col("q.x") < col("s.x") || col("q.y") < col("s.y")), "left_anti")
      .select(col("s.id")).as[Long].collect().toSet
    assert(brute.nonEmpty)
    assert(fast === brute)
  }
}
