package graft

import org.apache.spark.sql.functions._

/** The bounded-heap smallest-k aggregate behind the simjoin exact-df
  * prefix (r16 — the single-node-safe replacement for the
  * collect_list + sort_array regroup, SURVEY §5 note 21), plus the
  * named shuffle-partition sizing helper both self-join funnels share.
  */
class PrefixSmallestKSpec extends SparkSpecBase {
  import spark.implicits._

  test("smallest_k == slice(sort_array(collect_list(struct)), 1, k) on fuzzed pairs") {
    val rnd = new scala.util.Random(42)
    // 40 groups, 1..120 rows each, adversarial hi/lo ranges incl.
    // negative lows (the gram XOR Long.MinValue encoding) and ties on hi
    val rows = (0 until 40).flatMap { g =>
      val n = 1 + rnd.nextInt(120)
      val k = 1 + rnd.nextInt(20)
      (0 until n).map { _ =>
        (g.toLong, rnd.nextInt(5).toLong << 56 | rnd.nextInt(1 << 20).toLong,
          rnd.nextLong(), k)
      }
    }
    val df = rows.toDF("grp", "hi", "lo", "k").repartition(7, col("lo"))
    val viaAgg = df.groupBy(col("grp"))
      .agg(functions.PrefixSmallestK.agg(col("hi"), col("lo"), col("k")).as("pref"))
    val viaSort = df.groupBy(col("grp"))
      .agg(expr("slice(sort_array(collect_list(struct(hi, lo))), 1, any_value(k))").as("pref"))
    val a = viaAgg.orderBy("grp").collect().map(_.toString)
    val b = viaSort.orderBy("grp").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("smallest_k merges partials across partitions (k from either side)") {
    // one group scattered over every partition: partial buffers merge,
    // some partials start empty (k = -1) and adopt the partner's k
    val df = (1L to 1000L).map(i => (1L, i % 13, i, 5)).toDF("grp", "hi", "lo", "k")
      .repartition(16)
    val out = df.groupBy(col("grp"))
      .agg(functions.PrefixSmallestK.agg(col("hi"), col("lo"), col("k")).as("pref"))
      .select(explode(col("pref")).as("e"))
      .select(col("e.hi"), col("e.lo")).as[(Long, Long)]
      .collect().toSeq
    // smallest 5 of (i % 13, i): hi=0 at i in {13,26,...}; smallest los
    assert(out === Seq((0L, 13L), (0L, 26L), (0L, 39L), (0L, 52L), (0L, 65L)))
  }

  test("smallest_k is callable from SQL (E63 registry contract)") {
    org.apache.spark.sql.graft.GraftFunctionRegistry.register(spark)
    Seq((1, 3L, 10L, 2), (1, 1L, 20L, 2), (1, 2L, 30L, 2))
      .toDF("g", "hi", "lo", "k").createOrReplaceTempView("sk_in")
    val r = spark.sql(
      "SELECT smallest_k(hi, lo, k) AS p FROM sk_in GROUP BY g")
      .select(expr("transform(p, x -> x.hi)")).head().getSeq[Long](0)
    assert(r === Seq(1L, 2L))
  }

  test("sizedShufflePartitions: floor, growth, and the bypass cap (r14 boundary)") {
    import ops.Dedup.sizedShufflePartitions
    // small corpus: session partitioning wins
    assert(sizedShufflePartitions(4000L, 500000L, 32, 200) === 32)
    // growth: one partition per rowsPerTask
    assert(sizedShufflePartitions(40000000L, 500000L, 32, 200) === 81)
    // cap: bypassMergeThreshold - 8, never crossed
    assert(sizedShufflePartitions(400000000L, 500000L, 32, 200) === 192)
    // a raised threshold raises the cap with it
    assert(sizedShufflePartitions(400000000L, 500000L, 32, 4096) === 801)
    // the r15 embed probe point: 4M vectors x 10 tables
    assert(sizedShufflePartitions(40000000L, 500000L, 32, 200) === 81)
  }
}
