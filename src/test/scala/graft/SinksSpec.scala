package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  test("ORC round-trip: schema, values, and predicate pushdown survive the format") {
    // second columnar format besides parquet — same writer/reader API
    // surface, same pushdown semantics (ORC scans carry PushedFilters
    // from min/max stripe stats just like parquet row groups)
    val path = "/tmp/graft-orc-lineitem"
    val li = Tables.lineitem(spark, Sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema === li.schema, "ORC must preserve the schema exactly")
    assert(back.count() === li.count())
    val filtered = back.filter(col("l_quantity") > 25.0)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("l_quantity"),
      s"quantity filter must reach the ORC scan:\n$p")
    assert(filtered.count() ===
      li.filter(col("l_quantity") > 25.0).count())
  }

  test("partitioned write prunes directories at planning time") {
    val path = "/tmp/graft-sinks-orders"
    val orders = Tables.orders(spark, Sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
    Sinks.writePartitioned(orders, path, Seq("o_year"))

    // hive-style layout on disk
    val dirs = Files.list(Paths.get(path)).iterator()
    val partDirs = Iterator.continually(dirs)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.startsWith("o_year=")).toSet
    assert(partDirs.size > 1, s"expected multiple year partitions, got $partDirs")

    val filtered = spark.read.parquet(path).filter(col("o_year") === 1996)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("o_year"), "partition filter must reach the scan")

    // pruning is real: the scan reads only the matching partition's rows
    val want = orders.filter(col("o_year") === 1996).count()
    assert(filtered.count() === want)
    val unpruned = spark.read.parquet(path).count()
    assert(unpruned > want, "sanity: other partitions exist")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    val path = "/tmp/graft-dpp-orders"
    val orders = Tables.orders(spark, Sf001)
      .withColumn("o_year", year(col("o_orderdate")))
    Sinks.writePartitioned(orders, path, Seq("o_year"))

    // dim carries the year but the FILTER is on an unrelated column, so
    // static pruning can't see it — only DPP (subquery built from the
    // joined dim at runtime) can skip the fact partitions. The dim must
    // be a real datasource: a local Seq constant-folds its filter away
    // and DPP sees no selective predicate.
    val dimPath = "/tmp/graft-dpp-dim"
    Seq((1995, "old"), (1996, "keep"), (1997, "old"))
      .toDF("d_year", "d_tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.parquet(path)
    val joined = fact.join(dim,
      fact("o_year") === dim("d_year") && dim("d_tag") === "keep")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning filter on o_year:\n$plan")
    val want = orders.filter(col("o_year") === 1996).count()
    assert(joined.count() === want)
  }

  private def parquetFilesPerDir(root: String): Map[String, Int] = {
    val rootPath = Paths.get(root)
    val stream = Files.walk(rootPath)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toList
        .groupBy(p => rootPath.relativize(p.getParent).toString)
        .map { case (d, fs) => d -> fs.size }
    } finally stream.close()
  }

  test("compaction collapses fragmented partitions to sized files, content intact") {
    val fragDir = "/tmp/graft-frag-events"
    val compDir = "/tmp/graft-comp-events"
    val ev = Tables.events(spark, Sf001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

    // fragment: 30 shuffle tasks each writing into every type dir
    ev.repartition(30).write.mode("overwrite")
      .partitionBy("event_type").parquet(fragDir)
    val fragCounts = parquetFilesPerDir(fragDir)
    assert(fragCounts.values.forall(_ >= 20),
      s"setup must be fragmented, got $fragCounts")

    // ~2000 rows per type, target 1500 per file → ceil = 2 files per dir
    Sinks.compactPartitioned(
      spark.read.parquet(fragDir), compDir, Seq("event_type"),
      targetRowsPerFile = 1500L)
    val compCounts = parquetFilesPerDir(compDir)
    assert(compCounts.keySet === fragCounts.keySet, "partition dirs preserved")
    assert(compCounts.values.forall(n => n >= 1 && n <= 2),
      s"each dir must compact to ceil(rows/target)=2 files, got $compCounts")

    // content identical, both directions
    val before = spark.read.parquet(fragDir)
    val after = spark.read.parquet(compDir).select(before.columns.map(col): _*)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    assert(after.count() === 10000L)
  }

  test("compaction keeps rows whose partition value is NULL (null-safe join)") {
    import spark.implicits._
    val src = "/tmp/graft-comp-null-src"
    val dst = "/tmp/graft-comp-null-dst"
    Seq((1L, Option("a")), (2L, Option("a")), (3L, Option.empty[String]))
      .toDF("id", "p").repartition(4)
      .write.mode("overwrite").partitionBy("p").parquet(src)
    Sinks.compactPartitioned(spark.read.parquet(src), dst, Seq("p"), 100L)
    val after = spark.read.parquet(dst)
    assert(after.count() === 3L, "the null-partition row must survive compaction")
    assert(after.filter(col("p").isNull).count() === 1L)
  }
}
