package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

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
}
