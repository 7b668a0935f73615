package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.functions.ZOrderKernels
import graft.sources.{Sinks, Tables}

class ZOrderSpec extends SparkSpecBase {

  test("interleave kernel: monotone per-dim, bijective on 16-bit ranks") {
    assert(ZOrderKernels.interleave2(0L, 0L) === 0L)
    assert(ZOrderKernels.interleave2(1L, 0L) === 1L)
    assert(ZOrderKernels.interleave2(0L, 1L) === 2L)
    assert(ZOrderKernels.interleave2(0xffffL, 0xffffL) === 0xffffffffL)
    // distinct rank pairs → distinct keys (sampled)
    val keys = for (a <- 0L until 64L; b <- 0L until 64L)
      yield ZOrderKernels.interleave2(a, b)
    assert(keys.toSet.size === 64 * 64)
  }

  test("quantile_bin: rank via binary search, ties collapse") {
    val bounds = Array(10.0, 20.0, 20.0, 30.0)
    assert(ZOrderKernels.bin(5.0, bounds) === 0L)
    assert(ZOrderKernels.bin(10.0, bounds) === 1L)
    assert(ZOrderKernels.bin(20.0, bounds) === 3L)
    assert(ZOrderKernels.bin(99.0, bounds) === 4L)
  }

  /** per-file [min,max] of a column — exactly the footer stats a
    * stats-based reader skips on.
    */
  private def fileBounds(root: String, c: String): Seq[(Double, Double)] = {
    import scala.jdk.CollectionConverters._
    val stream = Files.walk(Paths.get(root))
    val files =
      try stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).map(_.toString).toList
      finally stream.close()
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head
      (r.getDouble(0), r.getDouble(1))
    }
  }

  test("z-order layout: a second-dimension slice prunes most files; linear layout prunes none") {
    val zDir = "/tmp/graft-zorder-li"
    val linDir = "/tmp/graft-linear-li"
    val li = Tables.lineitem(spark, Sf001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val nFiles = 16

    Sinks.writeZOrdered(li, zDir, "l_partkey", "l_suppkey", nFiles)
    // linear baseline: same file count, sorted on the FIRST column only
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    val total = li.count()
    assert(spark.read.parquet(zDir).count() === total)
    assert(spark.read.parquet(linDir).count() === total)

    // a ~10% slice on the SECOND dimension, placed inside one quartile
    // band (a slice straddling the 0.5 rank midline touches two
    // tile-rows of the curve and doubles the intersect count)
    val Array(lo, hi) = li.stat.approxQuantile("l_suppkey", Array(0.30, 0.40), 0.0)
    def intersecting(bounds: Seq[(Double, Double)]): Int =
      bounds.count { case (mn, mx) => mx >= lo && mn <= hi }

    // bounds carry a ±1–2 file margin: repartitionByRange samples range
    // boundaries with an RDD-id-seeded RNG, so exact file edges jitter
    // run to run — the CLAIM (partial pruning on both dims vs none on
    // the unsorted one) is robust, the exact count is not
    val zHit = intersecting(fileBounds(zDir, "l_suppkey"))
    val linHit = intersecting(fileBounds(linDir, "l_suppkey"))
    assert(linHit >= nFiles - 1,
      s"sanity: the x-sorted layout cannot prune a y slice (hit $linHit/$nFiles)")
    assert(zHit <= 10,
      s"z-order must keep per-file y-bounds tight (hit $zHit/$nFiles vs linear $linHit)")

    // and the first dimension still prunes too (the curve trades a
    // perfect x-sort for partial bounds on BOTH dims)
    val Array(xlo, xhi) = li.stat.approxQuantile("l_partkey", Array(0.30, 0.40), 0.0)
    val zx = fileBounds(zDir, "l_partkey").count { case (mn, mx) => mx >= xlo && mn <= xhi }
    assert(zx <= 10, s"x slice must also prune z-ordered files (hit $zx/$nFiles)")
  }
}
