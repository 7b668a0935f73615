package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: which ingredient of the q_simjoin_prefix self-join shape
  * defeats AQE exchange reuse? Runs variants and prints how many
  * shuffle-WRITE stages each materializes (1 = reused, 2 = not).
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shufWrites = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten > 0)
            shufWrites.incrementAndGet()
      })
    def measure(name: String)(df: DataFrame): Unit = {
      shufWrites.set(0)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      println(s"$name: SHUFFLE_WRITE_STAGES=${shufWrites.get()}")
    }

    val base = (1 to 10000).map(i => (i.toLong, Seq(i % 97L, i % 31L, i % 7L)))
      .toDF("doc_id", "toks").persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    base.count()
    val pref = base.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "pg")))

    def join(l: DataFrame, r: DataFrame, hint: Boolean): DataFrame = {
      val lh = if (hint) l.as("a").hint("shuffle_hash") else l.as("a")
      lh.join(r.as("b"),
        col("a.pg") === col("b.pg") && col("a.pos") === col("b.pos") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
    }

    println("exchange.reuse=" + spark.sessionState.conf.exchangeReuseEnabled.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    measure("smj-norepart")(join(pref, pref, hint = false))

    val rep = pref.repartition(8, col("pg"), col("pos"))
    measure("repart+hint")(join(rep, rep, hint = true))

    // canonical-equality diagnosis: pull the two ShuffleExchangeExecs
    // out of the initial physical plan and compare canonicalized forms
    val j = join(rep, rep, hint = true)
    val initial = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val exs = initial.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    println(s"exchanges=${exs.length}")
    if (exs.length == 2) {
      val (c0, c1) = (exs(0).canonicalized, exs(1).canonicalized)
      println(s"canonical_equal=${c0 == c1}")
      println(s"hash_equal=${c0.hashCode == c1.hashCode}")
      println(s"semantic_equal=${exs(0).sameResult(exs(1))}")
    }
    // uncached variant: same shape over a parquet scan (no
    // TableCacheQueryStage under the exchanges) — does reuse fire?
    val pq = "/tmp/reuseprobe_base.parquet"
    base.write.mode("overwrite").parquet(pq)
    val basePq = spark.read.parquet(pq)
    val prefPq = basePq
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "pg")))
      .repartition(8, col("pg"), col("pos"))
    measure("uncached-repart+hint")(join(prefPq, prefPq, hint = true))

    // fix A: persist AFTER the repartition — InMemoryTableScan reports
    // the cached plan's HashPartitioning, so the self-join should need
    // NO join-side exchange (1 shuffle total: the cache build's).
    val repCached = rep
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    repCached.count()
    measure("cached-after-repart")(join(repCached, repCached, hint = true))
    val j2 = join(repCached, repCached, hint = true)
    val ase = j2.queryExecution.executedPlan
    val n = ase.executeCollect().length
    Thread.sleep(500)
    println(s"collect_rows=$n")
    println(ase.toString.take(1800))
    spark.stop()
  }
}
