package graft

import org.apache.spark.sql.functions._
import graft.functions.exprs

class ExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("rolling_hash is deterministic and order-sensitive") {
    val df = Seq("abc", "acb", "abc").toDF("t")
    val hs = df.select(exprs.rolling_hash(col("t"))).as[Long].collect()
    assert(hs(0) === hs(2))
    assert(hs(0) !== hs(1))
  }

  test("rolling_hash matches the documented polynomial") {
    val h = Seq("ab").toDF("t")
      .select(exprs.rolling_hash(col("t"))).as[Long].head()
    assert(h === 'a'.toLong * 1000003L + 'b'.toLong)
  }

  test("minhash signature: similar sets agree on most components") {
    val a = "spark catalyst optimizer pushes filters down to the parquet scan layer"
    val df = Seq(a, a.replace("layer", "stage"), "totally different words here entirely")
      .toDF("t")
    val sigs = df.select(exprs.minhash_sig(col("t"), 5, 64, 42L)).as[Seq[Long]].collect()
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count(p => p._1 == p._2)
    assert(agree(sigs(0), sigs(1)) > 40, "near-dup should agree on >60% of hashes")
    assert(agree(sigs(0), sigs(2)) < 15, "unrelated should agree on few hashes")
  }

  test("hyperplane signatures: equal vectors equal, opposite vectors differ") {
    val df = Seq(
      Array(1.0f, 2.0f, 3.0f, 4.0f),
      Array(1.0f, 2.0f, 3.0f, 4.0f),
      Array(-1.0f, -2.0f, -3.0f, -4.0f)
    ).toDF("v")
    val sigs = df.select(exprs.hyperplane_sig(col("v"), 16, 4, 7L)).as[Long].collect()
    assert(sigs(0) === sigs(1))
    // opposite vector flips every sign bit
    assert((sigs(0) ^ sigs(2)) === ((1L << 16) - 1))
  }

  test("cosine_f and dot_f compute double-precision values") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val cos = df.select(exprs.cosine_f(col("a"), col("b"))).as[Double].collect()
    assert(cos(0) === 1.0)
    assert(cos(1) === 0.0)
    val dot = df.select(exprs.dot_f(col("a"), col("b"))).as[Double].collect()
    assert(dot(0) === 1.0)
  }

  test("luhn_card_count: maximal-run semantics and the mod-10 check") {
    val cases = Seq(
      ("pay 4532015112830366 now", 1),           // valid 16-digit
      ("pay 4532015112830367 now", 0),           // bad check digit
      ("a 30569309025904 b 6011111111111117", 2), // two valid runs
      ("short 123456789012", 0),                  // 12 digits: no candidate
      ("long 45320151128303666011111111111117", 0), // 32-digit run: not split
      ("4532015112830366", 1),                    // run at both ends
      ("x4532015112830366y4532015112830367", 1),
      ("no digits at all", 0))
    val got = cases.map(_._1).toDF("t")
      .select(exprs.luhn_card_count(col("t"))).as[Int].collect()
    assert(got.toSeq === cases.map(_._2))
  }

  test("expressions survive both codegen and interpreted paths") {
    // wholestage off exercises the eval() path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val h1 = Seq("x").toDF("t").select(exprs.rolling_hash(col("t"))).as[Long].head()
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val h2 = Seq("x").toDF("t").select(exprs.rolling_hash(col("t"))).as[Long].head()
      assert(h1 === h2)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
