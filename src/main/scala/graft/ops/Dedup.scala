package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.exprs

/** Corpus deduplication at training-data scale: exact, MinHash+LSH,
  * SimHash, embedding-cosine. The common scale pattern everywhere:
  * NEVER form the O(n²) pair space — hash every row into buckets
  * (band-hash / bit-chunk / hyperplane sign), shuffle once on the bucket
  * key, and compare only within buckets. Verification (exact Jaccard /
  * hamming / cosine) runs only on candidate pairs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content: one survivor (min id) per distinct text.
    * Single hash-aggregate shuffle on the text. For very wide documents,
    * group by [[exactByFingerprint]] instead so only 8-byte keys shuffle.
    */
  def exactByText(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Exact dedup shuffling only a ~24-byte key (64-bit rolling hash +
    * 128-bit md5), not the document — at 100 TB the shuffle width is the
    * cost, so hash first. The two independent hashes make a false merge
    * of distinct texts require a simultaneous collision in both
    * (~n²/2^192): effectively identical output to grouping by the text
    * itself, at a fraction of the exchange volume.
    */
  def exactByFingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .withColumn("fp", exprs.rolling_hash(col(textCol)))
      .withColumn("fp_md5", md5(col(textCol)))
      .groupBy(col("fp"), col("fp_md5"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------- MinHash + LSH

  final case class MinhashParams(
      shingleN: Int = 5, numHashes: Int = 64, bands: Int = 16, seed: Long = 42L,
      jaccardThreshold: Double = 0.8) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Near-duplicate pairs via MinHash banding, verified with exact
    * n-gram Jaccard.
    *
    * Plan shape (per 100 TB posture):
    *  1. one scan computing the k-hash signature per doc (single-pass
    *     custom expression, stays in WholeStageCodegen);
    *  2. explode to `bands` rows/doc keyed by (band, hash-of-band-slice)
    *     — the ONLY data that shuffles is (key, doc_id);
    *  3. self-join on the band key = candidates (skew note: a degenerate
    *     band bucket is capped upstream by signature entropy; AQE skew
    *     join handles the rest);
    *  4. re-join the two shingle sets by id and verify exact Jaccard.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      p: MinhashParams = MinhashParams()): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      exprs.minhash_sig(col(textCol), p.shingleN, p.numHashes, p.seed).as("sig"))

    val bandCols = (0 until p.bands).map { i =>
      struct(lit(i).as("band"),
        xxhash64(slice(col("sig"), i * p.rowsPerBand + 1, p.rowsPerBand)).as("bh"))
    }
    val buckets = sigs
      .select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))

    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val shingles = docs.select(
      col(idCol).as("id"), exprs.shingle_set(col(textCol), p.shingleN).as("sh"))
    candidates
      .join(shingles.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingles.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", exprs.jaccard_sorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= p.jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Dedup decision from verified pairs: drop every doc that is the
    * larger id of some pair (keep-smallest survivor; a union-find /
    * connected-components pass is the exhaustive variant, planned r2).
    */
  def dropNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      p: MinhashParams = MinhashParams()): DataFrame = {
    val losers = minhashNearDupPairs(docs, textCol, idCol, p)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // -------------------------------------------------------------- SimHash

  /** Near-dup pairs via 64-bit SimHash: candidates share at least one of
    * four 16-bit chunks (pigeonhole ⇒ any pair within hamming distance 3
    * shares a chunk), verified by exact hamming distance.
    */
  def simhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, maxHamming: Int = 3): DataFrame = {
    val hashed = docs.select(
      col(idCol).as("id"), exprs.simhash64(col(textCol), shingleN).as("sh"))

    val chunkCols = (0 until 4).map { i =>
      struct(lit(i).as("ci"),
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL)).as("cv"))
    }
    val buckets = hashed
      .select(col("id"), col("sh"), explode(array(chunkCols: _*)).as("c"))
      .select(col("id"), col("sh"), col("c.ci").as("ci"), col("c.cv").as("cv"))

    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // -------------------------------------------- embedding-cosine near-dup

  /** Embedding near-dup pairs: random-hyperplane LSH buckets (sign bits
    * of `numPlanes` fixed projections), cosine-verified. Same
    * bucket-then-verify shape as MinHash — no O(n²).
    */
  def embeddingNearDupPairs(
      embs: DataFrame, vecCol: String, idCol: String,
      numPlanes: Int = 12, threshold: Double = 0.95, seed: Long = 42L,
      dim: Int = 64): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), numPlanes, dim, seed)
    val keyed = embs.select(col(idCol).as("id"), col(vecCol).as("v"), sigCol.as("bucket"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", exprs.cosine_f(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
