package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (entity resolution / fuzzy key
  * match) without the O(n²) pair space.
  *
  * Blocking is the deletion-neighborhood scheme (FastSS / SymSpell,
  * public algorithms): every string emits itself plus its |s| one-char
  * deletions; two strings within Levenshtein distance 1 ALWAYS share a
  * neighborhood member (substitution at i ⇒ both i-deletions coincide;
  * insertion/deletion ⇒ the shorter string IS a deletion of the longer),
  * so a hash self-join on the variant key loses nothing — the same
  * bucket-then-verify contract as the MinHash/SimHash dedup operators,
  * with `levenshtein` as the exact verifier. False candidates (distance
  * 2 pairs can also collide) are filtered by the verify.
  *
  * Scale shape: |s|+1 short-string rows per input row (bounded by name
  * length), one shuffle on the variant key, candidates distinct-ed as
  * id pairs before the cheap verify. Nothing quadratic at any stage —
  * vs the naive crossJoin+levenshtein plan, which is O(n²) in both
  * comparisons and exchange.
  */
object FuzzyJoin {

  /** All Levenshtein-distance-≤1 pairs (id_a < id_b) with their exact
    * distance. `extraDeletes` widens the neighborhood to catch a
    * fraction of distance-2 pairs if desired (0 = exact ≤1 semantics).
    */
  def nearKeyPairs(df: DataFrame, nameCol: String, idCol: String): DataFrame = {
    val name = col(nameCol)
    // deletion at 1-based position i — substr is 1-based; the trailing
    // substr over-asks for length(name) chars which substr clamps
    val deletions: Column = transform(
      sequence(lit(1), length(name)),
      i => concat(name.substr(lit(1), i - 1), name.substr(i + 1, length(name))))
    val variants = df.select(
      col(idCol).as("id"), name.as("name"),
      // the string itself joins the neighborhood: catches distance 0
      // and the pure-insert/delete cases; empty strings still emit one
      // variant because array_union with the singleton never empties
      explode(array_union(array(name), deletions)).as("v"))
    val a = variants.as("a")
    val b = variants.as("b")
    a.join(b, col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct() // a pair can collide on several variants
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
