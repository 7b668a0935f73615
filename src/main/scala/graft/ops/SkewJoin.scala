package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins.
  *
  * On a 1000-executor cluster a hot join key funnels all its rows into
  * one reducer; AQE's skew-join split handles sort-merge cases at
  * runtime, but salting is the explicit, planner-independent fix — and
  * the only option when the skew survives into a grouped aggregation.
  *
  * Scheme: the (large, skewed) fact side derives a deterministic salt in
  * `[0, numSalts)` by hashing caller-chosen columns; the (small) dim
  * side is exploded `numSalts`×, one copy per salt value; the join key
  * becomes (key, salt) so a hot key's rows spread over `numSalts`
  * reducers. The result is row-for-row identical to the plain join —
  * q_salted_join oracle-checks exactly that.
  */
object SkewJoin {

  /** @param saltSource fact columns hashed into the salt — pick columns
    *                   that vary within a hot key (e.g. the fact row id)
    *                   or the salt won't spread anything.
    */
  def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      numSalts: Int, saltSource: Seq[String]): DataFrame = {
    require(numSalts > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(numSalts.toLong)).cast("int"))
    val dimExploded = dim.withColumn("__salt",
      explode(array((0 until numSalts).map(i => lit(i)): _*)))
    salted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }
}
