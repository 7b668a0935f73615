package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `heavy_rank_order(ga)`: reorders a long-array of gram hashes by
  * (heavy-gram rank, gram) — the PPJoin canonical token order — using a
  * BROADCAST heavy-gram rank map instead of a distributed frequency
  * join.
  *
  * Rationale (r11, the 5M-doc probe): PPJoin needs every doc's tokens
  * in one globally consistent order, ideally rarest-first so prefixes
  * carry low-df tokens. The r10 shape computed exact global df with a
  * groupBy over the exploded gram stream and joined it back per gram —
  * at 5M docs that is two corpus×grams-scaled exchanges (~1.4B rows
  * each) plus a sort-aggregate regroup, ~90 GB of disk traffic for a
  * PERFORMANCE HEURISTIC. Prefix filtering is lossless under ANY
  * consistent total order (a pair with overlap ≥ α must share a token
  * in both α-prefixes regardless of the order used), and the est-filter
  * and exact verify decide membership per pair — so the ORDER affects
  * candidate count, never results. That licenses an approximate order:
  * ranks for the HEAVY tail only (measured at the 5M-doc probe: df≥64
  * vocabulary = 1.4M of 131M grams — 22 MB; max df 778), estimated
  * from a deterministic doc sample, broadcast, and applied map-side.
  * Unranked grams (the rare mass) order by their hash among themselves.
  * Every per-doc exchange this removes was corpus-sized; what remains
  * is one sample-sized aggregate and a ~MB broadcast — at cluster
  * scale the executor-side cost is a binary search per gram.
  *
  * Sort key: (rank << 56) | (g >>> 8), with rank ∈ [0, 63] (0 =
  * unranked/rare — sorts FIRST, i.e. into the prefix). The stored
  * VALUES are the untruncated 64-bit gram hashes; only the transient
  * sort key drops g's low byte (ties within a (rank, g-high-56) class
  * are broken by the full g so the order stays total and deterministic).
  *
  * CodegenFallback: the expression holds Spark `Broadcast` handles
  * (torrent-distributed, one copy per executor) which codegen cannot
  * reference; one interpreted call per ROW does the whole array's
  * lookups + sort, so the fallback overhead is per-doc, not per-gram.
  */
case class HeavyRankOrder(
    child: Expression,
    bcKeys: Broadcast[Array[Long]],
    bcRanks: Broadcast[Array[Byte]])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "heavy_rank_order"

  override def nullSafeEval(v: Any): Any = {
    val ga = v.asInstanceOf[ArrayData]
    val n = ga.numElements()
    val keys = bcKeys.value
    val ranks = bcRanks.value
    // sort (key, g) pairs via two parallel arrays
    val ks = new Array[Long](n)
    val gs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val g = ga.getLong(i)
      val idx = java.util.Arrays.binarySearch(keys, g)
      val r: Long = if (idx >= 0) ranks(idx).toLong else 0L
      ks(i) = (r << 56) | (g >>> 8)
      gs(i) = g
      i += 1
    }
    // dual-pivot sort of index pairs: sort (ks, gs) lexicographically.
    // n is per-doc gram count (~hundreds) — boxed sort is fine here.
    val ord = Array.range(0, n).sortWith { (a, b) =>
      if (ks(a) != ks(b)) java.lang.Long.compareUnsigned(ks(a), ks(b)) < 0
      else java.lang.Long.compareUnsigned(gs(a), gs(b)) < 0
    }
    val out = new Array[Long](n)
    i = 0
    while (i < n) { out(i) = gs(ord(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HeavyRankOrder =
    copy(child = c)
}

/** `heavy_rank_at_least(g)`: true iff gram `g`'s sampled heavy rank is
  * ≥ `minRank` — the map-side heavy-BUCKET flag of the r12 prefix-join
  * sub-refinement (see graft.ops.BucketRefine).
  *
  * Why sampled, not exact: the r12 first cut computed exact per-gram
  * prefix counts with a groupBy + join-back on the prefix stream; even
  * with the aggregate reusing the join's exchange, the extra consumer
  * re-paid the ~26 GB prefix shuffle at the 5M-doc probe and tipped the
  * host over ENOSPC. The refinement is LOSSLESS FOR ANY FLAG VALUE —
  * flagging a light bucket merely sub-keys it (exact, ~32 extra rows),
  * missing a heavy bucket merely keeps it on the flat join (exact,
  * slower) — so a sampled flag from the rank map the query already
  * broadcasts is strictly better than an exact count nobody needs.
  * One binary search per ROW (not per gram): sub-µs interpreted, which
  * is why CodegenFallback is acceptable here.
  */
case class HeavyRankAtLeast(
    child: Expression,
    bcKeys: Broadcast[Array[Long]],
    bcRanks: Broadcast[Array[Byte]],
    minRank: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "heavy_rank_at_least"

  override def nullSafeEval(v: Any): Any = {
    val idx = java.util.Arrays.binarySearch(bcKeys.value, v.asInstanceOf[Long])
    idx >= 0 && bcRanks.value(idx) >= minRank
  }

  override protected def withNewChildInternal(c: Expression): HeavyRankAtLeast =
    copy(child = c)
}

object BroadcastRank {
  /** Column wrapper for [[HeavyRankOrder]]. */
  def heavyRankOrder(
      ga: Column,
      bcKeys: Broadcast[Array[Long]],
      bcRanks: Broadcast[Array[Byte]]): Column =
    ColumnBridge.column(HeavyRankOrder(ColumnBridge.expression(ga), bcKeys, bcRanks))

  /** Column wrapper for [[HeavyRankAtLeast]]. */
  def heavyRankAtLeast(
      g: Column,
      bcKeys: Broadcast[Array[Long]],
      bcRanks: Broadcast[Array[Byte]],
      minRank: Int): Column =
    ColumnBridge.column(
      HeavyRankAtLeast(ColumnBridge.expression(g), bcKeys, bcRanks, minRank))
}
