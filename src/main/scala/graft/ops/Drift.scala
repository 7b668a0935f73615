package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring via the Population Stability Index —
  * the standard production check that a feature/score distribution in
  * the current data window still looks like the reference window
  * (industry rule of thumb: PSI < 0.1 stable, 0.1-0.2 moderate shift,
  * > 0.2 major shift → investigate before training on the new crawl).
  *
  *   PSI = Σ_bins (p̂_ref(b) − p̂_cur(b)) · ln(p̂_ref(b) / p̂_cur(b))
  *
  * with add-half (Jeffreys) smoothing p̂ = (c + ½)/(N + B/2) so empty
  * bins contribute finitely instead of ±∞. Every per-bin term is
  * non-negative (both factors always share a sign), so the total is a
  * plain integer sum of the micro-unit contributions.
  *
  * Engine-portable determinism (the [[Dsir]] posture): the ln input is
  * formed as a product of two IEEE quotients of exact integers (add-
  * half doubled into integers: (2c+1)/(2N+B)), each micro-unit column
  * is rounded ONCE, and the total PSI is an integer sum — hash-exact
  * across engines up to the documented last-ulp libm residual.
  *
  * Plan shape at scale: ONE pass over the data (map-side partial
  * aggregation into ≤ numBins groups), then all arithmetic on a
  * numBins-row frame. The bin spine is generated so empty bins are
  * present regardless of the data; the final total rides an
  * unpartitioned window over that fixed-size frame — numBins rows in
  * one partition by construction, never data-sized.
  */
object Drift {

  /** Per-bin PSI decomposition of `valueCol` between the rows where
    * `isRef` holds (reference window) and the rest (current window).
    *
    * Bins are fixed-width `[i·binWidth, (i+1)·binWidth)` with the tail
    * capped into the last bin — a data-independent binning both
    * engines replay bit-identically (no quantile fit, no extra pass).
    *
    * @return (bin, ref_cnt, cur_cnt, lr_micro, contrib_micro,
    *         psi_micro, drift_flag) — lr_micro = round(1e6·ln p̂_r/p̂_c),
    *         contrib_micro the bin's micro-unit PSI term, psi_micro the
    *         corpus total on every row, drift_flag = psi > 0.2.
    */
  def psiDrift(df: DataFrame, valueCol: String, isRef: Column,
      numBins: Int = 10, binWidth: Double = 10.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val binned = df.select(
      least(greatest(floor(col(valueCol) / binWidth), lit(0L)),
        lit(numBins - 1L)).as("bin"),
      isRef.as("r"))
    // both window counts in ONE pass (the Dsir rc/tc shape)
    val cnt = binned.groupBy(col("bin")).agg(
      sum(when(col("r"), 1L).otherwise(0L)).as("refc"),
      sum(when(col("r"), 0L).otherwise(1L)).as("curc"))
    val f = spark.range(numBins).select(col("id").as("bin"))
      .join(cnt, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("refc"), lit(0L)).as("refc"),
        coalesce(col("curc"), lit(0L)).as("curc"))
    // totals ride the SAME fixed-size window as the final PSI sum —
    // a crossJoin of a separate f.agg would re-run the events
    // aggregation for a second full input scan; the window keeps the
    // whole post-aggregation computation on one numBins-row pass.
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val withTot = f.select(col("bin"), col("refc"), col("curc"),
      sum(col("refc")).over(wAll).as("rTot"),
      sum(col("curc")).over(wAll).as("cTot"))
    // quotients FIRST (exact-int IEEE divides), then one multiply —
    // both engines feed libm the same double (see Dsir scaladoc)
    def pRef(refc: Column, rTot: Column) =
      (refc * 2 + 1).cast("double") / (rTot * 2 + numBins)
    def pCur(curc: Column, cTot: Column) =
      (curc * 2 + 1).cast("double") / (cTot * 2 + numBins)
    def lnRatio(refc: Column, curc: Column, rTot: Column, cTot: Column) =
      log(((refc * 2 + 1).cast("double") / (rTot * 2 + numBins)) *
        ((cTot * 2 + numBins).cast("double") / (curc * 2 + 1)))
    val per = withTot.select(
      col("bin"), col("refc").as("ref_cnt"), col("curc").as("cur_cnt"),
      round(lit(1e6) *
        lnRatio(col("refc"), col("curc"), col("rTot"), col("cTot")))
        .cast("long").as("lr_micro"),
      round(lit(1e6) *
        (pRef(col("refc"), col("rTot")) - pCur(col("curc"), col("cTot"))) *
        lnRatio(col("refc"), col("curc"), col("rTot"), col("cTot")))
        .cast("long").as("contrib_micro"))
    per.select(col("bin"), col("ref_cnt"), col("cur_cnt"),
      col("lr_micro"), col("contrib_micro"),
      sum(col("contrib_micro")).over(wAll).as("psi_micro"))
      .withColumn("drift_flag", col("psi_micro") > 200000L)
  }
}
