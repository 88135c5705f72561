package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DISTRIBUTED per-group total-order rank — q167's two-phase
  * coarse-offset pattern as ONE shared definition, serving the CCNet
  * perplexity buckets (q211) and the D4 diversity prune (q244), which
  * previously carried structurally identical copies of this subtle
  * ladder (round-15 review finding: a future tie-order or offset fix
  * to one copy would silently miss the other).
  *
  * rank = row_number of the (score DESC, tie ASC) total order within
  * each group, computed with NO group-wide window. Ordering by
  * (band DESC, score DESC, tie) with band = round(score, 1) is
  * IDENTICAL to (score DESC, tie) because the band is monotone in the
  * score — so global rank = band offset + in-band group offset +
  * within-tie-group row_number, bit-equal to a single window's, while
  * every level stays bounded: band offsets come from a triangular
  * left-outer join over the (group × band) totals (tiny — bands are
  * 0.1-wide score slices), in-band offsets window-partition BY
  * (group, band), and the per-row row_number partitions by
  * (group, band, score) — at any corpus size the largest single
  * window partition is one score value's tie group, never a group.
  */
object RankLadder {

  /** Append `rk` (1-based, per `groupCols` group, (scoreCol DESC,
    * tieCol ASC) order) to `df`. `scoreCol` must be numeric and
    * `(groupCols, scoreCol, tieCol)` rows unique per tie — the
    * row_number's orderBy(tieCol) is what makes the total order
    * deterministic. */
  def rank(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      tieCol: String): DataFrame = {
    // Fail loudly if the input already carries a helper/output name —
    // rank() writes these unconditionally, so a caller whose relation
    // has e.g. `rk` would be silently clobbered (or hit an ambiguous-
    // column error at a distant call site) instead of here.
    val reserved = Seq("__band", "__bcnt", "__cnt", "__boff", "__goff", "rk")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"RankLadder.rank: input schema carries reserved column(s) " +
        s"${clash.mkString(", ")} — rename them before ranking")
    val W = org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val g = df.withColumn("__band", round(col(scoreCol), 1))
    val grp = g.groupBy(gcols :+ col("__band") :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val bandTot = grp.groupBy(gcols :+ col("__band"): _*)
      .agg(sum(col("__cnt")).as("__bcnt"))
    // offsets count everything ranked EARLIER = higher-score bands —
    // a triangular join over the bounded (group × band) totals, not a
    // window, so no unpartitioned WindowExec ever appears in the plan
    val joinCond = groupCols.map(c => col(s"h.$c") === col(s"l.$c"))
      .foldLeft(col("h.__band") > col("l.__band"))(_ && _)
    val boffs = bandTot.alias("l")
      .join(bandTot.alias("h"), joinCond, "left_outer")
      .groupBy(groupCols.map(c => col(s"l.$c").as(c)) :+
        col("l.__band").as("__band"): _*)
      .agg(coalesce(sum(col("h.__bcnt")), lit(0L)).as("__boff"))
    val offs = grp.withColumn("__goff", coalesce(sum(col("__cnt")).over(
        W.partitionBy(gcols :+ col("__band"): _*)
          .orderBy(col(scoreCol).desc)
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(gcols :+ col("__band") :+ col(scoreCol) :+ col("__goff"): _*)
    g.join(offs, groupCols :+ "__band" :+ scoreCol)
      .join(broadcast(boffs), groupCols :+ "__band")
      .withColumn("rk", col("__boff") + col("__goff") + row_number().over(
        W.partitionBy(gcols :+ col("__band") :+ col(scoreCol): _*)
          .orderBy(col(tieCol))))
      .drop("__band", "__boff", "__goff")
  }
}
