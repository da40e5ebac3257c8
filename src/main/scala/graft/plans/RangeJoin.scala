package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-join rewrite of a point-in-range join (the scale path
  * Relational.q_join_range's Scaladoc describes): bin points and
  * ranges by a fixed width, join on the bin id, and re-check the exact
  * predicate on bin-mates. A range spanning k bins replicates k times
  * — pick binWidth near the typical range span so k stays small.
  *
  * Why: `p >= lo AND p < hi` alone can only plan a (broadcast) nested
  * loop — O(points × ranges) comparisons — which stops being an option
  * the moment the ranges table outgrows a broadcast. The bin id is an
  * equality key, so Catalyst plans a hash join: each point meets only
  * the ranges sharing its bin, and both sides shuffle-partition by bin
  * at any scale. Correctness is exact — binning only PRUNES pairs the
  * residual predicate would reject; every qualifying pair shares the
  * bin of the point by construction.
  */
object RangeJoin {

  def binnedRangeJoin(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("__bin") && !ranges.columns.contains("__bin"),
      "inputs already contain a __bin column; rename it before binning")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    // a [lo, hi) range touches every bin from floor(lo/w) to
    // floor(hi/w) — the hi bin is kept even when hi sits exactly on
    // the boundary (the residual predicate rejects its non-matches)
    val r = ranges.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
