package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Eval

/** Offline evaluation gates — score-vs-outcome metrics computed as
  * engine operators (per-day AUC separation, calibration bins), over
  * the events stream: score = `value`, outcome = purchase events. */
object EvalQueries extends QueryPack {

  /** Per-day tie-exact Mann–Whitney AUC of value predicting purchase.
    * The engine windows only the per-(day, score) aggregated frame;
    * the oracle re-derives via the two-RANK identity over raw rows. */
  val auc = GQuery(
    "q_score_auc",
    (s, d) => {
      val ev = Tables.events(s, d)
      Eval.groupedAuc(ev, col("ts").cast("date"), col("value"),
        col("event_type") === "purchase")
    },
    Some(Eval.groupedAucSql("purchase")))

  /** Reliability table: 10 fixed-width value bins (width 50, overflow
    * capped) with observed purchase rate per mille. */
  val calibration = GQuery(
    "q_calibration_bins",
    (s, d) => Eval.calibrationBins(
      Tables.events(s, d), col("value"),
      col("event_type") === "purchase", binWidth = 50.0, nBins = 10),
    Some(Eval.calibrationBinsSql("purchase", binWidth = 50.0,
      nBins = 10)))

  def all: Seq[GQuery] = Seq(auc, calibration)
}
