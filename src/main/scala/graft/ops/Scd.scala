package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) building and incremental
  * maintenance — the warehouse twin of the round's index lifecycles
  * (DedupIndex, IVF): build the history table once, then fold change
  * batches in WITHOUT rebuilding, with the fold-in provably equal to the
  * one-shot build (ScdSpec + the j8 oracle assert exactly that).
  *
  * A dimension row is (key, attr, valid_from, valid_to, is_current):
  * the attribute's value held over [valid_from, valid_to), open-ended
  * (null valid_to) for the current row. No-op records (an event carrying
  * the value already in force) never open a new version — the standard
  * SCD2 change filter.
  *
  * Scale: both build and apply are ONE shuffle on the key (window
  * functions partitioned by key) plus key-equi-joins; no driver-side
  * state, no global sort. The append-only contract (batch timestamps ≥
  * the dimension's horizon per key) is the same one every warehouse
  * SCD2 merge assumes.
  */
object Scd {

  private def chains(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__tie"))
    events
      .select(col(keyCol), col(attrCol).as("attr"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"))
      .withColumn("__prev", lag(col("attr"), 1).over(w))
  }

  private def versions(changed: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__tie"))
    changed.select(col(keyCol), col("attr"),
        col("__ts").as("valid_from"),
        lead(col("__ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** One-shot SCD2 build from an event log: change-filter (drop records
    * repeating the in-force value), then validity intervals via lead. */
  def buildScd2(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame =
    versions(chains(events, keyCol, attrCol, tsCol, tieCol)
      .filter(col("__prev").isNull || col("attr") =!= col("__prev")),
      keyCol)

  /** Fold a change batch into an existing dimension: within-batch chains
    * change-filter as in [[buildScd2]], the batch's FIRST record per key
    * additionally filters against the dimension's current value (the
    * boundary no-op), each affected key's open row closes at its first
    * new version's valid_from, untouched rows pass through. Requires
    * every batch timestamp ≥ the key's current valid_from (append-only
    * ingest). `applyChanges(buildScd2(e₁), e₂) ≡ buildScd2(e₁ ∪ e₂)` —
    * the identity ScdSpec asserts and the j8 query's oracle checks. */
  def applyChanges(dim: DataFrame, batch: DataFrame, keyCol: String,
      attrCol: String, tsCol: String, tieCol: String): DataFrame = {
    val cur = dim.filter(col("is_current"))
      .select(col(keyCol), col("attr").as("__cur"))
    val changed = chains(batch, keyCol, attrCol, tsCol, tieCol)
      .join(cur, Seq(keyCol), "left")
      .filter(
        when(col("__prev").isNotNull, col("attr") =!= col("__prev"))
          .otherwise(col("__cur").isNull || col("attr") =!= col("__cur")))
    val newRows = versions(changed.drop("__cur"), keyCol)
    val firstNew = newRows.groupBy(col(keyCol))
      .agg(min(col("valid_from")).as("__first"))
    dim.join(firstNew, Seq(keyCol), "left")
      .select(col(keyCol), col("attr"),
        col("valid_from"),
        when(col("is_current") && col("__first").isNotNull, col("__first"))
          .otherwise(col("valid_to")).as("valid_to"),
        (col("is_current") && col("__first").isNull).as("is_current"))
      .unionByName(newRows)
  }
}
