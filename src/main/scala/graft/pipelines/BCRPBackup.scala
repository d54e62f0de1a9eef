package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The BCRP backup/archive runner (reference
  * `perustats/BCRP/backup/runner.py:13-28`) as one declarative export:
  *
  * reference lifecycle                          | here
  * ----------------------------------------------|-------------------------
  * catalog read (codigo, grupo_file)             | the `catalog` input
  * driver loop over `groupby("grupo_file")`      | ONE partitioned write
  * `group.split("_")[1]` picks the group's freq  | row-level filter
  * one parquet file per group under RELEASES     | one partition dir each
  *
  * The reference serializes groups through a single driver (with a 1 s
  * sleep per group); here every group's rows land in its partition
  * directory in one cluster-parallel write, and the per-group frequency
  * rule is a row-local filter instead of a per-iteration dict lookup. At
  * a real archive (thousands of groups) the write fans out by partition —
  * no driver loop to serialize and no group list to collect.
  */
object BCRPBackup {

  /** Export `data` (codigo, freq, …) grouped by the catalog's
    * `grupo_file` as group-partitioned parquet; keeps only rows whose
    * freq matches the group name's embedded frequency token (the
    * reference's `group.split("_")[1]` rule). Returns the re-read export
    * for verification. */
  def export(catalog: DataFrame, data: DataFrame, out: String): DataFrame = {
    val matched = data
      .join(broadcast(catalog.select(col("codigo"), col("grupo_file"))),
        Seq("codigo"))
      .filter(col("freq") === split(col("grupo_file"), "_").getItem(1))
    matched.write.mode("overwrite").partitionBy("grupo_file").parquet(out)
    data.sparkSession.read.parquet(out)
  }
}
