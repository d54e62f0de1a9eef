package graft.pipelines

import org.apache.spark.sql.DataFrame

import graft.ops.Relational

/** The infogob staged-DAG idiom (SURVEY §3, fourth lifecycle: numbered
  * scripts `00`→`41`, each = "compute pending set by anti-join against what
  * exists, enrich it, append"): generalized as a resumable stage runner.
  *
  * Each stage is idempotent by construction — re-running after a partial
  * failure re-derives the pending set and processes only what's missing,
  * which is the reference's whole resume story (`procesado` flags +
  * `left_only` merges) expressed as two Spark operators.
  */
object StagedDag {

  /** One resumable stage: rows of `source` whose `keys` are absent from
    * `existing` are transformed and appended to `existing` (diagonal union:
    * stages may add columns). Returns the new state table. */
  def runStage(source: DataFrame, existing: Option[DataFrame],
      keys: Seq[String], transform: DataFrame => DataFrame): DataFrame =
    existing match {
      case None => transform(source)
      case Some(ex) =>
        val pending = Relational.pendingAntiJoin(source, ex, keys)
        Relational.unionDiagonal(Seq(ex, transform(pending)))
    }

  /** One named stage of the DAG: `transform` derives this stage's table
    * from the previous stage's output; `keys` identify its rows for the
    * resume anti-join. */
  final case class Stage(name: String, keys: Seq[String],
      transform: DataFrame => DataFrame)

  /** Run the chain: stage i's source is stage i-1's output (the reference's
    * table-to-table script order, `.runers/infogob/main.md`), and each stage
    * resumes against its own previously-materialized output supplied by
    * `existingFor` (None = cold start). Returns every stage's table. */
  def run(input: DataFrame, stages: Seq[Stage],
      existingFor: String => Option[DataFrame] = _ => None)
      : Map[String, DataFrame] =
    stages.foldLeft((input, Map.empty[String, DataFrame])) {
      case ((cur, acc), st) =>
        val out = runStage(cur, existingFor(st.name), st.keys, st.transform)
        (out, acc + (st.name -> out))
    }._2
}
