package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The infogob election stages 20–41 as named resumable pipelines — the
  * concrete schemas/keys of the reference's numbered scripts
  * (`perustats/infogob/20_resultados.py`, `21_candidatos_by_eleccion.py`,
  * `30_organizaciones_politicas.py`, `40_candidato_details.py`,
  * `41_candidatos_historial.py`) over the generic [[StagedDag]] idiom.
  *
  * Each stage takes its HTTP fetch as a `DataFrame => DataFrame` transform
  * of the PENDING set (in tests: a join against a fixture response table;
  * in production: `graft.ingest` utilities or the PagedSource), so the
  * resume/upsert semantics — the part the reference encodes in `procesado`
  * flags, `left_only` merges and PRIMARY KEY constraints — live in the
  * engine as anti-joins and keyed upserts and therefore distribute: the
  * pending-set computation is a shuffle on the key columns, never a
  * driver-side loop over rows.
  */
object InfogobElections {

  /** Composite PK of `resultados_generales`
    * (`20_resultados.py:49-59`). */
  val ElectionKeys: Seq[String] =
    Seq("id_eleccion", "id_location_req", "id_group_eleccion")

  /** Composite PK of `resultados_by_org_politica`
    * (`20_resultados.py:61-87`). */
  val OrgResultKeys: Seq[String] = ElectionKeys :+ "id_org_politica"

  /** The 4-key identity of one expediente fetch
    * (`21_candidatos_by_eleccion.py:66-72`). */
  val ExpedienteKeys: Seq[String] = ElectionKeys :+ "id_expediente"

  /** Stage 20 — resultados: fetch the pending election/location requests
    * (`procesado = 0`, `20_resultados.py:34-43`) and UPSERT the parsed
    * rows into the results table by its composite PK (a refreshed fetch
    * replaces the stale rows, everything else passes through). Call once
    * per results table (generales with [[ElectionKeys]], by-org with
    * [[OrgResultKeys]]) with the matching parse transform. */
  def resultados(procesos: DataFrame, existing: Option[DataFrame],
      fetch: DataFrame => DataFrame,
      keys: Seq[String] = ElectionKeys): DataFrame = {
    val fetched = fetch(procesos.filter(col("procesado") === 0))
    existing.fold(fetched)(ex => Relational.upsertRows(ex, fetched, keys))
  }

  /** Stage 21 — candidatos per expediente: the source is the DISTINCT
    * 4-key set of the by-org results; the resume anti-join runs on the
    * same keys against the existing candidates table; the fetch enriches
    * each pending expediente with its (multi-row) candidate list — the
    * reference's `{**row, **cand}` merge (`21_candidatos_by_eleccion.py:
    * 43-77`). Appends via diagonal union (runStage). */
  def candidatosByEleccion(resultadosOrg: DataFrame,
      existing: Option[DataFrame],
      fetch: DataFrame => DataFrame): DataFrame =
    StagedDag.runStage(
      resultadosOrg.select(ExpedienteKeys.map(col): _*).distinct(),
      existing, ExpedienteKeys, fetch)

  /** Stage 30 — organizaciones políticas: source = DISTINCT org urls seen
    * in the by-org results; resume anti-join against the orgs already
    * fetched; one detail row per pending url
    * (`30_organizaciones_politicas.py:30-90`). */
  def organizaciones(resultadosOrg: DataFrame, existing: Option[DataFrame],
      fetch: DataFrame => DataFrame): DataFrame =
    StagedDag.runStage(
      resultadosOrg.select(col("url_org_politica")).distinct(),
      existing, Seq("url_org_politica"), fetch)

  /** Stage 40 — candidato details: ONE pending url set fans out to THREE
    * output tables (info / hojas de vida / planes de gobierno); the resume
    * check keys on the LAST table written (planes, as `url_candidato`), so
    * a crash between the three appends re-fetches that url — the
    * reference's exact resume rule (`40_candidato_details.py:88-124`).
    * Returns the three append DELTAS (pending rows only); the caller
    * appends them to its stores. */
  def candidatoDetails(candidatos: DataFrame,
      existingPlanes: Option[DataFrame],
      fetchInfo: DataFrame => DataFrame,
      fetchHojaVida: DataFrame => DataFrame,
      fetchPlanes: DataFrame => DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val urls = candidatos.select(col("url_politico")).distinct()
    val pending = existingPlanes.fold(urls)(ex =>
      Relational.pendingAntiJoin(urls,
        ex.select(col("url_candidato").as("url_politico")),
        Seq("url_politico")))
    (fetchInfo(pending), fetchHojaVida(pending), fetchPlanes(pending))
  }

  /** Stage 41 — historial partidario: source = DISTINCT
    * (url_politico, id_persona) from candidato_info; the resume anti-join
    * keys on url_politico ONLY (the reference joins just that column,
    * `41_candidatos_historial.py:87-113`); the fetch expands each pending
    * person into their (multi-row) party-affiliation history. */
  def candidatosHistorial(candidatoInfo: DataFrame,
      existing: Option[DataFrame],
      fetch: DataFrame => DataFrame): DataFrame =
    StagedDag.runStage(
      candidatoInfo.select(col("url_politico"), col("id_persona")).distinct(),
      existing, Seq("url_politico"), fetch)
}
