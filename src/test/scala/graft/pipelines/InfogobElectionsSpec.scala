package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stages 20–41 of the infogob election DAG on reference-shaped fixtures:
  * each test drives a stage's exact resume rule (procesado flag,
  * composite-PK upsert, anti-join pending set) and checks the fetch
  * transform only ever sees the pending rows. */
class InfogobElectionsSpec extends SparkSpec {
  import spark.implicits._
  import InfogobElections._

  private val K3 = Seq("id_eleccion", "id_location_req", "id_group_eleccion")

  private def procesos = Seq(
    ("E2022", "L01", "G1", 0),
    ("E2022", "L02", "G1", 0),
    ("E2018", "L01", "G2", 1) // already processed: stage 20 must skip it
  ).toDF("id_eleccion", "id_location_req", "id_group_eleccion", "procesado")

  /** Remote resultados_generales response, keyed by the composite PK. */
  private def generalesResponse = Seq(
    ("E2022", "L01", "G1", 1000L, 1200L),
    ("E2022", "L02", "G1", 800L, 900L),
    ("E2018", "L01", "G2", 700L, 850L)
  ).toDF("id_eleccion", "id_location_req", "id_group_eleccion",
    "num_votos_emitidos", "num_electores")

  test("stage 20: fetches only procesado = 0; composite-PK upsert " +
    "replaces stale rows and keeps untouched ones") {
    def fetch(pending: DataFrame): DataFrame =
      pending.select(K3.map(col): _*).join(generalesResponse, K3)

    val cold = resultados(procesos, None, fetch)
    assert(cold.count() == 2) // E2018 skipped: its flag says done
    assert(cold.filter(col("id_eleccion") === "E2018").isEmpty)

    // existing table holds a STALE row for (E2022, L01, G1) and the done
    // E2018 row; the refreshed fetch must replace the stale row by its
    // composite PK and pass the E2018 row through untouched
    val existing = Seq(
      ("E2022", "L01", "G1", 5L, 5L), // stale
      ("E2018", "L01", "G2", 700L, 850L)
    ).toDF("id_eleccion", "id_location_req", "id_group_eleccion",
      "num_votos_emitidos", "num_electores")
    val merged = resultados(procesos, Some(existing), fetch)
    assert(merged.count() == 3)
    val byKey = merged.collect().map(r => ((r.getString(0), r.getString(1),
      r.getString(2)), r.getLong(3))).toMap
    assert(byKey(("E2022", "L01", "G1")) == 1000L) // replaced, not 5
    assert(byKey(("E2022", "L02", "G1")) == 800L) // newly fetched
    assert(byKey(("E2018", "L01", "G2")) == 700L) // untouched
  }

  private def resultadosOrg = Seq(
    ("E2022", "L01", "G1", "X001", "ORG_A", "/org/a"),
    ("E2022", "L01", "G1", "X001", "ORG_B", "/org/b"), // same expediente
    ("E2022", "L02", "G1", "X002", "ORG_A", "/org/a")
  ).toDF("id_eleccion", "id_location_req", "id_group_eleccion",
    "id_expediente", "id_org_politica", "url_org_politica")

  test("stage 21: distinct 4-key pending set, anti-join resume, " +
    "multi-row candidate enrich") {
    // two candidates per expediente — the reference's {**row, **cand} merge
    def fetch(pending: DataFrame): DataFrame =
      pending.join(Seq(
        ("X001", "CAND_1"), ("X001", "CAND_2"),
        ("X002", "CAND_3"), ("X002", "CAND_4")
      ).toDF("id_expediente", "txt_candidato"), Seq("id_expediente"))

    val cold = candidatosByEleccion(resultadosOrg, None, fetch)
    assert(cold.count() == 4) // 2 expedientes x 2 candidates

    // X001 already fetched: only X002 is pending; X001's existing rows
    // (with their OLD marker) must pass through unchanged
    val existing = Seq(
      ("E2022", "L01", "G1", "X001", "OLD_1"), ("E2022", "L01", "G1", "X001", "OLD_2")
    ).toDF("id_eleccion", "id_location_req", "id_group_eleccion",
      "id_expediente", "txt_candidato")
    val resumed = candidatosByEleccion(resultadosOrg, Some(existing), fetch)
    val byExp = resumed.collect()
      .groupBy(_.getAs[String]("id_expediente"))
      .view.mapValues(_.map(_.getAs[String]("txt_candidato")).toSet).toMap
    assert(byExp("X001") == Set("OLD_1", "OLD_2")) // not re-fetched
    assert(byExp("X002") == Set("CAND_3", "CAND_4"))
  }

  test("stage 30: distinct org urls, anti-join against fetched orgs") {
    def fetch(pending: DataFrame): DataFrame =
      pending.withColumn("title_partido", concat(lit("T"), col("url_org_politica")))
    val cold = organizaciones(resultadosOrg, None, fetch)
    assert(cold.count() == 2) // /org/a appears twice in results, once here
    val existing = Seq(("/org/a", "already")).toDF("url_org_politica", "title_partido")
    val resumed = organizaciones(resultadosOrg, Some(existing), fetch)
    val titles = resumed.collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(titles == Map("/org/a" -> "already", "/org/b" -> "T/org/b"))
  }

  test("stage 40: one pending url set fans out to three append deltas; " +
    "resume keys on the planes table") {
    val candidatos = Seq(
      ("/pol/1", "CAND_1"), ("/pol/1", "CAND_1B"), ("/pol/2", "CAND_2")
    ).toDF("url_politico", "txt_candidato")
    val planes = Seq(("/pol/1", "plan A"))
      .toDF("url_candidato", "titulo_plan")
    def tag(name: String)(p: DataFrame): DataFrame =
      p.withColumn("src", lit(name))
    val (info, hv, pl) = candidatoDetails(candidatos, Some(planes),
      tag("info"), tag("hv"), tag("planes"))
    // /pol/1 already has planes -> only /pol/2 is pending, in all three
    for ((d, n) <- Seq((info, "info"), (hv, "hv"), (pl, "planes"))) {
      val rows = d.collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("/pol/2"), n)
      assert(rows.head.getAs[String]("src") == n)
    }
    // cold start: both urls pending
    val (infoAll, _, _) = candidatoDetails(candidatos, None,
      tag("info"), tag("hv"), tag("planes"))
    assert(infoAll.collect().map(_.getString(0)).toSet ==
      Set("/pol/1", "/pol/2"))
  }

  test("stage 41: pending keyed on url_politico only; multi-row history") {
    val candidatoInfo = Seq(
      ("/pol/1", "P1"), ("/pol/2", "P2")
    ).toDF("url_politico", "id_persona")
    def fetch(pending: DataFrame): DataFrame =
      pending.join(Seq(
        ("P1", "PARTY_X", 1), ("P1", "PARTY_Y", 0), ("P2", "PARTY_Z", 1)
      ).toDF("id_persona", "org_politica", "activa"), Seq("id_persona"))
    val cold = candidatosHistorial(candidatoInfo, None, fetch)
    assert(cold.count() == 3)
    val existing = Seq(("/pol/1", "P1", "PARTY_OLD", 1))
      .toDF("url_politico", "id_persona", "org_politica", "activa")
    val resumed = candidatosHistorial(candidatoInfo, Some(existing), fetch)
    val byUrl = resumed.collect()
      .groupBy(_.getAs[String]("url_politico"))
      .view.mapValues(_.map(_.getAs[String]("org_politica")).toSet).toMap
    assert(byUrl("/pol/1") == Set("PARTY_OLD")) // not re-fetched
    assert(byUrl("/pol/2") == Set("PARTY_Z"))
  }
}
