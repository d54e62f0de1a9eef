package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.HttpTransport
import graft.model.SeriesQuery

/** Live BCRP API edge: URL construction and response parsing for the real
  * service, producing exactly the long frame [[BCRPPipeline.fetchFrequency]]
  * expects — so `new BCRPPipeline(...).run(query, BCRPLive.fetcher(...))`
  * is a deployable end-to-end pipeline with no test-harness code.
  *
  * Reference shapes: URL template
  * `perustats/BCRP/models.py:17-20` (`{base}/{codes}-joined/json/{begin}/
  * {end}/ing`), response parse `perustats/BCRP/utils.py:105-144`
  * (`config.series[].name` + `periods[].{name,values}`; values are strings,
  * `"n.d."` = missing). Series values are POSITIONAL in the response, so
  * they are mapped back to the REQUESTED codes by position (the reference
  * relies on response order the same way); numeric coercion happens
  * downstream via `numeric.tryNumeric`, preserving the reference's
  * errors="coerce" behavior.
  */
object BCRPLive {

  val DefaultApiBase =
    "https://estadisticas.bcrp.gob.pe/estadisticas/series/api"

  /** `{base}/{codes joined by -}/json/{begin}/{end}/ing` */
  def seriesUrl(apiBase: String, codes: Seq[String], begin: String,
      end: String): String =
    s"$apiBase/${codes.mkString("-")}/json/$begin/$end/ing"

  /** The API response shape, pinned explicitly (no inference job, and a
    * malformed payload fails as a controlled parse error, not an opaque
    * unresolved-column analysis exception). */
  val responseSchema: StructType = StructType(Seq(
    StructField("config", StructType(Seq(
      StructField("series", ArrayType(StructType(Seq(
        StructField("name", StringType)))))))),
    StructField("periods", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("values", ArrayType(StringType))))))))

  /** Parse one API JSON payload into the long frame
    * (date_str, series, value) with `series` = the requested code.
    * Values are positional per the API contract; the response MUST carry
    * exactly one series per requested code — anything else (a dropped
    * series, an error payload) would silently misattribute values to the
    * wrong codes, so it fails loudly instead. */
  def parseLong(spark: SparkSession, json: String,
      codes: Seq[String]): DataFrame = {
    import spark.implicits._
    val df = spark.read.schema(responseSchema).json(Seq(json).toDS())
    val nSeries = df.select(size(col("config.series"))).head().getInt(0)
    require(nSeries == codes.length,
      s"BCRP response carries $nSeries series for ${codes.length} requested " +
        s"codes (${codes.mkString(",")}) — refusing positional mapping")
    val codeArr = array(codes.map(lit): _*)
    df.select(explode(col("periods")).as("p"))
      .select(col("p.name").as("date_str"),
        posexplode(col("p.values")).as(Seq("__i", "value")))
      .select(col("date_str"),
        element_at(codeArr, col("__i") + 1).as("series"), col("value"))
  }

  /** The injectable fetch closure for [[BCRPPipeline.fetchFrequency]]:
    * one API call per delta-code batch over [[HttpTransport]]. */
  def fetcher(spark: SparkSession, query: SeriesQuery,
      apiBase: String = DefaultApiBase,
      cfg: HttpTransport.HttpConfig = HttpTransport.HttpConfig())
      : Seq[String] => DataFrame =
    codes => parseLong(spark,
      HttpTransport.getString(
        seriesUrl(apiBase, codes, query.start, query.end), cfg, "UTF-8"),
      codes)
}
