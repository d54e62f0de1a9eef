package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass (parquet footer reads + a small job)
  * runs before timing so the first measured query doesn't pay JVM/session
  * startup; queries run in sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    SparkEntry.entry(spark).count() // parquet reader + catalyst warmup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Extension workloads (dedup/similarity/text/multimodal/stream) have no
    // reference counterpart; the core subtotal is the reference-parity set.
    val isExtension = (n: String) => n.startsWith("d") || n.startsWith("x") ||
      n.startsWith("t") || n.startsWith("m") || n.startsWith("st") ||
      n.startsWith("e") || n == "a8_salted_agg" || n == "a9_approx_distinct"
    val core = results.collect { case (k, v) if !isExtension(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""core_sec":$core,"extensions_sec":${total - core},""" +
      s""""queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
