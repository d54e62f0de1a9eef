package graft.cache

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.ops.Relational

/** JDBC-backed [[SeriesCache]] over embedded Apache Derby (the embedded SQL
  * engine bundled with Spark's classpath; the environment has no SQLite
  * driver — see [[SeriesCache]] for the documented divergence). Gives
  * reference consumers whose state layer is a local SQL database a drop-in
  * cache with the same lifecycle semantics as [[ParquetCache]].
  *
  * Writes follow the same versioned-table + pointer discipline as the
  * parquet engine: each save lands in a fresh `<table>_vN` via Spark's JDBC
  * writer, then a one-row pointer update (a real SQL transaction here)
  * flips `graft_current` — readers never observe a partial write. Loads go
  * through `spark.read.jdbc` with the projection pushed into the generated
  * SELECT. Single-writer by design, like the reference's SQLite file.
  */
final class JdbcCache(spark: SparkSession, url: String) extends SeriesCache {

  private def withConn[T](f: java.sql.Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def ensurePointerTable(): Unit = withConn { conn =>
    val meta = conn.getMetaData.getTables(null, null, "GRAFT_CURRENT", null)
    val exists = meta.next()
    meta.close()
    if (!exists) {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE graft_current (tbl VARCHAR(128) PRIMARY KEY, v INT)")
      st.close()
    }
  }

  private def baseName(freq: String, start: String, end: String): String =
    s"sr_${freq}_${start}_$end".replaceAll("[^A-Za-z0-9_]", "_")

  private def currentVersion(base: String): Option[Int] = {
    ensurePointerTable()
    withConn { conn =>
      val ps = conn.prepareStatement(
        "SELECT v FROM graft_current WHERE tbl = ?")
      ps.setString(1, base)
      val rs = ps.executeQuery()
      val v = if (rs.next()) Some(rs.getInt(1)) else None
      rs.close(); ps.close()
      v
    }
  }

  private def setVersion(base: String, v: Int): Unit = withConn { conn =>
    conn.setAutoCommit(false)
    val del = conn.prepareStatement("DELETE FROM graft_current WHERE tbl = ?")
    del.setString(1, base); del.executeUpdate(); del.close()
    val ins = conn.prepareStatement(
      "INSERT INTO graft_current (tbl, v) VALUES (?, ?)")
    ins.setString(1, base); ins.setInt(2, v); ins.executeUpdate(); ins.close()
    conn.commit()
  }

  private def readTable(name: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", name).load()

  def cachedCodes(freq: String, start: String, end: String): Seq[String] = {
    val base = baseName(freq, start, end)
    currentVersion(base) match {
      case Some(v) => readTable(s"${base}_v$v").columns.toSeq
        .filter(c => c != "date" && c != "yq")
      case None => Nil
    }
  }

  def save(freq: String, start: String, end: String,
      incoming: DataFrame): Unit = {
    val base = baseName(freq, start, end)
    val current = currentVersion(base)
    val merged = current match {
      case Some(v) =>
        Relational.upsertWide(readTable(s"${base}_v$v"), incoming, "date")
      case None => incoming
    }
    val next = current.map(_ + 1).getOrElse(0)
    merged.write.format("jdbc").mode("overwrite")
      .option("url", url).option("dbtable", s"${base}_v$next").save()
    setVersion(base, next)
  }

  def load(freq: String, start: String, end: String,
      codes: Seq[String]): DataFrame = {
    val base = baseName(freq, start, end)
    val v = currentVersion(base).getOrElse(
      throw new IllegalStateException(s"no cache table for ($freq,$start,$end)"))
    val df = readTable(s"${base}_v$v")
    val available = df.columns.toSet
    val wanted = codes.filter(available.contains)
    df.select(("date" +: wanted).map(col): _*)
  }
}
