package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Versioned-manifest table contracts: append/replace commits, pinned
  * reads (snapshot isolation by immutability), and time travel. */
class ManifestSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("manifest_tbl").toString

  test("commits version in order; read defaults to the newest") {
    val tbl = freshTable()
    assert(Manifest.version(tbl) == 0L)
    assert(Manifest.commit(Seq(1, 2).toDF("x"), tbl) == 1L)
    assert(Manifest.commit(Seq(3).toDF("x"), tbl) == 2L)
    assert(Manifest.version(tbl) == 2L)
    assert(Manifest.read(spark, tbl).as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3))
    assert(Manifest.read(spark, tbl, 1L).as[Int].collect().sorted.toSeq ==
      Seq(1, 2))
  }

  test("a frame resolved at version N is pinned: later commits cannot " +
    "change what it reads") {
    val tbl = freshTable()
    Manifest.commit(Seq(10, 20).toDF("x"), tbl)
    val pinned = Manifest.read(spark, tbl) // resolves v1's file list NOW
    Manifest.commit(Seq(30).toDF("x"), tbl)
    assert(pinned.as[Int].collect().sorted.toSeq == Seq(10, 20))
    assert(Manifest.read(spark, tbl).as[Int].collect().sorted.toSeq ==
      Seq(10, 20, 30))
  }

  test("replace commit rewrites the file list, preserves content, and " +
    "keeps every prior version readable (OPTIMIZE shape)") {
    val tbl = freshTable()
    Manifest.commit((1 to 50).toDF("x"), tbl)
    Manifest.commit((51 to 100).toDF("x"), tbl)
    val before = Manifest.read(spark, tbl)
    val v3 = Manifest.commit(before.repartition(1), tbl, replace = true)
    assert(v3 == 3L)
    val after = Manifest.read(spark, tbl)
    assert(after.as[Int].collect().sorted.toSeq == (1 to 100))
    assert(after.inputFiles.length == 1, "compacted to one file")
    assert(before.inputFiles.length > 1)
    // time travel to the pre-compaction versions still works
    assert(Manifest.read(spark, tbl, 1L).count() == 50L)
    assert(Manifest.read(spark, tbl, 2L).count() == 100L)
  }

  test("reading an uncommitted version or an empty table fails loudly") {
    val tbl = freshTable()
    intercept[IllegalArgumentException](Manifest.read(spark, tbl))
    Manifest.commit(Seq(1).toDF("x"), tbl)
    intercept[IllegalArgumentException](Manifest.read(spark, tbl, 7L))
  }
}
