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

  private def tableParquets(tbl: String): Seq[String] = {
    val root = java.nio.file.Paths.get(tbl)
    val s = Files.walk(root)
    try s.toArray.map(_.toString).toSeq
      .filter(_.endsWith(".parquet"))
      .map(p => root.relativize(java.nio.file.Paths.get(p)).toString)
      .sorted
    finally s.close()
  }

  test("vacuum keeps retained versions byte-identical and actually " +
    "deletes the files only dropped versions referenced") {
    val tbl = freshTable()
    Manifest.commit((1 to 50).toDF("x"), tbl)            // v1 append
    Manifest.commit((51 to 100).toDF("x"), tbl)          // v2 append
    Manifest.commit(                                     // v3 replace
      Manifest.read(spark, tbl).repartition(1), tbl, replace = true)
    val before = Manifest.read(spark, tbl, 3L).as[Int].collect().sorted.toSeq
    val filesBefore = tableParquets(tbl)

    val (dropped, gone) = Manifest.vacuum(tbl, retainLast = 1)
    assert(dropped == Seq(1L, 2L))
    // v1/v2's files are unreferenced by the retained replace commit: gone
    assert(gone.nonEmpty)
    gone.foreach(rel => assert(
      !Files.exists(java.nio.file.Paths.get(tbl).resolve(rel))))
    assert(tableParquets(tbl) == (filesBefore.toSet -- gone).toSeq.sorted)
    // the retained version reads back identically post-vacuum
    assert(Manifest.read(spark, tbl).as[Int].collect().sorted.toSeq ==
      before)
    assert(Manifest.version(tbl) == 3L)
  }

  test("vacuum under a pure append chain reclaims nothing: every dropped " +
    "version's files are shared with (carried forward by) the retained one") {
    val tbl = freshTable()
    Manifest.commit(Seq(1, 2).toDF("x"), tbl)   // v1
    Manifest.commit(Seq(3).toDF("x"), tbl)      // v2 carries v1's files
    Manifest.commit(Seq(4).toDF("x"), tbl)      // v3 carries v1+v2's files
    val filesBefore = tableParquets(tbl)
    val (dropped, gone) = Manifest.vacuum(tbl, retainLast = 1)
    assert(dropped == Seq(1L, 2L))
    assert(gone.isEmpty, "append lineage shares every file with the head")
    assert(tableParquets(tbl) == filesBefore)
    assert(Manifest.read(spark, tbl).as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 4))
  }

  test("reading a vacuumed version fails loudly; newer survivors still " +
    "time-travel") {
    val tbl = freshTable()
    Manifest.commit(Seq(1).toDF("x"), tbl)                       // v1
    Manifest.commit(Seq(2).toDF("x"), tbl, replace = true)       // v2
    Manifest.commit(Seq(3).toDF("x"), tbl)                       // v3
    Manifest.vacuum(tbl, retainLast = 2)
    val err = intercept[IllegalArgumentException](
      Manifest.read(spark, tbl, 1L))
    assert(err.getMessage.contains("is not committed"))
    assert(Manifest.read(spark, tbl, 2L).as[Int].collect().toSeq == Seq(2))
    assert(Manifest.read(spark, tbl, 3L).as[Int].collect().sorted.toSeq ==
      Seq(2, 3))
  }

  test("re-vacuum after an interrupted run (manifests gone, data files " +
    "stranded) sweeps the strays; retaining everything is a no-op") {
    val tbl = freshTable()
    Manifest.commit(Seq(1).toDF("x"), tbl)                       // v1
    Manifest.commit(Seq(2).toDF("x"), tbl, replace = true)       // v2
    // retaining at least as many versions as exist drops nothing and —
    // with no strays yet — deletes nothing
    assert(Manifest.vacuum(tbl, retainLast = 5) == (Seq.empty, Seq.empty))
    // simulate a vacuum that died between its two phases: v1's manifest
    // already deleted, v1's data files still on disk
    Files.delete(java.nio.file.Paths.get(tbl, "_manifests", "v000001.txt"))
    val strays = tableParquets(tbl).filter(_.contains("b000001"))
    assert(strays.nonEmpty)
    val (dropped, gone) = Manifest.vacuum(tbl, retainLast = 1)
    assert(dropped.isEmpty, "no committed version was dropped this run")
    assert(gone == strays, "the sweep reclaims orphans whose manifest is " +
      "already gone")
    assert(tableParquets(tbl).forall(!_.contains("b000001")))
    assert(Manifest.read(spark, tbl).as[Int].collect().toSeq == Seq(2))
  }

  test("vacuum never touches a batch dir above the newest committed " +
    "version (an in-flight commit's data lands before its manifest)") {
    val tbl = freshTable()
    Manifest.commit(Seq(1).toDF("x"), tbl)                       // v1
    // simulate an in-flight v2: data written, manifest not yet published
    val inflight = java.nio.file.Paths.get(tbl, "data", "b000002")
    Seq(99).toDF("x").write.parquet(inflight.toString)
    val inflightFiles = tableParquets(tbl).filter(_.contains("b000002"))
    assert(inflightFiles.nonEmpty)
    val (_, gone) = Manifest.vacuum(tbl, retainLast = 1)
    assert(gone.isEmpty)
    assert(tableParquets(tbl).filter(_.contains("b000002")) == inflightFiles)
    intercept[IllegalArgumentException](Manifest.vacuum(tbl, 0))
  }
}
