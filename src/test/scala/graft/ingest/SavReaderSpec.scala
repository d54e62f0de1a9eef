package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.types._
import graft.SparkSpec

/** S10: SPSS `.sav` ingest. The fixture is produced by an independent
  * record-by-record writer below that follows the publicly documented
  * system-file layout (GNU PSPP format docs) — header, string continuation
  * records, value labels, documents, extension subrecords — in all three
  * on-disk variants: bytecode-compressed, uncompressed, and big-endian.
  * Covers numeric/string mapping, latin-1 decode, trailing-pad stripping,
  * system-missing and user-missing (discrete + range) → nulls.
  */
class SavReaderSpec extends SparkSpec {

  private val SysMis = -java.lang.Double.MAX_VALUE

  /** Fixture writer — intentionally structured as a flat record emitter
    * (not sharing any code or tables with SavReader). */
  private def savBytes(compression: Int,
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def i32(v: Int): Unit =
      bos.write(ByteBuffer.allocate(4).order(order).putInt(v).array())
    def i64(v: Long): Unit =
      bos.write(ByteBuffer.allocate(8).order(order).putLong(v).array())
    def f64(v: Double): Unit =
      bos.write(ByteBuffer.allocate(8).order(order).putDouble(v).array())
    def pad(s: String, w: Int): Unit = {
      val b = s.getBytes("ISO-8859-1")
      bos.write(b, 0, math.min(b.length, w))
      (b.length until w).foreach(_ => bos.write(' '))
    }

    // --- file header (176 bytes; $FL3 marks the zlib variant) ---
    pad(if (compression == 2) "$FL3" else "$FL2", 4)
    pad("@(#) SPSS DATA FILE graft spec writer", 60)
    i32(2) // layout_code
    i32(81) // nominal case size: id(1)+score(1)+name(2)+grp(1)+notes(32+32+12)
    i32(compression)
    i32(0) // weight index: none
    i32(5) // ncases
    f64(100.0) // compression bias
    pad("12 Aug 26", 9)
    pad("12:00:00", 8)
    pad("graft .sav fixture", 64)
    pad("", 3)

    // --- variable records (type 2) ---
    def varRec(vtype: Int, name: String, label: Option[String],
        discreteMissing: Seq[Double], rangeMissing: Option[(Double, Double)])
        : Unit = {
      i32(2); i32(vtype)
      i32(if (label.isDefined) 1 else 0)
      val nm = rangeMissing match {
        case Some(_) => -(2 + discreteMissing.size)
        case None => discreteMissing.size
      }
      i32(nm)
      val fmt = if (vtype == 0) (5 << 16) | (8 << 8) | 2 // F8.2
                else (1 << 16) | (vtype << 8) // A<w>
      i32(fmt); i32(fmt)
      pad(name, 8)
      label.foreach { l =>
        i32(l.length)
        pad(l, ((l.length + 3) / 4) * 4)
      }
      rangeMissing.foreach { case (lo, hi) => f64(lo); f64(hi) }
      discreteMissing.foreach(f64)
    }
    varRec(0, "ID", None, Nil, None)
    varRec(0, "SCORE", Some("household score"), Seq(-9.0), None)
    varRec(12, "NAME", None, Nil, None)
    varRec(-1, "", None, Nil, None) // continuation for NAME's second element
    varRec(0, "GRP", None, Nil, Some((97.0, 99.0)))
    // NOTES: a 600-byte very long string — three dictionary segments
    // (255, 255, 96), each with its own continuation records, tied
    // together by the subtype-14 table below.
    Seq(("NOTES", 255), ("NOTES0", 255), ("NOTES1", 96)).foreach {
      case (nm, w) =>
        varRec(w, nm, None, Nil, None)
        (1 until (w + 7) / 8).foreach(_ => varRec(-1, "", None, Nil, None))
    }

    // --- value labels (type 3) + variable index (type 4) for GRP ---
    i32(3); i32(2)
    def vlabel(value: Double, label: String): Unit = {
      f64(value)
      bos.write(label.length)
      pad(label, ((label.length + 1 + 7) / 8) * 8 - 1)
    }
    vlabel(1.0, "uno")
    vlabel(2.0, "dos")
    i32(4); i32(1); i32(5) // 1-based dict index of GRP (incl. continuation)

    // --- documents (type 6) ---
    i32(6); i32(1); pad("written by the graft spec fixture writer", 80)

    // --- extension subrecord (type 7): flt64 info, skipped by readers ---
    i32(7); i32(4); i32(8); i32(3)
    f64(SysMis); f64(java.lang.Double.MAX_VALUE); f64(-SysMis)

    // --- subtype 13: long variable names (tab-separated SHORT=Long) ---
    val longNames = "NOTES=notes_long"
    i32(7); i32(13); i32(1); i32(longNames.length)
    pad(longNames, longNames.length)

    // --- subtype 14: very-long-string table (NUL+tab delimited) ---
    val vlsTable = "NOTES=00600\u0000\t"
    i32(7); i32(14); i32(1); i32(vlsTable.length)
    pad(vlsTable, vlsTable.length)

    // --- dictionary terminator ---
    i32(999); i32(0)

    // --- case data (emitted separately so the zlib variant can wrap it) ---
    val dbos = new ByteArrayOutputStream()
    def df64(v: Double): Unit =
      dbos.write(ByteBuffer.allocate(8).order(order).putDouble(v).array())
    def dpad(s: String): Unit = dbos.write(s.getBytes("ISO-8859-1"))
    val bytecode = compression >= 1
    val cmds = new ArrayBuffer[Int]
    val lits = new ArrayBuffer[Array[Byte]]
    def flushBlock(): Unit = if (cmds.nonEmpty) {
      while (cmds.size < 8) cmds += 0
      cmds.foreach(dbos.write)
      lits.foreach(dbos.write)
      cmds.clear(); lits.clear()
    }
    def cmd(c: Int): Unit = {
      cmds += c
      if (cmds.size == 8) flushBlock()
    }
    // literal must be registered before its 253 command: if that command
    // completes a block, the flush has to carry this literal with it.
    def lit8(b: Array[Byte]): Unit = { lits += b; cmd(253) }
    def num(v: Double): Unit =
      if (!bytecode) df64(v)
      else if (v == SysMis) cmd(255)
      else if (v == math.rint(v) && v >= -99.0 && v <= 151.0) cmd(v.toInt + 100)
      else lit8(ByteBuffer.allocate(8).order(order).putDouble(v).array())
    def str(v: String, width: Int): Unit = {
      val padded = v + " " * (((width + 7) / 8) * 8 - v.length)
      padded.grouped(8).foreach { chunk =>
        if (!bytecode) dpad(chunk)
        else if (chunk == "        ") cmd(254)
        else lit8(chunk.getBytes("ISO-8859-1"))
      }
    }
    // A very long string is written as the value space-padded to its full
    // width, sliced into 252-byte chunks, each chunk padded out to its
    // segment's width (255/255/96 here) and element boundary.
    def vlsStr(v: String, total: Int, segs: Seq[Int]): Unit = {
      val full = v + " " * (total - v.length)
      segs.zipWithIndex.foreach { case (w, j) =>
        str(full.slice(j * 252, math.min((j + 1) * 252, total)), w)
      }
    }
    def kase(id: Double, score: Double, name: String, grp: Double,
        notes: String): Unit = {
      num(id); num(score); str(name, 12); num(grp)
      vlsStr(notes, 600, Seq(255, 255, 96))
    }
    kase(1.0, 10.5, "Lima", 1.0, vlsValue(600))
    kase(2.0, SysMis, "Cuzco Perú", 2.0, "acta de Perú ñandú")
    kase(3.0, -9.0, "", 3.0, "")
    kase(4.0, 20.0, "abcdefghijkl", 98.0, vlsValue(252))
    kase(5.0, 7.0, "  x", 100.0, vlsValue(250) + "  x")
    if (bytecode) { cmd(252); flushBlock() }
    val data = dbos.toByteArray
    if (compression != 2) bos.write(data)
    else {
      // zheader + one zlib block + trailer with its block table
      val zheaderOfs = bos.size().toLong
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(data); deflater.finish()
      val cbuf = new Array[Byte](data.length + 64)
      val clen = deflater.deflate(cbuf)
      deflater.end()
      val blockOfs = zheaderOfs + 24
      val trailerOfs = blockOfs + clen
      i64(zheaderOfs); i64(trailerOfs); i64(24 + 24)
      bos.write(cbuf, 0, clen)
      i64(-100L); i64(0L); i32(0x3ff000); i32(1)
      i64(zheaderOfs); i64(blockOfs); i32(data.length); i32(clen)
    }
    bos.toByteArray
  }

  /** Deterministic long-string content: `n` chars cycling the alphabet,
    * ending in a non-space so the reader's pad-strip can't mask length. */
  private def vlsValue(n: Int): String =
    (0 until n).map(i => ('a' + i % 26).toChar).mkString

  private def write(bytes: Array[Byte], name: String): String = {
    val p = java.nio.file.Files.createTempDirectory("sav").resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  private val expectedSchema = StructType(Seq(
    StructField("ID", DoubleType),
    StructField("SCORE", DoubleType),
    StructField("NAME", StringType),
    StructField("GRP", DoubleType),
    StructField("notes_long", StringType)))

  private def checkValues(path: String): Unit = {
    val df = SavReader.readSav(spark, path)
    assert(df.schema == expectedSchema)
    val rows = df.collect().sortBy(_.getDouble(0))
    assert(rows.length == 5)
    assert(rows(0).getDouble(1) == 10.5 && rows(0).getString(2) == "Lima" &&
      rows(0).getDouble(3) == 1.0)
    assert(rows(1).isNullAt(1), "system-missing must be null")
    assert(rows(1).getString(2) == "Cuzco Perú", "latin-1 decode")
    assert(rows(2).isNullAt(1), "user-missing discrete code -9 must be null")
    assert(rows(2).getString(2) == "")
    assert(rows(3).getString(2) == "abcdefghijkl", "full-width string")
    assert(rows(3).isNullAt(3), "98 falls in the declared 97..99 range")
    assert(rows(4).getString(2) == "  x",
      "leading spaces kept, trailing pad stripped")
    assert(rows(4).getDouble(3) == 100.0, "just above the range is valid")
    // very-long-string segment stitching (252-byte data per 255-wide seg)
    assert(rows(0).getString(4) == vlsValue(600), "full 600-byte value")
    assert(rows(1).getString(4) == "acta de Perú ñandú",
      "short value in a long variable, latin-1")
    assert(rows(2).getString(4) == "", "empty very long string")
    assert(rows(3).getString(4) == vlsValue(252),
      "value exactly filling segment 1")
    assert(rows(4).getString(4) == vlsValue(250) + "  x",
      "interior spaces across the segment boundary survive")
  }

  test("bytecode-compressed .sav decodes (biased ints, literals, 254/255)") {
    checkValues(write(savBytes(compression = 1), "c.sav"))
  }

  test("uncompressed .sav decodes identically") {
    checkValues(write(savBytes(compression = 0), "u.sav"))
  }

  test("big-endian files are detected via the layout code") {
    checkValues(write(
      savBytes(compression = 1, order = ByteOrder.BIG_ENDIAN), "be.sav"))
  }

  test("readSavFiles distributes the parse and matches the local read") {
    val path = write(savBytes(compression = 1), "d.sav")
    val local = SavReader.readSav(spark, path).collect().map(_.toSeq).toSet
    val dist = SavReader.readSavFiles(spark, path).collect().map(_.toSeq).toSet
    assert(dist == local && dist.size == 5)
  }

  test("zlib-compressed .zsav decodes identically") {
    checkValues(write(savBytes(compression = 2), "z.zsav"))
  }

  test("big-endian .zsav decodes too") {
    checkValues(write(
      savBytes(compression = 2, order = ByteOrder.BIG_ENDIAN), "zbe.zsav"))
  }

  test("rejects non-system files loudly") {
    val e = intercept[IllegalArgumentException] {
      SavReader.layout("ZSAV9999".getBytes ++ new Array[Byte](200))
    }
    assert(e.getMessage.contains("$FL2"))
  }
}
