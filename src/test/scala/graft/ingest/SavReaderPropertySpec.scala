package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz round-trip for the `.sav` reader: random tables (random
  * variable mix, widths, values, sysmis, endianness, compression) written
  * by a generalized record emitter and read back value-for-value. Same
  * seeded-sample style as IngestPropertySpec (the scalatest<->scalacheck
  * bridge isn't in the offline cache).
  */
class SavReaderPropertySpec extends AnyFunSuite {

  private val SysMis = -java.lang.Double.MAX_VALUE

  /** width 0 = numeric; values: java.lang.Double | null (sysmis) | String */
  private def savBytes(vars: Seq[(String, Int)], rows: Seq[Seq[Any]],
      compressed: Boolean, order: ByteOrder): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def i32(v: Int): Unit =
      bos.write(ByteBuffer.allocate(4).order(order).putInt(v).array())
    def f64(v: Double): Unit =
      bos.write(ByteBuffer.allocate(8).order(order).putDouble(v).array())
    def pad(s: String, w: Int): Unit = {
      val b = s.getBytes("ISO-8859-1")
      bos.write(b, 0, math.min(b.length, w))
      (b.length until w).foreach(_ => bos.write(' '))
    }
    def elems(w: Int): Int = if (w <= 0) 1 else (w + 7) / 8
    // Storage segments for a declared width: one, except very long strings
    // (w > 255) which split into 255-wide segments (last narrower).
    def segsOf(w: Int): Seq[Int] =
      if (w <= 255) Seq(w)
      else {
        val n = (w + 251) / 252
        Seq.fill(n - 1)(255) :+ (w - (n - 1) * 252)
      }

    pad("$FL2", 4); pad("fuzz writer", 60)
    i32(2); i32(vars.map(v => segsOf(v._2).map(elems).sum).sum)
    i32(if (compressed) 1 else 0); i32(0); i32(rows.length)
    f64(100.0); pad("01 Jan 00", 9); pad("00:00:00", 8); pad("fuzz", 64)
    pad("", 3)
    vars.foreach { case (name, w) =>
      segsOf(w).zipWithIndex.foreach { case (sw, j) =>
        i32(2); i32(if (w == 0) 0 else sw); i32(0); i32(0)
        i32(0); i32(0); pad(if (j == 0) name else s"${name}S$j", 8)
        (1 until elems(sw)).foreach { _ => // continuations
          i32(2); i32(-1); i32(0); i32(0); i32(0); i32(0); pad("", 8)
        }
      }
    }
    val vlsEntries = vars.collect { case (n, w) if w > 255 => s"$n=$w" }
    if (vlsEntries.nonEmpty) {
      val table = vlsEntries.mkString("", "\u0000\t", "\u0000\t")
      i32(7); i32(14); i32(1); i32(table.length)
      bos.write(table.getBytes("ISO-8859-1"))
    }
    i32(999); i32(0)

    val cmds = new ArrayBuffer[Int]
    val lits = new ArrayBuffer[Array[Byte]]
    def flushBlock(): Unit = if (cmds.nonEmpty) {
      while (cmds.size < 8) cmds += 0
      cmds.foreach(bos.write); lits.foreach(bos.write)
      cmds.clear(); lits.clear()
    }
    def cmd(c: Int): Unit = { cmds += c; if (cmds.size == 8) flushBlock() }
    def lit8(b: Array[Byte]): Unit = { lits += b; cmd(253) }
    def num(v: Double): Unit =
      if (!compressed) f64(v)
      else if (v == SysMis) cmd(255)
      else if (v == math.rint(v) && v >= -99.0 && v <= 151.0) cmd(v.toInt + 100)
      else lit8(ByteBuffer.allocate(8).order(order).putDouble(v).array())
    def strSeg(v: String, width: Int): Unit = {
      val padded = v + " " * (elems(width) * 8 - v.length)
      padded.grouped(8).foreach { chunk =>
        if (!compressed) pad(chunk, 8)
        else if (chunk == "        ") cmd(254)
        else lit8(chunk.getBytes("ISO-8859-1"))
      }
    }
    // Very long strings: pad to full width, emit 252-byte slices into the
    // 255-wide segments (the last slice into the final narrow segment).
    def str(v: String, width: Int): Unit =
      if (width <= 255) strSeg(v, width)
      else {
        val full = v + " " * (width - v.length)
        segsOf(width).zipWithIndex.foreach { case (sw, j) =>
          strSeg(full.slice(j * 252, math.min((j + 1) * 252, width)), sw)
        }
      }
    rows.foreach { r =>
      r.zip(vars).foreach {
        case (null, _) => num(SysMis)
        case (d: java.lang.Double, _) => num(d)
        case (s: String, (_, w)) => str(s, w)
        case other => fail(s"bad cell $other")
      }
    }
    if (compressed) { cmd(252); flushBlock() }
    bos.toByteArray
  }

  test("random tables round-trip value-for-value (all variants)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abz AZ9-ñü.%"
    (0 until 60).foreach { trial =>
      val nVars = 1 + rnd.nextInt(5)
      val vars = (0 until nVars).map { i =>
        val w = rnd.nextInt(4) match {
          case 0 => 0 // numeric
          case 1 => 1 + rnd.nextInt(8) // short string
          case 2 => 9 + rnd.nextInt(16) // string with continuations
          case _ => 256 + rnd.nextInt(520) // very long string (segments)
        }
        (s"V$i", w)
      }
      val rows = (0 until rnd.nextInt(8)).map { _ =>
        vars.map { case (_, w) =>
          if (w == 0) rnd.nextInt(4) match {
            case 0 => null // sysmis
            case 1 => Double.box(rnd.nextInt(251) - 99.0) // biased-int range
            case _ => Double.box(rnd.nextDouble() * 2e6 - 1e6)
          } else {
            // no trailing spaces (reader strips them by design)
            val len = rnd.nextInt(w + 1)
            val s = (0 until len)
              .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
            s.reverse.dropWhile(_ == ' ').reverse
          }
        }
      }
      val compressed = rnd.nextBoolean()
      val order = if (rnd.nextBoolean()) ByteOrder.LITTLE_ENDIAN
        else ByteOrder.BIG_ENDIAN
      val bytes = savBytes(vars, rows, compressed, order)
      val layout = SavReader.layout(bytes)
      assert(layout.schema.fieldNames.toSeq == vars.map(_._1),
        s"trial $trial names")
      val got = try SavReader.rows(bytes).toSeq catch {
        case e: Exception => fail(s"trial $trial threw '${e.getMessage}' " +
          s"(compressed=$compressed order=$order vars=$vars " +
          s"rows=${rows.map(_.mkString("[", "|", "]")).mkString(" ")})")
      }
      assert(got.length == rows.length, s"trial $trial row count " +
        s"(compressed=$compressed order=$order vars=$vars)")
      rows.zip(got).zipWithIndex.foreach { case ((exp, act), ri) =>
        exp.indices.foreach { ci =>
          val e = exp(ci)
          val a = if (act.isNullAt(ci)) null else act.get(ci)
          assert(a == e, s"trial $trial row $ri col $ci " +
            s"(compressed=$compressed order=$order): got $a want $e")
        }
      }
    }
  }
}
