package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{hashing, TextKernels}

/** Seeded sample-based property checks for the ingest kernels and the
  * cross-engine hash (same style as TextKernelsSpec — the
  * scalatest<->scalacheck bridge isn't in the offline cache). */
class IngestPropertySpec extends AnyFunSuite {

  private def samples(n: Int = 300): Seq[String] = {
    val rnd = new scala.util.Random(7)
    val alphabet = "aZ9 _-ñÁü.?!%&=+á€"
    (0 until n).map { _ =>
      (0 until rnd.nextInt(25))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  test("urlEncode round-trips through URLDecoder for latin-1 strings") {
    for (s <- samples()) {
      val latin1 = s.filter(c => c < 256)
      val enc = ingest.urlEncode(latin1)
      assert(java.net.URLDecoder.decode(enc, "ISO-8859-1") == latin1)
      // encoded form is pure unreserved/percent ASCII
      assert(enc.matches("([A-Za-z0-9\\-_.~]|%[0-9A-F]{2})*"))
    }
  }

  test("urlEncode UTF-8 round-trips for arbitrary strings") {
    for (s <- samples()) {
      val enc = ingest.urlEncode(s, "UTF-8")
      assert(java.net.URLDecoder.decode(enc, "UTF-8") == s)
    }
  }

  test("parseHtmlTable is robust to attribute noise and nesting") {
    for (cell <- samples().take(50)) {
      val safe = cell.replaceAll("[<>&]", "")
      val html = s"""<table><tr class="x"><td id='1'><i>$safe</i></td></tr></table>"""
      val parsed = ingest.parseHtmlTable(html)
      if (safe.replaceAll("\\s+", " ").trim.nonEmpty)
        assert(parsed == Seq(Seq(safe.replaceAll("\\s+", " ").trim)))
    }
  }

  test("md5Long is non-negative, 60-bit, and stable") {
    for (s <- samples()) {
      val h = hashing.md5Long(s)
      assert(h >= 0L && h < (1L << 60))
      assert(h == hashing.md5Long(s))
    }
  }

  test("minhash permutation constants are in-range and distinct") {
    assert(hashing.A.distinct.size == hashing.NumHashes)
    assert(hashing.A.forall(a => a > 0 && a < hashing.P))
    assert(hashing.B.forall(b => b >= 0 && b < hashing.P))
  }

  test("rollingHash stays in [0, 1e9+7) and is order-sensitive") {
    for (s <- samples()) {
      val h = TextKernels.rollingHash(s)
      assert(h >= 0L && h < 1000000007L)
    }
    assert(TextKernels.rollingHash("ab") != TextKernels.rollingHash("ba"))
  }
}
