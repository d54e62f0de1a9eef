package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextKernelsSpec extends AnyFunSuite {

  // Seeded sample-based property checks (the scalatest<->scalacheck bridge
  // isn't in the offline dependency cache, so properties are spelled as
  // deterministic loops).
  private def samples(n: Int = 500): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "aZ9 _-ñÁü.?!/\\\t\n€漢" // ascii + accents + wide chars
    (0 until n).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  test("stripAccents removes latin diacritics") {
    assert(TextKernels.stripAccents("Ñandú café ÁÉÍÓÚ üï") === "Nandu cafe AEIOU ui")
  }

  test("stripAccents is identity on ASCII") {
    for (s <- samples()) {
      val ascii = s.filter(c => c < 128)
      assert(TextKernels.stripAccents(ascii) === ascii)
    }
  }

  test("slugify matches reference outputs (verified against the Python impl)") {
    assert(TextKernels.slugify("Módulo 85: Educación (2023)") === "modulo_85_educacion_2023")
    assert(TextKernels.slugify("  a  b  ") === "a_b")
    assert(TextKernels.slugify("UPPER-case_ok") === "upper-case_ok")
    assert(TextKernels.slugify("") === "")
    // exact outputs of the reference's slugify on tricky inputs:
    assert(TextKernels.slugify("Ñandú  Café!") === "nandu_cafe")
    assert(TextKernels.slugify("ENAHO 2023 - Módulo 01.zip") === "enaho_2023_-_modulo_01zip")
    assert(TextKernels.slugify("¿Qué?") === "que")
    assert(TextKernels.slugify("tab\there") === "tab_here")
    assert(TextKernels.slugify("ümlaut STRASSE ß") === "umlaut_strasse_ß")
    assert(TextKernels.slugify("num3ro 42%") === "num3ro_42")
  }

  test("slugify is idempotent and emits no whitespace/specials") {
    for (s <- samples()) {
      val once = TextKernels.slugify(s)
      assert(TextKernels.slugify(once) === once, s"input: $s")
      assert(!once.exists(c => c.isWhitespace || c.isUpper), s"input: $s")
    }
  }

  test("rollingHash known values and bounds") {
    assert(TextKernels.rollingHash("") === 0L)
    assert(TextKernels.rollingHash("a") === 97L)
    assert(TextKernels.rollingHash("ab") === 97L * 31 + 98)
    for (s <- samples()) {
      val h = TextKernels.rollingHash(s)
      assert(h >= 0L && h < 1000000007L)
    }
  }

  test("bpePairArray / bpeRewrite kernels match the declarative contract " +
    "(equal neighbors skipped, greedy walk == merge-every-match)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: String*): GenericArrayData =
      new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    def pairsOf(a: org.apache.spark.sql.catalyst.util.ArrayData) =
      (0 until a.numElements()).map { j =>
        val p = a.getStruct(j, 2)
        (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
      }
    // candidates: equal neighbors excluded; < 2 tokens -> empty
    assert(pairsOf(TextKernels.bpePairArray(arr("x", "y", "y", "z"))) ==
      Seq(("x", "y"), ("y", "z")))
    assert(TextKernels.bpePairArray(arr("solo")).numElements() == 0)
    assert(TextKernels.bpePairArray(arr()).numElements() == 0)
    // tuple identity: merged units with spaces stay distinct components
    assert(pairsOf(TextKernels.bpePairArray(arr("a b", "c"))) ==
      Seq(("a b", "c")))
    // rewrite: both disjoint pairs fuse in one pass; l = r runs untouched
    def ps(pairs: (String, String)*): GenericArrayData =
      new GenericArrayData(pairs.map { case (l, r) =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(l), UTF8String.fromString(r))
      }.toArray[Any])
    def rw(toks: Seq[String], pairs: (String, String)*): Seq[String] = {
      val out = TextKernels.bpeRewrite(arr(toks: _*), ps(pairs: _*))
      (0 until out.numElements()).map(out.getUTF8String(_).toString)
    }
    assert(rw(Seq("a", "b", "c", "d", "e"), ("a", "b"), ("d", "e")) ==
      Seq("a b", "c", "d e"))
    assert(rw(Seq("q", "q", "q"), ("q", "q")) == Seq("q", "q", "q"))
    assert(rw(Seq("a", "b", "a", "b"), ("a", "b")) == Seq("a b", "a b"))
    assert(rw(Seq("a b", "c", "a", "b c"), ("a b", "c")) ==
      Seq("a b c", "a", "b c"), "tuple identity: only the (a b, c) side merges")
    assert(rw(Nil, ("a", "b")) == Nil)
    assert(rw(Seq("x", "y")) == Seq("x", "y"), "empty batch is identity")
  }

  test("minhashSigArray == min over the LCG permutation family, per index") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: String*): GenericArrayData =
      new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    val shingles = Seq("a b c", "b c d", "c d ñ", "a b c") // dup on purpose
    val sig = TextKernels.minhashSigArray(arr(shingles: _*))
    val expected = (0 until hashing.NumHashes).map { j =>
      shingles.map { s =>
        val h = TextKernels.md5Long60(s.getBytes("UTF-8")) % hashing.P
        (hashing.A(j) * h + hashing.B(j)) % hashing.P
      }.min
    }
    assert((0 until hashing.NumHashes).map(sig.getLong) == expected)
    assert(TextKernels.minhashSigArray(arr()) == null)
  }

  test("property: minhashSigArray == LCG-permutation mins and " +
    "bpePairArray/bpeRewrite == their reference walks on random unicode") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    val alphabet = Seq("a", "b", "ñ", "€x", "z9", "_", "á b")
    def arr(ts: Seq[String]): GenericArrayData =
      new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    def strs(a: ArrayData): Seq[String] =
      (0 until a.numElements()).map(a.getUTF8String(_).toString)
    for (_ <- 1 to 200) {
      val toks = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      // minhash signature vs the direct permutation-min formulation
      val sig = TextKernels.minhashSigArray(arr(toks))
      if (toks.isEmpty) assert(sig == null)
      else {
        val expected = (0 until hashing.NumHashes).map { j =>
          toks.map { s =>
            val h = TextKernels.md5Long60(s.getBytes("UTF-8")) % hashing.P
            (hashing.A(j) * h + hashing.B(j)) % hashing.P
          }.min
        }
        assert((0 until hashing.NumHashes).map(sig.getLong) == expected)
      }
      // pair extraction vs the sliding-window reference walk
      val pairs = TextKernels.bpePairArray(arr(toks))
      val expPairs = toks.zip(toks.drop(1)).filter { case (l, r) => l != r }
      assert((0 until pairs.numElements()).map { i =>
        val row = pairs.getStruct(i, 2)
        (row.getUTF8String(0).toString, row.getUTF8String(1).toString)
      } == expPairs)
      // batched rewrite vs a scala greedy walk under the batch contract
      // (token-disjoint, l != r): one random conforming pair
      val cand = expPairs.distinct.filter { case (l, r) =>
        expPairs.flatMap(p => Seq(p._1, p._2)).count(t =>
          t == l || t == r) >= 1 }
      if (cand.nonEmpty) {
        val (l, r) = cand(rnd.nextInt(cand.size))
        val got = strs(TextKernels.bpeRewrite(arr(toks),
          new GenericArrayData(Array[Any](
            org.apache.spark.sql.catalyst.InternalRow(
              UTF8String.fromString(l), UTF8String.fromString(r))))))
        val exp = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
              out += s"$l $r"; i += 2
            } else { out += toks(i); i += 1 }
          }
          out.toSeq
        }
        assert(got == exp, s"toks=$toks pair=($l,$r)")
      }
    }
  }

  test("md5Long60 == parseLong(md5 hex take 15) for arbitrary strings") {
    def viaHex(str: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.take(15), 16)
    }
    for (s <- samples() ++ Seq("", "a", "ñandú café", "\u0000x", "三", "🎉")) {
      val fast = TextKernels.md5Long60(s.getBytes("UTF-8"))
      assert(fast === viaHex(s), s"input: $s")
      assert(fast >= 0L && fast < (1L << 60), s"input: $s")
    }
  }
}
