package graft.functions

import java.text.Normalizer

/** Pure JVM string kernels backing graft's custom Catalyst expressions.
  *
  * Kept free of any Spark type so they are unit-testable and directly
  * callable from generated code (whole-stage codegen emits static calls into
  * this object — see [[graft.functions.Slugify]]).
  *
  * Semantics follow the reference library's text normalizers:
  *  - slugify: `perustats/inei/utils/file_utils.py:12-23` (NFD-normalize,
  *    drop combining marks, strip non word/space/dash, whitespace -> "_",
  *    lowercase).
  *  - stripAccents: `perustats/infogob/11_locations_refs.py:45-63`.
  */
object TextKernels {

  /** Unicode-decompose and drop combining marks: "ñandú" -> "nandu". */
  def stripAccents(s: String): String = {
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val ch = decomposed.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    sb.toString
  }

  /** Accent-strip, drop non word/space/dash chars, collapse whitespace to
    * "_", lowercase — with UNICODE character classes (`(?U)`) so `\w`/`\s`
    * match exactly what Python's `re` matches in the reference (unicode
    * letters like "ß" survive; NBSP counts as whitespace). */
  def slugify(s: String): String = {
    val noSpecial = stripAccents(s).replaceAll("(?U)[^\\w\\s\\-]", "")
    noSpecial.replaceAll("(?U)^\\s+|\\s+$", "")
      .replaceAll("(?U)\\s+", "_")
      .toLowerCase(java.util.Locale.ROOT)
  }

  /** Polynomial rolling hash over unicode code points, mod 1e9+7.
    * A deterministic document fingerprint usable from pure SQL on the oracle
    * side (fold of `(acc * 31 + codepoint) % 1000000007`).
    */
  private val md5Digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit md5 prefix as a non-negative long: the first 15 hex characters
    * of the digest parsed base-16 — computed directly from the first 8
    * digest bytes (big-endian >>> 4), skipping the hex-string round-trip
    * of the `conv(substring(md5(c),1,15),16,10)` formulation it is
    * bit-identical to (property-tested). */
  def md5Long60(b: Array[Byte]): Long = {
    val d = md5Digest.get()
    d.reset()
    val dig = d.digest(b)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  def rollingHash(s: String): Long = {
    val M = 1000000007L
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % M
      i += Character.charCount(cp)
    }
    acc
  }

  /** One reusable raw-deflate context per thread (Deflater is stateful and
    * not thread-safe; allocating per value would dominate the cost). Level
    * 6 (zlib default) fixed for determinism across runs. */
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** DEFLATE-compressed size of the bytes — the compression-ratio quality
    * signal's kernel (repetitive/templated text compresses far below
    * natural prose). Output length only; the compressed bytes are never
    * materialized. */
  def deflateLen(b: Array[Byte]): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(b)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Spark's `round(x, 4)` for doubles (shortest-decimal BigDecimal,
    * HALF_UP) — the kernels below must round exactly like the Column
    * formulation they replace, or the oracle replay breaks. */
  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def ngram(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      start: Int, n: Int, sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks.getUTF8String(start + j).toString)
      j += 1
    }
    sb.toString
  }

  /** One-pass k-shingle array (' '-joined token windows) — value-identical
    * to `transform(sequence(...), i -> array_join(slice(tok, i, k), ' '))`
    * with the sub-k guard, but built in a single scan with no interpreted
    * lambda per element. Feeds the whole dedup family's shingle tables. */
  def shingleArray(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val total = toks.numElements() - k + 1
    if (total <= 0 || k <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(
        ngram(toks, i, k, sb))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass n-gram duplicate fraction over a token array: (total −
    * distinct) / total of the n-gram multiset, 0 when fewer than n tokens.
    * Value-identical to the shingle-array HOF pipeline (same join
    * separator, same integer counts, same rounding) but a single hash-set
    * walk instead of transform+slice+array_join+array_distinct per row. */
  def ngramDupFraction(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): Double = {
    val total = toks.numElements() - n + 1
    if (total <= 0 || n <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    var distinct = 0
    while (i < total) {
      if (seen.add(ngram(toks, i, n, sb))) distinct += 1
      i += 1
    }
    round4((total - distinct).toDouble / total)
  }

  /** Candidate adjacent pairs of a BPE unit array as (l, r) struct rows —
    * the counting kernel of [[graft.ops.TextSearch.bpePairCounts]]: equal
    * neighbors excluded (the l ≠ r contract). One scan, no interpreted
    * lambda per element; values are cloned out of the (possibly reused)
    * input buffer. */
  def bpePairArray(toks: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    // clone each token ONCE and share the (immutable) copy between the
    // pair where it is the right member and the pair where it is the
    // left — per-pair cloning copies every interior token twice in the
    // hottest corpus pass of the t20 trainer
    val cloned = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { cloned(i) = toks.getUTF8String(i).clone(); i += 1 }
    val out = new java.util.ArrayList[Any](n - 1)
    i = 0
    while (i < n - 1) {
      if (!cloned(i).equals(cloned(i + 1)))
        out.add(org.apache.spark.sql.catalyst.InternalRow(
          cloned(i), cloned(i + 1)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** One-pass batched BPE rewrite: walk the unit array left-to-right; a
    * position starting ANY of the (l, r) pairs emits the fused unit
    * (l + " " + r) and skips the consumed neighbor. Exact vs the
    * merge-every-match formulation under the batch contract
    * ([[graft.ops.TextSearch]]: pairs token-disjoint, l ≠ r — matches can
    * never overlap, so the greedy walk and the global match set agree). */
  def bpeRewrite(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      pairs: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = toks.numElements()
    val ls = new Array[org.apache.spark.unsafe.types.UTF8String](pairs.numElements())
    val rs = new Array[org.apache.spark.unsafe.types.UTF8String](pairs.numElements())
    var m = 0
    var j = 0
    while (j < pairs.numElements()) {
      val p = pairs.getStruct(j, 2)
      // an l = r pair can never be selected (the candidate contract
      // excludes equal neighbors); ignore defensively rather than merge
      // with parity-dependent results
      if (!p.getUTF8String(0).equals(p.getUTF8String(1))) {
        ls(m) = p.getUTF8String(0)
        rs(m) = p.getUTF8String(1)
        m += 1
      }
      j += 1
    }
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      var matched = false
      if (i < n - 1) {
        val a = toks.getUTF8String(i)
        val b = toks.getUTF8String(i + 1)
        var k = 0
        while (!matched && k < m) {
          if (ls(k).equals(a) && rs(k).equals(b)) matched = true
          k += 1
        }
        if (matched) {
          out.add(org.apache.spark.unsafe.types.UTF8String.concat(a, space, b))
          i += 2
        }
      }
      if (!matched) {
        out.add(toks.getUTF8String(i).clone())
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Row-local MinHash signature over a shingle array: md5-60 hash mod P,
    * then the minimum of each of the [[hashing.NumHashes]] LCG
    * permutations — all in ONE pass over the shingles (the streaming LSH
    * path previously ran 12 interpreted transform passes + 12 array_min
    * passes per row). Bit-identical to the Column formulation
    * (`min(perm(j, h64(s) % P))`) and to the batch aggregate path.
    * Returns null for an empty shingle array (no signature — callers
    * filter those rows, matching the batch pipeline's empty-doc drop). */
  def minhashSigArray(shingles: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val nh = hashing.NumHashes
    val mins = Array.fill(nh)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = md5Long60(shingles.getUTF8String(i).getBytes) % hashing.P
      var j = 0
      while (j < nh) {
        val v = (hashing.A(j) * h + hashing.B(j)) % hashing.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(Long.box).toArray[Any])
  }

  /** One-pass top n-gram occupancy: max multiplicity / total, 0 when fewer
    * than n tokens. Value-identical to the sorted-run-length fold (max
    * multiplicity is what the longest equal run of the sorted array
    * computes) without materializing or sorting the shingle array. */
  def ngramTopFraction(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): Double = {
    val total = toks.numElements() - n + 1
    if (total <= 0 || n <= 0) return 0.0
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    var best = 0
    while (i < total) {
      val c = counts.merge(ngram(toks, i, n, sb), 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    round4(best.toDouble / total)
  }
}
