package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing primitives for the dedup / similarity
  * operators (north-star extensions beyond the reference surface; the
  * reference's only hashing is SHA-256 file dedup,
  * `perustats/inei/utils/file_utils.py:26-32`).
  *
  * Everything here is defined so the DuckDB oracle can replay it EXACTLY in
  * SQL: the base 60-bit hash is the first 15 hex chars of md5 (md5 is
  * bit-identical everywhere), and all derived hashes (MinHash permutations,
  * SimHash bits, hyperplane projections) are integer arithmetic on top of it.
  * Each Column builder has an `sql*` twin producing the equivalent DuckDB
  * expression, so the two sides are generated from the same constants and
  * cannot drift.
  *
  * Scale note: md5 is not the cheapest hash (xxhash64 is ~5× faster) but it
  * is the only one both engines share bit-for-bit. The operators in
  * [[graft.ops.Dedup]] take the hash as a pluggable Column so production runs
  * can swap in `xxhash64` without touching the algorithm.
  */
object hashing {

  /** Mersenne prime 2^31-1: modulus for the MinHash permutation family. */
  val P: Long = 2147483647L

  val NumHashes = 12
  val Bands = 4
  val Rows = 3 // NumHashes / Bands

  /** LCG-derived permutation coefficients, fixed at library-build time so the
    * oracle SQL embeds the same literals. a_j must be nonzero mod P. */
  val A: IndexedSeq[Long] =
    (1 to NumHashes).map(j => ((1103515245L * j + 12345L) % P) max 1L)
  val B: IndexedSeq[Long] =
    (1 to NumHashes).map(j => (214013L * j + 2531011L) % P)

  /** 60-bit base hash: first 15 hex chars of md5, as a non-negative long.
    * Backed by the codegen'd [[graft.functions.Md5Long60]] expression,
    * which reads the value off the digest bytes directly — bit-identical
    * to the `conv(substring(md5(c),1,15),16,10)` formulation (the oracle
    * twin below is unchanged) without the per-value hex round-trip. */
  def h64(c: Column): Column = graft.functions.expressions.md5Long60(c)

  /** PRODUCTION 60-bit hash: xxhash64 masked to 60 bits — same domain as
    * [[h64]] (non-negative, < 2^60) but ~3× cheaper per value and fully
    * codegen'd with no hex-string round-trip. NOT oracle-replayable (DuckDB
    * v1.0.0 has no xxhash64); use where the RESULT is hash-independent —
    * e.g. exact-Jaccard-verified near-dup pairs, whose scores depend only
    * on shingle set identity, not on which collision-free hash keyed them. */
  def xxh60(c: Column): Column =
    xxhash64(c).bitwiseAND(lit((1L << 60) - 1))

  /** DuckDB twin of [[h64]]. */
  def sqlH64(e: String): String =
    s"CAST(concat('0x', substr(md5($e),1,15)) AS BIGINT)"

  /** j-th MinHash permutation of an h64-mod-P value column. */
  def perm(j: Int, hModP: Column): Column =
    (lit(A(j)) * hModP + lit(B(j))) % lit(P)

  /** DuckDB twin of [[perm]] over an expression for (h64 % P). */
  def sqlPerm(j: Int, e: String): String = s"((${A(j)} * $e + ${B(j)}) % $P)"

  /** Pseudo-random hyperplane component in [-1, 1] for plane `j`, dim `c`:
    * derived from the shared base hash so both engines agree bit-for-bit. */
  def hyperplane(j: Int, c: Int): Double =
    ((md5Long(s"hp${j}_$c") % 2001L) - 1000L) / 1000.0

  /** JVM-side h64 of a literal string (same bits as [[h64]] — one shared
    * implementation, [[TextKernels.md5Long60]], so the bit contract cannot
    * drift between the column path and the seed/hyperplane derivations). */
  def md5Long(s: String): Long = TextKernels.md5Long60(s.getBytes("UTF-8"))
}
