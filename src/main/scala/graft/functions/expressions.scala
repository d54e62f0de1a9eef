package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the handful of scalar functions Spark's
  * built-ins cannot express (SURVEY §2.10). All implement `doGenCode` so they
  * stay inside whole-stage codegen (a static call into
  * [[graft.functions.TextKernels]]) instead of falling back to interpreted
  * evaluation — at 100 TB the difference between a codegen'd expression and a
  * Scala UDF (ser/de per row) is material.
  */

/** Reference `perustats/inei/utils/file_utils.py:12-23` (semantics only). */
case class Slugify(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextKernels.slugify(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextKernels.slugify($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "slugify"
}

/** NFD-decompose + drop combining marks ("ñandú" -> "nandu").
  * Reference `perustats/infogob/11_locations_refs.py:45-63` (semantics only).
  */
case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextKernels.stripAccents(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextKernels.stripAccents($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "strip_accents"
}

/** Polynomial rolling hash (document fingerprint), mod 1e9+7. */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.rollingHash(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.rollingHash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

/** Strict left-fold dot product of two numeric arrays, in double:
  * `acc := acc + (double)a[i] * (double)b[i]` for i = 0..n-1. Bit-identical
  * to the DuckDB oracle's `list_reduce` fold and to the equivalent
  * `aggregate(zip_with(...))` higher-order pipeline — but codegen'd as a
  * tight primitive loop, which matters enormously for pairwise similarity
  * (HOF lambdas are interpreted per element; this is ~10-50× faster).
  * Null elements are treated as impossible (embedding columns are dense);
  * mismatched lengths fold over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** 60-bit md5 prefix hash (the dedup family's base hash) computed from the
  * digest bytes directly — bit-identical to
  * `conv(substring(md5(c),1,15),16,10)` but with no 32-char hex string, no
  * substring, and no base-16 string parse per value. The DuckDB oracle twin
  * is unchanged ([[graft.functions.hashing.sqlH64]]).
  */
case class Md5Long60(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.md5Long60(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.md5Long60($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_long60"
}

/** DEFLATE-compressed byte count of the UTF-8 text — the kernel of the
  * compression-ratio quality signal (Gopher/RefinedWeb-style repetition
  * proxy: templated text compresses far below natural prose). No SQL
  * built-in can express it in either engine, so the matching query is
  * rows-only checked; semantics are spec-tested against known inputs.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextKernels.deflateLen(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.deflateLen($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_len"
}

/** One-pass n-gram duplicate fraction over a token array (dup-2-gram
  * repetition signal). Value-identical to the shingle-array HOF pipeline in
  * [[graft.functions.textstats]] — same ' '-joined shingles, integer
  * counts, HALF_UP round to 4 — but a single hash-set walk in codegen
  * instead of interpreted transform/slice/array_join/array_distinct
  * lambdas per row (those dominate t9/t16's cost). */
case class NgramDupFraction(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(toks: Any, n: Any): Any =
    TextKernels.ngramDupFraction(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.ngramDupFraction($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ngram_dup_fraction"
}

/** One-pass k-shingle array over a token array — value-identical to the
  * sequence/slice/array_join HOF pipeline (same ' ' separator, same sub-k
  * empty guard) but a single codegen'd scan. The dedup family explodes
  * this for its shingle tables, so the per-document cost of candidate
  * generation starts here. */
case class ShingleArray(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(toks: Any, k: Any): Any =
    TextKernels.shingleArray(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.shingleArray($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "shingle_array"
}

/** One-pass top-n-gram occupancy (boilerplate/loop signal): max n-gram
  * multiplicity / total, computed with a hash-map count instead of the
  * sort + run-length fold. Same values, same rounding. */
case class NgramTopFraction(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(toks: Any, n: Any): Any =
    TextKernels.ngramTopFraction(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.ngramTopFraction($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ngram_top_fraction"
}

/** Candidate adjacent (l, r) pairs of a BPE unit array (equal neighbors
  * excluded) — value-identical to the transform+filter+struct HOF pipeline
  * but one codegen'd scan. Feeds the distributed pair-count aggregate of
  * [[graft.ops.TextSearch.bpePairCounts]]. */
case class BpePairArray(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("l", StringType), StructField("r", StringType))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.bpePairArray(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.bpePairArray($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_pair_array"
}

/** One-pass batched BPE rewrite of a unit array against an array of
  * (l, r) merge pairs — value-identical to the match-positions +
  * transform-rebuild HOF stack (exact under the token-disjoint / l ≠ r
  * batch contract) but a single codegen'd walk; the HOF version's
  * per-position exists() over the batch was the dominant interpreted cost
  * of the t20 rounds. */
case class BpeRewrite(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(toks: Any, pairs: Any): Any =
    TextKernels.bpeRewrite(
      toks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      pairs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.bpeRewrite($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bpe_rewrite"
}

/** Row-local MinHash signature (array of the NumHashes permutation minima)
  * over a shingle array in one codegen'd pass — the streaming LSH path's
  * kernel; null for empty shingle arrays. Bit-identical to the
  * min(perm(j, h64 % P)) Column formulation and the batch aggregate. */
case class MinhashSigArray(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashSigArray(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextKernels.minhashSigArray($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
    code
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig_array"
}

object expressions {
  def slugify(c: Column): Column = Bridge.column(Slugify(Bridge.expression(c)))
  def stripAccents(c: Column): Column = Bridge.column(StripAccents(Bridge.expression(c)))
  def rollingHash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def md5Long60(c: Column): Column = Bridge.column(Md5Long60(Bridge.expression(c)))
  def deflateLen(c: Column): Column = Bridge.column(DeflateLen(Bridge.expression(c)))
  def shingleArray(toks: Column, k: Column): Column =
    Bridge.column(ShingleArray(Bridge.expression(toks), Bridge.expression(k)))
  def ngramDupFraction(toks: Column, n: Column): Column =
    Bridge.column(NgramDupFraction(Bridge.expression(toks), Bridge.expression(n)))
  def ngramTopFraction(toks: Column, n: Column): Column =
    Bridge.column(NgramTopFraction(Bridge.expression(toks), Bridge.expression(n)))
  def bpePairArray(toks: Column): Column =
    Bridge.column(BpePairArray(Bridge.expression(toks)))
  def bpeRewrite(toks: Column, pairs: Column): Column =
    Bridge.column(BpeRewrite(Bridge.expression(toks), Bridge.expression(pairs)))
  def minhashSigArray(shingles: Column): Column =
    Bridge.column(MinhashSigArray(Bridge.expression(shingles)))
}
