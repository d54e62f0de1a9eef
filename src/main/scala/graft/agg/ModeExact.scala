package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native TypedImperativeAggregate for the deterministic mode (A1):
  * same contract as the original Aggregator (ignore nulls; winner = max
  * count, ties to the binary-smallest value), but with a primitive
  * HashMap buffer and hand-rolled compact serialization — no kryo
  * round-trip per partial-merge, which is what dominates Aggregator-based
  * UDAFs at shuffle time on large groups.
  */
case class ModeExact(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  override def update(buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: the UTF8String points into reusable row memory
      val key = v.asInstanceOf[UTF8String].clone()
      buf.merge(key, 1L, (a, b) => a + b)
    }
    buf
  }

  override def merge(a: java.util.HashMap[UTF8String, Long],
      b: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    a
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    var bestV: UTF8String = null
    var bestN = 0L
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val better = e.getValue > bestN ||
        (e.getValue == bestN && (bestV == null || e.getKey.compareTo(bestV) < 0))
      if (better) { bestV = e.getKey; bestN = e.getValue }
    }
    bestV
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "mode_exact"

  override def withNewMutableAggBufferOffset(newOffset: Int): ModeExact =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ModeExact =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ModeExact =
    copy(child = newChild)
}
