package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Single-pass 32-bit SimHash aggregate over pre-hashed tokens.
  *
  * `simhash_agg(h)` consumes one 32-bit token hash per input row and
  * returns the SimHash: bit b of the result is 1 iff more input hashes
  * had bit b set than unset. Equivalent to 32 conditional SUM columns +
  * recombination (see `operators/Dedup.dedup_simhash`'s oracle), but as a
  * native `TypedImperativeAggregate` it is one pass with a 32-int buffer,
  * supports partial aggregation (map-side combine — the buffer is the
  * per-bit counter vector, merged associatively), and keeps the plan to a
  * single aggregate function.
  *
  * This is the custom-aggregate extension point the brief calls for:
  * built-in `functions._` cannot express "per-bit majority vote" in one
  * aggregate; a UDAF would box; `TypedImperativeAggregate` gets Tungsten
  * buffer management for free.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 32) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < 32) {
      if (buf(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(32)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column-API entry point: aggregate of 32-bit token hashes (as LONG). */
  def simhash_agg(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      SimHashAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
  }
}
