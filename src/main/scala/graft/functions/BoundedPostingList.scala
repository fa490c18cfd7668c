package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Posting-list aggregate with a HARD cap: collects the group's long ids
  * up to `cap` of them; a group that exceeds the cap evaluates to NULL
  * instead of a list.
  *
  * This is the memory-bounded building block an inverted-index blocking
  * join needs at scale: `collect_list` has an unbounded per-group buffer
  * (one boilerplate shingle shared by 1e8 documents is an 800 MB
  * aggregation buffer → executor OOM), while this buffer can never hold
  * more than cap+1 longs — a hot key costs 8*(cap+1) bytes and is dropped
  * by the df-cap filter anyway, exactly the outcome the two-phase
  * count-then-join plan produced with one extra shuffle of the full
  * posting stream. Partial (map-side) aggregation applies as usual, so the
  * exchange carries at most cap+1 longs per (shingle, map-partition).
  *
  * eval() sorts the list, making downstream pair expansion deterministic
  * and pre-ordered (id_i < id_j for i < j). Ids are assumed unique within
  * a group (one posting per (doc, term)), which the shingle explode
  * guarantees: per-doc shingles are distinct.
  */
case class BoundedPostingList(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  require(cap >= 1, "cap must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_posting_list"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  // length cap+1 is the saturated "overflowed" state; once there, stop
  // appending — the group can only evaluate to null, so its members are
  // irrelevant and a million-doc hot key still costs 8*(cap+1) bytes
  override def update(buf: mutable.ArrayBuffer[Long],
                      input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Long],
                     other: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buf.length <= cap) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    if (buf.length > cap) null
    else new GenericArrayData(buf.sorted.toArray[Long])

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedPostingList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedPostingList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
