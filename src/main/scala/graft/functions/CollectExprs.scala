package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

import scala.collection.mutable

/** `collect_upto(key, cap)` — collect_list with a HARD per-group state
  * bound: at most `cap` values are ever HELD per group, in the update
  * path, in every partial buffer, and across merges.
  *
  * Why it exists (ADVICE r17): rare-key blocking keeps only keys whose
  * document frequency is in [2, RareDfCap] and discards the rest — but
  * spelling that as `groupBy(key).collect_list(doc_id)` followed by a
  * size filter materializes the ENTIRE posting list of every hot key
  * (a stopword-like 13-gram present in millions of docs at 100 TB)
  * inside the aggregation buffer before the filter throws it away. This
  * aggregate restores the O(1)-per-key state bound the old
  * count-then-semi-join shape had, while keeping the one-scan plan the
  * round-17 re-plan proved 2.5× faster: a group that reaches `cap`
  * elements stops accumulating, so `size(result) = min(df, cap)` — with
  * `cap = RareDfCap + 1` the downstream `size BETWEEN 2 AND RareDfCap`
  * filter sees every rare group complete and every hot group as exactly
  * `cap` rows, which it discards. Worst-case aggregate state is
  * `cap` longs per distinct key, independent of skew.
  *
  * Truncation is order-dependent ACROSS the cap, but callers only ever
  * read groups the size filter keeps — those are below the cap and
  * therefore complete and deterministic (a multiset, unordered; the
  * consumers' ordered-pair explode is order-invariant). Nulls are
  * skipped (collect_list semantics). Long keys only — every caller
  * collects `doc_id`s.
  */
case class CollectUpto(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
    with ImplicitCastInputTypes with BinaryLike[Expression] {

  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_upto"

  // evaluated lazily so the (foldable) literal survives serialization to
  // executors; rejected at first use if non-constant or non-positive
  private lazy val cap: Int = {
    require(right.foldable, "collect_upto(key, cap): cap must be a literal")
    val v = right.eval()
    require(v != null, "collect_upto(key, cap): cap must be non-null")
    val c = v.asInstanceOf[Number].intValue()
    require(c > 0, s"collect_upto(key, cap): cap must be positive, got $c")
    c
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(b: mutable.ArrayBuffer[Long], input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (b.length < cap) {
      val v = left.eval(input)
      if (v != null) b += v.asInstanceOf[Long]
    }
    b
  }

  override def merge(b: mutable.ArrayBuffer[Long], o: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    val room = cap - b.length
    if (room > 0) b ++= o.take(room)
    b
  }

  override def eval(b: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(b.toArray)

  override def serialize(b: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.length * 8)
    buf.putInt(b.length)
    b.foreach(buf.putLong)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { b += buf.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectUpto =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectUpto =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CollectUpto =
    copy(left = newLeft, right = newRight)
}
