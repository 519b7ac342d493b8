package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The HOF spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` is
  * correct but interpreted: higher-order functions run their lambda through
  * the expression evaluator per element AND allocate the zipped array. For
  * a 64-dim embedding that is ~130 boxed evaluations per pair where a tight
  * loop needs none — this expression generates that loop (doGenCode), so
  * dot products stay inside whole-stage codegen. Summation order is the
  * same left-to-right fold as the HOF (and DuckDB's list_sum), so results
  * are bit-identical and the shared DuckDB oracles keep matching.
  *
  * Element nulls are not expected (embeddings are dense); like the HOF
  * fold, a null element would poison the sum, here it reads as 0-bits via
  * getDouble — dense non-null input is part of the contract. Mismatched
  * lengths dot the common prefix.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql] — rely on covariant inference
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Element-wise mean of array<double> vectors — the embedding-centroid
  * aggregate. A TypedImperativeAggregate carrying (sums, count): update
  * adds one vector into the running sums, merge adds partial sums, so the
  * shuffle moves one (dim+1)-wide buffer per group per partition — the
  * map-side-combine property that keeps centroid computation linear at
  * 100 TB. The composed-operator spelling (posexplode → groupBy(label,
  * pos) → avg → re-assemble) shuffles dim× more rows; VectorAvgSpec pins
  * equivalence against it.
  *
  * Vectors are expected dense (no null elements) and same-dimension;
  * ragged dimensions within a group fail loudly (a silent common-prefix
  * average would depend on which row a partition saw first). Empty
  * groups yield null. */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvg.Buf] with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_avg"

  override def createAggregationBuffer(): VectorAvg.Buf = new VectorAvg.Buf(null, 0L)

  override def update(b: VectorAvg.Buf, input: InternalRow): VectorAvg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (b.sums == null) b.sums = new Array[Double](arr.numElements())
      else if (b.sums.length != arr.numElements())
        throw new IllegalArgumentException(
          s"vector_avg: ragged vector dimensions in one group " +
            s"(${b.sums.length} vs ${arr.numElements()})")
      var i = 0
      while (i < b.sums.length) { b.sums(i) += arr.getDouble(i); i += 1 }
      b.n += 1
    }
    b
  }

  override def merge(b: VectorAvg.Buf, o: VectorAvg.Buf): VectorAvg.Buf = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums.clone(); b.n = o.n }
      else {
        if (b.sums.length != o.sums.length)
          throw new IllegalArgumentException(
            s"vector_avg: ragged vector dimensions across partitions " +
              s"(${b.sums.length} vs ${o.sums.length})")
        var i = 0
        while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
        b.n += o.n
      }
    }
    b
  }

  override def eval(b: VectorAvg.Buf): Any =
    if (b.n == 0L || b.sums == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      b.sums.map(_ / b.n))

  override def serialize(b: VectorAvg.Buf): Array[Byte] = {
    val len = if (b.sums == null) -1 else b.sums.length
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + math.max(len, 0) * 8)
    buf.putLong(b.n).putInt(len)
    if (len > 0) b.sums.foreach(buf.putDouble)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buf = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getLong()
    val len = buf.getInt()
    val sums = if (len < 0) null else Array.fill(len)(buf.getDouble())
    new VectorAvg.Buf(sums, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvg =
    copy(child = newChild)
}

object VectorAvg {
  /** Mutable aggregation state: running element sums + vector count. */
  final class Buf(var sums: Array[Double], var n: Long)
}

/** Exact micro-unit element sums of array<double> vectors — the
  * deterministic centroid accumulator behind semantic dedup. Each element
  * is quantized to integer micro-units (floor(x·1e6 + 0.5)) at UPDATE time
  * and the running sums are Longs, so accumulation is exact integer
  * arithmetic: unlike float summation (VectorAvg), the result CANNOT
  * depend on partitioning or merge order, which is what lets a DuckDB
  * oracle reproduce a centroid bit-for-bit and lets centroid ORDERINGS
  * (keep/drop policies) survive any cluster layout. Same (dim+1)-wide
  * buffer per (group, partition) map-side-combine shape as VectorAvg.
  * Headroom: |x| ≤ ~10³ micro-quantized is ~10⁹ per element, so ~10⁹ rows
  * per group stay under Long overflow — at 100 TB group cardinality (RP
  * buckets sized to occupancy ~8) this never binds. */
case class VectorSumQ(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSumQ.Buf] with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sumq"

  override def createAggregationBuffer(): VectorSumQ.Buf =
    new VectorSumQ.Buf(null, 0L)

  override def update(b: VectorSumQ.Buf, input: InternalRow): VectorSumQ.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (b.sums == null) b.sums = new Array[Long](arr.numElements())
      else if (b.sums.length != arr.numElements())
        throw new IllegalArgumentException(
          s"vector_sumq: ragged vector dimensions in one group " +
            s"(${b.sums.length} vs ${arr.numElements()}) — result would " +
            "depend on partition order; fix the input instead")
      var i = 0
      while (i < b.sums.length) {
        b.sums(i) += math.floor(arr.getDouble(i) * 1e6 + 0.5).toLong
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(b: VectorSumQ.Buf, o: VectorSumQ.Buf): VectorSumQ.Buf = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums.clone(); b.n = o.n }
      else {
        if (b.sums.length != o.sums.length)
          throw new IllegalArgumentException(
            s"vector_sumq: ragged vector dimensions across partitions " +
              s"(${b.sums.length} vs ${o.sums.length})")
        var i = 0
        while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
        b.n += o.n
      }
    }
    b
  }

  override def eval(b: VectorSumQ.Buf): Any =
    if (b.n == 0L || b.sums == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(b.sums)

  override def serialize(b: VectorSumQ.Buf): Array[Byte] = {
    val len = if (b.sums == null) -1 else b.sums.length
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + math.max(len, 0) * 8)
    buf.putLong(b.n).putInt(len)
    if (len > 0) b.sums.foreach(buf.putLong)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumQ.Buf = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val n = buf.getLong()
    val len = buf.getInt()
    val sums = if (len < 0) null else Array.fill(len)(buf.getLong())
    new VectorSumQ.Buf(sums, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumQ =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumQ =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumQ =
    copy(child = newChild)
}

object VectorSumQ {
  /** Mutable aggregation state: running micro-unit sums + vector count. */
  final class Buf(var sums: Array[Long], var n: Long)
}

/** Session-scoped registration of the graft native functions, so plans and
  * SQL strings can call them by name. Idempotent and cheap — callers invoke
  * it on every table load rather than tracking which sessions saw it. */
object GraftFunctions {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> { exprs =>
      require(exprs.length == 2, "vector_dot(a, b) takes exactly 2 arguments")
      VectorDot(exprs.head, exprs(1))
    },
    "vector_avg" -> { exprs =>
      require(exprs.length == 1, "vector_avg(v) takes exactly 1 argument")
      VectorAvg(exprs.head)
    },
    "vector_sumq" -> { exprs =>
      require(exprs.length == 1, "vector_sumq(v) takes exactly 1 argument")
      VectorSumQ(exprs.head)
    },
    "ngram_hashes" -> { exprs =>
      require(exprs.length == 2, "ngram_hashes(text, n) takes exactly 2 arguments")
      NgramHashes(exprs.head, exprs(1))
    },
    "minhash_sig" -> { exprs =>
      require(exprs.length == 2, "minhash_sig(hashes, k) takes exactly 2 arguments")
      MinhashSig(exprs.head, exprs(1))
    },
    "nfc_normalize" -> { exprs =>
      require(exprs.length == 1, "nfc_normalize(text) takes exactly 1 argument")
      NfcNormalize(exprs.head)
    },
    "winnow_fps" -> { exprs =>
      require(exprs.length == 3, "winnow_fps(text, n, w) takes exactly 3 arguments")
      WinnowFps(exprs.head, exprs(1), exprs(2))
    },
    "sorted_intersect_count" -> { exprs =>
      require(exprs.length == 2,
        "sorted_intersect_count(a, b) takes exactly 2 arguments")
      SortedIntersectCount(exprs.head, exprs(1))
    },
    "collect_upto" -> { exprs =>
      require(exprs.length == 2, "collect_upto(key, cap) takes exactly 2 arguments")
      CollectUpto(exprs.head, exprs(1))
    },
    "bitmap_distinct" -> { exprs =>
      require(exprs.length == 1, "bitmap_distinct(key) takes exactly 1 argument")
      BitmapDistinct(exprs.head)
    },
    "cms_estimate" -> { exprs =>
      require(exprs.length == 2, "cms_estimate(sketch, keys) takes exactly 2 arguments")
      CmsEstimate(exprs.head, exprs(1))
    },
    // Spark registers bloom_filter_agg in SQL but NOT the probe side —
    // BloomFilterMightContain is normally injected only by the runtime-
    // filter optimizer rule. Registering it by name lets a query build a
    // bloom as an explicit, reusable ARTIFACT (a decontamination list
    // shipped as 1 MB of bits) and probe it via a scalar subquery; the
    // expression itself enforces that the bloom side is a constant or
    // scalar subquery, so it cannot be misused as a per-row join.
    "bloom_might_contain" -> { exprs =>
      require(exprs.length == 2,
        "bloom_might_contain(bloom, key) takes exactly 2 arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs.head, exprs(1))
    },
    // …and the build side is equally optimizer-private (despite the name
    // appearing in error strings, it is not on the SQL search path), so
    // register it too: 1-arg form, Spark's default sizing (1M estimated
    // items). The analyzer wraps a bare AggregateFunction in an
    // AggregateExpression the same way it does for vector_avg above.
    "bloom_filter_agg" -> { exprs =>
      require(exprs.length == 1, "bloom_filter_agg(key) takes exactly 1 argument")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs.head)
    })

  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      // register only when absent: createOrReplace on an existing name logs
      // a "replaced a previously registered function" WARN per call — noise
      // at every table load (VERDICT r8 residual nit). A lost race between
      // two threads both seeing absent is harmless: both register the same
      // builder.
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
