package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Point-query into a serialized Count-Min sketch: `cms_estimate(sketch,
  * keys)` returns the estimated count for EVERY key of an array<long> in
  * one call — array-in/array-out so the (possibly megabyte-sized) sketch
  * is deserialized ONCE per row, not once per key. The sketch binary is
  * whatever Spark's own `count_min_sketch(col, eps, confidence, seed)`
  * aggregate produced, so the build side stays a codegen'd built-in
  * aggregate with map-side combine (sketches merge by counter addition);
  * this expression is only the metadata-sized probe at the very top of
  * the plan (one sketch row × one candidate array), which is why
  * CodegenFallback is acceptable here — it never sits on the fact path.
  *
  * CMS guarantees: estimate >= true count always (counters only
  * overcount), and <= true + eps·N with probability >= confidence —
  * ApproxSpec pins both against exact counts.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType, ArrayType(LongType))
  // null key slot → null estimate (review r11: getLong on a null slot is
  // undefined and would silently return key 0's count — a registered SQL
  // function must not turn array(1L, NULL) into a plausible wrong number)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "cms_estimate"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any, ks: Any): Any = {
    val bytes = s.asInstanceOf[Array[Byte]]
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val keys = ks.asInstanceOf[ArrayData]
    val out = new Array[Any](keys.numElements())
    var i = 0
    while (i < out.length) {
      // Number route — the same long-hash path the count_min_sketch
      // aggregate used on a bigint column, so probe and build agree
      out(i) =
        if (keys.isNullAt(i)) null
        else sketch.estimateCount(java.lang.Long.valueOf(keys.getLong(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
