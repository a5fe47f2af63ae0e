package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The [[KmvMergeKL]] fold as a hand-rolled `TypedImperativeAggregate`
  * over a flat `long[]` buffer — the sketch-propagation aggregate of
  * [[graft.ops.Graph.reachSketch]] without the typed-Aggregator codec
  * (guide §1.2 step 2, per-task work): the `udaf(Aggregator)` path
  * deserialized every input row's `array<struct<hu, kv>>` into a
  * `Vector[KmvEntryL]` (two boxed longs + a case class per entry per
  * row) before merging; here the buffer is the flattened pair array
  * `[hu₀, kv₀, hu₁, kv₁, …]` (ascending, distinct, ≤ k entries) and
  * `update` reads the input array's longs directly — no per-entry
  * object ever allocated on the hot path.
  *
  * Fold and total order are IDENTICAL to [[KmvMergeKL]]: entries ascend
  * by (hu, decimal-string(kv)) via [[KmvLongOrder.strLess]], exact
  * (hu, kv) duplicates keep one copy, the merged result truncates to k.
  * Bit-identical kept sets (property-pinned in OptR15Spec), so every
  * sketch-derived output is unchanged. Inputs must be sorted-ascending
  * distinct ≤ k-entry arrays (a seed singleton or a previous round's
  * output) — the same contract [[KmvMergeKL]]'s two-pointer merge
  * already assumed.
  *
  * Partial aggregation semantics are unchanged: the planner still
  * splits partial/final around the exchange (ObjectHashAggregate), so
  * every map partition ships ≤ 1 row (≤ k entries) per vertex.
  */
case class KmvMergeArr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "KMV needs k >= 2")

  override def prettyName: String = "kmv_merge_arr"
  override def nullable: Boolean = false
  override def dataType: DataType = KmvMergeArr.entriesType

  override def createAggregationBuffer(): Array[Long] =
    Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val a = v.asInstanceOf[ArrayData]
      val m = a.numElements()
      val flat = new Array[Long](2 * m)
      var i = 0
      while (i < m) {
        val st = a.getStruct(i, 2)
        flat(2 * i) = st.getLong(0)
        flat(2 * i + 1) = st.getLong(1)
        i += 1
      }
      mergeFlat(buf, flat)
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    mergeFlat(a, b)

  // (hu, decimal-string(kv)) — KmvMergeKL.lt without the case class
  private def lt(hu1: Long, kv1: Long, hu2: Long, kv2: Long): Boolean =
    hu1 < hu2 || (hu1 == hu2 && KmvLongOrder.strLess(kv1, kv2))

  /** Two-pointer semilattice merge over flattened sorted-distinct pair
    * arrays; O(k), allocation = the one output array. */
  private def mergeFlat(a: Array[Long], b: Array[Long]): Array[Long] = {
    val cap = 2 * k
    if (a.length == 0)
      return if (b.length <= cap) b else java.util.Arrays.copyOf(b, cap)
    if (b.length == 0)
      return if (a.length <= cap) a else java.util.Arrays.copyOf(a, cap)
    val out = new Array[Long](math.min(a.length + b.length, cap))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      if (i >= a.length) {
        out(n) = b(j); out(n + 1) = b(j + 1); j += 2
      } else if (j >= b.length) {
        out(n) = a(i); out(n + 1) = a(i + 1); i += 2
      } else {
        val ahu = a(i); val akv = a(i + 1)
        val bhu = b(j); val bkv = b(j + 1)
        if (lt(ahu, akv, bhu, bkv)) {
          out(n) = ahu; out(n + 1) = akv; i += 2
        } else if (lt(bhu, bkv, ahu, akv)) {
          out(n) = bhu; out(n + 1) = bkv; j += 2
        } else { // same (hu, kv): keep once
          out(n) = ahu; out(n + 1) = akv; i += 2; j += 2
        }
      }
      n += 2
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf.length / 2
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = InternalRow(buf(2 * i), buf(2 * i + 1))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeArr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeArr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
  : KmvMergeArr = copy(child = newChild)
}

object KmvMergeArr {
  /** Output/input element type — matches the (hu, kv) entry structs the
    * reachSketch seed frame builds and every round's output carries. */
  val entriesType: DataType = ArrayType(
    StructType(Seq(
      StructField("hu", LongType, nullable = false),
      StructField("kv", LongType, nullable = false))),
    containsNull = false)

  /** k from a foldable literal argument (the registry-builder path). */
  def litK(e: Expression): Int = {
    require(e.foldable, "kmv_merge_arr: k must be a literal")
    e.eval().asInstanceOf[Number].intValue
  }
}
