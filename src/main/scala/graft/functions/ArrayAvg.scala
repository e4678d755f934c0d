package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running sum + per-position counts over array<double>
  * rows. Arrays grow to the longest input seen (ragged inputs allowed;
  * missing tail positions simply don't count). Null elements are
  * skipped per position — the same semantics as `posexplode` + `avg`,
  * which ignores nulls per (group, pos).
  */
final class ArraySumBuffer {
  var sums: Array[Double] = Array.emptyDoubleArray
  var counts: Array[Long] = Array.emptyLongArray

  private def ensure(n: Int): Unit =
    if (sums.length < n) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }

  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    ensure(n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { sums(i) += a.getDouble(i); counts(i) += 1 }
      i += 1
    }
  }

  def merge(o: ArraySumBuffer): Unit = {
    ensure(o.sums.length)
    var i = 0
    while (i < o.sums.length) {
      sums(i) += o.sums(i); counts(i) += o.counts(i); i += 1
    }
  }
}

/** Per-group element-wise MEAN of an array<double> column as ONE
  * bounded-buffer aggregate: `avg(v)[i] = Σ v[i] / count(v[i])`,
  * positions that never saw a non-null element yield 0.0.
  *
  * Why it exists: the k-means Lloyd mean rounds
  * ([[graft.llm.Similarity]] `trainIvfIndex`) previously computed
  * centroids by `posexplode` + `avg` per (cell, pos) — dims× the rows
  * through a hash aggregation whose group count is cells×dims (800k
  * groups at the sf10 ANN smoke; the profile measured the explode
  * round at 389 CPU-s of which the assignment dots were ~19 s — the
  * rest was row explosion and hash-table traffic). This aggregate
  * keeps ONE dims-sized buffer per cell (cells ≤ 131072 by the
  * quantizer's cap, so a mapper's hash map holds ≤ cells
  * dims-double buffers — driver/task-bounded by the same contract as
  * the centroid matrix), does map-side partial aggregation, and
  * shuffles cells rows instead of cells×dims.
  *
  * Float caveat (shared with the old shape): double addition is
  * order-dependent, and neither `avg` over exploded rows nor this
  * buffer fixes an accumulation order under a distributed shuffle —
  * centroids may drift in the last ulps run-to-run either way; every
  * downstream gate (recall EQUAL, expression/join parity) is
  * insensitive to it by construction.
  *
  * Null ARRAYS are skipped (aggregate convention); null ELEMENTS are
  * skipped per position, matching `avg`'s null handling per
  * (group, pos).
  */
case class ArrayAvgAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArraySumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): ArraySumBuffer =
    new ArraySumBuffer

  override def update(b: ArraySumBuffer, row: InternalRow): ArraySumBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: ArraySumBuffer, o: ArraySumBuffer): ArraySumBuffer = {
    b.merge(o); b
  }

  override def eval(b: ArraySumBuffer): Any = {
    val out = new Array[Double](b.sums.length)
    var i = 0
    while (i < out.length) {
      out(i) = if (b.counts(i) > 0) b.sums(i) / b.counts(i) else 0.0
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: ArraySumBuffer): Array[Byte] = {
    val n = b.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(b.sums(i)); i += 1 }
    i = 0
    while (i < n) { bb.putLong(b.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArraySumBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new ArraySumBuffer
    b.sums = new Array[Double](n)
    b.counts = new Array[Long](n)
    var i = 0
    while (i < n) { b.sums(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { b.counts(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArrayAvgAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "array_avg"
}
