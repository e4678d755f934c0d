package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Mergeable KMV (k-minimum-values / theta) distinct sketches (Beyer,
  * Haas, Reinwald, Sismanis, Gemulla, "On synopses for distinct-value
  * estimation under multiset operations", SIGMOD 2007).
  *
  * Fourth member of the sketch family, and the one that buys SET
  * ALGEBRA: [[HllSketch]] answers |A| but register-max merges lose the
  * sample identity, so |A ∩ B| is unrecoverable. A KMV sketch IS a
  * uniform hash sample (the k smallest distinct 64-bit hashes), so
  *
  *  - union:        merge samples, keep k smallest — associative,
  *                  commutative, deterministic (a SET has no order);
  *  - distinct:     (k−1) / θ_k where θ_k is the k-th smallest hash
  *                  mapped to (0,1] — relative error ≈ 1/√(k−2);
  *  - intersection: the sample overlap below the smaller θ estimates
  *                  the Jaccard directly; |A ∩ B| = J · |A ∪ B|.
  *
  * The audience-overlap / cross-campaign-reach primitive: per-segment
  * sketches are written once (8 KB), any pairwise overlap is
  * sketch-vs-sketch arithmetic with no raw re-scan.
  *
  * Representation: 4-byte count then `count` sorted longs (hashes
  * shifted to unsigned order), K = 1024. Inserts after warm-up are one
  * comparison (h ≥ kth smallest → skip); expected total insertions
  * are K·ln(n/K) — the sort cost is amortized away.
  */
object KmvSketch {

  val K: Int = 1024

  private def empty: Array[Byte] = {
    val a = new Array[Byte](4)
    a
  }

  @inline private def getCount(a: Array[Byte]): Int =
    (a(0) & 0xFF) | (a(1) & 0xFF) << 8 | (a(2) & 0xFF) << 16 | (a(3) & 0xFF) << 24

  @inline private def getH(a: Array[Byte], i: Int): Long = {
    val o = 4 + i * 8
    (a(o) & 0xFFL) | (a(o + 1) & 0xFFL) << 8 | (a(o + 2) & 0xFFL) << 16 |
      (a(o + 3) & 0xFFL) << 24 | (a(o + 4) & 0xFFL) << 32 |
      (a(o + 5) & 0xFFL) << 40 | (a(o + 6) & 0xFFL) << 48 |
      (a(o + 7) & 0xFFL) << 56
  }

  private def pack(hs: Array[Long]): Array[Byte] = {
    val n = hs.length
    val a = new Array[Byte](4 + n * 8)
    a(0) = n.toByte; a(1) = (n >> 8).toByte
    a(2) = (n >> 16).toByte; a(3) = (n >> 24).toByte
    var i = 0
    while (i < n) {
      val v = hs(i); val o = 4 + i * 8
      a(o) = v.toByte; a(o + 1) = (v >> 8).toByte
      a(o + 2) = (v >> 16).toByte; a(o + 3) = (v >> 24).toByte
      a(o + 4) = (v >> 32).toByte; a(o + 5) = (v >> 40).toByte
      a(o + 6) = (v >> 48).toByte; a(o + 7) = (v >> 56).toByte
      i += 1
    }
    a
  }

  private def unpack(a: Array[Byte]): Array[Long] = {
    val n = getCount(a)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = getH(a, i); i += 1 }
    hs
  }

  /** Hash → unsigned order (flip the sign bit so Long comparison sorts
    * hashes as unsigned — θ mapping needs the uniform (0, 2^64) view).
    */
  @inline private def toOrd(h: Long): Long = h ^ Long.MinValue

  private def addHash(buf: Array[Byte], h: Long): Array[Byte] = {
    val ord = toOrd(h)
    val n = getCount(buf)
    if (n == K && ord >= getH(buf, K - 1)) return buf // fast path
    val hs = unpack(buf)
    val pos = java.util.Arrays.binarySearch(hs, ord)
    if (pos >= 0) return buf // already sampled
    val ins = -pos - 1
    val m = math.min(n + 1, K)
    val out = new Array[Long](m)
    System.arraycopy(hs, 0, out, 0, ins)
    if (ins < m) {
      out(ins) = ord
      System.arraycopy(hs, ins, out, ins + 1, m - ins - 1)
    }
    pack(out)
  }

  private def mergeBuf(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = unpack(a); val y = unpack(b)
    if (y.isEmpty) return a
    if (x.isEmpty) return b
    // sorted-merge keep k smallest distinct
    val out = new Array[Long](math.min(x.length + y.length, K))
    var i = 0; var j = 0; var m = 0
    var last = 0L; var first = true
    while (m < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      if (first || v != last) { out(m) = v; m += 1; last = v; first = false }
    }
    pack(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** θ of the sketch: the k-th smallest hash as a fraction of the hash
    * space, or 1.0 when fewer than K distinct values were seen (the
    * sketch is then EXACT).
    */
  private def theta(hs: Array[Long]): Double =
    if (hs.length < K) 1.0
    else (hs(K - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** Sketch → estimated distinct count (exact below K). */
  def countDistinctEst(a: Array[Byte]): Long = {
    val hs = unpack(a)
    if (hs.length < K) hs.length.toLong
    else math.round((K - 1).toDouble / theta(hs))
  }

  /** Pairwise intersection estimate: sample overlap below the smaller
    * θ scaled back up. Exact when both sides stayed below K.
    */
  def intersectEst(a: Array[Byte], b: Array[Byte]): Long = {
    val x = unpack(a); val y = unpack(b)
    val thMin = math.min(theta(x), theta(y))
    // The cutoff is compared against EXACT long hashes, so derive it
    // from the exact k-th ordered hash (the smaller of the two sides'
    // bounds) rather than round-tripping theta through a double, which
    // can include/exclude boundary hashes inconsistently with the
    // theta used to scale the estimate below.
    val bound = // hashes inside both samples' valid region
      math.min(if (x.length < K) Long.MaxValue else x(K - 1),
               if (y.length < K) Long.MaxValue else y(K - 1))
    var i = 0; var j = 0; var both = 0L
    while (i < x.length && j < y.length && x(i) <= bound && y(j) <= bound) {
      if (x(i) == y(j)) { both += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    math.round(both.toDouble / thMin)
  }

  private val buildAggregator: Aggregator[Long, Array[Byte], Array[Byte]] =
    new Aggregator[Long, Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = empty
      def reduce(b: Array[Byte], h: Long): Array[Byte] = addHash(b, h)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeBuf(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  private val mergeAggregator: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = empty
      def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = mergeBuf(b, s)
      def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeBuf(a, b)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** Aggregate raw values into one KMV sketch per group (hash is the
    * plan's codegen'd `xxhash64`, seed shared with nothing else).
    */
  def sketchAgg(c: Column): Column =
    udaf(buildAggregator, Encoders.scalaLong).apply(xxhash64(lit(1042), c))

  /** Union already-built sketches into one. */
  def mergeAgg(c: Column): Column =
    udaf(mergeAggregator, Encoders.BINARY).apply(c)

  /** Sketch → estimated distinct count. Native codegen'd expression. */
  def estimate(c: Column): Column =
    Bridge.column(KmvEstimate(Bridge.expression(c)))

  /** Two sketches → estimated distinct-intersection size. */
  def intersect(a: Column, b: Column): Column =
    Bridge.column(KmvIntersect(Bridge.expression(a), Bridge.expression(b)))
}

/** `kmv_estimate(sketch)` — distinct-count estimate. */
case class KmvEstimate(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmv_estimate"

  override def nullSafeEval(regs: Any): Any =
    KmvSketch.countDistinctEst(regs.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KmvSketch.countDistinctEst($c)")

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** `kmv_intersect(a, b)` — distinct-intersection estimate. */
case class KmvIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmv_intersect"

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEst(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.KmvSketch.intersectEst($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}
