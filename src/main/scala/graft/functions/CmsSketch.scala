package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-min sketch geometry + hashing, shared by the build aggregate,
  * the probe expression, and the spec's plain-Scala reference.
  *
  * [[Depth]]×[[Width]] long counters; row hashes are independent
  * mix-multiply-shift functions of the key. Estimates are upward-biased
  * only (`estimate ≥ true` ALWAYS; `estimate ≤ true + ε·N` with
  * probability 1−e^−Depth per row of independence) — the other classic
  * constant-size aggregate next to Bloom (membership, AP3) and
  * HLL/KLL (cardinality/quantiles, AP1/AP2): approximate FREQUENCY,
  * i.e. heavy hitters over an unbounded key domain in fixed memory. */
object Cms {
  val Depth = 5
  val Width = 1024

  /** Fixed odd multipliers (splitmix64 / Murmur finalizer constants) —
    * the sketch is fully deterministic for a given input multiset. */
  val Seeds: Array[Long] = Array(
    0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL, 0x165667B19E3779F9L,
    0xD6E8FEB86659FD93L, 0xBF58476D1CE4E5B9L)

  def slot(key: Long, row: Int): Int = {
    val h = (key ^ (key >>> 33)) * Seeds(row)
    ((h >>> 33) % Width).toInt
  }

  def estimate(counters: Array[Long], key: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = counters(r * Width + slot(key, r))
      if (c < min) min = c
      r += 1
    }
    min
  }
}

/** Codegen-friendly probe state: the deserialized counter matrix as a
  * plan-time constant object (referenced from generated code, no
  * per-row deserialization). */
final class CmsEvaluator(val counters: Array[Long]) extends Serializable {
  def estimate(key: Long): Long = Cms.estimate(counters, key)
}

/** `cms_build(key)` — aggregate a bigint column into a serialized
  * count-min sketch. Merge is ELEMENTWISE ADDITION of fixed-size
  * counter matrices — exactly associative and commutative, so the
  * distributed partial-agg result is bit-identical to a serial build
  * in any row order (CmsSpec pins this against a plain-Scala
  * reference). The 40 KB matrix is the whole state regardless of key
  * cardinality — the 100 TB property: frequency estimates over an
  * unbounded token/url/user domain in constant memory per group. */
case class CmsBuildAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint keys, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Cms.Depth * Cms.Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var r = 0
      while (r < Cms.Depth) {
        buf(r * Cms.Width + Cms.slot(key, r)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsBuildAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "cms_build"
}

/** `cms_estimate(cms, key)` — point-frequency estimate from a
  * [[CmsBuildAgg]]-built sketch: min over the key's [[Cms.Depth]]
  * counters. Never under-counts; over-counts by hash collisions only.
  * Like [[BloomMightContain]], the sketch argument must be FOLDABLE so
  * the deserialized matrix is a plan-time constant inside whole-stage
  * codegen — the probe is [[Cms.Depth]] array reads per row. */
case class CmsEstimate(cms: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = cms
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (cms.dataType, value.dataType) match {
      case (BinaryType, LongType) if cms.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (constant) cms argument")
      case (b, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${b.simpleString}, ${v.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val evaluator: CmsEvaluator = {
    val bytes = cms.eval(null)
    if (bytes == null) null
    else {
      val raw = bytes.asInstanceOf[Array[Byte]]
      val out = new Array[Long](raw.length / 8)
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        .asLongBuffer().get(out)
      new CmsEvaluator(out)
    }
  }

  override def eval(input: InternalRow): Any =
    if (evaluator == null) null
    else {
      val v = value.eval(input)
      if (v == null) null else evaluator.estimate(v.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (evaluator == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;""")
    } else {
      val ref = ctx.addReferenceObj("cmsEvaluator", evaluator,
        classOf[CmsEvaluator].getName)
      val valueGen = value.genCode(ctx)
      ev.copy(code = code"""
        ${valueGen.code}
        boolean ${ev.isNull} = ${valueGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.estimate(${valueGen.value});
        }""", isNull = ev.isNull, value = ev.value)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(cms = newLeft, value = newRight)

  override def prettyName: String = "cms_estimate"
}
