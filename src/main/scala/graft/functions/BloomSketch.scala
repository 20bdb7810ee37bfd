package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_build(key, expectedItems, fpp)` — aggregate a column of longs
  * into a serialized Bloom filter (Spark's public
  * `org.apache.spark.util.sketch.BloomFilter`, the same sketch the
  * engine's internal runtime-filter optimization injects).
  *
  * This is the build side of the user-level runtime-filter pattern
  * (AP3): aggregate the join keys of a SELECTIVE build relation into a
  * few-KB bitmap, ship ONE row, and prune the probe scan with
  * [[BloomMightContain]] BEFORE any shuffle of the probe side. Exactly
  * the semi-join-pushdown dataflow of Flink's/Trino's dynamic filtering
  * and Spark's own `InjectRuntimeFilter` — surfaced as an explicit
  * operator so a pipeline can build the filter once and reuse it across
  * queries (decontamination against a fixed eval set, incremental-batch
  * pruning against a corpus index).
  *
  * Merge is a bitwise OR of fixed-size bitmaps, so the distributed
  * partial-agg result is BIT-IDENTICAL to a single-threaded build over
  * the same rows in any order (BloomSketchSpec pins this) — the sketch
  * is deterministic, unlike sampled/ordered sketches. Participates in
  * ObjectHashAggregate with spill-safe serialize/deserialize like any
  * TypedImperativeAggregate.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "expectedItems must be positive")
  require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint keys, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "bloom_build"
}

/** `bloom_might_contain(bloom, key)` — probe a [[BloomBuildAgg]]-built
  * filter. No false negatives ever; false positives at the built fpp,
  * which a downstream EXACT semi-join clears (AP3's contract: the bloom
  * changes the PLAN — probe-scan pruning before the exchange — never
  * the result).
  *
  * The bloom argument must be FOLDABLE (a literal: the few-KB sketch
  * value, exactly like the engine's own `BloomFilterMightContain`,
  * whose bloom side is a scalar-subquery result). That makes the
  * deserialized filter a plan-time constant: it is referenced from
  * generated code as a constant object — the probe is ONE
  * `mightContainLong` call inside whole-stage codegen, no per-row
  * deserialization, no codegen fallback.
  */
case class BloomMightContain(bloom: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, value.dataType) match {
      case (BinaryType, LongType) if bloom.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (constant) bloom argument")
      case (b, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${b.simpleString}, ${v.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override def eval(input: InternalRow): Any =
    if (filter == null) null
    else {
      val v = value.eval(input)
      if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (filter == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      val valueGen = value.genCode(ctx)
      ev.copy(code = code"""
        ${valueGen.code}
        boolean ${ev.isNull} = ${valueGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${valueGen.value});
        }""", isNull = ev.isNull, value = ev.value)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloom = newLeft, value = newRight)

  override def prettyName: String = "bloom_might_contain"
}
