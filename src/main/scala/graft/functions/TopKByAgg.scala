package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `topk_by(score, id, k)` — the library's UDAF-surface exemplar
  * (SURVEY §2.11): per group, the `k` ids with the highest scores,
  * ordered score-desc / id-asc, as ONE aggregate.
  *
  * The built-in restatement is a window `row_number` + filter, which
  * sorts every group's full row set (Spark's WindowGroupLimit prunes
  * to k per partition first, but the survivors still cross the shuffle
  * as rows and get sorted). An aggregate keeps a bounded k-entry heap
  * per group, merges map-side like any partial agg, and ships k
  * (score, id) pairs per group per partition — the classic
  * O(n log k), constant-memory form. As a `TypedImperativeAggregate`
  * it participates in ObjectHashAggregate with spill-safe
  * serialize/deserialize.
  *
  * Determinism: ties at the k boundary keep the SMALLEST id (output
  * order is score desc, id asc), so results are partition-order
  * independent — fit for hash-compared output. Null score or id rows
  * are ignored.
  */
case class TopKByAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN scores are ignored like nulls: NaN compares false to
    // everything in the heap's IEEE comparisons, which would make the
    // kept set depend on per-partition arrival order — the opposite of
    // the determinism contract
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.insert(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.sortedIds)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by"
}

/** Bounded k-entry min-heap keyed (score asc, id desc) so the root is
  * always the entry to evict: the lowest score, largest id among ties. */
final class TopKBuffer(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n

  /** true if (s1, i1) ranks WORSE than (s2, i2) in keep-order. */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, i: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) / 2
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1
      val r = l + 1
      var worst = pos
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == pos) return
      swap(pos, worst); pos = worst
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  /** ids in output order: score desc, id asc — sorted with the SAME
    * comparator as [[worse]] (a total-order sortBy would split the
    * 0.0 == -0.0 tie differently from the heap and the oracle). NaN
    * never reaches the buffer (filtered in update), so [[worse]] is a
    * strict weak order here. */
  def sortedIds: Array[Long] = {
    val idx = (0 until n).sortWith((i, j) => worse(scores(j), ids(j), scores(i), ids(i)))
    idx.map(ids).toArray
  }
}
