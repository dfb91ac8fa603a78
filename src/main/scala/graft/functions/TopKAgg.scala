package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken toward the smallest id) per group. Ids may
  * be bigint (ANN neighbor ids) or string (TF-IDF terms, document keys);
  * scores may be double (cosine similarities) or bigint (scaled-integer
  * exact scores — negate to rank ascending; long comparison never loses
  * precision, unlike a >2^53 long cast to double).
  *
  * This is the scale-correct formulation of "top-k per key": a
  * TypedImperativeAggregate participates in partial aggregation, so each
  * map task ships at most k rows per group through the shuffle — versus
  * the Window(row_number <= k) formulation, which shuffles and sorts
  * every candidate row. For brute-force ANN over N candidates that's a
  * k/N shuffle-volume reduction (k=10, N=millions at real scale).
  *
  * Buffer is a bounded min-heap; serialization is a flat
  * (score, id)* byte stream (string ids length-prefixed).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  require(k > 0, "k must be positive")

  private def scoreType: DataType = scoreExpr.dataType
  private def scoreIsLong: Boolean = scoreType == LongType
  private def idType: DataType = idExpr.dataType
  private def idIsString: Boolean = idType == StringType

  override def checkInputDataTypes(): TypeCheckResult =
    scoreType match {
      case DoubleType | LongType => idType match {
        case LongType | StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"topk_by_score id must be bigint or string, got $other")
      }
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score score must be double or bigint, got $other")
    }

  @transient private lazy val idOrd: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(idType)

  private def compareScores(a: Any, b: Any): Int =
    if (scoreIsLong) java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    else java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])

  // Min-heap: the head is the WORST kept element — lowest score, and
  // among equal scores the largest id (so smaller ids win ties).
  // compare(x, y) > 0 means "x is worse than y".
  private def heapOrdering: Ordering[(Any, Any)] =
    new Ordering[(Any, Any)] {
      override def compare(x: (Any, Any), y: (Any, Any)): Int = {
        val c = compareScores(y._1, x._1)
        if (c != 0) c else idOrd.compare(x._2, y._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def update(
      buf: mutable.PriorityQueue[(Any, Any)],
      input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      // UTF8String values may point into a reused row buffer — clone
      // anything that survives past this row
      val stable = id match {
        case u: UTF8String => u.clone()
        case other => other
      }
      push(buf, (s, stable))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Any, Any)],
      other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach(push(buf, _))
    buf
  }

  private def push(
      buf: mutable.PriorityQueue[(Any, Any)],
      e: (Any, Any)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (heapOrdering.lt(e, buf.head)) { // e beats the current worst
      buf.dequeue(); buf.enqueue(e)
    }
  }

  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any = {
    // heapOrdering ranks better elements lower, so ascending = best first
    val sorted = buf.toArray.sorted(heapOrdering)
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id)
    }: Array[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) =>
      if (scoreIsLong) out.writeLong(s.asInstanceOf[Long])
      else out.writeDouble(s.asInstanceOf[Double])
      if (idIsString) {
        val b = id.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(id.asInstanceOf[Long])
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val s: Any = if (scoreIsLong) in.readLong() else in.readDouble()
      val id: Any =
        if (idIsString) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else in.readLong()
      buf.enqueue((s, id))
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", scoreType, nullable = false),
    StructField("id", idType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
