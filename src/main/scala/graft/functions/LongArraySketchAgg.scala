package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.LongType

/** Literal-argument extraction shared by the function builders —
  * seven near-identical local copies before this (r12 simplify
  * pass). */
private[functions] object BuilderArgs {
  def intLit(fn: String, e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
      v.intValue()
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }
  def longLit(fn: String, e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
      v.longValue()
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a long literal, got $other")
  }
}

/** Shared plumbing for the sketch-aggregate family
  * ([[MinHashSketch]], [[SimHashSketch]], [[BloomSketch]],
  * [[CmsSketch]]): each buffers a flat fixed-size `Array[Long]` over
  * one BIGINT key column, so the state serde and the input type
  * check live once here instead of four drifting copies. The buffer
  * length is a constant of each aggregate's constructor parameters,
  * so deserialize can size purely from the byte count. */
private[functions] trait LongArraySketchAgg
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint column, got ${other.catalogString}")
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}
