package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Typed `Aggregator` producing a MinHash sketch from a group of shingles
  * (the custom-aggregate surface planned in SURVEY §7.4 / §2.12).
  *
  * Hash family is identical to the SQL `xxhash64(s, j)` used by
  * `DedupOps.minhashSignatures` (seed 42, then each argument folded in),
  * so the two formulations produce byte-equal signatures
  * (MinHashSketchSpec). The sketch buffer is a fixed Array[Long], merged
  * element-wise min — associative and commutative, so partial aggregation
  * works across any partitioning.
  */
object MinHashSketch {

  /** Fold one shingle into a sketch buffer. Hash family: h0 = xxhash64(s),
    * h_j = xxhash64(h0, j) — a fold from seed 42 over (h0: LONG, j: INT),
    * byte-equal to the SQL `xxhash64(xxhash64(s), j)`.
    */
  def add(buf: Array[Long], shingle: String): Unit = {
    val s = UTF8String.fromString(shingle)
    val h0 = XxHash64Function.hash(s, StringType, 42L)
    val base = XxHash64Function.hash(h0, LongType, 42L)
    var j = 1
    while (j <= buf.length) {
      val h = XxHash64Function.hash(j, IntegerType, base)
      if (h < buf(j - 1)) buf(j - 1) = h
      j += 1
    }
  }

  /** Whole-signature form: map-side scalar, no aggregation needed when the
    * shingle set is already materialized per row.
    */
  def signature(shingles: Seq[String], perms: Int): Array[Long] = {
    val buf = Array.fill(perms)(Long.MaxValue)
    shingles.foreach(add(buf, _))
    buf
  }
}

class MinHashSketch(perms: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    MinHashSketch.add(buf, shingle)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // ExpressionEncoder keeps the buffer/output as native array<bigint>
  // columns (kryo/java serialization would surface opaque binary)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
