package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared bloom-filter bit math, used by the aggregate's update, the
  * membership expression's interpreted eval, AND its generated code
  * (one definition of the probe sequence, three callers — the
  * guarantee that build and probe can never disagree).
  *
  * Probes use Kirsch–Mitzenmacher double hashing over the caller's
  * 64-bit hash: index_i = (h1 + i·h2) & (numBits−1), with h2 an
  * odd remix of the hash (odd ⇒ the probe stride is coprime to the
  * power-of-two bit count, so the k probes stay distinct mod
  * numBits). Everything is integer arithmetic on the already-hashed
  * value — deterministic across JVMs, partitionings, and runs.
  */
object BloomKernel {
  final val Mix = 0x9E3779B97F4A7C15L   // golden-ratio odd constant

  @inline def h2(hash: Long): Long = (hash * Mix) | 1L

  def set(words: Array[Long], hash: Long, numHashes: Int): Unit = {
    val mask = (words.length.toLong << 6) - 1L
    val step = h2(hash)
    var i = 0
    var idx = hash
    while (i < numHashes) {
      val bit = idx & mask
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      idx += step
      i += 1
    }
  }

  /** True iff every probe bit is set (no false negatives; false
    * positives at the sized-for rate). Static and ArrayData-based so
    * generated code can call it directly.
    */
  def mightContain(words: ArrayData, hash: Long, numHashes: Int): Boolean = {
    val mask = (words.numElements().toLong << 6) - 1L
    val step = h2(hash)
    var i = 0
    var idx = hash
    while (i < numHashes) {
      val bit = idx & mask
      if ((words.getLong((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L)
        return false
      idx += step
      i += 1
    }
    true
  }
}

/** `graft_bloom_agg(hash bigint, numBits int, numHashes int) ->
  * array<bigint>` — a bloom filter OVER A COLUMN as a real aggregate:
  * fixed numBits/64-word buffer per partial, merge = bitwise OR (so
  * it is partial-agg friendly and mergeable in any order), output =
  * the word array, ready to broadcast via the 1-row crossJoin idiom
  * and probe with [[BloomContainsExpr]].
  *
  * This is the scale path for semi-join prefilters whose build side
  * has an UNBOUNDED distinct count: an exact vocabulary broadcast
  * (t17's trick) grows with the data, while the bloom is fixed bytes
  * chosen up front — the standard space/precision trade (false
  * positives only, never false negatives, so exact operators can use
  * it as a lossless prefilter: survivors are re-checked by the exact
  * join that follows).
  *
  * numBits must be a power-of-two literal ≥ 64 (probe indices reduce
  * by mask); numHashes a positive literal. Null hashes are skipped
  * (aggregate-null convention). Sizing: fpp ≈ (1 − e^(−kn/m))^k — at
  * m/n = 16 bits/element and k = 5, ~0.06%.
  */
case class BloomAgg(hashExpr: Expression, bitsExpr: Expression,
                    kExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val numBits: Int = {
    val v = bitsExpr.eval().asInstanceOf[Number].intValue()
    require(v >= 64 && Integer.bitCount(v) == 1,
      s"graft_bloom_agg: numBits must be a power of two >= 64, got $v")
    v
  }
  private lazy val numHashes: Int = {
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v >= 1, s"graft_bloom_agg: numHashes must be >= 1, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(hashExpr, bitsExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: hash must be BIGINT, got ${hashExpr.dataType.sql}")
    else if (!bitsExpr.foldable || bitsExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: numBits must be an INT literal, got ${bitsExpr.sql}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: numHashes must be an INT literal, got ${kExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) BloomKernel.set(buffer, h.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length >>> 3)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(hashExpr = newChildren(0), bitsExpr = newChildren(1),
      kExpr = newChildren(2))
}

/** `graft_bloom_contains(bloom array<bigint>, hash bigint,
  * numHashes int) -> boolean` — membership probe against a
  * [[BloomAgg]]-built word array (numBits is implied by the array
  * length). Codegen'd, so a broadcast bloom prefilter stays inside
  * whole-stage codegen on the probe side.
  */
case class BloomContainsExpr(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != ArrayType(LongType, containsNull = false) &&
        first.dataType != ArrayType(LongType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: bloom must be ARRAY<BIGINT>, got ${first.dataType.sql}")
    else if (second.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: hash must be BIGINT, got ${second.dataType.sql}")
    else if (!third.foldable || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains: numHashes must be an INT literal, got ${third.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(bloom: Any, hash: Any, k: Any): Any =
    BloomKernel.mightContain(bloom.asInstanceOf[ArrayData],
      hash.asInstanceOf[Long], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h, k) =>
      s"${ev.value} = graft.functions.BloomKernel.mightContain($b, $h, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BloomContainsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
