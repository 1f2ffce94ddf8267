package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/**
 * Codegen probe expressions for broadcastable sketches (count-min, bloom).
 * The sketch object rides into generated code as a codegen reference (like
 * [[NearestCentroid]]'s centroid matrix), so the pruning filter stays inside
 * whole-stage codegen instead of breaking the stage at an interpreted Scala
 * UDF — at 100 TB these filters run once per scanned row, ahead of a shuffle.
 *
 * Type discipline (the correctness point, not just speed): a sketch probe
 * must hash the SAME representation the sketch was built from. Spark's
 * `stat.countMinSketch`/`stat.bloomFilter` insert STRING keys as their UTF-8
 * bytes and integral keys as longs — so each expression dispatches on the
 * key's Catalyst type and REJECTS anything else at analysis time. (The
 * r1 Scala-UDF probes hashed every key as one fixed type: a LONG key probed
 * through a String UDF estimates ~0 and silently breaks the no-false-negative
 * contract; floats/decimals have no sketch representation at all.)
 */
private object SketchExprGen {
  val Ops = "graft.functions.SketchOps$.MODULE$"
}

/** JVM kernels called from generated code (and interpreted eval). */
object SketchOps {
  def cmsAtLeastString(cms: CountMinSketch, minCount: Long, u: UTF8String): Boolean =
    cms.estimateCount(u.toString) >= minCount

  def cmsAtLeastLong(cms: CountMinSketch, minCount: Long, v: Long): Boolean =
    cms.estimateCount(java.lang.Long.valueOf(v)) >= minCount

  def bloomMaybeString(bf: BloomFilter, u: UTF8String): Boolean =
    bf.mightContainBinary(u.getBytes)

  def bloomMaybeLong(bf: BloomFilter, v: Long): Boolean =
    bf.mightContainLong(v)

  def anyInSortedLongSet(set: Array[Long],
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }
}

private[graft] object SketchKeyType {
  /** True for STRING, false for integral, error otherwise. */
  def isStringKey(dt: DataType, who: String): Boolean = dt match {
    case StringType => true
    case ByteType | ShortType | IntegerType | LongType => false
    case other => throw new IllegalArgumentException(
      s"$who: sketch keys must be STRING or integral (got $other) — " +
        "other types have no stable sketch hash representation")
  }
}

/** cms_at_least(key) -> BOOLEAN — count-min-sketch estimate >= minCount.
  * CMS never under-counts, so false here PROVES the key is below threshold
  * (the safe prune direction); true may be a false positive the exact
  * aggregate removes. */
case class CmsAtLeast(child: Expression, cms: CountMinSketch, minCount: Long)
    extends UnaryExpression {
  override def prettyName: String = "cms_at_least"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  private lazy val stringKey = SketchKeyType.isStringKey(child.dataType, prettyName)

  override def checkInputDataTypes() = {
    SketchKeyType.isStringKey(child.dataType, prettyName)
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    if (stringKey) SketchOps.cmsAtLeastString(cms, minCount, v.asInstanceOf[UTF8String])
    else SketchOps.cmsAtLeastLong(cms, minCount, v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    if (stringKey)
      defineCodeGen(ctx, ev, c => s"${SketchExprGen.Ops}.cmsAtLeastString($ref, ${minCount}L, $c)")
    else
      defineCodeGen(ctx, ev, c => s"${SketchExprGen.Ops}.cmsAtLeastLong($ref, ${minCount}L, (long) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** any_in_set(grams ARRAY<LONG>) -> BOOLEAN — true iff ANY element is in
  * the broadcast sorted long set (binary search per element). The set rides
  * as a BROADCAST reference, not a plan literal: a decontamination suite
  * carries millions of 8-gram hashes, and a multi-megabyte `typedlit` array
  * would be re-analyzed, re-optimized, and re-serialized per task in every
  * streaming micro-batch plan — the broadcast ships once per executor and
  * the plan node is a pointer. Exact (no false positives), unlike a bloom
  * probe, so no verify join is needed — the stateless stream-side shape of
  * the batch decontaminator's broadcast semi-join. */
case class AnyInSortedLongSet(child: Expression,
    set: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {
  override def prettyName: String = "any_in_set"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) => ()
      case other => throw new IllegalArgumentException(
        s"$prettyName: needs ARRAY<LONG> gram hashes (got $other)")
    }
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    SketchOps.anyInSortedLongSet(set.value,
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramSet", set,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"${SketchExprGen.Ops}.anyInSortedLongSet((long[]) $ref.value(), $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bloom_maybe(key) -> BOOLEAN — bloom-filter membership probe. False
  * PROVES absence (the safe prune direction); true may be a false positive
  * the downstream join eliminates. */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def prettyName: String = "bloom_maybe"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  private lazy val stringKey = SketchKeyType.isStringKey(child.dataType, prettyName)

  override def checkInputDataTypes() = {
    SketchKeyType.isStringKey(child.dataType, prettyName)
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    if (stringKey) SketchOps.bloomMaybeString(bf, v.asInstanceOf[UTF8String])
    else SketchOps.bloomMaybeLong(bf, v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf, classOf[BloomFilter].getName)
    if (stringKey)
      defineCodeGen(ctx, ev, c => s"${SketchExprGen.Ops}.bloomMaybeString($ref, $c)")
    else
      defineCodeGen(ctx, ev, c => s"${SketchExprGen.Ops}.bloomMaybeLong($ref, (long) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
