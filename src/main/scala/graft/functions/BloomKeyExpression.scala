package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType,
  LongType, ShortType}
import org.apache.spark.util.sketch.BloomFilter

/** Row-level Bloom membership probe against a pre-built filter — the
  * runtime-filter (semi-join reduction) primitive: build a Bloom over
  * the SMALL side's join keys, probe it map-side on the BIG side
  * before the join, and the shuffle carries only rows that might
  * match. False positives are removed by the exact join that follows;
  * false negatives cannot occur, so the rewrite is semantically free.
  *
  * Same role as Spark's internal `BloomFilterMightContain` (which only
  * the `InjectRuntimeFilter` rule can plant, under AQE-dependent
  * thresholds); this expression gives the library an explicit,
  * deterministic form of the same plan. The serialized filter rides
  * along as a plan reference object (one copy per executor, like a
  * broadcast); the probe itself stays inside whole-stage codegen.
  */
case class BloomKeyMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_key_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral key, got ${other.simpleString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Shared by the interpreted and codegen paths. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(input: Any): Any = input match {
    case l: Long  => mightContain(l)
    case i: Int   => mightContain(i.toLong)
    case s: Short => mightContain(s.toLong)
    case b: Byte  => mightContain(b.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomKeyMightContain].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.mightContain((long) $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomKeyMightContain {
  def apply(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(
      BloomKeyMightContain(ColumnBridge.expression(key), bos.toByteArray))
  }
}
