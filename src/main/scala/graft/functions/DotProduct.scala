package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dot product over two float/double array columns — the one
  * place the engine drops below `functions._` to a custom Catalyst
  * `Expression` with real codegen (build brief preference order (b):
  * a native Expression beats a UDF beats everything else).
  *
  * Why it exists: the similarity hot path evaluates a dot product per
  * candidate pair. The built-in spelling
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`
  * materializes a product array and walks it with interpreted lambda
  * calls (~µs/element); this expression compiles to a tight primitive
  * loop inside whole-stage codegen — no allocation, no boxing — and
  * keeps the identical left-to-right IEEE summation order, so results
  * are bit-equal to the HOF spelling and the DuckDB oracle.
  *
  * Null semantics: null input array → null; element nulls are not
  * expected (embeddings are dense) and read as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += get(a, ta, i) * get(b, tb, i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${getter(ta, a, i)} * ${getter(tb, b, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  val fnId: FunctionIdentifier = FunctionIdentifier("dot_product")
  val info = new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
  val builder: Seq[Expression] => Expression =
    es => DotProduct(es.head, es(1))

  /** Runtime registration for an already-built session (idempotent) —
    * the escape hatch when the session wasn't created with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(fnId, info, builder)
}

/** SparkSessionExtensions entry point: register the engine's custom
  * expressions at session build time
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((DotProduct.fnId, DotProduct.info, DotProduct.builder))
    e.injectFunction((TopKScoreId.fnId, TopKScoreId.info, TopKScoreId.builder))
    e.injectFunction((OptimizerBarrier.fnId, OptimizerBarrier.info,
      OptimizerBarrier.builder))
    e.injectFunction((NfcNormalize.fnId, NfcNormalize.info,
      NfcNormalize.builder))
    e.injectFunction((MinHashSigs.fnId, MinHashSigs.info,
      MinHashSigs.builder))
    e.injectFunction((SortedInterSize.fnId, SortedInterSize.info,
      SortedInterSize.builder))
    e.injectFunction((ShingleFps.fnId, ShingleFps.info, ShingleFps.builder))
    e.injectFunction((SpanFps.fnId, SpanFps.info, SpanFps.builder))
    e.injectFunction((TokCount.fnId, TokCount.info, TokCount.builder))
    e.injectFunction((PqEncode.fnId, PqEncode.info, PqEncode.builder))
    e.injectFunction((BloomProbe.fnId, BloomProbe.info, BloomProbe.builder))
    e.injectFunction((graft.plans.AsOfLE.fnId, graft.plans.AsOfLE.info,
      graft.plans.AsOfLE.builder))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((graft.plans.IntervalContains.fnId,
      graft.plans.IntervalContains.info, graft.plans.IntervalContains.builder))
    e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}
