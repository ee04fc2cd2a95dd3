package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen Hamming distance over two packed-word code columns
  * (array<bigint>, one bit per dimension — the layout
  * [[graft.search.Ann.binaryCodes]] produces): Σ popcount(aᵢ XOR bᵢ).
  *
  * The declarative formulation
  * (`aggregate(zip_with(a, b, bit_count(x ^ y)), ...)`) pays lambda
  * interpretation and two intermediate arrays per row; this generates
  * a tight `Long.bitCount` loop inside whole-stage codegen —
  * [[DotProduct]]'s design applied to the binary-quantization scan, so
  * a SQL-level consumer of packed codes keeps the 32×-smaller rows AND
  * stays in codegen. The typed search paths (`binaryTopKRefined`,
  * `ivfBinaryTopK`) keep their fused per-partition heaps — this is the
  * Column/SQL-surface twin, not a replacement.
  *
  * Mismatched lengths compare the common prefix (the [[DotProduct]]
  * convention); popcount of a long is exact integer arithmetic, so the
  * result is engine-independent by construction.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_hamming expects two bigint arrays (packed codes), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var h = 0
    var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $h = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
