package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The built-in way to fold an array (`aggregate`/`zip_with` higher-order
  * functions) is evaluated INTERPRETED — each element walks an expression
  * tree — and profiled as the dominant cost of the ANN queries. This
  * expression generates a tight Java loop inside whole-stage codegen instead.
  *
  * Summation is strictly left-to-right, exactly like the `list_reduce` fold
  * the DuckDB oracles use, so results stay bit-identical across engines.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // nullable even over non-null children: a LENGTH MISMATCH or a NULL
  // ELEMENT yields NULL — the same answers the DuckDB twin produces
  // (list_zip pads the short side with NULL, and any NULL element
  // propagates through the fold), so a malformed vector gives the two
  // engines the same null. Reading getDouble on a null slot would have
  // silently treated NULL as 0.0 — a cross-engine gate diff the moment
  // real data carried a null element.
  override def nullable: Boolean = true

  // static schema fact: when BOTH input types prove containsNull=false,
  // the per-element null check is compiled out and the hot loop stays
  // branch-free — the common parquet embedding shape pays nothing.
  // lazy val, not def: the interpreted path reads this per row inside
  // nullSafeEval, and a def would pay a Seq allocation + match each time
  @transient private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(
      _.dataType match {
        case ArrayType(_, cn) => cn
        case _ => true
      })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      val checkNulls = mayHaveNullElements
      var s = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (mayHaveNullElements)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |      ${ev.isNull} = true;
             |      break;
             |    }
             |    """.stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck$s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sum of unsigned byte values of a binary column, as a tight codegen'd Java
  * loop. Replaces the interpreted `aggregate(split(text,''), ...)` per-char
  * fold the media gate twin used — that HOF walks an expression tree per
  * element and re-evaluates the split, O(n²) on long documents; this is one
  * O(n) loop inside whole-stage codegen. Left-to-right over exact integers,
  * so it is order-deterministic by construction. */
case class ByteSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_byte_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += ($a[$i] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {

  /** Idempotent session registration; expressions are then reachable from
    * the Column API (and SQL) via the function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_dot",
      { exprs: Seq[Expression] => DotProduct(exprs.head, exprs(1)) },
      "built-in")
    registry.createOrReplaceTempFunction("graft_byte_sum",
      { exprs: Seq[Expression] => ByteSum(exprs.head) },
      "built-in")
  }

  /** Codegen'd Σ(byte & 0xff) over a binary column. */
  def byteSum(b: Column): Column = call_function("graft_byte_sum", b)

  /** Column builder — resolution happens at analysis time, so the session
    * only needs [[register]] called before the first action on the plan. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
