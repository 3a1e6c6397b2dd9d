package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding hot path: dot product of two
  * float vectors with double accumulation, with whole-stage codegen. The
  * accumulation order is sequential (index 0..n) so results are bit-identical
  * to the DuckDB oracle's list_inner_product over DOUBLE[] — and to the HOF
  * `aggregate(zip_with(...))` fold it replaces, at a fraction of the cost
  * (no per-element lambda eval, no array-of-double materialization).
  *
  * Tier (b) of the builder brief's custom-operator ladder: a scalar
  * Expression, not a UDF — stays inside WholeStageCodegen. */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product of two array<long> columns — the int8-quantized ANN
  * scoring kernel (d20/d23). Exact 64-bit integer arithmetic, identical to
  * the HOF `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold it replaces and to
  * the DuckDB mirror's list_inner_product over BIGINT[], minus the
  * per-element lambda evaluation. */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two array<double> columns with sequential accumulation —
  * same contract as FloatDotProduct for double-typed vectors (the IVF
  * centroid assignment path, where centroids are decimal-exact doubles). */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

/** The LSH sign-bit bucket of a float embedding under `nPlanes` seeded
  * integer hyperplanes, in ONE codegen'd pass — bit p of the result is
  * sign(Σ_j floor(e_j·2^20) · coef(p, j)) where coef is the two-round
  * Lehmer mix on the flattened (plane, dim) index (64-stride, as the
  * DuckDB mirrors). Arithmetic is EXACTLY the composed-HOF rendition it
  * replaces (`Dedup.lshBucket`'s per-plane aggregate(zip_with(...))
  * pyramid — nPlanes interpreted lambda folds per row, measured ~10× the
  * total query time of this single fused loop): quantization
  * floor(double·2^20)→long, products |q|·|coef| < 2^51, 64-term sums
  * < 2^57 — overflow-free, engine-neutral, oracle-identical. */
case class LshBucket(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val n = e.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0L
      var j = 0
      while (j < n) {
        val q = math.floor(e.getFloat(j).toDouble * 1048576.0).toLong
        val m = p.toLong * 64L + j + 1L
        val c1 = ((m * 2654435761L) % 2147483647L + 2147483647L) % 2147483647L
        val c2 = ((c1 * 48271L) % 2147483647L + 2147483647L) % 2147483647L
        dot += q * (c2 - 1073741823L)
        j += 1
      }
      if (dot > 0L) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val m = ctx.freshName("m")
      val c1 = ctx.freshName("c1")
      val c2 = ctx.freshName("c2")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  long $dot = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $q = (long) java.lang.Math.floor((double) $a.getFloat($j) * 1048576.0);
         |    long $m = (long) $p * 64L + $j + 1L;
         |    long $c1 = (($m * 2654435761L) % 2147483647L + 2147483647L) % 2147483647L;
         |    long $c2 = (($c1 * 48271L) % 2147483647L + 2147483647L) % 2147483647L;
         |    $dot += $q * ($c2 - 1073741823L);
         |  }
         |  if ($dot > 0L) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column wrapper: dot product of two array<float> columns (double). */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: integer dot product of two array<long> columns. */
  def dotL(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: dot product of two array<double> columns. */
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: LSH sign-bit bucket of an array<float> embedding. */
  def lshBucketNative(e: Column, nPlanes: Int): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(e), nPlanes))

  /** The ONE `graft_dot` SQL builder — shared by the temp-function path
    * below and the SparkSessionExtensions production wiring
    * ([[graft.GraftExtensions]]); code-review r16: two verbatim copies
    * could drift, and arity was unchecked — a third argument was silently
    * DROPPED (wrong results, no error) and a missing one threw a raw
    * IndexOutOfBoundsException instead of naming the function. */
  private[graft] val dotSqlBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression = { args =>
    require(args.length == 2,
      s"graft_dot requires exactly 2 arguments, got ${args.length}")
    FloatDotProduct(args.head, args(1))
  }

  /** Register `graft_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotSqlBuilder, "built-in")
}
