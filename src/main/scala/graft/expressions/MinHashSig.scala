package graft.expressions

import graft.functions.HashFns
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native Catalyst MinHash signature kernel: array<long> gram hashes →
  * array<long> of K per-permutation minima.
  *
  * Why an Expression and not HashFns.minhashSigFromHashes (K × array_min
  * ∘ transform): the HOF form traverses the gram array K=16 times,
  * allocating an intermediate array per permutation through the
  * LambdaFunction plumbing; this is ONE pass with the 16 affine
  * permutations applied per element in a tight primitive loop inside
  * whole-stage codegen. The signature step runs over every document's
  * gram set in q34/q58/q74 — at corpus scale it is the dedup pipeline's
  * dominant per-row kernel.
  *
  * Semantics are IDENTICAL to the HOF form by construction (same
  * constants from HashFns.minhashA/B, same (a·(h mod P)+b) mod P
  * integer arithmetic, min over the same elements) — MinHashSigSpec
  * asserts equality on random inputs, so swapping it in cannot change
  * oracle-checked results. Empty input yields an all-null signature,
  * matching array_min over an empty array. Array elements are assumed
  * non-null (they come from hashedShingles).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  private val K = HashFns.MinhashK
  private val P = HashFns.MinhashP

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](K)) // all null
    val a = HashFns.minhashA
    val b = HashFns.minhashB
    val sig = Array.fill[Long](K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) % P
      var k = 0
      while (k < K) {
        val v = (a(k) * h + b(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(Long.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aConst = ctx.addReferenceObj("minhashA", HashFns.minhashA.toArray, "long[]")
      val bConst = ctx.addReferenceObj("minhashB", HashFns.minhashB.toArray, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val boxed = ctx.freshName("boxed")
      s"""
         |final int $n = $c.numElements();
         |Object[] $boxed = new Object[$K];
         |if ($n > 0) {
         |  long[] $sig = new long[$K];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $c.getLong($i) % ${P}L;
         |    for (int $k = 0; $k < $K; $k++) {
         |      final long $v = ($aConst[$k] * $h + $bConst[$k]) % ${P}L;
         |      if ($v < $sig[$k]) $sig[$k] = $v;
         |    }
         |  }
         |  for (int $k = 0; $k < $K; $k++) $boxed[$k] = Long.valueOf($sig[$k]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Column-API entry point. */
  def minhashSig(hashes: Column): Column =
    graftbridge.column(MinHashSig(graftbridge.expression(hashes)))
}
