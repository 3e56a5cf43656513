package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native 60-bit md5 hash: binary → first 60 bits of the md5 digest as
  * a non-negative long.
  *
  * Semantics are IDENTICAL BY CONSTRUCTION to the composed form
  * `conv(substring(md5(x), 1, 15), 16, 10) cast long` (HashFns.hash64's
  * original definition, mirrored by the DuckDB twin
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`): the first 15 hex
  * chars of the digest are the big-endian first 8 bytes shifted right
  * by one nibble. Hash64Spec asserts equality against the composed form
  * on random inputs and the corpus, so swapping it in cannot change any
  * oracle-checked result.
  *
  * Why an Expression: the composed form materializes a 32-char hex
  * UTF8String per row, substrings it, and re-parses base-16 through
  * `conv`'s arbitrary-base loop. This kernel digests straight into a
  * long — no hex string, no parse — and md5-derived hashing underlies
  * every dedup/fingerprint/mixing operator in the engine.
  */
case class Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash64 needs binary input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Hash64.first60(org.apache.commons.codec.digest.DigestUtils.md5(
      input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one digest instance per generated-class instance (= per task
    // thread), reset by digest() itself on every call
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val dig = ctx.freshName("dig")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $dig = $md.digest($c);
         |long $acc = 0L;
         |for (int $i = 0; $i < 8; $i++) {
         |  $acc = ($acc << 8) | (((long) $dig[$i]) & 0xffL);
         |}
         |${ev.value} = $acc >>> 4;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_hash64"
}

object Hash64 {
  /** First 60 bits of a 16-byte digest, matching base-16 parse of its
    * first 15 hex chars.
    */
  def first60(digest: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (digest(i) & 0xffL)
      i += 1
    }
    acc >>> 4
  }

  /** Column-API entry point (casts to binary like the composed form). */
  def hash64(c: Column): Column =
    graftbridge.column(Hash64(graftbridge.expression(c.cast("binary"))))
}
