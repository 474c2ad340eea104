package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit MD5 word of a string — ONE long, bit-identical to the
  * composed `conv(substring(md5(s), 1, 15), 16, 10).cast("long")` that
  * `TextFunctions.shingleKey`/`baseHash` build the span/minhash
  * families' cross-engine-verifiable keys from (the first 15 hex chars
  * of the digest ARE its first 60 bits, big-endian), which the
  * differential spec asserts on random strings.
  *
  * Why native (the SimHash64 argument): the composed form materializes
  * a 32-char hex STRING per shingle, substrings it, and re-parses 15
  * chars of hex back into a long through `conv` — allocation plus two
  * scans per key, paid once per (position, shingle) posting row, i.e.
  * the single hottest expression of the span-dedup family (measured as
  * the bulk of the md5-vs-xxhash gap at sf0.1, round 15). Here the 60
  * bits come straight off the digest bytes. The ORACLE SQL is
  * unchanged — DuckDB keeps computing `('0x' || substr(md5(s),1,15))
  * ::BIGINT`; equality of values is the gate. */
case class Md5Word60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5w60 expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5w60"

  override def nullSafeEval(input: Any): Any =
    Md5Word60.word60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Word60.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.MODULE$$.word60($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Word60 =
    copy(child = newChild)
}

object Md5Word60 {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes of s), big-endian — the value of
    * the first 15 hex chars of the digest parsed base-16. */
  def word60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xffL) >>> 4)
  }
}
