package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Native positional shingle keys — `graft_span_keys(tokens, k, fast)`
  * → `array<long>` where element i is the 60-bit md5 word (fast = the
  * seed-42 xxhash64 Spark's `xxhash64` computes) of the k-token shingle
  * starting at position i, exactly the value of the composed
  * `shingleKey(concat_ws(" ", slice(toks, i, k)))` the span posting
  * used to build (differential-spec'd on the real corpus, null-token
  * and short-document semantics included: concat_ws SKIPS null
  * elements; < k tokens → empty array).
  *
  * Why native (the SimHash64/NGramMaxMultiplicity argument one more
  * time): the composed form is an INTERPRETED `transform` whose lambda
  * re-evaluates an element_at/concat_ws tree per position and
  * materializes every shingle as a UTF8String before hashing — the
  * positional posting is the dominant term of every span-family gate.
  * Here each window's bytes append into one reused buffer (token bytes
  * are sliced once) and hash straight from it; nothing per-position
  * allocates but the output longs. */
case class SpanKeys(child: Expression, k: Int, fast: Boolean)
    extends UnaryExpression {

  require(k >= 1, "graft_span_keys k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_span_keys expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_span_keys"

  override def nullSafeEval(input: Any): Any =
    SpanKeys.keys(input.asInstanceOf[ArrayData], k, fast)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SpanKeys.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $cls.MODULE$$.keys($arr, $k, $fast);")
  }

  override protected def withNewChildInternal(newChild: Expression): SpanKeys =
    copy(child = newChild)
}

object SpanKeys {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 10)
  }

  def keys(toks: ArrayData, k: Int, fast: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // token bytes sliced once (null tokens → null slot, skipped by the
    // concat_ws-parity join below)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) tb(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    val d = md5.get()
    var p = 0
    while (p <= n - k) {
      // assemble the window's joined bytes in the reused buffer
      var b = buf.get()
      var len = 0
      var first = true
      var j = p
      while (j < p + k) {
        val t = tb(j)
        if (t != null) { // concat_ws skips null elements entirely
          val need = len + t.length + 1
          if (need > b.length) {
            val nb = new Array[Byte](math.max(need, b.length * 2))
            System.arraycopy(b, 0, nb, 0, len)
            buf.set(nb); b = nb
          }
          if (!first) { b(len) = ' '; len += 1 }
          System.arraycopy(t, 0, b, len, t.length)
          len += t.length
          first = false
        }
        j += 1
      }
      out(p) =
        if (fast) XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, 42L)
        else {
          d.reset()
          d.update(b, 0, len)
          val digest = d.digest()
          var v = 0L
          var x = 0
          while (x < 7) { v = (v << 8) | (digest(x) & 0xffL); x += 1 }
          (v << 4) | ((digest(7) & 0xffL) >>> 4)
        }
      p += 1
    }
    new GenericArrayData(out)
  }
}
