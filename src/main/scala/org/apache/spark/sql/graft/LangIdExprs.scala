package org.apache.spark.sql.graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole trained-langid softmax argmax (T1″ serving) as ONE native
  * per-row expression — the second member of the JIT-cliff family the
  * gsf100 probe exposed ([[LshSignatures]]): the HOF form of
  * `LangId.scoreExpr` tokenizes, hashes, and folds per-bucket counts
  * against a ~L·(B+1)-double weight literal through interpreted lambda
  * chains with per-term `decimal(34,9)` Cast/Round sub-plans — measured
  * at ~1 ms/document (q232's 4.9 s serve at sf0.1). Here the identical
  * arithmetic runs as plain loops over primitive arrays + exact
  * `java.math.BigDecimal` margin sums.
  *
  * Bit-equality contract with `LangId.predict` (LangIdSpec pins it
  * prediction-for-prediction over the REAL corpus and the
  * empty/whitespace/repeated-run/NULL edges; the retired composed form
  * stays in the spec as a second reference):
  *   - tokens: `trim` (spaces) → `toLowerCase` on the engine's own
  *     [[UTF8String]] ops (not java.lang.String — identical unicode
  *     behavior to the `lower(trim(text))` plan), split on `\s+` with
  *     limit −1 (Spark's `split` default: trailing empties kept, and
  *     the empty string yields ONE empty token — "even the empty string
  *     produces one feature row");
  *   - n-grams: words ++ adjacent bigrams joined with one space;
  *   - bucket: first 4 md5 bytes as an unsigned int (≡ `conv(
  *     substring(md5(g), 1, 8), 16, 10)`) mod `buckets`;
  *   - x = round₉(cnt/n) materialized through the same
  *     double-round-then-decimal-cast chain as `r9(...)`.cast("double")
  *     (Spark's Round-on-double is `BigDecimal.valueOf(v).setScale(9,
  *     HALF_UP).toDouble`; the decimal cast re-scales the SAME way, so
  *     the composition is [[LangIdPredictExpr.round9d]]);
  *   - per-(bucket, label) term: round₉(x·w) as an exact decimal(24,9),
  *     margins summed with exact BigDecimal adds (order-independent by
  *     exactness — the grouped plan sums in shuffle order too);
  *   - argmax: ascending label scan, strictly-greater replacement ≡
  *     predict's `min(struct(-m, l))` smallest-label tie-break.
  *
  * NULL text → NULL (predict emits no row — the same no-prediction
  * outcome). CodegenFallback: the per-row work (regex split + one md5
  * per n-gram + decimal sums) dwarfs the fallback call overhead, and
  * the eval body is one compact JIT-friendly Scala method — exactly
  * what the HOF form could not give the JIT. */
case class LangIdPredictExpr(child: Expression, labels: Seq[String],
    buckets: Int, flatW: Array[Double]) extends UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback with Serializable {
  require(labels.nonEmpty && buckets >= 1 &&
    flatW.length == labels.size * (buckets + 1),
    s"weight matrix shape ${flatW.length} != ${labels.size}x${buckets + 1}")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "langid_predict"

  @transient private lazy val labelStrs: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val words = ws.split(text, -1)
    val nWords = words.length
    val n = (if (nWords >= 2) 2 * nWords - 1 else nWords).toDouble
    // per-bucket occurrence counts (uni + adjacent bigrams)
    val counts = new java.util.HashMap[Integer, Integer]()
    val dg = md5.get()
    def bump(g: String): Unit = {
      dg.reset()
      val d = dg.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val b = (u % buckets).toInt
      counts.merge(b, 1, (a, x) => a + x)
      ()
    }
    var i = 0
    while (i < nWords) { bump(words(i)); i += 1 }
    i = 0
    while (i < nWords - 1) { bump(words(i) + " " + words(i + 1)); i += 1 }
    // margins: intercept terms, then one sorted-by-nothing exact fold
    val nL = labelStrs.length
    val margins = new Array[JBigDecimal](nL)
    var l = 0
    while (l < nL) {
      margins(l) = LangIdPredictExpr.dec9(1.0 * flatW(l * (buckets + 1)))
      l += 1
    }
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val x = LangIdPredictExpr.dec9(e.getValue.doubleValue() / n).doubleValue()
      val base = e.getKey.intValue() + 1
      l = 0
      while (l < nL) {
        margins(l) = margins(l).add(
          LangIdPredictExpr.dec9(x * flatW(l * (buckets + 1) + base)))
        l += 1
      }
    }
    var best = 0
    l = 1
    while (l < nL) {
      if (margins(l).compareTo(margins(best)) > 0) best = l
      l += 1
    }
    labelStrs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdPredictExpr {
  /** Spark's `round(v, 9).cast(decimal)` chain on a double: round the
    * double (valueOf → setScale(9, HALF_UP) → toDouble), then the
    * double→decimal cast re-scales the shortest decimal representation
    * the same way — one exact decimal(·,9) out. */
  private[graft] def dec9(v: Double): JBigDecimal =
    JBigDecimal.valueOf(
      JBigDecimal.valueOf(v).setScale(9, RoundingMode.HALF_UP).doubleValue())
      .setScale(9, RoundingMode.HALF_UP)

  def column(text: Column, labels: Seq[String], buckets: Int,
      flatW: Array[Double]): Column =
    ExpressionUtils.column(LangIdPredictExpr(
      ExpressionUtils.expression(text), labels, buckets, flatW))
}
