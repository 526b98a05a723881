package graft.engine

import java.time.{Instant, LocalDate, OffsetDateTime}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Manifest-level file skipping — the planner half of the manifest design
  * ([[Manifests]]): decide from per-file min/max bounds alone whether a
  * data file can possibly contain rows matching a predicate, without
  * opening the file or even its footer.
  *
  * This is the read-path payoff the whole metadata layer exists for (the
  * reference's tables are Iceberg for exactly this reason —
  * compose/trino/catalog/iceberg.properties:1: engines plan scans from
  * manifest stats, not from storage listings). At 100 TB a needle query
  * touches a handful of files out of ~100 k; bounds pruning runs on the
  * DRIVER over the in-memory manifest — O(files) string comparisons, the
  * same planning cost model as Iceberg's own `ManifestEvaluator` — and
  * the executors never see the skipped files at all.
  *
  * Safety discipline (must-not-miss-rows, may-read-extra):
  *  - A column absent from a file's bounds maps means "no usable stats"
  *    ([[Manifests.collectStats]] poisons the column if ANY row-group
  *    chunk lacks stats) → the file is kept.
  *  - Bounds are parquet's stringified min/max; they are re-typed here
  *    against the manifest's pinned schema. If a bound fails to parse
  *    under the declared type (an exotic stringifier, a truncated stat),
  *    the file is kept. Pruning is fail-open at every step.
  *  - Bounds describe non-null values only. Every predicate below is
  *    null-rejecting (`=`, `<`, `IN` never select null rows), so a file
  *    whose non-null range excludes the probe cannot contribute rows —
  *    skipping it is safe even if the file also holds nulls.
  */
object Pruning {

  /** Skip-eligible predicates. Deliberately the Iceberg expression
    * subset that bounds can decide; everything else stays a residual
    * row filter on the kept files. */
  sealed trait Pred { def colName: String }
  final case class Eq(colName: String, value: Any) extends Pred
  final case class Gt(colName: String, value: Any) extends Pred
  final case class Ge(colName: String, value: Any) extends Pred
  final case class Lt(colName: String, value: Any) extends Pred
  final case class Le(colName: String, value: Any) extends Pred
  final case class In(colName: String, values: Seq[Any]) extends Pred

  /** The residual row-level filter for a predicate — ANDed onto the kept
    * files' scan so pruning can never change query results, only the
    * file set that produces them. */
  def toColumn(p: Pred): Column = p match {
    case Eq(c, v) => col(c) === lit(v)
    case Gt(c, v) => col(c) > lit(v)
    case Ge(c, v) => col(c) >= lit(v)
    case Lt(c, v) => col(c) < lit(v)
    case Le(c, v) => col(c) <= lit(v)
    case In(c, vs) => col(c).isin(vs: _*)
  }

  // ---------------------------------------------------------------- typing
  // Bounds and probe literals are compared in a per-type common domain:
  // integrals as Long, floating point as Double, decimals as BigDecimal,
  // dates as epoch days, timestamps as epoch micros, strings as strings.
  // `parseBound` decodes parquet's stat stringification (raw digits for
  // ints, ISO date for DATE logical type, offset timestamps for
  // TIMESTAMP); `normalize` brings the caller's literal (Scala/java.sql/
  // java.time values) into the same domain. Either side failing → None →
  // keep the file.

  private def parseLong(s: String): Option[Long] =
    try Some(s.trim.toLong) catch { case _: NumberFormatException => None }
  private def parseDouble(s: String): Option[Double] =
    try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }
  private def parseDecimal(s: String): Option[BigDecimal] =
    try Some(BigDecimal(s.trim)) catch { case _: NumberFormatException => None }
  private def parseDate(s: String): Option[Long] = {
    val t = s.trim
    (try Some(LocalDate.parse(t).toEpochDay) catch { case _: Exception => None })
      .orElse(parseLong(t)) // raw int32 days fallback
  }
  // parquet-mr's timestamp stringifier emits RFC822 offsets ("+0000");
  // parquet-mr's timestamp stringifiers emit two shapes, both observed on
  // real files: UTC-adjusted columns (what Spark writes) carry an RFC822
  // offset ("…T10:34:56.000001+0000"); local/NTZ columns (e.g. pyarrow
  // testdata) are a bare local datetime with up to nano fraction
  // ("2024-01-01T00:09:58.778549829"). Normalize the RFC822 offset to
  // ISO, fall back to local-as-UTC (the session timezone is pinned UTC),
  // then raw micros. Anything else → None → keep the file.
  private def microsOf(i: Instant): Long = Math.addExact(
    Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
  private def parseTimestamp(s: String): Option[Long] = {
    val t = s.trim.replaceAll("([+-]\\d{2})(\\d{2})$", "$1:$2")
    (try Some(microsOf(OffsetDateTime.parse(t).toInstant))
     catch { case _: Exception => None })
      .orElse(try Some(microsOf(java.time.LocalDateTime.parse(t)
        .toInstant(java.time.ZoneOffset.UTC))) catch { case _: Exception => None })
      .orElse(try Some(microsOf(Instant.parse(t))) catch { case _: Exception => None })
      .orElse(parseLong(t))
  }

  private def normLong(v: Any): Option[Long] = v match {
    case n: Byte => Some(n.toLong)
    case n: Short => Some(n.toLong)
    case n: Int => Some(n.toLong)
    case n: Long => Some(n)
    case _ => None
  }
  private def normDouble(v: Any): Option[Double] = v match {
    case n: Float => Some(n.toDouble)
    case n: Double => Some(n)
    case n: Byte => Some(n.toDouble)
    case n: Short => Some(n.toDouble)
    case n: Int => Some(n.toDouble)
    case n: Long => Some(n.toDouble)
    case _ => None
  }
  private def normDecimal(v: Any): Option[BigDecimal] = v match {
    case d: BigDecimal => Some(d)
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case n: Byte => Some(BigDecimal(n.toInt))
    case n: Short => Some(BigDecimal(n.toInt))
    case n: Int => Some(BigDecimal(n))
    case n: Long => Some(BigDecimal(n))
    case n: Double => Some(BigDecimal(n))
    case _ => None
  }
  private def normDate(v: Any): Option[Long] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: LocalDate => Some(d.toEpochDay)
    case s: String => try Some(LocalDate.parse(s).toEpochDay)
                      catch { case _: Exception => None }
    case _ => None
  }
  private def normTimestamp(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(Math.addExact(
      Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L),
      (t.getNanos / 1000).toLong))
    case i: Instant => Some(microsOf(i))
    case d: java.time.LocalDateTime =>
      Some(microsOf(d.toInstant(java.time.ZoneOffset.UTC)))
    case s: String => // "yyyy-MM-dd HH:mm:ss[.f]" session-UTC literal
      try Some(normTimestamp(java.sql.Timestamp.valueOf(s)).get)
      catch { case _: Exception => None }
    case _ => None
  }
  private def normString(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case _ => None
  }

  /** One comparison domain: bound-string decoder + literal normalizer +
    * ordering. All three must agree for a type or the file is kept. */
  private final case class Domain[T](parse: String => Option[T],
      norm: Any => Option[T], ord: Ordering[T])

  private def domainFor(dt: DataType): Option[Domain[_]] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(Domain[Long](parseLong, normLong, Ordering.Long))
    case FloatType | DoubleType =>
      Some(Domain[Double](parseDouble, normDouble, Ordering.Double.TotalOrdering))
    case _: DecimalType =>
      Some(Domain[BigDecimal](parseDecimal, normDecimal, Ordering.BigDecimal))
    case StringType =>
      Some(Domain[String](s => Some(s), normString, Ordering.String))
    case DateType =>
      Some(Domain[Long](parseDate, normDate, Ordering.Long))
    case TimestampType | TimestampNTZType =>
      Some(Domain[Long](parseTimestamp, normTimestamp, Ordering.Long))
    case _ => None // binary, arrays, structs, …: never skip on these
  }

  /** Can `file` possibly contain a row satisfying `p`? Fail-open: any
    * missing/unparseable piece returns true. */
  def mayContain(file: Manifests.FileEntry, schema: StructType,
      p: Pred): Boolean = {
    val field = schema.fields.find(_.name == p.colName)
    if (field.isEmpty) return true
    domainFor(field.get.dataType) match {
      case None => true
      case Some(dom0) =>
        val dom = dom0.asInstanceOf[Domain[Any]]
        (file.lower.get(p.colName).flatMap(dom.parse),
         file.upper.get(p.colName).flatMap(dom.parse)) match {
          case (Some(lo), Some(hi)) =>
            val ord = dom.ord
            def inRange(raw: Any): Boolean = dom.norm(raw) match {
              case Some(v) => ord.lteq(lo, v) && ord.lteq(v, hi)
              case None => true // unnormalizable literal: keep
            }
            p match {
              case Eq(_, v) => inRange(v)
              case In(_, vs) => vs.isEmpty || vs.exists(inRange)
              case Gt(_, v) => dom.norm(v).forall(x => ord.gt(hi, x))
              case Ge(_, v) => dom.norm(v).forall(x => ord.gteq(hi, x))
              case Lt(_, v) => dom.norm(v).forall(x => ord.lt(lo, x))
              case Le(_, v) => dom.norm(v).forall(x => ord.lteq(lo, x))
            }
          case _ => true // bounds absent: cannot skip
        }
    }
  }

  /** Partition a manifest's file list into (kept, skipped) under a
    * conjunction of predicates. */
  def prune(files: Seq[Manifests.FileEntry], schema: StructType,
      preds: Seq[Pred]): (Seq[Manifests.FileEntry], Seq[Manifests.FileEntry]) =
    files.partition(f => preds.forall(p => mayContain(f, schema, p)))
}
