package graft.sources

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Translates Spark V1 source filters into parquet `FilterPredicate`s
  * for ROW-GROUP-level skipping inside manifest data files — the same
  * contract native `FileSourceScanExec` gets from Spark's own
  * `ParquetFilters`: the predicate drops whole row groups whose
  * stats/dictionary/bloom PROVE no row can match; surviving groups are
  * decoded in full and Spark's residual FilterExec does the exact
  * row-level work (the scan reports every filter as residual, so
  * over-delivery is always safe and under-delivery cannot happen unless
  * a translation is WRONG — which is why translation is strict).
  *
  * Strictness rules, each protecting exactness:
  *   - only columns whose TABLE type is int/long/float/double/boolean/
  *     string translate (the only types manifest writers produce —
  *     [[ManifestParquet.writeConf]]), by their PHYSICAL name;
  *   - literal runtime classes must match the column type exactly
  *     (plus the lossless Int→Long widening); no coercion guessing;
  *   - NaN never translates (parquet stats have a NaN history; a
  *     skipped pushdown costs I/O, a wrong one loses rows);
  *   - a partially-translatable AND keeps the translatable side ONLY in
  *     conjunctive position (`canPartialPushDownConjuncts`, the same
  *     rule Spark's ParquetFilters applies) — inside OR/NOT a dropped
  *     conjunct would WIDEN the negated set and prune live groups;
  *   - IN translates to an eq-disjunction, bounded (20 values) so the
  *     predicate stays cheap to evaluate per row group.
  *
  * 100 TB shape: manifest-level stats/blooms prune FILES on the driver;
  * this layer prunes ROW GROUPS inside surviving files on the
  * EXECUTOR (each task reads only its own footer) — no driver-side
  * footer fan-out, the Iceberg/native-parquet division of labor. On
  * 1 GB files with ~8 row groups a selective predicate reads ~1/8th
  * of the bytes the file-level decision alone would. */
object ParquetPredicates {

  /** AND-fold of every translatable filter, None if none translate.
    * `physical` maps logical column names to the physical names stored
    * in data files (identity unless the table saw RENAME COLUMN). */
  def translate(filters: Seq[Filter], schema: StructType,
      physical: String => String): Option[FilterPredicate] =
    filters.flatMap(f => translateOne(f, schema, physical, partialOk = true))
      .reduceOption(FilterApi.and)

  private val MaxInValues = 20

  private def translateOne(f: Filter, schema: StructType,
      physical: String => String, partialOk: Boolean): Option[FilterPredicate] =
    f match {
      case And(l, r) =>
        (translateOne(l, schema, physical, partialOk),
          translateOne(r, schema, physical, partialOk)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          // one side untranslatable: the other alone is still an upper
          // bound on the match set — sound ONLY as a top-level conjunct
          case (one, other) if partialOk => one.orElse(other)
          case _ => None
        }
      case Or(l, r) =>
        // BOTH sides must translate completely — a dropped conjunct
        // inside either branch would widen that branch, and OR of a
        // widened branch can prune groups the true predicate matches
        for {
          a <- translateOne(l, schema, physical, partialOk = false)
          b <- translateOne(r, schema, physical, partialOk = false)
        } yield FilterApi.or(a, b)
      case EqualTo(c, v) => leaf(c, schema, physical, Eq, v)
      case EqualNullSafe(c, v) => leaf(c, schema, physical, Eq, v)
      case IsNull(c) => leaf(c, schema, physical, Eq, null)
      case IsNotNull(c) => leaf(c, schema, physical, NotEq, null)
      case GreaterThan(c, v) if v != null => leaf(c, schema, physical, Gt, v)
      case GreaterThanOrEqual(c, v) if v != null => leaf(c, schema, physical, GtEq, v)
      case LessThan(c, v) if v != null => leaf(c, schema, physical, Lt, v)
      case LessThanOrEqual(c, v) if v != null => leaf(c, schema, physical, LtEq, v)
      case In(c, vs) if vs.nonEmpty && vs.length <= MaxInValues &&
          !vs.contains(null) =>
        vs.toSeq.map(v => leaf(c, schema, physical, Eq, v))
          .reduce[Option[FilterPredicate]] {
            case (Some(a), Some(b)) => Some(FilterApi.or(a, b))
            case _ => None // every disjunct or none — a partial IN widens
          }
      case StringStartsWith(c, pre) if pre != null && pre.nonEmpty =>
        // LIKE 'x%' — the parquet UserDefinedPredicate shape Spark's own
        // ParquetFilters uses: a row group drops when its max sorts
        // strictly before the prefix or its min at/after the prefix's
        // byte-increment (values with prefix p live in [p, incr(p)))
        schema.fields.find(_.name == c).filter(_.dataType == StringType)
          .filterNot(_ => c.contains("."))
          .map(_ => FilterApi.userDefined(
            FilterApi.binaryColumn(physical(c)),
            new PrefixPredicate(pre.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      case _ => None // Not / other string predicates / unknown shapes:
                     // file-level pruning already covers them; stay
                     // conservative here
    }

  /** `startsWith` over a BINARY (UTF-8 string) column. Values carrying
    * prefix p occupy exactly [p, byteIncrement(p)) in unsigned byte
    * order, so group stats decide: drop when max < p, or when a byte-
    * increment exists and min >= it. `keep` serves dictionary filtering
    * (drop a group when NO dictionary value keeps). Never wrong: a
    * surviving group still passes Spark's residual LIKE. */
  private[sources] class PrefixPredicate(prefix: Array[Byte])
      extends org.apache.parquet.filter2.predicate.UserDefinedPredicate[Binary]
      with Serializable {
    private def startsWith(v: Binary): Boolean = {
      val b = v.getBytesUnsafe
      b.length >= prefix.length && java.util.Arrays.equals(
        b, 0, prefix.length, prefix, 0, prefix.length)
    }
    /** Unsigned lexicographic compare of v against the prefix bytes
      * (whole-value semantics: shorter-and-equal-so-far sorts first). */
    private def cmp(v: Binary, p: Array[Byte]): Int = {
      val b = v.getBytesUnsafe
      val c = java.util.Arrays.compareUnsigned(
        b, 0, math.min(b.length, p.length), p, 0, math.min(b.length, p.length))
      if (c != 0) c else Integer.compare(b.length, p.length)
    }
    /** Rightmost incrementable byte bumped, rest truncated — the
      * EXCLUSIVE upper bound of the prefixed interval; None when every
      * byte is 0xFF (unbounded above). */
    private val incremented: Option[Array[Byte]] = {
      val out = prefix.clone()
      var i = out.length - 1
      while (i >= 0 && out(i) == 0xFF.toByte) i -= 1
      if (i < 0) None
      else { out(i) = (out(i) + 1).toByte; Some(java.util.Arrays.copyOf(out, i + 1)) }
    }
    override def keep(v: Binary): Boolean = v != null && startsWith(v)
    override def canDrop(
        st: org.apache.parquet.filter2.predicate.Statistics[Binary]): Boolean =
      cmp(st.getMax, prefix) < 0 ||
        incremented.exists(inc => cmp(st.getMin, inc) >= 0)
    // NOT (startsWith) is never emitted by the translator; stay safe
    override def inverseCanDrop(
        st: org.apache.parquet.filter2.predicate.Statistics[Binary]): Boolean = false
  }

  private sealed trait Op
  private case object Eq extends Op
  private case object NotEq extends Op
  private case object Gt extends Op
  private case object GtEq extends Op
  private case object Lt extends Op
  private case object LtEq extends Op

  /** One comparison leaf, typed off the TABLE schema. Returns None for
    * unknown columns (metadata columns, nested refs), unsupported
    * types, or literal classes that don't match the column exactly. */
  private def leaf(c: String, schema: StructType, physical: String => String,
      op: Op, v: Any): Option[FilterPredicate] = {
    val field = schema.fields.find(_.name == c)
    if (field.isEmpty || c.contains(".")) return None
    val name = physical(c)
    field.get.dataType match {
      case IntegerType =>
        val jv: Option[java.lang.Integer] = v match {
          case null => Some(null)
          case i: Int => Some(Int.box(i))
          case i: java.lang.Integer => Some(i)
          case _ => None
        }
        jv.flatMap { x =>
          val col = FilterApi.intColumn(name)
          op match {
            case Eq => Some(FilterApi.eq(col, x))
            case NotEq => Some(FilterApi.notEq(col, x))
            case Gt => Some(FilterApi.gt(col, x))
            case GtEq => Some(FilterApi.gtEq(col, x))
            case Lt => Some(FilterApi.lt(col, x))
            case LtEq => Some(FilterApi.ltEq(col, x))
          }
        }
      case LongType =>
        val jv: Option[java.lang.Long] = v match {
          case null => Some(null)
          case l: Long => Some(Long.box(l))
          case l: java.lang.Long => Some(l)
          case i: java.lang.Integer => Some(Long.box(i.longValue())) // lossless
          case _ => None
        }
        jv.flatMap { x =>
          val col = FilterApi.longColumn(name)
          op match {
            case Eq => Some(FilterApi.eq(col, x))
            case NotEq => Some(FilterApi.notEq(col, x))
            case Gt => Some(FilterApi.gt(col, x))
            case GtEq => Some(FilterApi.gtEq(col, x))
            case Lt => Some(FilterApi.lt(col, x))
            case LtEq => Some(FilterApi.ltEq(col, x))
          }
        }
      case DoubleType =>
        val jv: Option[java.lang.Double] = v match {
          case null => Some(null)
          case d: Double if !d.isNaN => Some(Double.box(d))
          case d: java.lang.Double if !d.isNaN => Some(d)
          case _ => None
        }
        jv.flatMap { x =>
          val col = FilterApi.doubleColumn(name)
          op match {
            case Eq => Some(FilterApi.eq(col, x))
            case NotEq => Some(FilterApi.notEq(col, x))
            case Gt => Some(FilterApi.gt(col, x))
            case GtEq => Some(FilterApi.gtEq(col, x))
            case Lt => Some(FilterApi.lt(col, x))
            case LtEq => Some(FilterApi.ltEq(col, x))
          }
        }
      case FloatType =>
        val jv: Option[java.lang.Float] = v match {
          case null => Some(null)
          case fl: Float if !fl.isNaN => Some(Float.box(fl))
          case fl: java.lang.Float if !fl.isNaN => Some(fl)
          case _ => None
        }
        jv.flatMap { x =>
          val col = FilterApi.floatColumn(name)
          op match {
            case Eq => Some(FilterApi.eq(col, x))
            case NotEq => Some(FilterApi.notEq(col, x))
            case Gt => Some(FilterApi.gt(col, x))
            case GtEq => Some(FilterApi.gtEq(col, x))
            case Lt => Some(FilterApi.lt(col, x))
            case LtEq => Some(FilterApi.ltEq(col, x))
          }
        }
      case BooleanType =>
        val jv: Option[java.lang.Boolean] = v match {
          case null => Some(null)
          case b: Boolean => Some(Boolean.box(b))
          case b: java.lang.Boolean => Some(b)
          case _ => None
        }
        jv.flatMap { x =>
          val col = FilterApi.booleanColumn(name)
          op match {
            case Eq => Some(FilterApi.eq(col, x))
            case NotEq => Some(FilterApi.notEq(col, x))
            case _ => None // no ordering on booleans
          }
        }
      case StringType =>
        val jv: Option[Binary] = v match {
          case null => Some(null)
          case s: String => Some(Binary.fromString(s))
          case _ => None
        }
        jv.flatMap { x =>
          val col = FilterApi.binaryColumn(name)
          op match {
            case Eq => Some(FilterApi.eq(col, x))
            case NotEq => Some(FilterApi.notEq(col, x))
            case Gt => Some(FilterApi.gt(col, x))
            case GtEq => Some(FilterApi.gtEq(col, x))
            case Lt => Some(FilterApi.lt(col, x))
            case LtEq => Some(FilterApi.ltEq(col, x))
          }
        }
      case _ => None
    }
  }
}
