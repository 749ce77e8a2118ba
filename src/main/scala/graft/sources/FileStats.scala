package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file column statistics recorded in [[GraftTable]] commit
  * add-actions (Delta's `stats` field): row count and, for the first
  * [[FileStats.MaxCols]] skippable leaf columns, min / max / null
  * count — read from the parquet FOOTER at stage time (an O(files)
  * metadata pass, no data pages), serialized as one compact JSON
  * token per add line, and evaluated against predicates during log
  * resolution so a selective read plans strictly fewer files before
  * any footer is opened at scan time.
  *
  * Skippable types: integral (incl. date as epoch days, timestamp as
  * epoch micros — both compare numerically against their Catalyst
  * literals), float/double, and UTF-8 strings up to
  * [[FileStats.MaxStrLen]] chars (longer values drop that column's
  * stats for the file rather than truncate — truncation would need
  * Delta's prefix-max semantics to stay sound). Decimals, nested and
  * binary columns record no stats. Everything is CONSERVATIVE: a
  * column or file without stats is never pruned, and the evaluator
  * answers "may match" — pruning is an optimization, the predicate
  * is always re-applied by the read.
  *
  * JSON shape: `{"n":1234,"c":{"col":{"lo":…,"hi":…,"nu":0},…}}`.
  */
object FileStats {

  val MaxCols = 32
  val MaxStrLen = 96

  private val mapper = new ObjectMapper()

  /** Footer → stats JSON for one staged file. None when the footer
    * yields nothing usable (every column unskippable) — the add line
    * then simply carries no stats token.
    */
  def fromFooter(p: Path, conf: Configuration): Option[String] =
    try {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = r.getFooter.getBlocks
        var n = 0L
        // col -> (lo, hi, nulls); value None once a block invalidates
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[String, Option[(Any, Any, Long)]]
        import scala.jdk.CollectionConverters._
        blocks.asScala.foreach { b =>
          n += b.getRowCount
          b.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            if (!name.contains('.')) { // top-level leaves only
              val cur = acc.get(name)
              if (!cur.contains(None)) {
                val next = blockStats(c)
                acc(name) = (cur.flatten, next) match {
                  case (_, None) => None // this block unusable -> drop col
                  case (None, Some(x)) if cur.isEmpty => Some(x)
                  case (None, _) => None
                  case (Some((lo, hi, nu)), Some((lo2, hi2, nu2))) =>
                    Some((minOf(lo, lo2), maxOf(hi, hi2), nu + nu2))
                }
              }
            } else acc(name) = None
          }
        }
        val cols = acc.toSeq.collect { case (k, Some(v)) => (k, v) }
          .take(MaxCols)
        val root = mapper.createObjectNode()
        root.put("n", n)
        if (cols.nonEmpty) {
          val c = root.putObject("c")
          cols.foreach { case (name, (lo, hi, nu)) =>
            val o = c.putObject(name)
            putVal(o, "lo", lo); putVal(o, "hi", hi); o.put("nu", nu)
          }
        }
        Some(mapper.writeValueAsString(root))
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One column chunk's (min, max, nulls), normalized to
    * Long / Double / String — or None if unusable for skipping.
    */
  private def blockStats(c: org.apache.parquet.hadoop.metadata
      .ColumnChunkMetaData): Option[(Any, Any, Long)] = {
    val st = c.getStatistics
    if (st == null || !st.isNumNullsSet) return None
    val pt = c.getPrimitiveType
    val logical = pt.getLogicalTypeAnnotation
    if (logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation])
      return None
    if (!st.hasNonNullValue) {
      // all-null chunk: min/max undefined but nulls are known — an
      // all-null FILE still stats as (no lo/hi). Treat as unusable
      // for range pruning but keep via the null count only when the
      // whole file is null — simpler: drop (conservative).
      return None
    }
    def num(v: Any): Option[Any] = v match {
      case i: java.lang.Integer => Some(i.longValue: Long)
      case l: java.lang.Long    => Some(l.longValue: Long)
      case f: java.lang.Float   => Some(f.doubleValue: Double)
      case d: java.lang.Double  => Some(d.doubleValue: Double)
      case _ => None
    }
    val pair: Option[(Any, Any)] = pt.getPrimitiveTypeName match {
      case INT32 | INT64 | FLOAT | DOUBLE =>
        for (lo <- num(st.genericGetMin); hi <- num(st.genericGetMax))
          yield (lo, hi)
      case BINARY
          if logical.isInstanceOf[
            LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        val lo = st.genericGetMin
          .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
        val hi = st.genericGetMax
          .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
        if (lo.length <= MaxStrLen && hi.length <= MaxStrLen) Some((lo, hi))
        else None
      case _ => None
    }
    pair.map { case (lo, hi) => (lo, hi, st.getNumNulls) }
  }

  /** Unsigned UTF-8 byte order — the order parquet computes binary
    * string min/max in. Java `String.compareTo` (UTF-16 code units)
    * DIVERGES from it for supplementary-plane characters (U+10000+,
    * whose surrogate pairs sort below U+E000..U+FFFF in UTF-16 but
    * above in UTF-8), so comparing a logged parquet min/max with a
    * query literal in UTF-16 order could prune a file that actually
    * contains a matching string. All stats comparisons use this.
    */
  private[sources] def utf8Cmp(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long)     => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double)   => Some(BigDecimal(x).compare(BigDecimal(y)))
    case (x: Double, y: Long)   => Some(BigDecimal(x).compare(BigDecimal(y)))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(utf8Cmp(x, y))
    case _ => None
  }
  private def minOf(a: Any, b: Any): Any =
    if (cmp(a, b).exists(_ <= 0)) a else b
  private def maxOf(a: Any, b: Any): Any =
    if (cmp(a, b).exists(_ >= 0)) a else b

  private def putVal(o: ObjectNode, k: String, v: Any): Unit = v match {
    case l: Long   => o.put(k, l); ()
    case d: Double => o.put(k, d); ()
    case s: String => o.put(k, s); ()
    case _ => ()
  }

  // ---- bloom index ----------------------------------------------------

  /** Fold per-file BLOOM FILTERS into an existing stats token (the
    * `bf` object per column: `{"v":<base64 spark-sketch>,"t":"long"|
    * "string"}`). Values were inserted as `xxhash64(cast(col as
    * long))` / `xxhash64(col)` for strings — Spark's own runtime-
    * filter encoding — so the evaluator probes with the identically-
    * hashed literal. The bloom is CAPPED (numBits is a table
    * property): past its design cardinality the false-positive rate
    * decays toward 1 and the file simply stops being prunable —
    * degradation, never unsoundness.
    */
  def withBlooms(statsJson: String,
                 blooms: Map[String, (String, String)]): String =
    try {
      val root = mapper.readTree(statsJson).asInstanceOf[ObjectNode]
      val c = Option(root.get("c")).collect { case o: ObjectNode => o }
        .getOrElse(root.putObject("c"))
      blooms.foreach { case (col, (b64, typ)) =>
        val o = Option(c.get(col)).collect { case x: ObjectNode => x }
          .getOrElse(c.putObject(col))
        val bf = o.putObject("bf")
        bf.put("v", b64); bf.put("t", typ)
      }
      mapper.writeValueAsString(root)
    } catch { case scala.util.control.NonFatal(_) => statsJson }

  /** May a file whose column bloom is `(b64, typ)` contain `v`?
    * Deserializes the spark-sketch bloom and probes with the same
    * xxhash64 encoding the build side used. TRUE on any mismatch or
    * decode failure — pruning stays conservative.
    */
  private def bloomMayContain(bloom: (String, String), v: Any): Boolean =
    try {
      val lit = (bloom._2, v) match {
        case ("long", l: Long) => Some(Literal(l, LongType))
        case ("string", s: String) => Some(Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType))
        case _ => None
      }
      lit.forall { l =>
        val h = XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(bloom._1)))
          .mightContainLong(h)
      }
    } catch { case scala.util.control.NonFatal(_) => true }

  // ---- evaluation -----------------------------------------------------

  private case class Col(lo: Option[Any], hi: Option[Any],
                         nulls: Option[Long],
                         bloom: Option[(String, String)] = None)
  private case class Parsed(n: Long, cols: Map[String, Col])

  private def node(j: JsonNode): Option[Any] =
    if (j == null || j.isNull) None
    else if (j.isIntegralNumber) Some(j.asLong: Long)
    else if (j.isNumber) Some(j.asDouble: Double)
    else if (j.isTextual) Some(j.asText)
    else None

  private def parse(json: String): Option[Parsed] =
    try {
      val r = mapper.readTree(json)
      val cols = Option(r.get("c")).map { c =>
        val b = Map.newBuilder[String, Col]
        c.fields().forEachRemaining { e =>
          val bf = Option(e.getValue.get("bf")).flatMap { o =>
            (Option(o.get("v")).filter(_.isTextual),
              Option(o.get("t")).filter(_.isTextual)) match {
              case (Some(v), Some(t)) => Some((v.asText, t.asText))
              case _ => None
            }
          }
          b += e.getKey -> Col(node(e.getValue.get("lo")),
            node(e.getValue.get("hi")),
            Option(e.getValue.get("nu")).filter(_.isNumber).map(_.asLong),
            bf)
        }
        b.result()
      }.getOrElse(Map.empty)
      Some(Parsed(r.get("n").asLong, cols))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** A Catalyst literal's skip-comparable value: numerics as Long /
    * Double (dates as epoch days, timestamps as epoch micros — the
    * same encoding the footer stats use), strings as String. None =
    * incomparable, never prune on it.
    */
  private def litVal(l: Literal): Option[Any] = (l.value, l.dataType) match {
    case (null, _) => None
    case (v: Byte, _)  => Some(v.toLong)
    case (v: Short, _) => Some(v.toLong)
    case (v: Int, _)   => Some(v.toLong) // incl. DateType epoch days
    case (v: Long, _)  => Some(v)        // incl. TimestampType micros
    case (v: Float, _) => Some(v.toDouble)
    case (v: Double, _) => Some(v)
    case (v, _: StringType) => Some(v.toString)
    case _ => None
  }

  private def attrOf(e: Expression): Option[String] = e match {
    case UnresolvedAttribute(parts) if parts.size == 1 => Some(parts.head)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** The row count recorded in a stats token (None if unparsable). */
  def numRows(statsJson: String): Option[Long] = parse(statsJson).map(_.n)

  /** May rows in a file with stats `statsJson` match `pred`? TRUE on
    * any uncertainty (missing stats, incomparable types, unsupported
    * operators) — skipping must never drop a matching file.
    */
  def mayMatch(statsJson: Option[String], pred: Expression): Boolean =
    statsJson.flatMap(parse) match {
      case None => true
      case Some(p) => eval(p, norm(pred))
    }

  /** The ColumnNode converter leaves comparison operators as
    * name-keyed `UnresolvedFunction`s ("and", "<=", "=", …); rewrite
    * the supported ones into their typed Catalyst nodes so the
    * evaluator pattern-matches one shape. Unknown names stay opaque
    * (→ never pruned).
    */
  private def norm(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val as = f.arguments.map(norm)
      (f.nameParts.last.toLowerCase(java.util.Locale.ROOT), as) match {
        case ("and", Seq(l, r))  => And(l, r)
        case ("or", Seq(l, r))   => Or(l, r)
        case ("<=", Seq(l, r))   => LessThanOrEqual(l, r)
        case ("<", Seq(l, r))    => LessThan(l, r)
        case (">", Seq(l, r))    => GreaterThan(l, r)
        case (">=", Seq(l, r))   => GreaterThanOrEqual(l, r)
        case ("=" | "==", Seq(l, r)) => EqualTo(l, r)
        case ("<=>", Seq(l, r))  => EqualNullSafe(l, r)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case ("isnull", Seq(l))  => IsNull(l)
        case ("isnotnull", Seq(l)) => IsNotNull(l)
        case ("startswith", Seq(l, r)) => StartsWith(l, r)
        case _ => f
      }
    case other => other.mapChildren(norm)
  }

  private def eval(p: Parsed, e: Expression): Boolean = e match {
    case And(l, r) => eval(p, l) && eval(p, r)
    case Or(l, r)  => eval(p, l) || eval(p, r)
    case EqualTo(a, l: Literal) => // ∃row = v ⟸ lo ≤ v ≤ hi ∧ bloom(v)
      test(p, a, l, (c, v) => Some(
        c.lo.flatMap(lo => cmp(lo, v)).forall(_ <= 0) &&
          c.hi.flatMap(hi => cmp(hi, v)).forall(_ >= 0) &&
          c.bloom.forall(bloomMayContain(_, v))))
    case EqualTo(l: Literal, a) => eval(p, EqualTo(a, l))
    case EqualNullSafe(a, l: Literal) if l.value != null =>
      eval(p, EqualTo(a, l))
    case GreaterThan(a, l: Literal) => // ∃row > v ⟸ hi > v
      test(p, a, l, (c, v) => c.hi.flatMap(h => cmp(h, v)).map(_ > 0))
    case GreaterThan(l: Literal, a) => eval(p, LessThan(a, l))
    case GreaterThanOrEqual(a, l: Literal) =>
      test(p, a, l, (c, v) => c.hi.flatMap(h => cmp(h, v)).map(_ >= 0))
    case GreaterThanOrEqual(l: Literal, a) => eval(p, LessThanOrEqual(a, l))
    case LessThan(a, l: Literal) =>
      test(p, a, l, (c, v) => c.lo.flatMap(lo => cmp(lo, v)).map(_ < 0))
    case LessThan(l: Literal, a) => eval(p, GreaterThan(a, l))
    case LessThanOrEqual(a, l: Literal) =>
      test(p, a, l, (c, v) => c.lo.flatMap(lo => cmp(lo, v)).map(_ <= 0))
    case LessThanOrEqual(l: Literal, a) => eval(p, GreaterThanOrEqual(a, l))
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => eval(p, EqualTo(a, v.asInstanceOf[Literal])))
    case IsNull(a) => attrOf(a).flatMap(p.cols.get) match {
      case Some(c) => c.nulls.forall(_ > 0)
      case None => true
    }
    case IsNotNull(a) => attrOf(a).flatMap(p.cols.get) match {
      // stats carry lo/hi only when a non-null value exists
      case Some(c) => c.nulls.forall(_ < p.n) || c.lo.isDefined
      case None => true
    }
    case StartsWith(a, l: Literal) =>
      // strings with prefix q live in [q, q⁺): file [lo,hi] intersects
      // iff hi ≥ q and lo's first |q| BYTES ≤ q — all in unsigned
      // UTF-8 byte order, matching how parquet computed lo/hi
      attrOf(a).flatMap(p.cols.get) match {
        case Some(Col(Some(lo: String), Some(hi: String), _, _)) =>
          val qb = String.valueOf(l.value)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val lob = lo.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          def byteCmp(x: Array[Byte], y: Array[Byte]): Int = {
            var i = 0; val n = math.min(x.length, y.length)
            while (i < n) {
              val d = (x(i) & 0xff) - (y(i) & 0xff)
              if (d != 0) return d
              i += 1
            }
            x.length - y.length
          }
          utf8Cmp(hi, String.valueOf(l.value)) >= 0 &&
            byteCmp(lob.take(qb.length), qb) <= 0
        case _ => true
      }
    case _ => true // unsupported shape: never prune
  }

  private def test(p: Parsed, a: Expression, l: Literal,
                   f: (Col, Any) => Option[Boolean]): Boolean =
    (attrOf(a).flatMap(p.cols.get), litVal(l)) match {
      case (Some(c), Some(v)) => f(c, v).getOrElse(true)
      case _ => true
    }

}
