package graft.ga

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Parser for the reference connector's `filters=` / `segment=` string
  * mini-language (the GA Core Reporting v3 syntax SURVEY.md §2.2 [P]
  * encodes), compiled to a Catalyst `Column` predicate:
  *
  * {{{
  *   expression := orGroup (';' orGroup)*      ';' = AND
  *   orGroup    := clause (',' clause)*        ',' = OR (binds tighter)
  *   clause     := name operator value
  *   operator   := ==  !=  >=  <=  >  <  =@  !@  =~  !~
  * }}}
  *
  * `=@`/`!@` are contains / not-contains, `=~`/`!~` are regex
  * match / not-match (partial match, like `rlike`). `\;` `\,` `\\`
  * escape literal separators inside values. Dimension names resolve
  * through `resolve` (default: strip the "ga:" prefix and treat the
  * rest as a column of the events frame).
  *
  * Values always splice as STRING literals: Spark's comparison
  * coercion turns them numeric against numeric columns (GA metric
  * semantics) and leaves exact string comparison against string
  * dimensions — the same dual behavior the reference API applies by
  * knowing which names are metrics.
  */
object GaFilters {

  val DefaultResolve: String => Column = n => col(n.stripPrefix("ga:"))

  /** Compile a GA `filters=` expression to one Column predicate. */
  def parse(filters: String,
      resolve: String => Column = DefaultResolve): Column = {
    require(filters.trim.nonEmpty, "empty GA filter expression")
    splitUnescaped(filters, ';').map { group =>
      splitUnescaped(group, ',').map(clause(_, resolve)).reduce(_ || _)
    }.reduce(_ && _)
  }

  /** Compile a GA `segment=` dynamic-segment string. Returns the
    * scope ("users" or "sessions") and the compiled condition. */
  def parseSegment(segment: String,
      resolve: String => Column = DefaultResolve): (String, Column) = {
    val UserP = "users::condition::"
    val SessP = "sessions::condition::"
    if (segment.startsWith(UserP))
      ("users", parse(segment.substring(UserP.length), resolve))
    else if (segment.startsWith(SessP))
      ("sessions", parse(segment.substring(SessP.length), resolve))
    else throw new IllegalArgumentException(
      s"unsupported segment '$segment': expected " +
        "users::condition::<filters> or sessions::condition::<filters>")
  }

  // two-char operators first so '>=' never parses as '>' + '=value'
  private val Ops = Seq("==", "!=", ">=", "<=", "=@", "!@", "=~", "!~",
    ">", "<")

  private def clause(s: String, resolve: String => Column): Column = {
    var i = 0
    while (i < s.length) {
      Ops.find(op => s.startsWith(op, i)) match {
        case Some(op) =>
          val name = s.substring(0, i).trim
          require(name.nonEmpty, s"GA filter clause '$s' has no dimension name")
          val value = unescape(s.substring(i + op.length))
          return compare(resolve(name), op, value)
        case None => i += 1
      }
    }
    throw new IllegalArgumentException(
      s"GA filter clause '$s' has no operator (one of ${Ops.mkString(" ")})")
  }

  private def compare(c: Column, op: String, v: String): Column = op match {
    case "==" => c === lit(v)
    case "!=" => c =!= lit(v)
    case ">=" => c >= lit(v)
    case "<=" => c <= lit(v)
    case ">"  => c > lit(v)
    case "<"  => c < lit(v)
    case "=@" => c.contains(lit(v))
    case "!@" => !c.contains(lit(v))
    case "=~" => c.rlike(v)
    case "!~" => !c.rlike(v)
  }

  /** Split on an unescaped separator; '\' escapes the following char
    * (kept verbatim here, decoded later by `unescape`). */
  private def splitUnescaped(s: String, sep: Char): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\\' && i + 1 < s.length) {
        cur.append(ch).append(s.charAt(i + 1)); i += 2
      } else if (ch == sep) {
        parts += cur.result(); cur.clear(); i += 1
      } else {
        cur.append(ch); i += 1
      }
    }
    parts += cur.result()
    parts.toSeq
  }

  private def unescape(v: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < v.length) {
      val ch = v.charAt(i)
      // the mini-language only escapes its own metacharacters (; , \);
      // any other backslash pair — e.g. the \d of a =~ regex — must
      // pass through untouched
      if (ch == '\\' && i + 1 < v.length &&
          (v.charAt(i + 1) == ';' || v.charAt(i + 1) == ',' ||
            v.charAt(i + 1) == '\\')) {
        out.append(v.charAt(i + 1)); i += 2
      } else {
        out.append(ch); i += 1
      }
    }
    out.result()
  }
}
