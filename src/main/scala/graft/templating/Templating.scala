package graft.templating

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** Minimal `{{ var | filter }}` template renderer for rule/filter config
  * strings, covering the constructs observed in the reference corpus
  * (ref: core_engine/templating.py:44-114 — custom filters `add_months`,
  * `add_years`, `days_until`; `default`, `upper`, `lower`; upfront strategy).
  * This renders config text before execution — it is config-time work, never
  * per-row.
  */
object Templating {

  private val Iso = DateTimeFormatter.ISO_LOCAL_DATE

  /** Clock for `days_until` — wall-clock by default (matches the reference's
    * semantics, ref: templating.py:78-87) but injectable so tests and
    * correctness oracles can pin it.
    */
  @volatile var clock: java.time.Clock = java.time.Clock.systemDefaultZone()
  private def today(): LocalDate = LocalDate.now(clock)

  private val varPattern =
    """\{\{\s*([^{}|]+?)\s*(\|\s*[^{}]+?)?\s*\}\}""".r

  /** Render a template against the given variables. Unknown variables without
    * a `default` filter raise.
    */
  def render(template: String, vars: Map[String, Any]): String =
    varPattern.replaceAllIn(template, m => {
      val base = m.group(1).trim
      val filters = Option(m.group(2))
        .map(_.split('|').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val initial: Option[Any] = resolve(base, vars)
      val result = filters.foldLeft(initial)((acc, f) => applyFilter(acc, f, vars))
      val value = result.getOrElse(
        throw new NoSuchElementException(s"undefined template variable: '$base'"))
      java.util.regex.Matcher.quoteReplacement(stringify(value))
    })

  /** Render every string in a step-config tree (object form used by callers
    * that template whole rule definitions upfront).
    */
  def renderAll(templates: Seq[String], vars: Map[String, Any]): Seq[String] =
    templates.map(render(_, vars))

  /** Lenient render: unresolved placeholders stay as literal text instead of
    * raising — used when templating whole rule configs with global/local
    * variables while per-record `{{field}}` message placeholders must
    * survive to notify time (ref: base/rules.py:572-584 templates rules
    * upfront; spark/rules.py:409-411 renders messages per record).
    */
  def renderLenient(template: String, vars: Map[String, Any]): String =
    varPattern.replaceAllIn(template, m => {
      val base = m.group(1).trim
      val filters = Option(m.group(2))
        .map(_.split('|').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val result =
        try filters.foldLeft(resolve(base, vars))((acc, f) => applyFilter(acc, f, vars))
        catch { case _: IllegalArgumentException => None } // unknown filter -> leave as-is
      java.util.regex.Matcher.quoteReplacement(
        result.map(stringify).getOrElse(m.matched))
    })

  private def resolve(token: String, vars: Map[String, Any]): Option[Any] =
    evalExpr(token, vars)

  /** Tiny expression evaluator for the jinja subset observed in reference
    * rule stores (ref: tests/testdata/planets/planet_ruleset.json):
    * `a or b`, `'lit' + var`, `(expr).upper()`, `repr(x)`, quoted literals.
    */
  private[templating] def evalExpr(expr0: String, vars: Map[String, Any]): Option[Any] = {
    val s = expr0.trim
    // or-chain: first defined (and non-empty) operand wins
    val orParts = splitTopLevel(s, " or ")
    if (orParts.length > 1)
      return orParts.iterator.map(p => evalExpr(p, vars))
        .collectFirst { case Some(v) if stringify(v).nonEmpty => v }
    // concatenation
    val plusParts = splitTopLevel(s, "+")
    if (plusParts.length > 1) {
      val vals = plusParts.map(p => evalExpr(p, vars))
      return if (vals.forall(_.isDefined)) Some(vals.flatten.map(stringify).mkString) else None
    }
    // postfix .upper() / .lower()
    if (s.endsWith(".upper()")) return evalExpr(s.dropRight(8), vars).map(v => stringify(v).toUpperCase)
    if (s.endsWith(".lower()")) return evalExpr(s.dropRight(8), vars).map(v => stringify(v).toLowerCase)
    if (s.startsWith("(") && s.endsWith(")") && balanced(s.substring(1, s.length - 1)))
      return evalExpr(s.substring(1, s.length - 1), vars)
    if (s.startsWith("repr(") && s.endsWith(")"))
      return evalExpr(s.substring(5, s.length - 1), vars).map(v => "'" + stringify(v) + "'")
    if ((s.startsWith("'") && s.endsWith("'")) || (s.startsWith("\"") && s.endsWith("\"")))
      return Some(s.substring(1, s.length - 1))
    vars.get(s)
  }

  private def balanced(s: String): Boolean = {
    var depth = 0
    s.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth < 0) return false }
    }
    depth == 0
  }

  /** Split on a separator at paren/quote depth zero. */
  private def splitTopLevel(s: String, sep: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var quote: Char = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else if (c == '\'' || c == '"') { quote = c; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && s.regionMatches(i, sep, 0, sep.length)) {
        out += s.substring(start, i); start = i + sep.length; i += sep.length
      } else i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private val callPattern = """([a-z_]+)\s*\(\s*(.*?)\s*\)""".r

  private def applyFilter(value: Option[Any], filter: String, vars: Map[String, Any]): Option[Any] =
    filter match {
      case callPattern("default", arg) =>
        value.orElse(resolve(arg, vars).orElse(Some(unquote(arg))))
      case callPattern("add_months", arg) =>
        value.map(v => Iso.format(parseDate(v).plusMonths(arg.trim.toLong)))
      case callPattern("add_years", arg) =>
        value.map(v => Iso.format(parseDate(v).plusYears(arg.trim.toLong)))
      case "days_until" | callPattern("days_until", _) =>
        value.map(v => ChronoUnit.DAYS.between(today(), parseDate(v)).toString)
      case "upper" => value.map(v => stringify(v).toUpperCase)
      case "lower" => value.map(v => stringify(v).toLowerCase)
      case "repr"  => value.map(v => "'" + stringify(v) + "'")
      case other   => throw new IllegalArgumentException(s"unknown template filter: '$other'")
    }

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("'") && t.endsWith("'")) || (t.startsWith("\"") && t.endsWith("\"")))
      t.substring(1, t.length - 1)
    else t
  }

  private def parseDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case s: String    => LocalDate.parse(s.trim, Iso)
    case other        => LocalDate.parse(stringify(other), Iso)
  }

  private def stringify(v: Any): String = v match {
    case d: Double if d == d.floor && !d.isInfinite => d.toLong.toString
    case other                                      => other.toString
  }
}
