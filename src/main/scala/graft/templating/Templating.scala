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

  private def resolve(token: String, vars: Map[String, Any]): Option[Any] =
    if ((token.startsWith("'") && token.endsWith("'")) ||
        (token.startsWith("\"") && token.endsWith("\"")))
      Some(token.substring(1, token.length - 1))
    else vars.get(token)

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
        value.map(v => ChronoUnit.DAYS.between(LocalDate.now(), parseDate(v)).toString)
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
