package graft.contract

/** Declared (not inferred) schema for one field of an entity, mirroring the
  * reference's `FieldSpecification` (ref: metadata_parser/models.py:131-165):
  * exactly one of a named scalar/domain type, or nested `fields` (a struct),
  * optionally wrapped in an array; plus constraint kwargs from the
  * constrained-type factories (ref: metadata_parser/model_generator.py:63-80).
  */
final case class FieldSpec(
    name: String,
    typeName: String = "str",  // str,int,float,bool,date,datetime,decimal,time,
                               // nhsnumber,postcode,orgid,alphanumeric,identifier
    mandatory: Boolean = false,
    isArray: Boolean = false,
    fields: Seq[FieldSpec] = Nil, // non-empty => nested struct ("model" form)
    format: Option[String] = None, // strptime-style date/datetime/time format
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    regex: Option[String] = None,
    ge: Option[BigDecimal] = None,
    le: Option[BigDecimal] = None,
    gt: Option[BigDecimal] = None,
    lt: Option[BigDecimal] = None,
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    default: Option[String] = None, // applied when the raw value is blank
    functions: Seq[FieldFunction] = Nil, // per-field validation functions (§2.8.3)
    timezoneTreatment: Option[String] = None, // formatteddatetime: forbid|permit|require
    // permissivenhsno only: emit test-number warnings despite the permissive
    // type (ref: domain_types.py:168-174 permissive_nhs_number's
    // warn_on_test_numbers kwarg — the plain nhsnumber type always warns).
    warnOnTestNumbers: Option[Boolean] = None
)

/** A per-field validation/normalisation function attachment
  * (ref: metadata_parser/models.py:52-93 ValidationFunctionSpecification).
  */
final case class FieldFunction(
    name: String, // normalise | exclude_word | split | static_key
    errorType: String = "record_rejection", // record_rejection | file_rejection | warning
    kwargs: Map[String, String] = Map.empty
)

/** Per-(field, category) message override for contract errors
  * (ref: core_engine/message.py:35-73 DataContractErrorDetail): replaces the
  * error code, failure level, informational flag, message text (a
  * `{{variable}}` template over the record's raw values, with
  * `{{__error_value}}` bound to the offending value) and reporting entity.
  */
final case class ErrorDetail(
    errorCode: String,
    errorLevel: String = "record", // FailureType: record | submission | integrity
    isInformational: Boolean = false,
    errorMessage: Option[String] = None,
    reportingEntity: Option[String] = None)

final case class EntitySpec(
    name: String,
    fields: Seq[FieldSpec],
    aliases: Map[String, String] = Map.empty, // field name -> accepted alias
    keyField: Option[String] = None,
    /** field -> error category -> override (ref: message.py:243-279). */
    errorDetails: Map[String, Map[String, ErrorDetail]] = Map.empty
)

object FieldSpec {

  /** strptime directive -> Java datetime pattern
    * (ref: spark_helpers.py:103-116 `python_to_java_datetime_format`).
    */
  def strptimeToJava(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%y", "yy")
      .replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%I", "hh").replace("%p", "a")
      .replace("%M", "mm").replace("%S", "ss").replace("%f", "SSSSSS")
      .replace("%z", "XX").replace("%%", "%")

  /** strptime directive -> validation regex
    * (ref: spark_helpers.py:291-295 `datetime_format_to_regex`).
    */
  def strptimeToRegex(fmt: String): String = {
    val escaped = java.util.regex.Pattern.quote(fmt)
    // quote() wraps in \Q...\E; directives must be spliced out of the quoting
    def un(directive: String, regex: String): String => String =
      s => s.replace(directive, "\\E" + regex + "\\Q")
    val repl = Seq(
      un("%Y", "\\d{4}"), un("%y", "\\d{2}"), un("%m", "\\d{2}"),
      un("%d", "\\d{2}"), un("%H", "\\d{2}"), un("%I", "\\d{2}"),
      un("%p", "(AM|PM|am|pm)"), un("%M", "\\d{2}"), un("%S", "\\d{2}"),
      un("%f", "\\d{1,6}"), un("%z", "[+-]\\d{2}:?\\d{2}"))
    "^" + repl.foldLeft(escaped)((acc, f) => f(acc)) + "$"
  }
}
