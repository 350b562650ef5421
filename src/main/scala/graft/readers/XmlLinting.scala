package graft.readers

import javax.xml.XMLConstants
import javax.xml.transform.stream.StreamSource
import javax.xml.validation.SchemaFactory

/** XSD validation of a submitted XML document before parsing
  * (ref: core_engine/readers/xml_linting.py — the reference shells out to
  * xmllint; the JVM ships a validator, so no external process is needed).
  * Returns every validation problem rather than failing on the first, so
  * the caller can report them all as file-level messages.
  */
object XmlLinting {

  final case class XmlProblem(line: Int, column: Int, message: String)

  /** Validate `xmlPath` against `xsdPath`; returns all problems (empty =
    * valid). Malformed XML surfaces as a single problem at the failure
    * position.
    */
  def validate(xmlPath: String, xsdPath: String): Seq[XmlProblem] = {
    val problems = Seq.newBuilder[XmlProblem]
    try {
      val factory = SchemaFactory.newInstance(XMLConstants.W3C_XML_SCHEMA_NS_URI)
      // no external entity / schema fetching — submitted files are untrusted
      factory.setProperty(XMLConstants.ACCESS_EXTERNAL_DTD, "")
      factory.setProperty(XMLConstants.ACCESS_EXTERNAL_SCHEMA, "")
      val schema = factory.newSchema(new StreamSource(new java.io.File(xsdPath)))
      val validator = schema.newValidator()
      validator.setErrorHandler(new org.xml.sax.ErrorHandler {
        private def add(e: org.xml.sax.SAXParseException): Unit =
          problems += XmlProblem(e.getLineNumber, e.getColumnNumber, e.getMessage)
        override def warning(e: org.xml.sax.SAXParseException): Unit = add(e)
        override def error(e: org.xml.sax.SAXParseException): Unit = add(e)
        override def fatalError(e: org.xml.sax.SAXParseException): Unit = add(e)
      })
      validator.validate(new StreamSource(new java.io.File(xmlPath)))
    } catch {
      case e: org.xml.sax.SAXParseException =>
        problems += XmlProblem(e.getLineNumber, e.getColumnNumber, e.getMessage)
      case e: Exception =>
        problems += XmlProblem(0, 0, Option(e.getMessage).getOrElse(e.getClass.getName))
    }
    problems.result()
  }

  def isValid(xmlPath: String, xsdPath: String): Boolean =
    validate(xmlPath, xsdPath).isEmpty
}
