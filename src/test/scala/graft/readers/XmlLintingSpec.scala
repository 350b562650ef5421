package graft.readers

import org.scalatest.funsuite.AnyFunSuite

class XmlLintingSpec extends AnyFunSuite {

  private def tmp(name: String, content: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_xsd_")
    val f = d.resolve(name)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  private val xsd = tmp("people.xsd",
    """<?xml version="1.0"?>
      |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      |  <xs:element name="people">
      |    <xs:complexType><xs:sequence>
      |      <xs:element name="person" maxOccurs="unbounded">
      |        <xs:complexType><xs:sequence>
      |          <xs:element name="id" type="xs:integer"/>
      |          <xs:element name="name" type="xs:string"/>
      |        </xs:sequence></xs:complexType>
      |      </xs:element>
      |    </xs:sequence></xs:complexType>
      |  </xs:element>
      |</xs:schema>""".stripMargin)

  test("valid document passes") {
    val xml = tmp("ok.xml",
      "<people><person><id>1</id><name>ada</name></person></people>")
    assert(XmlLinting.isValid(xml, xsd))
  }

  test("schema violations are all collected with positions") {
    val xml = tmp("bad.xml",
      "<people><person><id>oops</id><name>ada</name></person>" +
        "<person><nope>x</nope></person></people>")
    val problems = XmlLinting.validate(xml, xsd)
    assert(problems.size >= 2)
    assert(problems.forall(_.line > 0))
  }

  test("malformed XML surfaces as a problem, not an exception") {
    val xml = tmp("broken.xml", "<people><person>")
    assert(XmlLinting.validate(xml, xsd).nonEmpty)
  }
}
