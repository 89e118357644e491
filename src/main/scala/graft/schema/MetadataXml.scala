package graft.schema

import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory

import scala.collection.mutable.ArrayBuffer

import org.w3c.dom.Element

import graft.model.{EntityMeta, FieldMeta, NavMeta}

/** OData `$metadata` (EDMX) → per-entity schema documents — the engine's
  * version of the reference's xmltodict walk over
  * edmx:Edmx→DataServices→Schema→EntityType
  * (resources/priorityDataSource.py:347-458), including composite keys and
  * per-property descriptions. Pure driver-side catalog bootstrap; the
  * result feeds `EdmTypes.toStructType` / `EdmTypes.ddl`.
  */
object MetadataXml {

  def parse(xml: String, sourceSystem: String): Seq[EntityMeta] = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    dbf.setExpandEntityReferences(false)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))

    val entities = ArrayBuffer.empty[EntityMeta]
    val types = doc.getElementsByTagName("EntityType")
    for (i <- 0 until types.getLength) {
      val et = types.item(i).asInstanceOf[Element]
      val name = et.getAttribute("Name")

      val keyRefs = ArrayBuffer.empty[String]
      val keys = et.getElementsByTagName("PropertyRef")
      for (k <- 0 until keys.getLength)
        keyRefs += keys.item(k).asInstanceOf[Element].getAttribute("Name")

      val fields = ArrayBuffer.empty[FieldMeta]
      val props = et.getElementsByTagName("Property")
      for (p <- 0 until props.getLength) {
        val prop = props.item(p).asInstanceOf[Element]
        val pname = prop.getAttribute("Name")
        // per-property description annotation, tolerated when absent
        // (reference: priorityDataSource.py:409-412)
        val desc = {
          val anns = prop.getElementsByTagName("Annotation")
          (0 until anns.getLength)
            .map(a => anns.item(a).asInstanceOf[Element])
            .find(_.getAttribute("Term").endsWith("Description"))
            .map(_.getAttribute("String")).getOrElse("")
        }
        def intAttr(a: String): Option[Int] =
          Option(prop.getAttribute(a)).filter(_.nonEmpty).map(_.toInt)
        fields += FieldMeta(pname, prop.getAttribute("Type"),
          keyFlag = keyRefs.contains(pname), desc = desc,
          // OData v4 default: a Property without Nullable is nullable
          nullable = prop.getAttribute("Nullable") != "false",
          precision = intAttr("Precision"), scale = intAttr("Scale"))
      }

      // NavigationProperty → nested subform relation; Type is
      // "Collection(Namespace.Target)" — keep the simple target name
      val navs = ArrayBuffer.empty[NavMeta]
      val navEls = et.getElementsByTagName("NavigationProperty")
      for (n <- 0 until navEls.getLength) {
        val nav = navEls.item(n).asInstanceOf[Element]
        val target = nav.getAttribute("Type")
          .stripPrefix("Collection(").stripSuffix(")")
          .split('.').last
        navs += NavMeta(nav.getAttribute("Name"), target)
      }
      entities += EntityMeta(name, sourceSystem, fields.toSeq, keyRefs.toSeq,
        navs.toSeq)
    }
    entities.toSeq
  }
}
