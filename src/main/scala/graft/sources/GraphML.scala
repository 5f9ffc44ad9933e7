package graft.sources

import java.io.{BufferedWriter, FileWriter}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** GraphML source/sink (SURVEY S5/S11) for contact networks: vertices
  * carry `block` / `caid` / `home_ageb`-style string attributes, edges
  * are undirected pairs (/root/reference/scripts/NetworkBuilder.py:449-465,
  * /root/reference/scripts/MakeEmpiricNetworks.py:108-126).
  *
  * Graphs at this stage are scaled-down (≤ ~10⁴ nodes after the
  * population scaler), so driver-side StAX IO matches the reference's
  * networkx usage; vertices/edges travel as DataFrames either side.
  */
object GraphML {

  private val vertexSchema = StructType(Seq(
    StructField("node_id", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType), nullable = true)))

  private val edgeSchema = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false)))

  /** Write (vertices, edges) as GraphML. Vertex attrs become
    * <data key=...> entries; keys are declared from the union of
    * attribute names.
    */
  def write(vertices: DataFrame, edges: DataFrame, path: String): Unit = {
    val vs = vertices.collect()
    val es = edges.collect()
    val attrKeys = vs.flatMap { r =>
      Option(r.getAs[Map[String, String]]("attrs")).map(_.keys).getOrElse(Nil)
    }.distinct.sorted
    val w = new BufferedWriter(new FileWriter(path))
    try {
      w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.newLine()
      w.write("""<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""")
      w.newLine()
      attrKeys.foreach { k =>
        val ek = xmlEscape(k)
        w.write(s"""  <key id="$ek" for="node" attr.name="$ek" attr.type="string"/>""")
        w.newLine()
      }
      w.write("""  <graph edgedefault="undirected">""")
      w.newLine()
      vs.foreach { r =>
        val id = xmlEscape(r.getAs[String]("node_id"))
        val attrs = Option(r.getAs[Map[String, String]]("attrs")).getOrElse(Map.empty)
        if (attrs.isEmpty) w.write(s"""    <node id="$id"/>""")
        else {
          w.write(s"""    <node id="$id">""")
          w.newLine()
          attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
            w.write(s"""      <data key="${xmlEscape(k)}">${xmlEscape(v)}</data>""")
            w.newLine()
          }
          w.write("    </node>")
        }
        w.newLine()
      }
      es.foreach { r =>
        w.write(s"""    <edge source="${xmlEscape(r.getAs[String]("src"))}" target="${xmlEscape(r.getAs[String]("dst"))}"/>""")
        w.newLine()
      }
      w.write("  </graph>")
      w.newLine()
      w.write("</graphml>")
      w.newLine()
    } finally w.close()
  }

  /** Read GraphML into (vertices, edges) DataFrames. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val f = XMLInputFactory.newInstance()
    val in = new java.io.FileInputStream(path)
    val r = f.createXMLStreamReader(in)
    val vertices = Seq.newBuilder[Row]
    val edges = Seq.newBuilder[Row]
    var curNode: String = null
    var curKey: String = null
    var curAttrs = Map.empty[String, String]
    val text = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "node" =>
                curNode = r.getAttributeValue(null, "id")
                curAttrs = Map.empty
              case "data" if curNode != null =>
                curKey = r.getAttributeValue(null, "key")
                text.clear()
              case "edge" =>
                edges += Row(r.getAttributeValue(null, "source"),
                  r.getAttributeValue(null, "target"))
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if curKey != null =>
            // foreign writers may emit <data><![CDATA[...]]></data>;
            // dropping CDATA would silently load empty attr values
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "data" if curKey != null =>
                curAttrs += (curKey -> text.toString)
                curKey = null
              case "node" if curNode != null =>
                vertices += Row(curNode, curAttrs)
                curNode = null
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally { r.close(); in.close() }
    import scala.jdk.CollectionConverters._
    (spark.createDataFrame(vertices.result().asJava, vertexSchema),
      spark.createDataFrame(edges.result().asJava, edgeSchema))
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
