package graft.kvstore

import scala.xml.XML

/** XML store-binding files — the `XmlKeyValueStoreParser` analog
  * (`KM/kvstore/impl/XmlKeyValueStoreParser.java`; fixture
  * `test-kvstores.xml`): operators declare store *names*, deployments bind
  * them to concrete stores in XML, and programmatic `withStore` calls
  * override both (the reference's code-default → XML → builder chain,
  * `KM/framework/MapReduceJobBuilder.java:540-545`).
  *
  * Format (element and attribute names mirror the reference):
  * {{{
  * <stores>
  *   <store name="emails" class="text">
  *     <configuration>
  *       <property><name>path</name><value>/data/emails.tsv</value></property>
  *       <property><name>delimiter</name><value>,</value></property>
  *     </configuration>
  *   </store>
  * </stores>
  * }}}
  * Classes: `text`, `seq`, `avro` (keys `path`, `keyField`, `valueField`),
  * `avrokv` (fixed key/value fields), `empty`, `unconfigured`.
  */
object XmlStoreBindings {

  def parse(xml: String): Map[String, KeyValueStore[String, String]] =
    (XML.loadString(xml) \ "store").map { st =>
      val name = (st \@ "name")
      require(name.nonEmpty, "store element missing name attribute")
      val props = (st \ "configuration" \ "property").map { p =>
        (p \ "name").text.trim -> (p \ "value").text
      }.toMap
      def prop(k: String): String = props.getOrElse(k,
        throw new IllegalArgumentException(s"store '$name': missing property '$k'"))
      val store: KeyValueStore[String, String] = (st \@ "class") match {
        case "text" =>
          TextFileKeyValueStore(prop("path"), props.getOrElse("delimiter", "\t"))
        case "seq" => SeqFileKeyValueStore(prop("path"))
        case "avro" =>
          AvroRecordKeyValueStore(prop("path"), prop("keyField"), prop("valueField"))
        case "avrokv" => AvroKVRecordKeyValueStore(prop("path"))
        case "empty" => EmptyKeyValueStore[String, String]()
        case "unconfigured" => UnconfiguredKeyValueStore[String, String]()
        case other =>
          throw new IllegalArgumentException(s"store '$name': unknown class '$other'")
      }
      name -> store
    }.toMap

  def parseFile(path: String): Map[String, KeyValueStore[String, String]] =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
