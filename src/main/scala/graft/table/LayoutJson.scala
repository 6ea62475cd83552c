package graft.table

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Loader for layout-JSON table declarations — the reference's primary
  * schema-declaration surface (`kiji-mapreduce/src/test/resources/org/kiji/
  * mapreduce/layout/test.json`; parsed by the layout Avro records the
  * reference feeds to `KijiTableLayout`).
  *
  * The dialect is relaxed JSON: unquoted field names, single-quoted
  * strings, and block comments (the reference files carry a license
  * header) — Jackson's non-strict reader features cover all three.
  *
  * Mapping into [[TableLayout]]:
  *  - `keys_format.encoding` → [[EntityId.Encoding]]; `hash_size` is in
  *    BYTES of MD5, so HASH_PREFIX(hash_size) → `HashPrefix(2·hash_size)`
  *    hex chars (test.json:22's `hash_size: 2` = 4 hex chars).
  *  - each `locality_groups[]` entry contributes its `max_versions`,
  *    `ttl_seconds`, `in_memory`, `compression_type` to every family it
  *    contains (families inherit group policy, as in the reference);
  *    `ttl_seconds >= Int.MaxValue` means "forever" → no TTL.
  *  - map-schema families (dynamic qualifiers) need no special casing:
  *    the long cell format stores dynamic qualifiers natively.
  */
object LayoutJson {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES, true)
    m.configure(JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
    m.configure(JsonParser.Feature.ALLOW_COMMENTS, true)
    m
  }

  def parse(json: String): TableLayout = {
    val root = mapper.readTree(json)
    val name = text(root, "name").getOrElse(
      throw new IllegalArgumentException("layout JSON missing 'name'"))
    val encoding = Option(root.get("keys_format")).map(keysFormat)
      .getOrElse(EntityId.Raw)
    val families = Option(root.get("locality_groups")).toSeq
      .flatMap(_.elements().asScala)
      .flatMap { lg =>
        val lgName = text(lg, "name").getOrElse("default")
        val maxV = longField(lg, "max_versions")
          .map(v => math.min(v, Int.MaxValue.toLong).toInt)
          .getOrElse(Int.MaxValue)
        val ttl = longField(lg, "ttl_seconds").filter(_ < Int.MaxValue.toLong)
        val inMem = Option(lg.get("in_memory")).exists(_.asBoolean(false))
        val comp = text(lg, "compression_type").map(compression)
          .getOrElse("snappy")
        Option(lg.get("families")).toSeq.flatMap(_.elements().asScala).map { f =>
          val famName = text(f, "name").getOrElse(
            throw new IllegalArgumentException("family missing 'name'"))
          // A declared `columns` list makes the family GROUP-type (closed
          // qualifier set, enforced on writes); `map_schema` families and
          // families with no columns stay MAP-type (open). A malformed
          // column entry is an error — silently dropping it would silently
          // drop the enforcement the layout author declared.
          val cols = Option(f.get("columns"))
            .map(_.elements().asScala.toSeq.map(c =>
              text(c, "name").getOrElse(throw new IllegalArgumentException(
                s"column entry in family '$famName' missing 'name'"))))
            .filter(_.nonEmpty)
          FamilySpec(
            name = famName,
            maxVersions = maxV, ttlSeconds = ttl, localityGroup = lgName,
            inMemory = inMem, compression = comp, columns = cols)
        }
      }
    TableLayout(name, families, encoding)
  }

  def parseFile(path: String): TableLayout =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  private def keysFormat(kf: JsonNode): EntityId.Encoding =
    text(kf, "encoding").map(_.toUpperCase) match {
      case Some("RAW") | None => EntityId.Raw
      case Some("FORMATTED") => EntityId.Formatted
      case Some("HASH") => EntityId.Hashed
      case Some("HASH_PREFIX") =>
        EntityId.HashPrefix(
          2 * longField(kf, "hash_size").getOrElse(2L).toInt)
      case Some(other) =>
        throw new IllegalArgumentException(s"unknown key encoding '$other'")
    }

  /** Reference compression enums → parquet codec names. */
  private def compression(c: String): String = c.toUpperCase match {
    case "NONE" => "none"
    case "GZ" | "GZIP" => "gzip"
    case "SNAPPY" => "snappy"
    case "LZO" => "lzo"
    case other => other.toLowerCase
  }

  private def text(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText)
  private def longField(n: JsonNode, field: String): Option[Long] =
    Option(n.get(field)).filter(_.isNumber).map(_.asLong)
}
