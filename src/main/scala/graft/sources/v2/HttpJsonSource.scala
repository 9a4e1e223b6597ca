package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for JSON-array HTTP endpoints (the reference's
  * S1 ingest surface — reference dags/etl.py:36-45 — as a first-class Spark
  * table instead of a driver-side fetch):
  *
  * {{{
  * spark.read.format("graft-http-json")
  *   .schema(Donki.flrSchema)                       // explicit, always
  *   .option("urls", "https://api/a,https://api/b") // one partition each
  *   .load()
  * }}}
  *
  * Design points:
  *  - one InputPartition per URL → fetches run ON EXECUTORS in parallel
  *    (the driver-side graft.sources.HttpJson remains the right tool for a
  *    single small payload; this is the fan-out path for many endpoints /
  *    paginated APIs).
  *  - column pruning is pushed into the reader (SupportsPushDownRequiredColumns):
  *    a `select(a, b)` parses only those fields out of the JSON.
  *  - explicit schema required — inferSchema throws. Missing keys → null,
  *    like the reference's `flare.get(...)` (T2).
  *  - `file:` URLs are served from the local filesystem so the whole path
  *    is testable offline; http(s) fetches reuse HttpJson's retry policy.
  *  - no Spark-internal parser APIs: a ~60-line Jackson→InternalRow
  *    converter covers the supported types (string/int/long/double/boolean,
  *    arrays, nested structs).
  */
class HttpJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http-json"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-http-json requires an explicit schema (.schema(...)); " +
        "inference is disallowed by design (deterministic ingest)")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpJsonTable(schema, properties.asScala.toMap)
}

class HttpJsonTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-http-json(${props.getOrElse("urls", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpJsonScanBuilder(tableSchema, options)
}

class HttpJsonScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val urls = Option(options.get("urls")).getOrElse(throw new IllegalArgumentException(
      "graft-http-json: option 'urls' is required (comma-separated)"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(urls.nonEmpty, "graft-http-json: at least one url")
    val retries = Option(options.get("retries")).map(_.toInt).getOrElse(3)
    new HttpJsonScan(required, urls, retries)
  }
}

case class HttpJsonInputPartition(url: String) extends InputPartition

class HttpJsonScan(required: StructType, urls: Array[String], retries: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    urls.map(u => HttpJsonInputPartition(u): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new HttpJsonReaderFactory(required, retries)
  override def description(): String =
    s"graft-http-json [${urls.length} urls, schema=${required.simpleString}]"
}

class HttpJsonReaderFactory(required: StructType, retries: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HttpJsonPartitionReader(
      partition.asInstanceOf[HttpJsonInputPartition].url, required, retries)
}

class HttpJsonPartitionReader(url: String, required: StructType, retries: Int)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val body = HttpJsonRows.fetch(url, retries)
    HttpJsonRows.parse(body, required)
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Executor-side fetch + JSON→InternalRow conversion (serializable-free:
  * all static). */
object HttpJsonRows {

  // ObjectMapper.readTree is thread-safe after configuration; one shared
  // instance serves every partition reader in the executor JVM
  private val mapper = new ObjectMapper()

  /** Parse JSON-Lines input (one object per line; blank lines skipped) —
    * the read side of the `graft-jsonl` sink. Same conversion contract as
    * [[parse]]: missing keys and JSON nulls → null. */
  def parseLines(lines: Iterator[String], schema: StructType): Iterator[InternalRow] =
    lines.filter(_.trim.nonEmpty).map(l => convertStruct(mapper.readTree(l), schema))

  def fetch(url: String, retries: Int): String =
    if (url.startsWith("file:")) {
      val p = java.nio.file.Paths.get(java.net.URI.create(url))
      new String(java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
    } else {
      graft.sources.HttpJson
        .fetchWithRetry(() => graft.sources.HttpJson.fetchUrl(url), retries)
        .get
    }

  /** Parse a JSON body — an array of objects, or a single object — into
    * rows of `schema`. Missing keys and JSON nulls → null. */
  def parse(body: String, schema: StructType): Iterator[InternalRow] = {
    val root = mapper.readTree(body)
    // Jackson 2.10+: readTree("") returns MissingNode and readTree("null")
    // returns NullNode (never java null) — both must mean zero rows, not
    // one phantom all-null record
    val objs: Iterator[JsonNode] =
      if (root == null || root.isMissingNode || root.isNull) Iterator.empty
      else if (root.isArray) root.elements().asScala
      else Iterator.single(root)
    objs.map(o => convertStruct(o, schema))
  }

  private def convertStruct(node: JsonNode, schema: StructType): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val child = node.get(f.name)
      vals(i) = if (child == null || child.isNull) null else convert(child, f.dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  // Type-mismatched values yield null (PERMISSIVE posture, matching the
  // missing-key contract) — never Jackson's silent coercion, which would
  // fabricate plausible-looking data: asInt truncates 3.7 to 3, a text
  // node's elements() iterates empty (array-izing scalars), a scalar where
  // a struct is expected would become an all-null struct. Each case guards
  // on the node's actual JSON type first.
  private def convert(node: JsonNode, dt: DataType): Any = dt match {
    case StringType  => UTF8String.fromString(
      if (node.isTextual) node.asText() else node.toString)
    case IntegerType => if (node.isIntegralNumber && node.canConvertToInt) node.asInt() else null
    case LongType    => if (node.isIntegralNumber && node.canConvertToLong) node.asLong() else null
    case DoubleType  => if (node.isNumber) node.asDouble() else null
    case BooleanType => if (node.isBoolean) node.asBoolean() else null
    case ArrayType(et, _) =>
      if (!node.isArray) null
      else new GenericArrayData(node.elements().asScala.map(e =>
        if (e == null || e.isNull) null else convert(e, et)).toArray): ArrayData
    case st: StructType => if (node.isObject) convertStruct(node, st) else null
    case other => throw new IllegalArgumentException(
      s"graft-http-json: unsupported type $other (parse raw strings and cast in the plan)")
  }
}
