package graft.source

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S2/P4 — the reference's paginated SRI list scan as a DataSource V2.
  *
  * Reference behavior being reproduced (not ported):
  *  - page-by-page scan following `$$meta.next` (client.js:1485-1522) —
  *    here each page is one `InputPartition`, so Spark parallelizes what
  *    the reference pipelines sequentially;
  *  - envelope normalization `{results:[{href,$$expanded}]}` | plain array
  *    | href-only (utils.js:149-169) — inside the partition reader;
  *  - predicate pushdown `modifiedSince=`/`$$meta.deleted` into the source
  *    (client.js:1677-1703) — via SupportsPushDownFilters: accepted
  *    filters on `modified_ms` / `resourcetype` are applied at page-parse
  *    time (and, for an HTTP transport, folded into the request URL);
  *  - projection pushdown `expand=NONE` (hrefs only) — via
  *    SupportsPushDownRequiredColumns.
  *
  * Transport is pluggable: `pages` option points at a directory of JSON
  * page files (deterministic, testable); an HTTP transport implements the
  * same PageStore contract against a live API.
  *
  * Usage: spark.read.format("sri").option("pages", dir).load()
  */
class SriSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "sri"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SriSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SriTable(properties.get("pages"),
      HttpPageStore.parseHeaders(properties.get("api.headers")))
}

object SriSource {
  val schema: StructType = StructType(Seq(
    StructField("href", StringType),
    StructField("key", StringType),
    StructField("modified_ms", LongType),
    StructField("jsondata", StringType),
    StructField("resourcetype", StringType)))
}

/** Page listing + fetch contract (the transport seam). */
trait PageStore extends Serializable {
  def listPages(): Seq[String]
  def fetch(page: String): String
  /** Body still resident from enumeration (e.g. an HTTP next-link walk
    * downloads each page to find the next link and keeps a byte-bounded
    * LRU of recent bodies). Returned bodies are embedded in their own
    * InputPartition so those executors don't re-fetch — each partition
    * carries only ITS page, and the store must NOT retain the whole
    * corpus to answer this (see HttpPageStore's driver-memory bound). */
  def cachedBody(page: String): Option[String] = None
}

final class LocalDirPageStore(dir: String) extends PageStore {
  override def listPages(): Seq[String] = {
    val fs = new java.io.File(dir).listFiles()
    if (fs == null) Seq.empty
    else fs.filter(_.getName.endsWith(".json")).map(_.getAbsolutePath)
      .sorted.toSeq
  }
  override def fetch(page: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(page)),
      java.nio.charset.StandardCharsets.UTF_8)
}

class SriTable(pagesDir: String,
               apiHeaders: Map[String, String] = Map.empty)
    extends Table with SupportsRead {
  override def name(): String = s"sri($pagesDir)"
  override def schema(): StructType = SriSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // transport selection: a directory of page files, or a live SRI API
    val store: PageStore =
      if (pagesDir != null && (pagesDir.startsWith("http://") ||
          pagesDir.startsWith("https://")))
        new HttpPageStore(pagesDir, headers = apiHeaders)
      else new LocalDirPageStore(pagesDir)
    new SriScanBuilder(store)
  }
  /** Test hook: the headers threaded from the `api.headers` option. */
  def headers: Map[String, String] = apiHeaders
}

class SriScanBuilder(store: PageStore) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushedMinModified: Option[Long] = None
  private var pushedDeletedOnly = false
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = SriSource.schema

  /** P4: accept `modified_ms >[=] X` (the modifiedSince watermark) and
    * `resourcetype = 'deleted'` (the tombstone pass); everything else
    * stays a post-scan filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("modified_ms", _: java.lang.Long) => true
      case GreaterThan("modified_ms", _: java.lang.Long) => true
      case EqualTo("resourcetype", "deleted") => true
      case _ => false
    }
    // multiple accepted bounds conjoin: keep the MAX (they were all
    // removed from post-scan evaluation, so last-wins would return rows
    // the query excludes)
    def tighten(v: Long): Unit =
      pushedMinModified = Some(pushedMinModified.fold(v)(math.max(_, v)))
    accepted.foreach {
      case GreaterThanOrEqual("modified_ms", v: java.lang.Long) =>
        tighten(v.longValue)
      case GreaterThan("modified_ms", v: java.lang.Long) =>
        tighten(v.longValue + 1)
      case EqualTo("resourcetype", "deleted") => pushedDeletedOnly = true
      case _ =>
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** expand=NONE analog: only parse/materialize requested columns. */
  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = StructType(
      SriSource.schema.fields.filter(f => required.fieldNames.contains(f.name)))
  }

  override def build(): Scan = new SriScan(store, requiredSchema,
    pushedMinModified, pushedDeletedOnly)
}

class SriScan(store: PageStore, required: StructType,
              minModified: Option[Long], deletedOnly: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SriScan PushedFilters: [minModified=$minModified, " +
      s"deletedOnly=$deletedOnly], ReadSchema: ${required.simpleString}"

  /** One partition per page — the Spark-native answer to the reference's
    * sequential next-link walk + prefetch: all pages read concurrently.
    * Bodies the store already downloaded while enumerating ride along in
    * their partition (no second fetch). */
  override def planInputPartitions(): Array[InputPartition] =
    store.listPages()
      .map(p => SriInputPartition(p, store.cachedBody(p)): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SriReaderFactory(store, required.fieldNames, minModified, deletedOnly)
}

case class SriInputPartition(page: String, body: Option[String] = None)
  extends InputPartition

class SriReaderFactory(store: PageStore, columns: Array[String],
                       minModified: Option[Long], deletedOnly: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SriInputPartition]
    new SriPageReader(store, part.page, part.body, columns, minModified,
      deletedOnly)
  }
}

/** Parses one page (envelope or plain array), normalizes to rows, applies
  * pushed predicates at parse time. */
class SriPageReader(store: PageStore, page: String, body: Option[String],
                    columns: Array[String],
                    minModified: Option[Long], deletedOnly: Boolean)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val iter: Iterator[InternalRow] = {
    val root = mapper.readTree(body.getOrElse(store.fetch(page)))
    val results =
      if (root.isArray) root
      else if (root.has("results")) root.get("results")
      else mapper.createArrayNode()
    val rows = scala.collection.mutable.ArrayBuffer[InternalRow]()
    results.elements().forEachRemaining { r =>
      // envelope normalization: {href,$$expanded} | bare resource | href-only
      val (href, res) =
        if (r.has("$$expanded")) (r.get("href").asText(), r.get("$$expanded"))
        else if (r.isTextual) (r.asText(), null)
        else if (r.has("href") && r.size() == 1) (r.get("href").asText(), null)
        else (r.path("$$meta").path("permalink").asText(), r)
      val meta = if (res == null) null else res.path("$$meta")
      val modified =
        if (meta == null || meta.path("modified").isMissingNode) null
        else java.lang.Long.valueOf(
          java.time.Instant.parse(meta.path("modified").asText()).toEpochMilli)
      val deleted = meta != null && meta.path("deleted").asBoolean(false)
      val rtype =
        if (deleted) "deleted"
        else if (meta == null) null else meta.path("type").asText(null)
      val keep =
        (minModified.isEmpty || (modified != null &&
          modified.longValue >= minModified.get)) &&
        (!deletedOnly || rtype == "deleted")
      if (keep) {
        val key =
          if (res != null && res.has("key")) res.get("key").asText()
          else href.substring(href.lastIndexOf('/') + 1)
        val all = Map[String, Any](
          "href" -> UTF8String.fromString(href),
          "key" -> UTF8String.fromString(key),
          "modified_ms" -> modified,
          "jsondata" ->
            (if (res == null) null
             else UTF8String.fromString(mapper.writeValueAsString(res))),
          "resourcetype" ->
            (if (rtype == null) null else UTF8String.fromString(rtype)))
        rows += InternalRow.fromSeq(columns.toSeq.map(all(_)))
      }
    }
    rows.iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (iter.hasNext) { current = iter.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
