package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.serve.Json
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for export-page archives: `spark.read
  * .format("graft-export").load(dir)` reads a directory of page-JSON files
  * and yields *canonical highlight rows* — the S1→S2→S4 pipeline
  * (pagination transport → flatten → parse) as a native Spark source.
  *
  * Scale posture: one input partition per page file (pages are the API's
  * natural chunk; a 1000-executor cluster parses pages in parallel with no
  * shuffle), and `SupportsPushDownRequiredColumns` so column pruning
  * reaches JSON parsing — pruned fields are never materialized.
  */
class ExportDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-export"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExportDataSource.highlightSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ExportTable(properties.get("path"))
}

object ExportOptions {
  /** Read option: only page files whose NAME sorts strictly above this
    * value are scanned — the batch-read form of the micro-batch stream's
    * name watermark. A sync run appending to a REUSED spool directory
    * passes the pre-existing high name here so it parses only its own
    * pages (pages from prior runs were already upserted under their own
    * version; re-reading them under a fresh version would let stale
    * content tie with — or beat — the store's newer copy). */
  val StartAfter = "startafter"
}

object ExportDataSource {
  /** Canonical highlight schema (SURVEY.md §1.4 drift resolution). */
  val highlightSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("text", StringType),
    StructField("source_type", StringType),
    StructField("source_author", StringType),
    StructField("source_title", StringType),
    StructField("source_url", StringType),
    StructField("category", StringType),
    StructField("note", StringType),
    StructField("location", IntegerType),
    StructField("highlighted_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("tags", ArrayType(StringType))))

  private[sources] def parseTimestampMicros(s: String): Any =
    try {
      if (s == null) null
      else {
        // the reference parses with datetime.fromisoformat
        // (jobs/parser.py:7-16), which accepts a space separator and
        // date-only strings — normalize those forms so this parser agrees
        // with both the reference and the Ingest path's try_to_timestamp
        val t =
          if (s.length > 10 && s.charAt(10) == ' ')
            s.substring(0, 10) + "T" + s.substring(11)
          else s
        // offset-aware first (handles Z and ±hh:mm, either sign); naive
        // timestamps are interpreted as UTC — matching try_to_timestamp
        // under the engine's UTC session timezone
        val i =
          try java.time.OffsetDateTime.parse(t).toInstant
          catch {
            case _: Exception =>
              try java.time.LocalDateTime.parse(t)
                .toInstant(java.time.ZoneOffset.UTC)
              catch {
                case _: Exception => java.time.LocalDate.parse(t)
                  .atStartOfDay().toInstant(java.time.ZoneOffset.UTC)
              }
          }
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      }
    } catch { case _: Exception => null } // null-on-error (jobs/parser.py:7-16)
}

final class ExportTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-export:$path"
  override def schema(): StructType = ExportDataSource.highlightSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExportScanBuilder(path,
      Option(options.get(ExportOptions.StartAfter)).filter(_.nonEmpty))
}

final class ExportScanBuilder(path: String, startAfter: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ExportDataSource.highlightSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ExportScan(path, required, startAfter)
}

final case class PageFilePartition(file: String) extends InputPartition

/** Hadoop `Configuration` is not `Serializable`; this carries the DRIVER's
  * configuration (including `spark.hadoop.*` overrides like object-store
  * credentials) to executor-side [[PageReader]]s via Hadoop's own
  * Writable serialization — a bare `new Configuration()` on the executor
  * would only see whatever site files happen to be on its classpath. */
final class SerializableHadoopConf(@transient var value:
    org.apache.hadoop.conf.Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

final class ExportScan(path: String, required: StructType,
    startAfter: Option[String] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ExportScan.listPages(path, startAfter)
      .map(p => PageFilePartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ExportReaderFactory(required, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ExportMicroBatchStream(path, required)
}

object ExportScan {
  /** Page files in filename order (the transport writes them in cursor
    * order, so filename order IS page order). Listed through the Hadoop
    * FileSystem API so the landing zone can be any cluster URI
    * (`hdfs://…`, `s3a://…`) — plain local paths resolve against the
    * default FS. Runs on the driver at planning time. */
  def listPages(path: String, startAfter: Option[String] = None): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .filter(p => startAfter.forall(p.getName > _))
      .sortBy(_.getName)
      .map(_.toString)
  }
}

/** Streaming form: tail the pages directory. The offset is the
  * lexicographically-largest file name processed (a name watermark), and a
  * micro-batch covers files in `(startName, endName]` — so a file is never
  * read twice regardless of when listings race, and progress is exact
  * under the landing-zone contract: files are written atomically
  * (temp + rename) with MONOTONICALLY-SORTING names (zero-padded sequence
  * or timestamp prefixes). A contract-violating file that sorts below the
  * watermark is skipped, never duplicated — the same trade Spark's file
  * source makes when its seen-map ages out. */
final case class PageOffset(lastName: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = Json.write(Map("lastName" -> lastName))
}

final class ExportMicroBatchStream(path: String, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def nameOf(p: String): String =
    new org.apache.hadoop.fs.Path(p).getName

  override def latestOffset(): Offset = {
    val names = ExportScan.listPages(path).map(nameOf)
    PageOffset(if (names.isEmpty) "" else names.max)
  }
  override def initialOffset(): Offset = PageOffset("")
  override def deserializeOffset(json: String): Offset = {
    val node = new ObjectMapper().readTree(json)
    PageOffset(node.get("lastName").asText())
  }
  override def commit(end: Offset): Unit = () // files are immutable; no-op
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[PageOffset].lastName
    val to = end.asInstanceOf[PageOffset].lastName
    ExportScan.listPages(path)
      .filter(p => nameOf(p) > from && nameOf(p) <= to)
      .map(p => PageFilePartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ExportReaderFactory(required, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

final class ExportReaderFactory(required: StructType,
    conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PageFilePartition].file, required,
      conf)
}

/** Parses one page file: iterate results[*].highlights[*], project only the
  * required columns into InternalRows. Runs on an EXECUTOR: the page is
  * opened through the Hadoop FileSystem API (default `Configuration` —
  * cluster nodes resolve `hdfs://`/`s3a://` from their classpath config,
  * local mode resolves plain paths against the local FS). */
final class PageReader(file: String, required: StructType,
    conf: SerializableHadoopConf) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val rows: Iterator[InternalRow] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf.value)
    val body = scala.util.Using.resource(fs.open(p)) { in =>
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    }
    val page = mapper.readTree(body)
    val books = Option(page.get("results"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    books.iterator.flatMap { book =>
      Option(book.get("highlights"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .iterator.map(h => toRow(book, h))
    }
  }

  private def str(n: JsonNode, field: String): Any = {
    val v = n.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  private def toRow(book: JsonNode, h: JsonNode): InternalRow = {
    val values = required.fields.map { f =>
      f.name match {
        case "id" => str(h, "id")
        case "text" => str(h, "text")
        case "source_type" =>
          Option(str(book, "category")).getOrElse(UTF8String.fromString("article"))
        case "source_author" => str(book, "author")
        case "source_title" => str(book, "title")
        case "source_url" =>
          Option(str(h, "url")).orElse(Option(str(book, "source_url"))).orNull
        case "category" => str(book, "category")
        case "note" => str(h, "note")
        case "location" =>
          val v = h.get("location")
          if (v == null || v.isNull) null else Int.box(v.asInt())
        case "highlighted_at" =>
          val v = h.get("highlighted_at")
          if (v == null || v.isNull) null
          else ExportDataSource.parseTimestampMicros(v.asText())
        case "updated_at" =>
          val v = h.get("updated_at")
          if (v == null || v.isNull) null
          else ExportDataSource.parseTimestampMicros(v.asText())
        case "tags" =>
          val v = h.get("tags")
          if (v == null || v.isNull) null
          // element-per-entry with null for a missing/null name — identical
          // to the Ingest path's transform(tags, t -> t.getField("name"))
          else new GenericArrayData(v.elements().asScala.toArray.map { t =>
            val n = t.get("name")
            if (n == null || n.isNull) null
            else UTF8String.fromString(n.asText()): Any
          })
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
