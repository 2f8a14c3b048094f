package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the synthesized pages corpus: `spark.read
  * .format("graft.sources.PagesDataSource").option("path", sfDir).load()`
  * yields the BASELINE.json input_hint table
  * `pages(url, warc_ts, html, text, lang)` — the S1 "folder scan -> table"
  * row as a first-class Spark connector instead of a Dataset map.
  *
  * Scale design:
  *  - planInputPartitions = one partition per PARQUET ROW GROUP of the seed
  *    table (the natural split unit; at 100 TB this is the same granularity
  *    Spark's own parquet source plans by), SUB-SLICED into row ranges of
  *    `sliceRows` (default 256, an `option`): each synthesized page is
  *    ~50x its seed row's bytes plus the downstream kernel cost, so a
  *    whole seed row group is far more work than its byte size suggests —
  *    without slicing, a small corpus plans 1 partition and extraction
  *    runs single-threaded (round 4; the analog of shrinking
  *    maxPartitionBytes for compute-amplified scans).
  *  - SupportsPushDownRequiredColumns is honored for real: when neither
  *    `html` nor `text` is required, the reader skips synthesizing the page
  *    body entirely (url/warc_ts/lang are pure id functions) — a
  *    column-pruning win Spark's optimizer gets to exploit through the
  *    standard V2 pruning API (visible in the scan description).
  *  - Readers use parquet-mr directly against the seed row group; no
  *    driver-side state beyond the footer read at planning time.
  */
class PagesDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesDataSource.pagesSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagesTable(properties.get("path"),
      Option(properties.get("sliceRows")).map(_.toInt)
        .getOrElse(PagesDataSource.defaultSliceRows))
  override def supportsExternalMetadata(): Boolean = false
}

/** Java-serializable Hadoop Configuration carrier (the class itself is
  * not Serializable; Spark's own wrapper is private[spark]) — lets the
  * readers see the SESSION'S filesystem settings (s3a credentials,
  * hdfs nameservices, spark.hadoop.*) instead of empty defaults
  * (round-5 review: `new Configuration()` only works on a default local
  * filesystem). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object PagesDataSource {
  /** Seed rows per input partition (see class scaladoc: page synthesis +
    * kernel cost amplify each seed row, so splits must be much finer than
    * row groups for the extraction stage to parallelize). */
  val defaultSliceRows: Int = 256

  /** Upper bound on slices per row group: a slice reader must decode its
    * group from row 0 (parquet-mr record readers cannot seek), so S slices
    * re-decode ~S/2 x the group's rows. Capping S bounds that
    * amplification at a constant — and the re-decode touches only the
    * PROJECTED seed columns (doc_id, lang[, text]), not the full file
    * schema (round-5 review). */
  val maxSlicesPerGroup: Int = 64

  val pagesSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  def seedPath(sfDir: String): String =
    if (sfDir.endsWith(".parquet")) sfDir else s"$sfDir/documents.parquet"
}

final class PagesTable(sfDir: String, sliceRows: Int = PagesDataSource.defaultSliceRows)
    extends Table with SupportsRead {
  require(sfDir != null && sfDir.nonEmpty, "graft-pages source needs option(\"path\", sfDir)")
  override def name(): String = s"graft_pages($sfDir)"
  override def schema(): StructType = PagesDataSource.pagesSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(sfDir, options.getInt("sliceRows", sliceRows))
}

final class PagesScanBuilder(sfDir: String, sliceRows: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PagesDataSource.pagesSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep source field order; empty projections (count(*)) keep url
    val names = requiredSchema.fieldNames.toSet
    val pruned = StructType(PagesDataSource.pagesSchema.filter(f => names.contains(f.name)))
    required = if (pruned.isEmpty) StructType(PagesDataSource.pagesSchema.take(1)) else pruned
  }

  /** Filters on `lang` (known from the seed row) and `url` (a pure id
    * function) are accepted and evaluated in the reader BEFORE page-body
    * synthesis — the V2 analog of parquet row-group filtering: a
    * lang-restricted or domain-restricted read never pays for the bodies
    * it drops. Everything else is left for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    val (sup, unsup) = filters.partition {
      case EqualTo("lang", _: String)                          => true
      case In("lang", vs) if vs.forall(_.isInstanceOf[String]) => true
      case IsNotNull("lang") | IsNotNull("url")                => true
      case StringStartsWith("url", _)                          => true
      case StringContains("url", _)                            => true
      case _                                                   => false
    }
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new PagesScan(sfDir, required, pushed, sliceRows)
}

final class PagesScan(sfDir: String, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    sliceRows: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftPagesScan(seed=${PagesDataSource.seedPath(sfDir)}, " +
      s"required=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushed.mkString(", ")}])"

  // the SESSION's Hadoop conf (captured at scan build on the driver):
  // credentials/endpoints for non-local filesystems ride to the readers
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def planInputPartitions(): Array[InputPartition] = {
    val path = PagesDataSource.seedPath(sfDir)
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), hadoopConf.value)
    val reader = ParquetFileReader.open(in, ParquetReadOptions.builder().build())
    try {
      val groups = reader.getRowGroups
      (0 until groups.size()).flatMap { i =>
        val rows = groups.get(i).getRowCount
        val nSlices = math.min(PagesDataSource.maxSlicesPerGroup.toLong,
          math.max(1L, (rows + sliceRows - 1) / sliceRows)).toInt
        val per = (rows + nSlices - 1) / nSlices
        (0 until nSlices).map(s =>
          PagesInputPartition(path, i, s.toLong * per,
            math.min(rows, (s + 1).toLong * per)): InputPartition)
      }.toArray
    } finally reader.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory(required.fieldNames, pushed, hadoopConf)
}

/** One slice = rows [rowFrom, rowUntil) of row group `rowGroup`. */
final case class PagesInputPartition(seedPath: String, rowGroup: Int,
    rowFrom: Long, rowUntil: Long) extends InputPartition

final class PagesReaderFactory(requiredFields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter],
    hadoopConf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagesPartitionReader(partition.asInstanceOf[PagesInputPartition],
      requiredFields, pushed, hadoopConf)
}

/** Reads one row group of the seed table with parquet-mr and synthesizes
  * page rows. Body synthesis (html/text) is skipped when pruned away, and
  * pushed lang/url filters are applied BEFORE body synthesis. */
final class PagesPartitionReader(part: PagesInputPartition,
    requiredFields: Array[String],
    pushed: Array[org.apache.spark.sql.sources.Filter],
    hadoopConf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val needsBody =
    requiredFields.contains("html") || requiredFields.contains("text")

  /** Pre-synthesis filter over (doc_id, lang): url is a pure id function. */
  private def passes(id: Long, lang: String): Boolean = {
    import org.apache.spark.sql.sources._
    lazy val url = graft.synth.Synth.urlFor(id)
    pushed.forall {
      case EqualTo("lang", v: String)    => lang == v
      case In("lang", vs)                => vs.contains(lang)
      case IsNotNull("lang")             => lang != null
      case IsNotNull("url")              => true
      case StringStartsWith("url", p)    => url.startsWith(p)
      case StringContains("url", p)      => url.contains(p)
      case _                             => true // never reached: only accepted shapes are pushed
    }
  }

  private val seeds: Iterator[(Long, String, String)] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.seedPath), hadoopConf.value)
    val reader = ParquetFileReader.open(in, ParquetReadOptions.builder().build())
    try {
      var skipped = 0
      while (skipped < part.rowGroup) { reader.skipNextRowGroup(); skipped += 1 }
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      // PROJECTED record assembly (round-5 review): only the seed columns
      // this reader actually consumes are materialized — a url-only pruned
      // scan decodes (doc_id, lang) and never touches the text bytes, for
      // this slice's rows AND the pre-slice rows it has to skip past
      val wanted =
        if (needsBody) Set("doc_id", "text", "lang") else Set("doc_id", "lang")
      val requested = new org.apache.parquet.schema.MessageType(
        fileSchema.getName,
        fileSchema.getFields.asScala.filter(f => wanted.contains(f.getName)).asJava)
      val group = reader.readNextRowGroup()
      val io = new ColumnIOFactory().getColumnIO(requested, fileSchema, true)
      val rr = io.getRecordReader(group, new GroupRecordConverter(requested))
      val out = new ArrayBuffer[(Long, String, String)](
        (part.rowUntil - part.rowFrom).toInt)
      // read rows sequentially (parquet-mr has no random access within a
      // group), keep only this slice's [rowFrom, rowUntil) range — the
      // skipped-row decode is bounded by maxSlicesPerGroup and touches only
      // the projected columns
      var i = 0L
      while (i < part.rowUntil) {
        val g = rr.read()
        if (i >= part.rowFrom)
          out += ((g.getLong("doc_id", 0),
            if (needsBody) g.getString("text", 0) else null,
            g.getString("lang", 0)))
        i += 1
      }
      out.iterator
    } finally reader.close()
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var id = 0L; var text: String = null; var lang: String = null
    var found = false
    while (!found && seeds.hasNext) {
      val s = seeds.next()
      if (passes(s._1, s._3)) { id = s._1; text = s._2; lang = s._3; found = true }
    }
    if (!found) return false
    val values = if (needsBody) {
      val p = graft.synth.Synth.pageFor(id, text, lang)
      requiredFields.map {
        case "url"     => UTF8String.fromString(p.url)
        case "warc_ts" => p.warc_ts.getTime * 1000L
        case "html"    => p.html
        case "text"    => UTF8String.fromString(p.text)
        case "lang"    => UTF8String.fromString(p.lang)
      }
    } else {
      // pruned fast path: pure id functions, no body synthesis
      requiredFields.map {
        case "url"     => UTF8String.fromString(graft.synth.Synth.urlFor(id))
        case "warc_ts" => graft.synth.Synth.tsFor(id).getTime * 1000L
        case "lang"    => UTF8String.fromString(lang)
      }
    }
    current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
