package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.example.data.Group
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** PRODUCTION SERVING FACE of the persisted graft indexes — a real
  * DataSourceV2 connector (`spark.read.format("graft-index")
  * .load(path)`) over the Hive-partitioned parquet layouts the index
  * writers produce (IVF `cells/cell=N`, graph `edges/pcell=N`, plus the
  * unpartitioned `vecs`/`cents`/`cells` side tables). What the raw
  * `spark.read.parquet` probe path cannot offer, this table does:
  *
  *  - **Partition-filter pushdown as a first-class contract**: static
  *    `cell = k` / `cell IN (...)` predicates prune directories at
  *    PLANNING time — and [[SupportsRuntimeFiltering]] accepts the
  *    dynamic-partition-pruning subquery a broadcast probe join plants,
  *    so the per-query cell pruning that probeIvfIndex hand-rolled via
  *    DPP-on-parquet is now an ordinary V2 runtime filter.
  *  - **Data-filter pushdown to the row-group layer**: predicates on
  *    primitive data columns become parquet `FilterPredicate`s —
  *    row groups whose column stats exclude the predicate never decode,
  *    and parquet's record-level assembly enforces the residue EXACTLY,
  *    so the filters are claimed as fully pushed (no re-evaluation).
  *    `Not`/null-matching shapes are deliberately NOT claimed (parquet
  *    `notEq` keeps nulls where SQL drops them).
  *  - **Aggregate pushdown from footer statistics**
  *    ([[SupportsPushDownAggregates]]): ungrouped COUNT(*) / MIN / MAX
  *    over numeric columns answer from row-group metadata — one row per
  *    file, ZERO data pages decoded; a file missing stats falls back to
  *    scanning just that column. Refused whenever data filters are
  *    pushed (stats ignore filters).
  *  - **Post-pruning statistics** ([[SupportsReportStatistics]]): the
  *    reported sizeInBytes covers ONLY the selected partitions, so a
  *    probe of 3 cells out of 4096 is broadcast-eligible above the scan
  *    even when the whole index is not.
  *  - **Key-grouped partition reporting**
  *    ([[SupportsReportPartitioning]]): a partitioned table plans one
  *    input split per partition directory carrying its partition key
  *    ([[HasPartitionKey]]), so cell-clustered operations (and
  *    storage-partitioned joins under
  *    `spark.sql.sources.v2.bucketing.enabled`) can skip the exchange.
  *  - **Column pruning to the IO layer**: the pruned schema becomes the
  *    parquet requested projection, so a probe reading (vec_b, vb, nb)
  *    out of a wider index never decodes the rest; a COUNT with no
  *    pushed data filters reads footers only.
  *
  * The read path is parquet-hadoop's PUBLIC `ParquetReader[Group]` (no
  * Spark-internal reader classes), converting Groups to InternalRows
  * for the index schemas' types: integral/floating primitives, strings,
  * booleans, and single-level arrays of them (Spark's 3-level list
  * encoding). Unsupported types fail loudly at schema time.
  *
  * Registered as `graft-index` via DataSourceRegister, so
  * `CREATE TABLE ivf USING `graft-index` LOCATION path` gives the index
  * a catalog name.
  */
class GraftIndexSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-index"

  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(m: java.util.Map[String, String]): String = {
    val p = m.get("path")
    require(p != null && p.nonEmpty,
      "graft-index: a single `path` is required (.load(path))")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftIndexTable.inferSchema(pathOf(options))

  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] =
    GraftIndexTable.partitionColumns(pathOf(options))
      .map(c => Expressions.identity(c)).toArray

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftIndexTable(pathOf(properties), schema)
}

object GraftIndexTable {
  private val PartDir = "([^=/]+)=([^/]*)".r

  /** Hive's directory name for a NULL partition value — parsed as null
    * (matching `spark.read.parquet` over the same layout) instead of
    * failing the whole table at planning time.
    */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Freshness signature of a table root: (mtime, direct child count).
    * The child count is mixed in because an overwrite landing within the
    * filesystem's mtime granularity would otherwise serve a stale cached
    * schema/partition-column set (round-10 ADVICE); a rewrite that
    * changes the layout almost always changes the child population too.
    */
  private def rootSig(path: String): (Long, Int) = {
    val root = new Path(path)
    val fs = root.getFileSystem(activeHadoopConf())
    if (!fs.exists(root)) (-1L, -1)
    else (fs.getFileStatus(root).getModificationTime, fs.listStatus(root).length)
  }

  /** ONE cache entry per path, replaced when the root signature moves —
    * a long session touching many scratch indexes no longer accretes
    * stale (path, oldMtime) entries (round-10 ADVICE: the former
    * (path, mtime)-keyed maps were unbounded).
    */
  private final class SigCache[V] {
    private val m = new java.util.concurrent.ConcurrentHashMap[
      String, ((Long, Int), V)]()
    def get(path: String)(compute: => V): V =
      m.compute(path, (_, old) => {
        val sig = rootSig(path)
        if (old != null && old._1 == sig) old else (sig, compute)
      })._2
  }

  /** First-level `name=value` directory names define the partition
    * columns (the writers emit exactly one level; nesting would extend
    * the walk). Cached like [[inferSchema]] — the column SET only
    * changes via overwrite (root recreated, new signature); appends add
    * values, never columns — and every table/scan construction asks.
    */
  def partitionColumns(path: String): Seq[String] =
    partColsCache.get(path) {
      val root = new Path(path)
      val fs = root.getFileSystem(activeHadoopConf())
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.collect {
        case d if d.isDirectory => d.getPath.getName match {
          case PartDir(name, _) => Some(name)
          case _ => None
        }
      }.flatten.distinct
    }

  private val partColsCache = new SigCache[Seq[String]]

  /** Schema inference delegates to Spark's own parquet inference (one
    * footer + partition-directory discovery on the driver), so types —
    * including the inferred partition-column type — match what the raw
    * `spark.read.parquet` probe path saw byte for byte.
    *
    * Cached by root signature: a probe loop re-loads the same index
    * many times, and each inference is a full Spark read planning. A
    * schema change requires an overwrite, which recreates the root
    * directory (new signature); appends add files without touching the
    * schema — both invalidate or preserve the entry correctly.
    */
  def inferSchema(path: String): StructType =
    schemaCache.get(path) {
      val s = SparkSession.active.read.parquet(path).schema
      s.foreach(f => require(supported(f.dataType),
        s"graft-index: unsupported column type ${f.dataType.catalogString} " +
          s"for '${f.name}' (index schemas are primitives + flat arrays)"))
      s
    }

  private val schemaCache = new SigCache[StructType]

  private def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType => true
    case ArrayType(LongType | IntegerType | DoubleType | FloatType, _) => true
    case _ => false
  }

  private[sources] def activeHadoopConf(): Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  /** All data files with their partition values: (file path, size,
    * partition value map).
    */
  def listFiles(path: String): Seq[(String, Long, Map[String, String])] = {
    val root = new Path(path)
    val fs = root.getFileSystem(activeHadoopConf())
    def walk(p: Path, parts: Map[String, String]): Seq[(String, Long, Map[String, String])] =
      fs.listStatus(p).toSeq.flatMap {
        case d if d.isDirectory => d.getPath.getName match {
          case PartDir(name, value) => walk(d.getPath, parts + (name -> value))
          case _ => Nil // _temporary etc.
        }
        case f if f.getPath.getName.endsWith(".parquet") =>
          Seq((f.getPath.toString, f.getLen, parts))
        case _ => Nil
      }
    walk(root, Map.empty)
  }
}

class GraftIndexTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_index(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] =
    GraftIndexTable.partitionColumns(path)
      .map(c => Expressions.identity(c)).toArray
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftIndexScanBuilder(path, tableSchema,
      GraftIndexTable.partitionColumns(path))
}

class GraftIndexScanBuilder(path: String, tableSchema: StructType,
    partColsOrdered: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private val partCols = partColsOrdered.toSet
  private var required: StructType = tableSchema
  private var pushedPart: Array[Filter] = Array.empty
  private var pushedData: Array[Filter] = Array.empty
  private var agg: Option[Aggregation] = None
  private var aggSchema: StructType = _
  private var limit: Option[Int] = None

  /** LIMIT pushdown: each split stops after n rows (partial — Spark
    * keeps its own global limit above). Zero-data COUNT paths and
    * pushed aggregates ignore it (they never decode rows anyway).
    */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    false // partial: Spark still applies the global limit
  }

  private def dataColType(name: String): Option[DataType] =
    tableSchema.find(f => f.name == name && !partCols(f.name)).map(_.dataType)

  /** Partition-column filters prune directories; see the pruner for the
    * evaluated shapes. Null comparands are rejected (they stay with
    * Spark, which evaluates them to unknown/false) — the same guard
    * [[dataPushable]] applies, so a legal `cell IN (1, NULL)` never
    * reaches the pruner's comparator. EqualNullSafe and IsNull ARE
    * claimed: null partition values exist (Hive default-partition
    * directories) and the pruner matches them exactly.
    */
  private def partPushable(f: Filter): Boolean =
    f.references.nonEmpty && f.references.forall(partCols.contains) && (f match {
      case EqualTo(_, v) => v != null
      case _: EqualNullSafe | _: IsNotNull | _: IsNull => true
      case In(_, vs) => vs != null && vs.nonEmpty && vs.forall(_ != null)
      case GreaterThan(_, v) => v != null
      case GreaterThanOrEqual(_, v) => v != null
      case LessThan(_, v) => v != null
      case LessThanOrEqual(_, v) => v != null
      case _ => false
    })

  /** Data-column filters become parquet FilterPredicates — EXACT under
    * record-level assembly, so fully claimed. Only shapes whose parquet
    * null semantics match SQL's are accepted (notEq keeps nulls where
    * SQL `!=` drops them, so Not-shapes stay with Spark).
    */
  private def dataPushable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => v != null && primitive(a)
    case In(a, vs) => vs.nonEmpty && vs.forall(_ != null) && primitive(a)
    case GreaterThan(a, v) => v != null && comparable(a)
    case GreaterThanOrEqual(a, v) => v != null && comparable(a)
    case LessThan(a, v) => v != null && comparable(a)
    case LessThanOrEqual(a, v) => v != null && comparable(a)
    case IsNull(a) => primitive(a)
    case IsNotNull(a) => primitive(a)
    case _ => false
  }

  private def primitive(name: String): Boolean = dataColType(name).exists {
    case LongType | IntegerType | DoubleType | FloatType | StringType => true
    case _ => false
  }
  private def comparable(name: String): Boolean = dataColType(name).exists {
    case LongType | IntegerType | DoubleType | FloatType => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (part, rest0) = filters.partition(partPushable)
    val (data, rest) = rest0.partition(dataPushable)
    pushedPart = part
    pushedData = data
    rest
  }
  override def pushedFilters(): Array[Filter] = pushedPart ++ pushedData

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Footer-stats aggregates: COUNT(*) / MIN / MAX over numeric data
    * columns (string stats may be truncated — refused), ungrouped or
    * grouped by PARTITION columns (whose values are directory
    * constants). Refused when data filters are pushed (footer stats
    * ignore them).
    *
    * Pushdown degree: when the groupBy covers the partition columns
    * EXACTLY, every grouped input split carries ALL files of its group
    * — so the reader can fold them into one FINAL row per group and the
    * pushdown is COMPLETE: Spark plans no aggregate and no exchange on
    * top (round-10; the former partial rows shuffled |files| rows
    * because the pushdown Project's aliases defeat KeyGroupedPartitioning
    * propagation). Ungrouped aggregates stay PARTIAL — one row per
    * file-split, Spark's final aggregate merges — because a complete
    * ungrouped answer would serialize all footer IO into one split.
    */
  private def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }

  /** The output schema IF this aggregation is pushable: group
    * (partition) columns first, then aggregate fields — the V2 contract.
    */
  private def aggSchemaOf(aggregation: Aggregation): Option[StructType] = {
    if (pushedData.nonEmpty) return None
    val groupNames = aggregation.groupByExpressions.map(colName)
    if (groupNames.exists(n => n.isEmpty || !partCols(n.get))) return None
    val groupFields = groupNames.map(n =>
      tableSchema.find(_.name == n.get).get)
    val fields = aggregation.aggregateExpressions.map {
      case _: CountStar => Some(StructField("count_star", LongType, nullable = false))
      case m: Min => colName(m.column).filter(comparable)
        .map(n => StructField(s"min_$n", dataColType(n).get))
      case m: Max => colName(m.column).filter(comparable)
        .map(n => StructField(s"max_$n", dataColType(n).get))
      case _ => None
    }
    if (fields.exists(_.isEmpty)) None
    else Some(StructType(groupFields ++ fields.map(_.get)))
  }

  private def groupsByAllPartCols(aggregation: Aggregation): Boolean = {
    val names = aggregation.groupByExpressions.flatMap(colName)
    partColsOrdered.nonEmpty &&
      names.length == aggregation.groupByExpressions.length &&
      names.toSet == partCols && names.length == partColsOrdered.length
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggSchemaOf(aggregation).isDefined && groupsByAllPartCols(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    aggSchemaOf(aggregation) match {
      case Some(schema) =>
        agg = Some(aggregation)
        aggSchema = schema
        true
      case None => false
    }

  override def build(): Scan =
    new GraftIndexScan(path, tableSchema, required, pushedPart, pushedData,
      partColsOrdered, agg, Option(aggSchema), limit)
}

class GraftIndexScan(path: String, tableSchema: StructType,
    required: StructType, pushedPart: Array[Filter],
    pushedData: Array[Filter], partColsOrdered: Seq[String],
    agg: Option[Aggregation], aggSchema: Option[StructType],
    limit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {

  private val partCols = partColsOrdered.toSet
  @volatile private var runtime: Array[Filter] = Array.empty

  override def readSchema(): StructType = aggSchema.getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-index $path, pushedPartitionFilters=[${pushedPart.mkString(", ")}], " +
      s"pushedDataFilters=[${pushedData.mkString(", ")}], " +
      s"pushedAggregation=[${agg.map(_.aggregateExpressions.mkString(", ")).getOrElse("")}]"

  // ---- partition pruning ---------------------------------------------
  private def partType(name: String): DataType =
    tableSchema.find(_.name == name).map(_.dataType).getOrElse(StringType)

  /** Directory value → typed partition value. Hive's default-partition
    * sentinel and values that don't parse as the inferred type become
    * NULL (matching spark.read.parquet over the same layout) instead of
    * throwing at planning time and failing every query over the table.
    */
  private def parse(raw: String, dt: DataType): Any =
    if (raw == GraftIndexTable.HiveDefaultPartition) null
    else try {
      dt match {
        case LongType => raw.toLong
        case IntegerType => raw.toInt
        case DoubleType => raw.toDouble
        case FloatType => raw.toFloat
        case BooleanType => raw.toBoolean
        case _ => raw
      }
    } catch { case _: IllegalArgumentException => null }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue)
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue)
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue)
    case (x: Float, y: Number) => java.lang.Double.compare(x.toDouble, y.doubleValue)
    case (x, y) => x.toString.compareTo(y.toString)
  }

  /** Exact SQL semantics over possibly-NULL partition values: a null
    * value (or a null comparand a runtime filter might carry) matches
    * nothing except IS NULL / `<=> NULL`. Claimed partition filters are
    * never re-evaluated by Spark, so this must be exact, not heuristic.
    */
  private def eval(f: Filter, parts: Map[String, Any]): Boolean = {
    def nonNull(a: String): Option[Any] = parts.get(a).filter(_ != null)
    f match {
      case EqualTo(a, v) => v != null && nonNull(a).exists(cmp(_, v) == 0)
      case EqualNullSafe(a, v) =>
        if (v == null) parts.contains(a) && parts(a) == null
        else nonNull(a).exists(cmp(_, v) == 0)
      case In(a, vs) => vs != null &&
        nonNull(a).exists(x => vs.exists(v => v != null && cmp(x, v) == 0))
      case IsNotNull(a) => nonNull(a).nonEmpty
      case IsNull(a) => parts.contains(a) && parts(a) == null
      case GreaterThan(a, v) => v != null && nonNull(a).exists(cmp(_, v) > 0)
      case GreaterThanOrEqual(a, v) => v != null && nonNull(a).exists(cmp(_, v) >= 0)
      case LessThan(a, v) => v != null && nonNull(a).exists(cmp(_, v) < 0)
      case LessThanOrEqual(a, v) => v != null && nonNull(a).exists(cmp(_, v) <= 0)
      case _ => true // unknown runtime shape: keep the partition (safe)
    }
  }

  /** ONE directory walk for the life of the scan: the optimizer asks
    * for statistics repeatedly during join planning and a multi-job
    * query (localCheckpoint rounds) re-plans input partitions per
    * materialization — re-walking a many-hundred-directory index each
    * time dominated the probe's driver time (measured ~40% of the whole
    * graph probe before caching). Spark's own InMemoryFileIndex makes
    * the same listing-snapshot-per-scan assumption. Runtime filters
    * arrive AFTER the walk and only re-filter the cached listing.
    */
  private lazy val listedFiles: Seq[(String, Long, Map[String, Any])] =
    GraftIndexTable.listFiles(path).map { case (f, len, raw) =>
      (f, len, raw.map { case (k, v) => k -> parse(v, partType(k)) })
    }

  private def selectedFiles: Seq[(String, Long, Map[String, Any])] = {
    val filters = pushedPart ++ runtime
    listedFiles.filter { case (_, _, parts) => filters.forall(eval(_, parts)) }
  }

  // ---- runtime filtering (the V2 form of dynamic partition pruning) --
  // only partition columns surviving column pruning are advertised:
  // PartitionPruning resolves these against the scan OUTPUT, so naming
  // a pruned-away column breaks analysis of any join over the relation
  override def filterAttributes(): Array[NamedReference] =
    partColsOrdered.filter(c => readSchema().fieldNames.contains(c))
      .map(Expressions.column).toArray
  override def filter(filters: Array[Filter]): Unit = { runtime = filters }

  // ---- statistics (post-pruning: what the probe actually reads) ------
  override def estimateStatistics(): Statistics = new Statistics {
    private val files = selectedFiles
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(1L, files.map(_._2).sum))
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  // ---- partition reporting --------------------------------------------
  // one split per partition directory, each carrying its key: reported
  // as KeyGroupedPartitioning so cell-clustered plans skip the exchange.
  // A pushed aggregate stays key-grouped when its groupBy covers the
  // partition columns (the partial rows carry the group constants).
  private def grouped: Boolean = partColsOrdered.nonEmpty &&
    agg.forall { a =>
      val names = a.groupByExpressions.flatMap {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames.head)
        case _ => None
      }
      names.toSet == partCols && names.length == partColsOrdered.length
    }

  override def outputPartitioning(): Partitioning =
    if (grouped) {
      new KeyGroupedPartitioning(
        partColsOrdered.map(c => Expressions.identity(c)).toArray,
        planInputPartitions().length)
    } else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)

  // ---- execution ------------------------------------------------------
  override def planInputPartitions(): Array[InputPartition] = {
    val files = selectedFiles
    val typedPartOrder = partColsOrdered.map(c => c -> partType(c))
    if (agg.nonEmpty && !grouped) {
      // one split per file: the footer-agg reader emits one partial row
      files.map { case (f, _, parts) =>
        GraftIndexInputPartition(Seq(f), parts, typedPartOrder): InputPartition
      }.toArray
    } else if (grouped) {
      files.groupBy(_._3).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).map(kv => String.valueOf(kv._2)).mkString("/"))
        .map { case (parts, fs) =>
          GraftIndexInputPartition(fs.map(_._1).sorted, parts,
            typedPartOrder): InputPartition
        }.toArray
    } else {
      files.map { case (f, _, parts) =>
        GraftIndexInputPartition(Seq(f), parts, typedPartOrder): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = readSchema()
    // the DRIVER's Hadoop configuration, serialized into the factory:
    // executor-side opens must see the same fs credentials/overrides the
    // planning-time listing saw (a bare `new Configuration()` silently
    // drops spark.hadoop.* and reads the wrong filesystem off-local)
    val conf = new SerializableConfiguration(GraftIndexTable.activeHadoopConf())
    agg match {
      case Some(a) => new GraftIndexAggReaderFactory(a, aggSchema.get,
        aggSchema.get.fields.map(f => partCols.contains(f.name)), conf)
      case None => new GraftIndexReaderFactory(schema,
        schema.fields.map(f => partCols.contains(f.name)),
        pushedData, tableSchema, limit, conf)
    }
  }
}

case class GraftIndexInputPartition(files: Seq[String],
    partValues: Map[String, Any], partOrder: Seq[(String, DataType)])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = {
    val row = new GenericInternalRow(partOrder.length)
    partOrder.zipWithIndex.foreach { case ((c, dt), i) =>
      // typed per the table schema so key rows match the reported
      // KeyGroupedPartitioning expressions; null = Hive default partition
      row.update(i, GraftIndexReaderFactory.toInternal(partValues(c), dt))
    }
    row
  }
}

object GraftIndexFilters {

  /** Spark source Filter → parquet FilterPredicate for the claimed
    * shapes; types resolved from the table schema.
    */
  def toParquet(f: Filter, schema: StructType): FilterPredicate = {
    def dt(n: String) = schema.find(_.name == n).get.dataType
    def eq(n: String, v: Any): FilterPredicate = dt(n) match {
      case LongType => FilterApi.eq(FilterApi.longColumn(n),
        if (v == null) null else java.lang.Long.valueOf(v.asInstanceOf[Number].longValue))
      case IntegerType => FilterApi.eq(FilterApi.intColumn(n),
        if (v == null) null else java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue))
      case DoubleType => FilterApi.eq(FilterApi.doubleColumn(n),
        if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue))
      case FloatType => FilterApi.eq(FilterApi.floatColumn(n),
        if (v == null) null else java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue))
      case StringType => FilterApi.eq(FilterApi.binaryColumn(n),
        if (v == null) null else Binary.fromString(v.toString))
      case other => throw new IllegalStateException(s"eq over $other")
    }
    def notEqNull(n: String): FilterPredicate = dt(n) match {
      case LongType => FilterApi.notEq(FilterApi.longColumn(n), null.asInstanceOf[java.lang.Long])
      case IntegerType => FilterApi.notEq(FilterApi.intColumn(n), null.asInstanceOf[java.lang.Integer])
      case DoubleType => FilterApi.notEq(FilterApi.doubleColumn(n), null.asInstanceOf[java.lang.Double])
      case FloatType => FilterApi.notEq(FilterApi.floatColumn(n), null.asInstanceOf[java.lang.Float])
      case StringType => FilterApi.notEq(FilterApi.binaryColumn(n),
        null.asInstanceOf[Binary])
      case other => throw new IllegalStateException(s"notEq over $other")
    }
    def rel(n: String, v: Any,
        op: String): FilterPredicate = dt(n) match {
      case LongType =>
        val c = FilterApi.longColumn(n)
        val x = java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)
        op match {
          case ">" => FilterApi.gt(c, x); case ">=" => FilterApi.gtEq(c, x)
          case "<" => FilterApi.lt(c, x); case _ => FilterApi.ltEq(c, x)
        }
      case IntegerType =>
        val c = FilterApi.intColumn(n)
        val x = java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue)
        op match {
          case ">" => FilterApi.gt(c, x); case ">=" => FilterApi.gtEq(c, x)
          case "<" => FilterApi.lt(c, x); case _ => FilterApi.ltEq(c, x)
        }
      case DoubleType =>
        val c = FilterApi.doubleColumn(n)
        val x = java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue)
        op match {
          case ">" => FilterApi.gt(c, x); case ">=" => FilterApi.gtEq(c, x)
          case "<" => FilterApi.lt(c, x); case _ => FilterApi.ltEq(c, x)
        }
      case FloatType =>
        val c = FilterApi.floatColumn(n)
        val x = java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue)
        op match {
          case ">" => FilterApi.gt(c, x); case ">=" => FilterApi.gtEq(c, x)
          case "<" => FilterApi.lt(c, x); case _ => FilterApi.ltEq(c, x)
        }
      case other => throw new IllegalStateException(s"$op over $other")
    }
    f match {
      case EqualTo(a, v) => eq(a, v)
      case In(a, vs) => vs.map(v => eq(a, v)).reduce(FilterApi.or)
      case IsNull(a) => eq(a, null)
      case IsNotNull(a) => notEqNull(a)
      case GreaterThan(a, v) => rel(a, v, ">")
      case GreaterThanOrEqual(a, v) => rel(a, v, ">=")
      case LessThan(a, v) => rel(a, v, "<")
      case LessThanOrEqual(a, v) => rel(a, v, "<=")
      case other => throw new IllegalStateException(
        s"graft-index: unpushable filter claimed: $other")
    }
  }
}

/** Executor-side reader factory: partition splits (one or many files)
  * via the public ParquetReader[Group] API, Groups converted to
  * InternalRows in readSchema order; partition columns are constants
  * from the directory name. When NO data column is required and no data
  * filters are pushed, the reader emits footer-counted constant rows —
  * zero data pages decoded.
  */
class GraftIndexReaderFactory(readSchema: StructType, isPart: Array[Boolean],
    pushedData: Array[Filter], tableSchema: StructType,
    limit: Option[Int] = None,
    private[graft] val conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  /** VECTORIZED lane eligibility (round-10, closes the documented ~35%
    * full-scan penalty of the Group-reader row path): a scan that has
    * nothing row-wise to enforce — no pushed data filters (parquet's
    * record-level assembly enforces those EXACTLY in the row lane; the
    * page-level column readers don't), no limit wrapper — decodes
    * straight into ColumnarBatches via parquet-column's public
    * page/column-reader API. Projection and partition pruning compose
    * with it unchanged (both happen before decode). The zero-data-column
    * COUNT path stays on the footer-counting reader (zero decode beats
    * any decode).
    */
  private[graft] val columnarEligible: Boolean = {
    val dataFields = readSchema.fields.zip(isPart).collect { case (f, false) => f }
    def ok(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | DoubleType | FloatType | StringType |
           BooleanType => true
      case ArrayType(LongType | IntegerType | DoubleType | FloatType, _) => true
      case _ => false
    }
    pushedData.isEmpty && limit.isEmpty && dataFields.nonEmpty &&
      dataFields.forall(f => ok(f.dataType))
  }

  override def supportColumnarReads(p: InputPartition): Boolean = columnarEligible

  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val gip = p.asInstanceOf[GraftIndexInputPartition]
    val dataFields = readSchema.fields.zip(isPart).collect {
      case (f, false) => f
    }
    val partConst: Array[Any] = readSchema.fields.zip(isPart).map {
      case (f, true) => GraftIndexReaderFactory.toInternal(
        gip.partValues(f.name), f.dataType)
      case _ => null
    }
    new GraftIndexColumnarReader(gip.files, readSchema, isPart, partConst,
      dataFields, conf.value)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gip = p.asInstanceOf[GraftIndexInputPartition]
    val dataFields = readSchema.fields.zip(isPart).collect {
      case (f, false) => f
    }
    val partConst: Array[Any] = readSchema.fields.zip(isPart).map {
      case (f, true) => GraftIndexReaderFactory.toInternal(
        gip.partValues(f.name), f.dataType)
      case _ => null
    }
    val base =
      if (dataFields.isEmpty && pushedData.isEmpty)
        new GraftIndexCountingReader(gip.files, readSchema, isPart, partConst,
          conf.value)
      else
        new GraftIndexRowReader(gip.files, readSchema, isPart, partConst,
          dataFields, pushedData, tableSchema, conf.value)
    limit match {
      case Some(n) => new PartitionReader[InternalRow] {
        private var emitted = 0
        override def next(): Boolean =
          emitted < n && base.next() && { emitted += 1; true }
        override def get(): InternalRow = base.get()
        override def close(): Unit = base.close()
      }
      case None => base
    }
  }
}

object GraftIndexReaderFactory {
  /** External partition value (typed by the scan's parse, nullable) →
    * Spark internal representation.
    */
  def toInternal(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case _ => v
  }
}

/** Footer-count-only reader for zero-data-column, zero-data-filter
  * projections.
  */
class GraftIndexCountingReader(files: Seq[String], readSchema: StructType,
    isPart: Array[Boolean], partConst: Array[Any], conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val total: Long = files.map { f =>
    val in = HadoopInputFile.fromPath(new Path(f), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }.sum
  private var emitted = 0L
  private val row = {
    val r = new GenericInternalRow(readSchema.length)
    var i = 0
    while (i < readSchema.length) {
      if (isPart(i)) r.update(i, partConst(i)); i += 1
    }
    r
  }
  override def next(): Boolean = { emitted += 1; emitted <= total }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Footer-stats aggregate reader: one partial row per file from
  * row-group metadata; a column missing stats in any row group falls
  * back to decoding JUST that column.
  */
class GraftIndexAggReaderFactory(agg: Aggregation, aggSchema: StructType,
    isPart: Array[Boolean],
    private[graft] val conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  // serializable spec: (kind, colName) per aggregate, kinds C/MIN/MAX
  private val spec: Array[(String, String)] = agg.aggregateExpressions.map {
    case _: CountStar => ("C", "")
    case m: Min => ("MIN",
      m.column.asInstanceOf[NamedReference].fieldNames.head)
    case m: Max => ("MAX",
      m.column.asInstanceOf[NamedReference].fieldNames.head)
    case other => throw new IllegalStateException(s"unsupported pushed agg $other")
  }

  /** ONE row per SPLIT, folding every file of the split. Under complete
    * (group-by-partition-columns) pushdown a split carries ALL files of
    * its group, so the row is the group's FINAL aggregate — no Spark
    * aggregate, no exchange above. Under partial (ungrouped) pushdown
    * splits are single-file, so this is the old per-file partial row.
    */
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val gip = p.asInstanceOf[GraftIndexInputPartition]
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }

      private def pick(a: Any, b: Any, isMin: Boolean): Any = {
        val c = a.asInstanceOf[Comparable[Any]].compareTo(b)
        if ((isMin && c <= 0) || (!isMin && c >= 0)) a else b
      }

      override def get(): InternalRow = {
        val row = new GenericInternalRow(aggSchema.length)
        // group (partition) columns first — directory constants
        var si = 0
        val slots = aggSchema.fields.zipWithIndex.map { case (f, i) =>
          if (isPart(i)) {
            row.update(i, GraftIndexReaderFactory.toInternal(
              gip.partValues(f.name), f.dataType))
            None
          } else { val s = spec(si); si += 1; Some((s, i)) }
        }.flatten
        val counts = new Array[Long](slots.length)
        val bests = new Array[Any](slots.length)
        gip.files.foreach { file =>
          val in = HadoopInputFile.fromPath(new Path(file), conf.value)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks
            slots.zipWithIndex.foreach { case (((kind, col), i), k) =>
              kind match {
                case "C" => counts(k) += reader.getRecordCount
                case mm =>
                  val isMin = mm == "MIN"
                  val stats = (0 until blocks.size()).map { b =>
                    val cc = blocks.get(b).getColumns.asInstanceOf[
                      java.util.List[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]]
                      .stream().filter(_.getPath.toDotString == col)
                      .findFirst()
                    if (cc.isPresent) Option(cc.get.getStatistics) else None
                  }
                  val fileBest: Any =
                    if (stats.exists(s => s.isEmpty || s.get.isEmpty))
                      // stats missing: decode just this column
                      GraftIndexAggReaderFactory.scanMinMax(file, col, isMin,
                        aggSchema.fields(i).dataType, conf.value)
                    else {
                      val nonNull = stats.flatten.filter(_.hasNonNullValue)
                      if (nonNull.isEmpty) null
                      else nonNull.map(s =>
                        (if (isMin) s.genericGetMin else s.genericGetMax): Any)
                        .reduce(pick(_, _, isMin))
                    }
                  if (fileBest != null)
                    bests(k) = if (bests(k) == null) fileBest
                      else pick(bests(k), fileBest, isMin)
              }
            }
          } finally reader.close()
        }
        slots.zipWithIndex.foreach { case (((kind, _), i), k) =>
          row.update(i,
            if (kind == "C") java.lang.Long.valueOf(counts(k)) else bests(k))
        }
        row
      }
      override def close(): Unit = ()
    }
}

object GraftIndexAggReaderFactory {
  /** Stats-missing fallback: decode one column, compute min/max. A file
    * that doesn't CONTAIN the column at all (evolved schema) contributes
    * all-null → null, matching spark.read.parquet's merged-schema view.
    */
  def scanMinMax(file: String, col: String, isMin: Boolean,
      dt: DataType, baseConf: Configuration): Any = {
    val conf = new Configuration(baseConf)
    val footer = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file), conf))
      try r.getFileMetaData.getSchema finally r.close()
    }
    val present = footer.getFields
      .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
      .stream().anyMatch(_.getName == col)
    if (!present) return null
    val projected = new org.apache.parquet.schema.MessageType(footer.getName,
      footer.getFields.asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
        .stream().filter(_.getName == col)
        .toArray(n => new Array[org.apache.parquet.schema.Type](n)): _*)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    val reader = ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf).build()
    try {
      var best: Any = null
      var g = reader.read()
      while (g != null) {
        val idx = g.getType.getFieldIndex(col)
        if (g.getFieldRepetitionCount(idx) > 0) {
          val v: Any = dt match {
            case LongType => java.lang.Long.valueOf(g.getLong(idx, 0))
            case IntegerType => java.lang.Integer.valueOf(g.getInteger(idx, 0))
            case DoubleType => java.lang.Double.valueOf(g.getDouble(idx, 0))
            case FloatType => java.lang.Float.valueOf(g.getFloat(idx, 0))
            case other => throw new IllegalStateException(s"minmax over $other")
          }
          if (best == null) best = v
          else {
            val c = v.asInstanceOf[Comparable[Any]].compareTo(best)
            if ((isMin && c < 0) || (!isMin && c > 0)) best = v
          }
        }
        g = reader.read()
      }
      best
    } finally reader.close()
  }
}

class GraftIndexRowReader(files: Seq[String], readSchema: StructType,
    isPart: Array[Boolean], partConst: Array[Any],
    dataFields: Array[StructField], pushedData: Array[Filter],
    tableSchema: StructType, baseConf: Configuration)
    extends PartitionReader[InternalRow] {

  private val fileQueue = scala.collection.mutable.Queue(files: _*)
  private var reader: ParquetReader[Group] = _
  private var current: Group = _
  // > 0: the current file lacks EVERY projected data column — emit this
  // many all-null data rows without a parquet record reader
  private var constRows: Long = 0L

  /** Advance to the next file that contributes rows. Files may carry
    * HETEROGENEOUS schemas under one merged table schema (evolved
    * writers): a column absent from a file reads as null — exactly
    * spark.read.parquet's semantics — so
    *  - projected columns absent from the file are skipped in the
    *    parquet projection and emitted as null by convert();
    *  - a pushed filter referencing an absent column is a PER-FILE
    *    constant (the column is null for every row): IsNull keeps the
    *    file and drops that conjunct, every other claimed shape needs a
    *    non-null value → the whole file is skipped;
    *  - a file lacking every projected data column still yields its
    *    (filter-surviving) rows as partition-constant + null rows.
    */
  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    while (fileQueue.nonEmpty) {
      val file = fileQueue.dequeue()
      val conf = new Configuration(baseConf)
      // requested projection: required data columns ∪ filter columns (the
      // record-level filter needs its inputs materialized)
      val footer = {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(file), conf))
        try r.getFileMetaData finally r.close()
      }
      val fileSchema = footer.getSchema
      val present = fileSchema.getFields
        .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
        .stream().map[String](_.getName).toArray.map(_.toString).toSet
      val (filtersInFile, filtersAbsent) =
        pushedData.partition(_.references.forall(present))
      if (filtersAbsent.forall { case IsNull(_) => true; case _ => false }) {
        val wanted = (dataFields.map(_.name).toSet ++
          filtersInFile.flatMap(_.references)).intersect(present)
        if (wanted.isEmpty) {
          // no decodable column and no in-file filter: every row of the
          // file survives as partition constants + nulls
          val in = HadoopInputFile.fromPath(new Path(file), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          constRows = try r.getRecordCount finally r.close()
          if (constRows > 0) return true
        } else {
          val projected = new org.apache.parquet.schema.MessageType(
            fileSchema.getName,
            fileSchema.getFields.asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
              .stream().filter(t => wanted.contains(t.getName))
              .toArray(n => new Array[org.apache.parquet.schema.Type](n)): _*)
          conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
            projected.toString)
          var b = ParquetReader.builder(new GroupReadSupport(), new Path(file))
            .withConf(conf)
          if (filtersInFile.nonEmpty) {
            val pred = filtersInFile.map(GraftIndexFilters.toParquet(_, tableSchema))
              .reduce(FilterApi.and)
            b = b.withFilter(FilterCompat.get(pred))
          }
          reader = b.build()
          return true
        }
      }
      // else: a non-IsNull filter references a column this file lacks —
      // the conjunct is constant-false there, skip the file entirely
    }
    false
  }

  override def next(): Boolean = {
    while (true) {
      if (constRows > 0) { constRows -= 1; current = null; return true }
      if (reader == null && !openNext()) return false
      if (constRows > 0) { constRows -= 1; current = null; return true }
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
    }
    false // unreachable
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(readSchema.length)
    var di = 0
    var i = 0
    while (i < readSchema.length) {
      if (isPart(i)) row.update(i, partConst(i))
      else {
        // current == null: constant-rows mode (file lacks every
        // projected data column) — all data columns are null
        row.update(i,
          if (current == null) null
          else convert(current, dataFields(di).name, dataFields(di).dataType))
        di += 1
      }
      i += 1
    }
    row
  }

  /** Group → Spark internal value for the supported index types.
    * Arrays follow Spark's 3-level list encoding (group LIST → repeated
    * group list → element). A column the file's schema lacks (evolved
    * file sets) is null, like spark.read.parquet's merged view.
    */
  private def convert(g: Group, name: String, dt: DataType): Any = {
    if (!g.getType.containsField(name)) return null
    val idx = g.getType.getFieldIndex(name)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    dt match {
      case LongType => java.lang.Long.valueOf(g.getLong(idx, 0))
      case IntegerType => java.lang.Integer.valueOf(g.getInteger(idx, 0))
      case DoubleType => java.lang.Double.valueOf(g.getDouble(idx, 0))
      case FloatType => java.lang.Float.valueOf(g.getFloat(idx, 0))
      case BooleanType => java.lang.Boolean.valueOf(g.getBoolean(idx, 0))
      case StringType => UTF8String.fromString(g.getString(idx, 0))
      case ArrayType(elem, _) =>
        val list = g.getGroup(idx, 0)
        val n = list.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var j = 0
        while (j < n) {
          val e = list.getGroup(0, j)
          out(j) =
            if (e.getFieldRepetitionCount(0) == 0) null
            else elem match {
              case LongType => java.lang.Long.valueOf(e.getLong(0, 0))
              case IntegerType => java.lang.Integer.valueOf(e.getInteger(0, 0))
              case DoubleType => java.lang.Double.valueOf(e.getDouble(0, 0))
              case FloatType => java.lang.Float.valueOf(e.getFloat(0, 0))
              case other => throw new IllegalStateException(
                s"graft-index: unsupported array element $other")
            }
          j += 1
        }
        new GenericArrayData(out)
      case other => throw new IllegalStateException(
        s"graft-index: unsupported type $other")
    }
  }

  override def close(): Unit = if (reader != null) reader.close()
}

/** VECTORIZED read lane: decodes parquet pages straight into Spark
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es using ONLY public
  * parquet-column API (`ParquetFileReader.readNextRowGroup` →
  * `ColumnReadStoreImpl` → per-leaf `ColumnReader`), no Spark-internal
  * parquet reader classes. Eligible scans are pure projections (no
  * pushed data filters, no limit — those need the record-assembly row
  * lane); partition pruning and column pruning compose unchanged, since
  * both act before decode (`setRequestedSchema` drops unwanted columns
  * at the page-IO layer).
  *
  * Per 4096-row batch: partition columns are constant-filled, flat
  * primitive columns decode def-level/value pairs, array columns decode
  * rep/def runs into the vector's child (standard 3-level list
  * encoding; null list / empty list / null element all distinguished by
  * definition level against the leaf descriptor). A projected column
  * ABSENT from a file (evolved schemas) fills nulls, matching the row
  * lane and spark.read.parquet. Batches never split a row: each batch
  * covers whole rows of one row group, so array runs stay intact.
  */
class GraftIndexColumnarReader(files: Seq[String], readSchema: StructType,
    isPart: Array[Boolean], partConst: Array[Any],
    dataFields: Array[StructField], conf: Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.parquet.column.ColumnReader
  import org.apache.parquet.column.impl.ColumnReadStoreImpl
  import org.apache.parquet.example.DummyRecordConverter
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val BatchRows = 4096
  private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, readSchema)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  private val fileQueue = scala.collection.mutable.Queue(files: _*)
  private var reader: org.apache.parquet.hadoop.ParquetFileReader = _
  private var projected: org.apache.parquet.schema.MessageType = _
  private var createdBy: String = _
  // per dataField, rebound per row group; null = column absent from file
  private var crs: Array[ColumnReader] = _
  private var valuesLeft: Array[Long] = _
  private var rowsLeftInGroup: Long = 0L

  /** Advance to the next non-empty row group, opening files as needed.
    * False when every file is exhausted.
    */
  private def advance(): Boolean = {
    while (true) {
      if (reader != null) {
        val pages = reader.readNextRowGroup()
        if (pages == null) { reader.close(); reader = null }
        else if (pages.getRowCount > 0) { bind(pages); return true }
      }
      if (reader == null) {
        if (fileQueue.isEmpty) return false
        val file = fileQueue.dequeue()
        reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(file), conf))
        val meta = reader.getFooter.getFileMetaData
        createdBy = meta.getCreatedBy
        val wanted = dataFields.map(_.name).toSet
        projected = new org.apache.parquet.schema.MessageType(
          meta.getSchema.getName,
          meta.getSchema.getFields
            .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
            .stream().filter(t => wanted.contains(t.getName))
            .toArray(n => new Array[org.apache.parquet.schema.Type](n)): _*)
        reader.setRequestedSchema(projected)
      }
    }
    false // unreachable
  }

  private def bind(pages: org.apache.parquet.column.page.PageReadStore): Unit = {
    rowsLeftInGroup = pages.getRowCount
    val store = new ColumnReadStoreImpl(pages,
      new DummyRecordConverter(projected).getRootConverter, projected, createdBy)
    // each table column maps to exactly ONE leaf (flat primitives and
    // single-element lists), so the leaf whose path head matches the
    // field name is its descriptor
    val byHead = projected.getColumns
      .asInstanceOf[java.util.List[org.apache.parquet.column.ColumnDescriptor]]
    crs = new Array[ColumnReader](dataFields.length)
    valuesLeft = new Array[Long](dataFields.length)
    var i = 0
    while (i < dataFields.length) {
      var j = 0
      while (j < byHead.size()) {
        val d = byHead.get(j)
        if (d.getPath()(0) == dataFields(i).name) {
          crs(i) = store.getColumnReader(d)
          valuesLeft(i) = crs(i).getTotalValueCount
        }
        j += 1
      }
      i += 1
    }
  }

  override def next(): Boolean = {
    if (rowsLeftInGroup == 0 && !advance()) return false
    val n = math.min(BatchRows.toLong, rowsLeftInGroup).toInt
    vectors.foreach(_.reset())
    var di = 0
    var i = 0
    while (i < readSchema.length) {
      if (isPart(i)) fillConst(vectors(i), readSchema(i).dataType, partConst(i), n)
      else {
        readSchema(i).dataType match {
          case at: ArrayType => fillArray(vectors(i), at.elementType, di, n)
          case dt => fillFlat(vectors(i), dt, di, n)
        }
        di += 1
      }
      i += 1
    }
    batch.setNumRows(n)
    rowsLeftInGroup -= n
    true
  }

  private def fillConst(v: OnHeapColumnVector, dt: DataType, c: Any,
      n: Int): Unit = {
    if (c == null) { v.putNulls(0, n); return }
    var r = 0
    while (r < n) {
      dt match {
        case LongType => v.putLong(r, c.asInstanceOf[Long])
        case IntegerType => v.putInt(r, c.asInstanceOf[Int])
        case DoubleType => v.putDouble(r, c.asInstanceOf[Double])
        case FloatType => v.putFloat(r, c.asInstanceOf[Float])
        case BooleanType => v.putBoolean(r, c.asInstanceOf[Boolean])
        case _ => v.putByteArray(r, c.asInstanceOf[UTF8String].getBytes)
      }
      r += 1
    }
  }

  private def fillFlat(v: OnHeapColumnVector, dt: DataType, di: Int,
      n: Int): Unit = {
    val cr = crs(di)
    if (cr == null) { v.putNulls(0, n); return } // column absent from file
    val maxDef = cr.getDescriptor.getMaxDefinitionLevel
    var r = 0
    while (r < n) {
      if (cr.getCurrentDefinitionLevel < maxDef) v.putNull(r)
      else dt match {
        case LongType => v.putLong(r, cr.getLong)
        case IntegerType => v.putInt(r, cr.getInteger)
        case DoubleType => v.putDouble(r, cr.getDouble)
        case FloatType => v.putFloat(r, cr.getFloat)
        case BooleanType => v.putBoolean(r, cr.getBoolean)
        case _ => v.putByteArray(r, cr.getBinary.getBytesUnsafe)
      }
      cr.consume()
      valuesLeft(di) -= 1
      r += 1
    }
  }

  /** Standard 3-level list decode. Definition levels against the leaf:
    * maxDef = value present; maxDef-1 = null ELEMENT (only when the
    * element is optional); below that, the list itself is empty or null
    * (empty at the repeated group's level, null below it). Repetition
    * level 0 opens a new row; entries keep within-row order.
    */
  private def fillArray(v: OnHeapColumnVector, elem: DataType, di: Int,
      n: Int): Unit = {
    val cr = crs(di)
    if (cr == null) { v.putNulls(0, n); return }
    val child = v.arrayData()
    val maxDef = cr.getDescriptor.getMaxDefinitionLevel
    // element optionality read off the leaf type itself
    val elemOptional = cr.getDescriptor.getPrimitiveType.getRepetition ==
      org.apache.parquet.schema.Type.Repetition.OPTIONAL
    val valueDef = maxDef
    val emptyDef = maxDef - (if (elemOptional) 2 else 1)
    var r = 0
    while (r < n) {
      val start = child.getElementsAppended
      var count = 0
      var nullList = false
      var emptyList = false
      var first = true
      var rowDone = false
      while (!rowDone) {
        val dl = cr.getCurrentDefinitionLevel
        if (dl == valueDef) {
          elem match {
            case LongType => child.appendLong(cr.getLong)
            case IntegerType => child.appendInt(cr.getInteger)
            case DoubleType => child.appendDouble(cr.getDouble)
            case _ => child.appendFloat(cr.getFloat)
          }
          count += 1
        } else if (elemOptional && dl == valueDef - 1) {
          child.appendNull()
          count += 1
        } else if (first) {
          if (dl == emptyDef) emptyList = true else nullList = true
        }
        cr.consume()
        valuesLeft(di) -= 1
        first = false
        // the value after the row's last entry belongs to the next row
        // (rep 0) — or the column is exhausted
        rowDone = valuesLeft(di) == 0 || cr.getCurrentRepetitionLevel == 0
      }
      if (nullList) v.putNull(r)
      else v.putArray(r, start, if (emptyList) 0 else count)
      r += 1
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (reader != null) { reader.close(); reader = null }
    batch.close()
  }
}
