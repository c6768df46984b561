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
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or, StringContains, StringEndsWith, StringStartsWith}
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
  *    General `Not` shapes are deliberately NOT claimed (parquet
  *    `notEq` keeps nulls where SQL drops them) — except
  *    `Not(EqualTo)`, claimed as `and(notEq(c,null), notEq(c,v))`
  *    (round-12), which restores SQL's unknown→false exactly.
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
    GraftIndexTable.inferSchema(pathOf(options),
      mergeSchema = java.lang.Boolean.parseBoolean(
        options.getOrDefault("mergeSchema", "false")))

  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] =
    GraftIndexTable.partitionColumns(pathOf(options))
      .map(c => Expressions.identity(c)).toArray

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftIndexTable(pathOf(properties), schema,
      // diagnostic escape hatch (and the lane-parity test handle):
      // .option("rowlane", "true") pins every read to the Group-reader
      // row path, bypassing the vectorized lane
      forceRowLane = java.lang.Boolean.parseBoolean(
        properties.getOrDefault("rowlane", "false")),
      // .option("graftlane", "true") pins unfiltered vectorized reads to
      // the in-house columnar decoder instead of the delegated
      // VectorizedParquetRecordReader lane (round-12) — the decoder-
      // parity test handle and the fallback if a workload ever hits a
      // delegation edge first
      forceGraftLane = java.lang.Boolean.parseBoolean(
        properties.getOrDefault("graftlane", "false")))
}

object GraftIndexTable {
  private[sources] val PartDirRx = "([^=/]+)=([^/]*)".r
  private val PartDir = PartDirRx

  /** Hive's directory name for a NULL partition value — parsed as null
    * (matching `spark.read.parquet` over the same layout) instead of
    * failing the whole table at planning time.
    */
  val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Lineage metadata column (round-11, [[SupportsMetadataColumns]]):
    * `SELECT _file, ...` resolves to the data file each row came from —
    * the row→file provenance a curation/lineage pipeline wants from its
    * serving face, at zero read cost (a per-file constant, exactly like
    * a partition value). Hidden whenever the table carries a real
    * column of the same name.
    */
  val FileCol = "_file"

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
    /** `key` defaults to the path; pass a decorated key when one path
      * hosts several cacheable views (e.g. merged vs first-footer
      * schema) — the SIGNATURE always comes from the real path.
      */
    def get(path: String, key: String = null)(compute: => V): V =
      m.compute(if (key == null) path else key, (_, old) => {
        val sig = rootSig(path)
        if (old != null && old._1 == sig) old else (sig, compute)
      })._2
  }

  /** `name=value` directory chains define the partition columns, in
    * DEPTH order — multi-level Hive layouts (`a=1/b=2/part.parquet`)
    * are first-class (round-11; the former first-level-only scan
    * silently null-filled deeper levels as data columns, diverging
    * from spark.read.parquet). Every data file must sit under the SAME
    * ordered column chain; a mixed layout (files at different nesting,
    * or a bare file next to partition directories) is refused LOUDLY
    * at planning time instead of mis-typing columns. Cached like
    * [[inferSchema]] — the column set only changes via overwrite (root
    * recreated, new signature); appends add values, never columns —
    * and every table/scan construction asks.
    */
  def partitionColumns(path: String): Seq[String] =
    partColsCache.get(path) {
      val root = new Path(path)
      val fs = root.getFileSystem(activeHadoopConf())
      if (!fs.exists(root)) Nil
      else {
        // mirror listFiles' traversal, tracking the name chain per file
        def walk(p: Path, prefix: Seq[String]): Seq[Seq[String]] =
          fs.listStatus(p).toSeq.flatMap {
            case d if d.isDirectory => d.getPath.getName match {
              case PartDir(name, _) => walk(d.getPath, prefix :+ name)
              case _ => Nil
            }
            case f if f.getPath.getName.endsWith(".parquet") => Seq(prefix)
            case _ => Nil
          }
        val chains = walk(root, Nil).distinct
        // a bare root-level file renders as <root>, and the ellipsis only
        // appears when chains were actually elided (round-11 ADVICE: the
        // unconditional ", ...}" read as truncation on 2-chain messages)
        def render(c: Seq[String]) = if (c.isEmpty) "<root>" else c.mkString("/")
        require(chains.size <= 1,
          s"graft-index: inconsistent partition nesting under $path " +
            s"(every data file must sit under the same name=value chain): " +
            chains.take(3).map(render).mkString("{", ", ",
              if (chains.size > 3) ", ...}" else "}"))
        chains.headOption.getOrElse(Nil)
      }
    }

  private val partColsCache = new SigCache[Seq[String]]

  /** Schema inference, contract: byte-for-byte the schema
    * `spark.read.parquet(path)` infers over the same layout — the
    * parity every reader spec asserts. The FAST path (round-11, the
    * catalog/V2 fixed-planning-cost fix) reads ONE footer through
    * Spark's own parquet→Catalyst converter and infers the partition
    * column type from the directory values with Spark's numeric ladder
    * (int → long → double); anything it can't reproduce exactly —
    * non-numeric partition values (Spark would try dates), multiple
    * partition columns — falls back to the full spark.read planning.
    * ~10× cheaper per first touch, which a bench loop pays on every
    * index rewrite (each rewrite moves the cache signature).
    *
    * Cached by root signature: a probe loop re-loads the same index
    * many times. A schema change requires an overwrite, which recreates
    * the root directory (new signature); appends add files without
    * touching the schema — both invalidate or preserve the entry
    * correctly.
    */
  def inferSchema(path: String, mergeSchema: Boolean = false): StructType =
    schemaCache.get(path,
      key = if (mergeSchema) path + "\u0000merged" else path) {
      val s =
        // mergeSchema (round-11 read option): evolved file sets without
        // an explicit .schema() — Spark's own footer-merging inference,
        // cached under its own key so the views never collide
        if (mergeSchema)
          SparkSession.active.read.option("mergeSchema", "true")
            .parquet(path).schema
        else fastInferSchema(path).getOrElse(
          SparkSession.active.read.parquet(path).schema)
      s.foreach(f => require(supported(f.dataType),
        s"graft-index: unsupported column type ${f.dataType.catalogString} " +
          s"for '${f.name}' (primitives, arrays, and struct/map over them)"))
      val parts = partitionColumns(path).toSet
      s.filter(f => parts(f.name)).foreach(f => require(partSupported(f.dataType),
        s"graft-index: unsupported PARTITION column type " +
          s"${f.dataType.catalogString} for '${f.name}'"))
      s
    }

  private val schemaCache = new SigCache[StructType]

  /** Diagnostic counter for the planning-cost pins: number of
    * footer-based (fast-path) inferences actually performed.
    */
  private[graft] val footerInfers = new java.util.concurrent.atomic.AtomicLong

  /** File-source relations report every column — and every nested
    * field, array element, and map value — nullable regardless of the
    * footer's repetition (Spark's asNullable): mirror that recursively.
    */
  private def deepNullable(f: StructField): StructField =
    f.copy(nullable = true, dataType = nullableType(f.dataType))

  private def nullableType(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(nullableType(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(nullableType(k), nullableType(v), valueContainsNull = true)
    case StructType(fields) => StructType(fields.map(deepNullable))
    case other => other
  }

  /** One-footer inference. None = a layout shape the fast path can't
    * reproduce byte-for-byte against Spark's inference — caller falls
    * back to spark.read.parquet.
    */
  private def fastInferSchema(path: String): Option[StructType] = try {
    val files = listFiles(path)
    if (files.isEmpty) return None
    val partColNames = files.flatMap(_._3.keys).distinct
    if (partColNames.length > 1) return None // one level, one column only
    // partition type: Spark's numeric ladder over ALL observed values
    // (int → long → double); the null sentinel contributes nothing; any
    // non-numeric value (Spark would try date/timestamp next) bails
    val partField = partColNames.headOption match {
      case None => None
      case Some(name) =>
        val raws = files.map(_._3(name)).distinct
          .filterNot(_ == HiveDefaultPartition)
        def all(p: String => Boolean) = raws.nonEmpty && raws.forall(p)
        def parses[T](f: String => T): String => Boolean =
          s => try { f(s); true } catch { case _: Exception => false }
        // strict zero-padded ISO dates (the form Spark's own writers
        // emit for DateType partition values) infer as DATE — exactly
        // what Spark's inference ladder yields for them; any other
        // date-ish form bails to the spark.read fallback
        def strictDate(v: String): Boolean =
          v.length == 10 && v(4) == '-' && v(7) == '-' &&
            parses(s => java.time.LocalDate.parse(s))(v)
        val dt =
          if (all(parses(_.toInt))) IntegerType
          else if (all(parses(_.toLong))) LongType
          else if (all(parses(_.toDouble))) DoubleType
          else if (all(strictDate)) DateType
          else if (raws.isEmpty) StringType // all-null partition
          else return None
        Some(StructField(name, dt, nullable = true))
    }
    // data schema: first data file's footer (sorted-path order) through
    // Spark's own converter — identical to what mergeSchema=false
    // inference reads on the uniform layouts the index writers emit
    val first = files.map(_._1).min
    val conf = activeHadoopConf()
    val msg = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(first), conf))
      try r.getFileMetaData.getSchema finally r.close()
    }
    val converter =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter(
        SparkSession.active.sessionState.conf)
    val data = StructType(converter.convert(msg).fields.map(deepNullable))
    footerInfers.incrementAndGet()
    Some(StructType(data.fields ++ partField))
  } catch { case _: Exception => None }

  /** Types the FILTERED in-house lanes decode (columnar scratch-residue
    * reader and Group-walk row reader are flat-only). Tables made
    * entirely of these keep the full claim surface.
    */
  private[sources] def flatLane(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType | TimestampType | DateType | BinaryType |
         ShortType | ByteType | TimestampNTZType => true
    case _: DecimalType => true
    // string elements (round-12 fourth sitting): tags/tokens columns
    case ArrayType(LongType | IntegerType | DoubleType | FloatType |
                   StringType, _) => true
    case _ => false
  }

  /** A table carrying any column the filtered lanes can't decode
    * (struct/map/deep arrays — the mounted-lake-table `props` shape).
    * Such tables refuse DATA claims wholesale: every filtered scan then
    * arrives at the connector unfiltered, rides Spark's own vectorized
    * reader (which decodes nested natively), and Spark re-filters above
    * — exact by construction. Partition pruning and footer aggregates
    * stay on (decode-free).
    */
  private[sources] def hasNested(s: StructType): Boolean =
    !s.forall(f => flatLane(f.dataType))

  private def supported(dt: DataType): Boolean = flatLane(dt) || (dt match {
    // nested (round-13): struct/map/array over supported leaves — decode
    // rides the delegated lane only; claims refused on nested-bearing
    // tables (see hasNested)
    case StructType(fields) => fields.forall(f => supported(f.dataType))
    case MapType(k, v, _) => supported(k) && supported(v)
    case ArrayType(e, _) => supported(e)
    case _ => false
  })

  /** Partition-column types: the original primitive set plus DATE
    * (round-12) — the `dt=2026-08-16` daily layout is THE canonical
    * shape for a 100 TB event table, and parquet DATE (INT32 days) IS
    * Spark's internal DateType, so the value parse is a zero-conversion
    * epoch-day count. Timestamps stay DATA-column-only (round-11):
    * directory names don't carry a timezone.
    */
  private def partSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         BooleanType | DateType => true
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

class GraftIndexTable(path: String, tableSchema: StructType,
    forceRowLane: Boolean = false, forceGraftLane: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_index(`$path`)"
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (tableSchema.fieldNames.contains(GraftIndexTable.FileCol)) Array.empty
    else Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = GraftIndexTable.FileCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "data file this row came from (lineage; per-file constant)"
    })
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def partitioning(): Array[Transform] =
    GraftIndexTable.partitionColumns(path)
      .map(c => Expressions.identity(c)).toArray
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def positive(key: String): Option[Long] = Option(options.get(key)).map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-index: $key must be a positive integer, got '$v'")
      }
      require(n > 0, s"graft-index: $key must be positive, got $n")
      n
    }
    new GraftIndexScanBuilder(path, tableSchema,
      GraftIndexTable.partitionColumns(path), forceRowLane, forceGraftLane,
      // the cap is consumed as an Int (ReadLimit.maxFiles) — a value past
      // Int.MaxValue must fail HERE, not silently wrap to a non-positive
      // cap that admits nothing (round-11 ADVICE)
      maxFilesPerTrigger = positive("maxFilesPerTrigger").map { n =>
        require(n <= Int.MaxValue,
          s"graft-index: maxFilesPerTrigger out of Int range: $n")
        n.toInt
      },
      maxBytesPerTrigger = positive("maxBytesPerTrigger"),
      logRetention = Option(options.get("admissionLogRetention"))
        .map(_.toLowerCase(java.util.Locale.ROOT)).map {
          case v @ ("all" | "committed") => v
          case other => throw new IllegalArgumentException(
            "graft-index: admissionLogRetention must be 'all' or " +
              s"'committed', got '$other'")
        }.getOrElse("all"))
  }
}

class GraftIndexScanBuilder(path: String, tableSchema: StructType,
    partColsOrdered: Seq[String], forceRowLane: Boolean = false,
    forceGraftLane: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    logRetention: String = "all")
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private val partCols = partColsOrdered.toSet
  private var required: StructType = tableSchema
  private var pushedPart: Array[Filter] = Array.empty
  private var pushedData: Array[Filter] = Array.empty
  private var hintData: Array[Filter] = Array.empty
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
      // `<>` / NOT IN (round-12): claimed as the leaves they desugar to
      // under SQL semantics — And(IsNotNull, ≠ each) — which map
      // unknown→false like every other claimed leaf; see dataPushable
      case Not(EqualTo(_, v)) => v != null
      case Not(In(_, vs)) => vs != null && vs.nonEmpty && vs.forall(_ != null)
      // string predicates: never match null, so unknown→false holds
      case StringStartsWith(_, v) => v != null
      case StringEndsWith(_, v) => v != null
      case StringContains(_, v) => v != null
      // negation-free compounds of claimed legs compose exactly: every
      // leg maps SQL unknown→false, and false ≡ unknown through a
      // monotone AND/OR lattice for the keep/drop decision (the same
      // argument as dataPushable; a general Not would break it and stays
      // refused — Not(EqualTo) above is the one negated leaf whose
      // claimed semantic is itself negation-free)
      case Or(l, r) => partPushable(l) && partPushable(r)
      case And(l, r) => partPushable(l) && partPushable(r)
      case _ => false
    })

  /** Data-column filters become parquet FilterPredicates — EXACT under
    * record-level assembly, so fully claimed. Only shapes whose parquet
    * null semantics match SQL's are accepted: a bare parquet notEq keeps
    * nulls where SQL `!=` drops them, so general Not-shapes stay with
    * Spark — EXCEPT `Not(EqualTo)` (round-12), which is claimed as
    * `and(notEq(c, null), notEq(c, v))`: the explicit not-null leg
    * restores SQL's unknown→false, making `<>` exact under the same
    * lattice argument as every other claimed leaf. (A `<>` serving
    * predicate previously fell to full decode.)
    */
  private def dataPushable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => v != null && primitive(a)
    case Not(EqualTo(a, v)) => v != null && primitive(a)
    case In(a, vs) => vs.nonEmpty && vs.forall(_ != null) && primitive(a)
    // NOT IN desugars like `<>`: And(IsNotNull, ≠v1, ≠v2, …)
    case Not(In(a, vs)) => vs.nonEmpty && vs.forall(_ != null) && primitive(a)
    // string predicates (round-12): exact via parquet UserDefinedPredicate
    // on the row lane and the vectorized residue on the columnar lane;
    // none matches NULL, so SQL's unknown→false holds by construction.
    // startsWith additionally prunes row groups off min/max stats.
    case StringStartsWith(a, v) => v != null && stringCol(a)
    case StringEndsWith(a, v) => v != null && stringCol(a)
    case StringContains(a, v) => v != null && stringCol(a)
    case GreaterThan(a, v) => v != null && comparable(a)
    case GreaterThanOrEqual(a, v) => v != null && comparable(a)
    case LessThan(a, v) => v != null && comparable(a)
    case LessThanOrEqual(a, v) => v != null && comparable(a)
    case IsNull(a) => primitive(a)
    case IsNotNull(a) => primitive(a)
    // OR/AND of claimed legs (Spark splits top-level conjuncts, so And
    // only appears nested under Or, e.g. (v<10 OR (v>90 AND w=1))):
    // safe because every claimed leaf maps SQL unknown→false and the
    // combination is negation-free — false and unknown are
    // indistinguishable through a monotone AND/OR lattice for WHERE's
    // keep-iff-TRUE decision. Parquet's record-level assembly applies
    // the same mapping, so the claim stays EXACT.
    case Or(l, r) => dataPushable(l) && dataPushable(r)
    case And(l, r) => dataPushable(l) && dataPushable(r)
    case _ => false
  }

  private def primitive(name: String): Boolean = dataColType(name).exists {
    case LongType | IntegerType | DoubleType | FloatType | StringType |
         DateType | ShortType | ByteType => true
    case _ => false
  }
  private def stringCol(name: String): Boolean =
    dataColType(name).contains(StringType)
  // DATE joins the comparable set (round-12): the comparand arrives as
  // java.sql.Date / LocalDate and converts losslessly to the INT32
  // epoch-day count parquet stores, so eq/range claims (and their
  // row-group stats pruning) are exact — a date-range scan over a 100 TB
  // event table is the single most common serving predicate there is.
  // SHORT/BYTE (same sitting) are INT32-annotated physicals — the same
  // intColumn comparators. DECIMAL, BINARY and timestamps stay
  // unclaimed: their predicates remain with Spark over decoded rows.
  private def comparable(name: String): Boolean = dataColType(name).exists {
    case LongType | IntegerType | DoubleType | FloatType | DateType |
         ShortType | ByteType => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (part, rest0) = filters.partition(partPushable)
    // nested-bearing tables (round-13): data claims refused WHOLESALE —
    // the filtered lanes are flat-only and the projection isn't known
    // yet at pushFilters time, so a claim could strand a nested column
    // with no decoder. Refusal routes every filtered scan to the
    // delegated vectorized lane + Spark's own re-filter: exact by
    // construction. Partition filters still prune directories (no
    // decode involved).
    val (data, rest) =
      if (GraftIndexTable.hasNested(tableSchema)) (Array.empty[Filter], rest0)
      else rest0.partition(dataPushable)
    // HINTS (round-13): the pushable data filters a nested-bearing
    // table refuses as claims still reach the delegated reader's conf
    // as parquet predicates — Spark's own vectorized reader then prunes
    // row groups (stats/dict) and pages (column index) with them while
    // Spark re-filters above. Exactness is untouched: pruning is
    // conservative by parquet's contract and the filter still runs.
    hintData =
      if (GraftIndexTable.hasNested(tableSchema)) rest0.filter(dataPushable)
      else Array.empty
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
      partColsOrdered, agg, Option(aggSchema), limit, forceRowLane,
      forceGraftLane, maxFilesPerTrigger, maxBytesPerTrigger, logRetention,
      hintData)
}

class GraftIndexScan(path: String, tableSchema: StructType,
    required: StructType, pushedPart: Array[Filter],
    pushedData: Array[Filter], partColsOrdered: Seq[String],
    agg: Option[Aggregation], aggSchema: Option[StructType],
    limit: Option[Int] = None, forceRowLane: Boolean = false,
    forceGraftLane: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    logRetention: String = "all",
    hintData: Array[Filter] = Array.empty)
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
        // DATE partition values (round-12): the directory string is the
        // zero-padded ISO form Spark's writers emit; internal form is
        // the epoch-day Int — same representation parquet DATE stores
        case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
        case _ => raw
      }
    } catch {
      case _: IllegalArgumentException | _: java.time.DateTimeException => null
    }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    // DATE comparands arrive as java.sql.Date or LocalDate depending on
    // the session's java8API setting; the stored side is epoch-day Int
    case (x: Int, y: java.sql.Date) =>
      java.lang.Long.compare(x.toLong, GraftIndexDate.toDays(y).toLong)
    case (x: Int, y: java.time.LocalDate) =>
      java.lang.Long.compare(x.toLong, y.toEpochDay)
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
      // `<>` / NOT IN / string predicates: a null value (or null
      // comparand) matches nothing — SQL's unknown→false, the same
      // mapping as every claimed leaf
      case Not(EqualTo(a, v)) => v != null && nonNull(a).exists(cmp(_, v) != 0)
      case Not(In(a, vs)) => vs != null && vs.nonEmpty && vs.forall(_ != null) &&
        nonNull(a).exists(x => vs.forall(cmp(x, _) != 0))
      case StringStartsWith(a, v) =>
        v != null && nonNull(a).exists(_.toString.startsWith(v))
      case StringEndsWith(a, v) =>
        v != null && nonNull(a).exists(_.toString.endsWith(v))
      case StringContains(a, v) =>
        v != null && nonNull(a).exists(_.toString.contains(v))
      // negation-free compounds: unknown→false per leg, exact through
      // the monotone lattice (claimed only for pushable legs; an
      // unknown RUNTIME shape inside a compound keeps the partition)
      case Or(l, r) => eval(l, parts) || eval(r, parts)
      case And(l, r) => eval(l, parts) && eval(r, parts)
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
  // key-grouped planning (one split per partition directory, each
  // carrying its key as KeyGroupedPartitioning) is taken when it can
  // PAY: a complete pushed aggregate (per-group splits are the
  // correctness contract — the reader folds each group to one FINAL
  // row), or a plain read under storage-partitioned-join mode
  // (spark.sql.sources.v2.bucketing.enabled), where cell-clustered
  // plans skip the exchange. Otherwise Spark ignores the reported
  // partitioning entirely, and one split per directory just multiplies
  // task overhead (round-11: 81 tiny-cell tasks ran 3 waves where
  // spark.read.parquet ran one) — so plain reads bin-pack files into
  // Spark-sized splits instead, with per-file partition constants.
  private lazy val bucketingOn: Boolean =
    SparkSession.active.sessionState.conf.getConfString(
      "spark.sql.sources.v2.bucketing.enabled", "false").toBoolean

  private def aggGroupsByAllPartCols: Boolean = agg.exists { a =>
    val names = a.groupByExpressions.flatMap {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head)
      case _ => None
    }
    names.toSet == partCols && names.length == partColsOrdered.length
  }

  private def grouped: Boolean = partColsOrdered.nonEmpty &&
    (if (agg.nonEmpty) aggGroupsByAllPartCols else bucketingOn)

  override def outputPartitioning(): Partitioning =
    if (grouped) {
      new KeyGroupedPartitioning(
        partColsOrdered.map(c => Expressions.identity(c)).toArray,
        planInputPartitions().length)
    } else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)

  private def packFiles(
      files: Seq[(String, Long, Map[String, Any])]): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.conf
    GraftIndexScan.binPack(files, conf.filesOpenCostInBytes,
      conf.filesMaxPartitionBytes,
      SparkSession.active.sparkContext.defaultParallelism,
      partColsOrdered.map(c => c -> partType(c)))
  }

  // ---- execution ------------------------------------------------------
  override def planInputPartitions(): Array[InputPartition] = {
    val files = selectedFiles
    val typedPartOrder = partColsOrdered.map(c => c -> partType(c))
    if (agg.nonEmpty && !grouped) {
      // Partial (ungrouped) pushdown packs ~core-count splits: the
      // footer-agg reader already folds every file of a split into ONE
      // partial row, and a zero-IO footer fold is pure task overhead —
      // one split per FILE (round-12's plan) ran 40 tasks where the
      // equivalent parquet decode ran 28 on the tiny-file fixture, and
      // the scheduling delta WAS the measured count-shape gap. Only
      // when the partial row carries partition columns (an agg grouped
      // by a partition-column subset) must splits stay same-partition.
      val aggUsesParts =
        aggSchema.exists(_.fields.exists(f => partCols(f.name)))
      if (!aggUsesParts) {
        val par = math.max(1,
          SparkSession.active.sparkContext.defaultParallelism)
        val per = math.max(1, (files.size + par - 1) / par)
        files.map(_._1).sorted.grouped(per).map(fs =>
          GraftIndexInputPartition(fs, Map.empty,
            Seq.empty): InputPartition).toArray
      } else {
        files.groupBy(_._3).toSeq
          .sortBy(_._1.toSeq.sortBy(_._1)
            .map(kv => String.valueOf(kv._2)).mkString("/"))
          .map { case (parts, fs) =>
            GraftIndexInputPartition(fs.map(_._1).sorted, parts,
              typedPartOrder): InputPartition
          }.toArray
      }
    } else if (grouped) {
      files.groupBy(_._3).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).map(kv => String.valueOf(kv._2)).mkString("/"))
        .map { case (parts, fs) =>
          GraftIndexInputPartition(fs.map(_._1).sorted, parts,
            typedPartOrder): InputPartition
        }.toArray
    } else {
      packFiles(files)
    }
  }

  /** STREAMING read face (round-11, offset compacted round-12): a
    * MicroBatchStream over the table's file population — each trigger's
    * batch is the set of data files not yet emitted, so an index with an
    * append lifecycle (vecs/cells admissions via appendToIvfIndex/
    * appendToGraphIndex) streams its admissions in arrival order.
    * Contract notes:
    *  - APPEND-ONLY sub-tables only: a dynamically-overwritten table
    *    (edges) re-emits the rewritten partitions' files as fresh
    *    batches — by design those are the re-admitted rows, but
    *    exactly-once row delivery is only guaranteed where files are
    *    immutable once written.
    *  - The OFFSET is a POSITION in a checkpoint-local admission log
    *    (round-12; see [[GraftIndexMicroBatchStream]]) — O(1) bytes
    *    regardless of how many files the stream has ever admitted. The
    *    round-11 full-file-list offset serialized O(total files) JSON
    *    into EVERY checkpoint commit and diffed it per trigger — on a
    *    long-lived 100 TB index the offset itself became the
    *    bottleneck. Legacy list offsets still deserialize (v1
    *    checkpoints restart cleanly).
    *  - Claimed pushdown stays honored: partition filters gate which
    *    files enter offsets, data filters ride the same reader factory
    *    (vectorized residue) as the batch lane.
    *  - ADMISSION CONTROL (round-11, [[SupportsAdmissionControl]] +
    *    [[SupportsTriggerAvailableNow]]): `maxFilesPerTrigger` /
    *    `maxBytesPerTrigger` read options cap each micro-batch at N
    *    files / ~N bytes (always at least one file, so an oversized
    *    file still makes progress) — without a cap, a restart against
    *    a long-lived index would replay the ENTIRE backlog as one
    *    giant batch, the exact failure mode rate limits exist for at
    *    100 TB. Trigger.AvailableNow snapshots the listing up front
    *    and drains exactly that snapshot in capped batches, then
    *    stops — late admissions wait for the next run.
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    /** Admitted data files (path, size), sorted by path — the sort
      * makes per-trigger caps deterministic in arrival-then-name
      * order and log-entry contents stable.
      */
    def admitted(): Seq[(String, Long)] = {
      val filters = pushedPart // partition filters gate admission
      GraftIndexTable.listFiles(path)
        .map { case (f, len, raw) =>
          (f, len, raw.map { case (k, v) => k -> parse(v, partType(k)) })
        }
        .filter { case (_, _, parts) => filters.forall(eval(_, parts)) }
        .map(t => (t._1, t._2)).sortBy(_._1)
    }
    /** Partition values re-derived from the file PATH (its name=value
      * segments), so planning a committed range never needs the
      * directory to still list the same way it did at offset time.
      */
    def partValuesOf(file: String): Map[String, Any] =
      file.split('/').collect {
        case GraftIndexTable.PartDirRx(name, value) =>
          name -> parse(value, partType(name))
      }.toMap
    new GraftIndexMicroBatchStream(path, checkpointLocation,
      () => admitted(), partValuesOf,
      partColsOrdered.map(c => c -> partType(c)),
      maxFilesPerTrigger, maxBytesPerTrigger, logRetention == "committed",
      () => {
        val conf = SparkSession.active.sparkContext.broadcast(
          new SerializableConfiguration(GraftIndexTable.activeHadoopConf()))
        new GraftIndexReaderFactory(readSchema(),
          readSchema().fields.map(f => constCol(f.name)),
          pushedData, tableSchema, limit, conf, forceRowLane, forceGraftLane,
          hintData)
      })
  }

  /** Columns the readers fill as per-file CONSTANTS (never decoded):
    * partition values from the directory chain, and the `_file` lineage
    * metadata column — unless the table carries a REAL column of that
    * name, in which case Spark never routes the metadata request here
    * and the field must decode normally.
    */
  private def constCol(name: String): Boolean =
    partCols.contains(name) || (name == GraftIndexTable.FileCol &&
      !tableSchema.fieldNames.contains(name))

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = readSchema()
    // the DRIVER's Hadoop configuration, BROADCAST to executors:
    // executor-side opens must see the same fs credentials/overrides the
    // planning-time listing saw (a bare `new Configuration()` silently
    // drops spark.hadoop.* and reads the wrong filesystem off-local).
    // Broadcast, not embedded: a Configuration deserializes by parsing
    // ~100 KB of XML, and embedding it in the factory re-paid that on
    // EVERY task — measured at ~45 ms/task, 67% of total task time on a
    // many-small-partition index scan (round-11); the broadcast
    // deserializes once per executor JVM, like Spark's own file scans
    val conf = SparkSession.active.sparkContext.broadcast(
      new SerializableConfiguration(GraftIndexTable.activeHadoopConf()))
    agg match {
      case Some(a) => new GraftIndexAggReaderFactory(a, aggSchema.get,
        aggSchema.get.fields.map(f => partCols.contains(f.name)), conf)
      case None => new GraftIndexReaderFactory(schema,
        schema.fields.map(f => constCol(f.name)),
        pushedData, tableSchema, limit, conf, forceRowLane, forceGraftLane,
        hintData)
    }
  }
}

object GraftIndexScan {
  /** Spark's own file-split sizing, as a pure function (unit-pinned at
    * 100 TB shapes by GraftIndexSourceSpec): bins close at
    * min(maxPartitionBytes, max(openCost, total/parallelism)); a file
    * LARGER than that is first sliced into byte ranges of that size
    * (round-12 — parquet files are splittable, and Spark's own scans
    * split them; a mounted big-file dataset previously planned one
    * whole-file task per 1 GB file, an 8× parallelism loss at 128 MB
    * maxPartitionBytes); slices then pack largest-first, each costed
    * at size + openCost. Row-group assignment per slice follows the
    * midpoint rule every parquet engine uses, so each row group
    * belongs to exactly one slice and a sliced read is a partition of
    * the file's rows.
    */
  private[graft] def binPack(files: Seq[(String, Long, Map[String, Any])],
      openCost: Long, maxBytes: Long, parallelism: Int,
      typedPartOrder: Seq[(String, DataType)]): Array[InputPartition] = {
    val totalBytes = files.map(_._2 + openCost).sum
    // clamp ≥ 1: openCostInBytes=0 with parallelism > totalBytes would
    // compute 0 and turn the slice range's step into a crash
    val maxSplit = math.max(1L, math.min(maxBytes,
      math.max(openCost, totalBytes / math.max(1, parallelism))))
    // slice big files into [start, start+len) ranges of maxSplit
    val slices: Seq[(String, Long, Long, Map[String, Any])] =
      files.flatMap { case (f, len, parts) =>
        if (len <= maxSplit) Seq((f, 0L, GraftIndexRange.Whole, parts))
        else (0L until len by maxSplit).map(off =>
          (f, off, math.min(maxSplit, len - off), parts))
      }
    def costOf(len: Long, fileLen: Long): Long =
      (if (len == GraftIndexRange.Whole) fileLen else len) + openCost
    val lenOf = files.map(f => f._1 -> f._2).toMap
    val splits = scala.collection.mutable.ArrayBuffer[InputPartition]()
    val cur = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Map[String, Any])]()
    var curBytes = 0L
    def closeSplit(): Unit = if (cur.nonEmpty) {
      splits += GraftIndexPackedPartition(cur.toSeq, typedPartOrder)
      cur.clear(); curBytes = 0L
    }
    // Spark's exact close rule (FilePartition.getFilePartitions): a bin
    // closes when the accumulated cost plus the next slice's DATA bytes
    // would pass maxSplit; the openCost joins the accumulator only
    // after admission. Testing `accumulated + len + openCost` instead
    // (round-12's rule) closed tiny-file bins one file early — on an
    // index-cell table (~100 KB files, 4 MB openCost) that planned ~2×
    // Spark's task count, and the per-task overhead WAS the measured
    // full-projection gap to the parquet twin (LaneBench: 41 vs 28
    // tasks at identical ms/task).
    slices.sortBy(s => (-costOf(s._3, lenOf(s._1)), s._1, s._2))
      .foreach { case (f, start, len, parts) =>
        val dataLen = if (len == GraftIndexRange.Whole) lenOf(f) else len
        if (cur.nonEmpty && curBytes + dataLen > maxSplit) closeSplit()
        cur += ((f, start, len, parts)); curBytes += dataLen + openCost
      }
    closeSplit()
    splits.toArray
  }
}

/** Byte-range helpers for within-file splits (round-12). A slice is
  * (start, len) with `len == Whole` meaning the entire file; a row
  * group belongs to the slice containing its MIDPOINT — the rule
  * parquet-mr's own range filtering and Spark's scans use, so slices
  * partition a file's rows exactly.
  */
object GraftIndexRange {
  val Whole: Long = Long.MaxValue

  def endOf(start: Long, len: Long): Long =
    if (len == Whole) Long.MaxValue else start + len

  def blockIn(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
      start: Long, len: Long): Boolean = {
    val mid = b.getStartingPos + b.getCompressedSize / 2
    mid >= start && mid < endOf(start, len)
  }

  def blocksIn(footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      start: Long, len: Long): java.util.List[org.apache.parquet.hadoop.metadata.BlockMetaData] =
    if (len == Whole && start == 0L) footer.getBlocks
    else {
      val out = new java.util.ArrayList[org.apache.parquet.hadoop.metadata.BlockMetaData]()
      val it = footer.getBlocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        if (blockIn(b, start, len)) out.add(b)
      }
      out
    }

  /** Row count of the slice, from the cached footer — zero data IO. */
  def rows(file: String, conf: Configuration, start: Long, len: Long): Long = {
    if (len == Whole && start == 0L)
      return GraftFooterCache.recordCount(file, conf)
    val blocks = blocksIn(GraftFooterCache.footer(file, conf), start, len)
    var n = 0L
    var i = 0
    while (i < blocks.size()) { n += blocks.get(i).getRowCount; i += 1 }
    n
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

/** Bin-packed split for plain (non-key-grouped) reads: entries are
  * byte-range SLICES (path, start, len, partition values) — len =
  * [[GraftIndexRange.Whole]] means the entire file. Files may span
  * DIFFERENT partition directories, so each slice carries its own
  * partition values — the readers swap the partition-constant row per
  * slice.
  */
case class GraftIndexPackedPartition(
    files: Seq[(String, Long, Long, Map[String, Any])],
    partOrder: Seq[(String, DataType)]) extends InputPartition

/** LEGACY (v1, round-11) streaming offset: the SORTED data-file list
  * seen so far, as a JSON string array — O(total files) serialized into
  * every checkpoint commit, which is exactly why round-12 replaced it
  * with [[GraftIndexLogOffset]]. Kept for two jobs: deserializing v1
  * checkpoints (a restart against an old WAL migrates seamlessly — its
  * file list becomes the base seen-set), and as the hostile-path-safe
  * JSON array codec the admission log's entries reuse.
  */
case class GraftIndexStreamOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.sorted.map(f =>
      "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

/** Streaming offset of the graft-index MicroBatchStream (v2, round-12):
  * a POSITION in the checkpoint-local admission log — `seq` = number of
  * log entries covered. O(1) bytes in the total file population: the
  * log entry holds the file list, the offset only points at it, so a
  * year of checkpoints against a 100 TB index stays flat where the v1
  * list offset grew without bound. Case-class equality agrees with json
  * equality, so an unchanged log position plans no batch.
  */
case class GraftIndexLogOffset(seq: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"v":2,"seq":$seq}"""
}

object GraftIndexLogOffset {
  private val Rx = """\s*\{\s*"v"\s*:\s*2\s*,\s*"seq"\s*:\s*(\d+)\s*\}\s*""".r
  def fromJson(json: String): Option[GraftIndexLogOffset] = json match {
    case Rx(n) => Some(GraftIndexLogOffset(n.toLong))
    case _ => None
  }
}

/** Telemetry-only frontier ([[GraftIndexMicroBatchStream.reportLatestOffset]]):
  * the current log position plus how many admitted files await logging.
  * Surfaces in StreamingQueryProgress as the source's latestOffset; the
  * engine never deserializes it for planning.
  */
case class GraftIndexStreamFrontier(seq: Long, pendingFiles: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    s"""{"v":2,"seq":$seq,"pendingFiles":$pendingFiles}"""
}

/** The graft-index streaming face (named class round-12, when the
  * offset moved behind a metadata log). Mechanics, FileStreamSource-
  * style:
  *
  *  - `<checkpoint>/graft-admitted/<seq>` holds the file list each
  *    micro-batch admitted (the v1 offset codec — hostile-path-safe
  *    JSON), written ATOMICALLY (temp + rename) by latestOffset BEFORE
  *    the offset naming it can reach the WAL. The offset is just the
  *    entry number.
  *  - Restart: the cumulative seen-set rebuilds by folding the log once
  *    (O(total files) ONCE per restart, not per commit); entries logged
  *    but never committed (a crash between log write and WAL write)
  *    replay one entry per trigger — same files, deterministically,
  *    because planning reads the entry, never the live listing.
  *  - A v1 (file-list) start offset from an old checkpoint acts as a
  *    base seen-set under log position 0 — the stream migrates to log
  *    offsets on its first new admission.
  *  - Per-trigger work: ONE directory listing, computed in latestOffset
  *    and reused by reportLatestOffset (round-11 ADVICE: the telemetry
  *    path re-walked the directory every trigger), diffed against the
  *    in-memory seen-set (maintained incrementally, not rebuilt per
  *    trigger).
  */
class GraftIndexMicroBatchStream(
    path: String,
    checkpointLocation: String,
    admitted: () => Seq[(String, Long)],
    partValuesOf: String => Map[String, Any],
    typedPartOrder: Seq[(String, DataType)],
    maxFilesPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    retainCommittedOnly: Boolean,
    readerFactory: () => PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles}

  private val logDir = new Path(checkpointLocation, "graft-admitted")
  private def fs = logDir.getFileSystem(GraftIndexTable.activeHadoopConf())

  private[graft] def ckptForTest: String = checkpointLocation

  // ---- admission log ---------------------------------------------------
  /** Highest entry number on disk, listed ONCE per stream instance —
    * only this instance appends afterwards (Spark runs one driver-side
    * stream per source), so the in-memory counter stays authoritative.
    */
  private lazy val initialMaxSeq: Long = {
    // compact snapshots count: after the retention janitor folds and
    // deletes every committed entry, a fully-drained log is just
    // `<seq>.compact` — restarting at 0 would admit a lower offset than
    // the WAL already holds
    if (!fs.exists(logDir)) 0L
    else fs.listStatus(logDir).flatMap(s => seqOfName(s.getPath.getName))
      .foldLeft(0L)(math.max)
  }

  /** Entry or snapshot name → its log position (None for `.tmp`,
    * `0.base`, and anything else).
    */
  private def seqOfName(n: String): Option[Long] =
    n.toLongOption.orElse(
      if (n.endsWith(".compact")) n.stripSuffix(".compact").toLongOption
      else None)
  private var maxSeqState: Long = -1L
  private def maxSeq: Long = {
    if (maxSeqState < 0) maxSeqState = initialMaxSeq
    maxSeqState
  }

  private def entryPath(seq: Long) = new Path(logDir, seq.toString)

  /** Entry reads actually performed — the restart-cost spec's probe. */
  private[graft] val entryReads = new java.util.concurrent.atomic.AtomicLong

  private def readList(p: Path): Seq[String] = {
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    GraftIndexStreamOffset.fromJson(text).files
  }

  private def writeList(p: Path, files: Iterable[String]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(GraftIndexStreamOffset(files.toSeq).json()
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, p),
      s"graft-index: failed to write admission-log file $p")
  }

  private def readEntry(seq: Long): Seq[String] = {
    entryReads.incrementAndGet()
    readList(entryPath(seq))
  }

  /** Every CompactEvery-th entry also writes a `<seq>.compact` snapshot
    * of the cumulative file set, so a restart's seen-set fold reads one
    * snapshot + the recent entries instead of the whole log — per-entry
    * files are RETAINED (they are what committed ranges replan from);
    * the snapshot only accelerates the fold.
    */
  private val CompactEvery = 16L
  private def compactPath(seq: Long) = new Path(logDir, s"$seq.compact")

  private def writeEntry(seq: Long, files: Seq[String]): Unit = {
    writeList(entryPath(seq), files)
    if (seq % CompactEvery == 0) {
      // seenFiles is loaded through seq-1 here (latestOffset folds
      // before admitting), so the snapshot is exact
      writeList(compactPath(seq), seenFiles ++ files)
    }
  }

  /** Cumulative seen-set: files in entries 1..loadedSeq, extended
    * incrementally. A restart folds the newest compact snapshot ≤ the
    * target, then only the entries past it — O(recent), not O(log).
    */
  private var loadedSeq = 0L
  private val seenFiles = scala.collection.mutable.HashSet[String]()
  private def loadThrough(seq: Long): Unit = {
    if (loadedSeq == 0 && seq > 0) {
      // newest snapshot ≤ seq, found by ONE listing (was an exists-probe
      // walk over CompactEvery multiples — the retention janitor also
      // writes snapshots at commit seqs, which land on arbitrary
      // positions, and after it deletes folded entries the snapshot is
      // the only source for them)
      val snaps =
        if (!fs.exists(logDir)) Array.empty[Long]
        else fs.listStatus(logDir).map(_.getPath.getName)
          .filter(_.endsWith(".compact"))
          .flatMap(_.stripSuffix(".compact").toLongOption)
          .filter(_ <= seq)
      if (snaps.nonEmpty) {
        val s = snaps.max
        seenFiles ++= readList(compactPath(s))
        loadedSeq = s
      }
    }
    while (loadedSeq < seq) {
      loadedSeq += 1
      seenFiles ++= readEntry(loadedSeq)
    }
  }

  /** v1 (round-11 file-list) start offsets act as a base seen-set —
    * persisted as `0.base` the first time one is seen, so the
    * migration survives a LATER restart whose WAL start is already a
    * v2 log offset (the v1 list would otherwise exist nowhere and its
    * files would re-admit).
    */
  @volatile private var v1Seen: Set[String] = Set.empty
  private lazy val basePath = new Path(logDir, "0.base")
  @volatile private var baseChecked = false
  private def ensureBaseLoaded(): Unit = if (!baseChecked) {
    baseChecked = true
    if (fs.exists(basePath)) v1Seen = v1Seen ++ readList(basePath)
  }
  private def seqOf(o: Offset): Long = o match {
    case GraftIndexLogOffset(s) => s
    case GraftIndexStreamOffset(files) =>
      v1Seen = v1Seen ++ files // migrating from a v1 checkpoint
      if (!fs.exists(basePath)) writeList(basePath, files)
      0L
    case other => throw new IllegalStateException(
      s"graft-index: unexpected stream offset $other")
  }

  /** Files covered by entries (fromSeq, toSeq], sorted. Test hook +
    * planning primitive.
    */
  private[graft] def filesBetween(fromSeq: Long, toSeq: Long): Seq[String] =
    ((fromSeq + 1) to toSeq).flatMap(readEntry).sorted

  /** All files an offset covers (entries 1..seq, or the v1 list). */
  private[graft] def filesThrough(o: Offset): Seq[String] = o match {
    case GraftIndexLogOffset(s) => filesBetween(0L, s)
    case GraftIndexStreamOffset(files) => files.sorted
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  // ---- admission control ----------------------------------------------
  /** Trigger.AvailableNow contract: every latestOffset call of this
    * run sees the SAME listing, taken here — the run drains exactly
    * this snapshot and terminates even while admissions keep landing.
    */
  @volatile private var availableNowSnapshot: Option[Seq[(String, Long)]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(admitted())

  override def getDefaultReadLimit: ReadLimit = {
    val lims = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes)
    lims match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Longest prefix of `fresh` within the limit. maxBytes admits
    * files while the running total fits, but always at least one
    * (FileStreamSource semantics: an oversized file must not wedge
    * the stream). Composite limits intersect to the most
    * restrictive prefix.
    */
  private def cap(fresh: Seq[(String, Long)],
      limit: ReadLimit): Seq[(String, Long)] = limit match {
    case mf: ReadMaxFiles => fresh.take(mf.maxFiles)
    case mb: ReadMaxBytes =>
      val cum = fresh.scanLeft(0L)(_ + _._2).tail
      val n = cum.indexWhere(_ > mb.maxBytes()) match {
        case -1 => fresh.length
        case 0 => 1
        case i => i
      }
      fresh.take(n)
    case c: CompositeReadLimit => c.getReadLimits.foldLeft(fresh)(cap)
    case _ => fresh // ReadAllAvailable / ReadMinRows: everything
  }

  /** The trigger's ONE listing, shared with reportLatestOffset. */
  @volatile private var lastListing: Seq[(String, Long)] = null

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startSeq = seqOf(start)
    ensureBaseLoaded()
    // crash recovery: entries logged but not yet in the WAL replay
    // AS LOGGED, one per trigger — same files, same caps as when they
    // were admitted, no re-listing
    if (maxSeq > startSeq) return GraftIndexLogOffset(startSeq + 1)
    val all = availableNowSnapshot.getOrElse(admitted())
    lastListing = all
    loadThrough(maxSeq)
    val taken = cap(all.filterNot(f =>
      seenFiles(f._1) || v1Seen(f._1)), limit)
    if (taken.isEmpty) start // equal offsets → no batch planned
    else {
      val next = maxSeq + 1
      writeEntry(next, taken.map(_._1))
      maxSeqState = next
      GraftIndexLogOffset(next)
    }
  }

  /** Progress telemetry only: the log position plus the uncapped
    * backlog, measured on the SAME listing latestOffset took this
    * trigger (round-11 ADVICE: a second full directory walk per
    * trigger, purely for telemetry).
    */
  override def reportLatestOffset(): Offset = {
    val listing = lastListing match {
      case null => val l = admitted(); lastListing = l; l
      case l => l
    }
    ensureBaseLoaded()
    loadThrough(maxSeq)
    val pending = listing.count(f => !seenFiles(f._1) && !v1Seen(f._1))
    GraftIndexStreamFrontier(maxSeq, pending)
  }

  override def initialOffset(): Offset = GraftIndexLogOffset(0)
  // legacy single-arg form — the engine calls the
  // SupportsAdmissionControl overload; kept total (uncapped, from the
  // current log position) as a safety net rather than throwing
  override def latestOffset(): Offset =
    latestOffset(GraftIndexLogOffset(maxSeq), ReadLimit.allAvailable())
  override def deserializeOffset(json: String): Offset =
    if (json.trim.startsWith("["))
      GraftIndexStreamOffset.fromJson(json) // v1 checkpoint
    else GraftIndexLogOffset.fromJson(json).getOrElse(
      throw new IllegalStateException(
        s"graft-index: unparseable stream offset: $json"))
  /** Retention janitor (round-13, opt-in via
    * `.option("admissionLogRetention", "committed")`). Entry files are
    * what committed ranges replan from, so by default they are retained
    * forever — but an entry at or below the newest COMMITTED offset can
    * never be replanned (Spark restarts at the last commit), and on a
    * year-lived stream the log directory itself becomes an
    * O(admissions) listing. On each commit: fold entries 1..committed
    * into a `<committed>.compact` snapshot (the restart seen-set fold
    * already prefers the newest snapshot), then delete the folded
    * entries and the older, now-redundant snapshots. Entries PAST the
    * committed offset — the only ones a restart replans — are never
    * touched, and neither is the v1-migration `0.base`.
    */
  private var janitorSeq = 0L
  override def commit(end: Offset): Unit = if (retainCommittedOnly) {
    val s = seqOf(end)
    if (s > janitorSeq) {
      // snapshot at the seen-set's position (≥ s after the fold —
      // loadedSeq usually already runs one entry ahead of the commit):
      // a snapshot is valid at ANY position, it just says "the union
      // of entries 1..here", and the restart fold always starts from
      // the newest one ≤ its target (= maxSeq ≥ this)
      loadThrough(s)
      val snapSeq = loadedSeq
      if (!fs.exists(compactPath(snapSeq)))
        writeList(compactPath(snapSeq), seenFiles)
      fs.listStatus(logDir).foreach { st =>
        val n = st.getPath.getName
        val deletable = n.toLongOption.exists(_ <= s) ||
          (n.endsWith(".compact") &&
            n.stripSuffix(".compact").toLongOption.exists(_ < snapSeq))
        if (deletable) fs.delete(st.getPath, false)
      }
      janitorSeq = s
    }
  }
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val fresh = (start, end) match {
      case (s: GraftIndexLogOffset, e: GraftIndexLogOffset) =>
        filesBetween(s.seq, e.seq)
      case (s: GraftIndexStreamOffset, e: GraftIndexLogOffset) =>
        // v1 → v2 migrated range: entries never contain v1-seen files
        filesBetween(0L, e.seq).filterNot(s.files.toSet)
      case (s: GraftIndexStreamOffset, e: GraftIndexStreamOffset) =>
        // legacy replan of a fully-v1 committed range: set difference
        e.files.filterNot(s.files.toSet).sorted
      case other => throw new IllegalStateException(
        s"graft-index: unplannable offset range $other")
    }
    if (fresh.isEmpty) return Array.empty
    // size-aware packing with within-file range slices (round-13): the
    // batch lane's binPack, so a big admitted file (a compaction output,
    // a mounted bulk load) splits into byte ranges exactly like Spark's
    // own parquet scans instead of wedging the whole batch behind one
    // task — readers already honor ranges via the row-group midpoint
    // rule, so slices partition the file's rows exactly. Index-sized
    // files keep whole-file packing (len ≤ effective split size).
    // Lengths come from one getFileStatus per fresh file; admitted files
    // are immutable, so a committed range replans to the same rows
    // regardless of when the status is taken.
    val sconf = SparkSession.active.sessionState.conf
    val dataFs = new Path(path).getFileSystem(
      GraftIndexTable.activeHadoopConf())
    GraftIndexScan.binPack(
      fresh.map(f => (f, dataFs.getFileStatus(new Path(f)).getLen,
        partValuesOf(f))),
      sconf.filesOpenCostInBytes, sconf.filesMaxPartitionBytes,
      math.max(1, SparkSession.active.sparkContext.defaultParallelism),
      typedPartOrder)
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory()
}

object GraftIndexStreamOffset {
  /** Parse the json() form back (strings with \\ and \" escapes). */
  def fromJson(json: String): GraftIndexStreamOffset = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < json.length) {
      val c = json.charAt(i)
      if (!inStr) {
        if (c == '"') { inStr = true; sb.clear() }
      } else c match {
        case '\\' =>
          require(i + 1 < json.length, s"dangling escape in offset: $json")
          sb.append(json.charAt(i + 1)); i += 1
        case '"' => inStr = false; out += sb.toString
        case other => sb.append(other)
      }
      i += 1
    }
    require(!inStr, s"unterminated string in offset json: $json")
    GraftIndexStreamOffset(out.toSeq)
  }
}

object GraftIndexFilters {

  /** Partially evaluate a claimed filter for ONE file of an evolved set,
    * under the rule "a column the file lacks is NULL for every row":
    * Left(true) = the filter passes every row (drop the conjunct),
    * Left(false) = it drops every row (skip the file), Right(residual)
    * = still data-dependent, references only present columns. Flat
    * leaves reproduce the historical behavior (IsNull over an absent
    * column passes, anything else skips); compounds fold leg by leg —
    * without this, `Or(v > 5, IsNull(w))` with `w` absent would skip
    * rows whose `v > 5` leg matches.
    */
  def forFile(f: Filter, present: Set[String]): Either[Boolean, Filter] =
    f match {
      case f if f.references.forall(present) => Right(f)
      case IsNull(a) if !present(a) => Left(true)
      case And(l, r) => (forFile(l, present), forFile(r, present)) match {
        case (Left(false), _) | (_, Left(false)) => Left(false)
        case (Left(true), x) => x
        case (x, Left(true)) => x
        case (Right(a), Right(b)) => Right(And(a, b))
      }
      case Or(l, r) => (forFile(l, present), forFile(r, present)) match {
        case (Left(true), _) | (_, Left(true)) => Left(true)
        case (Left(false), x) => x
        case (x, Left(false)) => x
        case (Right(a), Right(b)) => Right(Or(a, b))
      }
      // any other claimed leaf over an absent (all-null) column matches
      // nothing: EqualTo/In/ranges/Not(EqualTo) need a non-null value,
      // IsNotNull fails
      case _ => Left(false)
    }

  /** Spark source Filter → parquet FilterPredicate for the claimed
    * shapes; types resolved from the table schema.
    */
  def toParquet(f: Filter, schema: StructType): FilterPredicate = {
    def dt(n: String) = schema.find(_.name == n).get.dataType
    def eq(n: String, v: Any): FilterPredicate = dt(n) match {
      case LongType => FilterApi.eq(FilterApi.longColumn(n),
        if (v == null) null else java.lang.Long.valueOf(v.asInstanceOf[Number].longValue))
      case IntegerType | ShortType | ByteType => FilterApi.eq(FilterApi.intColumn(n),
        if (v == null) null else java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue))
      case DoubleType => FilterApi.eq(FilterApi.doubleColumn(n),
        if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue))
      case FloatType => FilterApi.eq(FilterApi.floatColumn(n),
        if (v == null) null else java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue))
      case StringType => FilterApi.eq(FilterApi.binaryColumn(n),
        if (v == null) null else Binary.fromString(v.toString))
      // DATE is INT32 epoch days on both sides (round-12)
      case DateType => FilterApi.eq(FilterApi.intColumn(n),
        if (v == null) null
        else java.lang.Integer.valueOf(GraftIndexDate.toDays(v)))
      case other => throw new IllegalStateException(s"eq over $other")
    }
    def notEqNull(n: String): FilterPredicate = dt(n) match {
      case LongType => FilterApi.notEq(FilterApi.longColumn(n), null.asInstanceOf[java.lang.Long])
      case IntegerType | ShortType | ByteType => FilterApi.notEq(FilterApi.intColumn(n), null.asInstanceOf[java.lang.Integer])
      case DoubleType => FilterApi.notEq(FilterApi.doubleColumn(n), null.asInstanceOf[java.lang.Double])
      case FloatType => FilterApi.notEq(FilterApi.floatColumn(n), null.asInstanceOf[java.lang.Float])
      case StringType => FilterApi.notEq(FilterApi.binaryColumn(n),
        null.asInstanceOf[Binary])
      case DateType => FilterApi.notEq(FilterApi.intColumn(n),
        null.asInstanceOf[java.lang.Integer])
      case other => throw new IllegalStateException(s"notEq over $other")
    }
    def notEq(n: String, v: Any): FilterPredicate = dt(n) match {
      case LongType => FilterApi.notEq(FilterApi.longColumn(n),
        java.lang.Long.valueOf(v.asInstanceOf[Number].longValue))
      case IntegerType | ShortType | ByteType => FilterApi.notEq(FilterApi.intColumn(n),
        java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue))
      case DoubleType => FilterApi.notEq(FilterApi.doubleColumn(n),
        java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue))
      case FloatType => FilterApi.notEq(FilterApi.floatColumn(n),
        java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue))
      case StringType => FilterApi.notEq(FilterApi.binaryColumn(n),
        Binary.fromString(v.toString))
      case DateType => FilterApi.notEq(FilterApi.intColumn(n),
        java.lang.Integer.valueOf(GraftIndexDate.toDays(v)))
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
      case IntegerType | ShortType | ByteType =>
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
      case DateType =>
        val c = FilterApi.intColumn(n)
        val x = java.lang.Integer.valueOf(GraftIndexDate.toDays(v))
        op match {
          case ">" => FilterApi.gt(c, x); case ">=" => FilterApi.gtEq(c, x)
          case "<" => FilterApi.lt(c, x); case _ => FilterApi.ltEq(c, x)
        }
      case other => throw new IllegalStateException(s"$op over $other")
    }
    // IN as parquet's native SET predicate (round-12): one hash-set
    // membership per record instead of an OR tree one node deep per
    // list element — a 10k-id serving IN list used to build a 10k-node
    // predicate tree (per-record visitor recursion AND stack depth
    // both O(list)); the set form is also what parquet's dictionary
    // pruning matches directly. Null semantics unchanged: in() never
    // matches null (eq-like).
    //
    // NOT IN deliberately does NOT use FilterApi.notIn: parquet-mr
    // 1.16's RECORD-LEVEL NotIn inspector is broken for sets with ≥2
    // values — its update() returns keep=true as soon as the value
    // differs from ANY set element (correct only for singletons), so a
    // claimed notIn would silently keep every non-null row (caught by
    // this repo's large-NOT-IN lane spec before it shipped). The old
    // And-of-notEq chain is no better at scale: a 5000-element NOT IN
    // builds a 5000-deep And tree and the record-level visitor
    // recursion overflows the task stack (also caught by the spec).
    // The claim instead rides [[GraftNotInSet]] — a UserDefinedPredicate
    // over the same hash set: exact keep (null never matches, SQL's
    // unknown→false by construction), one set lookup per record,
    // depth 1 however long the list.
    def inSet(n: String, vs: Array[Any]): FilterPredicate = dt(n) match {
      case LongType =>
        val s = new java.util.HashSet[java.lang.Long]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].longValue))
        FilterApi.in(FilterApi.longColumn(n), s)
      case IntegerType | ShortType | ByteType =>
        val s = new java.util.HashSet[java.lang.Integer]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].intValue))
        FilterApi.in(FilterApi.intColumn(n), s)
      case DoubleType =>
        val s = new java.util.HashSet[java.lang.Double]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].doubleValue))
        FilterApi.in(FilterApi.doubleColumn(n), s)
      case FloatType =>
        val s = new java.util.HashSet[java.lang.Float]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].floatValue))
        FilterApi.in(FilterApi.floatColumn(n), s)
      case StringType =>
        val s = new java.util.HashSet[Binary]()
        vs.foreach(v => s.add(Binary.fromString(v.toString)))
        FilterApi.in(FilterApi.binaryColumn(n), s)
      case DateType =>
        val s = new java.util.HashSet[java.lang.Integer]()
        vs.foreach(v => s.add(GraftIndexDate.toDays(v)))
        FilterApi.in(FilterApi.intColumn(n), s)
      case other => throw new IllegalStateException(s"in over $other")
    }
    def notInSet(n: String, vs: Array[Any]): FilterPredicate = dt(n) match {
      case LongType =>
        val s = new java.util.HashSet[java.lang.Long]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].longValue))
        FilterApi.userDefined(FilterApi.longColumn(n),
          new GraftNotInSet[java.lang.Long](s))
      case IntegerType | ShortType | ByteType =>
        val s = new java.util.HashSet[java.lang.Integer]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].intValue))
        FilterApi.userDefined(FilterApi.intColumn(n),
          new GraftNotInSet[java.lang.Integer](s))
      case DoubleType =>
        val s = new java.util.HashSet[java.lang.Double]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].doubleValue))
        FilterApi.userDefined(FilterApi.doubleColumn(n),
          new GraftNotInSet[java.lang.Double](s))
      case FloatType =>
        val s = new java.util.HashSet[java.lang.Float]()
        vs.foreach(v => s.add(v.asInstanceOf[Number].floatValue))
        FilterApi.userDefined(FilterApi.floatColumn(n),
          new GraftNotInSet[java.lang.Float](s))
      case StringType =>
        val s = new java.util.HashSet[Binary]()
        vs.foreach(v => s.add(Binary.fromString(v.toString)))
        FilterApi.userDefined(FilterApi.binaryColumn(n),
          new GraftNotInSet[Binary](s))
      case DateType =>
        val s = new java.util.HashSet[java.lang.Integer]()
        vs.foreach(v => s.add(GraftIndexDate.toDays(v)))
        FilterApi.userDefined(FilterApi.intColumn(n),
          new GraftNotInSet[java.lang.Integer](s))
      case other => throw new IllegalStateException(s"notIn over $other")
    }
    f match {
      case EqualTo(a, v) => eq(a, v)
      // `<>` / NOT IN under SQL semantics: parquet's bare notEq KEEPS
      // nulls, so the explicit not-null leg is mandatory for the claim
      case Not(EqualTo(a, v)) => FilterApi.and(notEqNull(a), notEq(a, v))
      case Not(In(a, vs)) =>
        FilterApi.and(notEqNull(a), notInSet(a, vs))
      // string predicates: user-defined parquet predicates — exact
      // record-level keep() (null never matches), min/max row-group
      // pruning for the prefix shape
      case StringStartsWith(a, v) => FilterApi.userDefined(
        FilterApi.binaryColumn(a), new GraftStartsWith(v))
      case StringEndsWith(a, v) => FilterApi.userDefined(
        FilterApi.binaryColumn(a), new GraftSubstring(v, atEnd = true))
      case StringContains(a, v) => FilterApi.userDefined(
        FilterApi.binaryColumn(a), new GraftSubstring(v, atEnd = false))
      case In(a, vs) => inSet(a, vs)
      case IsNull(a) => eq(a, null)
      case IsNotNull(a) => notEqNull(a)
      case GreaterThan(a, v) => rel(a, v, ">")
      case GreaterThanOrEqual(a, v) => rel(a, v, ">=")
      case LessThan(a, v) => rel(a, v, "<")
      case LessThanOrEqual(a, v) => rel(a, v, "<=")
      // negation-free compounds compose exactly (unknown→false per leg
      // on both engines; see dataPushable)
      case Or(l, r) => FilterApi.or(toParquet(l, schema), toParquet(r, schema))
      case And(l, r) => FilterApi.and(toParquet(l, schema), toParquet(r, schema))
      case other => throw new IllegalStateException(
        s"graft-index: unpushable filter claimed: $other")
    }
  }
}

/** Parquet user-defined predicate for `startsWith` (round-12): exact
  * record-level keep (a NULL value never matches — SQL's unknown→false
  * by construction) plus min/max row-group pruning — a value starting
  * with `prefix` is ≥ prefix and shares its first bytes, so a group
  * whose max (truncated to prefix length) sorts below the prefix, or
  * whose min (truncated) sorts above it, holds no match under the
  * unsigned lexicographic order parquet's binary stats use.
  */
private[sources] class GraftStartsWith(prefix: String)
    extends org.apache.parquet.filter2.predicate.UserDefinedPredicate[Binary]
    with Serializable {
  private val p = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  override def keep(value: Binary): Boolean = value != null && {
    val v = value.getBytesUnsafe
    v.length >= p.length && {
      var i = 0
      while (i < p.length && v(i) == p(i)) i += 1
      i == p.length
    }
  }
  override def canDrop(
      stat: org.apache.parquet.filter2.predicate.Statistics[Binary]): Boolean = {
    val cmp = org.apache.parquet.schema.PrimitiveComparator
      .UNSIGNED_LEXICOGRAPHICAL_BINARY_COMPARATOR
    val pb = Binary.fromReusedByteArray(p)
    val max = stat.getMax
    val min = stat.getMin
    cmp.compare(max.slice(0, math.min(p.length, max.length)), pb) < 0 ||
      cmp.compare(min.slice(0, math.min(p.length, min.length)), pb) > 0
  }
  // only consulted under a pushed NOT(this) — never claimed; keep all
  override def inverseCanDrop(
      stat: org.apache.parquet.filter2.predicate.Statistics[Binary]): Boolean =
    false
}

/** NOT IN as a parquet user-defined predicate (round-12): one hash-set
  * lookup per record at predicate depth 1, however long the exclusion
  * list. Exists because BOTH built-in routes fail at scale:
  * FilterApi.notIn's record-level inspector is broken for ≥2-value
  * sets in parquet-mr 1.16 (keeps any value differing from ANY
  * element), and an And-of-notEq chain overflows the visitor's
  * recursion at a few thousand elements. keep(null) = false — SQL's
  * unknown→false — so the surrounding And(IsNotNull, …) claim stays
  * exact. No stats pruning: an exclusion list says nothing useful
  * about a group's min/max.
  */
private[sources] class GraftNotInSet[T <: Comparable[T]](
    target: java.util.HashSet[T])
    extends org.apache.parquet.filter2.predicate.UserDefinedPredicate[T]
    with Serializable {
  override def keep(value: T): Boolean =
    value != null && !target.contains(value)
  override def canDrop(
      stat: org.apache.parquet.filter2.predicate.Statistics[T]): Boolean = false
  override def inverseCanDrop(
      stat: org.apache.parquet.filter2.predicate.Statistics[T]): Boolean = false
}

/** `endsWith` / `contains` twin: exact keep, no stats pruning (suffix
  * and substring membership say nothing about a group's min/max).
  */
private[sources] class GraftSubstring(needle: String, atEnd: Boolean)
    extends org.apache.parquet.filter2.predicate.UserDefinedPredicate[Binary]
    with Serializable {
  private val n = needle.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private def matchAt(v: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < n.length && v(off + i) == n(i)) i += 1
    i == n.length
  }
  override def keep(value: Binary): Boolean = value != null && {
    val v = value.getBytesUnsafe
    if (v.length < n.length) false
    else if (atEnd) matchAt(v, v.length - n.length)
    else {
      var off = 0
      var found = false
      while (!found && off <= v.length - n.length) {
        found = matchAt(v, off); off += 1
      }
      found
    }
  }
  override def canDrop(
      stat: org.apache.parquet.filter2.predicate.Statistics[Binary]): Boolean =
    false
  override def inverseCanDrop(
      stat: org.apache.parquet.filter2.predicate.Statistics[Binary]): Boolean =
    false
}

/** EXECUTOR-SIDE footer cache (round-12): a serving index is probed
  * repeatedly — every probe re-read and re-parsed each file's footer
  * (~8-10 ms/file, measured on both engines' public readers), which at
  * the index writers' small-file sizes dominated the filtered-scan gap
  * to the parquet twin. Footers are immutable once written (the index
  * lifecycle appends new files and dynamically overwrites whole
  * partitions with NEW part files — never rewrites a file in place),
  * so a (path, length, mtime)-keyed cache is exact; the mtime leg
  * costs one getFileStatus (~µs locally) against the ~10 ms parse it
  * saves. Bounded by entry count with random eviction (no LRU lock on
  * the 32-thread hot path); ~few KB per entry. The same move Trino's
  * metadata cache makes for its parquet serving path.
  */
private[graft] object GraftFooterCache {
  import org.apache.parquet.hadoop.metadata.ParquetMetadata
  private val MaxEntries = 4096
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), ParquetMetadata]()
  /** Cache-hit counter for the spec (reads must not re-parse). */
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong

  def footer(file: String, conf: Configuration): ParquetMetadata =
    footerWithLen(file, conf)._1

  /** Footer plus the file length from the SAME getFileStatus the cache
    * key needs anyway — callers that also want the length (split
    * construction) avoid a second stat (round-12).
    */
  def footerWithLen(file: String, conf: Configuration): (ParquetMetadata, Long) = {
    val p = new Path(file)
    val st = p.getFileSystem(conf).getFileStatus(p)
    val key = (file, st.getLen, st.getModificationTime)
    val cached = m.get(key)
    if (cached != null) { hits.incrementAndGet(); return (cached, st.getLen) }
    misses.incrementAndGet()
    val read = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      HadoopInputFile.fromPath(p, conf),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    if (m.size >= MaxEntries) {
      // random-ish eviction: drop one resident entry (a full clear
      // would stampede every thread back to disk at once)
      val it = m.keySet().iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    m.put(key, read)
    (read, st.getLen)
  }

  /** Row count without opening a reader (COUNT paths). */
  def recordCount(file: String, conf: Configuration): Long = {
    val blocks = footer(file, conf).getBlocks
    var n = 0L
    var i = 0
    while (i < blocks.size()) { n += blocks.get(i).getRowCount; i += 1 }
    n
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
    private[graft] val conf: org.apache.spark.broadcast.Broadcast[SerializableConfiguration],
    forceRowLane: Boolean = false, forceGraftLane: Boolean = false,
    // refused-claim HINTS for the delegated lane (nested-bearing
    // tables): parquet predicates for group/page pruning only — Spark
    // re-filters above, so they carry no exactness weight
    hintData: Array[Filter] = Array.empty,
    // session-SQL knobs captured at PLANNING time (the executor has no
    // SparkSession): exactly the keys Spark's own parquet scan copies
    // into its per-task Hadoop conf before handing it to the
    // vectorized reader
    sql: GraftSessionSql = GraftSessionSql.capture())
    extends PartitionReaderFactory {

  /** VECTORIZED lane eligibility. Round-10 shipped the lane for pure
    * projections (closing the documented ~35% full-scan penalty of the
    * Group-reader row path); round-11 extends it to scans with pushed
    * data filters and limits — the common real serving shape (probe +
    * row-group claim) no longer falls back to the slow row path. The
    * claimed filters keep their EXACT semantics: row-group pruning
    * happens at file open (footer stats via parquet's own
    * filterRowGroups), then the residue is re-evaluated VECTORIZED over
    * the decoded batch and survivors compact into the output batch —
    * same rows as parquet's record-level assembly, decoded columnar. A
    * filter column outside the projection decodes into a scratch vector
    * that never reaches the output. The zero-data-column, zero-filter
    * COUNT path stays on the footer-counting reader (zero decode beats
    * any decode).
    */
  private[graft] val columnarEligible: Boolean = {
    val dataFields = readSchema.fields.zip(isPart).collect { case (f, false) => f }
    // UNFILTERED scans delegate to Spark's own vectorized reader, which
    // decodes every type spark.read.parquet does — including DECIMAL
    // and nested struct/map/array (round-13): eligibility there is just
    // "something to decode". The type gates below govern only the
    // in-house lanes (forced graft lane, or filtered scans).
    if (pushedData.isEmpty && !forceGraftLane)
      !forceRowLane && dataFields.nonEmpty
    else {
      // DECIMAL is deliberately absent from the in-house columnar set:
      // filtered decimal scans fall back to the row lane's
      // annotation-driven convert
      def ok(dt: DataType): Boolean = dt match {
        case LongType | IntegerType | DoubleType | FloatType | StringType |
             BooleanType | TimestampType | DateType | BinaryType |
             ShortType | ByteType | TimestampNTZType => true
        case ArrayType(LongType | IntegerType | DoubleType | FloatType |
                       StringType, _) => true
        case _ => false
      }
      // pushed filters only ever reference flat primitives (dataPushable),
      // but verify against the table schema — an unknown shape must fall
      // back to the row lane, never decode wrong
      def flatPrim(n: String): Boolean =
        tableSchema.find(_.name == n).map(_.dataType).exists {
          case LongType | IntegerType | DoubleType | FloatType | StringType |
               BooleanType | TimestampType | DateType | ShortType |
               ByteType => true
          case _ => false
        }
      !forceRowLane &&
        (dataFields.nonEmpty || pushedData.nonEmpty) &&
        dataFields.forall(f => ok(f.dataType)) &&
        pushedData.forall(_.references.forall(flatPrim))
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean = columnarEligible

  /** Normalize both split kinds to (file, start, len, constant row):
    * partition values come from the split's directory chain, the
    * `_file` lineage column is the file path itself — all per-SLICE
    * constants. Key-grouped and agg splits are always whole files.
    */
  private def fileParts(p: InputPartition): Seq[(String, Long, Long, Array[Any])] = {
    def constOf(file: String, partValues: Map[String, Any]): Array[Any] =
      readSchema.fields.zip(isPart).map {
        case (f, true) =>
          // `_file` lineage metadata: the file path itself (a partition
          // column literally named _file would carry a partValues entry
          // and win — but then the metadata column is hidden anyway)
          if (f.name == GraftIndexTable.FileCol && !partValues.contains(f.name))
            UTF8String.fromString(file)
          else GraftIndexReaderFactory.toInternal(partValues(f.name), f.dataType)
        case _ => null
      }
    p match {
      case k: GraftIndexInputPartition =>
        k.files.map(f => (f, 0L, GraftIndexRange.Whole, constOf(f, k.partValues)))
      case pk: GraftIndexPackedPartition =>
        pk.files.map { case (f, s, l, pv) => (f, s, l, constOf(f, pv)) }
    }
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val dataFields = readSchema.fields.zip(isPart).collect {
      case (f, false) => f
    }
    // UNFILTERED decode delegates to Spark's own vectorized parquet
    // reader (round-12): with no residue to enforce, the connector adds
    // no decode-time value — and Spark's reader does bulk page decode
    // where the in-house ColumnReader path pays a per-value virtual
    // call, the measured ~40% full-projection gap to the parquet twin.
    // Filtered scans keep the in-house scratch-residue reader, whose
    // claim-exact semantics (and footer-cache row-group pruning)
    // already bench in the parquet twin's noise band.
    if (pushedData.isEmpty && !forceGraftLane)
      new GraftIndexSparkVectorReader(fileParts(p), readSchema, isPart,
        dataFields, limit, sql, conf.value.value, hintData, tableSchema)
    else
      new GraftIndexColumnarReader(fileParts(p), readSchema, isPart,
        dataFields, pushedData, tableSchema, limit, conf.value.value)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dataFields = readSchema.fields.zip(isPart).collect {
      case (f, false) => f
    }
    val base =
      if (dataFields.isEmpty && pushedData.isEmpty)
        new GraftIndexCountingReader(fileParts(p), readSchema, isPart,
          conf.value.value)
      else
        new GraftIndexRowReader(fileParts(p), readSchema, isPart,
          dataFields, pushedData, tableSchema, conf.value.value)
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

/** The session-SQL settings Spark's own parquet scan copies into each
  * task's Hadoop configuration (ParquetFileFormat does exactly this
  * before constructing its vectorized reader) — captured once at
  * planning, shipped in the reader factory, stamped onto the per-file
  * conf executor-side. Without them ParquetToSparkSchemaConverter's
  * Configuration constructor has nothing to read.
  */
case class GraftSessionSql(tz: String, caseSensitive: Boolean,
    binaryAsString: Boolean, int96AsTimestamp: Boolean,
    inferTimestampNtz: Boolean, nanosAsLong: Boolean,
    fieldIdRead: Boolean, ignoreMissingFieldId: Boolean,
    // rebase-mode session fallbacks + INT96 zone conversion (round-13):
    // files with NO Spark version metadata (non-Spark or pre-3.0
    // writers) honor spark.sql.parquet.*RebaseModeInRead exactly as
    // DataSourceUtils does (default EXCEPTION — refuse, don't guess);
    // int96TimestampConversion mirrors ParquetFileFormat's
    // Impala-compat zone shift for non-parquet-mr-created files
    dtRebaseRead: String = "EXCEPTION", i96RebaseRead: String = "EXCEPTION",
    int96TsConversion: Boolean = false)
    extends Serializable {
  import org.apache.spark.sql.internal.SQLConf
  def stamp(conf: Configuration): Unit = {
    conf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, tz)
    conf.setBoolean(SQLConf.CASE_SENSITIVE.key, caseSensitive)
    conf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key, binaryAsString)
    conf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, int96AsTimestamp)
    conf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      inferTimestampNtz)
    conf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, nanosAsLong)
    conf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key, fieldIdRead)
    conf.setBoolean(SQLConf.IGNORE_MISSING_PARQUET_FIELD_ID.key,
      ignoreMissingFieldId)
  }
}

object GraftSessionSql {
  def capture(): GraftSessionSql = {
    val c = SparkSession.active.sessionState.conf
    import org.apache.spark.sql.internal.SQLConf
    GraftSessionSql(c.sessionLocalTimeZone, c.caseSensitiveAnalysis,
      c.isParquetBinaryAsString, c.isParquetINT96AsTimestamp,
      c.parquetInferTimestampNTZEnabled, c.legacyParquetNanosAsLong,
      c.parquetFieldIdReadEnabled, c.ignoreMissingParquetFieldId,
      dtRebaseRead = c.getConf(SQLConf.PARQUET_REBASE_MODE_IN_READ).toString,
      i96RebaseRead = c.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_READ).toString,
      int96TsConversion = c.isParquetINT96TimestampConversion)
  }
}

/** UNFILTERED vectorized lane (round-12): per file, Spark's OWN
  * VectorizedParquetRecordReader — the same bulk page decoder every
  * parquet FileSourceScan runs — initialized from the executor-side
  * cached footer (its public initialize overload accepts a pre-read
  * ParquetMetadata, so the connector's footer cache still skips the
  * per-file footer IO parquet scans pay). Partition values and the
  * `_file` lineage constant ride initBatch's partition-column
  * mechanism; the reader's batch lays out data columns first then
  * partition constants, so a zero-copy ColumnarBatch re-indexes the
  * same vectors into the connector's readSchema order. Row-level
  * semantics (missing columns → null vectors, timestamp rebase from
  * the file's own writer metadata, type widening under mergeSchema)
  * are spark.read.parquet's by construction — it IS that reader.
  * Filtered scans never come here: the in-house scratch-residue reader
  * keeps the claimed-filter semantics exact.
  */
class GraftIndexSparkVectorReader(fileParts: Seq[(String, Long, Long, Array[Any])],
    readSchema: StructType, isPart: Array[Boolean],
    dataFields: Array[StructField], limit: Option[Int],
    sql: GraftSessionSql, baseConf: Configuration,
    hintFilters: Array[Filter] = Array.empty,
    tableSchema: StructType = StructType(Nil))
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val BatchRows = 4096
  private val dataSchema = StructType(dataFields.toIndexedSeq)
  private val partOrdinals: Array[Int] =
    readSchema.fields.indices.filter(isPart(_)).toArray
  private val partSchema = StructType(
    partOrdinals.map(readSchema.fields(_)).toIndexedSeq)
  // output ordinal → inner-batch ordinal (inner = data cols, then
  // partition constants in partSchema order)
  private val order: Array[Int] = {
    var d = 0
    var p = 0
    readSchema.fields.indices.map { i =>
      if (isPart(i)) { val k = dataFields.length + p; p += 1; k }
      else { val k = d; d += 1; k }
    }.toArray
  }

  private val fileQueue = scala.collection.mutable.Queue(fileParts: _*)
  private var inner: VectorizedParquetRecordReader = _
  private var out: ColumnarBatch = _
  private var rowsRemaining: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)

  // ONE conf per reader, not per file: the copy + SQL-key stamp is a
  // per-file constant cost that dominated tiny-file scans; nothing in
  // it varies per file (rebase modes are constructor args, read from
  // each footer below), and the downstream consumers only read it
  private val fc = {
    val c = new Configuration(baseConf)
    sql.stamp(c)
    c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
    // the requested Catalyst schema: data columns only — partition
    // constants are initBatch's job, exactly like Spark's file scans
    c.set("org.apache.spark.sql.parquet.row.requested_schema", dataSchema.json)
    c
  }

  private def openNext(): Boolean = {
    // loop, not recursion: a constant-false hint fold skips a file, and
    // a bin can hold many skippable files (openCostInBytes=0 unbounds
    // the per-bin file count)
    while (true) {
      openNextStep() match {
        case 1 => return true
        case 2 => return false
        case _ => // skipped: next file
      }
    }
    false
  }

  /** 1 = opened, 2 = exhausted, 0 = file skipped (hint folded FALSE). */
  private def openNextStep(): Int = {
    if (inner != null) { inner.close(); inner = null }
    if (fileQueue.isEmpty) return 2
    val (file, start, sliceLen, const) = fileQueue.dequeue()
    val p = new Path(file)
    val (footer0, fileLen) = GraftFooterCache.footerWithLen(file, fc)
    // refused-claim HINTS (round-13, nested-bearing tables): fold the
    // pushable-but-refused filters against THIS file's columns (absent
    // column = all-null, exactly the claim lanes' rule) and stamp the
    // residual on a per-file conf — Spark's own reader then prunes row
    // groups by stats/dictionary and pages by the column index
    // (ParquetRowGroupReaderImpl reads via readNextFilteredRowGroup).
    // A conjunct that folds to constant FALSE skips the file with zero
    // IO. Spark still runs the full Filter above: the hints only shed
    // work, never rows that could match.
    val ctxConf: Configuration =
      if (hintFilters.isEmpty) fc
      else {
        val present = footer0.getFileMetaData.getSchema.getFields
          .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
          .stream().map[String](_.getName).toArray.map(_.toString).toSet
        val folded = hintFilters.map(GraftIndexFilters.forFile(_, present))
        if (folded.contains(Left(false))) return 0
        val inFile = folded.collect { case Right(f) => f }
        if (inFile.isEmpty) fc
        else {
          val c = new Configuration(fc)
          org.apache.parquet.hadoop.ParquetInputFormat.setFilterPredicate(c,
            inFile.map(GraftIndexFilters.toParquet(_, tableSchema))
              .reduce(FilterApi.and))
          c
        }
      }
    // range slice: hand the reader a footer holding ONLY the slice's
    // midpoint-owned row groups (what Spark's own scans do — they read
    // the footer with the split's range filter), plus the matching
    // split bounds for the reader base's own range check
    val whole = start == 0L && sliceLen == GraftIndexRange.Whole
    val footer =
      if (whole) footer0
      else new org.apache.parquet.hadoop.metadata.ParquetMetadata(
        footer0.getFileMetaData,
        GraftIndexRange.blocksIn(footer0, start, sliceLen))
    val splitLen =
      if (whole) fileLen else math.min(sliceLen, fileLen - start)
    // rebase modes — DataSourceUtils' exact spec (round-13, was
    // two-state): legacy-stamped files rebase LEGACY; files carrying a
    // Spark 3+ version stamp decode verbatim (CORRECTED); files with NO
    // Spark version metadata (non-Spark or pre-3.0 writers) fall back
    // to the session's *RebaseModeInRead — default EXCEPTION, i.e.
    // refuse ancient values rather than guess a calendar
    val kv = Option(footer.getFileMetaData.getKeyValueMetaData)
      .getOrElse(java.util.Collections.emptyMap[String, String]())
    def rebase(legacyKey: String, fallback: String): String =
      if (kv.containsKey(legacyKey)) "LEGACY"
      else if (kv.containsKey("org.apache.spark.version")) "CORRECTED"
      else fallback
    val dtMode = rebase("org.apache.spark.legacyDateTime", sql.dtRebaseRead)
    val i96Mode = rebase("org.apache.spark.legacyINT96", sql.i96RebaseRead)
    // INT96 zone conversion (round-13): ParquetFileFormat shifts
    // Impala-written INT96 into the session zone when
    // int96TimestampConversion is on and the file was NOT created by
    // parquet-mr (Spark's own files always are)
    val convertTz =
      if (sql.int96TsConversion &&
          !Option(footer.getFileMetaData.getCreatedBy)
            .exists(_.startsWith("parquet-mr")))
        java.time.ZoneId.of(sql.tz)
      else null
    // mapred.FileSplit (which extends the mapreduce one): the reader
    // base downcasts to the OLD interface internally
    val split = new org.apache.hadoop.mapred.FileSplit(
      p, start, splitLen, Array.empty[String])
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      ctxConf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    val r = new VectorizedParquetRecordReader(
      convertTz, dtMode, sql.tz, i96Mode, sql.tz, false, BatchRows)
    var ok = false
    try {
      r.initialize(split, ctx,
        Some(HadoopInputFile.fromPath(p, fc)), None, Some(footer))
      val pvals = new GenericInternalRow(
        partOrdinals.map(const(_)).asInstanceOf[Array[Any]])
      r.initBatch(partSchema, pvals)
      r.enableReturningBatches()
      ok = true
    } finally if (!ok) r.close()
    inner = r
    val rb = r.resultBatch()
    out = new ColumnarBatch(order.map(j => rb.column(j): ColumnVector), 0)
    GraftIndexSparkVectorReader.opens.incrementAndGet()
    1
  }

  override def next(): Boolean = {
    if (rowsRemaining <= 0) return false
    while (true) {
      if (inner == null && !openNext()) return false
      if (inner.nextBatch()) {
        val n = inner.resultBatch().numRows()
        if (n > 0) {
          val emit = math.min(n.toLong, rowsRemaining).toInt
          rowsRemaining -= emit
          GraftIndexSparkVectorReader.rowsRead.addAndGet(emit)
          out.setNumRows(emit)
          return true
        }
      } else { inner.close(); inner = null }
    }
    false // unreachable
  }

  override def get(): ColumnarBatch = out

  override def close(): Unit =
    if (inner != null) { inner.close(); inner = null }
}

object GraftIndexSparkVectorReader {
  /** Per-file open counter — the lane-routing pin for the spec. */
  private[graft] val opens = new java.util.concurrent.atomic.AtomicLong

  /** Rows emitted by delegated readers — the hint-pruning observable:
    * with refused-claim hints stamped, pruned groups/pages never emit.
    */
  private[graft] val rowsRead = new java.util.concurrent.atomic.AtomicLong
}

/** Footer-count-only reader for zero-data-column, zero-data-filter
  * projections. Emits per FILE (constants may differ across a packed
  * split's files).
  */
class GraftIndexCountingReader(fileParts: Seq[(String, Long, Long, Array[Any])],
    readSchema: StructType, isPart: Array[Boolean], conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val queue = scala.collection.mutable.Queue(fileParts: _*)
  private var leftInFile = 0L
  private val row = new GenericInternalRow(readSchema.length)
  override def next(): Boolean = {
    while (leftInFile == 0) {
      if (queue.isEmpty) return false
      val (f, start, len, const) = queue.dequeue()
      // cached footer (round-12): a COUNT over a hot index re-parses
      // nothing; range slices count only their midpoint-owned groups
      leftInFile = GraftIndexRange.rows(f, conf, start, len)
      var i = 0
      while (i < readSchema.length) {
        if (isPart(i)) row.update(i, const(i)); i += 1
      }
    }
    leftInFile -= 1
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Footer-stats aggregate reader: one partial row per file from
  * row-group metadata; a column missing stats in any row group falls
  * back to decoding JUST that column.
  */
class GraftIndexAggReaderFactory(agg: Aggregation, aggSchema: StructType,
    isPart: Array[Boolean],
    private[graft] val conf: org.apache.spark.broadcast.Broadcast[SerializableConfiguration])
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
          // cached footer (round-12): stats aggregates over a hot index
          // are pure in-memory folds after the first touch
          val footer = GraftFooterCache.footer(file, conf.value.value)
          locally {
            val blocks = footer.getBlocks
            slots.zipWithIndex.foreach { case (((kind, col), i), k) =>
              kind match {
                case "C" =>
                  counts(k) += GraftFooterCache.recordCount(file, conf.value.value)
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
                        aggSchema.fields(i).dataType, conf.value.value)
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
          }
        }
        slots.zipWithIndex.foreach { case (((kind, _), i), k) =>
          row.update(i,
            if (kind == "C") java.lang.Long.valueOf(counts(k))
            // SHORT/BYTE stats arrive as Integer from parquet's
            // generic accessors (INT32 physical) — narrow to the
            // output field's internal type at the very end, after the
            // Integer-vs-Integer Comparable folds above
            else (bests(k), aggSchema.fields(i).dataType) match {
              case (n: java.lang.Integer, ShortType) =>
                java.lang.Short.valueOf(n.shortValue)
              case (n: java.lang.Integer, ByteType) =>
                java.lang.Byte.valueOf(n.byteValue)
              case (v, _) => v
            })
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
            // SHORT/BYTE fold as Integer like their footer stats do;
            // the agg reader narrows to the output type at the end
            case IntegerType | DateType | ShortType | ByteType =>
              java.lang.Integer.valueOf(g.getInteger(idx, 0))
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

class GraftIndexRowReader(fileParts: Seq[(String, Long, Long, Array[Any])],
    readSchema: StructType, isPart: Array[Boolean],
    dataFields: Array[StructField], pushedData: Array[Filter],
    tableSchema: StructType, baseConf: Configuration)
    extends PartitionReader[InternalRow] {

  private val fileQueue = scala.collection.mutable.Queue(fileParts: _*)
  private var partConst: Array[Any] = _ // the CURRENT file's constants
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
      val (file, start, len, const) = fileQueue.dequeue()
      partConst = const
      val conf = new Configuration(baseConf)
      // requested projection: required data columns ∪ filter columns (the
      // record-level filter needs its inputs materialized); footer via
      // the executor-side cache (round-12)
      val footer = GraftFooterCache.footer(file, conf).getFileMetaData
      GraftIndexTs.vetNoLegacyRebase(footer.getKeyValueMetaData,
        (dataFields.map(_.dataType) ++ pushedData.flatMap(_.references)
          .flatMap(n => tableSchema.find(_.name == n)).map(_.dataType)).toSeq,
        file)
      val fileSchema = footer.getSchema
      val present = fileSchema.getFields
        .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
        .stream().map[String](_.getName).toArray.map(_.toString).toSet
      // per-file filter folding (absent column ⇒ NULL): constant-false
      // skips the file, constant-true conjuncts drop, residuals enforce
      val perFile = pushedData.map(GraftIndexFilters.forFile(_, present))
      if (!perFile.contains(Left(false))) {
        val filtersInFile = perFile.collect { case Right(f) => f }
        val wanted = (dataFields.map(_.name).toSet ++
          filtersInFile.flatMap(_.references)).intersect(present)
        if (wanted.isEmpty) {
          // no decodable column and no in-file filter: every row of the
          // slice survives as partition constants + nulls
          constRows = GraftIndexRange.rows(file, conf, start, len)
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
          // range slice: parquet's own withFileRange applies the same
          // midpoint rule, so slices partition the file's rows exactly
          if (!(start == 0L && len == GraftIndexRange.Whole))
            b = b.withFileRange(start, GraftIndexRange.endOf(start, len))
          if (filtersInFile.nonEmpty) {
            val pred = filtersInFile.map(GraftIndexFilters.toParquet(_, tableSchema))
              .reduce(FilterApi.and)
            b = b.withFilter(FilterCompat.get(pred))
          }
          reader = b.build()
          return true
        }
      }
      // else: some conjunct folds to constant FALSE for this file
      // (e.g. a range over an absent, all-null column) — skip it wholesale
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
      // DATE: INT32 epoch days = Spark's internal DateType (round-12)
      case DateType => java.lang.Integer.valueOf(g.getInteger(idx, 0))
      // SHORT/BYTE: INT32-annotated physicals, narrowed here
      case ShortType => java.lang.Short.valueOf(g.getInteger(idx, 0).toShort)
      case ByteType => java.lang.Byte.valueOf(g.getInteger(idx, 0).toByte)
      // BINARY payloads (multimodal lane, round-12): internal form is
      // the raw byte array; getBytes copies out of the page buffer
      case BinaryType => g.getBinary(idx, 0).getBytes
      // DECIMAL: unscaled value by physical (INT32/INT64/FLBA), scale
      // from the file's own annotation — Spark's internal Decimal at
      // the TABLE's precision/scale (equal on the uniform layouts the
      // writers emit; a genuinely rescaled evolved file would fail
      // loudly in changePrecision, not silently misread)
      case dt: DecimalType =>
        val pt = g.getType.getType(idx).asPrimitiveType()
        val scale = pt.getLogicalTypeAnnotation match {
          case d: org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            d.getScale
          case _ => dt.scale
        }
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        val bd = pt.getPrimitiveTypeName match {
          case PrimitiveTypeName.INT32 =>
            java.math.BigDecimal.valueOf(g.getInteger(idx, 0).toLong, scale)
          case PrimitiveTypeName.INT64 =>
            java.math.BigDecimal.valueOf(g.getLong(idx, 0), scale)
          case _ => new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(idx, 0).getBytes), scale)
        }
        Decimal(BigDecimal(bd), dt.precision, dt.scale)
      // TIMESTAMP_NTZ: same micros decode as TIMESTAMP — NTZ is
      // timezone-free by definition, so there is no zone math anywhere
      case TimestampNTZType =>
        val pt = g.getType.getType(idx).asPrimitiveType()
        java.lang.Long.valueOf(GraftIndexTs.adjustToMicros(pt, g.getLong(idx, 0)))
      case TimestampType =>
        val pt = g.getType.getType(idx).asPrimitiveType()
        java.lang.Long.valueOf(
          if (pt.getPrimitiveTypeName ==
              org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96)
            GraftIndexTs.int96ToMicros(g.getInt96(idx, 0))
          else GraftIndexTs.adjustToMicros(pt, g.getLong(idx, 0)))
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
              case StringType => UTF8String.fromString(e.getString(0, 0))
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

/** Parquet timestamp physicals → Spark's internal micros-since-epoch
  * long (round-11). Both lanes decode INT64 TIMESTAMP(MILLIS/MICROS/
  * NANOS) and the non-standard INT96 (julian day + nanos-of-day) the
  * session may still write under the legacy outputTimestampType.
  * INT96 conversion uses the plain julian-day arithmetic — exact for
  * post-Gregorian instants, which is all the index writers emit (the
  * pre-1582 rebase corrections of Spark's own reader are out of scope
  * and spec-irrelevant here).
  */
object GraftIndexTs {
  private val JulianDayOfEpoch = 2440588L
  private val MicrosPerDay = 86400000000L

  /** The in-house lanes decode temporal values VERBATIM (CORRECTED
    * calendar). A file stamped with Spark's legacy-rebase markers may
    * carry pre-Gregorian values that Spark's own reader would shift —
    * decoding them verbatim here would silently diverge from the
    * delegated lane, so refuse loudly instead (round-13). Only fires
    * when the decode/filter set actually touches a temporal column;
    * index writers (Spark 3+) never stamp legacy, so this bites only
    * mounted legacy files — which still read correctly via the
    * delegated lane (unfiltered scans).
    */
  def vetNoLegacyRebase(kv: java.util.Map[String, String],
      touched: Iterable[DataType], file: String): Unit = {
    val legacy = kv != null && (kv.containsKey("org.apache.spark.legacyDateTime") ||
      kv.containsKey("org.apache.spark.legacyINT96"))
    if (legacy && touched.exists {
        case DateType | TimestampType | TimestampNTZType => true
        case _ => false
      })
      throw new IllegalStateException(
        s"graft-index: $file is stamped with Spark's LEGACY datetime " +
          "rebase and this scan decodes a date/timestamp column on an " +
          "in-house lane, which reads the proleptic calendar verbatim. " +
          "Read the column unfiltered (the delegated lane rebases " +
          "exactly like spark.read.parquet) or rewrite the file with a " +
          "Spark 3+ writer.")
  }

  def int96ToMicros(b: Binary): Long = {
    val buf = b.toByteBuffer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - JulianDayOfEpoch) * MicrosPerDay +
      java.lang.Math.floorDiv(nanosOfDay, 1000L)
  }

  def adjustToMicros(pt: org.apache.parquet.schema.PrimitiveType,
      raw: Long): Long =
    pt.getLogicalTypeAnnotation match {
      case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS =>
            java.lang.Math.multiplyExact(raw, 1000L)
          case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS =>
            java.lang.Math.floorDiv(raw, 1000L)
          case _ => raw // MICROS: Spark's internal representation already
        }
      case _ => raw // unannotated INT64: treat as micros
    }
}

/** DATE comparand normalization (round-12): Spark's v1 Filters carry
  * java.sql.Date or java.time.LocalDate depending on
  * spark.sql.datetime.java8API.enabled; parquet DATE and Spark's
  * internal DateType are both the epoch-day Int, so every claimed date
  * predicate reduces to integer compares once the comparand is
  * converted here.
  */
object GraftIndexDate {
  def toDays(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case n: Number => n.intValue // already an epoch-day count
    case other => throw new IllegalStateException(
      s"graft-index: not a DATE comparand: $other (${other.getClass})")
  }
}

/** VECTORIZED read lane: decodes parquet pages straight into Spark
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es using ONLY public
  * parquet-column API (`ParquetFileReader.readNextRowGroup` →
  * `ColumnReadStoreImpl` → per-leaf `ColumnReader`), no Spark-internal
  * parquet reader classes. Partition pruning and column pruning compose
  * unchanged, since both act before decode (`setRequestedSchema` drops
  * unwanted columns at the page-IO layer).
  *
  * Pushed data filters (round-11) keep their EXACT claimed semantics on
  * this lane in three layers:
  *  1. ROW-GROUP pruning: parquet's own RowGroupFilter folds the
  *     claimed predicate over the footer's column statistics, so row
  *     groups the stats exclude never decode — applied to the footer
  *     the open already read (round-12; the former reopen-with-options
  *     paid a second ~8 ms footer read per file);
  *  2. PER-FILE constants: a filter referencing a column the file lacks
  *     (evolved sets) is constant there — IsNull keeps the file, every
  *     other claimed shape skips it wholesale (matching the row lane);
  *  3. VECTORIZED residue: each decoded batch re-evaluates the claimed
  *     filters over the column vectors and compacts survivors into the
  *     output batch. A filter column outside the projection decodes
  *     into a SCRATCH vector that never reaches the output.
  * A pushed limit truncates emission (partial semantics — Spark keeps
  * the global limit above, exactly like the row lane's wrapper).
  *
  * Per 4096-row batch: partition columns are constant-filled, flat
  * primitive columns decode def-level/value pairs (timestamps normalize
  * INT64 millis/micros/nanos and INT96 to Spark's internal micros),
  * array columns decode rep/def runs into the vector's child (standard
  * 3-level list encoding; null list / empty list / null element all
  * distinguished by definition level against the leaf descriptor). A
  * projected column ABSENT from a file (evolved schemas) fills nulls,
  * matching the row lane and spark.read.parquet — including the edge
  * where a file carries NONE of the decode columns (all-null rows at
  * the footer's record count, no page reader at all). Batches never
  * split a row: each batch covers whole rows of one row group, so
  * array runs stay intact.
  */
class GraftIndexColumnarReader(fileParts: Seq[(String, Long, Long, Array[Any])],
    readSchema: StructType, isPart: Array[Boolean],
    dataFields: Array[StructField], pushedData: Array[Filter],
    tableSchema: StructType, limit: Option[Int], conf: Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.parquet.column.ColumnReader
  import org.apache.parquet.column.impl.ColumnReadStoreImpl
  import org.apache.parquet.example.DummyRecordConverter
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val BatchRows = 4096
  private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, readSchema)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  // decode set = projected data columns ∪ filter-only scratch columns
  private val extraFields: Array[StructField] =
    pushedData.flatMap(_.references).distinct
      .filterNot(n => dataFields.exists(_.name == n))
      .map(n => tableSchema.find(_.name == n).get)
  private val decodeFields: Array[StructField] = dataFields ++ extraFields
  // output column index of each projected data field (decode order)
  private val dataOutIdx: Array[Int] =
    readSchema.fields.zip(isPart).zipWithIndex.collect {
      case ((_, false), i) => i
    }
  // no filters: decode straight into the output vectors (zero copy);
  // filters: decode into scratch, compact survivors into the output
  private val scratchLane = pushedData.nonEmpty
  private val decodeVecs: Array[OnHeapColumnVector] =
    if (!scratchLane) dataOutIdx.map(vectors(_))
    else OnHeapColumnVector.allocateColumns(BatchRows, StructType(decodeFields))

  private var rowsRemaining: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)

  private val fileQueue = scala.collection.mutable.Queue(fileParts: _*)
  private var partConst: Array[Any] = _ // the CURRENT file's constants
  private var reader: org.apache.parquet.hadoop.ParquetFileReader = _
  private var projected: org.apache.parquet.schema.MessageType = _
  private var createdBy: String = _
  // per decodeField, rebound per row group; null = column absent from file
  private var crs: Array[ColumnReader] = _
  private var valuesLeft: Array[Long] = _
  private var rowsLeftInGroup: Long = 0L

  // PAGE-level pruning state (round-13): when the current file reads
  // through readNextFilteredRowGroup, surviving row groups shed the
  // pages the column index proves can't match — rowsExpected/rowsSeen
  // make the shed rows observable (spec + LaneBench probe)
  private var useFilteredRead = false
  private var rowsExpected = 0L
  private var rowsSeen = 0L

  /** Advance to the next non-empty row group, opening files as needed.
    * False when every file is exhausted. Files are vetted at open:
    * filters over absent columns either pass wholesale (IsNull) or skip
    * the file (per-file constant false); in-file filters prune row
    * groups by statistics on the already-read footer — ONE footer read
    * per file, however the scan is filtered (round-12) — then PAGES
    * within surviving groups by the column index (round-13).
    */
  private def advance(): Boolean = {
    while (true) {
      if (reader != null) {
        val pages =
          if (useFilteredRead) reader.readNextFilteredRowGroup()
          else reader.readNextRowGroup()
        if (pages == null) {
          if (useFilteredRead && rowsExpected > rowsSeen)
            GraftIndexColumnarReader.pageFilteredRows
              .addAndGet(rowsExpected - rowsSeen)
          reader.close(); reader = null
        }
        else if (pages.getRowCount > 0) {
          rowsSeen += pages.getRowCount
          bind(pages); return true
        }
      }
      if (reader == null) {
        if (fileQueue.isEmpty) return false
        val (file, start, len, const) = fileQueue.dequeue()
        partConst = const
        val path = new Path(file)
        // footer via the executor-side cache (round-12): a repeatedly-
        // probed serving index parses each footer ONCE per executor,
        // not once per file per query — the measured ~8-10 ms/file that
        // dominated filtered shapes at index file sizes
        val footer = GraftFooterCache.footer(file, conf)
        val meta = footer.getFileMetaData
        GraftIndexTs.vetNoLegacyRebase(meta.getKeyValueMetaData,
          decodeFields.map(_.dataType).toSeq, file)
        val present = meta.getSchema.getFields
          .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
          .stream().map[String](_.getName).toArray.map(_.toString).toSet
        // per-file filter folding (absent column ⇒ NULL) — the
        // vectorized residue below would get these right anyway (absent
        // columns decode as null vectors), but constant-false conjuncts
        // skip the file with zero decode, and row-group pruning may only
        // reference in-file columns
        val perFile = pushedData.map(GraftIndexFilters.forFile(_, present))
        val inFile = perFile.collect { case Right(f) => f }
        if (!perFile.contains(Left(false))) {
          createdBy = meta.getCreatedBy
          val wanted = decodeFields.map(_.name).toSet
          val projFields = meta.getSchema.getFields
            .asInstanceOf[java.util.List[org.apache.parquet.schema.Type]]
            .stream().filter(t => wanted.contains(t.getName))
            .toArray(n => new Array[org.apache.parquet.schema.Type](n))
          if (projFields.isEmpty) {
            // the file lacks EVERY decode column: its rows are all-null
            // data + partition constants, counted from the footer
            val n = GraftIndexRange.rows(file, conf, start, len)
            if (n > 0) { bindAllNull(n); return true }
          } else {
            projected = new org.apache.parquet.schema.MessageType(
              meta.getSchema.getName, projFields: _*)
            // row-group stats pruning on the CACHED footer (round-12):
            // RowGroupFilter folds the claimed predicate over each
            // block's column statistics — zero footer IO (the round-11
            // reopen re-paid the footer open per file), and pruning is
            // unconditionally on (an in-memory stats visit). Stats
            // level only — dictionary/bloom pruning would need page
            // IO; the vectorized residue keeps the claim exact
            // regardless of how many groups survive.
            // range slice first (midpoint rule — each group belongs to
            // exactly one slice), then stats pruning on the survivors
            val ranged = GraftIndexRange.blocksIn(footer, start, len)
            val toRead =
              if (inFile.isEmpty) ranged
              else {
                val pred = inFile
                  .map(GraftIndexFilters.toParquet(_, tableSchema))
                  .reduce(FilterApi.and)
                org.apache.parquet.filter2.compat.RowGroupFilter
                  .filterRowGroups(FilterCompat.get(pred),
                    ranged, meta.getSchema)
              }
            if (!toRead.isEmpty) {
              // PAGE-level (column-index) pruning (round-13): the
              // filtered-row-group read binds SynchronizingColumnReaders
              // that present exactly the rows whose pages can match the
              // claim — a range probe over a SORTED column (the
              // event-time cutoff shape) decodes a few pages of a
              // surviving group instead of all of them. Exactness is
              // parquet's own contract (ranges are a superset of
              // matching rows; the vectorized residue above still
              // enforces the claim row by row), and files without
              // column indexes fall back to whole-group ranges inside
              // parquet itself. The LIST decode walks repetition levels
              // with its own value accounting, which filtered pages
              // would break — array-projecting scans keep whole-group
              // reads.
              useFilteredRead = inFile.nonEmpty &&
                !decodeFields.exists(_.dataType.isInstanceOf[ArrayType])
              def mkReader(blocks: java.util.List[org.apache.parquet.hadoop.metadata.BlockMetaData]) = {
                val r =
                  if (useFilteredRead) {
                    val pred = inFile
                      .map(GraftIndexFilters.toParquet(_, tableSchema))
                      .reduce(FilterApi.and)
                    // stats/dictionary/bloom re-pruning OFF — the block
                    // list is already pruned on the cached footer above;
                    // only the column-index level is parquet's to apply
                    val opts = org.apache.parquet.HadoopReadOptions
                      .builder(conf, path)
                      .withRecordFilter(FilterCompat.get(pred))
                      .useStatsFilter(false).useDictionaryFilter(false)
                      .useBloomFilter(false).useColumnIndexFilter(true)
                      .build()
                    new org.apache.parquet.hadoop.ParquetFileReader(conf,
                      path,
                      new org.apache.parquet.hadoop.metadata.ParquetMetadata(
                        meta, blocks), opts)
                  } else new org.apache.parquet.hadoop.ParquetFileReader(
                    conf, meta, path, blocks, projected.getColumns)
                r.setRequestedSchema(projected)
                r
              }
              rowsExpected = {
                var t = 0L; val it = toRead.iterator()
                while (it.hasNext) t += it.next().getRowCount
                t
              }
              rowsSeen = 0L
              // block-list reader over the cached metadata: opens the
              // DATA stream only, never re-reads the footer
              reader = mkReader(toRead)
              // DICTIONARY/BLOOM pruning (round-12): stats can't kill a
              // point probe whose value sits INSIDE a group's min/max
              // but never occurs — the dictionary (or bloom filter) can.
              // parquet's own record reader applies these levels by
              // default on the row lane; this brings the columnar lane
              // to parity. The dictionary-page read costs one page per
              // filter column per candidate group against skipping the
              // group's whole decode — the trade every parquet engine
              // makes. Survivor shrink ⇒ rebuild the block-list reader
              // (footer cached; only pays when groups actually drop).
              if (inFile.nonEmpty) {
                val pred = inFile
                  .map(GraftIndexFilters.toParquet(_, tableSchema))
                  .reduce(FilterApi.and)
                val lv = java.util.Arrays.asList(
                  org.apache.parquet.filter2.compat.RowGroupFilter.FilterLevel.DICTIONARY,
                  org.apache.parquet.filter2.compat.RowGroupFilter.FilterLevel.BLOOMFILTER)
                val kept = org.apache.parquet.filter2.compat.RowGroupFilter
                  .filterRowGroups(lv, FilterCompat.get(pred), toRead, reader)
                if (kept.size() < toRead.size()) {
                  GraftIndexColumnarReader.dictPruned
                    .addAndGet(toRead.size() - kept.size())
                  reader.close()
                  reader = if (kept.isEmpty) null else mkReader(kept)
                  rowsExpected = {
                    var t = 0L; val it = kept.iterator()
                    while (it.hasNext) t += it.next().getRowCount
                    t
                  }
                }
              }
            }
            // else: stats exclude every row group — skip the file
          }
        }
        // else: some conjunct is constant FALSE for this file — skip it
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
    crs = new Array[ColumnReader](decodeFields.length)
    valuesLeft = new Array[Long](decodeFields.length)
    var i = 0
    while (i < decodeFields.length) {
      var j = 0
      while (j < byHead.size()) {
        val d = byHead.get(j)
        if (d.getPath()(0) == decodeFields(i).name) {
          crs(i) = store.getColumnReader(d)
          valuesLeft(i) = crs(i).getTotalValueCount
        }
        j += 1
      }
      i += 1
    }
  }

  /** "Row group" of n all-null rows for a file carrying none of the
    * decode columns (every crs slot null ⇒ the decode fills nulls).
    */
  private def bindAllNull(n: Long): Unit = {
    rowsLeftInGroup = n
    crs = new Array[ColumnReader](decodeFields.length)
    valuesLeft = new Array[Long](decodeFields.length)
  }

  // ---- vectorized residue evaluation ----------------------------------
  private def decodeIdx(n: String): Int = decodeFields.indexWhere(_.name == n)

  /** Claimed-shape filter → row predicate over the decode vectors.
    * Null semantics are SQL's: a null value matches nothing except
    * IsNull — identical to parquet's record-level assembly, which
    * enforces the same filters on the row lane.
    */
  private def compile(f: Filter): Int => Boolean = {
    def cmp(name: String, v: Any): Int => Int = {
      val i = decodeIdx(name)
      decodeFields(i).dataType match {
        case LongType =>
          val x = v.asInstanceOf[Number].longValue
          r => java.lang.Long.compare(decodeVecs(i).getLong(r), x)
        case IntegerType =>
          val x = v.asInstanceOf[Number].longValue
          r => java.lang.Long.compare(decodeVecs(i).getInt(r).toLong, x)
        case DateType =>
          val x = GraftIndexDate.toDays(v).toLong
          r => java.lang.Long.compare(decodeVecs(i).getInt(r).toLong, x)
        case ShortType =>
          val x = v.asInstanceOf[Number].longValue
          r => java.lang.Long.compare(decodeVecs(i).getShort(r).toLong, x)
        case ByteType =>
          val x = v.asInstanceOf[Number].longValue
          r => java.lang.Long.compare(decodeVecs(i).getByte(r).toLong, x)
        case DoubleType =>
          val x = v.asInstanceOf[Number].doubleValue
          r => java.lang.Double.compare(decodeVecs(i).getDouble(r), x)
        case FloatType =>
          val x = v.asInstanceOf[Number].doubleValue
          r => java.lang.Double.compare(decodeVecs(i).getFloat(r).toDouble, x)
        case StringType =>
          val x = UTF8String.fromString(v.toString)
          r => decodeVecs(i).getUTF8String(r).compareTo(x)
        case BooleanType =>
          val x = v.asInstanceOf[Boolean]
          r => java.lang.Boolean.compare(decodeVecs(i).getBoolean(r), x)
        case other => throw new IllegalStateException(
          s"graft-index: vectorized filter over $other")
      }
    }
    def nn(name: String): Int => Boolean = {
      val i = decodeIdx(name)
      r => !decodeVecs(i).isNullAt(r)
    }
    f match {
      case EqualTo(a, v) =>
        val c = cmp(a, v); val p = nn(a); r => p(r) && c(r) == 0
      case Not(EqualTo(a, v)) =>
        val c = cmp(a, v); val p = nn(a); r => p(r) && c(r) != 0
      case Not(In(a, vs)) =>
        val cs = vs.map(cmp(a, _)); val p = nn(a)
        r => p(r) && cs.forall(_(r) != 0)
      case StringStartsWith(a, v) =>
        val i = decodeIdx(a); val x = UTF8String.fromString(v)
        r => !decodeVecs(i).isNullAt(r) &&
          decodeVecs(i).getUTF8String(r).startsWith(x)
      case StringEndsWith(a, v) =>
        val i = decodeIdx(a); val x = UTF8String.fromString(v)
        r => !decodeVecs(i).isNullAt(r) &&
          decodeVecs(i).getUTF8String(r).endsWith(x)
      case StringContains(a, v) =>
        val i = decodeIdx(a); val x = UTF8String.fromString(v)
        r => !decodeVecs(i).isNullAt(r) &&
          decodeVecs(i).getUTF8String(r).contains(x)
      case In(a, vs) =>
        val cs = vs.map(cmp(a, _)); val p = nn(a)
        r => p(r) && cs.exists(_(r) == 0)
      case GreaterThan(a, v) =>
        val c = cmp(a, v); val p = nn(a); r => p(r) && c(r) > 0
      case GreaterThanOrEqual(a, v) =>
        val c = cmp(a, v); val p = nn(a); r => p(r) && c(r) >= 0
      case LessThan(a, v) =>
        val c = cmp(a, v); val p = nn(a); r => p(r) && c(r) < 0
      case LessThanOrEqual(a, v) =>
        val c = cmp(a, v); val p = nn(a); r => p(r) && c(r) <= 0
      case IsNull(a) =>
        val p = nn(a); r => !p(r)
      case IsNotNull(a) => nn(a)
      // negation-free compounds: unknown→false per leg, exact through
      // the monotone lattice (see dataPushable)
      case Or(l, r) =>
        val cl = compile(l); val cr = compile(r); r => cl(r) || cr(r)
      case And(l, r) =>
        val cl = compile(l); val cr = compile(r); r => cl(r) && cr(r)
      case other => throw new IllegalStateException(
        s"graft-index: unpushable filter claimed on the columnar lane: $other")
    }
  }

  private val residue: Array[Int => Boolean] = pushedData.map(compile)
  private val selection = new Array[Int](BatchRows)

  override def next(): Boolean = {
    if (rowsRemaining <= 0) return false
    while (true) {
      if (rowsLeftInGroup == 0 && !advance()) return false
      val n = math.min(BatchRows.toLong, rowsLeftInGroup).toInt
      decodeVecs.foreach(_.reset())
      var di = 0
      while (di < decodeFields.length) {
        decodeFields(di).dataType match {
          case at: ArrayType => fillArray(decodeVecs(di), at.elementType, di, n)
          case dt => fillFlat(decodeVecs(di), dt, di, n)
        }
        di += 1
      }
      rowsLeftInGroup -= n
      if (residue.isEmpty) {
        // zero-copy path: decodeVecs ARE the output data vectors
        val emit = math.min(n.toLong, rowsRemaining).toInt
        var i = 0
        while (i < readSchema.length) {
          if (isPart(i)) {
            vectors(i).reset()
            fillConst(vectors(i), readSchema(i).dataType, partConst(i), emit)
          }
          i += 1
        }
        rowsRemaining -= emit
        batch.setNumRows(emit)
        return true
      } else {
        var m = 0
        var r = 0
        while (r < n && m < rowsRemaining) {
          var ok = true
          var k = 0
          while (ok && k < residue.length) { ok = residue(k)(r); k += 1 }
          if (ok) { selection(m) = r; m += 1 }
          r += 1
        }
        if (m > 0) {
          var i = 0
          var di2 = 0
          while (i < readSchema.length) {
            vectors(i).reset()
            if (isPart(i))
              fillConst(vectors(i), readSchema(i).dataType, partConst(i), m)
            else {
              copySelected(decodeVecs(di2), vectors(i),
                readSchema(i).dataType, m)
              di2 += 1
            }
            i += 1
          }
          rowsRemaining -= m
          batch.setNumRows(m)
          return true
        }
        // zero survivors in this chunk: decode the next one
      }
    }
    false // unreachable
  }

  /** Compact the `m` selected rows of `src` into `dst[0, m)`. */
  private def copySelected(src: OnHeapColumnVector, dst: OnHeapColumnVector,
      dt: DataType, m: Int): Unit = {
    var r = 0
    dt match {
      case ArrayType(elem, _) =>
        val child = dst.arrayData()
        while (r < m) {
          val s = selection(r)
          if (src.isNullAt(s)) dst.putNull(r)
          else {
            val arr = src.getArray(s)
            val start = child.getElementsAppended
            var j = 0
            while (j < arr.numElements()) {
              if (arr.isNullAt(j)) child.appendNull()
              else elem match {
                case LongType => child.appendLong(arr.getLong(j))
                case IntegerType => child.appendInt(arr.getInt(j))
                case DoubleType => child.appendDouble(arr.getDouble(j))
                case StringType =>
                  val b = arr.getUTF8String(j).getBytes
                  child.appendByteArray(b, 0, b.length)
                case _ => child.appendFloat(arr.getFloat(j))
              }
              j += 1
            }
            dst.putArray(r, start, arr.numElements())
          }
          r += 1
        }
      case _ =>
        while (r < m) {
          val s = selection(r)
          if (src.isNullAt(s)) dst.putNull(r)
          else dt match {
            case LongType | TimestampType | TimestampNTZType =>
              dst.putLong(r, src.getLong(s))
            case IntegerType | DateType => dst.putInt(r, src.getInt(s))
            case ShortType => dst.putShort(r, src.getShort(s))
            case ByteType => dst.putByte(r, src.getByte(s))
            case DoubleType => dst.putDouble(r, src.getDouble(s))
            case FloatType => dst.putFloat(r, src.getFloat(s))
            case BooleanType => dst.putBoolean(r, src.getBoolean(s))
            case BinaryType => dst.putByteArray(r, src.getBinary(s))
            case _ => dst.putByteArray(r, src.getUTF8String(s).getBytes)
          }
          r += 1
        }
    }
  }

  private def fillConst(v: OnHeapColumnVector, dt: DataType, c: Any,
      n: Int): Unit = {
    if (c == null) { v.putNulls(0, n); return }
    var r = 0
    while (r < n) {
      dt match {
        case LongType => v.putLong(r, c.asInstanceOf[Long])
        case IntegerType | DateType => v.putInt(r, c.asInstanceOf[Int])
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
    // the type dispatch is hoisted OUT of the row loop (a per-row match
    // was a visible cost on wide scans); timestamp physical resolved
    // once per row group, not per row
    val put: Int => Unit = dt match {
      case LongType => r => v.putLong(r, cr.getLong)
      // DATE decodes as its INT32 epoch-day physical — already Spark's
      // internal form, zero conversion (round-12)
      case IntegerType | DateType => r => v.putInt(r, cr.getInteger)
      case ShortType => r => v.putShort(r, cr.getInteger.toShort)
      case ByteType => r => v.putByte(r, cr.getInteger.toByte)
      // NTZ: micros long, no zone math by definition
      case TimestampNTZType =>
        val pt = cr.getDescriptor.getPrimitiveType
        r => v.putLong(r, GraftIndexTs.adjustToMicros(pt, cr.getLong))
      case DoubleType => r => v.putDouble(r, cr.getDouble)
      case FloatType => r => v.putFloat(r, cr.getFloat)
      case BooleanType => r => v.putBoolean(r, cr.getBoolean)
      case TimestampType =>
        val pt = cr.getDescriptor.getPrimitiveType
        if (pt.getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96)
          r => v.putLong(r, GraftIndexTs.int96ToMicros(cr.getBinary))
        else r => v.putLong(r, GraftIndexTs.adjustToMicros(pt, cr.getLong))
      case _ => r => v.putByteArray(r, cr.getBinary.getBytesUnsafe)
    }
    var r = 0
    while (r < n) {
      if (cr.getCurrentDefinitionLevel < maxDef) v.putNull(r)
      else put(r)
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
    // type dispatch hoisted out of the element loop (per-element match
    // dominated wide-embedding decodes)
    val append: () => Unit = elem match {
      case LongType => () => child.appendLong(cr.getLong)
      case IntegerType => () => child.appendInt(cr.getInteger)
      case DoubleType => () => child.appendDouble(cr.getDouble)
      case StringType => () => {
        val b = cr.getBinary.getBytesUnsafe
        child.appendByteArray(b, 0, b.length)
      }
      case _ => () => child.appendFloat(cr.getFloat)
    }
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
          append()
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
    if (scratchLane) decodeVecs.foreach(_.close()) // separate allocation
    batch.close()
  }
}

object GraftIndexColumnarReader {
  /** Row groups killed by dictionary/bloom pruning that statistics
    * could not kill — the spec's observable for the round-12 pass.
    */
  private[graft] val dictPruned = new java.util.concurrent.atomic.AtomicLong

  /** Rows inside SURVIVING row groups that the column index proved
    * can't match — pages never decoded (round-13). The page-pruning
    * spec's observable.
    */
  private[graft] val pageFilteredRows = new java.util.concurrent.atomic.AtomicLong
}
