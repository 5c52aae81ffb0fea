package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{Catalog, Snapshots}

/** DataSource V2 `TableCatalog` over the named [[graft.operators.Catalog]]
  * — the SQL face of the snapshot layer. Registering it
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.v2.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.root", "<catalogRoot>")
  * }}}
  *
  * makes every [[Catalog.register]]-ed table reachable by NAME from
  * plain SQL — `SELECT * FROM graft.t`, including time travel:
  * `VERSION AS OF <v>` resolves the snapshot exactly as
  * [[Snapshots.readAsOf]] and `TIMESTAMP AS OF <ts>` resolves through
  * [[Snapshots.versionAt]] over the table's LOGICAL commit timeline
  * (Spark hands the literal down in epoch MICROSECONDS — a table
  * stamped with event-time micros travels naturally; other logical
  * clocks address versions via `VERSION AS OF`).
  *
  * The scan PLANS FROM THE MANIFEST: `loadTable` resolves the
  * generation's file list (one single-generation manifest read) and
  * hands exactly those files to Spark's own parquet table, so filter
  * pushdown, column pruning and row-group skipping all apply — the
  * scan never lists the data directory and never sees files of other
  * versions. Partitioned generations whose files live under one
  * commit root read with their path-encoded partition column
  * reconstructed (`basePath`); multi-root partitioned lineages, and
  * versions governed by deletion vectors or a column mapping, REFUSE
  * LOUDLY toward the DV- and mapping-aware function verbs rather than
  * returning silently wrong rows — the SQL face never serves a face
  * the plain parquet scan cannot represent.
  *
  * DDL surface: `DROP TABLE graft.t` unregisters the NAME (the
  * catalog adopts existing roots, it never owns data — matching
  * [[Catalog.dropTable]]); renames re-point the name. `CREATE TABLE`
  * refuses — tables are born from [[Snapshots.commit]] and adopted
  * via [[Catalog.register]]. */
class GraftCatalog extends TableCatalog {

  private var catName: String = "graft"
  private var catalogRoot: String = _

  override def initialize(
      name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    catalogRoot = options.get("root")
    require(catalogRoot != null && catalogRoot.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.root — the " +
        "graft catalog root directory")
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  private def requireFlatNs(namespace: Array[String]): Unit =
    require(namespace.isEmpty,
      s"catalog '$catName' has a flat namespace — got " +
        s"${namespace.mkString(".")}")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlatNs(namespace)
    Catalog.entries(spark, catalogRoot).keys.toArray.sorted
      .map(Identifier.of(Array.empty[String], _))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty &&
      Catalog.entries(spark, catalogRoot).contains(ident.name)

  override def loadTable(ident: Identifier): Table =
    snapshotTable(ident, None)

  /** `VERSION AS OF <v>` — the version string is the snapshot number. */
  override def loadTable(ident: Identifier, version: String): Table =
    snapshotTable(ident,
      Some(scala.util.Try(version.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"VERSION AS OF '$version' on $catName.${ident.name}: graft " +
            "snapshot versions are integers"))))

  /** `TIMESTAMP AS OF <ts>` — micros, resolved over the table's
    * logical commit timeline by [[Snapshots.versionAt]]. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    snapshotTable(ident, Some(Snapshots.versionAt(spark, root, timestamp)))
  }

  private def rootOf(ident: Identifier): String = {
    if (ident.namespace.nonEmpty) throw new NoSuchTableException(ident)
    Catalog.entries(spark, catalogRoot).get(ident.name) match {
      case Some(e) => e.root
      case None => throw new NoSuchTableException(ident)
    }
  }

  private def snapshotTable(
      ident: Identifier,
      version: Option[Long]): Table = {
    val root = rootOf(ident)
    val v = version.orElse(Snapshots.latestVersion(spark, root))
      .getOrElse(throw new NoSuchTableException(ident))
    GraftSnapshotTable.resolve(spark, s"$catName.${ident.name}", root, v)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"CREATE TABLE on catalog '$catName': graft tables are born from " +
        "Snapshots.commit and adopted by name via Catalog.register — " +
        "the SQL catalog never owns data placement")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"ALTER TABLE on catalog '$catName': schema changes are snapshot " +
        "commits — use Snapshots.renameColumn/dropColumn/addConstraint")

  /** Unregisters the NAME; the table's data and manifest are untouched
    * (adoption, not ownership — [[Catalog.dropTable]]'s contract). */
  override def dropTable(ident: Identifier): Boolean =
    ident.namespace.isEmpty && {
      val known = Catalog.entries(spark, catalogRoot).contains(ident.name)
      if (known) Catalog.dropTable(spark, catalogRoot, ident.name)
      known
    }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    requireFlatNs(to.namespace)
    val all = Catalog.entries(spark, catalogRoot)
    if (from.namespace.nonEmpty || !all.contains(from.name))
      throw new NoSuchTableException(from)
    if (all.contains(to.name)) throw new TableAlreadyExistsException(to)
    val e = all(from.name)
    Catalog.register(spark, catalogRoot, to.name, e.root, e.props)
    Catalog.dropTable(spark, catalogRoot, from.name)
  }
}

/** One resolved snapshot as a read-only V2 table: exactly the
  * generation's manifest files, planned through Spark's own parquet
  * table so pushdown/pruning/codegen are the stock ones. */
private[v2] object GraftSnapshotTable {

  private def norm(p: String): String = new Path(p).toUri.getPath

  def resolve(
      spark: SparkSession,
      tableName: String,
      root: String,
      version: Long): Table = {
    val (rows, stored) = Snapshots.generationFiles(spark, root, version)
    val files = rows.map(_._1)
    // honest-refusal guards: faces the plain parquet scan cannot
    // represent route to the function verbs instead of serving
    // silently wrong rows
    val dvDir = new Path(s"$root/_dv")
    val fsys = dvDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(dvDir)) {
      val dirs = fsys.listStatus(dvDir).filter(_.isDirectory)
        .map(_.getPath)
        .flatMap(p => scala.util.Try(p.getName.stripPrefix("v").toLong)
          .toOption.map(_ -> p.toString))
        .filter(_._1 <= version)
      dirs.sortBy(_._1).lastOption.foreach { case (_, dir) =>
        val dvFiles = spark.read.parquet(dir).select("file").distinct()
          .collect().map(r => norm(r.getString(0))).toSet
        require(!files.exists(f => dvFiles.contains(norm(f))),
          s"$tableName VERSION AS OF $version is governed by live " +
            "deletion vectors — the SQL scan cannot apply them; read " +
            "through Snapshots.readAsOf (or compact with optimize)")
      }
    }
    val cmap = Snapshots.colMapAsOf(spark, root, version)
    require(cmap.forall { case (p, l) => l.contains(p) },
      s"$tableName VERSION AS OF $version is governed by a column " +
        "rename/drop mapping — the SQL scan cannot translate physical " +
        "names; read through Snapshots.readAsOf")
    val parted = rows.filter(_._2 != null)
    val options: Map[String, String] =
      if (parted.isEmpty) Map.empty
      else {
        // partition columns are path-encoded; Spark reconstructs them
        // from ONE basePath — the single commit root every file of a
        // freshly written or compacted partitioned generation shares
        val roots = files
          .map(f => new Path(f).getParent.getParent.toString).distinct
        require(parted.length == rows.length && roots.length == 1,
          s"$tableName VERSION AS OF $version mixes partition roots or " +
            "layouts — the SQL scan cannot reconstruct its partition " +
            "column from one basePath; read through Snapshots.readAsOf " +
            "(or compact with optimizePartitioned)")
        Map("basePath" -> roots.head)
      }
    new GraftSnapshotTable(tableName,
      ParquetTable(tableName, spark,
        new CaseInsensitiveStringMap(options.asJava),
        files.toIndexedSeq, stored, classOf[ParquetFileFormat]))
  }
}

private[v2] class GraftSnapshotTable(
    tableName: String,
    delegate: ParquetTable) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = delegate.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(o)
}
