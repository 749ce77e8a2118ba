package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A path-based Spark catalog over [[GraftTable]] roots, giving the
  * commit log its NATIVE SQL time-travel syntax:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.gt", classOf[GraftCatalog].getName)
  *   spark.sql("SELECT * FROM gt.`/data/events_t`")
  *   spark.sql("SELECT * FROM gt.`/data/events_t` VERSION AS OF 2")
  * }}}
  *
  * The identifier IS the table root (Delta's path-table convention);
  * `VERSION AS OF` routes through TableCatalog's time-travel
  * loadTable overload into the same snapshot resolution the
  * `format("graft")` reader uses, so both surfaces serve identical
  * pinned file lists through Spark's own parquet scan. Read-only by
  * design: mutations go through the table's atomic verbs (or
  * `df.write.format("graft")`), never through catalog DDL — a
  * CREATE/DROP here would be a second, unlogged mutation path.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  override def loadTable(ident: Identifier): Table =
    GraftDataSource.snapshotTable(SparkSession.active, rootOf(ident),
      None, CaseInsensitiveStringMap.empty(), batchWritable = true)

  /** `VERSION AS OF <n>` — Spark routes the literal here. */
  override def loadTable(ident: Identifier, version: String): Table =
    GraftDataSource.snapshotTable(SparkSession.active, rootOf(ident),
      Some(version.toLong), CaseInsensitiveStringMap.empty())

  /** `TIMESTAMP AS OF <ts>` — Spark hands the literal as epoch
    * MICROseconds; resolve to the newest commit at or before it.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val spark = SparkSession.active
    val root = rootOf(ident)
    val v = GraftTable.forPath(spark, root).versionAt(timestamp / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at or before timestamp $timestamp in $root"))
    GraftDataSource.snapshotTable(spark, root, Some(v),
      CaseInsensitiveStringMap.empty())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no enumerable namespace

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.forPath(SparkSession.active, rootOf(ident)).latestVersion > 0

  /** SQL `CREATE TABLE gt.\`/root\` (cols…)` and the create step of
    * CTAS: version 1 is a schema-only commit; CTAS then lands the
    * query result through the v2 batch write as ONE append commit.
    * Flat tables only (partition transforms refuse — partitioned
    * layouts go through the appendPartitioned verb family), and the
    * only accepted property is Spark's own `provider` (constraints
    * arrive via ALTER TABLE … SET TBLPROPERTIES afterwards).
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    // PARTITIONED BY (col, …) — identity transforms only (hive value
    // dirs; bucket/temporal transforms have no path encoding here).
    // The declared keys split out of the payload schema and land in
    // the create commit's partmeta row (round 14).
    val partCols: Seq[String] = partitions.toSeq.map { t =>
      if (t.name() != "identity" || t.references().length != 1)
        throw new UnsupportedOperationException(
          s"unsupported partition transform $t — only " +
            "PARTITIONED BY (col, …) identity keys")
      val names = t.references()(0).fieldNames()
      if (names.length != 1) throw new UnsupportedOperationException(
        s"PARTITIONED BY supports top-level columns only, got " +
          names.mkString("."))
      names.head
    }
    import scala.jdk.CollectionConverters._
    val unknown = properties.asScala.keySet --
      Set("provider", "owner", "location", "external")
    if (unknown.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported CREATE TABLE properties: ${unknown.mkString(",")}")
    val spark = SparkSession.active
    val root = rootOf(ident)
    // `location`/`external` are allowed only as Spark's own injected
    // defaults for a path-addressed identifier. A USER-written
    // `CREATE TABLE … LOCATION '/x'` that differs from the identifier
    // root must refuse, not silently land the table at the identifier
    // path (the table would not be where the user said it is).
    properties.asScala.get("location").foreach { loc =>
      def norm(p: String) =
        p.stripPrefix("file:").replaceAll("/+$", "").replaceAll("/+", "/")
      if (norm(loc) != norm(root))
        throw new UnsupportedOperationException(
          s"graft catalog tables live at their identifier path ($root); " +
            s"LOCATION '$loc' differs — address the table by its path " +
            "instead of LOCATION")
    }
    if (GraftTable.forPath(spark, root).latestVersion > 0)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (ident.namespace() :+ ident.name()).toIndexedSeq)
    if (partCols.isEmpty) GraftTable.createEmpty(spark, root, schema)
    else {
      val partBy = partCols.map { c =>
        val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(
            s"PARTITIONED BY column '$c' is not in the declared schema"))
        (f.name, f.dataType)
      }
      val payload = StructType(schema.fields.filterNot(f =>
        partCols.exists(_.equalsIgnoreCase(f.name))))
      GraftTable.createEmptyPartitioned(spark, root, payload, partBy)
    }
    loadTable(ident)
  }

  /** SQL DDL → metadata-only commits (the one class of "mutation"
    * the catalog accepts, because each change IS a single logged
    * commit, never an unlogged write):
    *
    * {{{
    *   ALTER TABLE gt.`/root` RENAME COLUMN a TO b
    *   ALTER TABLE gt.`/root` DROP COLUMN a
    *   ALTER TABLE gt.`/root` ADD COLUMN c BIGINT
    *   ALTER TABLE gt.`/root` SET TBLPROPERTIES ('constraint.pos' = 'x >= 0')
    *   ALTER TABLE gt.`/root` UNSET TBLPROPERTIES ('constraint.pos')
    * }}}
    *
    * Rename/drop ride column mapping (files untouched, epoch-correct
    * time travel); add is a schema widen (old files read null);
    * `constraint.<name>` properties route into add/dropConstraint
    * (Delta's CHECK-constraint-as-property convention). Anything
    * else — type changes, nested fields, comments, DML-shaped
    * property games — refuses loudly.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val t = GraftTable.forPath(SparkSession.active, rootOf(ident))
    def topLevel(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"$what supports top-level columns only, got " +
          fieldNames.mkString("."))
      fieldNames.head
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        t.renameColumn(topLevel(r.fieldNames(), "RENAME COLUMN"),
          r.newName())
      case d: TableChange.DeleteColumn =>
        t.dropColumn(topLevel(d.fieldNames(), "DROP COLUMN"))
      case a: TableChange.AddColumn =>
        // nullable-only is the SOUND contract: every pre-existing file
        // reads null in the new column, so NOT NULL could never hold;
        // positions/comments aren't recorded in the log either.
        // Refuse loudly rather than silently recording a weaker column
        // than the DDL declared.
        if (!a.isNullable) throw new UnsupportedOperationException(
          "ADD COLUMN … NOT NULL is unsupported: old files read null " +
            "in the new column, so the constraint could never hold — " +
            "add the column nullable, backfill, then add a CHECK " +
            "constraint via SET TBLPROPERTIES")
        if (a.position() != null) throw new UnsupportedOperationException(
          "ADD COLUMN with a position (FIRST/AFTER) is unsupported — " +
            "new columns append at the end of the schema")
        if (a.comment() != null) throw new UnsupportedOperationException(
          "ADD COLUMN with a comment is unsupported — the commit log " +
            "records name and type only")
        t.addColumn(topLevel(a.fieldNames(), "ADD COLUMN"), a.dataType())
      case p: TableChange.SetProperty
          if p.property().startsWith("constraint.") =>
        t.addConstraint(p.property().stripPrefix("constraint."), p.value())
      case p: TableChange.RemoveProperty
          if p.property().startsWith("constraint.") =>
        t.dropConstraint(p.property().stripPrefix("constraint."))
      case other => throw new UnsupportedOperationException(
        s"graft catalog cannot apply $other — supported DDL: " +
          "RENAME/DROP/ADD COLUMN, SET/UNSET 'constraint.<name>' " +
          "properties")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
