package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance operations as SQL STORED PROCEDURES — the Spark 4
  * `ProcedureCatalog` surface (the Iceberg `CALL catalog.procedure(…)`
  * device), so the lakehouse lifecycle is drivable from pure SQL:
  *
  *   CALL fw.optimize(tbl => 'ns.t', target_bytes => 1048576)
  *   CALL fw.vacuum('ns.t', 1)
  *   CALL fw.rollback('ns.t', 2)
  *   CALL fw.clone('ns.t', '/tmp/t_clone')
  *   CALL fw.truncate('ns.t')
  *
  * Each procedure resolves its table through the owning [[FwCatalog]]
  * (same metadata the DML path uses), runs the corresponding
  * [[FwMaintenance]] operation, and returns its report as a one-row
  * result set (a [[LocalScan]] — the rows are driver-side facts about
  * what the maintenance did; the HEAVY work inside the operation is
  * the usual distributed kernel). Analyzer-level niceties — named
  * arguments, positional binding, implicit casts to the declared
  * parameter types — come from Spark's `InvokeProcedures` rule for
  * free.
  */
private[sources] object FwProcedures {
  val names: Seq[String] = Seq("optimize", "vacuum", "rollback",
    "clone", "truncate", "add_constraint", "drop_constraint",
    "publish", "tag", "restore", "reorg")

  def load(cat: FwCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "optimize" => Some(new OptimizeProcedure(cat))
      case "vacuum" => Some(new VacuumProcedure(cat))
      case "rollback" => Some(new RollbackProcedure(cat))
      case "clone" => Some(new CloneProcedure(cat))
      case "truncate" => Some(new TruncateProcedure(cat))
      case "add_constraint" => Some(new AddConstraintProcedure(cat))
      case "drop_constraint" => Some(new DropConstraintProcedure(cat))
      case "publish" => Some(new PublishProcedure(cat))
      case "tag" => Some(new TagProcedure(cat))
      case "restore" => Some(new RestoreProcedure(cat))
      case "reorg" => Some(new ReorgProcedure(cat))
      case _ => None
    }

  /** Shared shape: every FW procedure is self-binding (fixed parameter
    * list, no overloads) and side-effecting (never deterministic — the
    * optimizer must not dedup or reorder calls).
    */
  private abstract class FwProcedure(cat: FwCatalog)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    /** `ns.t` (or bare `t`) → the registered table's path + schema. */
    protected def resolve(table: String): (String, StructType) = {
      val parts = table.split('.')
      val t = cat.loadTable(Identifier.of(parts.init, parts.last)) match {
        case fw: FwTable => fw
        case other => throw new IllegalArgumentException(
          s"$table is not a fixedwidth table: $other")
      }
      val path = t.dataPath
      require(path != null, s"table $table has no path")
      (path, t.declaredSchema)
    }

    protected def in(name: String, dt: DataType): ProcedureParameter =
      ProcedureParameter.in(name, dt).build()

    protected def result(schema: StructType,
        values: Seq[Any]): java.util.Iterator[Scan] = {
      val row = new GenericInternalRow(values.map {
        case s: String => UTF8String.fromString(s)
        case v => v
      }.toArray)
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = schema
      }).iterator()
    }

    protected def spark: SparkSession = SparkSession.active
  }

  /** `CALL fw.optimize(tbl, target_bytes)` → small-file compaction;
    * with `zorder_by => 'c1,c2'` → clustered rewrite along a
    * space-filling curve (`curve => 'morton'|'hilbert'`), so the
    * q352/q355 multi-column data-skipping layout applies to a real
    * table in place.
    */
  private final class OptimizeProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "optimize"
    override def description(): String =
      "bin-pack small files toward target_bytes and commit a snapshot; " +
        "zorder_by => 'c1,c2' clusters along a space-filling curve instead"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("target_bytes", LongType),
      ProcedureParameter.in("zorder_by", StringType)
        .defaultValue("''").build(),
      ProcedureParameter.in("curve", StringType)
        .defaultValue("'morton'").build())
    private val out = StructType(Seq(
      StructField("committed_version", LongType),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("groups", IntegerType, nullable = false),
      StructField("bytes_rewritten", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, schema) = resolve(input.getUTF8String(0).toString)
      val zorderBy = input.getUTF8String(2).toString.trim
      if (zorderBy.isEmpty) {
        val r = FwMaintenance.optimize(spark, path, input.getLong(1))
        result(out, Seq(r.committedVersion.orNull, r.filesBefore,
          r.filesAfter, r.groups, r.bytesRewritten))
      } else {
        val r = FwMaintenance.optimizeZorder(spark, path, schema,
          zorderBy.split(',').map(_.trim).toSeq, input.getLong(1),
          input.getUTF8String(3).toString)
        result(out, Seq(r.committedVersion.orNull, r.filesBefore,
          r.filesAfter, r.filesAfter, r.bytesRewritten))
      }
    }
  }

  /** `CALL fw.reorg(tbl)` → REORG APPLY (PURGE): rewrite every live
    * file without the dropped physical fields and collapse the column
    * mapping to identity — the pass that makes DROP COLUMN's bytes
    * actually reclaimable (pre-reorg pins still read the retained
    * originals; vacuum finishes the erasure).
    */
  private final class ReorgProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "reorg"
    override def description(): String =
      "rewrite live files at the purged layout (APPLY PURGE) so " +
        "dropped columns stop occupying bytes; commits one snapshot"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType))
    private val out = StructType(Seq(
      StructField("committed_version", LongType),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("bytes_before", LongType, nullable = false),
      StructField("bytes_after", LongType, nullable = false),
      StructField("purged_fields", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, schema) = resolve(input.getUTF8String(0).toString)
      val r = FwMaintenance.reorg(spark, path, schema)
      result(out, Seq(r.version.orNull, r.filesBefore, r.filesAfter,
        r.bytesBefore, r.bytesAfter, r.purgedFields))
    }
  }

  /** `CALL fw.vacuum(tbl, retain_last)` → trim history, sweep files. */
  private final class VacuumProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "vacuum"
    override def description(): String =
      "trim snapshot history to the newest retain_last versions and " +
        "sweep unreferenced files and stray tmps"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("retain_last", IntegerType))
    private val out = StructType(Seq(
      StructField("versions_retained", IntegerType, nullable = false),
      StructField("versions_dropped", IntegerType, nullable = false),
      StructField("stray_tmps_removed", IntegerType, nullable = false),
      StructField("orphan_files_removed", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val r = FwMaintenance.vacuum(spark, path, input.getInt(1))
      result(out, Seq(r.versionsRetained, r.versionsDropped,
        r.strayTmpsRemoved, r.orphanFilesRemoved))
    }
  }

  /** `CALL fw.rollback(tbl, version)` → hard reset to a snapshot. */
  private final class RollbackProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "rollback"
    override def description(): String =
      "hard-rollback the table to snapshot `version` (newer files die)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("version", LongType))
    private val out = StructType(Seq(
      StructField("versions_dropped", IntegerType, nullable = false),
      StructField("files_removed", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val r = FwMaintenance.rollback(spark, path, input.getLong(1))
      result(out, Seq(r.versionsDropped, r.filesRemoved))
    }
  }

  /** `CALL fw.clone(tbl, target_path)` → zero-copy snapshot clone. */
  private final class CloneProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "clone"
    override def description(): String =
      "hard-link the latest snapshot into target_path as its version 1"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("target_path", StringType))
    private val out = StructType(Seq(
      StructField("files_linked", IntegerType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("hard_linked", BooleanType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val r = FwMaintenance.cloneTable(spark, path,
        input.getUTF8String(1).toString)
      result(out, Seq(r.filesLinked, r.bytes, r.hardLinked))
    }
  }

  /** `CALL fw.truncate(tbl)` → empty the live set, keep history. */
  private final class TruncateProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "truncate"
    override def description(): String =
      "retire every live file into retained history and commit an " +
        "empty snapshot (version pins keep reading; vacuum sweeps)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType))
    private val out = StructType(Seq(
      StructField("committed_version", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val v = FwMaintenance.truncateRetain(path)
      result(out, Seq(v.orNull))
    }
  }

  /** `CALL fw.add_constraint(tbl, name, expr)` → named CHECK
    * constraint; validates every existing row before publishing.
    */
  private final class AddConstraintProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "add_constraint"
    override def description(): String =
      "add a named CHECK constraint (validates existing rows first); " +
        "every subsequent write enforces it row-by-row"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("name", StringType),
      in("expr", StringType))
    private val out = StructType(Seq(
      StructField("constraint_name", StringType, nullable = false),
      StructField("n_constraints", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val cname = input.getUTF8String(1).toString
      val expr = input.getUTF8String(2).toString
      val (path, schema) = resolve(tbl)
      FwConstraints.add(spark, path, schema,
        spark.table(s"${cat.name()}.$tbl"), cname, expr)
      result(out, Seq(cname, FwConstraints.read(path).size))
    }
  }

  /** `CALL fw.drop_constraint(tbl, name)` → remove a CHECK constraint. */
  private final class DropConstraintProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "drop_constraint"
    override def description(): String =
      "drop a named CHECK constraint"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("name", StringType))
    private val out = StructType(Seq(
      StructField("n_constraints", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val tbl = input.getUTF8String(0).toString
      val cname = input.getUTF8String(1).toString
      val (path, _) = resolve(tbl)
      FwConstraints.drop(path, cname)
      result(out, Seq(FwConstraints.read(path).size))
    }
  }

  /** `CALL fw.publish(tbl, branch)` → WAP publish: fast-forward main
    * to the audited branch head.
    */
  private final class PublishProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "publish"
    override def description(): String =
      "fast-forward main to a staged branch head (write-audit-publish)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("branch", StringType))
    private val out = StructType(Seq(
      StructField("published_version", LongType, nullable = false),
      StructField("previous_main", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val r = FwMaintenance.publish(path,
        input.getUTF8String(1).toString)
      result(out, Seq(r.publishedVersion, r.previousMain))
    }
  }

  /** `CALL fw.tag(tbl, name, version)` → immutable release pin. */
  private final class TagProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "tag"
    override def description(): String =
      "pin a committed version under an immutable tag name"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("name", StringType),
      in("version", LongType))
    private val out = StructType(Seq(
      StructField("tag_name", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val name = input.getUTF8String(1).toString
      val v = input.getLong(2)
      FwMaintenance.tag(path, name, v)
      result(out, Seq(name, v))
    }
  }

  /** `CALL fw.restore(tbl, version)` → non-destructive restore: a new
    * snapshot whose file list equals the old version's; history stays.
    */
  private final class RestoreProcedure(cat: FwCatalog)
      extends FwProcedure(cat) {
    override def name(): String = "restore"
    override def description(): String =
      "commit a new snapshot equal to an old version (history kept)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("tbl", StringType), in("version", LongType))
    private val out = StructType(Seq(
      StructField("restored_version", LongType, nullable = false),
      StructField("new_version", LongType, nullable = false),
      StructField("files", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (path, _) = resolve(input.getUTF8String(0).toString)
      val r = FwMaintenance.restore(path, input.getLong(1))
      result(out, Seq(r.restoredVersion, r.newVersion, r.files))
    }
  }
}
