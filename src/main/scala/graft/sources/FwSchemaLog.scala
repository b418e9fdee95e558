package graft.sources

import org.apache.spark.sql.types.StructType

/** Schema evolution for the FW source — metadata-only `ADD COLUMN`
  * (the Delta/Iceberg promise: widening a 100-TB table must not
  * rewrite a byte of it).
  *
  * `_fw_schemas.json` holds the table's schema SPEC history (version
  * 1..head, each appending columns to the previous — appends only:
  * existing widths/types/names never change, so every older record
  * layout is a strict byte-level PREFIX of the head layout) plus a
  * file→schema-version map. The map is maintained by exclusion:
  * `addColumn` stamps every file known at evolution time with the
  * pre-evolution head, so any file NOT in the map was written at the
  * current head (writers are required to carry the head schema).
  * Readers parse each file with ITS schema and surface the missing
  * trailing columns as NULL — the scan stays exact-arithmetic
  * (per-file record lengths), zone maps and seek narrowing keep
  * working (prefix offsets are unchanged), and old snapshots read
  * correctly through the same per-file resolution.
  */
object FwSchemaLog {
  final case class Log(specs: Vector[String], fileSv: Map[String, Int]) {
    val head: Int = specs.length
    private val schemas: Vector[StructType] =
      specs.map(FixedWidth.parseSchema)
    private val lens: Vector[Long] =
      schemas.map(s => FixedWidth.widths(s).sum + 1L)
    def headSchema: StructType = schemas.last
    def svOf(fileName: String): Int = fileSv.getOrElse(fileName, head)
    def rowLenOf(fileName: String): Long = lens(svOf(fileName) - 1)
    def dataColsOf(fileName: String): Int =
      schemas(svOf(fileName) - 1).length
    /** True when every name in `files` parses at the head layout. */
    def uniformOver(files: Iterable[String]): Boolean =
      files.forall(svOf(_) == head)
  }

  def fileFor(path: String): java.io.File =
    new java.io.File(path, "_fw_schemas.json")

  def read(path: String): Option[Log] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val f = fileFor(path)
    if (!f.isFile) None
    else {
      val doc = JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8))
      val specs = doc \ "versions" match {
        case JArray(vs) => vs.map {
          case JString(s) => s
          case other => throw new IllegalArgumentException(
            s"bad _fw_schemas.json version: $other")
        }.toVector
        case other => throw new IllegalArgumentException(
          s"bad _fw_schemas.json: $other")
      }
      val files = doc \ "files" match {
        case JObject(fs) => fs.map {
          case (name, JInt(sv)) => name -> sv.toInt
          case (name, JLong(sv)) => name -> sv.toInt
          case other => throw new IllegalArgumentException(
            s"bad _fw_schemas.json file entry: $other")
        }.toMap
        case _ => Map.empty[String, Int]
      }
      Some(Log(specs, files))
    }
  }

  /** Callers hold the table's commit lock. */
  private[sources] def write(path: String, log: Log): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val doc = ("versions" -> log.specs) ~
      ("files" -> log.fileSv.toSeq.sortBy(_._1).map {
        case (n, sv) => n -> sv
      }.toMap)
    val target = fileFor(path)
    val tmp = new java.io.File(target.getPath + ".tmp")
    java.nio.file.Files.write(tmp.toPath,
      JsonMethods.compact(JsonMethods.render(doc))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, target.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Metadata-only column append: every `.fw` file the table knows
    * (live, retained history, every manifest version) is stamped with
    * the pre-evolution head so later readers parse it at its true
    * layout; then the widened spec becomes the new head. No data file
    * is touched.
    */
  def addColumn(path: String, currentSpec: String,
      colSpec: String): Unit = {
    require(new java.io.File(path).isDirectory,
      s"no FixedWidth table at $path")
    // flat-table contract: partitioned/bucketed layouts keep files in
    // `<k>=<v>` subdirectories the stamp pass does not walk — evolving
    // one would leave old files head-parsed (silent mis-slicing)
    require(!Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .exists(d => d.isDirectory && d.getName.contains("=")),
      s"FixedWidth: ADD COLUMN is a flat-table operation; $path holds " +
        "a partitioned or bucketed layout")
    FwVersions.withLock(path) {
      val existing = read(path)
      existing.foreach { log =>
        require(specEq(log.specs.last, currentSpec),
          s"FixedWidth: currentSpec does not match the evolved head " +
            s"schema '${log.specs.last}'")
      }
      val newSpec = s"$currentSpec,$colSpec"
      val widened = FixedWidth.parseSchema(newSpec) // validates shape
      val cur = FixedWidth.parseSchema(currentSpec)
      require(widened.length == cur.length + 1,
        s"FixedWidth: colSpec must describe exactly one column: $colSpec")
      require(!cur.fieldNames.contains(widened.fields.last.name),
        s"FixedWidth: column ${widened.fields.last.name} already exists")
      val oldHead = existing.map(_.head).getOrElse(1)
      val oldSpecs = existing.map(_.specs).getOrElse(Vector(currentSpec))
      // stamp everything known now at the old head
      val known: Set[String] =
        (FwFiles.listPhysical(path).map(_.getName) ++
          FwVersions.read(path).flatMap(_._2.map(_._1))).toSet
      val prior = existing.map(_.fileSv).getOrElse(Map.empty)
      val stamped = prior ++
        known.filterNot(prior.contains).map(_ -> oldHead)
      write(path, Log(oldSpecs :+ newSpec, stamped))
    }
  }

  /** Guard for operations that slice records at the head layout (COW
    * merge/delete ordinal matching, streaming offsets): they are only
    * sound when every file they may touch already IS head-layout.
    * Compaction does NOT need this — it groups per layout and stamps
    * its outputs; row-level SQL DML doesn't either — its COW scan is
    * per-file-layout-aware and upgrades as it rewrites.
    */
  private[sources] def requireUniform(path: String, op: String): Unit =
    read(path).foreach { log =>
      val live = FwFiles.list(path).map(_.getName)
      require(log.uniformOver(live),
        s"FixedWidth $op at $path: the table carries files at older " +
          "schema versions (metadata-only ADD COLUMN); this operation " +
          "slices records at the head layout and would mis-parse " +
          "them — rewrite old files first (e.g. a COW pass on a " +
          "uniform table) or run the op before evolving")
    }

  /** Truncate wipes every file; stale name→sv entries must die with
    * them or a recycled file name would inherit the wrong layout.
    * Callers hold the commit lock.
    */
  private[sources] def purgeFiles(path: String): Unit =
    read(path).foreach(log => write(path, log.copy(fileSv = Map.empty)))

  /** Spec equality on structure (names, types, widths), ignoring
    * incidental whitespace.
    */
  private def specEq(a: String, b: String): Boolean = {
    val sa = FixedWidth.parseSchema(a)
    val sb = FixedWidth.parseSchema(b)
    sa.fields.map(f => (f.name, f.dataType)).sameElements(
      sb.fields.map(f => (f.name, f.dataType))) &&
      FixedWidth.widths(sa).sameElements(FixedWidth.widths(sb))
  }

  /** Read-side validation: a scan's declared schema must be the head
    * once a log exists (reading an evolved table with a stale schema
    * would silently mis-slice the new files).
    */
  private[sources] def requireHead(path: String,
      schema: StructType): Option[Log] = {
    val log = read(path)
    log.foreach { l =>
      val head = l.headSchema
      require(schema.fields.map(f => (f.name, f.dataType)).sameElements(
        head.fields.map(f => (f.name, f.dataType))) &&
        FixedWidth.widths(schema).sameElements(FixedWidth.widths(head)),
        s"FixedWidth: table at $path has evolved to " +
          s"'${l.specs.last}'; reads and writes must carry the head " +
          "schema")
    }
    log
  }
}
