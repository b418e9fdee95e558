package graft.sources

import org.apache.spark.sql.SparkSession

/** Table-maintenance operations for the fixed-width source. The first
  * is OPTIMIZE-style small-file compaction (the Delta/Iceberg
  * bin-packing idea): many small published `.fw` files are rewritten
  * into few near-`targetBytes` files and the result is committed as a
  * new snapshot version, so the 100 TB failure mode this exists for —
  * a streaming or fine-grained batch producer leaving millions of
  * KB-sized files whose per-file open/seek overhead dwarfs the record
  * IO — is repaired without touching record semantics.
  *
  * Why this is cheap here and at scale: fixed-width records mean ANY
  * byte-level concatenation of whole files is itself a valid file
  * (every file is record-aligned by construction), so compaction is
  * pure streaming byte IO — zero decode, zero re-encode, zero shuffle.
  * Each bin-packed group is one independent task; the job's wall clock
  * is the largest group's byte count at disk bandwidth.
  *
  * Zone-map sidecars survive compaction: a group whose inputs ALL have
  * live sidecars gets the envelope union (exact Long mins/maxes for
  * integral columns, widened finite bounds + OR'd hasNaN for doubles),
  * so post-compaction scans keep pruning. Any statless input poisons
  * only its own group's sidecar (stats are an optimization, never a
  * correctness dependency — `FwStats` reads absence as "never prune").
  *
  * Transactionality is the filesystem's, same as every other writer
  * here: new files ride the tmp→rename publish protocol, inputs are
  * deleted only after every group is published, and the snapshot
  * manifest commits last. Like Delta's VACUUM, compaction is a
  * maintenance operation: run it without concurrent LIVE readers of
  * the same table (versioned readers pinned at pre-compaction
  * snapshots fail loudly once the inputs are deleted — the documented
  * manifest contract for vacuumed files). On a real cluster the
  * remaining hardening step is an intent log so a crash between
  * publish and delete is replayable; single-writer maintenance windows
  * make that unnecessary here.
  */
object FwMaintenance {

  /** What a compaction run did. `committedVersion` is None when the
    * run was a no-op (nothing worth compacting — no manifest version
    * is burned).
    */
  final case class CompactionReport(
      committedVersion: Option[Long],
      filesBefore: Int,
      filesAfter: Int,
      groups: Int,
      bytesRewritten: Long)

  private final case class GroupPlan(inputs: Vector[(String, Long)],
      index: Int)
  private final case class GroupResult(tmpData: String, hasSidecar: Boolean)

  /** Bin-pack every published `.fw` file smaller than `targetBytes`
    * into groups of combined size ≤ `targetBytes` (greedy, name
    * order — the listing order reads use), rewrite each group as one
    * file, and commit the post-compaction file set as the next
    * snapshot version. Files already ≥ `targetBytes`, and leftover
    * singleton groups (nothing to gain), are untouched.
    */
  def optimize(spark: SparkSession, path: String,
      targetBytes: Long): CompactionReport = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val files = FwFiles.list(path)
    val smalls = files.filter(_.length() < targetBytes)

    val groups = Vector.newBuilder[GroupPlan]
    var cur = Vector.empty[(String, Long)]
    var curBytes = 0L
    var gi = 0
    def close(): Unit = {
      if (cur.size >= 2) { groups += GroupPlan(cur, gi); gi += 1 }
      cur = Vector.empty; curBytes = 0L
    }
    smalls.foreach { f =>
      val len = f.length()
      if (cur.nonEmpty && curBytes + len > targetBytes) close()
      cur :+= ((f.getPath, len)); curBytes += len
    }
    close()
    val planned = groups.result()
    if (planned.isEmpty)
      return CompactionReport(None, files.length, files.length, 0, 0L)

    // one executor task per group; each streams its inputs into one
    // tmp file and merges the input sidecars — no record ever decodes
    val results = spark.sparkContext
      .parallelize(planned, planned.size)
      .map(g => compactGroup(path, g))
      .collect()

    // publish phase, then input removal, then the snapshot — the same
    // ordering discipline as FwBatchWrite.commit
    val dir = new java.io.File(path)
    results.foreach { r =>
      val tmp = new java.io.File(r.tmpData)
      val target = new java.io.File(dir, tmp.getName.stripSuffix(".tmp"))
      require(tmp.renameTo(target), s"could not publish $tmp -> $target")
      if (r.hasSidecar) {
        val sTmp = new java.io.File(
          FwStats.sidecarFor(r.tmpData.stripSuffix(".tmp")) + ".tmp")
        val sTarget = new java.io.File(dir, sTmp.getName.stripSuffix(".tmp"))
        require(sTmp.renameTo(sTarget),
          s"could not publish $sTmp -> $sTarget")
      }
    }
    planned.foreach(_.inputs.foreach { case (p, _) =>
      new java.io.File(FwStats.sidecarFor(p)).delete()
      require(new java.io.File(p).delete(), s"could not remove input $p")
    })
    val version = FwVersions.commitSnapshot(path)

    val compacted = planned.map(_.inputs.size).sum
    CompactionReport(
      committedVersion = Some(version),
      filesBefore = files.length,
      filesAfter = files.length - compacted + planned.size,
      groups = planned.size,
      bytesRewritten = planned.map(_.inputs.map(_._2).sum).sum)
  }

  /** Runs on an executor: concatenate the group's inputs (exactly the
    * byte lengths recorded at planning — a producer growing a file in
    * place mid-run cannot tear the output off its record boundary)
    * into one tmp file, and merge the input sidecars when every input
    * has one.
    */
  private def compactGroup(dir: String, g: GroupPlan): GroupResult = {
    val name = f"compact-${g.index}%05d-" +
      java.util.UUID.randomUUID().toString.take(8) + ".fw"
    val tmp = new java.io.File(dir, name + ".tmp")
    val out = new java.io.FileOutputStream(tmp)
    try {
      val outCh = out.getChannel
      g.inputs.foreach { case (p, len) =>
        val in = new java.io.FileInputStream(p)
        try {
          val ch = in.getChannel
          var pos = 0L
          while (pos < len) {
            val n = ch.transferTo(pos, len - pos, outCh)
            require(n > 0, s"unexpected EOF copying $p at byte $pos")
            pos += n
          }
        } finally in.close()
      }
    } finally out.close()

    val stats = g.inputs.map { case (p, len) =>
      FwStats.read(new java.io.File(p), len)
    }
    val merged: Option[Map[String, FwColStats]] =
      if (stats.exists(_.isEmpty)) None // a statless input: unknown rows
      else Some(mergeStats(stats.flatten))
    merged.foreach { m =>
      FwStats.write(
        FwStats.sidecarFor(tmp.getPath.stripSuffix(".tmp")) + ".tmp",
        m, tmp.length())
    }
    GroupResult(tmp.getPath, merged.isDefined)
  }

  /** Envelope union across the group. A column absent from one input's
    * sidecar contributed no non-null values there (the writer only
    * records columns it saw), so the union over the inputs that have
    * it is the group's true envelope. A type clash on one column
    * (cannot happen from our writer; hand-edited sidecars could) drops
    * just that column.
    */
  private[sources] def mergeStats(
      ms: Seq[Map[String, FwColStats]]): Map[String, FwColStats] =
    ms.flatMap(_.keys).distinct.flatMap { k =>
      val entries = ms.flatMap(_.get(k))
      if (entries.forall(_.isInstanceOf[FwIntStats])) {
        val is = entries.collect { case s: FwIntStats => s }
        Some(k -> FwIntStats(is.map(_.lo).min, is.map(_.hi).max))
      } else if (entries.forall(_.isInstanceOf[FwDblStats])) {
        val ds = entries.collect { case s: FwDblStats => s }
        Some(k -> FwDblStats(
          ds.flatMap(_.lo).minOption,
          ds.flatMap(_.hi).maxOption,
          ds.exists(_.hasNaN)))
      } else None
    }.toMap
}
