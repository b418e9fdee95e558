package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Row-grain CHANGE DATA FEED between two snapshot versions (the Delta
  * `_change_type` surface, derived instead of logged): emits each row
  * that exists in `toVersion` but not `fromVersion` tagged `insert`,
  * and each row gone from `fromVersion` tagged `delete`. An UPDATE
  * under copy-on-write is, by construction, one `delete` (pre-image)
  * plus one `insert` (post-image).
  *
  * How it stays cheap at 100 TB: the batch writer never mutates a
  * published file, so only files in exactly ONE of the two snapshots
  * can contribute changes. Both legs read through the existing
  * snapshot machinery — `versionAsOf=to, changesFromVersion=from`
  * lists to-only files, and the mirrored pin lists from-only files —
  * so the scan never touches the (overwhelmingly common) files both
  * versions share; rows a COW rewrite copied verbatim appear in both
  * legs and cancel in the multiset difference. The invariant
  * `from ⊎ inserts ∖ deletes = to` holds exactly.
  *
  * Merge-on-read deletes are the one change that mutates no file: a
  * deletion-vector entry with `from < since ≤ to` voids rows inside a
  * SHARED file. When any such entry exists the file-diff shortcut is
  * invalid, and this falls back to the always-correct full-snapshot
  * multiset diff (still two pinned scans and one shuffle; the
  * detection itself is a few sidecar JSON reads).
  */
object FwChangeFeed {

  def changesBetween(spark: SparkSession, path: String, spec: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"changesBetween needs fromVersion < toVersion, " +
        s"got $fromVersion..$toVersion")
    def read(pin: Long, minus: Option[Long]): DataFrame = {
      val r = spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).option("versionAsOf", pin)
      minus.fold(r)(m => r.option("changesFromVersion", m)).load(path)
    }
    val fromFiles = FwVersions.resolve(path, fromVersion).map(_._1).toSet
    val toFiles = FwVersions.resolve(path, toVersion).map(_._1).toSet
    val shared = fromFiles intersect toFiles
    val dvDelta = shared.exists { name =>
      FwDv.read(new java.io.File(path, name).getPath)
        .exists(e => e._1 > fromVersion && e._1 <= toVersion)
    }
    val (addedRows, removedRows) =
      if (dvDelta)
        (read(toVersion, None), read(fromVersion, None))
      else
        (read(toVersion, Some(fromVersion)),
          read(fromVersion, Some(toVersion)))
    addedRows.exceptAll(removedRows)
      .withColumn("_change_type", lit("insert"))
      .unionAll(removedRows.exceptAll(addedRows)
        .withColumn("_change_type", lit("delete")))
  }
}
