package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming change data feed: version-number offsets, per-commit
  * insert rows for appends (including in-place growth), delete rows
  * from merge-on-read deletion vectors, copy-on-write commits served
  * from materialized change data (eager on row-level commits, lazy
  * otherwise; compaction streams zero rows), and checkpointed restart
  * resuming mid-history.
  */
class FwCdfStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"
  private val schema = FixedWidth.parseSchema(spec)

  private def freshTable(rows: Seq[(Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("fwcdfs").toFile.getAbsolutePath
    rows.toDF("id", "name", "score").coalesce(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("overwrite").save(dir)
    dir
  }

  private def append(dir: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("id", "name", "score").coalesce(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("append").save(dir)

  private var qn = 0
  /** Drain the CDF stream into a memory sink; returns (query, table). */
  private def startStream(dir: String, opts: Map[String, String],
      checkpoint: Option[String] = None) = {
    qn += 1
    val name = s"fwcdf_sink_$qn"
    val r = spark.readStream.format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
    val withOpts = opts.foldLeft(r)((r, kv) => r.option(kv._1, kv._2))
    val w = withOpts.load(dir).writeStream.format("memory").queryName(name)
    val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c))
      .start()
    (q, name)
  }

  private def drain(name: String): Seq[(String, Long, Long, String)] =
    spark.table(name)
      .select("_change_type", "_commit_version", "id", "name")
      .as[(String, Long, Long, String)].collect().toSeq.sorted

  test("startingVersion=1 replays the full history as tagged inserts; " +
      "appends keep streaming with their commit versions") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0))) // v1
    append(dir, Seq((3L, "c", 3.0))) // v2
    val (q, sink) = startStream(dir, Map("startingVersion" -> "1"))
    try {
      q.processAllAvailable()
      assert(drain(sink) === Seq(
        ("insert", 1L, 1L, "a"), ("insert", 1L, 2L, "b"),
        ("insert", 2L, 3L, "c")))
      append(dir, Seq((4L, "d", 4.0))) // v3
      q.processAllAvailable()
      assert(drain(sink).contains(("insert", 3L, 4L, "d")))
    } finally q.stop()
  }

  test("a merge-on-read delete streams the erased rows as delete " +
      "changes, read from the retained bytes") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)))
    val (q, sink) = startStream(dir, Map("startingVersion" -> "1"))
    try {
      q.processAllAvailable()
      FwMaintenance.deleteByKeysMoR(spark, dir, schema,
        Seq(2L).toDF("id"), "id") // v2
      q.processAllAvailable()
      assert(drain(sink) === Seq(
        ("delete", 2L, 2L, "b"),
        ("insert", 1L, 1L, "a"), ("insert", 1L, 2L, "b"),
        ("insert", 1L, 3L, "c")))
    } finally q.stop()
  }

  test("a copy-on-write merge in range streams its exact delta " +
      "(pre-image delete + post-image insert), lazily materialized") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    FwMaintenance.merge(spark, dir, schema,
      Seq((1L, "A", 10.0)).toDF("id", "name", "score"), "id") // v2 COW
    val (q, sink) = startStream(dir, Map("startingVersion" -> "1"))
    try {
      q.processAllAvailable()
      // the carried row (2, b) appears in both snapshots and cancels:
      // only the genuinely changed row streams, as delete + insert
      assert(drain(sink) === Seq(
        ("delete", 2L, 1L, "a"),
        ("insert", 1L, 1L, "a"), ("insert", 1L, 2L, "b"),
        ("insert", 2L, 1L, "A")))
      assert(FwChangeData.exists(dir, 2L),
        "first read materializes the commit's change files")
    } finally q.stop()
  }

  test("a live stream rides over a SQL UPDATE (eager change data) and " +
      "a compaction commit streams zero rows") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    spark.conf.set("spark.sql.catalog.fwcdfu", "graft.sources.FwCatalog")
    spark.sql("DROP TABLE IF EXISTS fwcdfu.ns.t")
    spark.sql(s"""CREATE TABLE fwcdfu.ns.t (id BIGINT, name STRING,
      score DOUBLE) OPTIONS (path '$dir', widths '4,6,10')""")
    val (q, sink) = startStream(dir, Map("startingVersion" -> "1"))
    try {
      q.processAllAvailable()
      spark.sql("UPDATE fwcdfu.ns.t SET score = 9.0 WHERE id = 2") // v2
      assert(FwChangeData.exists(dir, 2L),
        "row-level COW commit materializes change data eagerly")
      q.processAllAvailable()
      assert(drain(sink) === Seq(
        ("delete", 2L, 2L, "b"),
        ("insert", 1L, 1L, "a"), ("insert", 1L, 2L, "b"),
        ("insert", 2L, 2L, "b")))
      append(dir, Seq((3L, "c", 3.0))) // v3
      FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20) // v4 COW
      q.processAllAvailable()
      val rows = drain(sink)
      assert(rows.contains(("insert", 3L, 3L, "c")))
      assert(!rows.exists(_._2 == 4L),
        "a compaction commit moves bytes, not rows — zero CDF rows")
    } finally q.stop()
  }

  test("batch readChangeFeed reads a version range, needs an explicit " +
      "startingVersion, and honors endingVersion") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0))) // v1
    append(dir, Seq((3L, "c", 3.0))) // v2
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(1L).toDF("id"), "id") // v3
    def batch(opts: (String, String)*) = {
      val r = spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).option("readChangeFeed", "true")
      opts.foldLeft(r)((r, kv) => r.option(kv._1, kv._2)).load(dir)
        .select("_change_type", "_commit_version", "id")
        .as[(String, Long, Long)].collect().toSeq.sorted
    }
    assert(batch("startingVersion" -> "2") === Seq(
      ("delete", 3L, 1L), ("insert", 2L, 3L)))
    assert(batch("startingVersion" -> "1", "endingVersion" -> "2") ===
      Seq(("insert", 1L, 1L), ("insert", 1L, 2L), ("insert", 2L, 3L)))
    val e = intercept[Exception] { batch() }
    assert(e.getMessage.contains("explicit startingVersion"))
  }

  test("a large COW delta materializes as MULTIPLE part files and the " +
      "streamed CDF still equals changesBetween") {
    val n = 400
    val dir = freshTable((1L to n).map(i => (i, f"n$i%04d", i.toDouble)))
    // rewrite half the rows: a COW merge whose delta (200 deletes +
    // 200 inserts) spreads across the diff's shuffle partitions — the
    // writer must NOT funnel it through one task/file
    FwMaintenance.merge(spark, dir, schema,
      (1L to n by 2).map(i => (i, f"N$i%04d", -i.toDouble))
        .toDF("id", "name", "score"), "id") // v2 COW
    val (q, sink) = startStream(dir, Map("startingVersion" -> "2"))
    try {
      q.processAllAvailable()
      assert(FwChangeData.exists(dir, 2L))
      val insParts = FwChangeData.changeFiles(dir, 2L, "insert")
      val delParts = FwChangeData.changeFiles(dir, 2L, "delete")
      assert(insParts.size > 1 && delParts.size > 1,
        s"change data should land in >1 part (got ${insParts.size} " +
          s"insert / ${delParts.size} delete parts)")
      val streamed = drain(sink)
      val batch = FwChangeFeed.changesBetween(spark, dir, spec, 1L, 2L)
        .select("_change_type", "id", "name")
        .as[(String, Long, String)].collect().toSeq.sorted
      assert(streamed.map(r => (r._1, r._3, r._4)).sorted === batch,
        "multi-part streamed CDF must equal the batch multiset diff")
      assert(streamed.size === n, s"${n / 2} deletes + ${n / 2} inserts")
    } finally q.stop()
  }

  test("rollback drops materialized change data, so a reused version " +
      "number serves the NEW commit's delta, not the rolled-back one") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0))) // v1
    FwMaintenance.merge(spark, dir, schema,
      Seq((1L, "A", 10.0)).toDF("id", "name", "score"), "id") // v2 COW
    def batch() = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingVersion", "2").load(dir)
      .select("_change_type", "_commit_version", "id", "name")
      .as[(String, Long, Long, String)].collect().toSeq.sorted
    assert(batch() === Seq(("delete", 2L, 1L, "a"),
      ("insert", 2L, 1L, "A"))) // forces (lazy) materialization
    assert(FwChangeData.exists(dir, 2L))
    FwMaintenance.rollback(spark, dir, 1L)
    assert(!FwChangeData.exists(dir, 2L),
      "rollback must drop change data above the target version")
    assert(FwChangeData.changeFiles(dir, 2L, "insert").isEmpty &&
      FwChangeData.changeFiles(dir, 2L, "delete").isEmpty)
    FwMaintenance.merge(spark, dir, schema,
      Seq((2L, "B", 20.0)).toDF("id", "name", "score"), "id") // NEW v2
    assert(batch() === Seq(("delete", 2L, 2L, "b"),
      ("insert", 2L, 2L, "B")),
      "the reused version number must serve the new commit's rows")
  }

  test("a CDF range spanning a metadata-only ADD COLUMN reads at the " +
      "head layout with NULL back-fill for pre-evolution rows") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0))) // v1
    FwMaintenance.merge(spark, dir, schema,
      Seq((1L, "A", 10.0)).toDF("id", "name", "score"), "id") // v2 COW
    // materialize v2 at the PRE-evolution layout: the later head read
    // must resolve it through the recorded spec sidecar
    spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingVersion", "2").load(dir).count()
    assert(FwChangeData.spec(dir, 2L) === Some(spec),
      "materialized change data records its layout")
    FwSchemaLog.addColumn(dir, spec, "tag:string:5")
    val spec2 = spec + ",tag:string:5"
    Seq((3L, "c", 3.0, "gold")).toDF("id", "name", "score", "tag")
      .coalesce(1).write.format("graft.sources.FixedWidth")
      .option("schema", spec2).mode("append").save(dir) // v3 at head
    // batch CDF over the WHOLE mixed-layout history, at the head
    val rows = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec2).option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir)
      .select("_change_type", "_commit_version", "id", "name", "tag")
      .as[(String, Long, Long, String, Option[String])]
      .collect().toSeq.sortBy(r => (r._1, r._2, r._3))
    assert(rows === Seq(
      ("delete", 2L, 1L, "a", None),
      ("insert", 1L, 1L, "a", None), ("insert", 1L, 2L, "b", None),
      ("insert", 2L, 1L, "A", None),
      ("insert", 3L, 3L, "c", Some("gold"))),
      "pre-evolution commits NULL-backfill the added column; " +
        "post-evolution rows carry real values")
    // the STREAM sees the same mixed-layout history
    qn += 1
    val sink = s"fwcdf_sink_$qn"
    val q = spark.readStream.format("graft.sources.FixedWidth")
      .option("schema", spec2).option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir)
      .writeStream.format("memory").queryName(sink).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(sink)
        .select("_change_type", "_commit_version", "id", "name", "tag")
        .as[(String, Long, Long, String, Option[String])]
        .collect().toSeq.sortBy(r => (r._1, r._2, r._3))
      assert(streamed === rows, "stream ≡ batch across the boundary")
    } finally q.stop()
  }

  test("startingTimestamp resolves to the newest version at-or-before " +
      "the wall-clock; pre-history timestamps refuse loudly") {
    val dir = freshTable(Seq((1L, "a", 1.0))) // v1
    append(dir, Seq((2L, "b", 2.0))) // v2
    val ts = FwMaintenance.commitTimestamps(dir)
    def batch(pin: String) = spark.read
      .format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingTimestamp", pin).load(dir)
      .select("_change_type", "_commit_version", "id")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(batch(ts(1L).toString) === Seq(
      ("insert", 1L, 1L), ("insert", 2L, 2L)),
      "a pin at v1's instant includes v1's own changes")
    assert(batch(ts(2L).toString) === Seq(("insert", 2L, 2L)),
      "a pin at v2's instant starts at v2")
    assert(batch(java.time.Instant.ofEpochMilli(ts(2L)).toString) ===
      Seq(("insert", 2L, 2L)), "ISO-8601 instants parse")
    val e = intercept[Exception] { batch((ts(1L) - 1000).toString) }
    assert(e.getMessage.contains("no version at or before"),
      s"pre-history timestamp must refuse, got: ${e.getMessage}")
    val both = intercept[Exception] {
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("startingTimestamp", ts(1L).toString).load(dir)
        .collect()
    }
    assert(both.getMessage.contains("mutually exclusive"))
    // endingTimestamp bounds a batch range the same way (newest
    // version at-or-before), and refuses on a stream
    assert(spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .option("endingTimestamp", ts(1L).toString).load(dir)
      .select("_change_type", "_commit_version", "id")
      .as[(String, Long, Long)].collect().toSeq.sorted ===
      Seq(("insert", 1L, 1L)), "a pin at v1's instant ends at v1")
    val eBoth = intercept[Exception] {
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).option("readChangeFeed", "true")
        .option("startingVersion", "1").option("endingVersion", "2")
        .option("endingTimestamp", ts(1L).toString).load(dir).collect()
    }
    assert(eBoth.getMessage.contains("mutually exclusive"))
    // streaming: a wall-clock start replays from the resolved version
    val (q, sink) = startStream(dir,
      Map("startingTimestamp" -> ts(1L).toString))
    try {
      q.processAllAvailable()
      assert(drain(sink) === Seq(
        ("insert", 1L, 1L, "a"), ("insert", 2L, 2L, "b")))
    } finally q.stop()
  }

  test("a readStream with startingTimestamp resumes at exactly the " +
      "version the batch resolution picks; pre-history refuses on the " +
      "stream too") {
    val dir = freshTable(Seq((1L, "a", 1.0))) // v1
    // the pins below distinguish commits by wall-clock: force strictly
    // increasing stamps so ts(2)'s pin cannot tie with v1
    def waitPast(v: Long): Unit = {
      val t = FwMaintenance.commitTimestamps(dir)(v)
      while (System.currentTimeMillis() <= t) Thread.sleep(1L)
    }
    waitPast(1L)
    append(dir, Seq((2L, "b", 2.0))) // v2
    waitPast(2L)
    append(dir, Seq((3L, "c", 3.0))) // v3
    val ts = FwMaintenance.commitTimestamps(dir)
    def batch(pin: String) = spark.read
      .format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingTimestamp", pin).load(dir)
      .select("_change_type", "_commit_version", "id", "name")
      .as[(String, Long, Long, String)].collect().toSeq.sorted
    // parity at EVERY pin: the stream's replay equals the batch's
    for (v <- 1L to 3L) {
      val pin = ts(v).toString
      val (q, sink) = startStream(dir,
        Map("startingTimestamp" -> pin))
      try {
        q.processAllAvailable()
        assert(drain(sink) === batch(pin),
          s"stream at pin ts($v) must equal the batch resolution")
        assert(drain(sink).map(_._2).min === v,
          s"pin ts($v) must resume at version $v")
      } finally q.stop()
    }
    // pre-history wall-clock refuses on the stream exactly like batch
    val e = intercept[Exception] {
      val (q, _) = startStream(dir,
        Map("startingTimestamp" -> (ts(1L) - 1000).toString))
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).toSeq
    assert(chain(e).exists(_.contains("no version at or before")),
      s"stream pre-history pin must refuse: ${chain(e)}")
  }

  test("without startingVersion the stream tails only commits after " +
      "it started") {
    val dir = freshTable(Seq((1L, "a", 1.0)))
    val (q, sink) = startStream(dir, Map.empty)
    try {
      q.processAllAvailable()
      assert(drain(sink).isEmpty, "history before the stream is skipped")
      append(dir, Seq((2L, "b", 2.0))) // v2
      q.processAllAvailable()
      assert(drain(sink) === Seq(("insert", 2L, 2L, "b")))
    } finally q.stop()
  }

  test("checkpointed restart resumes from the committed version " +
      "offset — no replay, no gap") {
    val dir = freshTable(Seq((1L, "a", 1.0)))
    val cp = Files.createTempDirectory("fwcdfcp").toFile.getAbsolutePath
    val out = Files.createTempDirectory("fwcdfout").toFile.getAbsolutePath
    // the memory sink cannot recover a checkpoint; a parquet sink can
    def start() = spark.readStream.format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    def got() = spark.read.parquet(out)
      .select("_change_type", "_commit_version", "id")
      .as[(String, Long, Long)].collect().toSeq.sorted
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(got() === Seq(("insert", 1L, 1L)))
    } finally q1.stop()
    append(dir, Seq((2L, "b", 2.0))) // v2, while the stream is down
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(1L).toDF("id"), "id") // v3, also while down
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly the downtime delta arrives: v2's insert, v3's delete
      assert(got() === Seq(("delete", 3L, 1L),
        ("insert", 1L, 1L), ("insert", 2L, 2L)))
    } finally q2.stop()
  }
}
