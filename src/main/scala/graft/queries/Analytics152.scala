package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 additions, batch 152 (SURVEY.md §2.4) — the change data
  * feed meeting the other lakehouse dimensions:
  *
  *  - q392: CDF ACROSS A METADATA-ONLY ADD COLUMN. A version range
  *    spanning the evolution boundary reads at the HEAD layout:
  *    pre-evolution commits (plain appends AND a copy-on-write merge
  *    whose change data was materialized at the then-head layout,
  *    resolved through its recorded spec sidecar) surface the added
  *    column as NULL; post-evolution commits carry real values. The
  *    oracle replays every commit class with explicit NULLs, so the
  *    hash match pins the back-fill semantics.
  *
  *  - q393: `startingTimestamp` for readChangeFeed. A wall-clock start
  *    resolves to the newest version committed at or before it (the
  *    timestampAsOf discipline of q373, applied to the change feed),
  *    inclusive of that version's own changes; the oracle replays the
  *    version contents each pin must cover. A timestamp before the
  *    first commit refuses loudly (pinned in FwCdfStreamSpec, not
  *    here — oracle queries must return rows).
  *
  * Scale shape: both are metadata-resolved — timestamp→version is a
  * manifest lookup, per-file layout a schema-log lookup; the data
  * reads stay the same per-commit record runs as q390/q391.
  */
object Analytics152 {
  import Tables.t

  private val FwSchema =
    "s_suppkey:long:8,s_name:string:18,s_nationkey:int:4,s_acctbal:double:24"
  private val FwSchemaEvolved = FwSchema + ",s_tier:string:6"
  private val FwFixtureMaxKey = 100000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // OPTIMIZE … ZORDER BY through CALL fw.optimize: an x-striped
    // table (secondary-column predicates prune NOTHING) is clustered
    // in place along the Morton curve, and the same py predicate then
    // prunes most files via the zone-map sidecars the rewrite wrote.
    // The oracle replays the surviving rows' aggregates and pins both
    // pruning contracts as booleans; at 100 TB the rewrite is one
    // range-shuffle of the live bytes, the read is metadata + the
    // matching tiles.
    "q394_fw_optimize_zorder" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_zopt", dir)
      val spec = "k:long:8,px:long:4,py:long:4"
      val pts = t(spark, dir, "orders").select(
        col("o_orderkey").as("k"),
        pmod(col("o_custkey"), lit(4096L)).cast("long").as("px"),
        pmod(datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")), lit(4096)).cast("long")
          .as("py"))
      pts.repartitionByRange(4, col("px")).sortWithinPartitions("px")
        .write.format("graft.sources.FixedWidth")
        .option("schema", spec).mode("overwrite").save(base.toString)
      def scanPy(): (Long, Int) = {
        val n = spark.read.format("graft.sources.FixedWidth")
          .option("schema", spec).load(base.toString)
          .filter(col("py") >= 1100L && col("py") < 1250L).count()
        (n, graft.sources.FixedWidth.lastSkippedFiles)
      }
      val (_, skippedBefore) = scanPy()
      spark.conf.set("spark.sql.catalog.fwzoq",
        "graft.sources.FwCatalog")
      spark.sql("DROP TABLE IF EXISTS fwzoq.ns.zopt")
      spark.sql(s"""CREATE TABLE fwzoq.ns.zopt (k BIGINT, px BIGINT,
        py BIGINT) OPTIONS (path '${base.toString}', widths '8,4,4')""")
      val liveBytes = new java.io.File(base.toString).listFiles()
        .filter(_.getName.endsWith(".fw")).map(_.length()).sum
      val report = spark.sql("CALL fwzoq.optimize(tbl => 'ns.zopt', " +
        s"target_bytes => ${liveBytes / 16 + 1}, " +
        "zorder_by => 'px,py')").collect()(0)
      val (nAfter, skippedAfter) = scanPy()
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).load(base.toString)
        .filter(col("py") >= 1100L && col("py") < 1250L)
        .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("sum_k"),
          min(col("px")).as("min_px"), max(col("px")).as("max_px"),
          min(col("py")).as("min_py"), max(col("py")).as("max_py"))
        .withColumn("rows_stable", lit(nAfter).cast("long") === col("n_rows"))
        .withColumn("no_prune_before_call", lit(skippedBefore == 0))
        .withColumn("prunes_after_call",
          lit(skippedAfter >= report.getInt(2) / 3))
    }),
    // COLUMN MAPPING (RENAME/DROP COLUMN, metadata-only): the supplier
    // fixture is renamed (s_acctbal -> s_balance), appended to, then
    // loses s_name — not a byte of existing data moves; reads resolve
    // through the mapping, appends render the dropped field's physical
    // hole NULL, and time travel reads the v1 snapshot under the
    // CURRENT logical schema. The oracle replays every leg from the
    // fixture predicates, so the hash match pins the whole mapping
    // semantics end to end.
    "q395_fw_column_mapping" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_colmap", dir)
      val src = t(spark, dir, "supplier")
        .filter(col("s_suppkey") <= FwFixtureMaxKey)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      src.repartitionByRange(2, col("s_suppkey"))
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).mode("overwrite").save(base.toString)
      graft.sources.FwSchemaLog.ensureLog(base.toString, FwSchema)
      graft.sources.FwSchemaLog.renameColumn(base.toString,
        "s_acctbal", "s_balance")
      val specRenamed = "s_suppkey:long:8,s_name:string:18," +
        "s_nationkey:int:4,s_balance:double:24"
      src.filter(col("s_suppkey") % 10 === 7)
        .select((col("s_suppkey") + 700000L).as("s_suppkey"),
          lit("MAPSUP").as("s_name"), lit(71).as("s_nationkey"),
          lit(3.0).as("s_balance"))
        .coalesce(1).write.format("graft.sources.FixedWidth")
        .option("schema", specRenamed).mode("append").save(base.toString)
      graft.sources.FwSchemaLog.dropColumn(base.toString, "s_name")
      val specDropped =
        "s_suppkey:long:8,s_nationkey:int:4,s_balance:double:24"
      src.filter(col("s_suppkey") % 10 === 8)
        .select((col("s_suppkey") + 800000L).as("s_suppkey"),
          lit(72).as("s_nationkey"), lit(9.0).as("s_balance"))
        .coalesce(1).write.format("graft.sources.FixedWidth")
        .option("schema", specDropped).mode("append").save(base.toString)
      def agg(df: DataFrame, pin: String) = df
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(round(s_balance, 2) as decimal(18,2))"))
            .cast("double").as("sum_bal"),
          min(col("s_suppkey")).as("min_key"),
          max(col("s_suppkey")).as("max_key"))
        .withColumn("pin", lit(pin))
      val head = spark.read.format("graft.sources.FixedWidth")
        .option("schema", specDropped).load(base.toString)
      val v1 = spark.read.format("graft.sources.FixedWidth")
        .option("schema", specDropped).option("versionAsOf", "1")
        .load(base.toString)
      agg(head, "head").unionAll(agg(v1, "v1"))
        .select(col("pin"), col("s_nationkey"), col("n_rows"),
          col("sum_bal"), col("min_key"), col("max_key"))
        .orderBy("pin", "s_nationkey")
    }),

    "q392_fw_cdf_evolution" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_cdfev", dir)
      val src = t(spark, dir, "supplier")
        .filter(col("s_suppkey") <= FwFixtureMaxKey)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      // v1: initial load at the ORIGINAL layout
      src.repartitionByRange(2, col("s_suppkey"))
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).mode("overwrite").save(base.toString)
      val schema = graft.sources.FixedWidth.parseSchema(FwSchema)
      // v2: COW merge BEFORE evolution (%10==3 rebalanced)
      graft.sources.FwMaintenance.merge(spark, base.toString, schema,
        src.filter(col("s_suppkey") % 10 === 3)
          .withColumn("s_acctbal", col("s_acctbal") + 1000.0),
        "s_suppkey")
      // materialize v2's change data at the PRE-evolution head, so the
      // final read must resolve it through the recorded spec sidecar
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).option("readChangeFeed", "true")
        .option("startingVersion", "2").option("endingVersion", "2")
        .load(base.toString).count()
      // metadata-only ADD COLUMN — not a byte of v1/v2 data moves
      graft.sources.FwSchemaLog.addColumn(base.toString, FwSchema,
        "s_tier:string:6")
      // v3: append at the WIDENED head
      src.filter(col("s_suppkey") % 10 === 9)
        .select((col("s_suppkey") + 600000L).as("s_suppkey"),
          lit("EVOSUP").as("s_name"), lit(88).as("s_nationkey"),
          lit(7.0).as("s_acctbal"), lit("gold").as("s_tier"))
        .coalesce(1)
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchemaEvolved).mode("append")
        .save(base.toString)
      // ONE range over the whole mixed-layout history, read at head
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", FwSchemaEvolved)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load(base.toString)
        .groupBy(col("_change_type"), col("_commit_version"),
          col("s_tier"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(round(s_acctbal, 2) as decimal(18,2))"))
            .cast("double").as("sum_bal"),
          min(col("s_suppkey")).as("min_key"),
          max(col("s_suppkey")).as("max_key"))
        .orderBy("_change_type", "_commit_version", "s_tier")
    }),

    "q393_fw_cdf_starting_ts" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_cdfts", dir)
      val src = t(spark, dir, "supplier")
        .filter(col("s_suppkey") <= FwFixtureMaxKey)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      // v1: evens; v2: odds; v3: merge-on-read delete of %10==4.
      // The three pins below distinguish commits by WALL-CLOCK, so the
      // fixture must guarantee strictly increasing commit stamps — on
      // a fast run two commits can land in the same millisecond and
      // ts(3)-1 would then resolve past v2 (or refuse entirely)
      def waitPastCommit(v: Long): Unit = {
        val t = graft.sources.FwMaintenance
          .commitTimestamps(base.toString)(v)
        while (System.currentTimeMillis() <= t) Thread.sleep(1L)
      }
      src.filter(col("s_suppkey") % 2 === 0)
        .repartition(2)
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).mode("overwrite").save(base.toString)
      waitPastCommit(1L)
      src.filter(col("s_suppkey") % 2 =!= 0)
        .repartition(2)
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).mode("append").save(base.toString)
      waitPastCommit(2L)
      val schema = graft.sources.FixedWidth.parseSchema(FwSchema)
      graft.sources.FwMaintenance.deleteByKeysMoR(spark, base.toString,
        schema, src.filter(col("s_suppkey") % 10 === 4)
          .select("s_suppkey"), "s_suppkey")
      val ts = graft.sources.FwMaintenance
        .commitTimestamps(base.toString)
      def cdfFrom(pin: String, label: String) = spark.read
        .format("graft.sources.FixedWidth")
        .option("schema", FwSchema).option("readChangeFeed", "true")
        .option("startingTimestamp", pin).load(base.toString)
        .groupBy(col("_change_type"), col("_commit_version"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("s_suppkey")).as("min_key"),
          max(col("s_suppkey")).as("max_key"))
        .withColumn("pin", lit(label))
      // AT v1's instant → from v1 inclusive (full history);
      // one ms BEFORE v3 → newest at-or-before is v2, so v2+v3;
      // AT v3's instant, ISO-8601 → exactly the delete commit
      cdfFrom(ts(1L).toString, "at_v1")
        .unionAll(cdfFrom((ts(3L) - 1).toString, "before_v3"))
        .unionAll(cdfFrom(
          java.time.Instant.ofEpochMilli(ts(3L)).toString, "at_v3_iso"))
        .select(col("pin"), col("_change_type"), col("_commit_version"),
          col("n_rows"), col("min_key"), col("max_key"))
        .orderBy("pin", "_change_type", "_commit_version")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // every mapping leg replayed: head = v1 rows (renamed balance) +
    // the post-rename and post-drop appends; v1 = just the original
    // fixture rows — all under the current logical names
    "q395_fw_column_mapping" -> """
      WITH s AS (
        SELECT s_suppkey, s_nationkey, s_acctbal AS s_balance
        FROM supplier WHERE s_suppkey <= 100000),
      head AS (
        SELECT s_suppkey, s_nationkey, s_balance FROM s
        UNION ALL
        SELECT s_suppkey + 700000, 71, 3.0 FROM s WHERE s_suppkey % 10 = 7
        UNION ALL
        SELECT s_suppkey + 800000, 72, 9.0 FROM s WHERE s_suppkey % 10 = 8),
      legs AS (
        SELECT 'head' AS pin, * FROM head
        UNION ALL
        SELECT 'v1', * FROM s)
      SELECT pin, s_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(round(s_balance, 2) AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_bal,
        min(s_suppkey) AS min_key, max(s_suppkey) AS max_key
      FROM legs GROUP BY 1, 2 ORDER BY 1, 2""",

    // the clustered rewrite must neither add, drop, nor alter a row:
    // the oracle recomputes the py-slice aggregates straight from
    // orders and pins all three layout contracts TRUE
    "q394_fw_optimize_zorder" -> """
      WITH pts AS (
        SELECT o_orderkey AS k,
          CAST(o_custkey % 4096 AS BIGINT) AS px,
          CAST(CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
            AS BIGINT) % 4096 AS BIGINT) AS py
        FROM orders)
      SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(k) AS BIGINT) AS sum_k,
        min(px) AS min_px, max(px) AS max_px,
        min(py) AS min_py, max(py) AS max_py,
        TRUE AS rows_stable, TRUE AS no_prune_before_call,
        TRUE AS prunes_after_call
      FROM pts WHERE py >= 1100 AND py < 1250""",
    // every commit class replayed with explicit NULL back-fill:
    // v1 inserts + v2 pre/post images carry s_tier NULL (written
    // before the column existed); v3's appended rows carry 'gold'
    "q392_fw_cdf_evolution" -> """
      WITH s AS (
        SELECT s_suppkey, s_acctbal FROM supplier
        WHERE s_suppkey <= 100000),
      cdf AS (
        SELECT 'insert' AS ct, CAST(1 AS BIGINT) AS v,
          CAST(NULL AS VARCHAR) AS s_tier, s_suppkey AS k,
          s_acctbal AS bal
        FROM s
        UNION ALL
        SELECT 'delete', 2, NULL, s_suppkey, s_acctbal
        FROM s WHERE s_suppkey % 10 = 3
        UNION ALL
        SELECT 'insert', 2, NULL, s_suppkey, s_acctbal + 1000.0
        FROM s WHERE s_suppkey % 10 = 3
        UNION ALL
        SELECT 'insert', 3, 'gold', s_suppkey + 600000, 7.0
        FROM s WHERE s_suppkey % 10 = 9)
      SELECT ct AS "_change_type", v AS "_commit_version", s_tier,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(round(bal, 2) AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_bal,
        min(k) AS min_key, max(k) AS max_key
      FROM cdf GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // the timestamp→version resolution theorem: each pin replays the
    // commits it must cover (v1 evens, v2 odds, v3 deletes of %10==4)
    "q393_fw_cdf_starting_ts" -> """
      WITH s AS (
        SELECT s_suppkey FROM supplier WHERE s_suppkey <= 100000),
      commits AS (
        SELECT 'insert' AS ct, CAST(1 AS BIGINT) AS v, s_suppkey AS k
        FROM s WHERE s_suppkey % 2 = 0
        UNION ALL
        SELECT 'insert', 2, s_suppkey FROM s WHERE s_suppkey % 2 <> 0
        UNION ALL
        SELECT 'delete', 3, s_suppkey FROM s WHERE s_suppkey % 10 = 4),
      pins AS (
        SELECT 'at_v1' AS pin, CAST(1 AS BIGINT) AS from_v
        UNION ALL SELECT 'before_v3', 2
        UNION ALL SELECT 'at_v3_iso', 3)
      SELECT pin, ct AS "_change_type", v AS "_commit_version",
        CAST(count(*) AS BIGINT) AS n_rows,
        min(k) AS min_key, max(k) AS max_key
      FROM pins JOIN commits ON v >= from_v
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
  )
}
