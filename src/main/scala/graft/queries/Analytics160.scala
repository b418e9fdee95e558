package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 additions, batch 160 (SURVEY.md §2.4) — closing the
  * schema-evolution story's remaining physical gaps:
  *
  *  - q396: REORG APPLY (PURGE). DROP COLUMN is metadata-only, which
  *    leaves the dropped field's bytes (PII included) on disk forever;
  *    `CALL fw.reorg` rewrites every live file at the purged layout —
  *    one distributed read + one distributed write, NO shuffle — and
  *    collapses the column mapping to identity. The query pins: rows
  *    identical under the logical schema, live bytes strictly smaller,
  *    the dropped column's values absent from every live file's raw
  *    bytes, and a pre-reorg version pin still reading the retained
  *    originals at their recorded layout (era translation).
  *
  * Scale shape: the rewrite is a map-only pass (per-task file
  * rewrites, zone-map sidecars written per task); the only driver
  * work is the manifest commit and the schema-log transition.
  */
object Analytics160 {
  import Tables.t

  private val FwSchema =
    "s_suppkey:long:8,s_name:string:18,s_nationkey:int:4,s_acctbal:double:24"
  private val FwFixtureMaxKey = 100000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q396_fw_reorg_purge" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_reorg", dir)
      val src = t(spark, dir, "supplier")
        .filter(col("s_suppkey") <= FwFixtureMaxKey)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      // v1: evens; v2: odds — so a pre-reorg pin exists with a proper
      // subset of the head rows
      src.filter(col("s_suppkey") % 2 === 0)
        .repartition(2)
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).mode("overwrite").save(base.toString)
      src.filter(col("s_suppkey") % 2 =!= 0)
        .repartition(2)
        .write.format("graft.sources.FixedWidth")
        .option("schema", FwSchema).mode("append").save(base.toString)
      // metadata-only RENAME + DROP: the PII column (s_name) vanishes
      // logically but its bytes stay in every file
      graft.sources.FwSchemaLog.ensureLog(base.toString, FwSchema)
      graft.sources.FwSchemaLog.renameColumn(base.toString,
        "s_acctbal", "s_balance")
      graft.sources.FwSchemaLog.dropColumn(base.toString, "s_name")
      def files(prefix: String) = Option(new java.io.File(base.toString)
        .listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".fw") &&
          (prefix.isEmpty || f.getName.startsWith(prefix)))
      def carryPii(fs: Array[java.io.File]) = fs.exists(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .contains("Supplier#"))
      val piiBefore = carryPii(files(""))
      // the purge, driven through the SQL procedure surface
      spark.conf.set("spark.sql.catalog.fwreo",
        "graft.sources.FwCatalog")
      spark.sql("DROP TABLE IF EXISTS fwreo.ns.sup")
      spark.sql(s"""CREATE TABLE fwreo.ns.sup (s_suppkey BIGINT,
        s_nationkey INT, s_balance DOUBLE)
        OPTIONS (path '${base.toString}', widths '8,4,24')""")
      val report = spark.sql("CALL fwreo.reorg(tbl => 'ns.sup')")
        .collect()(0)
      // the post-reorg LIVE set is exactly the rewrite's own output
      // files (the pre-reorg originals retire into retained history
      // for the v1 pin below — those may still carry the bytes until
      // vacuum, by design)
      val piiAfterLive = carryPii(files("reorg-"))
      val bytesBefore = report.getLong(3)
      val bytesAfter = report.getLong(4)
      val specL = "s_suppkey:long:8,s_nationkey:int:4,s_balance:double:24"
      def agg(df: DataFrame, pin: String) = df
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(round(s_balance, 2) as decimal(18,2))"))
            .cast("double").as("sum_bal"),
          min(col("s_suppkey")).as("min_key"),
          max(col("s_suppkey")).as("max_key"))
        .withColumn("pin", lit(pin))
      val head = spark.read.format("graft.sources.FixedWidth")
        .option("schema", specL).load(base.toString)
      // the v1 pin reads RETAINED pre-reorg files through the era
      // translation (they are not byte-prefixes of the purged head)
      val v1 = spark.read.format("graft.sources.FixedWidth")
        .option("schema", specL).option("versionAsOf", "1")
        .load(base.toString)
      agg(head, "head").unionAll(agg(v1, "v1"))
        .withColumn("bytes_shrunk",
          lit(bytesAfter < bytesBefore && bytesAfter > 0L))
        .withColumn("purged_gone", lit(piiBefore && !piiAfterLive))
        .withColumn("purged_fields", lit(report.getInt(5)).cast("int"))
        .select(col("pin"), col("s_nationkey"), col("n_rows"),
          col("sum_bal"), col("min_key"), col("max_key"),
          col("bytes_shrunk"), col("purged_gone"), col("purged_fields"))
        .orderBy("pin", "s_nationkey")
    }),
    // SCHEMA EVOLUTION OVER A HIVE-PARTITIONED LAYOUT: metadata-only
    // ADD COLUMN stamps every existing file under its `k=v` directory
    // (relative keys — bare names can collide across dirs), appends
    // land at the widened head (including a brand-new partition dir),
    // and one read spans the mix: old files parse at their own record
    // length with the new column NULL, new files carry real values,
    // and partition pruning still prunes exactly. The oracle replays
    // both commit classes with explicit NULLs; the pruning contract
    // pins as a boolean.
    "q397_fw_partitioned_evolution" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_partevo", dir)
      val src = t(spark, dir, "supplier")
        .filter(col("s_suppkey") <= FwFixtureMaxKey)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
      val spec1 = "s_suppkey:long:8,s_nationkey:int:4,s_acctbal:double:24"
      val spec2 = spec1 + ",s_tier:string:6"
      src.write.format("graft.sources.FixedWidth")
        .option("schema", spec1).option("partitionBy", "s_nationkey")
        .mode("overwrite").save(base.toString)
      graft.sources.FwSchemaLog.addColumn(base.toString, spec1,
        "s_tier:string:6")
      // the append lands at the widened head, in a NEW partition dir
      src.filter(col("s_suppkey") % 10 === 9)
        .select((col("s_suppkey") + 600000L).as("s_suppkey"),
          lit(77).as("s_nationkey"), lit(7.0).as("s_acctbal"),
          lit("gold").as("s_tier"))
        .write.format("graft.sources.FixedWidth")
        .option("schema", spec2).option("partitionBy", "s_nationkey")
        .mode("append").save(base.toString)
      def rd = spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec2).option("partitionBy", "s_nationkey")
        .load(base.toString)
      val dirs = Option(new java.io.File(base.toString).listFiles())
        .getOrElse(Array.empty)
        .count(d => d.isDirectory && d.getName.startsWith("s_nationkey="))
      val nk7 = rd.filter(col("s_nationkey") === 7).count()
      val prunedExactly =
        graft.sources.FixedWidth.lastPrunedPartitions == dirs - 1
      // the pruned single-directory read must see exactly the fixture's
      // nk=7 rows (the evolved append went to nk=77)
      val nk7Expected = src.filter(col("s_nationkey") === 7).count()
      rd.groupBy(col("s_tier"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(round(s_acctbal, 2) as decimal(18,2))"))
            .cast("double").as("sum_bal"),
          min(col("s_suppkey")).as("min_key"),
          max(col("s_suppkey")).as("max_key"),
          sum(when(col("s_nationkey") === 7, 1L).otherwise(0L))
            .as("n_nk7"))
        .withColumn("pruned_exactly", lit(prunedExactly))
        .withColumn("nk7_stable", lit(nk7 == nk7Expected))
        .select(col("s_tier"), col("n_rows"), col("sum_bal"),
          col("min_key"), col("max_key"), col("n_nk7"),
          col("pruned_exactly"), col("nk7_stable"))
        .orderBy("s_tier")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // rows must be IDENTICAL before and after the purge: the head leg
    // is all fixture rows, the v1 pin exactly the evens, and all three
    // physical-reclaim contracts pin TRUE
    "q396_fw_reorg_purge" -> """
      WITH s AS (
        SELECT s_suppkey, s_nationkey, s_acctbal AS s_balance
        FROM supplier WHERE s_suppkey <= 100000),
      legs AS (
        SELECT 'head' AS pin, * FROM s
        UNION ALL
        SELECT 'v1', * FROM s WHERE s_suppkey % 2 = 0)
      SELECT pin, s_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(round(s_balance, 2) AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_bal,
        min(s_suppkey) AS min_key, max(s_suppkey) AS max_key,
        TRUE AS bytes_shrunk, TRUE AS purged_gone,
        CAST(1 AS INT) AS purged_fields
      FROM legs GROUP BY 1, 2 ORDER BY 1, 2""",

    // both commit classes replayed with explicit NULL back-fill for
    // the pre-evolution partition files; the pruning contracts pin TRUE
    "q397_fw_partitioned_evolution" -> """
      WITH s AS (
        SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        WHERE s_suppkey <= 100000),
      evolved AS (
        SELECT s_suppkey, s_nationkey, s_acctbal,
          CAST(NULL AS VARCHAR) AS s_tier FROM s
        UNION ALL
        SELECT s_suppkey + 600000, 77, 7.0, 'gold'
        FROM s WHERE s_suppkey % 10 = 9)
      SELECT s_tier, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(round(s_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_bal,
        min(s_suppkey) AS min_key, max(s_suppkey) AS max_key,
        CAST(sum(CASE WHEN s_nationkey = 7 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_nk7,
        TRUE AS pruned_exactly, TRUE AS nk7_stable
      FROM evolved GROUP BY 1 ORDER BY 1""",
  )
}
