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
      val partDirs = Option(new java.io.File(base.toString).listFiles())
        .getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("s_nationkey="))
      val dirs = partDirs.length
      // exact pruning = every directory EXCEPT the (0 or 1) nk=7 dirs is
      // skipped; at tiny SFs the fixture may carry no nk=7 supplier at
      // all, in which case the scan legitimately prunes ALL dirs
      val nk7Dirs = partDirs.count(_.getName == "s_nationkey=7")
      val nk7 = rd.filter(col("s_nationkey") === 7).count()
      val prunedExactly =
        graft.sources.FixedWidth.lastPrunedPartitions == dirs - nk7Dirs
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
    // STRING ZORDER KEYS: the q394 quantizer extended with a 6-byte
    // left-aligned prefix rank (ZOrder.stringRank48, codegen'd
    // built-ins only) so `zorder_by` accepts string columns; pruning
    // correctness rides on q365's truncate-and-increment string zone
    // maps, the rank only buys locality. A py-striped table (string
    // predicates prune nothing) is clustered on (sx, py) and the same
    // sx range predicate then skips most files.
    "q398_fw_zorder_string" -> ((spark, dir) => {
      val base = Tables.freshFwBase("graft_fw_zstr", dir)
      val spec = "k:long:8,sx:string:6,py:long:4"
      val pts = t(spark, dir, "orders").select(
        col("o_orderkey").as("k"),
        format_string("D%04d", pmod(col("o_custkey"), lit(4096L)))
          .as("sx"),
        pmod(datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")), lit(4096)).cast("long")
          .as("py"))
      pts.repartitionByRange(4, col("py")).sortWithinPartitions("py")
        .write.format("graft.sources.FixedWidth")
        .option("schema", spec).mode("overwrite").save(base.toString)
      def scanSx(): (Long, Int) = {
        val n = spark.read.format("graft.sources.FixedWidth")
          .option("schema", spec).load(base.toString)
          .filter(col("sx") >= "D0100" && col("sx") <= "D0250").count()
        (n, graft.sources.FixedWidth.lastSkippedFiles)
      }
      val (_, skippedBefore) = scanSx()
      spark.conf.set("spark.sql.catalog.fwzsq",
        "graft.sources.FwCatalog")
      spark.sql("DROP TABLE IF EXISTS fwzsq.ns.zstr")
      spark.sql(s"""CREATE TABLE fwzsq.ns.zstr (k BIGINT, sx STRING,
        py BIGINT) OPTIONS (path '${base.toString}', widths '8,6,4')""")
      val liveBytes = new java.io.File(base.toString).listFiles()
        .filter(_.getName.endsWith(".fw")).map(_.length()).sum
      val report = spark.sql("CALL fwzsq.optimize(tbl => 'ns.zstr', " +
        s"target_bytes => ${liveBytes / 16 + 1}, " +
        "zorder_by => 'sx,py')").collect()(0)
      val (nAfter, skippedAfter) = scanSx()
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).load(base.toString)
        .filter(col("sx") >= "D0100" && col("sx") <= "D0250")
        .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("sum_k"),
          min(col("sx")).as("min_sx"), max(col("sx")).as("max_sx"),
          min(col("py")).as("min_py"), max(col("py")).as("max_py"))
        .withColumn("rows_stable",
          lit(nAfter).cast("long") === col("n_rows"))
        .withColumn("no_prune_before_call", lit(skippedBefore == 0))
        .withColumn("prunes_after_call",
          lit(skippedAfter >= report.getInt(2) / 3))
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

    // the string-keyed clustered rewrite must neither add, drop, nor
    // alter a row; the oracle recomputes the sx-slice straight from
    // orders and pins all three layout contracts TRUE
    "q398_fw_zorder_string" -> """
      WITH pts AS (
        SELECT o_orderkey AS k,
          printf('D%04d', CAST(o_custkey % 4096 AS BIGINT)) AS sx,
          CAST(CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
            AS BIGINT) % 4096 AS BIGINT) AS py
        FROM orders)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(k) AS BIGINT) AS sum_k,
        min(sx) AS min_sx, max(sx) AS max_sx,
        min(py) AS min_py, max(py) AS max_py,
        TRUE AS rows_stable, TRUE AS no_prune_before_call,
        TRUE AS prunes_after_call
      FROM pts WHERE sx >= 'D0100' AND sx <= 'D0250'""",
  )
}
