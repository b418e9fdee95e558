package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** The end-to-end layout payoff: a z-ordered file layout queried
  * through the fixed-width source's own zone-map skipping.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("z-order layout makes SECONDARY-column predicates prune files") {
    // the same 64x64 grid written as 16 fixed-width files under two
    // layouts. A z-ordered layout turns each file into a 16x16 tile,
    // so a predicate on y alone excludes 12 of 16 files; a linear
    // (x, y) sort gives x-stripes whose y envelopes are all full-range
    // — nothing prunes.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val spec = "x:long:4,y:long:4"
    val schema = FixedWidth.parseSchema(spec)
    def writeLayout(key: ((Long, Long)) => Long): String = {
      val dir = java.nio.file.Files.createTempDirectory("fwlayout")
      grid.groupBy(key).foreach { case (bucket, rows) =>
        val path = dir.resolve(f"part_$bucket%02d.fw")
        val bytes = FixedWidthWriter.render(schema,
          rows.map { case (x, y) => Seq[Any](x, y) })
        java.nio.file.Files.write(path, bytes)
        FwStats.write(FwStats.sidecarFor(path.toString), Map(
          "x" -> FwIntStats(rows.map(_._1).min, rows.map(_._1).max),
          "y" -> FwIntStats(rows.map(_._2).min, rows.map(_._2).max)),
          bytes.length.toLong)
      }
      dir.toString
    }
    val zDir = writeLayout { case (x, y) =>
      ZOrder.z2Ref(x.toInt, y.toInt) / 256 } // 16 contiguous curve tiles
    val linDir = writeLayout { case (x, _) => x / 4 } // 16 x-stripes
    def scan(dir: String): (Long, Int) = {
      val n = spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).load(dir)
        .filter(col("y") >= 0L && col("y") <= 7L).count()
      (n, FixedWidth.lastSkippedFiles)
    }
    val (nz, skippedZ) = scan(zDir)
    val (nl, skippedL) = scan(linDir)
    assert(nz === 512L && nl === 512L, "both layouts return the same rows")
    assert(skippedZ === 12,
      s"z tiles bound y: 12 of 16 files must prune, got $skippedZ")
    assert(skippedL === 0,
      s"x-stripes cannot bound y, got $skippedL pruned")
  }

  test("CALL fw.optimize(zorder_by) clusters a real table in place: " +
      "secondary-column predicates prune files the call laid out") {
    spark.conf.set("spark.sql.catalog.fwzo", classOf[FwCatalog].getName)
    val spec = "x:long:4,y:long:4"
    def freshGrid(name: String): String = {
      val dir = java.nio.file.Files.createTempDirectory("fwzopt")
        .toFile.getAbsolutePath
      spark.sql(s"DROP TABLE IF EXISTS fwzo.ns.$name")
      spark.sql(s"""CREATE TABLE fwzo.ns.$name (x BIGINT, y BIGINT)
        OPTIONS (path '$dir', widths '4,4')""")
      // 64x64 grid written as x-stripes: every file's y envelope is
      // full-range, so a y predicate can prune NOTHING before the call
      spark.range(0, 4096)
        .select((col("id") / 64).cast("long").as("x"),
          (col("id") % 64).cast("long").as("y"))
        .repartitionByRange(4, col("x")).sortWithinPartitions("x", "y")
        .write.format("graft.sources.FixedWidth")
        .option("schema", spec).mode("append").save(dir)
      dir
    }
    def scanY(dir: String): (Long, Int) = {
      val n = spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).load(dir)
        .filter(col("y") >= 0L && col("y") <= 7L).count()
      (n, FixedWidth.lastSkippedFiles)
    }
    for ((name, curve) <- Seq(("gm", "morton"), ("gh", "hilbert"))) {
      val dir = freshGrid(name)
      val (n0, skipped0) = scanY(dir)
      assert(n0 === 512L && skipped0 === 0,
        s"pre-call x-stripes must not prune on y, got $skipped0")
      // 4096 rows x 9 bytes = 36864 bytes; 2304-byte target -> 16 files
      val r = spark.sql(s"CALL fwzo.optimize(tbl => 'ns.$name', " +
        s"target_bytes => 2304, zorder_by => 'x,y', " +
        s"curve => '$curve')").collect()(0)
      assert(r.getLong(0) === 2L, s"clustered rewrite commits v2: $r")
      assert(r.getInt(2) >= 12 && r.getInt(2) <= 16,
        s"~16 clustered files, got ${r.getInt(2)}")
      val (n1, skipped1) = scanY(dir)
      assert(n1 === 512L, "clustering must not change the rows")
      assert(skipped1 >= 10,
        s"$curve tiles bound y: expected >=10 of ${r.getInt(2)} files " +
          s"pruned on a secondary-column predicate, got $skipped1")
      // the pre-call snapshot still reads through retained history
      assert(spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).option("versionAsOf", "1").load(dir)
        .count() === 4096L)
    }
    // guardrails: unknown column, string column, hilbert arity
    val dir = freshGrid("gbad")
    def call(args: String) = intercept[Exception] {
      spark.sql(s"CALL fwzo.optimize(tbl => 'ns.gbad', " +
        s"target_bytes => 2304, $args)").collect()
    }.getMessage
    assert(call("zorder_by => 'nope'").contains("not in the table"))
    assert(call("zorder_by => 'x,y,x,y'").contains("1-3 columns"))
    assert(call("zorder_by => 'x', curve => 'hilbert'")
      .contains("hilbert curve is 2-D"))
  }

  test("stringRank48 agrees with byte-lexicographic order of 6-byte " +
      "prefixes (left-aligned: 'b' ranks above 'aa')") {
    import spark.implicits._
    val vals = Seq("", "a", "aa", "ab", "azzzzzz", "b", "ba", "zz",
      "k0042", "k00421", "é")
    val ranked = vals.toDF("s")
      .select(col("s"), ZOrder.stringRank48(col("s")).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def pref(s: String): Array[Byte] =
      s.getBytes("UTF-8").take(6).padTo(6, 0.toByte)
    for (a <- vals; b <- vals) {
      val cmp = java.util.Arrays.compareUnsigned(pref(a), pref(b))
      if (cmp < 0) assert(ranked(a) < ranked(b),
        s"'$a' must rank below '$b': ${ranked(a)} vs ${ranked(b)}")
      if (cmp == 0) assert(ranked(a) === ranked(b))
    }
  }

  test("CALL fw.optimize(zorder_by) accepts a STRING key: prefix-rank " +
      "quantization + string zone maps prune on the string predicate") {
    spark.conf.set("spark.sql.catalog.fwzs", classOf[FwCatalog].getName)
    val dir = java.nio.file.Files.createTempDirectory("fwzstr")
      .toFile.getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS fwzs.ns.g")
    spark.sql(s"""CREATE TABLE fwzs.ns.g (s STRING, y BIGINT)
      OPTIONS (path '$dir', widths '6,4')""")
    // 64 string keys x 64 y values, laid out as y-stripes: every
    // file's s envelope is full-range, nothing prunes on s
    spark.range(0, 4096)
      .select(format_string("k%04d", col("id") % 64).as("s"),
        (col("id") / 64).cast("long").as("y"))
      .repartitionByRange(4, col("y")).sortWithinPartitions("y", "s")
      .write.format("graft.sources.FixedWidth")
      .option("schema", "s:string:6,y:long:4").mode("append").save(dir)
    def scanS(): (Long, Int) = {
      val n = spark.read.format("graft.sources.FixedWidth")
        .option("schema", "s:string:6,y:long:4").load(dir)
        .filter(col("s") >= "k0000" && col("s") <= "k0007").count()
      (n, FixedWidth.lastSkippedFiles)
    }
    val (n0, skipped0) = scanS()
    assert(n0 === 512L && skipped0 === 0,
      s"y-stripes must not prune on s, got $skipped0")
    val r = spark.sql("CALL fwzs.optimize(tbl => 'ns.g', " +
      "target_bytes => 2816, zorder_by => 's,y')").collect()(0)
    assert(r.getInt(2) >= 12, s"~16 clustered files: $r")
    val (n1, skipped1) = scanS()
    assert(n1 === 512L, "clustering must not change the rows")
    assert(skipped1 >= 10,
      s"string tiles bound s: expected >=10 of ${r.getInt(2)} files " +
        s"pruned, got $skipped1")
  }

  test("z3 column expression matches the bit-by-bit reference") {
    val probes = Seq((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
      (65535, 65535, 65535), (12345, 54321, 4096), (511, 512, 513))
    val got = spark.createDataFrame(probes).toDF("x", "y", "z")
      .select(ZOrder.z3(col("x"), col("y"), col("z")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === probes.map { case (x, y, z) => ZOrder.z3Ref(x, y, z) })
  }
}
