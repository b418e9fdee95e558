package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("CosineSim expression is bit-identical to the HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map(_ =>
      (Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("a", "b")
    val diffs = df.select(
        VectorOps.cosine(col("a"), col("b")).as("fast"),
        VectorOps.cosineHof(col("a"), col("b")).as("hof"))
      .filter(col("fast") =!= col("hof"))
      .count()
    assert(diffs === 0)
  }

  test("L2Sq expression is bit-identical to the three-HOF-dot formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map(_ =>
      (Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("a", "b")
    val (da, db) = (VectorOps.toDouble(col("a")), VectorOps.toDouble(col("b")))
    val hof = VectorOps.dot(da, da) - lit(2.0) * VectorOps.dot(da, db) +
      VectorOps.dot(db, db)
    val diffs = df.select(
        GraftFunctions.l2Sq(da, db).as("fast"), hof.as("hof"))
      .filter(col("fast") =!= col("hof"))
      .count()
    assert(diffs === 0)
  }

  test("L2Sq returns NULL on mismatched lengths and null inputs") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(GraftFunctions.l2Sq(col("a"), col("b"))).first().isNullAt(0))
    val nulls = Seq((null: Array[Double], Array(1.0, 2.0))).toDF("a", "b")
    assert(nulls.select(GraftFunctions.l2Sq(col("a"), col("b"))).first().isNullAt(0))
    // identical vectors → exactly zero
    val same = Seq((Array(1.5, -2.5), Array(1.5, -2.5))).toDF("a", "b")
    assert(same.select(GraftFunctions.l2Sq(col("a"), col("b"))).first().getDouble(0) === 0.0)
  }

  test("L2Normalize is bit-identical to the transform/norm HOF formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map(_ =>
      Tuple1(Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("a")
    val e0 = VectorOps.toDouble(col("a"))
    val hof = transform(e0, x => x / VectorOps.norm(e0))
    val diffs = df.select(
        GraftFunctions.l2Normalize(col("a")).as("fast"), hof.as("hof"))
      .filter(col("fast") =!= col("hof"))
      .count()
    assert(diffs === 0)
  }

  test("L2Normalize null/zero semantics match the HOF formulation") {
    import spark.implicits._
    // null input → null output
    val nulls = Seq(Tuple1(null: Array[Double])).toDF("a")
    assert(nulls.select(GraftFunctions.l2Normalize(col("a"))).first().isNullAt(0))
    // zero vector → NaN elements (0/0), exactly like the HOF division
    val zero = Seq(Tuple1(Array(0.0, 0.0))).toDF("a")
    val z = zero.select(GraftFunctions.l2Normalize(col("a"))).first()
      .getSeq[Double](0)
    assert(z.forall(_.isNaN))
    // a null ELEMENT nulls every output element (null norm propagates)
    val withNullElem = Seq(Tuple1(Array[java.lang.Double](1.0, null, 2.0)))
      .toDF("a")
    val r = withNullElem.select(GraftFunctions.l2Normalize(col("a"))).first()
      .getSeq[Any](0)
    assert(r.forall(_ == null))
  }

  test("CosineSim handles double arrays and null inputs") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .union(Seq((null: Array[Double], Array(1.0, 2.0))).toDF("a", "b"))
    val rows = df.select(VectorOps.cosine(col("a"), col("b"))).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
  }

  test("CosineSim returns NULL on mismatched-length arrays (interpreted + codegen)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    // codegen path
    assert(df.select(VectorOps.cosine(col("a"), col("b"))).first().isNullAt(0))
    // matches the zip_with+aggregate HOF semantics (null-padded -> NULL)
    assert(df.select(VectorOps.cosineHof(col("a"), col("b"))).first().isNullAt(0))
    // interpreted path (direct eval over literal children, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = CosineSim(
      Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)))
    assert(e.eval(null) == null)
    // equal-length literals still compute
    val ok = CosineSim(
      Literal.create(Seq(1.0, 0.0), ArrayType(DoubleType)),
      Literal.create(Seq(1.0, 0.0), ArrayType(DoubleType)))
    assert(math.abs(ok.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("SrpBucket matches the per-plane HOF dot-product signs bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val planes = Array.fill(6, 16)(rnd.nextGaussian())
    val df = (0 until 100).map(_ =>
      Tuple1(Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("emb")
    val fused = org.apache.spark.sql.graftbridge.column(
      SrpBucket(org.apache.spark.sql.graftbridge.expression(col("emb")), planes))
    val hof = (0 until 6).map { p =>
      val wRow = array(planes(p).map(lit(_)): _*)
      when(VectorOps.dot(VectorOps.toDouble(col("emb")), wRow) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    assert(df.select(fused.as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count() === 0)
  }

  test("KarpRabin matches a reference fold and is SQL-callable") {
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 256 + (b & 0xff)) % 2147483647L)
    GraftFunctions.register(spark)
    val df = Seq("hello world", "", "the quick brown fox", "héllo ünïcode")
      .toDF("s")
    df.createOrReplaceTempView("kr_input")
    val viaCol = df.select(GraftFunctions.krFingerprint(col("s")))
      .collect().map(_.getLong(0)).toSeq
    val viaSql = spark.sql("SELECT kr_fingerprint(s) FROM kr_input")
      .collect().map(_.getLong(0)).toSeq
    val expected = Seq("hello world", "", "the quick brown fox", "héllo ünïcode").map(ref)
    assert(viaCol === expected)
    assert(viaSql === expected)
  }

  test("cosine_sim is SQL-callable after register(); extensions inject both fns") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").first().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)

    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // registers without throwing
  }

  test("Md5Pack is bit-identical to the conv(substr(md5hex)) formulation") {
    import spark.implicits._
    val P = 2147483647L
    val df = (Seq("", "a", "tok tok tok", "héllo", "x" * 500) ++
      (0 until 100).map(i => s"shingle $i payload")).toDF("s")
    val packed = Md5Pack(col("s"))
    val diffs = df.select(
        shiftright(packed, 31).as("h1_fast"),
        packed.bitwiseAND(lit(0x7fffffffL)).as("h2_fast"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long") % P)
          .as("h1_ref"),
        (conv(substring(md5(col("s")), 16, 15), 16, 10).cast("long") % P)
          .as("h2_ref"))
      .filter(col("h1_fast") =!= col("h1_ref") ||
        col("h2_fast") =!= col("h2_ref"))
      .count()
    assert(diffs === 0)
  }

  test("TopKAgg equals the window top-k and survives repartitioned partial merges") {
    import org.apache.spark.sql.expressions.Window
    val li = graft.queries.Tables
      .t(spark, "/root/testdata/sf0.001", "lineitem")
    val s = struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    def viaAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_suppkey").agg(TopKAgg(s, 3).as("top"))
      .select(col("l_suppkey"), explode(col("top")).as("r"))
      .select(col("l_suppkey"), col("r.l_orderkey"), col("r.l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc)
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg(li) === viaWindow)
    // Forced multi-partition input exercises serialize/merge of partials.
    assert(viaAgg(li.repartition(13)) === viaWindow)
  }

  test("NfcNormalize composes decomposed sequences and is null/ASCII-safe") {
    import spark.implicits._
    val decomposedE = "cafe\u0301"   // e + combining acute
    val angstromSign = "\u212b"      // singleton -> U+00C5
    val df = Seq(decomposedE, angstromSign, "plain ascii", null)
      .toDF("s")
    val rows = df.select(GraftFunctions.nfcNormalize(col("s"))).collect()
    assert(rows(0).getString(0) == "caf\u00e9")
    assert(rows(1).getString(0) == "\u00c5")
    assert(rows(2).getString(0) == "plain ascii", "ASCII must pass through")
    assert(rows(3).isNullAt(0))
    // matches the JVM reference implementation on arbitrary BMP strings
    val rnd = new scala.util.Random(7)
    val marks = Seq("\u0301", "\u0308", "\u030a", "")
    val samples = (0 until 200).map { _ =>
      (0 until 10).map(_ =>
        ('a' + rnd.nextInt(26)).toChar.toString +
          marks(rnd.nextInt(marks.length))).mkString
    }
    val out = samples.toDF("s")
      .select(GraftFunctions.nfcNormalize(col("s"))).collect().map(_.getString(0))
    samples.zip(out).foreach { case (in, got) =>
      assert(got == java.text.Normalizer
        .normalize(in, java.text.Normalizer.Form.NFC))
    }
  }

  test("NfcIdempotence rule collapses nested normalizations in the optimizer") {
    // non-foldable input (id) so ConstantFolding can't erase the calls
    val s = concat(lit("cafe"), col("id").cast("string"))
    val df = spark.range(1)
      .select(GraftFunctions.nfcNormalize(
        GraftFunctions.nfcNormalize(s)).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    val occurrences = "nfc_normalize".r.findAllIn(optimized).length
    assert(occurrences == 1,
      s"nested nfc_normalize not collapsed:\n$optimized")
    assert(df.first().getString(0) == "cafe0")
  }

  test("nfc_normalize is SQL-callable after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT nfc_normalize('cafe\u0301') AS s").collect()
    assert(r.head.getString(0) == "caf\u00e9")
  }

  test("custom expressions constant-fold under the optimizer") {
    val df = spark.range(1)
      .select(GraftFunctions.krFingerprint(lit("abc")).as("kr"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("6382179"),
      s"kr_fingerprint(lit) not folded:\n$optimized")
  }

  test("type mismatch is rejected at analysis time") {
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("s", "i")
    val e = intercept[Exception] {
      df.select(GraftFunctions.cosineSim(col("s"), col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
