package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exactly-once streaming epochs on the FW sink: the epoch log makes a
  * replayed commit a no-op, and a torn (published-but-unrecorded)
  * epoch is re-published idempotently instead of duplicated.
  */
class FwEpochSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,score:double:10"

  private def count(dir: String): Long = spark.read
    .format("graft.sources.FixedWidth").option("schema", spec)
    .load(dir).count()

  /** Run one epoch through the sink API the way the engine does:
    * task-side writers produce tmps, driver-side commit publishes.
    */
  private def runEpoch(dir: String, epochId: Long,
      rows: Seq[(Long, Double)], taskId: Long): Unit = {
    val schema = FixedWidth.parseSchema(spec)
    val sink = new FwStreamingWrite(schema, dir)
    val factory = sink.createStreamingWriterFactory(null)
    val writer = factory.createWriter(0, taskId, epochId)
    rows.foreach { case (id, s) =>
      writer.write(org.apache.spark.sql.catalyst.InternalRow(id, s))
    }
    val msg = writer.commit()
    sink.commit(epochId, Array(msg))
  }

  test("a replayed epoch publishes nothing (restart after checkpoint " +
      "truncation)") {
    val dir = Files.createTempDirectory("fwep1").toFile.getAbsolutePath
    runEpoch(dir, 0L, Seq((1L, 1.0), (2L, 2.0)), taskId = 10)
    assert(count(dir) === 2L)
    // restart replays epoch 0 with a different task id (new attempt,
    // new file names — name collision cannot be the dedup mechanism)
    runEpoch(dir, 0L, Seq((1L, 1.0), (2L, 2.0)), taskId = 99)
    assert(count(dir) === 2L, "replayed epoch must not duplicate rows")
    assert(FwEpochs.read(dir) === Seq(0L))
    runEpoch(dir, 1L, Seq((3L, 3.0)), taskId = 11)
    assert(count(dir) === 3L)
    assert(FwEpochs.read(dir) === Seq(0L, 1L))
  }

  test("a torn epoch (files published, log not written) re-publishes " +
      "idempotently") {
    val dir = Files.createTempDirectory("fwep2").toFile.getAbsolutePath
    runEpoch(dir, 0L, Seq((1L, 1.0)), taskId = 10)
    // simulate the crash window: epoch 1's files landed but the log
    // write never happened
    val schema = FixedWidth.parseSchema(spec)
    val sink = new FwStreamingWrite(schema, dir)
    val w = sink.createStreamingWriterFactory(null).createWriter(0, 20, 1L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(2L, 2.0))
    val msg = w.commit() match {
      case FwCommitMessage(tmp) =>
        val f = new java.io.File(tmp)
        val target = new java.io.File(f.getParentFile,
          f.getName.stripSuffix(".tmp"))
        require(f.renameTo(target))
        target
    }
    assert(count(dir) === 2L) // torn file is visible pre-replay
    assert(FwEpochs.read(dir) === Seq(0L))
    // the replay of epoch 1 must REPLACE the torn attempt, not stack
    runEpoch(dir, 1L, Seq((2L, 2.0)), taskId = 21)
    assert(count(dir) === 2L)
    assert(!msg.exists(), "torn attempt's file must be swept")
    assert(FwEpochs.read(dir) === Seq(0L, 1L))
  }

  test("the torn-epoch sweep never matches batch file names (epoch id " +
      "vs partition id collision)") {
    val dir = Files.createTempDirectory("fwep4").toFile.getAbsolutePath
    runEpoch(dir, 0L, Seq((1L, 1.0)), taskId = 10)
    // a batch writer names files part-%05d-<task>.fw: partition 10000
    // produces part-10000-7.fw — exactly what a prefix sweep keyed on
    // epoch 10000 would match. Plant that shape (hand-planted files
    // are live by listing) and commit epoch 10000 over it.
    val published = new java.io.File(dir).listFiles
      .find(f => f.getName.startsWith("epoch-0-")
        && f.getName.endsWith(".fw")).get
    val batchShaped = new java.io.File(dir, "part-10000-7.fw")
    require(published.renameTo(batchShaped))
    assert(count(dir) === 1L)
    runEpoch(dir, 10000L, Seq((2L, 2.0)), taskId = 11)
    assert(batchShaped.exists,
      "epoch 10000's torn-attempt sweep must not delete batch data")
    assert(count(dir) === 2L)
  }

  test("end-to-end: a real streaming query lands each batch once") {
    val dir = Files.createTempDirectory("fwep3").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("fwep3ck").toFile.getAbsolutePath
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "score")
      .writeStream.format("graft.sources.FixedWidth")
      .option("schema", spec).option("checkpointLocation", ckpt)
      .start(dir)
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(count(dir) === 3L)
    assert(FwEpochs.read(dir).size === 2)
  }
}
