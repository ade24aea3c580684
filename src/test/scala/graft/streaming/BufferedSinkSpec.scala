package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Exactly-once buffered sink: batchId idempotency under redelivery
  * (SURVEY.md §2.A10–A12; models the reference's buffer-flush + LSN dedup).
  */
class BufferedSinkSpec extends SparkSpec {

  import spark.implicits._

  test("redelivered batchId is a no-op; distinct batches all land") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val sink = new BufferedSink(dir)

    assert(sink.writeBatch(Seq(1L, 2L).toDF("id"), batchId = 0))
    assert(sink.writeBatch(Seq(3L).toDF("id"), batchId = 1))
    // crash-replay: same batch redelivered with different (stale) content
    assert(!sink.writeBatch(Seq(99L).toDF("id"), batchId = 1))

    val all = spark.read.parquet(s"$dir/batch=*").as[Long].collect().sorted
    assert(all.toSeq === Seq(1L, 2L, 3L))
    assert(sink.committedBatches() === Set(0L, 1L))
  }

  test("foreachBatch adapter drives a real streaming query exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink_stream").toString
    val sink = new BufferedSink(dir)
    val mem = MemoryStream[Long]
    val q = mem.toDF().writeStream.foreachBatch(sink.forEachBatch _).start()
    mem.addData(Seq(10L, 11L)); q.processAllAvailable()
    mem.addData(Seq(12L)); q.processAllAvailable()
    q.stop()
    val all = spark.read.parquet(s"$dir/batch=*").collect().map(_.getLong(0)).sorted
    assert(all.toSeq === Seq(10L, 11L, 12L))
  }
}
