package graft

import graft.streaming.OffsetCommit
import graft.streaming.OffsetCommit.{CommittingProgressListener, OffsetCommitter, TopicPartitionOffset}
import scala.collection.mutable.ListBuffer

/** Consumer-group offset commit (T4): end-offset parsing and the commit
  * path against a stubbed committer (no broker / kafka-clients in the
  * sandbox — the listener stays print-only in production defaults). */
class OffsetCommitSpec extends SparkSuite {

  private final class Recording extends OffsetCommitter {
    val calls = ListBuffer.empty[(String, Seq[TopicPartitionOffset])]
    def commit(group: String, offsets: Seq[TopicPartitionOffset]): Unit =
      calls += ((group, offsets))
  }

  test("parseEndOffsets: kafka shape, multi-topic/partition; foreign shapes empty") {
    val got = OffsetCommit.parseEndOffsets("""{"t1":{"0":5,"1":-2},"t.2-x":{"3":9}}""")
    assert(got.toSet == Set(
      TopicPartitionOffset("t1", 0, 5L), TopicPartitionOffset("t1", 1, -2L),
      TopicPartitionOffset("t.2-x", 3, 9L)))
    assert(OffsetCommit.parseEndOffsets("""{"logOffset":2}""").isEmpty) // file source
    assert(OffsetCommit.parseEndOffsets("7").isEmpty) // memory source
    assert(OffsetCommit.parseEndOffsets(null).isEmpty)
  }

  test("listener commits kafka sources only, with the configured group") {
    val rec = new Recording
    val l = new CommittingProgressListener("cg-9", rec)
    l.handleProgress(Seq(
      ("KafkaV2[Subscribe[t1]]", """{"t1":{"0":100,"1":101}}"""),
      ("FileStreamSource[file:/in]", """{"logOffset":2}"""),
      ("MemoryStream[value#1]", "7")))
    assert(rec.calls.toList == List(("cg-9",
      Seq(TopicPartitionOffset("t1", 0, 100L), TopicPartitionOffset("t1", 1, 101L)))))
    // idempotent re-commit on replayed batch: same call again, no state
    l.handleProgress(Seq(("KafkaV2[Subscribe[t1]]", """{"t1":{"0":100,"1":101}}""")))
    assert(rec.calls.size == 2 && rec.calls(1)._2 == rec.calls(0)._2)
    // no kafka source → no commit call at all
    l.handleProgress(Seq(("FileStreamSource[file:/in]", """{"logOffset":3}""")))
    assert(rec.calls.size == 2)
  }

  test("live query: listener attaches, observes progress, commits nothing for file sources") {
    import org.apache.spark.sql.streaming.Trigger
    val rec = new Recording
    val l = new CommittingProgressListener("cg-live", rec)
    spark.streams.addListener(l)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-oc").toString
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.txt"), "x\ny".getBytes)
      val q = spark.readStream.text(dir).writeStream
        .format("noop").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt").start()
      q.awaitTermination(60000)
      spark.streams.awaitAnyTermination(1)
    } catch { case _: java.util.concurrent.TimeoutException => }
    finally spark.streams.removeListener(l)
    assert(rec.calls.isEmpty) // file source end offsets never reach the group commit
  }
}
