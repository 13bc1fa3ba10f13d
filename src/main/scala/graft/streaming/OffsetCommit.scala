package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Consumer-group offset commit from streaming progress (T4).
  *
  * Structured Streaming tracks progress in its own checkpoint, not the
  * Kafka consumer group, so group-lag tooling shows nothing. The reference
  * fixes this with the public `spark-sql-kafka-offset-committer` listener
  * (`net.heartsavior.spark.KafkaOffsetCommitterListener`, ref
  * README.md:141,185): after every batch it parses each Kafka source's end
  * offsets from the query progress and commits them to the group.
  *
  * Same architecture here: [[CommittingProgressListener]] extracts
  * (topic, partition) → offset from each progress event and hands them to
  * a pluggable [[OffsetCommitter]]. The sandbox has no kafka-clients jar,
  * so the wired default is print-only; a production deployment supplies a
  * committer backed by `AdminClient.alterConsumerGroupOffsets` (or a
  * consumer `commitSync`) — the listener/parsing layer is identical.
  */
object OffsetCommit {

  final case class TopicPartitionOffset(topic: String, partition: Int, offset: Long)

  /** Where committed offsets go. Implementations must be idempotent —
    * a replayed batch re-commits the same end offsets. */
  trait OffsetCommitter {
    def commit(group: String, offsets: Seq[TopicPartitionOffset]): Unit
  }

  /** No-broker default: surface the signal on stdout for any log-scraping
    * monitor (the round-2 ProgressListener behavior). */
  final class PrintCommitter extends OffsetCommitter {
    def commit(group: String, offsets: Seq[TopicPartitionOffset]): Unit =
      println(s"[graft] group=$group commit " +
        offsets.map(o => s"${o.topic}-${o.partition}:${o.offset}").mkString(","))
  }

  /** Parse a Kafka source's `endOffset` JSON — `{"topic":{"0":123,"1":7}}`
    * (partition → next offset to consume, which is exactly what a group
    * commit stores). Non-Kafka sources (file, memory, rate) report
    * differently-shaped offsets and parse to empty. */
  def parseEndOffsets(json: String): Seq[TopicPartitionOffset] = {
    if (json == null) return Nil
    val topicBlock = "\"([^\"]+)\"\\s*:\\s*\\{([^{}]*)\\}".r
    val pair = "\"(\\d+)\"\\s*:\\s*(-?\\d+)".r
    topicBlock.findAllMatchIn(json).flatMap { tb =>
      val topic = tb.group(1)
      pair.findAllMatchIn(tb.group(2)).map(p =>
        TopicPartitionOffset(topic, p.group(1).toInt, p.group(2).toLong))
    }.toSeq
  }

  /** The committable slice of one progress event: per Kafka source, the
    * parsed end offsets. `sources` is (description, endOffsetJson).
    * Factored out of the listener so the commit path is unit-testable
    * without fabricating Spark's (private-constructor) progress events. */
  def offsetsFromSources(sources: Seq[(String, String)]): Seq[TopicPartitionOffset] =
    sources.collect {
      case (desc, end) if desc != null && desc.toLowerCase.contains("kafka") =>
        parseEndOffsets(end)
    }.flatten

  /** Progress listener committing Kafka end offsets after every batch and
    * printing the per-batch signal (batch id, rows, offsets). */
  class CommittingProgressListener(group: String,
                                   committer: OffsetCommitter = new PrintCommitter)
    extends StreamingQueryListener {

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      println(s"[graft] query started ${e.id}")

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val sources = Option(e.progress.sources).map(_.toSeq).getOrElse(Nil)
        .map(s => (s.description, s.endOffset))
      println(s"[graft] batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
        s"offsets=${sources.map(_._2).mkString(",")}")
      handleProgress(sources)
    }

    /** Commit path, separated so it is testable with a stubbed committer
      * (Spark's progress events have private constructors). */
    private[graft] def handleProgress(sources: Seq[(String, String)]): Unit = {
      val offsets = offsetsFromSources(sources)
      if (offsets.nonEmpty) committer.commit(group, offsets)
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      println(s"[graft] query terminated ${e.id} error=${e.exception.getOrElse("none")}")
  }
}
