package graft

/** T5 state-store parity (r6 advice #5): every [[StreamAggsSpec]] test —
  * watermarked windows, sessions, flatMapGroupsWithState custom state, the
  * TypedImperativeAggregate sketch buffer, stream-stream interval join —
  * re-run with
  * `spark.sql.streaming.stateStore.providerClass=
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
  * (the provider a production cluster runs for large keyed state: state
  * lives off-heap in RocksDB instead of the default in-memory HDFS-backed
  * map, so state size is bounded by disk, not executor heap). The conf is
  * per-query-start, so setting it around each test retargets only the
  * queries this suite starts; results must be IDENTICAL to the default
  * provider — the suites share every assertion.
  */
class StreamAggsRocksDbSpec extends StreamAggsSpec {
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try super.withFixture(test)
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
