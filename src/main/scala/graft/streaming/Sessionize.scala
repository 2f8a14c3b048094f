package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Custom streaming state via `flatMapGroupsWithState` (builder mandate:
  * KeyValueGroupedDataset custom state): 30-minute-gap sessionization of an
  * event stream, emitting a row per CLOSED session. Event-time timeout via
  * watermark; the batch twin is SparkEntry's `q_sessionize` (lag + running
  * sum), which the DuckDB oracle checks.
  */
object Sessionize {

  /** ts kept as the watermarked timestamp column (event-time timeout needs
    * the watermark attribute to survive into the grouped Dataset). */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp) {
    def tsUs: Long = ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
  }
  final case class SessionState(start_us: Long, end_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  val gapUs: Long = 1800L * 1000000L

  /** Watermark delay used by run(). INVARIANT (ADVICE r2): the delay must
    * stay <= the session gap — updateState's merge guard only checks
    * `tsUs - end_us <= gapUs` (an event older than start-gap merges rather
    * than splitting), which is batch-consistent precisely because the
    * watermark admits no event more than `gap` behind the stored session
    * window. Raising the delay above the gap requires adding the
    * split-before case to updateState first. */
  val watermarkDelayMinutes: Long = 30L
  val watermarkDelay: String = s"$watermarkDelayMinutes minutes"
  // derived from the SAME constant the delay string renders from (round-5
  // review: a hand-expanded literal here kept guarding the stale value
  // when someone edited only the string)
  require(watermarkDelayMinutes * 60L * 1000000L <= gapUs,
    "watermark delay must not exceed the session gap (see updateState merge guard)")

  def eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Pure state-transition function (unit-testable without a stream). */
  def updateState(userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val sorted = events.map(_.tsUs).toVector.sorted
    val out = Vector.newBuilder[SessionOut]
    var cur = state.getOption
    sorted.foreach { tsUs =>
      cur match {
        case Some(s) if tsUs - s.end_us <= gapUs =>
          // late-but-within-watermark events may precede the stored start:
          // min-merge keeps cross-batch out-of-order input consistent with
          // the batch twin (q_sessionize sorts globally)
          cur = Some(SessionState(math.min(s.start_us, tsUs),
            math.max(s.end_us, tsUs), s.n + 1))
        case Some(s) =>
          out += SessionOut(userId, s.start_us, s.end_us, s.n)
          cur = Some(SessionState(tsUs, tsUs, 1))
        case None =>
          cur = Some(SessionState(tsUs, tsUs, 1))
      }
    }
    if (state.hasTimedOut) {
      cur.foreach(s => out += SessionOut(userId, s.start_us, s.end_us, s.n))
      state.remove()
    } else cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.end_us / 1000L + gapUs / 1000L)
    }
    out.result().iterator
  }

  /** Run sessionization over a parquet event stream, AvailableNow. */
  def run(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1): Unit = {
    import spark.implicits._
    val events: Dataset[Ev] = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(inDir)
      .withWatermark("ts", watermarkDelay)
      .select("user_id", "ts").as[Ev]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
    val q = sessions.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
