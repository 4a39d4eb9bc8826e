package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric accumulator for the bench: sums shuffle read/write,
  * spill, input bytes, GC time, and task count between `reset()`
  * calls, so each query's BENCH_DETAIL entry carries the physical
  * work its plan actually did (drift triage: a timing regression
  * with unchanged shuffle bytes is environment, one with grown
  * shuffle bytes is a plan change).
  *
  * LongAdders because task-end events arrive from the listener-bus
  * thread while the driver thread calls reset/snapshot; callers must
  * drain the bus (ListenerBridge.drain) before snapshotting.
  */
class BenchMetricsListener extends SparkListener {
  private val shuffleRead = new LongAdder
  private val shuffleWrite = new LongAdder
  private val memSpill = new LongAdder
  private val diskSpill = new LongAdder
  private val input = new LongAdder
  private val gcMs = new LongAdder
  private val tasks = new LongAdder

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
      memSpill.add(m.memoryBytesSpilled)
      diskSpill.add(m.diskBytesSpilled)
      input.add(m.inputMetrics.bytesRead)
      gcMs.add(m.jvmGCTime)
      tasks.increment()
    }
  }

  def reset(): Unit = Seq(shuffleRead, shuffleWrite, memSpill,
    diskSpill, input, gcMs, tasks).foreach(_.reset())

  /** Totals since the last reset, as JSON object fields (bytes / ms /
    * count over ALL attempts of the query — divide by `runs` for
    * per-attempt figures; shuffle volume is deterministic per plan so
    * the total triages identically).
    *
    * Reading `input_bytes`: Spark's InputMetrics counts BLOCK-MANAGER
    * reads (cached/checkpointed frames) as input alongside file-source
    * bytes — a query whose input dwarfs its parquet files is
    * re-reading a materialized frame (usually by design, e.g. the N²
    * baseline's pair cache), not necessarily re-scanning the source.
    */
  def snapshotJson: String =
    s"""{"shuffle_read":${shuffleRead.sum},"shuffle_write":${shuffleWrite.sum},""" +
      s""""mem_spill":${memSpill.sum},"disk_spill":${diskSpill.sum},""" +
      s""""input_bytes":${input.sum},"gc_ms":${gcMs.sum},"tasks":${tasks.sum}}"""
}
