package graft.operators

import org.apache.spark.sql.SparkSession
import java.util.{Timer, TimerTask}
import java.util.concurrent.atomic.AtomicBoolean

/** Query timeout — E6.
  *
  * The reference sets a server-side `statement_timeout` in minutes→ms
  * (`/root/reference/src/airflow_postgres_csv/operators.py:76,174`, default 60
  * at `operators.py:32,49`). Spark has no session-wide statement timeout, so
  * the equivalent is a job-group watchdog: the body's jobs run under a group
  * that a daemon timer cancels (with task interruption) when the deadline
  * passes. Scales to any cluster size — cancellation is a driver-side
  * scheduler operation.
  */
object TimeoutGuard {
  val DefaultTimeoutMinutes = 60L // operators.py:32

  def run[T](spark: SparkSession, timeoutMinutes: Long = DefaultTimeoutMinutes)
            (body: => T): T =
    runMillis(spark, timeoutMinutes * 60L * 1000L, timeoutMinutes)(body)

  /** Millisecond-granularity core (separate for testability — the public
    * surface is minutes, like the reference's `timeout` param). Like
    * `statement_timeout`, cancellation hits jobs RUNNING at the deadline;
    * work finishing before the cancel lands succeeds. */
  private[graft] def runMillis[T](spark: SparkSession, timeoutMs: Long,
                                  reportedMinutes: Long = 0)(body: => T): T = {
    val group = s"graft-timeout-${java.util.UUID.randomUUID()}"
    val sc = spark.sparkContext
    sc.setJobGroup(group, s"graft query (timeout ${timeoutMs}ms)",
      interruptOnCancel = true)
    val timedOut = new AtomicBoolean(false)
    val timer = new Timer("graft-timeout", true)
    timer.schedule(new TimerTask {
      def run(): Unit = { timedOut.set(true); sc.cancelJobGroup(group) }
    }, timeoutMs)
    try body
    catch {
      case _: Throwable if timedOut.get() =>
        throw new GraftTimeoutException(reportedMinutes)
    } finally {
      timer.cancel()
      sc.clearJobGroup()
    }
  }
}
