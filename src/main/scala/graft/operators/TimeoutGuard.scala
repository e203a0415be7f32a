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
            (body: => T): T = {
    val group = s"graft-timeout-${java.util.UUID.randomUUID()}"
    val sc = spark.sparkContext
    sc.setJobGroup(group, s"graft query (timeout ${timeoutMinutes}m)",
      interruptOnCancel = true)
    val timedOut = new AtomicBoolean(false)
    val timer = new Timer("graft-timeout", true)
    timer.schedule(new TimerTask {
      def run(): Unit = { timedOut.set(true); sc.cancelJobGroup(group) }
    }, timeoutMinutes * 60L * 1000L)
    try body
    catch {
      case e: Throwable if timedOut.get() => throw new GraftTimeoutException(timeoutMinutes)
    } finally {
      timer.cancel()
      sc.clearJobGroup()
    }
  }
}
