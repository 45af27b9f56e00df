package graft.util

import java.time.format.DateTimeFormatter
import java.time.{LocalTime, ZoneOffset}

/** Structured pipeline logger — the reference's utils/logger.py:12-23
  * (`%(asctime)s | %(name)s | %(levelname)s | %(message)s` with `HH:MM:SS`
  * timestamps on stdout), re-expressed without a logging framework so it
  * behaves identically on a driver and inside executors.
  *
  * Deliberately NOT log4j: Spark's own log config varies per cluster, and
  * the reference's pipeline messages are a stable stdout contract (grep-able
  * `LAYER_COMPLETE | ...` lines) that must not be swallowed by an
  * operator-tuned log4j2.properties.
  */
final class Log private (name: String) {
  private val fmt = DateTimeFormatter.ofPattern("HH:mm:ss")

  private def emit(level: String, msg: String): Unit =
    println(s"${LocalTime.now(ZoneOffset.UTC).format(fmt)} | medallion.$name | $level | $msg")

  def info(msg: String): Unit = emit("INFO", msg)
  def warn(msg: String): Unit = emit("WARNING", msg)
  def error(msg: String): Unit = emit("ERROR", msg)
}

object Log {
  def apply(name: String): Log = new Log(name)
}
