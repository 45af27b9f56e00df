package graft

import org.apache.spark.sql.SparkSession

/** Helper for code running inside a session built WITHOUT
  * [[GraftExtensions]] (e.g. the driver's shared Verify/Bench session)
  * that needs the extensions' analyzer surface — SQL DML over gvt
  * relations, injected native functions, the planner strategies.
  *
  * `spark.sql.extensions` is a static conf: it applies only when the
  * SparkContext's first session is built. Over an already-running
  * context the injection goes through `Builder.withExtensions` — the
  * same `SparkSessionExtensions => Unit` instance the config names, so
  * the two mechanisms cannot drift. The builder returns the ACTIVE
  * session when one is registered, so the active/default slots are
  * cleared first and restored after — the base session is untouched
  * (sibling sessions share the SparkContext and its cached data, but
  * carry their own analyzer, conf, and temp-view catalog).
  *
  * On a cluster deployment none of this is needed:
  * `--conf spark.sql.extensions=graft.GraftExtensions` at submit time
  * makes every session carry the extensions from the start. */
object GraftSession {

  // ONE sibling per base session, cached: building a session is not
  // free (fresh analyzer/optimizer state, extension injection, conf
  // copy), and Verify/Bench call withExtensions per registry query —
  // a fresh sibling each time was pure per-query overhead. Keyed by
  // base identity; invalidated when the shared SparkContext stops.
  @volatile private var cached: Option[(SparkSession, SparkSession)] = None

  private def sibling(base: SparkSession): SparkSession = synchronized {
    cached match {
      case Some((b, s)) if (b eq base) && !s.sparkContext.isStopped => s
      case _ =>
        // the builder returns the ACTIVE session when one is
        // registered, so the active/default slots are cleared first
        // and restored after — the base session is untouched
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        try {
          val s = SparkSession.builder()
            .withExtensions(new GraftExtensions())
            .getOrCreate()
          cached = Some((base, s))
          s
        } finally {
          SparkSession.setDefaultSession(base)
          SparkSession.setActiveSession(base)
        }
    }
  }

  /** Run `f` in the cached sibling session of `base` carrying
    * [[GraftExtensions]]; the calling THREAD's active-session slot is
    * pointed at the sibling for the duration (thread-local, so
    * concurrent callers on other threads are unaffected) and restored
    * after. DataFrames returned by `f` stay valid — they carry the
    * sibling session. The sibling's temp-view catalog persists across
    * calls: callers use per-scenario view names. */
  def withExtensions[A](base: SparkSession)(f: SparkSession => A): A = {
    val sess = sibling(base)
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(sess)
    try f(sess)
    finally prev match {
      case Some(p) => SparkSession.setActiveSession(p)
      case None => SparkSession.clearActiveSession()
    }
  }
}
