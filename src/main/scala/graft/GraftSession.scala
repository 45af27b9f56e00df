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

  /** Run `f` in a sibling session of `base` carrying
    * [[GraftExtensions]]; restores `base` as the active/default
    * session afterwards. DataFrames returned by `f` stay valid — they
    * carry the sibling session. */
  def withExtensions[A](base: SparkSession)(f: SparkSession => A): A = synchronized {
    // serialized: the active/default session slots are process-global,
    // so two concurrent callers would otherwise share one sibling
    // session (and its temp-view catalog) or clear each other's slots
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try f(sess)
      finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
