package graft.ops

import org.apache.spark.sql.DataFrame

/** Native-kernel gating shared by the ops: a kernel is used when the
  * session registered it (GraftExtensions) and `graft.native.disabled`
  * is not set — the conf is the escape hatch that lets tests (and
  * users) exercise the pure-expression fallbacks in a session that has
  * the extension loaded.
  */
private[ops] object Native {
  def enabled(df: DataFrame, fn: String): Boolean =
    df.sparkSession.catalog.functionExists(fn) &&
      !df.sparkSession.conf.get("graft.native.disabled", "false").toBoolean
}
