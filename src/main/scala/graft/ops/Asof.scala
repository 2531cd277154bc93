package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions.col
import graft.plans.AsofJoin

/** Public API for the plan-backed as-of join ([[graft.plans.AsofJoin]]).
  *
  * `asofJoin(left, right, keys, leftTime, rightTime)` returns every
  * left row with the columns of the LATEST right row whose key matches
  * and whose time is <= the left time (nulls when no such row).
  *
  * Right-side columns come back suffixed (default "_r") — the
  * re-projection also gives the right side fresh attribute ids, so
  * self-as-of joins (left and right carved from the same DataFrame,
  * the q16 shape) are unambiguous by construction.
  *
  * Requires the session to carry `GraftExtensions` (which injects
  * [[graft.plans.AsofJoinStrategy]]); without the strategy the plan
  * cannot be executed, so this fails fast with a clear message.
  */
object Asof {

  def asofJoin(left: DataFrame, right: DataFrame,
               keys: Seq[(String, String)],
               leftTimeCol: String, rightTimeCol: String,
               rightSuffix: String = "_r"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    // suffixed right names must not collide with left names, or the
    // output would carry duplicate columns and downstream select(name)
    // dies on ambiguity
    val clash = right.columns.map(_ + rightSuffix).toSet
      .intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"as-of right suffix '$rightSuffix' collides with left column(s) " +
        s"${clash.mkString(", ")} — pass a different rightSuffix")
    require(left.sparkSession.sessionState.planner.strategies
        .exists(_ eq graft.plans.AsofJoinStrategy) ||
        left.sparkSession.sessionState.experimentalMethods.extraStrategies
          .exists(_ eq graft.plans.AsofJoinStrategy) ||
        left.sparkSession.conf.get("spark.sql.extensions", "")
          .contains("graft.GraftExtensions"),
      "asofJoin needs GraftExtensions (spark.sql.extensions=graft.GraftExtensions)")
    // fresh exprIds + collision-free names for the right side
    val r2 = right.select(right.columns.map(c => col(c).as(c + rightSuffix)): _*)
    val node = AsofJoin(
      GraftSqlBridge.analyzedPlan(left),
      GraftSqlBridge.analyzedPlan(r2),
      keys.map { case (lk, _) => attr(left, lk) },
      keys.map { case (_, rk) => attr(r2, rk + rightSuffix) },
      attr(left, leftTimeCol),
      attr(r2, rightTimeCol + rightSuffix))
    GraftSqlBridge.ofRows(left.sparkSession, node)
  }

  private def attr(df: DataFrame, name: String) = GraftSqlBridge.expr(df(name))
}
