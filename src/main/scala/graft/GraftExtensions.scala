package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Canonical extension-point registration: install the engine's custom
  * planner surface through `SparkSessionExtensions`, so deployments enable
  * it with configuration only —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * or programmatically via `SparkSession.builder.withExtensions(new
  * GraftExtensions)`. Registers [[graft.plans.AsOfStrategy]] (the native
  * as-of join's planner strategy). The `AsOfJoin(...)` constructor also
  * self-installs through `spark.experimental.extraStrategies` as a
  * fallback for sessions built without the config, so both paths plan the
  * same operator.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
}
