package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or the builder
  * equivalent) to get graft's native functions in SQL on every session of
  * the application — the deployment mode a shared 1000-executor cluster
  * uses, where per-notebook `register()` calls don't scale. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    (graft.functions.GraftFunctions.all ++ graft.functions.PolarsSqlShims.all)
      .foreach(ext.injectFunction)
}
