package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.CosineSimilarity

/** Session-extension entry point (SURVEY §7: register custom pieces
  * via `SparkSessionExtensions`). Enable with
  * `spark.sql.extensions=graft.engine.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Currently injects the native expression library (graft_cosine);
  * `Tables.registerAll` also registers the same functions directly so
  * sessions created without the conf still resolve them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(CosineSimilarity.name),
      CosineSimilarity.info, CosineSimilarity.builder))
  }
}
