package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions
import graft.sources.GraftTableFunctions

/** Session-extension entry point — the Spark analog of the reference's
  * `LOAD exon` (exon_extension.cpp): one line wires in the whole
  * surface.
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)      // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * Scalar/table functions are injected per-session; the DSv2 sources
  * self-register through META-INF/services (format("fasta") etc. work
  * with no extension at all).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // functions are session-scoped; inject on every new session
    ext.injectCheckRule { session =>
      GraftFunctions.registerAll(session)
      GraftTableFunctions.registerAll(session)
      graft.pipeline.PipelineTableFunctions.registerAll(session)
      _ => ()
    }
    // operator-optimization rule: element predicates become exists()
    // pre-filters below explode (see PushPredicateThroughExplode)
    ext.injectOptimizerRule(_ => graft.plans.PushPredicateThroughExplode)
  }
}
