package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/**
 * Session extension wiring (the analog of the reference extension's Load,
 * src/ann_extension.cpp:23-63): use either
 *
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 *   // or spark.sql.extensions=graft.plans.GraftExtensions
 *
 * or, on an already-running session, `Graft.init(spark)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session => AnnTopKRule(session))
    e.injectPlannerStrategy(_ => AnnHitsStrategy)
    TableFunctions.descriptors.foreach(e.injectTableFunction)
  }
}

object Graft {
  /** Enable the engine on a live session: register the SQL function surface
   *  (scalar functions + SQL-callable table functions) and the transparent
   *  ANN top-k rewrite. Idempotent. */
  def init(spark: SparkSession): Unit = {
    graft.functions.registerAll(spark)
    TableFunctions.register(spark)
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[AnnTopKRule]))
      spark.experimental.extraOptimizations = existing :+ AnnTopKRule(spark)
    if (!spark.experimental.extraStrategies.contains(AnnHitsStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AnnHitsStrategy
  }
}
