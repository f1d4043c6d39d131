package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans [[TopKPerKey]] as the partial→final [[TopKPerKeyExec]] pair;
  * EnsureRequirements inserts the hash exchange between them (final
  * declares ClusteredDistribution). */
object TopKStrategy extends SparkStrategy {
  /** partial-phase memory-valve override (keys before a flush); mainly a
    * test hook — the default is sized for production */
  val MaxPartialKeysConf = "spark.graft.topk.maxPartialKeys"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(part, order, k, child) =>
      val maxKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxPartialKeysConf, TopKPerKeyExec.DefaultMaxPartialKeys.toString)
        .toInt
      val partialExec =
        TopKPerKeyExec(part, order, k, partial = true, planLater(child), maxKeys)
      TopKPerKeyExec(part, order, k, partial = false, partialExec, maxKeys) :: Nil
    case _ => Nil
  }
}

/** Engine extension entry point — installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (Sessions/TestSpark
  * set it; any externally-built session can too). Registers the rank-limit
  * rewrite ([[RewriteRankLimit]]) and the strategy that plans its node.
  * Everything else in the engine rides built-in Catalyst — this is the one
  * whole-operator gap (heap vs sort top-k) worth a custom physical plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteRankLimit)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
