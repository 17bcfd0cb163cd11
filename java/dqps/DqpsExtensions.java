package dqps;

import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.SparkSession;
import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * SparkSessionExtensions entry point - registered via
 * spark.sql.extensions=dqps.DqpsExtensions (plus the compiled classes
 * on spark.driver.extraClassPath). Injects the optimizer rules this
 * engine adds on top of Catalyst.
 */
public class DqpsExtensions extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {
    @Override
    public BoxedUnit apply(SparkSessionExtensions ext) {
        ext.injectOptimizerRule(new AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
            @Override
            public Rule<LogicalPlan> apply(SparkSession session) {
                return new TrimIdempotenceRule();
            }
        });
        return BoxedUnit.UNIT;
    }
}
