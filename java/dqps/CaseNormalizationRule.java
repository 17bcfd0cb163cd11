package dqps;

import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Lower;
import org.apache.spark.sql.catalyst.expressions.Upper;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractPartialFunction;

/**
 * Custom Catalyst optimizer rule: case-normalization idempotence.
 *
 *   upper(upper(x)) -> upper(x)
 *   lower(lower(x)) -> lower(x)
 *   lower(upper(x)) -> lower(x)
 *   upper(lower(x)) -> upper(x)
 *
 * Catalyst's built-in optimizer does not simplify these (they arise
 * naturally when a normalization pipeline composes with an
 * already-normalized upstream, e.g. tokenize(lower(text)) over a
 * cleaning stage that lowercased). The rewrite removes one full
 * string copy per row per redundant call - measurable on a 100 TB
 * text scan.
 *
 * The rule exists to prove the SparkSessionExtensions hook end-to-end
 * (SURVEY.md section 4.3: "zero custom rules REQUIRED for parity" -
 * this is the optional demonstration that the extension point works
 * from a pip-installed PySpark with a javac-compiled rule; the
 * reference has no extension points at all, its operator set is the
 * hard-coded OpType enum, reference: src/qp/operators/OpType.java:9-14).
 */
public class CaseNormalizationRule extends Rule<LogicalPlan> {

    private static final class Rewrite extends AbstractPartialFunction<Expression, Expression> {
        @Override
        public boolean isDefinedAt(Expression e) {
            if (e instanceof Upper) {
                Expression c = ((Upper) e).child();
                return c instanceof Upper || c instanceof Lower;
            }
            if (e instanceof Lower) {
                Expression c = ((Lower) e).child();
                return c instanceof Upper || c instanceof Lower;
            }
            return false;
        }

        @Override
        public Expression apply(Expression e) {
            // Strip ALL nested case calls, keep the outermost one.
            Expression inner = ((org.apache.spark.sql.catalyst.expressions.UnaryExpression) e).child();
            while (inner instanceof Upper || inner instanceof Lower) {
                inner = ((org.apache.spark.sql.catalyst.expressions.UnaryExpression) inner).child();
            }
            return e instanceof Upper ? new Upper(inner) : new Lower(inner);
        }
    }

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        return plan.transformAllExpressions(new Rewrite());
    }
}
