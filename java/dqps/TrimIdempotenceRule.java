package dqps;

import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.StringTrim;
import org.apache.spark.sql.catalyst.expressions.StringTrimLeft;
import org.apache.spark.sql.catalyst.expressions.StringTrimRight;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractPartialFunction;

/**
 * Custom Catalyst optimizer rule: whitespace-trim idempotence.
 *
 *   trim(trim(x))        -> trim(x)
 *   trim(ltrim(x))       -> trim(x)     (full trim subsumes one side)
 *   trim(rtrim(x))       -> trim(x)
 *   ltrim(ltrim(x))      -> ltrim(x)
 *   ltrim(trim(x))       -> trim(x)     (outer call is a no-op)
 *   rtrim(rtrim(x))      -> rtrim(x)
 *   rtrim(trim(x))       -> trim(x)
 *
 * DEFAULT-WHITESPACE trims only (no explicit trimStr): with a custom
 * trim set, one-sided and two-sided compositions are not equivalent.
 * Mixed one-sided chains (ltrim(rtrim(x))) are left alone - that
 * composition equals a full btrim, not either side.
 *
 * Catalyst's built-in optimizer simplifies composed CASE conversions
 * (SimplifyCaseConversionExpressions: upper(lower(x)) -> upper(x))
 * but has no analog for trims, although redundant defensive trims
 * arise the same way - every stage of a composed text-cleaning
 * pipeline trims its input, so stage N re-trims stage N-1's already
 * trimmed output. MEASURED HONESTLY (artifacts/CATALYST_RULE_BENCH
 * .json, bench_catalyst_rule.py): the rewrite is plan-visible but
 * runtime-NEUTRAL at bench scales (1.06x min-of-7, medians equal,
 * on a trim(trim(text)) aggregate over 500k docs) - Spark's
 * UTF8String.trim returns an offset view after scanning only the
 * EDGE whitespace, not a full copy of the body, so the saved work
 * per redundant call is O(edge ws), nanoseconds per row. The value
 * of the rule is the demonstration, not a throughput win.
 *
 * The rule exists to prove the SparkSessionExtensions hook end-to-end
 * (SURVEY.md section 4.3: "zero custom rules REQUIRED for parity" -
 * this is the optional demonstration that the extension point works
 * from a pip-installed PySpark with a javac-compiled rule; the
 * reference has no extension points at all, its operator set is the
 * hard-coded OpType enum, reference: src/qp/operators/OpType.java:9-14).
 */
public class TrimIdempotenceRule extends Rule<LogicalPlan> {

    private static boolean isWsTrim(Expression e) {
        if (e instanceof StringTrim) return ((StringTrim) e).trimStr().isEmpty();
        if (e instanceof StringTrimLeft) return ((StringTrimLeft) e).trimStr().isEmpty();
        if (e instanceof StringTrimRight) return ((StringTrimRight) e).trimStr().isEmpty();
        return false;
    }

    private static Expression src(Expression e) {
        if (e instanceof StringTrim) return ((StringTrim) e).srcStr();
        if (e instanceof StringTrimLeft) return ((StringTrimLeft) e).srcStr();
        return ((StringTrimRight) e).srcStr();
    }

    private static final class Rewrite extends AbstractPartialFunction<Expression, Expression> {
        @Override
        public boolean isDefinedAt(Expression e) {
            if (!isWsTrim(e)) return false;
            Expression inner = src(e);
            if (!isWsTrim(inner)) return false;
            if (e instanceof StringTrim) return true;                 // full trim subsumes any inner ws trim
            if (inner instanceof StringTrim) return true;             // one-sided over full trim is a no-op
            return e.getClass() == inner.getClass();                  // same-direction idempotence
        }

        @Override
        public Expression apply(Expression e) {
            if (e instanceof StringTrim) {
                // peel EVERY directly-nested whitespace trim, keep one full trim
                Expression inner = src(e);
                while (isWsTrim(inner)) inner = src(inner);
                return new StringTrim(inner, scala.Option.empty());
            }
            Expression inner = src(e);
            if (inner instanceof StringTrim) return inner;            // ltrim(trim(x)) -> trim(x)
            // same-direction chain: peel matching inner calls
            while (isWsTrim(inner) && inner.getClass() == e.getClass()) inner = src(inner);
            if (inner instanceof StringTrim && isWsTrim(inner)) return inner; // ltrim(ltrim(trim(x)))
            return e instanceof StringTrimLeft
                ? new StringTrimLeft(inner, scala.Option.empty())
                : new StringTrimRight(inner, scala.Option.empty());
        }
    }

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        return plan.transformAllExpressions(new Rewrite());
    }
}
