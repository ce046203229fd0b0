package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.NfcNormalize

/** Engine optimizer rule — the `Rule[LogicalPlan]` quadrant of the
  * Catalyst extension surface (next to the native expressions, the
  * UDAF, the generator, and the as-of planner strategy + exec).
  *
  * NFC normalization is idempotent (`nfc(nfc(x)) == nfc(x)` —
  * property-tested in PropertySpec), and defensive re-normalization
  * is common when pipeline stages compose (each stage normalizes its
  * input without knowing whether the upstream already did). Collapsing
  * the nest removes a full per-row pass over the string data; Catalyst
  * cannot know a user expression is idempotent, so the library ships
  * the rule alongside the expression.
  */
object CollapseNfcNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // strip the whole nest in one rewrite — transformDown recurses
      // into the REPLACEMENT's children, so a pairwise rule would
      // leave nfc(nfc(nfc(x))) at nfc(nfc(x))
      case n @ NfcNormalize(NfcNormalize(_)) =>
        var child = n.child
        while (child.isInstanceOf[NfcNormalize])
          child = child.asInstanceOf[NfcNormalize].child
        NfcNormalize(child)
    }
}
