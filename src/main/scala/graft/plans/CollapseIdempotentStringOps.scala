package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.Kernels.NfcNormalize

/** Optimizer rule: collapse redundant Unicode normalizations.
  *
  * The layered-pipeline pattern this targets: ingest normalizes
  * defensively (NFC — the q94 fingerprint convention), and a
  * downstream query normalizes AGAIN because it cannot know what the
  * producer did. Semantically free, but at 100 TB of text each
  * redundant pass re-walks every string in the hot path — CPU the
  * optimizer can simply delete:
  *
  *   `normalize_F(normalize_G(x))` → `normalize_F(x)` when G is a
  *   CANONICAL form (NFC/NFD) or G = F: every Unicode normal form is
  *   idempotent, and the normative forms are constant on canonical-
  *   equivalence classes, which canonical normalization preserves. A
  *   compatibility inner under a DIFFERENT outer (e.g. `nfc(nfkc(x))`)
  *   stays — NFKC loses information NFC alone would keep, so the
  *   composition is not NFC.
  *
  * This is the normalization analogue of Catalyst's own
  * `SimplifyCaseConversionExpressions` (which already collapses
  * `lower`/`upper` towers for the built-ins — custom expressions get
  * no such service, hence this rule). Registered via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`), it
  * runs inside the optimizer's fixed point — nested towers collapse
  * fully — for DataFrame and SQL users alike, before whole-stage
  * codegen, so the saved pass never reaches an executor.
  */
object CollapseIdempotentStringOps extends Rule[LogicalPlan] {

  private val canonical = Set(java.text.Normalizer.Form.NFC,
    java.text.Normalizer.Form.NFD)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_, fi), fo)
          if fi == fo || canonical(fi) =>
        NfcNormalize(inner.child, fo)
    }
}
