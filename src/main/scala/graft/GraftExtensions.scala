package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.{ColumnBridge, DotProduct, RewriteHofDotProduct}

/** The engine's SparkSession integration point: registers the graft
  * function battery into the SQL FunctionRegistry (so `spark.sql` users
  * get the same X1-X3 / L4 semantics as the Column API) and injects the
  * [[org.apache.spark.sql.graft.RewriteHofDotProduct]] optimizer rule,
  * which rewrites the natural-but-interpreted higher-order dot-product
  * formulation into the codegen'd [[DotProduct]] expression.
  *
  * Two installation paths, same registrations:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *    (the standard injection hook, applied at session build);
  *  - existing session: `GraftExtensions.install(spark)` (function
  *    registry + experimental extraOptimizations), for notebooks/tests
  *    where the session already exists.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.sqlFunctions.foreach { case (name, arity, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.GraftExtensions", name),
          (args: Seq[Expression]) => GraftExtensions.build(name, arity, builder, args)))
    }
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftExtensions {

  import graft.functions.{ClaimFunctions, TextFunctions}

  /** Column-function -> Expression-builder bridge: wrap the incoming
    * expressions as Columns, apply the (built-in-composed) Column
    * function, unwrap the composed tree. The registered SQL function is
    * therefore exactly the Column API's semantics, never a re-statement.
    */
  private def build(
      name: String, arity: Int, f: Seq[Column] => Column, args: Seq[Expression]): Expression = {
    require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
    ColumnBridge.toExpression(f(args.map(ColumnBridge.toColumn)))
  }

  /** (sql name, arity, Column builder). */
  private val sqlFunctions: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    ("format_diagnosis_code", 1, cs => ClaimFunctions.formatDiagnosisCode(cs.head)),
    ("format_postal_code", 1, cs => ClaimFunctions.formatPostalCode(cs.head)),
    ("get_name", 4, cs => ClaimFunctions.getName(cs(0), cs(1), cs(2), cs(3))),
    ("x12_date", 1, cs => ClaimFunctions.x12Date(cs.head)),
    ("token_count", 1, cs => TextFunctions.tokenCount(cs.head)),
    ("bpe_token_count", 1, cs => TextFunctions.bpeTokenCount(cs.head)),
    ("stopword_ratio", 1, cs => TextFunctions.stopwordRatio(cs.head)),
    ("quality_score", 1, cs => TextFunctions.qualityScore(cs.head)),
    ("language_id", 1, cs => TextFunctions.languageId(cs.head)),
    ("doc_fingerprint", 1, cs => TextFunctions.fingerprint(cs.head)),
    ("nfc_normalize", 1, cs => TextFunctions.nfc(cs.head)),
    ("script_counts", 1, cs => TextFunctions.scriptCounts(cs.head)),
    ("dominant_script", 1, cs => TextFunctions.dominantScript(cs.head)),
    ("classifier_weight", 1, cs => graft.operators.QualityClassifier.tokenWeight(cs.head)),
    ("dedup_lines", 1, cs => graft.operators.LineDedup.stripWithinDoc(cs.head)),
    ("char_entropy_stats", 1, cs => TextFunctions.charEntropyStats(cs.head)),
    ("canonicalize_url", 1, cs => graft.functions.UrlFunctions.canonicalizeUrl(cs.head)),
    ("canonical_host", 1, cs => graft.functions.UrlFunctions.canonicalHost(cs.head)),
    ("graft_dot", 2, cs => DotProduct.column(cs(0), cs(1))))

  /** Register into an already-built session (same set as the injected
    * path). Idempotent: re-registration overwrites in place.
    */
  def install(spark: SparkSession): Unit = {
    sqlFunctions.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name),
        (args: Seq[Expression]) => build(name, arity, builder, args))
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
  }
}
