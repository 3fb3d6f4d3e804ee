package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Replace the FIRST regex match only — the reference's rewrite engine
  * is `gsub(pattern, replacement, 1)` (L_DataCache.lua:125), and
  * Spark's `regexp_replace` has no count argument (it replaces every
  * occurrence, so an unanchored rule like `_ → .` would rewrite all
  * underscores instead of one). Replacement uses Java semantics
  * ($1 backrefs), consistent with `regexp_replace`. CodegenFallback:
  * rewrite runs once per ingested line, not in an analytic hot path.
  */
case class ReplaceFirst(child: Expression, pattern: String, replacement: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  @transient private lazy val p = java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      p.matcher(input.asInstanceOf[UTF8String].toString).replaceFirst(replacement))

  override protected def withNewChildInternal(newChild: Expression): ReplaceFirst =
    copy(child = newChild)
}

object ReplaceFirst {
  def replaceFirst(c: Column, pattern: String, replacement: String): Column =
    ColumnBridge.toColumn(ReplaceFirst(ColumnBridge.toExpression(c), pattern, replacement))
}
