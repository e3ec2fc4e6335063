package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scrub — one expression computing what the composable
  * spelling ([[graft.functions.TextAnalysis.redactPii]]) spreads over
  * six independent regexp expressions:
  *
  *   redacted = replace(replace(replace(text, email), ip), phone)
  *   n_kind   = len(extract_all(text, kind))   (counts on the ORIGINAL)
  *
  * Why fuse: each Spark `RegExpExtractAll`/`RegExpReplace` calls
  * `subject.toString` — six full UTF-8 decodes + char[] copies of every
  * document per row — and the three extract_alls materialize an array
  * of match UTF8Strings that exists only to be `size()`d. This
  * expression decodes ONCE and runs the minimum number of matcher
  * scans: the email count+replace share one scan (both run on the
  * original text), and when an earlier stage made no replacement the
  * next kind's count and replace also collapse to one scan (count is
  * contractually on the original text, replace on the partially
  * redacted text — equal strings when nothing was replaced). Worst
  * case 5 scans, no-PII documents 3, vs always 6 before.
  *
  * Bit parity with the composable form (pinned in PiiRedactSpec): same
  * java.util.regex patterns, same non-overlapping successive-find
  * semantics for counts, same sequential replacement order
  * email → ip → phone (counts CAN disagree with placed tokens — an IP
  * invisible in the original can surface at a placeholder boundary,
  * e.g. `a@b.cd4.5.6.7` → `<EMAIL>4.5.6.7` where `>`–`4` forms the \b
  * the original `d`–`4` lacked; both forms replace it and neither
  * counts it, and the fusion preserves exactly that). Replacement
  * literals carry no `$`/`\` so appendReplacement is literal, matching
  * Spark's RegExpReplace. Null in → null struct out, as
  * size(extract_all(null)) and regexp_replace(null) are null.
  */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pii_redact expects string, got $t")
  }

  override def dataType: DataType = PiiRedact.outType

  override def prettyName: String = "graft_pii_redact"

  override def nullable: Boolean = true

  override protected def nullSafeEval(textAny: Any): Any =
    PiiRedact.run(textAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PiiRedact.run($c);")

  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)
}

object PiiRedact {

  /** The scrub patterns — the single source of truth; TextAnalysis
    * re-exports these so the DuckDB oracles interpolate identical
    * strings. Deliberately RE2-compatible (no backrefs/lookaround). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"

  private val emailP = Pattern.compile(emailPattern)
  private val ipP = Pattern.compile(ipv4Pattern)
  private val phoneP = Pattern.compile(phonePattern)

  val outType: StructType = StructType(Seq(
    StructField("redacted_text", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false)))

  /** Count + replace in one scan. Returns the input string itself
    * (no allocation) when nothing matched. */
  private def replaceCounting(p: Pattern, s: String, rep: String): (String, Long) = {
    val m = p.matcher(s)
    if (!m.find()) return (s, 0L)
    val sb = new java.lang.StringBuffer(s.length + 8)
    var n = 0L
    do { n += 1; m.appendReplacement(sb, rep) } while (m.find())
    m.appendTail(sb)
    (sb.toString, n)
  }

  private def countOnly(p: Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def replaceOnly(p: Pattern, s: String, rep: String): String = {
    val m = p.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuffer(s.length + 8)
    do { m.appendReplacement(sb, rep) } while (m.find())
    m.appendTail(sb)
    sb.toString
  }

  /** One UTF-8 decode, 3–5 matcher scans; see class doc for the
    * fusion-legality argument per stage. */
  def run(text: UTF8String): InternalRow = {
    val s = text.toString
    // email: count is on the original and so is the replace — one scan.
    val (red1, nEmail) = replaceCounting(emailP, s, "<EMAIL>")
    // ip: count on the original; replace on red1. Equal strings when no
    // email was replaced (red1 eq s), so the two scans collapse to one.
    val (red2, nIp) =
      if (red1 eq s) replaceCounting(ipP, s, "<IP>")
      else (replaceOnly(ipP, red1, "<IP>"), countOnly(ipP, s))
    val (red3, nPhone) =
      if (red2 eq s) replaceCounting(phoneP, s, "<PHONE>")
      else (replaceOnly(phoneP, red2, "<PHONE>"), countOnly(phoneP, s))
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(red3), nEmail, nIp, nPhone))
  }

  private val fnId = FunctionIdentifier("graft_pii_redact")
  private val info = new ExpressionInfo(classOf[PiiRedact].getName, "graft_pii_redact")
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"graft_pii_redact requires exactly 1 argument, got ${children.size}")
    PiiRedact(children.head)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fnId)) reg.registerFunction(fnId, info, builder)
  }

  /** Column-API entry: struct(redacted_text, n_emails, n_ips, n_phones). */
  def redactCol(text: Column): Column =
    call_function("graft_pii_redact", text)
}
