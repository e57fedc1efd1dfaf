package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / governance transforms.
  *
  * Re-expresses the reference's governance layer (reference
  * M/utility/Utility.scala:42-133, 178-223; patterns at
  * M/commons/OrchestrationConstant.scala:58-74) with Spark-4 builtins wherever
  * a builtin exists (sha2 / concat_ws / regexp_replace are all codegen'd), and
  * a single Scala UDF only for the free-text scrub, whose
  * replace-each-match-with-its-own-hash loop is not expressible as one
  * `regexp_replace`.
  */
object Pii {

  /** Null-safe column list: null -> "n/a" sentinel, as the reference does
    * before hashing/encrypting (ref M/utility/Utility.scala:43,106). */
  private def nullSafe(c: Column): Column = coalesce(c.cast("string"), lit("n/a"))

  /** `hashIt` (ref M/utility/Utility.scala:42-45): ONE sha2 column over the
    * '|'-joined row — used as `hashed_jk`, the cheap full-row change-detection
    * key compared during SCD merges. */
  def hashRow(df: DataFrame, cols: Seq[String], outCol: String = "hashed_jk",
              numBits: Int = 256): DataFrame =
    df.withColumn(outCol, sha2(concat_ws("|", cols.map(c => nullSafe(col(c))): _*), numBits))

  /** `hashItComplete` (ref M/utility/Utility.scala:47-52): per-column sha2 into
    * `<col>_hash` — complete anonymization of the listed columns. */
  def hashColumns(df: DataFrame, cols: Seq[String], numBits: Int = 256): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(s"${c}_hash", sha2(nullSafe(col(c)), numBits)))

  /** `maskIt` (ref M/utility/Utility.scala:76-89): regex mask, in place or into
    * `<col>_masked`. */
  def mask(df: DataFrame, column: String, pattern: String, replacement: String,
           inPlace: Boolean = true): DataFrame = {
    val out = if (inPlace) column else s"${column}_masked"
    df.withColumn(out, regexp_replace(col(column), pattern, replacement))
  }

  // ---------------------------------------------------------------------
  // Free-text PII scrub ("partial anonymization")
  // ---------------------------------------------------------------------

  /** Same PII families the reference scans for (ref
    * M/commons/OrchestrationConstant.scala:58-74): credit cards, SSNs, emails.
    * Patterns re-derived from the public formats, not copied. */
  val CreditCardPattern: String =
    "\\b(?:\\d[ -]*?){13,16}\\b"
  val SsnPattern: String =
    "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val EmailPattern: String =
    "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b"

  val DefaultPiiPatterns: Seq[String] = Seq(SsnPattern, CreditCardPattern, EmailPattern)

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Replace every PII match with the SHA-256 of the matched text (ref
    * M/utility/Utility.scala:178-200). Kept as a plain function so both the
    * UDF and tests can call it. */
  def scrubText(patterns: Seq[String])(text: String): String = {
    if (text == null) return null
    patterns.foldLeft(text) { (acc, p) =>
      val m = Pattern.compile(p).matcher(acc)
      val sb = new StringBuffer
      while (m.find()) m.appendReplacement(sb, sha256Hex(m.group()))
      m.appendTail(sb)
      sb.toString
    }
  }

  /** `hashItPartial` (ref M/utility/Utility.scala:54-59): scrub free text in
    * the listed columns into `<col>_hash`. UDF is unavoidable here (per-match
    * computed replacement); it is the one non-codegen op in the PII layer. */
  def scrubColumns(df: DataFrame, cols: Seq[String],
                   patterns: Seq[String] = DefaultPiiPatterns): DataFrame = {
    val scrub = udf(scrubText(patterns) _)
    cols.foldLeft(df)((d, c) => d.withColumn(s"${c}_hash", scrub(col(c))))
  }

  /** `identifyColumns` (ref M/utility/Utility.scala:209-223): resolve
    * configured PII column names against an actual schema — exact match when
    * `commonFlag`, substring match otherwise. Driver-side, tiny. */
  def identifyColumns(schema: Seq[String], configured: Seq[(String, Boolean)]): Seq[String] =
    configured.flatMap { case (name, commonFlag) =>
      if (commonFlag) schema.filter(_.equalsIgnoreCase(name))
      else schema.filter(_.toLowerCase.contains(name.toLowerCase))
    }.distinct

  /** `castEpochToTimestamp` (ref M/utility/Utility.scala:350-359) — the
    * reference formats epoch millis through a buggy pattern
    * (`+SSSS` re-prints millis); we use the correct builtin. */
  def epochMillisToTimestamp(df: DataFrame, column: String): DataFrame =
    if (df.columns.contains(column))
      df.withColumn(column, timestamp_millis(col(column).cast("long")))
    else df
}
