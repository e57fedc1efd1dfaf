package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the cleanup every dedup/quality pipeline
  * runs BEFORE hashing, so that byte-level noise (decomposed accents,
  * stray control characters, run-on whitespace) doesn't defeat exact and
  * near dedup: Unicode NFC composition, C0/DEL control characters to
  * spaces, whitespace runs collapsed to one space, ends trimmed — in that
  * order, so a control character between words leaves exactly one
  * separator.
  *
  * Engine-portable by construction: NFC is the Unicode-standard
  * normalization (DuckDB `nfc_normalize`), and both regex steps stay inside
  * the ASCII set where Java and RE2 `\s` agree (the control strip removes
  * 0x0B/0x0C before the collapse ever sees them; non-ASCII Unicode spaces
  * like NBSP are deliberately PRESERVED — they are content in some
  * languages, and silently eating them would change token counts).
  * Rides the [[TextHashExpression]] codegen scaffold: one compiled method
  * per row inside whole-stage codegen, no UDF boxing. */
case class NormalizeText(child: Expression) extends TextHashExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override def compute(s: UTF8String): Any = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val stripped = nfc.replaceAll("[\\x00-\\x1f\\x7f]", " ")
    UTF8String.fromString(stripped.replaceAll("\\s+", " ").trim)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
