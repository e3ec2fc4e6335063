package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE portable string hash every cross-engine operator folds:
  * `h := (h·31 + codepoint) mod 2³²` over the string's Unicode CODE
  * POINTS. This is `String.hashCode`'s recurrence but over code points,
  * not UTF-16 code units — the two agree on BMP text and diverge on
  * supplementary-plane characters (emoji, rare CJK), where a code-unit
  * fold would see the surrogate halves. Code points are what every
  * other engine exposes (DuckDB `unicode(c)`, Python `ord`), so folding
  * them is what makes the "any engine reproduces the hash bit-for-bit"
  * contract hold on real web text, not just ASCII corpora.
  *
  * Three spellings, kept adjacent so they can never drift:
  *  - [[cp31]]: the JVM loop (UDF-side consumers: bloom probes,
  *    minhash/simhash token hashes),
  *  - [[cp31Col]]: pure Catalyst expressions (UDF-free consumers:
  *    content-defined chunking) — decodes code points straight from the
  *    UTF-8 bytes via one `aggregate` fold,
  *  - the DuckDB spelling lives in each oracle:
  *    `list_reduce(list_prepend(0, list_transform(
  *       regexp_extract_all(s, '(?s).'), c -> unicode(c))),
  *       (h, c) -> (h*31 + c) % 4294967296)`.
  */
object PortableHash {

  /** Signed 32-bit wrapping ×31 fold over code points (cast to Long for
    * the unsigned view or sign-extended 64-bit view as needed). */
  def cp31(s: String): Int = {
    var h = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = h * 31 + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** [[cp31]] as an unsigned low-32 Long in [0, 2³²). */
  def cp31u(s: String): Long = cp31(s).toLong & 0xffffffffL

  /** Expression form of [[cp31u]] — no UDF, stays inside codegen. The
    * string splits per code point (Java regex split never separates a
    * surrogate pair), and each element's code point is `ascii(c)` —
    * which returns `charAt(0)`, the true code point for every BMP
    * character — EXCEPT when that value is a high surrogate (the
    * element is supplementary-plane): only then is the code point
    * decoded from the element's 4 UTF-8 bytes. The common path costs
    * exactly the old code-unit fold; the rare branch fixes it off-BMP.
    * Empty string hashes to 0, matching the JVM and DuckDB forms. */
  def cp31uCol(s: Column): Column = {
    // 4-byte UTF-8 sequence F0xxxxxx 10xxxxxx 10xxxxxx 10xxxxxx, via hex
    def decode4(c: Column): Column = {
      val hx = hex(encode(c, "UTF-8"))
      def b(i: Int) = conv(substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
      (b(0) - 240) * 262144 + (b(1) - 128) * 4096 + (b(2) - 128) * 64 + (b(3) - 128)
    }
    def cp(c: Column): Column = {
      val cu = ascii(c).cast("long")
      when(cu >= 0xD800L && cu <= 0xDBFFL, decode4(c)).otherwise(cu)
    }
    aggregate(split(s, ""), lit(0L),
      (h, c) => pmod(h * 31 + cp(c), lit(4294967296L)))
  }
}
