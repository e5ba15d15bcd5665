package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The repo's exact fixed-point log2, factored to ONE definition (it now
  * has three consumers — q223 surprisal, q230 arrival entropy, q233 key
  * entropy — and a drift between them would silently decalibrate scores
  * that are compared across queries): for a positive BIGINT column,
  * 1000·⌊log2 x⌋ via binary-string length (`length(bin(x)) − 1` — the
  * q218 idiom: float log2 would mis-bucket exact powers of two through
  * double rounding; a string length cannot) plus linear intra-octave
  * interpolation (the q223 idiom; max error 0.086 bits at x = 2^k·e/2,
  * constant and direction-stable, so rankings and bands match the float
  * form while every value stays integer-exact for the oracle hash). The
  * DuckDB twin is the same three-term expression with `<<` for
  * shiftleft, written verbatim in each oracle. */
private[graft] object FixedPoint {
  def log2milli(name: String): Column = expr(
    s"1000 * (length(bin($name)) - 1) + " +
      s"(($name - shiftleft(CAST(1 AS BIGINT), length(bin($name)) - 1)) * 1000)" +
      s" div shiftleft(CAST(1 AS BIGINT), length(bin($name)) - 1)")
}
