package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Record-linkage scoring: Jaro-Winkler string similarity as a native
  * Catalyst expression. The scorer runs once per CANDIDATE pair (after
  * blocking), so it sits in the innermost join loop — `doGenCode` emits a
  * static call, keeping the pair scoring inside whole-stage codegen with no
  * boxing and no closure serialization.
  *
  * Semantics mirror the rapidfuzz family that DuckDB vendors for its
  * `jaro_winkler_similarity` (the oracle engine), pinned by fixture in
  * RecordLinkageSpec:
  *   - match window = max(len1, len2) / 2 - 1, clamped to >= 0;
  *   - transpositions t = (#mismatched matched positions) / 2, INTEGER
  *     division (odd raw counts round down);
  *   - jaro = (m/len1 + m/len2 + (m - t)/m) / 3, evaluated in exactly that
  *     association order so doubles match the oracle bit-for-bit;
  *   - Winkler boost only when jaro > 0.7: jaro + prefix * 0.1 * (1 - jaro)
  *     with common prefix capped at 4;
  *   - either side empty => 0.0 (including both empty — DuckDB's choice).
  */
object JaroWinkler {

  /** Pure scorer over code points (ASCII inputs degenerate to chars).
    * Public + static-shaped so generated code can call it directly. */
  def score(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](len2)
    val ms1 = new Array[Char](math.min(len1, len2))
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var hit = false
      while (j <= hi && !hit) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched2(j) = true
          ms1(m) = s1.charAt(i)
          m += 1
          hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk s2's matched chars in s2 order against ms1
    var raw = 0
    var k = 0
    var j2 = 0
    while (j2 < len2) {
      if (matched2(j2)) {
        if (s2.charAt(j2) != ms1(k)) raw += 1
        k += 1
      }
      j2 += 1
    }
    val t = raw / 2
    val jaro = (m.toDouble / len1 + m.toDouble / len2 +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val cap = math.min(4, math.min(len1, len2))
      while (p < cap && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler expects (STRING, STRING), got (${l.sql}, ${r.sql})")
      }

    protected override def nullSafeEval(a: Any, b: Any): Any =
      score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.functions.JaroWinkler.score($l, $r);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinklerSim =
      copy(left = newLeft, right = newRight)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinklerSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
