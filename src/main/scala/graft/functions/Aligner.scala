package graft.functions

/** Gap-affine pairwise alignment (reference:
  * exon/src/exon/alignment_functions/module.cpp, WFA2-backed). Same
  * semantics, different algorithm: Gotoh-style 3-state DP over suffixes
  * plus a greedy forward walk that extends match runs maximally before
  * opening a gap — which reproduces WFA's backtrace shape (golden
  * ('AACC','AAACC') -> '2M1D2M', test_align.test).
  *
  * Penalties (defaults from the reference's BindData ctor): match <= 0,
  * mismatch 4, gap_open 6, gap_ext 2; a gap of length k costs
  * gap_open + k*gap_ext. Score = -(total penalty) so a perfect match
  * scores 0.0.
  *
  * CIGAR convention (matches the golden): M = align pair (match or
  * mismatch), D = text char skipped (gap in pattern), I = pattern char
  * skipped (gap in text); run-length compressed.
  */
object Aligner {

  final case class Penalties(matchPen: Int = 0, mismatch: Int = 4,
                             gapOpen: Int = 6, gapExt: Int = 2) {
    require(matchPen <= 0, s"match penalty must be <= 0, got $matchPen")
  }

  private final val M = 0
  private final val D = 1 // gap consuming text
  private final val I = 2 // gap consuming pattern
  private final val INF = Int.MaxValue / 4

  /** suffix(i)(j)(s): optimal remaining cost aligning pattern[i:] with
    * text[j:], given the previous emitted op was state s. */
  private def suffixCosts(p: String, t: String, pen: Penalties): Array[Array[Array[Int]]] = {
    val m = p.length
    val n = t.length
    val c = Array.fill(m + 1, n + 1, 3)(INF)
    var s = 0
    while (s < 3) { c(m)(n)(s) = 0; s += 1 }
    var i = m
    while (i >= 0) {
      var j = n
      while (j >= 0) {
        if (i != m || j != n) {
          var st = 0
          while (st < 3) {
            var best = INF
            if (i < m && j < n) {
              val sub = (if (p.charAt(i) == t.charAt(j)) pen.matchPen else pen.mismatch) +
                c(i + 1)(j + 1)(M)
              if (sub < best) best = sub
            }
            if (j < n) {
              val del = pen.gapExt + (if (st == D) 0 else pen.gapOpen) + c(i)(j + 1)(D)
              if (del < best) best = del
            }
            if (i < m) {
              val ins = pen.gapExt + (if (st == I) 0 else pen.gapOpen) + c(i + 1)(j)(I)
              if (ins < best) best = ins
            }
            c(i)(j)(st) = best
            st += 1
          }
        }
        j -= 1
      }
      i -= 1
    }
    c
  }

  /** Optimal end-to-end penalty. */
  def cost(pattern: String, text: String, pen: Penalties): Int =
    suffixCosts(pattern, text, pen)(0)(0)(M)

  /** WFA-style score: negated penalty, as Float. Negate the Int BEFORE
    * widening: `-cost(...).toFloat` parses as `-(cost.toFloat)` and turns
    * a zero-penalty perfect alignment into -0.0f, which renders as "-0.0"
    * and breaks hash comparison against the oracle's 0.0. */
  def score(pattern: String, text: String, pen: Penalties): Float =
    (-cost(pattern, text, pen)).toFloat

  /** Run-length-compressed CIGAR of one optimal alignment, match runs
    * extended greedily from the front. */
  def cigar(pattern: String, text: String, pen: Penalties): String = {
    val c = suffixCosts(pattern, text, pen)
    val m = pattern.length
    val n = text.length
    val sb = new java.lang.StringBuilder
    var runOp: Char = 0
    var runLen = 0
    def emit(op: Char): Unit = {
      if (op == runOp) runLen += 1
      else {
        if (runLen > 0) sb.append(runLen).append(runOp)
        runOp = op; runLen = 1
      }
    }
    var i = 0
    var j = 0
    var st = M
    while (i < m || j < n) {
      val target = c(i)(j)(st)
      // prefer aligning a pair (M) so match runs extend maximally
      if (i < m && j < n &&
          (if (pattern.charAt(i) == text.charAt(j)) pen.matchPen else pen.mismatch) +
            c(i + 1)(j + 1)(M) == target) {
        emit('M'); i += 1; j += 1; st = M
      } else if (j < n &&
          pen.gapExt + (if (st == D) 0 else pen.gapOpen) + c(i)(j + 1)(D) == target) {
        emit('D'); j += 1; st = D
      } else if (i < m &&
          pen.gapExt + (if (st == I) 0 else pen.gapOpen) + c(i + 1)(j)(I) == target) {
        emit('I'); i += 1; st = I
      } else {
        throw new IllegalStateException(s"alignment walk stuck at ($i,$j,$st)")
      }
    }
    if (runLen > 0) sb.append(runLen).append(runOp)
    sb.toString
  }
}
