package graft.nlp

/** Ratcliff/Obershelp similarity — the metric behind Python difflib's
  * `SequenceMatcher.ratio()` / `get_close_matches`, implemented for exact
  * behavioral parity with the reference's fuzzy matching (cutoffs 0.6 /
  * 0.8 / 0.85). ratio = 2·M / (|a| + |b|) where M is the total length of
  * matched blocks found by recursively taking the longest common
  * substring and matching the pieces to its left and right.
  *
  * (difflib adds an "autojunk" popularity heuristic for sequences longer
  * than 200 elements; entity names never hit it, so it is intentionally
  * not replicated.)
  */
object Similarity {

  /** Longest common substring of a[alo,ahi) and b[blo,bhi):
    * (startA, startB, length), earliest-in-a wins ties (difflib's
    * find_longest_match semantics without junk handling). */
  private def longestMatch(a: String, b: String,
                           alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo; var bestj = blo; var bestSize = 0
    // j2len(j) = length of longest suffix match ending at (i, j)
    var j2len = Map.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      var newJ2len = Map.empty[Int, Int]
      var j = blo
      while (j < bhi) {
        if (a(i) == b(j)) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newJ2len += (j -> k)
          if (k > bestSize) { besti = i - k + 1; bestj = j - k + 1; bestSize = k }
        }
        j += 1
      }
      j2len = newJ2len
      i += 1
    }
    (besti, bestj, bestSize)
  }

  private def matchedLength(a: String, b: String,
                            alo: Int, ahi: Int, blo: Int, bhi: Int): Int = {
    if (alo >= ahi || blo >= bhi) 0
    else {
      val (i, j, size) = longestMatch(a, b, alo, ahi, blo, bhi)
      if (size == 0) 0
      else size +
        matchedLength(a, b, alo, i, blo, j) +
        matchedLength(a, b, i + size, ahi, j + size, bhi)
    }
  }

  /** difflib `SequenceMatcher(None, a, b).ratio()`. */
  def ratio(a: String, b: String): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else 2.0 * matchedLength(a, b, 0, a.length, 0, b.length) / (a.length + b.length)
}
