package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-GRAM OCCURRENCES (duplicates kept, document order) in one native
  * pass — the non-distinct sibling of [[WordShinglesExpr]] and the scale
  * form of `Text.gramOccurrencesHof`.
  *
  * Why a native expression (the r12 giant-doc finding): the HOF form
  * embeds the `split(text, ' ')` SUBTREE inside its transform lambda
  * (Column DSL substitutes expression trees, so there is no Project
  * boundary to share it), and interpreted HOF evaluation re-runs the
  * split once per gram position — O(len²) per document. Invisible on
  * 300-char sf docs; the 10x SKEW probe's 0.5 % ~39 KB docs took
  * q_text_repetition from 1.8 s to 13.2 s. Same family as the r8 CDC
  * array-boundary lesson and the winnow substr scan (see
  * [[KgramPolyHashExpr]]). Here: one pass finds word-start byte offsets
  * (0x20 never occurs inside a UTF-8 multi-byte sequence), each gram is
  * the byte span from word j's start to word j+n−1's end — identical
  * bytes to `array_join(slice(split(text, ' '), j+1, n), ' ')` including
  * the consecutive-space empty-word cases (the WordShinglesExpr span
  * argument, minus its dedup). Bit-equality spec: GramExprSpec.
  */
case class WordGramsExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "gram size must be >= 1")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(input: Any): Any =
    GramExprHelpers.wordGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GramExprHelpers.wordGrams($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

/** All k-CHARACTER-gram polynomial hashes of a string in one native pass —
  * the scale form of the winnowing per-position fold
  * `aggregate(chars(substr(t, i+1, k)), 0, (acc, c) -> pmod(acc*31 + c, p))`.
  *
  * Why a native expression: `substr(t, i+1, k)` on a UTF8String walks the
  * byte stream from 0 to find the i-th character boundary — O(i) per
  * position, O(len²) per document once docs leave the 300-char regime
  * (10x SKEW probe: q_doc_fingerprint 7.6 s plain vs 73.6 s skewed; a
  * linear model predicts ~13 s). One decode to code points + direct
  * indexing makes every position O(k). Semantics replicated exactly from
  * the HOF chain, including its edges: positions 0..max(len−k, 0) — a doc
  * shorter than k hashes its one truncated gram at position 0, the empty
  * string hashes to 0 — and `ascii(c)` = code point (supplementary chars
  * are ONE char in both UTF8String.numChars and codePoints()). Values
  * stay < p ≈ 1e9+7, so acc*31 + cp < 2^35: exact long arithmetic, the
  * cross-engine polyHash contract untouched. Bit-equality spec:
  * GramExprSpec.
  */
case class KgramPolyHashExpr(child: Expression, k: Int, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, "k must be >= 1")
  require(p >= 2, "modulus must be >= 2")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kgram_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    GramExprHelpers.kgramPolyHash(input.asInstanceOf[UTF8String], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GramExprHelpers.kgramPolyHash($s, $k, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): KgramPolyHashExpr =
    copy(child = newChild)
}

/** Non-overlapping word SPANS of `spanWords` words (last span shorter) in
  * one native pass — the stride-`spanWords` sibling of [[WordGramsExpr]]
  * and the scale form of the span builder shared by `Text.dedupSpans`,
  * `Text.filterSpansQuality`, and `Sampling.decontaminateSpans`, whose
  * HOF form pastes the split subtree into its lambda (re-split per span
  * position — the damped O(len²/spanWords) variant of the gram builder's
  * quadratic; q_dedup_spans measured 2.5x under the 10x skew probe's
  * giant docs). Same byte-span construction as grams: span j = bytes
  * from word j·spanWords's start to word min((j+1)·spanWords, nWords)−1's
  * end — identical to `array_join(slice(split(text,' '), j·sw+1, sw), ' ')`
  * including clamped tails and consecutive-space empty words.
  * Bit-equality spec: GramExprSpec.
  */
case class WordSpansExpr(child: Expression, spanWords: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(spanWords >= 1, "spanWords must be >= 1")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_spans"

  override protected def nullSafeEval(input: Any): Any =
    GramExprHelpers.wordSpans(input.asInstanceOf[UTF8String], spanWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GramExprHelpers.wordSpans($s, $spanWords);")

  override protected def withNewChildInternal(newChild: Expression): WordSpansExpr =
    copy(child = newChild)
}

/** Winnowing window MINIMA of a hash array in one native pass — the
  * per-doc form of the winnow pipeline's posexplode → per-doc window-min
  * → collect_set stage (Text.winnowFrom, kept as the bit-equality twin).
  *
  * Why a native expression (the r14 100x skew finding): the relational
  * winnow explodes one row PER K-GRAM POSITION — ~total corpus chars —
  * through an exchange and a per-doc sort to feed the window frame, so
  * the stage moves ~250M narrow rows at the 500k-doc skew probe and the
  * lane went ~2x super-linear (same-session A/B: 7.6 s at 10x → 148-182 s
  * at 100x; spill + sort on the position rows). The winnow is a
  * PER-ROW computation — a monotonic-deque pass over the hash array
  * gives every window's minimum in O(n) with no explode, no exchange,
  * no sort. Semantics replicated exactly from winnowFrom: full windows
  * p = 0..n−w (frame rowsBetween(current, w−1)), a doc with fewer than
  * w hashes keeps its one truncated window at position 0; output is the
  * DISTINCT minima sorted ascending (array_sort(collect_set)).
  * Bit-equality spec: GramExprSpec.
  */
case class WinnowMinsExpr(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, "window must be >= 1")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_mins"

  override protected def nullSafeEval(input: Any): Any =
    GramExprHelpers.winnowMins(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GramExprHelpers.winnowMins($s, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowMinsExpr =
    copy(child = newChild)
}

/** Content-defined chunks of a string in one native pass — the per-doc
  * form of Text.dedupChunksCdc's char-explode → k-lead window-hash →
  * boundary-filter → cuts-collect → slice pipeline (kept as the
  * bit-equality twin).
  *
  * Why a native expression (the r14 100x skew finding, the winnow's
  * sibling): the relational chunker explodes one row PER CHARACTER
  * through a per-doc window with k lead() terms — ~250M rows sorted and
  * shuffled at the 500k-doc probe, ~200 s of the lane's wall — to
  * compute what is a per-row O(len·k) scan. Boundary rule replicated
  * exactly: cut at code-point position i ∈ [1, len−k] when the k-gram
  * polynomial hash Σ cp[i+j]·31^(k−1−j) mod p ≡ 0 (mod divisor) — the
  * congruent stepwise fold, positions without a full k-gram never cut
  * (the relational form's null-lead exclusion). Chunks are the
  * substrings between consecutive cuts (0 and len as sentinels); the
  * empty string yields one empty chunk, matching
  * `transform(sequence(0, size(_cuts)−2), …)` on cuts [0, 0].
  * Bit-equality spec: GramExprSpec.
  */
case class CdcChunksExpr(child: Expression, k: Int, divisor: Long, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 2, "k must be >= 2")
  require(divisor >= 2, "divisor must be >= 2")
  require(p >= 2, "modulus must be >= 2")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    GramExprHelpers.cdcChunks(input.asInstanceOf[UTF8String], k, divisor, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GramExprHelpers.cdcChunks($s, $k, ${divisor}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** Static helpers callable from generated Java. */
object GramExprHelpers {

  /** Content-defined chunk substrings (see [[CdcChunksExpr]]). Cut
    * positions are CODE-POINT indices (`substr`'s unit); chunks slice by
    * a byte-offset table built in ONE pass over the UTF-8 bytes — NOT
    * UTF8String.substring, which walks bytes from 0 to find the start
    * boundary per call: Σ starts ≈ len²/divisor byte-steps per doc, the
    * same quadratic the KgramPolyHashExpr scaladoc warns about (the r14
    * 100x probe's CDC stage decomposition measured the chunker at ~25 s
    * of which this walk was nearly all; ~1.5 s after).
    */
  def cdcChunks(s: UTF8String, k: Int, divisor: Long, p: Long): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    // byte offset of each code point (supplementary chars are one code
    // point AND one UTF8String char, so the units agree)
    val bOff = new Array[Int](len + 1)
    var b = 0
    var ci = 0
    while (ci < len) {
      bOff(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    bOff(len) = nBytes
    val cuts = new java.util.ArrayList[Integer]()
    cuts.add(0)
    var i = 1
    val lastStart = len - k
    while (i <= lastStart) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 31L + cps(i + j)) % p
        j += 1
      }
      if (acc % divisor == 0L) cuts.add(i)
      i += 1
    }
    cuts.add(len)
    val nChunks = cuts.size() - 1
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = bOff(cuts.get(c))
      val until = bOff(cuts.get(c + 1))
      out(c) = UTF8String.fromBytes(bytes, from, until - from)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct sorted winnow window minima (see [[WinnowMinsExpr]]):
    * sliding-window minimum via the standard monotonic index deque —
    * amortized O(1) per position — minima deduped through a hash set and
    * sorted ascending. Empty input yields an empty array (the relational
    * twin emits NO row for that doc; callers never feed empty arrays —
    * kgramPolyHash always returns ≥ 1 element).
    */
  def winnowMins(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val hs = arr.toLongArray()
    val seen = new java.util.HashSet[java.lang.Long]()
    if (n < w) {
      var m = hs(0)
      var i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      seen.add(m)
    } else {
      val deque = new Array[Int](n) // indices, front..back increasing hs
      var head = 0
      var tail = -1 // inclusive
      var i = 0
      while (i < n) {
        while (tail >= head && hs(deque(tail)) >= hs(i)) tail -= 1
        tail += 1
        deque(tail) = i
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(hs(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out.map(v => v: Any))
  }

  /** Non-overlapping word spans via byte spans (see [[WordSpansExpr]]). */
  def wordSpans(s: UTF8String, sw: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) numWords += 1; i += 1 }
    val starts = new Array[Int](numWords + 1)
    var w = 1
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = len + 1
    val nSpans = (numWords + sw - 1) / sw
    val out = new Array[Any](nSpans)
    var j = 0
    while (j < nSpans) {
      val from = starts(j * sw)
      val endWord = math.min((j + 1) * sw, numWords)
      val until = starts(endWord) - 1
      out(j) = UTF8String.fromBytes(bytes, from, until - from)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Word-gram occurrences via byte spans (see [[WordGramsExpr]]). */
  def wordGrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) numWords += 1; i += 1 }
    if (numWords < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](numWords + 1) // starts(numWords) = len + 1 sentinel
    var w = 1
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = len + 1
    val out = new Array[Any](numWords - n + 1)
    var j = 0
    while (j <= numWords - n) {
      val from = starts(j)
      val until = starts(j + n) - 1 // end of word j+n-1 (drop the separator)
      out(j) = UTF8String.fromBytes(bytes, from, until - from)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-position k-gram poly hashes over code points (see
    * [[KgramPolyHashExpr]]).
    */
  def kgramPolyHash(s: UTF8String, k: Int, p: Long): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    val nPos = math.max(len - k, 0) + 1
    val out = new Array[Any](nPos)
    var i = 0
    while (i < nPos) {
      var acc = 0L
      var j = i
      val until = math.min(i + k, len)
      while (j < until) {
        acc = (acc * 31L + cps(j)) % p
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
