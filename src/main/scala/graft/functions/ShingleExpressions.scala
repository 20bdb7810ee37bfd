package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Compiled replacements for the d2_minhash_lsh hot path.
  *
  * The pure-`functions._` pipeline (`array_distinct(shingles(tokens))`
  * → `transform(bg, tokHash)` → 8 × `array_min(transform(hs, linear))`)
  * is semantically right but every higher-order function is
  * `CodegenFallback`: per element it pays an interpreted lambda
  * dispatch, and `CollapseProject` additionally inlines the shared
  * `hs` subtree into each of the 8 `array_min` legs, so the md5 of
  * every shingle is recomputed 8×. Measured at sf0.1 the signature
  * side of d2 was ~3 s of the 3.9 s total. These expressions keep the
  * exact hash contract of [[TextFunctions]] (md5 → first 15 hex chars
  * → 60-bit long → mod 1e9+7, bit-identical to the DuckDB oracle) but
  * run one compiled loop per row.
  */
object ShingleExpressions {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def hashedShingleSet(toks: Column, k: Int): Column =
    GraftSqlBridge.column(HashedShingleSet(GraftSqlBridge.expression(toks), k))

  def minhashSig(hs: Column, ab: Seq[(Long, Long)]): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(hs), ab))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def maxRunLength(toks: Column): Column =
    GraftSqlBridge.column(MaxRunLength(GraftSqlBridge.expression(toks)))

  def winnowedFingerprintSet(toks: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowedFingerprintSet(GraftSqlBridge.expression(toks), k, w))

  def topGramStats(toks: Column, k: Int): Column =
    GraftSqlBridge.column(TopGramStats(GraftSqlBridge.expression(toks), k))

  def winnowAnchorPositions(toks: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowAnchorPositions(GraftSqlBridge.expression(toks), k, w))

  def tokenCounts(toks: Column): Column =
    GraftSqlBridge.column(TokenCounts(GraftSqlBridge.expression(toks)))
}

/** Per-document term frequencies — `array<struct<tok, tf>>`, one
  * compiled counting pass per row: the map-side HALF of
  * `explode(toks) → groupBy(tok, doc_id) → count` with the shuffle
  * removed. A posting is a fact about ONE document, so the (tok, tf)
  * pairs are complete inside the row and the relational aggregate's
  * exchange moves exploded token rows only to dedup what this pass
  * dedups in place (guide §2.3 "aggregate before you shuffle" taken to
  * its endpoint: nothing shuffles at all — `explode(token_counts(t))`
  * IS the postings frame). Count semantics mirror the groupBy exactly:
  * duplicate tokens sum, empty strings count like any token, a null
  * element groups under the null key, an EMPTY array yields an empty
  * array (explode then emits no rows, as the aggregate emitted none),
  * and null input stays null. Pair order is first-occurrence — row
  * order was never promised by the aggregate either (every consumer
  * shuffles, aggregates or sorts downstream). */
case class TokenCounts(child: Expression)
    extends UnaryExpression with UnaryKernel {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tok", StringType, nullable = true),
      org.apache.spark.sql.types.StructField("tf", IntegerType, nullable = false))),
      containsNull = false)

  override def kernel(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    // LinkedHashMap: deterministic first-occurrence emission order
    val counts = new java.util.LinkedHashMap[
      org.apache.spark.unsafe.types.UTF8String, Array[Int]](n * 2)
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val c = counts.get(t)
      if (c == null) counts.put(if (t == null) null else t.clone(), Array(1))
      else c(0) += 1
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var w = 0
    while (it.hasNext) {
      val e = it.next()
      out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)

  override def prettyName: String = "token_counts"
}

/** Longest run of equal adjacent elements in a string array, one
  * compiled pass per row.
  *
  * Replaces tx8's HOF restatement (run starts via `filter(sequence)`,
  * lengths via adjacent-start differences): lambdas there reference
  * `element_at(toks, i)`, and after `CollapseProject` inlines the
  * `split(text)` that produces `toks` into the lambda body, the text is
  * re-split PER ELEMENT — O(tokens²) per row with an interpreted split
  * in the middle (measured: tx8 alone ran >13 min at sf0.1; this pass
  * is <0.2 s). Empty array → null, matching `array_max(empty)` in the
  * HOF form and `list_max(empty)` in the oracle.
  */
case class MaxRunLength(child: Expression)
    extends UnaryExpression with UnaryKernel {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  /** Null for EMPTY input (mirroring `array_max(empty)`), not just for
    * null input. */
  override def nullable: Boolean = true

  override def kernel(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var prev = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var cur = 1
    var best = 1
    var i = 1
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      // null-safe equality: split() never emits nulls, but a null run
      // counting as a run is the least surprising total order here
      val eq = if (prev == null) t == null else prev.equals(t)
      cur = if (eq) cur + 1 else 1
      if (cur > best) best = cur
      prev = t
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): MaxRunLength =
    copy(child = newChild)

  override def prettyName: String = "max_run_length"
}

/** Sorted DISTINCT `tokHash` values of the word k-grams of a token
  * array — the hashed shingle set used both as MinHash input and as
  * the exact-Jaccard verify side.
  *
  * Equivalences that make this a drop-in for the HOF pipeline:
  * duplicate shingle STRINGS hash to the same long, so
  * distinct-after-hash equals hash-after-distinct; MinHash takes a
  * min, which is multiset-invariant; the verify stage intersects
  * SETS, so sort order is internal only (and is what lets
  * [[SortedIntersectCount]] merge-scan instead of hash-building).
  * Fewer than k tokens → empty array (matches the guarded
  * `TextFunctions.shingles` and DuckDB's naturally-empty
  * `generate_series`).
  */
case class HashedShingleSet(child: Expression, k: Int)
    extends UnaryExpression with UnaryKernel {

  require(k >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def kernel(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    // null elements contribute nothing, like the HOF form's concat_ws
    // (which drops nulls AND their separators)
    while (t < n) {
      tokBytes(t) = if (toks.isNullAt(t)) null else toks.getUTF8String(t).getBytes
      t += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = Array[Byte](' ')
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      md.reset()
      var d = 0
      var written = 0
      while (d < k) {
        if (tokBytes(i + d) != null) {
          if (written > 0) md.update(space)
          md.update(tokBytes(i + d))
          written += 1
        }
        d += 1
      }
      val digest = md.digest()
      // first 15 hex chars = 15 big-endian nibbles (TextFunctions.md5Long)
      var h = 0L
      var j = 0
      while (j < 15) {
        val b = digest(j / 2) & 0xff
        h = (h << 4) | (if (j % 2 == 0) b >>> 4 else b & 0xf)
        j += 1
      }
      out(i) = h % TextFunctions.HashMod
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingleSet =
    copy(child = newChild)

  override def prettyName: String = "hashed_shingle_set"
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm) over the word k-grams of a token array, one
  * compiled pass per row: hash every k-gram with [[HashedShingleSet]]'s
  * exact gram rule (md5 of the space-joined gram → 60-bit long → mod
  * [[TextFunctions.HashMod]]), slide a window of `w` consecutive grams,
  * select the MINIMUM hash of each window, and return the sorted
  * DISTINCT selected hashes.
  *
  * Why this beats shipping every gram: the selection keeps an expected
  * 2/(w+1) fraction of gram hashes but GUARANTEES that any token run of
  * length ≥ w+k−1 shared by two documents contributes at least one
  * common fingerprint (every length-(w+k−1) run spans a full window of
  * k-grams, and both documents select the same minimum inside it) — the
  * local-guarantee property plain sampling lacks. Fingerprints are a
  * hash SET per document, so the tie position inside a window is
  * irrelevant here (ties share the hash value); the selection is
  * `min(h)` per window on both engines, which is what the DuckDB oracle
  * restates relationally (offset-exploded window membership → group-min
  * → distinct).
  *
  * Window geometry: gram positions 0..G−1 (G = tokens−k+1); window
  * starts q = 0..max(G−w, 0), window q covering positions
  * [q, min(q+w−1, G−1)] — so a document shorter than w grams still
  * yields one whole-document window, and fewer than k tokens yields an
  * empty set (DuckDB's generate_series is naturally empty there). The
  * slide is a monotone-deque minimum — O(G) total, not O(G·w). */
case class WinnowedFingerprintSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UnaryKernel {

  require(k >= 1, "gram width must be >= 1")
  require(w >= 1, "winnowing window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def kernel(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    // null elements contribute nothing to a gram (HashedShingleSet's
    // concat_ws convention), so gram hashes agree with the d2/d4 tier
    while (t < n) {
      tokBytes(t) = if (toks.isNullAt(t)) null else toks.getUTF8String(t).getBytes
      t += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = Array[Byte](' ')
    val g = n - k + 1
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      md.reset()
      var d = 0
      var written = 0
      while (d < k) {
        if (tokBytes(i + d) != null) {
          if (written > 0) md.update(space)
          md.update(tokBytes(i + d))
          written += 1
        }
        d += 1
      }
      val digest = md.digest()
      var h = 0L
      var j = 0
      while (j < 15) {
        val b = digest(j / 2) & 0xff
        h = (h << 4) | (if (j % 2 == 0) b >>> 4 else b & 0xf)
        j += 1
      }
      hs(i) = h % TextFunctions.HashMod
      i += 1
    }
    // monotone deque over positions: deque holds candidate minima of the
    // current window in increasing hash order; selections accumulate per
    // window start q = 0..max(g-w, 0)
    val nWin = math.max(g - w, 0) + 1
    val out = new Array[Long](nWin)
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    var p = 0
    var q = 0
    while (p < g) {
      while (tail > head && hs(deque(tail - 1)) >= hs(p)) tail -= 1
      deque(tail) = p
      tail += 1
      // window q = p-w+1 is complete once p reaches q+w-1; the final
      // (possibly short) window when g < w completes at p = g-1
      if (p >= w - 1 || p == g - 1) {
        while (deque(head) < p - w + 1) head += 1 // expire left-of-window
        out(q) = hs(deque(head))
        q += 1
      }
      p += 1
    }
    java.util.Arrays.sort(out)
    var wr = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(wr - 1)) { out(wr) = out(i); wr += 1 }
      i += 1
    }
    new GenericArrayData(if (wr == out.length) out else java.util.Arrays.copyOf(out, wr))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprintSet =
    copy(child = newChild)

  override def prettyName: String = "winnowed_fingerprint_set"
}

/** Most-frequent word k-gram of a token array — `struct(gram, cnt)` in
  * one compiled pass per row, the kernel of tx20's Gopher-style
  * top-n-gram repetition signals (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", Table A1:
  * "fraction of characters in the most frequent n-gram").
  *
  * Grams are the space-joined k-grams of [[HashedShingleSet]]'s gram
  * rule but kept as STRINGS (the mass needs the winner's character
  * length, and the compared surface carries the gram itself as
  * evidence). Tie-break: highest count, then the LEXICOGRAPHICALLY
  * SMALLEST gram by UTF-8 byte order ([[UTF8String.compareTo]] — the
  * same binary collation DuckDB's `ORDER BY cnt DESC, gram` applies),
  * so the winner is deterministic on both engines. Fewer than k tokens
  * → NULL (the oracle's left-join naturally yields NULL there).
  *
  * The relational restatement (explode grams → count → window-max) is
  * the oracle's shape; running it IN-ENGINE would shuffle the full
  * gram frame. This kernel keeps the whole signal scan-bound: one
  * open-addressed count pass per row, O(tokens) space, nothing but the
  * winner leaves the task. */
case class TopGramStats(child: Expression, k: Int)
    extends UnaryExpression with UnaryKernel {

  require(k >= 1, "gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("gram", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", IntegerType, nullable = false)))

  /** Null for fewer than k tokens (zero grams), not just null input. */
  override def nullable: Boolean = true

  override def kernel(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return null
    val g = n - k + 1
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]](g * 2)
    var i = 0
    while (i < g) {
      // concatWs skips nulls AND their separators — the HOF concat_ws
      // convention shared with the shingle/winnow kernels
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var d = 0
      while (d < k) {
        parts(d) = if (toks.isNullAt(i + d)) null else toks.getUTF8String(i + d)
        d += 1
      }
      val gram = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      val c = counts.get(gram)
      if (c == null) counts.put(gram.clone(), Array(1)) else c(0) += 1
      i += 1
    }
    var bestGram: org.apache.spark.unsafe.types.UTF8String = null
    var bestCnt = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = c
        bestGram = e.getKey
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestGram, bestCnt))
  }

  override protected def withNewChildInternal(newChild: Expression): TopGramStats =
    copy(child = newChild)

  override def prettyName: String = "top_gram_stats"
}

/** The full MinHash signature — `array_min(transform(hs, h → (h·a+b)
  * mod M))` for every (a, b) pair — as ONE compiled pass over the
  * hashed shingle array. Empty input → null (the HOF form's
  * `array_min(empty)` is null per band; a null signature falls out of
  * the band equi-join identically). All intermediates stay < 2^42
  * (h < 2^30, a ≤ 2^10), far from overflow on either engine.
  */
case class MinHashSig(child: Expression, ab: Seq[(Long, Long)])
    extends UnaryExpression with UnaryKernel {

  require(ab.nonEmpty, "at least one (a, b) hash pair")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Null for EMPTY input too (mirroring `array_min(empty)`), not just
    * for null input — so nullability cannot be derived from the child. */
  override def nullable: Boolean = true

  override def kernel(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(ab.length)(Long.MaxValue)
    var seen = 0
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) { // null elements skipped, like array_min's
        seen += 1
        val h = hs.getLong(i)
        var j = 0
        while (j < ab.length) {
          val v = (h * ab(j)._1 + ab(j)._2) % TextFunctions.HashMod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (seen == 0) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** |A ∩ B| of two SORTED DISTINCT long arrays via a codegen'd merge
  * scan — no per-row hash-set build (`array_intersect` allocates and
  * fills one per evaluation, and the verify projection evaluates the
  * intersection in several output columns). Inputs MUST be sorted
  * distinct ([[HashedShingleSet]]'s postcondition); output is the
  * plain count, which is all the Jaccard verify needs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // a null ELEMENT has no position in a sorted merge, and silently
    // treating it as 0 (what getLong would do) is a wrong count, not a
    // degraded one. containsNull=true types are still ACCEPTED —
    // Spark's file sources force every read-back schema nullable
    // (HadoopFsRelation.asNullable), so the at-rest shingle-set reads
    // (d24/d25) arrive as array<long> containsNull=true even though
    // the writer (HashedShingleSet, containsNull=false) guarantees no
    // nulls — and an actual null element fails LOUDLY at runtime
    // below instead of miscounting.
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<long> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  // null elements are checked ONLY on positions the merge actually
  // reads (before each getLong): a never-visited null cannot alter
  // the count, so fail-loud is preserved without the full O(n+m)
  // prescan that would double array traversal in the verify loops
  private def nullElement(side: String): Nothing =
    throw new IllegalArgumentException(
      s"sorted_intersect_count: null element in $side input")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      if (x.isNullAt(i)) nullElement("left")
      if (y.isNullAt(j)) nullElement("right")
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) throw new IllegalArgumentException(
         |    "sorted_intersect_count: null element in left input");
         |  if ($b.isNullAt($j)) throw new IllegalArgumentException(
         |    "sorted_intersect_count: null element in right input");
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) $i++;
         |  else if ($xv > $yv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** Winnowing ANCHOR POSITIONS — the position-bearing sibling of
  * [[WinnowedFingerprintSet]]: the same gram rule (md5 of the
  * space-joined word k-gram → 60-bit long → mod
  * [[TextFunctions.HashMod]]), the same window geometry, but each
  * window selects the RIGHTMOST minimal-hash gram POSITION (0-based)
  * and the sorted distinct positions come back as `array<int>`.
  *
  * Why positions: d21's content-defined segmentation cuts documents AT
  * the anchors, so identical token runs produce identical segments
  * regardless of their offset in the document (the winnowing local
  * guarantee applied to chunk boundaries, the rsync/LBFS
  * content-defined-chunking idea with a deterministic selector). The
  * fingerprint SET form is blind to position by design; segmentation
  * needs the cut points themselves, and the tie rule must be a fixed
  * POSITION rule (rightmost) so both engines cut identically — the
  * DuckDB restatement is `row_number() OVER (PARTITION BY doc, window
  * ORDER BY h, p DESC) = 1`.
  *
  * The deque loop yields exactly that rule: candidates pop on `>=`, so
  * among equal minima the latest position survives and the head is the
  * window's rightmost minimum. Fewer than k tokens → empty array (no
  * grams, no cuts — the caller's whole-document segment). O(G) total.
  */
case class WinnowAnchorPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UnaryKernel {

  require(k >= 1, "gram width must be >= 1")
  require(w >= 1, "winnowing window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def kernel(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Int])
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      tokBytes(t) = if (toks.isNullAt(t)) null else toks.getUTF8String(t).getBytes
      t += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = Array[Byte](' ')
    val g = n - k + 1
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      md.reset()
      var d = 0
      var written = 0
      while (d < k) {
        if (tokBytes(i + d) != null) {
          if (written > 0) md.update(space)
          md.update(tokBytes(i + d))
          written += 1
        }
        d += 1
      }
      val digest = md.digest()
      var h = 0L
      var j = 0
      while (j < 15) {
        val b = digest(j / 2) & 0xff
        h = (h << 4) | (if (j % 2 == 0) b >>> 4 else b & 0xf)
        j += 1
      }
      hs(i) = h % TextFunctions.HashMod
      i += 1
    }
    // monotone deque (pop on >= keeps the RIGHTMOST of equal minima);
    // selected positions flagged, then emitted in ascending order
    val selected = new Array[Boolean](g)
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    var p = 0
    while (p < g) {
      while (tail > head && hs(deque(tail - 1)) >= hs(p)) tail -= 1
      deque(tail) = p
      tail += 1
      if (p >= w - 1 || p == g - 1) {
        while (deque(head) < p - w + 1) head += 1 // expire left-of-window
        selected(deque(head)) = true
      }
      p += 1
    }
    var cnt = 0
    i = 0
    while (i < g) { if (selected(i)) cnt += 1; i += 1 }
    val out = new Array[Int](cnt)
    var wr = 0
    i = 0
    while (i < g) { if (selected(i)) { out(wr) = i; wr += 1 }; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchorPositions =
    copy(child = newChild)

  override def prettyName: String = "winnow_anchor_positions"
}
