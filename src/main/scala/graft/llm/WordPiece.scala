package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece — the SECOND production tokenizer family (BERT/DistilBERT
  * /Electra), next to [[Bpe]]'s GPT-2/Llama family. Two faces differ
  * from BPE and both are implemented to the published semantics
  * (Schuster & Nakajima 2012; the HuggingFace `tokenizers`
  * WordPieceTrainer is the de-facto reference):
  *
  *  - TRAINING picks the pair maximizing the LIKELIHOOD score
  *    `count(l,r) / (count(l)·count(r))` — not the raw pair count:
  *    merging is chosen where the pair is most surprising given its
  *    parts, which prefers cohesive morphemes over merely frequent
  *    collocations. Symbols are position-aware: a word's first piece
  *    is bare, every continuation carries the `##` prefix
  *    (`"hello"` → `<h><##e><##l><##l><##o>`), and a merge
  *    concatenates the left piece with the right piece's raw text
  *    (`(##l, ##l) → ##ll`; `(h, ##e) → he`) so initial-ness is
  *    inherited from the left.
  *  - SERVING is greedy LONGEST-MATCH-FIRST against the final piece
  *    vocabulary (not merge replay): at each position take the longest
  *    vocab piece that prefixes the remainder (initial pieces at
  *    position 0, `##` pieces after); a word with any unmatchable
  *    remainder becomes ONE `[UNK]` token — the WordPiece OOV
  *    semantics, and the exact contrast to byte-level BPE's
  *    structurally-zero OOV (X140): the q224 fixture carries unicode
  *    words whose characters training never saw, and the two
  *    tokenizers must disagree in precisely this documented way.
  *
  * Representation & machinery: the same bracketed symbol strings as
  * [[Bpe]] (symbols are `h` / `##ll` — `#` cannot collide with the
  * bracket sentinels, and the `<`/`>` word guard is shared), so the
  * per-round SQL replay is the same replace chain with a score-based
  * argmax. The score is a ratio of exact integer counts evaluated in
  * double: with per-symbol counts < 2^26 the denominator product is
  * exact in double and the division is IEEE-correctly-rounded, hence
  * bit-identical in any engine (the q75 ln precedent); ties break on
  * the pair string ascending, so training is a pure function of the
  * corpus in both engines. (At corpus scales where counts exceed 2^26
  * the engine remains self-consistent — only oracle bit-parity needs
  * the bound, and oracles run at test scale.)
  *
  * Scale design — identical economics to [[Bpe]]: ONE corpus pass to
  * the word-frequency table; each merge round is (a) one
  * vocabulary-sized pair aggregation, (b) one vocabulary-sized symbol
  * aggregation (the score's denominators), (c) a LIMIT-1 argmax, (d) a
  * narrow codegen'd replace. Serving encodes each DISTINCT word once
  * (vocabulary-sized `mapPartitions`, pieces broadcast) and the corpus
  * word stream equi-joins the result.
  */
object WordPiece {

  /** BERT's unknown-word token. */
  val Unk = "[UNK]"

  private val rulesSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** Position-aware bracketed segmentation of the `word` column:
    * first char bare, continuations `##`-prefixed.
    */
  private val wpSegExpr =
    "concat('<', element_at(_t, 1), '>', " +
      "IF(size(_t) > 1, concat('<##', " +
      "array_join(slice(_t, 2, size(_t) - 1), '><##'), '>'), ''))"

  /** The raw text of a (possibly `##`-prefixed) piece. */
  private def raw(piece: String): String =
    if (piece.startsWith("##")) piece.substring(2) else piece

  /** One corpus pass → the position-aware `(word, s, n)` table. */
  private def words0(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(Bpe.wordOk)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("_t", expr("filter(split(word, ''), x -> x <> '')"))
      .select(col("word"), expr(wpSegExpr).as("s"), col("n"))
      .localCheckpoint()

  /** Distributed WordPiece merge loop: per round one pair-count
    * aggregation, one symbol-count aggregation, a LIMIT-1 score
    * argmax, a codegen'd replace — every frame vocabulary-sized.
    */
  private def trainDistributed(words0: DataFrame,
                               nMerges: Int): (Seq[Row], DataFrame) = {
    var words = words0
    val rules = Seq.newBuilder[Row]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val syms = words
        .withColumn("_t", split(trim(col("s"), "<>"), "><"))
        .select(col("n"), explode(col("_t")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("n")).as("sc"))
      val pairs = words
        .withColumn("_t", split(trim(col("s"), "<>"), "><"))
        .select(col("n"), explode(when(size(col("_t")) >= 2, expr(
          "transform(sequence(1, size(_t) - 1), " +
            "i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"))
          .otherwise(array())).as("pr"))
        .groupBy(col("pr")).agg(sum(col("n")).as("cnt"))
        .withColumn("_l", split(col("pr"), " ").getItem(0))
        .withColumn("_r", split(col("pr"), " ").getItem(1))
      val top = pairs
        .join(syms.toDF("_l", "_nl"), Seq("_l"))
        .join(syms.toDF("_r", "_nr"), Seq("_r"))
        .withColumn("score", col("cnt").cast("double") /
          (col("_nl").cast("double") * col("_nr").cast("double")))
        .orderBy(col("score").desc, col("pr")).limit(1)
        .select(col("pr"), col("cnt")).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pr = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(l, rt) = pr.split(' ')
        val merged = l + raw(rt)
        rules += Row(r, l, rt, merged, cnt)
        words = words.withColumn("s",
          replace(col("s"), lit(s"<$l><$rt>"), lit(s"<$merged>")))
        if (r % 16 == 0 && r < nMerges) words = words.localCheckpoint()
        r += 1
      }
    }
    (rules.result(), words)
  }

  /** Heap entry for the in-memory loop: the score AND the exact
    * integer state it was computed from — an entry is live iff the
    * pair count and BOTH endpoint symbol counts still match (lazy
    * invalidation; unlike BPE, a WordPiece score can also RISE when a
    * denominator symbol is consumed, so affected pairs are re-pushed
    * eagerly whenever an endpoint's count changes — see the merge
    * loop).
    */
  private final class WpEntry(val score: Double, val cnt: Long,
                              val nl: Long, val nr: Long,
                              val key: Array[Byte], val pair: Long)

  /** In-memory WordPiece merge loop — the production trainer path,
    * mirroring [[Bpe]]'s hybrid: the vocabulary-sized word table is
    * collected once and the `nMerges` rounds run as exact incremental
    * updates (pair counts, symbol counts, per-endpoint pair index, a
    * lazy-invalidation max-heap on the likelihood score) — ~32k merges
    * without 32k Spark jobs. Reproduces [[trainDistributed]] EXACTLY:
    * same overlapping-adjacency pair counts, same weighted symbol
    * counts, the same `cnt.toDouble / (nl.toDouble * nr.toDouble)`
    * IEEE expression, ties on the UTF-8 byte order of `"lhs rhs"`
    * (WordPieceSpec pins the path parity).
    */
  private def trainInMemory(words0df: DataFrame,
                            nMerges: Int): (Seq[Row], DataFrame) = {
    import scala.collection.mutable
    val spark = words0df.sparkSession
    val collected = words0df.select(col("word"), col("s"), col("n")).collect()
    val nW = collected.length

    val symIds = mutable.HashMap.empty[String, Int]
    val syms = mutable.ArrayBuffer.empty[String]
    def intern(t: String): Int =
      symIds.getOrElseUpdate(t, { syms += t; syms.length - 1 })
    def rawOf(id: Int): String = raw(syms(id))

    val wordSyms = new Array[Array[Int]](nW)
    val freqs = new Array[Long](nW)
    var w = 0
    while (w < nW) {
      val s = collected(w).getString(1)
      wordSyms(w) =
        if (s.length <= 2) Array.emptyIntArray
        else s.substring(1, s.length - 1).split("><", -1).map(intern)
      freqs(w) = collected(w).getLong(2)
      w += 1
    }

    def pk(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xffffffffL)
    def keyOf(p: Long): Array[Byte] = {
      val l = syms((p >>> 32).toInt)
      val r = syms((p & 0xffffffffL).toInt)
      (l + " " + r).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val counts = mutable.HashMap.empty[Long, Long]
    val symCounts = mutable.HashMap.empty[Int, Long]
    val occs = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
    // every pair (live or dead) that ever contained the symbol — the
    // rescore index for denominator changes; dead entries are skipped
    // at re-push time by the live-count check
    val byEndpoint = mutable.HashMap.empty[Int, mutable.HashSet[Long]]
    def addOcc(p: Long, w: Int): Unit =
      occs.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += w
    def indexPair(p: Long): Unit = {
      byEndpoint.getOrElseUpdate((p >>> 32).toInt,
        mutable.HashSet.empty[Long]) += p
      byEndpoint.getOrElseUpdate((p & 0xffffffffL).toInt,
        mutable.HashSet.empty[Long]) += p
    }

    w = 0
    while (w < nW) {
      val a = wordSyms(w); val f = freqs(w)
      val seen = mutable.HashSet.empty[Long]
      var i = 0
      while (i < a.length) {
        symCounts(a(i)) = symCounts.getOrElse(a(i), 0L) + f
        if (i < a.length - 1) {
          val p = pk(a(i), a(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          if (seen.add(p)) { addOcc(p, w); indexPair(p) }
        }
        i += 1
      }
      w += 1
    }

    def scoreOf(p: Long): (Double, Long, Long, Long) = {
      val c = counts.getOrElse(p, 0L)
      val nl = symCounts.getOrElse((p >>> 32).toInt, 0L)
      val nr = symCounts.getOrElse((p & 0xffffffffL).toInt, 0L)
      (c.toDouble / (nl.toDouble * nr.toDouble), c, nl, nr)
    }
    val cmp = new java.util.Comparator[WpEntry] {
      override def compare(x: WpEntry, y: WpEntry): Int = {
        val d = java.lang.Double.compare(y.score, x.score)
        if (d != 0) d else Bpe.compareUtf8(x.key, y.key)
      }
    }
    val heap = new java.util.PriorityQueue[WpEntry](
      math.max(16, counts.size), cmp)
    def push(p: Long): Unit = {
      val (s, c, nl, nr) = scoreOf(p)
      if (c > 0) heap.add(new WpEntry(s, c, nl, nr, keyOf(p), p))
    }
    counts.keysIterator.foreach(push)

    val rules = Seq.newBuilder[Row]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      var winner: WpEntry = null
      while (winner == null && !heap.isEmpty) {
        val e = heap.poll()
        val live = counts.getOrElse(e.pair, 0L) == e.cnt && e.cnt > 0 &&
          symCounts.getOrElse((e.pair >>> 32).toInt, 0L) == e.nl &&
          symCounts.getOrElse((e.pair & 0xffffffffL).toInt, 0L) == e.nr
        if (live) winner = e
      }
      if (winner == null) done = true
      else {
        val p = winner.pair
        val li = (p >>> 32).toInt; val ri = (p & 0xffffffffL).toInt
        val ls = syms(li)
        val mergedStr = ls + rawOf(ri)
        val mi = intern(mergedStr)
        rules += Row(rank, ls, syms(ri), mergedStr, winner.cnt)
        val changedPairs = mutable.HashSet.empty[Long]
        val list = occs.remove(p).getOrElse(mutable.ArrayBuffer.empty[Int])
        val processed = mutable.HashSet.empty[Int]
        list.foreach { w =>
          if (processed.add(w)) {
            val a = wordSyms(w)
            var hit = false
            var i = 0
            while (!hit && i < a.length - 1) {
              if (a(i) == li && a(i + 1) == ri) hit = true
              i += 1
            }
            if (hit) {
              val f = freqs(w)
              i = 0
              while (i < a.length) {
                val sc = symCounts(a(i)) - f
                if (sc == 0L) symCounts.remove(a(i)) else symCounts(a(i)) = sc
                if (i < a.length - 1) {
                  val q = pk(a(i), a(i + 1))
                  val nc = counts(q) - f
                  if (nc == 0L) counts.remove(q) else counts(q) = nc
                  changedPairs += q
                }
                i += 1
              }
              val b = mutable.ArrayBuilder.make[Int]
              i = 0
              while (i < a.length) {
                if (i < a.length - 1 && a(i) == li && a(i + 1) == ri) {
                  b += mi; i += 2
                } else { b += a(i); i += 1 }
              }
              val na = b.result()
              wordSyms(w) = na
              val seen = mutable.HashSet.empty[Long]
              i = 0
              while (i < na.length) {
                symCounts(na(i)) = symCounts.getOrElse(na(i), 0L) + f
                if (i < na.length - 1) {
                  val q = pk(na(i), na(i + 1))
                  counts(q) = counts.getOrElse(q, 0L) + f
                  changedPairs += q
                  if ((na(i) == mi || na(i + 1) == mi) && seen.add(q)) {
                    addOcc(q, w); indexPair(q)
                  }
                }
                i += 1
              }
            }
          }
        }
        // re-push everything whose SCORE may have moved: pairs with a
        // changed count, plus every pair touching a symbol whose count
        // changed (l, r were consumed; m was created) — a WordPiece
        // score RISES when its denominator shrinks, so stale-lower
        // heap entries must be superseded eagerly
        changedPairs -= p
        val affected = mutable.HashSet.empty[Long]
        affected ++= changedPairs
        Seq(li, ri, mi).foreach { s =>
          byEndpoint.get(s).foreach(affected ++= _) }
        affected.foreach { q => if (counts.getOrElse(q, 0L) > 0) push(q) }
        rank += 1
      }
    }

    val outRows: Seq[Row] = (0 until nW).map { w =>
      val sb = new java.lang.StringBuilder
      wordSyms(w).foreach(id => sb.append('<').append(syms(id)).append('>'))
      Row(collected(w).getString(0), sb.toString, freqs(w))
    }
    val wordsSchema = StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, nW / 20000 + 1))
    val wordsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, slices), wordsSchema)
    (rules.result(), wordsDf)
  }

  /** Train `nMerges` WordPiece merges; returns the rule table and the
    * fully-merged word table (both reusable, [[Bpe.trainShared]]
    * shape). Hybrid like the BPE trainer: in-memory when the
    * vocabulary fits `maxDriverWords`, the distributed per-round loop
    * otherwise.
    */
  def trainShared(docs: DataFrame, textCol: String, nMerges: Int,
                  maxDriverWords: Int = Bpe.DefaultMaxDriverWords)
      : (DataFrame, DataFrame) = {
    require(nMerges >= 1, "nMerges must be positive")
    val spark = docs.sparkSession
    val w0 = words0(docs, textCol)
    val (rules, words) =
      if (w0.count() <= maxDriverWords) trainInMemory(w0, nMerges)
      else trainDistributed(w0, nMerges)
    val rulesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rules, 1), rulesSchema)
    (rulesDf, words.localCheckpoint())
  }

  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainShared(docs, textCol, nMerges)._1

  /** The serving vocabulary: the position-aware BASE ALPHABET (every
    * training word's first char bare + continuations `##`-prefixed —
    * NOT the final word table's symbols, which the merges may have
    * consumed entirely: `hu` must still segment as `h ##u` after
    * `hug` merged away both letters) plus every merged piece. Every
    * intermediate symbol is one or the other, so this is the complete
    * piece universe. Vocabulary-sized.
    */
  def pieceSet(rules: DataFrame, trainedWords: DataFrame): DataFrame =
    trainedWords
      .withColumn("_t", expr("filter(split(word, ''), x -> x <> '')"))
      .select(explode(expr(
        "transform(_t, (c, i) -> IF(i = 0, c, concat('##', c)))"))
        .as("piece"))
      .unionByName(rules.select(col("merged").as("piece")))
      .distinct()

  /** HuggingFace's `max_input_chars_per_word` default: a word past
    * the bound becomes ONE `[UNK]` BEFORE the greedy loop (the
    * reference semantics for degenerate tokens — URLs, concatenated
    * ids — whose O(len²) match cost would otherwise be unbounded).
    * Counted in CODEPOINTS (so both the JVM and the oracle agree on
    * emoji and other astral characters).
    */
  val DefaultMaxInputCharsPerWord = 100

  /** Greedy longest-match-first segmentation of `docs`' DISTINCT words
    * under the trained vocabulary — `(word, n_pieces, unk, segmented)`
    * with `segmented` the space-joined pieces (`"hell ##o"`), or the
    * single `[UNK]` (with `unk = 1`, `n_pieces = 1`) when any
    * remainder is unmatchable OR the word exceeds
    * `maxInputCharsPerWord` codepoints (the HuggingFace
    * `max_input_chars_per_word` contract). The per-word loop is
    * O(len²) against a length-bucketed broadcast set; each distinct
    * word encodes ONCE.
    */
  def encodeSegments(docs: DataFrame, textCol: String, rules: DataFrame,
                     trainedWords: DataFrame,
                     maxInputCharsPerWord: Int = DefaultMaxInputCharsPerWord)
      : DataFrame = {
    val spark = docs.sparkSession
    val pieces: Array[String] = pieceSet(rules, trainedWords)
      .collect().map(_.getString(0))
    require(pieces.nonEmpty,
      "encodeSegments needs a non-empty trained vocabulary " +
        "(empty or fully guard-filtered training corpus)")
    val bcInit = spark.sparkContext.broadcast(
      pieces.filter(!_.startsWith("##")).toSet)
    val bcCont = spark.sparkContext.broadcast(
      pieces.filter(_.startsWith("##")).map(raw).toSet)
    val maxLen = pieces.map(raw(_).length).max
    val maxChars = maxInputCharsPerWord
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(Bpe.wordOk)
      .distinct()
      .as[String]
      .mapPartitions { it =>
        val init = bcInit.value
        val cont = bcCont.value
        it.map { w =>
          val out = Seq.newBuilder[String]
          var pos = 0
          var dead = w.codePointCount(0, w.length) > maxChars
          while (pos < w.length && !dead) {
            val inSet = if (pos == 0) init else cont
            var len = math.min(maxLen, w.length - pos)
            var hit = -1
            while (hit < 0 && len >= 1) {
              if (inSet.contains(w.substring(pos, pos + len))) hit = len
              else len -= 1
            }
            if (hit < 0) dead = true
            else {
              out += (if (pos == 0) w.substring(0, hit)
                      else "##" + w.substring(pos, pos + hit))
              pos += hit
            }
          }
          if (dead) (w, 1L, 1, Unk)
          else {
            val ps = out.result()
            (w, ps.length.toLong, 0, ps.mkString(" "))
          }
        }
      }.toDF("word", "n_pieces", "unk", "segmented")
  }

  // ─────────────────── id / artifact surface (X143) ───────────────────

  /** BERT's reserved special tokens, at the RESERVED ids 0..4 — the
    * vocab.txt convention every BERT-family consumer assumes ([PAD]
    * at 0 so padding is the zero id, [UNK] the one id every dead word
    * maps to; [CLS]/[SEP]/[MASK] are sequence-assembly tokens the
    * tokenizer itself never emits but the artifact must carry).
    * The published bert-base artifact interleaves ~1000 [unusedN]
    * slots; we ship the compact five — the CONTRACT (specials before
    * content pieces, line order = id) is the interop surface, not the
    * padding slots.
    */
  val Specials: Seq[String] = Seq("[PAD]", Unk, "[CLS]", "[SEP]", "[MASK]")

  /** The trained tokenizer's token-id table `(piece, token_id)` — a
    * bijection piece ↔ id. [[Specials]] hold ids 0..4; the
    * position-aware base alphabet (initial chars bare, continuation
    * chars `##`-prefixed) follows in UTF-8 BINARY order (ordering by
    * `hex(encode(...))` rather than the raw string keeps the engine
    * and any UTF-8-collating oracle byte-identical even for astral
    * alphabets, where JVM UTF-16 order diverges from codepoint
    * order); merge results follow in rank order. Two merge paths can
    * produce the same piece string — the smallest id wins, so the
    * table stays a bijection (the [[Bpe.pieceVocab]] min-id rule) —
    * and ids are then renumbered DENSELY in min-id order, because the
    * positional `vocab.txt` artifact cannot represent a gap (ids are
    * line numbers; see [[exportVocabTxt]]).
    *
    * Scale: vocabulary-sized throughout; the one window runs on the
    * CHARSET, bounded by the script, not the corpus.
    */
  def pieceVocab(rules: DataFrame, trainedWords: DataFrame): DataFrame = {
    val spark = rules.sparkSession
    import spark.implicits._
    val alphaIds = trainedWords
      .withColumn("_t", expr("filter(split(word, ''), x -> x <> '')"))
      .select(explode(expr(
        "transform(_t, (c, i) -> IF(i = 0, c, concat('##', c)))"))
        .as("piece"))
      .distinct()
      .select(col("piece"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(hex(encode(col("piece"), "UTF-8"))))
          + lit(Specials.length - 1)).as("id"))
    val nAlpha = alphaIds.count()
    val mergeIds = rules.select(col("merged").as("piece"),
      (col("rank") + lit(Specials.length - 1) + lit(nAlpha))
        .cast("int").as("id"))
    // min-id dedup can leave GAPS (two merge paths producing the same
    // merged piece, or a trained piece colliding with a special); the
    // positional vocab.txt artifact compacts line order silently, so
    // ids must be renumbered densely HERE or export→import stops being
    // the identity and every id after a gap shifts. The renumber is
    // the identity on a collision-free corpus (min ids are already
    // 0..n-1) and is mirrored in the [[vocabCtes]] oracle. Total
    // order: min ids are unique (the three sources use disjoint id
    // ranges), so the window is deterministic; vocabulary-sized.
    Specials.zipWithIndex.toDF("piece", "id")
      .unionByName(alphaIds)
      .unionByName(mergeIds)
      .groupBy(col("piece"))
      .agg(min(col("id")).as("_min_id"))
      .select(col("piece"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_min_id"))) - 1).cast("int").as("token_id"))
  }

  /** Export the trained tokenizer as BERT's artifact: `vocab.txt`,
    * ONE piece per line, LINE ORDER = token id (that file IS the
    * model a WordPiece serving stack loads — there is no merges file
    * at serve time; greedy longest-match needs only the piece set).
    * Single-file bounded write (a vocabulary, never a corpus); global
    * order survives `coalesce(1)` after the range sort (the
    * [[Bpe.exportArtifacts]] precedent).
    */
  def exportVocabTxt(rules: DataFrame, trainedWords: DataFrame,
                     path: String): Unit = {
    val vocab = pieceVocab(rules, trainedWords)
    val broken = vocab.filter(col("piece").contains("\n") ||
      col("piece").contains("\r")).count()
    require(broken == 0,
      s"exportVocabTxt: $broken piece(s) contain a newline — the " +
        "one-piece-per-line artifact cannot represent them")
    vocab.orderBy(col("token_id"))
      .select(col("piece").as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$path/vocab.txt")
  }

  /** Read a `vocab.txt` back as `(piece, token_id)` with ids from
    * line order (0-based — line 1 is id 0, the [PAD] convention).
    * Same single-data-file contract as [[Bpe.importMerges]] (one file
    * ⇒ one split ⇒ sequential read). A blank line is an ERROR here,
    * not tolerated: every vocab.txt line IS a piece and ids are
    * positional, so silently dropping one would shift every id after
    * it — the exact failure the loud message exists to prevent.
    */
  def importVocabTxt(spark: SparkSession, path: String): DataFrame = {
    val vocabDir = new org.apache.hadoop.fs.Path(s"$path/vocab.txt")
    val fs = vocabDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(vocabDir)
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    require(dataFiles.length == 1,
      s"importVocabTxt expects exactly one data file under $vocabDir " +
        s"(the single-file export contract); found ${dataFiles.length}: " +
        dataFiles.sorted.mkString(", "))
    val rows = spark.sparkContext.textFile(s"$path/vocab.txt", 1)
      .coalesce(1)
      .mapPartitions { it =>
        var line = 0 // 0-based = the token id
        it.map { piece =>
          if (piece.isEmpty) throw new IllegalArgumentException(
            s"importVocabTxt: blank line ${line + 1} — ids are " +
              "positional, a dropped line would shift every id after it")
          val r = Row(piece, line)
          line += 1
          r
        }
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("token_id", IntegerType, nullable = false))))
  }

  /** The BERT-style pretraining artifact: each document as its flat
    * token-id sequence — `(doc_id, ids, n_unk, n_wp)` where an
    * `[UNK]` word contributes exactly one id (the [[Specials]] UNK id
    * 1) and tallies in `n_unk`, and `n_wp = size(ids)` is the true
    * context-window cost. NO whitespace token is interleaved (the
    * deliberate contrast with [[Bpe.encodeIds]]' id-0 spaces: a
    * WordPiece vocabulary has no whitespace piece — word boundaries
    * are carried by the bare-vs-`##` piece split itself, and
    * sequence punctuation belongs to [CLS]/[SEP] at assembly time,
    * not to the tokenizer). Documents with no clean word emit
    * nothing (the [[tokenCounts]] convention).
    *
    * Scale: segmentation and id lookup run ONCE per DISTINCT word
    * (vocabulary-sized, vocab broadcast); the corpus word stream
    * equi-joins the encoded vocabulary with the build hinted onto
    * the vocab side (the Generate-fan-out estimation trap); per-doc
    * assembly is one keyed aggregation with an in-row sort.
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                rules: DataFrame, trainedWords: DataFrame,
                maxInputCharsPerWord: Int = DefaultMaxInputCharsPerWord)
      : DataFrame = {
    val vocab = pieceVocab(rules, trainedWords)
    val wordIds = encodeSegments(docs, textCol, rules, trainedWords,
        maxInputCharsPerWord)
      .select(col("word"), col("unk"),
        posexplode(split(col("segmented"), " ")).as(Seq("_spos", "piece")))
      .join(broadcast(vocab), Seq("piece"), "left")
      .groupBy(col("word"))
      .agg(max(col("unk")).as("_unk"),
        sort_array(collect_list(struct(col("_spos"),
          coalesce(col("token_id"), lit(-1)).as("id")))).as("_ps"))
      .select(col("word"), col("_unk"),
        expr("transform(_ps, p -> p.id)").as("_wids"))
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("_wpos", "word")))
      .filter(Bpe.wordOk)
      .join(wordIds.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        collect_list(struct(col("_wpos"), col("_wids"))).as("_ws"),
        sum(col("_unk").cast("long")).as("n_unk"))
      // native assembly (no boundary token in WordPiece) — see
      // [[graft.functions.FlattenWordIds]]
      .select(col("doc_id"),
        graft.functions.TokenExprs.flattenWordIdsPlain(col("_ws")).as("ids"),
        col("n_unk"))
      .withColumn("n_wp", size(col("ids")).cast("long"))
  }

  /** Inverse of [[encodeIds]]: id sequences back to text —
    * `(doc_id, text_decoded)`. A `##` piece appends its raw text to
    * the current word; any other piece (including `[UNK]`, which
    * decodes to its literal bracket form) starts a new
    * space-separated word; an id the vocabulary does not know decodes
    * to U+FFFD. `decode(encode(d))` reproduces `d`'s clean word
    * stream exactly when the document had no `[UNK]` word — the q228
    * roundtrip gate proves it per-document, and the oracle predicts
    * it as `n_unk = 0`.
    */
  def decodeIds(encoded: DataFrame, idCol: String, idsCol: String,
                rules: DataFrame, trainedWords: DataFrame): DataFrame = {
    val vocab = pieceVocab(rules, trainedWords)
    encoded.select(col(idCol).as("doc_id"),
        posexplode(col(idsCol)).as(Seq("_pos", "token_id")))
      .join(broadcast(vocab), Seq("token_id"), "left")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("_pos"),
        coalesce(col("piece"), lit("�")).as("p"))).as("_ps"))
      // native assembly — see [[graft.functions.ConcatSortedPieces]]
      .select(col("doc_id"),
        ltrim(graft.functions.TokenExprs.concatSortedPiecesWp(col("_ps")))
          .as("text_decoded"))
  }

  /** Per-document WordPiece economics — `(doc_id, n_words, n_pieces,
    * n_unk)`: an `[UNK]` word contributes 1 piece and tallies in
    * `n_unk` (the face that quantifies what a char-level closed
    * vocabulary LOSES on unicode-bearing corpora — byte-BPE's q219
    * twin is structurally 0 there). Distinct-word encode + stream
    * join, the [[Bpe.encodeTokenCountsWith]] economics; the join is
    * SHUFFLE_HASH-hinted on the vocabulary side (the Generate-fan-out
    * estimation trap).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  rules: DataFrame, trainedWords: DataFrame,
                  maxInputCharsPerWord: Int = DefaultMaxInputCharsPerWord)
      : DataFrame = {
    val seg = encodeSegments(docs, textCol, rules, trainedWords,
        maxInputCharsPerWord)
      .select(col("word"), col("n_pieces"), col("unk"))
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(Bpe.wordOk)
      .join(seg.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("unk").cast("long")).as("n_unk"))
  }

  // ──────────────────── DuckDB oracle builders ────────────────────

  /** The training replay: position-aware `w0`, per-round pair + symbol
    * counts, the score argmax (double ratio of exact integer counts —
    * see the object note), the same replace chain.
    */
  private def roundsCte(nMerges: Int, trainWhere: String,
                        textSql: String): String = {
    val src =
      if (trainWhere.isEmpty) "FROM documents"
      else s"FROM documents WHERE $trainWhere"
    val w0 =
      s"""w0 AS (
        |  SELECT word,
        |         CASE WHEN len(t) > 1
        |              THEN '<' || t[1] || '><##' ||
        |                   array_to_string(t[2:], '><##') || '>'
        |              ELSE '<' || t[1] || '>' END AS s, n
        |  FROM (SELECT word, [c FOR c IN string_split(word, '')] AS t, n
        |        FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |              FROM (SELECT unnest(string_split($textSql, ' ')) AS word $src)
        |              WHERE word <> '' AND NOT contains(word, '<')
        |                AND NOT contains(word, '>') GROUP BY 1)))""".stripMargin
    // AS MATERIALIZED throughout: each round references its inputs
    // several times (t_r feeds both count CTEs; r_r joins sc_r twice),
    // and DuckDB INLINES plain CTEs — the 8-round chain would expand
    // to ~4^8 re-scans of the corpus (measured: EMFILE before any
    // result). Materialization makes the replay linear in rounds.
    val rounds = (1 to nMerges).map { r =>
      s"""t$r AS MATERIALIZED (SELECT string_split(trim(s, '<>'), '><') AS t, n FROM w${r - 1}),
         |sc$r AS MATERIALIZED (SELECT sym, SUM(n) AS sc FROM (
         |           SELECT n, unnest(t) AS sym FROM t$r) GROUP BY 1),
         |p$r AS MATERIALIZED (SELECT pr, SUM(n) AS cnt FROM (
         |          SELECT n, unnest(list_transform(range(1, len(t)),
         |                   i -> t[i] || ' ' || t[i+1])) AS pr
         |          FROM t$r) GROUP BY 1),
         |r$r AS MATERIALIZED (SELECT pr, cnt,
         |               '<' || split_part(pr, ' ', 1) || '><' || split_part(pr, ' ', 2) || '>' AS pat,
         |               '<' || split_part(pr, ' ', 1) ||
         |                 CASE WHEN starts_with(split_part(pr, ' ', 2), '##')
         |                      THEN substr(split_part(pr, ' ', 2), 3)
         |                      ELSE split_part(pr, ' ', 2) END || '>' AS rep
         |        FROM p$r
         |        JOIN sc$r l ON l.sym = split_part(pr, ' ', 1)
         |        JOIN sc$r r ON r.sym = split_part(pr, ' ', 2)
         |        ORDER BY CAST(cnt AS DOUBLE) / (CAST(l.sc AS DOUBLE) * r.sc) DESC, pr
         |        LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, replace(s, pat, rep) AS s, n FROM w${r - 1}, r$r)""".stripMargin
    }.mkString(",\n")
    s"$w0,\n$rounds"
  }

  /** The DuckDB replay of [[learnMerges]]. */
  def oracleSql(nMerges: Int, trainWhere: String = "",
                textSql: String = "text"): String = {
    val union = (1 to nMerges)
      .map(r => s"SELECT $r AS rk, pr, cnt FROM r$r").mkString("\n  UNION ALL ")
    val tail =
      s"""SELECT CAST(rk AS INT) AS rank,
         |       split_part(pr, ' ', 1) AS lhs,
         |       split_part(pr, ' ', 2) AS rhs,
         |       split_part(pr, ' ', 1) ||
         |         CASE WHEN starts_with(split_part(pr, ' ', 2), '##')
         |              THEN substr(split_part(pr, ' ', 2), 3)
         |              ELSE split_part(pr, ' ', 2) END AS merged,
         |       CAST(cnt AS BIGINT) AS n
         |FROM ($union)""".stripMargin
    s"WITH ${roundsCte(nMerges, trainWhere, textSql)}\n$tail"
  }

  /** Longest-match unroll depth: each step consumes ≥ 1 character, so
    * this bounds the longest segmentable word — plenty for any natural
    * word stream (the oracle would mark a longer word [UNK]; the
    * engine has no such bound).
    */
  val OracleMaxWordLen = 32

  /** The serving vocabulary + greedy longest-match CTEs shared by the
    * encode oracles: `voc(piece, rw, init)` and the per-distinct-word
    * segmentation as an UNROLLED `g0..g<OracleMaxWordLen>` chain (one
    * LATERAL length-desc/piece-asc LIMIT-1 probe per level; a word
    * whose remainder matches nothing goes `dead` and aggregates to
    * `[UNK]` — the engine's exact dead-end semantics) ending in
    * `wseg(word, n_pieces, unk, segmented)`.
    *
    * Why unrolled instead of WITH RECURSIVE: DuckDB 1.0 returns no
    * rows from a MATERIALIZED CTE referenced (even transitively)
    * inside a recursive member — voc sees an empty merge table and
    * every word goes [UNK] (measured; and unmaterializing the chain
    * instead re-inlines it exponentially: ~4^rounds corpus re-scans,
    * EMFILE before any result). Outside recursion the materialized
    * chain behaves, and the unroll is bounded by word length anyway.
    */
  private def encodeCtes(nMerges: Int, tokCte: String,
                         maxChars: Int): String = {
    // parity with the engine's maxInputCharsPerWord needs the bound
    // inside the oracle's unroll depth: a word of maxChars codepoints
    // needs at most maxChars greedy steps, so every non-UNK word
    // completes within the g-chain and `rest <> ''` at the end can
    // only mean the over-length pre-kill below
    require(maxChars <= OracleMaxWordLen,
      s"the oracle g-chain unrolls $OracleMaxWordLen levels; " +
        s"maxInputCharsPerWord=$maxChars would let a longer word " +
        "segment in the engine but truncate in the oracle")
    val mergedUnion = (1 to nMerges).map { r =>
      s"SELECT split_part(pr, ' ', 1) || CASE WHEN starts_with(split_part(pr, ' ', 2), '##') " +
        s"THEN substr(split_part(pr, ' ', 2), 3) ELSE split_part(pr, ' ', 2) END AS piece FROM r$r"
    }.mkString("\n  UNION ALL ")
    val levels = (1 to OracleMaxWordLen).map { i =>
      s"""g$i AS (
         |  SELECT g.word,
         |         CASE WHEN g.rest = '' OR g.dead = 1 OR b.piece IS NULL
         |              THEN g.rest ELSE substr(g.rest, strlen(b.rw) + 1) END AS rest,
         |         CASE WHEN g.rest = '' OR g.dead = 1 OR b.piece IS NULL
         |              THEN g.pieces ELSE list_append(g.pieces, b.piece) END AS pieces,
         |         CASE WHEN g.rest <> '' AND g.dead = 0 AND b.piece IS NULL
         |              THEN 1 ELSE g.dead END AS dead
         |  FROM g${i - 1} g LEFT JOIN LATERAL (
         |    SELECT v.piece, v.rw FROM voc v
         |    WHERE v.init = CAST(len(g.pieces) = 0 AS INT) AND g.rest <> ''
         |      AND starts_with(g.rest, v.rw)
         |    ORDER BY strlen(v.rw) DESC, v.piece LIMIT 1) b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""voc AS MATERIALIZED (
       |  SELECT DISTINCT piece,
       |         CASE WHEN starts_with(piece, '##') THEN substr(piece, 3)
       |              ELSE piece END AS rw,
       |         CASE WHEN starts_with(piece, '##') THEN 0 ELSE 1 END AS init
       |  FROM (SELECT unnest(string_split(trim(s, '<>'), '><')) AS piece
       |        FROM w0
       |        UNION ALL $mergedUnion)),
       |tok AS ($tokCte),
       |tokg AS MATERIALIZED (SELECT doc_id, word FROM tok
       |         WHERE word <> '' AND NOT contains(word, '<')
       |           AND NOT contains(word, '>')),
       |ew AS MATERIALIZED (SELECT DISTINCT word FROM tokg),
       |g0 AS (SELECT word, word AS rest,
       |              CAST([] AS VARCHAR[]) AS pieces,
       |              CASE WHEN len(word) > $maxChars THEN 1 ELSE 0 END AS dead
       |       FROM ew),
       |$levels,
       |wseg AS MATERIALIZED (
       |  SELECT word,
       |         CASE WHEN dead = 1 OR rest <> '' THEN CAST(1 AS BIGINT)
       |              ELSE CAST(len(pieces) AS BIGINT) END AS n_pieces,
       |         CASE WHEN dead = 1 OR rest <> '' THEN 1 ELSE 0 END AS unk,
       |         CASE WHEN dead = 1 OR rest <> '' THEN '[UNK]'
       |              ELSE array_to_string(pieces, ' ') END AS segmented
       |  FROM g$OracleMaxWordLen)""".stripMargin
  }

  /** The `merged`-piece projection of round `r`'s rule (the `##`
    * inheritance: left piece concatenated with the right's raw text).
    */
  private def mergedExpr: String =
    "split_part(pr, ' ', 1) || CASE WHEN starts_with(split_part(pr, ' ', 2), '##') " +
      "THEN substr(split_part(pr, ' ', 2), 3) ELSE split_part(pr, ' ', 2) END"

  /** The [[pieceVocab]] replay: specials at 0..4, the position-aware
    * alphabet in UTF-8 binary order (ordered by `hex(encode(...))` on
    * BOTH sides — see [[pieceVocab]]), merges at rank offset, min-id
    * dedup followed by the dense renumber in min-id order. Requires
    * `w0` and `r1..rN` in scope; defines `idv(piece,
    * token_id)` (named apart from [[encodeCtes]]' serving `voc`).
    */
  private def vocabCtes(nMerges: Int): String = {
    val ranked = (1 to nMerges)
      .map(r => s"SELECT $r AS rk, pr FROM r$r").mkString("\n  UNION ALL ")
    val off = Specials.length - 1
    val specialRows = Specials.zipWithIndex
      .map { case (p, i) => s"('$p', $i)" }.mkString(", ")
    s"""valpha AS (SELECT DISTINCT unnest(list_transform(range(1, len(t) + 1),
       |             i -> CASE WHEN i = 1 THEN t[i] ELSE '##' || t[i] END)) AS piece
       |           FROM (SELECT [c FOR c IN string_split(word, '')] AS t FROM w0)),
       |aid AS (SELECT piece,
       |               CAST(ROW_NUMBER() OVER (ORDER BY hex(encode(piece))) + $off AS INT) AS id
       |        FROM valpha),
       |na AS (SELECT CAST(COUNT(*) AS INT) AS n FROM aid),
       |mid AS (SELECT $mergedExpr AS piece,
       |               CAST(rk + $off + na.n AS INT) AS id
       |        FROM ($ranked), na),
       |idv AS (SELECT piece,
       |               CAST(ROW_NUMBER() OVER (ORDER BY min_id) - 1 AS INT) AS token_id
       |        FROM (SELECT piece, MIN(id) AS min_id FROM (
       |                SELECT * FROM (VALUES $specialRows) s(piece, id)
       |                UNION ALL SELECT piece, id FROM aid
       |                UNION ALL SELECT piece, id FROM mid)
       |              GROUP BY 1))""".stripMargin
  }

  /** The DuckDB replay of [[pieceVocab]]. */
  def vocabOracleSql(nMerges: Int, trainWhere: String = "",
                     textSql: String = "text"): String =
    s"WITH ${roundsCte(nMerges, trainWhere, textSql)},\n" +
      s"${vocabCtes(nMerges)}\n" +
      "SELECT piece, token_id FROM idv"

  /** The DuckDB replay of [[encodeIds]]' per-document economics plus
    * the decode-roundtrip prediction: `tokPosCte` must produce
    * `(doc_id, wpos, word)` with `wpos` any key matching the engine's
    * word order. Emits `(doc_id, n_wp, n_unk, ids_fp, roundtrip_ok)`
    * where `ids_fp = Σ id·pos` over the flat 1-based id stream (no
    * whitespace tokens — see [[encodeIds]]) and `roundtrip_ok` is the
    * proof-side prediction `n_unk = 0` (the Spark side computes it
    * honestly from [[decodeIds]] output; any id, order, or
    * segmentation divergence flips the row red).
    */
  def idsOracleSql(nMerges: Int, trainWhere: String, tokPosCte: String,
                   textSql: String = "text",
                   maxChars: Int = OracleMaxWordLen): String = {
    val tail =
      """tokgp AS (SELECT doc_id, wpos, word FROM tokp
        |          WHERE word <> '' AND NOT contains(word, '<')
        |            AND NOT contains(word, '>')),
        |wpl AS (SELECT word, unnest(list_transform(range(1, len(t) + 1),
        |          i -> struct_pack(spos := i, piece := t[i]))) AS u
        |        FROM (SELECT word, string_split(segmented, ' ') AS t FROM wseg)),
        |wid AS (SELECT wpl.word, u.spos AS spos, COALESCE(token_id, -1) AS id
        |        FROM wpl LEFT JOIN idv ON idv.piece = u.piece),
        |wids AS (SELECT word, list(id ORDER BY spos) AS ids,
        |                CAST(COUNT(*) AS BIGINT) AS np
        |         FROM wid GROUP BY 1),
        |ds AS (SELECT t.doc_id, t.wpos, w.ids, w.np, s.unk,
        |              COALESCE(SUM(w.np) OVER (PARTITION BY t.doc_id ORDER BY t.wpos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |       FROM tokgp t JOIN wids w USING (word)
        |       JOIN (SELECT word, unk FROM wseg) s USING (word)),
        |fp AS (SELECT doc_id, unk, np,
        |              list_sum(list_transform(range(1, len(ids) + 1),
        |                j -> CAST(ids[j] AS BIGINT) * (prev + j))) AS contrib
        |       FROM ds)
        |SELECT doc_id,
        |       CAST(SUM(np) AS BIGINT) AS n_wp,
        |       CAST(SUM(unk) AS BIGINT) AS n_unk,
        |       CAST(SUM(contrib) AS BIGINT) AS ids_fp,
        |       CAST(CASE WHEN SUM(unk) = 0 THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
        |FROM fp GROUP BY 1""".stripMargin
    s"WITH ${roundsCte(nMerges, trainWhere, textSql)},\n" +
      s"tokp AS MATERIALIZED ($tokPosCte),\n" +
      s"${encodeCtes(nMerges, "SELECT doc_id, word FROM tokp", maxChars)},\n" +
      s"${vocabCtes(nMerges)},\n$tail"
  }

  /** The DuckDB replay of [[encodeSegments]] (`maxChars` must match
    * the engine call's `maxInputCharsPerWord` and fit the unroll —
    * see [[encodeCtes]]).
    */
  def segmentsOracleSql(nMerges: Int, trainWhere: String, tokCte: String,
                        textSql: String = "text",
                        maxChars: Int = OracleMaxWordLen): String =
    s"WITH ${roundsCte(nMerges, trainWhere, textSql)},\n" +
      s"${encodeCtes(nMerges, tokCte, maxChars)}\n" +
      "SELECT word, n_pieces, unk, segmented FROM wseg"

  /** The DuckDB replay of [[tokenCounts]]. */
  def tokenCountsOracleSql(nMerges: Int, trainWhere: String, tokCte: String,
                           textSql: String = "text",
                           maxChars: Int = OracleMaxWordLen): String =
    s"WITH ${roundsCte(nMerges, trainWhere, textSql)},\n" +
      s"${encodeCtes(nMerges, tokCte, maxChars)}\n" +
      """SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(w.n_pieces) AS BIGINT) AS n_pieces,
        |       CAST(SUM(w.unk) AS BIGINT) AS n_unk
        |FROM tokg t JOIN wseg w USING (word) GROUP BY 1""".stripMargin
}
