package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge learning and tokenization — the
  * tokenizer-training half of the LLM data pipeline (the BPE
  * algorithm of Sennrich et al. 2016, the vocabulary builder behind
  * GPT-2/RoBERTa-style tokenizers).
  *
  * Scale design — the part that matters at 100 TB: the corpus is
  * scanned ONCE, for the word-frequency table; every merge round
  * after that runs on that table, whose size is the corpus
  * VOCABULARY (sublinear in corpus bytes — tens of millions of rows
  * for a web-scale corpus, regardless of how many petabytes produced
  * it). This is exactly how production tokenizer trainers work: pair
  * statistics are weighted by word frequency, never re-scanned from
  * raw text.
  *
  * The merge loop itself is HYBRID. When the vocabulary fits the
  * driver (`maxDriverWords`, default 2M rows — a web-scale corpus's
  * word table after frequency thresholding), the word table is
  * collected ONCE and the `nMerges` rounds run as the classic
  * in-memory trainer: exact pair counts in a hash map, incremental
  * updates touching only the words that contain the winning pair,
  * and a lazy-invalidation max-heap for the argmax — ~32k merges in
  * tens of seconds instead of 32k Spark jobs (the per-round
  * distributed loop pays one vocabulary-sized aggregation + LIMIT-1
  * collect per merge, which is correct but unusable at production
  * vocabulary sizes). The in-memory loop reproduces the distributed
  * loop EXACTLY — same overlapping-adjacency pair counts, same
  * frequency weighting, same (count desc, pair-string asc in UTF-8
  * byte order) tie-break — so the DuckDB lockstep oracle replays
  * either path verbatim (pinned by the BpeSpec parity gate).
  *
  * When the vocabulary exceeds `maxDriverWords`, training falls back
  * to the distributed loop: each round is (a) one vocabulary-sized
  * aggregation to count adjacent symbol pairs, (b) a `LIMIT 1`
  * argmax (TakeOrderedAndProject — no global sort), (c) a narrow
  * codegen'd string-replace projection applying the winning merge.
  * The driver holds only the `nMerges` winning rules. Tokenizing the
  * corpus afterwards is the same economics on either path: per-word
  * symbol counts come off the trained word table, and the corpus
  * word stream just equi-joins it.
  *
  * Symbol sequences ride as individually bracketed tokens
  * (`"word"` → `"<w><o><r><d>"`), so applying a merge is one
  * non-overlapping left-to-right `replace("<l><r>", "<lr>")`.
  * The brackets make this EXACT: adjacent pattern matches share no
  * characters (each token owns its own bracket pair), so the greedy
  * scan merges a run `a a a a` into `aa aa` exactly like the
  * standard skip-two pass, and a symbol that merely starts or ends
  * with another symbol's text can never false-match. A shared-
  * delimiter encoding (`|a|b|`) fails BOTH ways — the trailing `|`
  * of one match is the leading `|` of the next, and `<l>` would
  * prefix-match `<lr>` — which is why the brackets are per-token.
  * An external SQL engine replays the whole training verbatim.
  * Words containing `<` or `>` are guard-filtered (here and in the
  * oracle). No end-of-word marker is appended: merges never cross
  * the bracket boundary, which is the marker's only job in this
  * representation.
  *
  * Determinism: arg-max ties break on the pair string ascending, so
  * the learned merge table is a pure function of the corpus.
  */
object Bpe {

  /** The guard both sides apply to the raw word stream. Exposed to
    * the query layer so roundtrip gates recompose EXACTLY the clean
    * word stream the encoder saw.
    */
  private[graft] def wordOk = col("word") =!= "" &&
    !col("word").contains("<") && !col("word").contains(">")

  private val rulesSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** Default driver-side vocabulary cap for the in-memory merge loop
    * (~2M words ≈ a few hundred MB of symbol arrays — comfortably
    * inside any production driver; above it the distributed loop
    * takes over).
    */
  val DefaultMaxDriverWords: Int = 2000000

  /** Run the training loop: one corpus pass to the word-frequency
    * table, then `nMerges` rounds — in-memory when the vocabulary
    * fits `maxDriverWords`, distributed otherwise. Returns the
    * winning rules and the final `(word, s, n)` table with every
    * merge applied.
    */
  private def train(docs: DataFrame, textCol: String, nMerges: Int,
                    maxDriverWords: Int): (Seq[Row], DataFrame) = {
    require(nMerges >= 1, "nMerges must be positive")
    // one corpus pass → vocabulary-sized (word, freq), as "<w><o><r><d>"
    val words0 = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(wordOk)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(col("word"), concat(lit("<"),
        concat_ws("><", expr("filter(split(word, ''), x -> x <> '')")),
        lit(">")).as("s"), col("n"))
      .localCheckpoint()

    if (words0.count() <= maxDriverWords) trainInMemory(words0, nMerges)
    else trainDistributed(words0, nMerges)
  }

  /** Distributed merge loop: one pair-count aggregation + LIMIT-1
    * argmax + codegen'd replace per round. The fallback for word
    * tables beyond driver memory — correct at any vocabulary size,
    * but pays one Spark job per merge.
    */
  private def trainDistributed(words0: DataFrame,
                               nMerges: Int): (Seq[Row], DataFrame) = {
    var words = words0
    val rules = Seq.newBuilder[Row]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      // sequence(1, 0) DESCENDS in Spark — words reduced to a single
      // symbol must short-circuit to an empty pair list
      val top = words
        .withColumn("_t", split(trim(col("s"), "<>"), "><"))
        .select(col("n"), explode(when(size(col("_t")) >= 2, expr(
          "transform(sequence(1, size(_t) - 1), " +
            "i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"))
          .otherwise(array())).as("pr"))
        .groupBy(col("pr")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pr = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(l, rt) = pr.split(' ')
        rules += Row(r, l, rt, l + rt, cnt)
        words = words.withColumn("s",
          replace(col("s"), lit(s"<$l><$rt>"), lit(s"<$l$rt>")))
        // re-materialize periodically: round r otherwise re-evaluates
        // all r-1 stacked replaces from the base checkpoint (O(n²)
        // vocab passes) and the nested-replace expression tree would
        // grow unboundedly at production merge counts (~32k)
        if (r % 16 == 0 && r < nMerges) words = words.localCheckpoint()
        r += 1
      }
    }
    (rules.result(), words)
  }

  /** UTF-8 byte-order comparison — Spark orders strings by the binary
    * UTF-8 encoding (UTF8String.compareTo), which differs from Java's
    * UTF-16 `String.compareTo` for supplementary characters; the
    * in-memory argmax tie-break must match the distributed
    * `orderBy(pr)` exactly.
    */
  private[llm] def compareUtf8(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Heap entry: pair count at push time + the pair string's UTF-8
    * bytes for the tie-break. Entries are never updated — a stale
    * entry (count changed since push) is detected and discarded at
    * pop time by comparing against the live count (lazy
    * invalidation).
    */
  private final class PairEntry(val cnt: Long, val key: Array[Byte],
                                val pair: Long)

  /** Classic in-memory BPE merge loop over a collected word table —
    * the production trainer path. Symbols are interned to ints; each
    * round pops the live (count desc, pair asc) max off a lazy-
    * invalidation heap, then updates ONLY the words containing the
    * winning pair: their old adjacencies are decremented, the greedy
    * left-to-right merge applied, new adjacencies incremented, and
    * every changed pair re-pushed at its new count. The occurrence
    * index (pair → word ids) may hold stale entries — each is
    * verified against the word's current symbols before processing —
    * and only ever GAINS entries for pairs involving the freshly
    * merged symbol, which is sound because a merge can only create
    * adjacencies involving that symbol.
    *
    * Semantics are pinned to [[trainDistributed]]: overlapping
    * adjacency counts (a word `aaa` holds two `(a,a)` pairs),
    * frequency weighting, greedy non-overlapping replace, ties on
    * the UTF-8 byte order of `"lhs rhs"`.
    */
  private def trainInMemory(words0: DataFrame,
                            nMerges: Int): (Seq[Row], DataFrame) = {
    import scala.collection.mutable
    val spark = words0.sparkSession
    val collected = words0.select(col("word"), col("s"), col("n")).collect()
    val nW = collected.length

    val symIds = mutable.HashMap.empty[String, Int]
    val syms = mutable.ArrayBuffer.empty[String]
    def intern(t: String): Int =
      symIds.getOrElseUpdate(t, { syms += t; syms.length - 1 })

    // parse Spark's own bracketed form rather than re-splitting the
    // word in the driver: character segmentation stays defined by ONE
    // engine (split(word, '') on the executor), so both paths and the
    // oracle agree on what a "character" is
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
    val occs = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
    def addOcc(p: Long, w: Int): Unit =
      occs.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int]) += w

    w = 0
    while (w < nW) {
      val a = wordSyms(w); val f = freqs(w)
      val seen = mutable.HashSet.empty[Long]
      var i = 0
      while (i < a.length - 1) {
        val p = pk(a(i), a(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
        if (seen.add(p)) addOcc(p, w)
        i += 1
      }
      w += 1
    }

    val cmp = new java.util.Comparator[PairEntry] {
      override def compare(x: PairEntry, y: PairEntry): Int = {
        if (x.cnt != y.cnt) java.lang.Long.compare(y.cnt, x.cnt)
        else compareUtf8(x.key, y.key)
      }
    }
    val heap = new java.util.PriorityQueue[PairEntry](
      math.max(16, counts.size), cmp)
    counts.foreach { case (p, c) => heap.add(new PairEntry(c, keyOf(p), p)) }

    val rules = Seq.newBuilder[Row]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      var winner: PairEntry = null
      while (winner == null && !heap.isEmpty) {
        val e = heap.poll()
        if (e.cnt > 0 && counts.getOrElse(e.pair, 0L) == e.cnt) winner = e
      }
      if (winner == null) done = true
      else {
        val p = winner.pair
        val li = (p >>> 32).toInt; val ri = (p & 0xffffffffL).toInt
        val ls = syms(li); val rs = syms(ri)
        val mi = intern(ls + rs)
        rules += Row(rank, ls, rs, ls + rs, winner.cnt)
        val changed = mutable.HashSet.empty[Long]
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
              while (i < a.length - 1) {
                val q = pk(a(i), a(i + 1))
                val nc = counts(q) - f
                if (nc == 0L) counts.remove(q) else counts(q) = nc
                changed += q
                i += 1
              }
              // greedy left-to-right non-overlapping merge (the
              // replace("<l><r>", "<lr>") semantics)
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
              while (i < na.length - 1) {
                val q = pk(na(i), na(i + 1))
                counts(q) = counts.getOrElse(q, 0L) + f
                changed += q
                if ((na(i) == mi || na(i + 1) == mi) && seen.add(q))
                  addOcc(q, w)
                i += 1
              }
            }
          }
        }
        changed -= p
        changed.foreach { q =>
          val c = counts.getOrElse(q, 0L)
          if (c > 0) heap.add(new PairEntry(c, keyOf(q), q))
        }
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

  /** Train once, share twice: the merge-rule table AND the fully-
    * merged `(word, s, n)` vocabulary as DataFrames (the words frame
    * localCheckpointed so both consumers — and a memoizing caller —
    * reuse the materialized result instead of re-training).
    */
  def trainShared(docs: DataFrame, textCol: String, nMerges: Int,
                  maxDriverWords: Int = DefaultMaxDriverWords)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val (rules, words) = train(docs, textCol, nMerges, maxDriverWords)
    val rulesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rules, 1), rulesSchema)
    (rulesDf, words.localCheckpoint())
  }

  /** Learn the first `nMerges` BPE merges over the corpus's
    * space-tokenized words. Output: `(rank, lhs, rhs, merged, n)` —
    * 1-based rank, the merged symbol, and the frequency-weighted
    * occurrence count of the pair at the time it won. Stops early if
    * every word has collapsed to a single symbol.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxDriverWords: Int = DefaultMaxDriverWords): DataFrame =
    trainShared(docs, textCol, nMerges, maxDriverWords)._1

  /** Tokenize the corpus under a freshly-trained `nMerges`-rule BPE
    * vocabulary ([[tokenCountsWith]] over [[trainShared]]'s words —
    * pass a memoized words frame there to avoid re-training when
    * [[learnMerges]] already ran on the same corpus).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  nMerges: Int): DataFrame =
    tokenCountsWith(docs, idCol, textCol,
      trainShared(docs, textCol, nMerges)._2)

  /** Per-document token economics under an already-trained vocabulary
    * (`(word, s, n)` from [[trainShared]]):
    * `(doc_id, n_words, n_chars, n_bpe, n_oov, compression)` where
    * `n_bpe` is the document's symbol count after the merges and
    * `compression = n_chars / n_bpe` (what a token-budget planner
    * actually needs from a tokenizer). The per-word symbol count is
    * computed ONCE on the vocabulary table; the corpus word stream
    * LEFT-joins it — tokenization never re-runs per occurrence, and a
    * word absent from the training vocabulary (scoring a DIFFERENT
    * corpus than the one trained on) does not silently vanish: it
    * falls back to its per-character symbol count (the zero-merge
    * upper bound a byte/char-level tokenizer would pay) and is tallied
    * in `n_oov`, so token economics stay conservative and the OOV rate
    * is visible instead of an invisible undercount.
    *
    * Contract: a document contributes a row only if it has at least
    * one word passing the `<`/`>` sentinel guard — empty texts and
    * all-sentinel documents emit nothing (the same emit-nothing
    * convention as `refPerplexityBuckets` for transition-free docs).
    */
  def tokenCountsWith(docs: DataFrame, idCol: String, textCol: String,
                      trainedWords: DataFrame): DataFrame = {
    val vocab = trainedWords.select(col("word"),
      size(split(trim(col("s"), "<>"), "><")).cast("long").as("_nsym"))
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(wordOk)
      .join(vocab, Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(coalesce(col("_nsym"), length(col("word")).cast("long")))
          .as("n_bpe"),
        sum(col("_nsym").isNull.cast("long")).as("n_oov"))
      .withColumn("compression",
        round(col("n_chars").cast("double") / col("n_bpe"), 4))
  }

  /** Greedy BPE ENCODING of one word under a trained merge-rank map —
    * the production tokenizer's serve face (GPT-2 `bpe()` shape):
    * repeatedly find the adjacent symbol pair with the LOWEST merge
    * rank and apply that merge to every occurrence (greedy
    * left-to-right non-overlapping, the training replace semantics),
    * until no trained pair remains. Returns the final symbol count.
    *
    * WHY this equals replaying the merges sequentially in rank order
    * (which is what the SQL oracle does, and what training did to the
    * training corpus): merging (l,r) → lr only creates NEW adjacencies
    * that involve lr, and any rule whose side is lr necessarily has a
    * later rank than the rule that created lr — so occurrences of
    * lower-ranked pairs are only ever consumed, never created, and the
    * min-rank-first loop applies rules in strictly increasing rank
    * order: exactly the sequential replay minus its no-ops. The same
    * argument makes encoding a training word reproduce its trained
    * segmentation bit-for-bit (the BpeSpec parity gate).
    *
    * O(len²) worst case per word — words are short, and the caller
    * encodes each DISTINCT word once.
    */
  private def encodeSyms(chars: Array[String],
                         ranks: scala.collection.Map[(String, String), Int])
      : Array[String] = {
    if (chars.length <= 1) return chars
    var syms = chars
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val l = syms(bi); val r = syms(bi + 1); val m = l + r
        val b = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            b += m; j += 2
          } else { b += syms(j); j += 1 }
        }
        syms = b.result()
      }
    }
    syms
  }

  /** Tokenize text under an ALREADY-TRAINED vocabulary by actually
    * APPLYING the learned merges to each word — the production
    * tokenizer serve face, vs [[tokenCountsWith]]'s lookup-with-
    * char-fallback (which charges every out-of-vocabulary word its
    * full character count: honest for budgeting, but an upper bound).
    * Here an unseen word is greedily segmented into learned sub-words
    * ([[encodeLen]] — provably identical to rank-order merge replay,
    * so a SQL engine oracles it), and `n_oov` narrows to its real
    * meaning: words containing a CHARACTER the training corpus never
    * saw (the only case a merge-applying tokenizer cannot segment —
    * where a byte-fallback tokenizer would switch to bytes).
    *
    * Output: `(doc_id, n_words, n_chars, n_bpe, n_oov, compression)` —
    * same schema and emit-nothing-for-empty-docs contract as
    * [[tokenCountsWith]]; on the training corpus itself the two agree
    * exactly with `n_oov = 0` (BpeSpec pins this).
    *
    * Scale: the merge table (`nMerges` rows) and the training alphabet
    * (charset-sized) broadcast from the driver; encoding runs ONCE per
    * DISTINCT word of the scoring corpus (vocabulary-sized
    * `mapPartitions` — sublinear in corpus bytes, the same economics
    * as training), and the corpus word stream equi-joins the encoded
    * vocabulary. Character segmentation stays engine-defined
    * (`split(word, '')` on the executor) so driver and oracle agree on
    * what a character is.
    */
  /** The encoded DISTINCT-word vocabulary of `docs`' word stream:
    * `(word, _nsym, _oov, _seg)` where `_seg` is the bracketed
    * segmentation (`"<lo><w>"` — the exact `s` representation the
    * training loop and the SQL oracle use). Vocabulary-sized; shared
    * by [[encodeTokenCountsWith]] and [[encodeSegments]].
    */
  private def encodedVocab(docs: DataFrame, textCol: String,
                           rules: DataFrame,
                           trainedWords: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ranks: Map[(String, String), Int] = rules
      .select(col("rank"), col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val alphabet: Set[String] = trainedWords
      .select(explode(expr("filter(split(word, ''), x -> x <> '')")).as("ch"))
      .distinct().collect().map(_.getString(0)).toSet
    val bcRanks = spark.sparkContext.broadcast(ranks)
    val bcAlpha = spark.sparkContext.broadcast(alphabet)
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(wordOk)
      .distinct()
      .withColumn("_chars", expr("filter(split(word, ''), x -> x <> '')"))
      .as[(String, Seq[String])]
      .mapPartitions { it =>
        val rk = bcRanks.value
        val al = bcAlpha.value
        it.map { case (w, chars) =>
          val a = chars.toArray
          val syms = encodeSyms(a, rk)
          val sb = new java.lang.StringBuilder
          syms.foreach(s => sb.append('<').append(s).append('>'))
          (w, syms.length.toLong,
            if (a.forall(al.contains)) 0L else 1L, sb.toString,
            syms.toSeq)
        }
      }.toDF("word", "_nsym", "_oov", "_seg", "_syms")
  }

  def encodeTokenCountsWith(docs: DataFrame, idCol: String, textCol: String,
                            rules: DataFrame,
                            trainedWords: DataFrame): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(wordOk)
    val encoded = encodedVocab(docs, textCol, rules, trainedWords)
      .select(col("word"), col("_nsym"), col("_oov"))
    // SHUFFLE_HASH on the vocab side: the mapPartitions encode erases
    // size stats, and Spark otherwise broadcasts the post-explode
    // CORPUS stream (the Generate-broadcast trap — explode fan-out is
    // invisible to size estimation). The hint builds on the
    // vocabulary-sized side, never sorts, and holds at any vocab size.
    tok.join(encoded.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum(col("_nsym")).as("n_bpe"),
        sum(col("_oov")).as("n_oov"))
      .withColumn("compression",
        round(col("n_chars").cast("double") / col("n_bpe"), 4))
  }

  /** The tokenizer's ACTUAL output: the per-distinct-word segmentation
    * table `(word, n_sym, oov, segmented)` under an already-trained
    * vocabulary, with `segmented` in the same bracketed form as the
    * training representation (`"slow"` → `"<s><low>"`). This is what a
    * serving tokenizer ships — a corpus tokenizes by joining its word
    * stream against this table ([[encodeTokenCountsWith]] is exactly
    * that join, aggregated). Vocabulary-sized output; the same
    * min-rank-first ≡ sequential-replay argument as [[encodeSyms]]
    * makes it SQL-oracle-able symbol for symbol.
    */
  def encodeSegments(docs: DataFrame, textCol: String, rules: DataFrame,
                     trainedWords: DataFrame): DataFrame =
    encodedVocab(docs, textCol, rules, trainedWords)
      .select(col("word"), col("_nsym").as("n_sym"),
        col("_oov").as("oov"), col("_seg").as("segmented"))

  /** The trained tokenizer's token-id table `(piece, token_id)` — the
    * artifact a serving stack ships alongside the merge rules. Id 0
    * is the reserved whitespace piece `" "` (what makes
    * [[decodeIds]] ∘ [[encodeIds]] the identity on clean text — the
    * GPT-2 move of making whitespace a token instead of losing it);
    * ids 1..|A| are the training alphabet in lexicographic (binary)
    * order; merge results follow in rank order. Two merge paths can
    * yield the same piece string — the smallest id wins, so the table
    * is a bijection piece ↔ id.
    *
    * Scale: vocabulary-sized throughout. The one window
    * (`row_number` over the alphabet) runs on the CHARSET — bounded
    * by the script, not the corpus.
    */
  def pieceVocab(rules: DataFrame, trainedWords: DataFrame): DataFrame = {
    val spark = rules.sparkSession
    import spark.implicits._
    val alphaIds = trainedWords
      .select(explode(expr("filter(split(word, ''), x -> x <> '')"))
        .as("piece"))
      .distinct()
      .select(col("piece"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("piece"))).as("id"))
    val nAlpha = alphaIds.count()
    val mergeIds = rules.select(
      concat(col("lhs"), col("rhs")).as("piece"),
      (col("rank") + lit(nAlpha)).cast("int").as("id"))
    Seq((" ", 0)).toDF("piece", "id")
      .unionByName(alphaIds)
      .unionByName(mergeIds)
      .groupBy(col("piece"))
      .agg(min(col("id")).cast("int").as("token_id"))
  }

  /** Export the trained tokenizer as the standard interop artifacts —
    * what a serving stack or an external trainer exchange:
    *
    *  - `$path/merges`: ONE text file of rank-ordered `lhs rhs` lines
    *    (the GPT-2 `merges.txt` shape — line order IS the rank, no
    *    rank column). nMerges lines; the same documented bounded
    *    single-file contract as the CSV sink (a merge table is
    *    vocabulary-sized, never corpus-sized).
    *  - `$path/vocab`: the [[pieceVocab]] `(piece, token_id)` table as
    *    parquet (engine face — joins back into any pipeline).
    *
    * Symbols never contain spaces (words are split ON spaces and the
    * `<`/`>` sentinels are guard-filtered), so the line format is
    * unambiguous; [[importMerges]] round-trips it exactly (BpeSpec
    * pins the roundtrip, q214 oracles it through disk).
    */
  def exportArtifacts(rules: DataFrame, trainedWords: DataFrame,
                      path: String): Unit = {
    rules.orderBy(col("rank"))
      .select(concat_ws(" ", col("lhs"), col("rhs")).as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$path/merges")
    pieceVocab(rules, trainedWords)
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Read a GPT-2-shape merges file back as `(rank, lhs, rhs,
    * merged)` — rank reconstructed from line order, which the
    * single-file export contract preserves (one file ⇒ one input
    * split ⇒ sequential read, exactly how every tokenizer loader
    * consumes `merges.txt`).
    *
    * `skipVersionHeader`: the published GPT-2 artifact convention puts
    * a `#version: 0.2` first line ahead of the rules (openai/gpt-2's
    * encoder.py drops line 1 unconditionally; HuggingFace `tokenizers`
    * skips it iff it starts with `#version:`). We follow the HF test —
    * skip ONLY a physical-line-1 `#version:` prefix — because in the
    * byte-level rendering `#` is a legitimate rule character (byte
    * 0x23) and an unconditional drop would eat the rank-1 merge of a
    * headerless file. [[importMergesGpt2]] sets this; the engine's own
    * headerless `merges` artifact does not.
    */
  def importMerges(spark: SparkSession, path: String,
                   skipVersionHeader: Boolean = false): DataFrame = {
    // rank = line order is only sound when the directory holds ONE
    // data file (one file ⇒ one split ⇒ zipWithIndex is the line
    // number); a multi-part directory from another producer would
    // silently interleave partitions into wrong ranks — fail instead
    val mergesDir = new org.apache.hadoop.fs.Path(s"$path/merges")
    val fs = mergesDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(mergesDir)
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    require(dataFiles.length == 1,
      s"importMerges expects exactly one data file under $mergesDir " +
        s"(the single-file export contract); found ${dataFiles.length}: " +
        dataFiles.sorted.mkString(", "))
    // one data file ⇒ textFile yields one partition ⇒ a sequential
    // in-iterator walk sees physical line order: blank lines (a
    // hand-edited file's trailing newline) are tolerated without
    // costing a rank, the malformed-rule error names the PHYSICAL
    // line number (not the post-filter index, which diverges from
    // what the user sees exactly in the hand-edited case), and the
    // optional #version header skip is line-1-only by construction
    val rows = spark.sparkContext.textFile(s"$path/merges", 1)
      .coalesce(1) // a >128MB file would split; keep the walk sequential
      .mapPartitions { it =>
        var physical = 0 // 1-based physical line number
        var rank = 0     // dense over actual rules
        it.flatMap { line =>
          physical += 1
          if (line.isEmpty) Iterator.empty
          else if (skipVersionHeader && physical == 1 &&
                   line.startsWith("#version:")) Iterator.empty
          else {
            val sp = line.indexOf(' ')
            if (sp < 0) throw new IllegalArgumentException(
              s"importMerges: malformed merges rule at line $physical " +
                s"(no 'lhs rhs' space): '$line'")
            rank += 1
            Iterator.single(Row(rank, line.substring(0, sp),
              line.substring(sp + 1)))
          }
        }
      }
    spark.createDataFrame(rows, StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false))))
      .withColumn("merged", concat(col("lhs"), col("rhs")))
  }

  /** The pretraining artifact itself: each document as its flat
    * token-ID sequence under an already-trained vocabulary —
    * `(doc_id, ids, n_oov, n_bpe)` with id 0 interleaved between
    * words ([[pieceVocab]]'s whitespace token) and `-1` for a piece
    * the vocabulary cannot name (a single character the training
    * corpus never saw — the byte-fallback seam; such words are
    * tallied per occurrence in `n_oov`). `n_bpe = size(ids)` — the
    * true context-window cost including whitespace tokens. Documents
    * with no clean word emit nothing (the [[tokenCountsWith]]
    * convention).
    *
    * Scale: segmentation and id lookup run ONCE per DISTINCT word
    * (vocabulary-sized; the piece→id table broadcasts); the corpus
    * word stream equi-joins the encoded vocabulary with the build
    * hinted onto the vocab side (the Generate-fan-out estimation trap
    * — see [[encodeTokenCountsWith]]); per-doc assembly is one keyed
    * aggregation with an in-row sort over the doc's own words — no
    * windows, nothing beyond document length anywhere.
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                rules: DataFrame, trainedWords: DataFrame): DataFrame = {
    val vocab = pieceVocab(rules, trainedWords)
    val wordIds = encodedVocab(docs, textCol, rules, trainedWords)
      .select(col("word"), col("_oov"),
        posexplode(col("_syms")).as(Seq("_spos", "piece")))
      .join(broadcast(vocab), Seq("piece"), "left")
      .groupBy(col("word"))
      .agg(max(col("_oov")).as("_oov"),
        sort_array(collect_list(struct(col("_spos"),
          coalesce(col("token_id"), lit(-1)).as("id")))).as("_ps"))
      .select(col("word"), col("_oov"),
        expr("transform(_ps, p -> p.id)").as("_wids"))
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("_wpos", "word")))
      .filter(wordOk)
      .join(wordIds.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        collect_list(struct(col("_wpos"), col("_wids"))).as("_ws"),
        sum(col("_oov")).as("n_oov"))
      // one native pass replaces sort_array + flatten/transform/concat
      // (all CodegenFallback, two allocations per word) — same bytes,
      // see [[graft.functions.FlattenWordIds]]
      .select(col("doc_id"),
        graft.functions.TokenExprs.flattenWordIds(col("_ws"), 0).as("ids"),
        col("n_oov"))
      .withColumn("n_bpe", size(col("ids")).cast("long"))
  }

  /** Inverse of [[encodeIds]]: token-id sequences back to text —
    * `(doc_id, text_decoded)`. Id 0 decodes to the space, an id the
    * vocabulary does not know (e.g. the `-1` OOV marker) to U+FFFD,
    * so `decode(encode(d)) == d`'s clean word stream exactly when the
    * document had no OOV word (the q202 roundtrip gate proves it
    * per-document). Same scale shape as encode: broadcast vocab, one
    * keyed aggregation, in-row sort.
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
        graft.functions.TokenExprs.concatSortedPieces(col("_ps"))
          .as("text_decoded"))
  }

  /** Shared CTE chain `w0 … w<nMerges>` (each `(word, s, n)`) with the
    * per-round pair-count / argmax / replace, in lockstep with the
    * Scala loop. `trainWhere` optionally restricts the training corpus
    * (the cross-corpus encode oracle trains on a slice).
    */
  private def roundsCte(nMerges: Int, trainWhere: String = "",
                        textSql: String = "text"): String = {
    val src =
      if (trainWhere.isEmpty) "FROM documents"
      else s"FROM documents WHERE $trainWhere"
    val w0 =
      s"""w0 AS (
        |  SELECT word,
        |         '<' || array_to_string([c FOR c IN string_split(word, '')], '><')
        |             || '>' AS s, n
        |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM (SELECT unnest(string_split($textSql, ' ')) AS word $src)
        |        WHERE word <> '' AND NOT contains(word, '<')
        |          AND NOT contains(word, '>') GROUP BY 1))""".stripMargin
    s"$w0,\n${mergeRounds(nMerges)}"
  }

  /** The per-round pair-count / argmax / replace CTE triple
    * `p_r/r_r/w_r` over a `w0(word, s, n)` base — segmentation-
    * agnostic (char-level [[roundsCte]] and byte-level
    * [[byteRoundsCte]] share it verbatim: the merge loop never looks
    * inside a symbol).
    */
  private def mergeRounds(nMerges: Int): String =
    (1 to nMerges).map { r =>
      s"""p$r AS (
         |  SELECT pr, SUM(n) AS cnt FROM (
         |    SELECT n, unnest(list_transform(range(1, len(t)),
         |             i -> t[i] || ' ' || t[i+1])) AS pr
         |    FROM (SELECT string_split(trim(s, '<>'), '><') AS t, n
         |          FROM w${r - 1}))
         |  GROUP BY 1),
         |r$r AS (SELECT pr, cnt FROM p$r ORDER BY cnt DESC, pr LIMIT 1),
         |w$r AS (SELECT word, replace(s,
         |          '<' || split_part(pr, ' ', 1) || '><' || split_part(pr, ' ', 2) || '>',
         |          '<' || split_part(pr, ' ', 1) || split_part(pr, ' ', 2) || '>') AS s, n
         |        FROM w${r - 1}, r$r)""".stripMargin
    }.mkString(",\n")

  /** The DuckDB replay of [[learnMerges]]. Assumes the corpus yields
    * at least `nMerges` mergeable pairs (true for any real text
    * corpus; the Scala side stops early instead).
    */
  // NOTE (stripMargin discipline, applies to every builder here): the
  // CTE chains are already margin-stripped — a stripMargin over an
  // ASSEMBLED string would re-strip their `|| '>'` continuation lines
  // (blanks + `|` prefix) and corrupt the SQL, so only literal pieces
  // go through stripMargin, never concatenations.
  def oracleSql(nMerges: Int, textSql: String = "text"): String =
    s"WITH ${roundsCte(nMerges, textSql = textSql)}\n${rulesSelect(nMerges)}"

  /** The DuckDB replay of [[tokenCounts]]. */
  def tokenizeOracleSql(nMerges: Int): String = {
    val tail =
      s"""v AS (SELECT word,
         |             CAST(len(string_split(trim(s, '<>'), '><')) AS BIGINT) AS nsym
         |      FROM w$nMerges),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents),
         |j AS (SELECT t.doc_id, t.word,
         |             COALESCE(v.nsym, len(t.word)) AS nsym,
         |             CASE WHEN v.nsym IS NULL THEN 1 ELSE 0 END AS oov
         |      FROM tok t LEFT JOIN v USING (word)
         |      WHERE t.word <> '' AND NOT contains(t.word, '<')
         |        AND NOT contains(t.word, '>'))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(len(word)) AS BIGINT) AS n_chars,
         |       CAST(SUM(nsym) AS BIGINT) AS n_bpe,
         |       CAST(SUM(oov) AS BIGINT) AS n_oov,
         |       ROUND(CAST(SUM(len(word)) AS DOUBLE) / SUM(nsym), 4)
         |         AS compression
         |FROM j GROUP BY 1""".stripMargin
    s"WITH ${roundsCte(nMerges)},\n$tail"
  }

  /** The DuckDB replay of [[encodeTokenCountsWith]]: train on the
    * `trainWhere` slice of `documents` (the full `roundsCte` chain),
    * then apply the learned merges to the eval token stream given by
    * `tokCte` (a SQL body producing `(doc_id, word)`) — applied
    * SEQUENTIALLY in rank order over the eval DISTINCT-word table,
    * which [[encodeLen]]'s scaladoc proves identical to the engine's
    * min-rank-first loop. `n_oov` = words containing a character
    * absent from the training alphabet (chars of `w0`), exactly the
    * engine's definition.
    */
  /** The shared encode CTE chain: eval token stream (`tokCte` →
    * `tokg`), distinct eval words, sequential merge application
    * `e0 … e<nMerges>`, per-word symbol count `v`, training alphabet
    * `alpha`, and the per-word unseen-char flag `wo`.
    * NOTE: same stripMargin discipline as [[oracleSql]] — interpolated
    * pieces are pre-stripped and contain no line-leading `|`, so only
    * the literal text goes through stripMargin.
    */
  private def encodeCtes(nMerges: Int, tokCte: String): String = {
    val encRounds = (1 to nMerges).map { r =>
      s"""e$r AS (SELECT word, replace(s,
         |          '<' || split_part(pr, ' ', 1) || '><' || split_part(pr, ' ', 2) || '>',
         |          '<' || split_part(pr, ' ', 1) || split_part(pr, ' ', 2) || '>') AS s
         |        FROM e${r - 1}, r$r)""".stripMargin
    }.mkString(",\n")
    s"""tok AS ($tokCte),
       |tokg AS (SELECT doc_id, word FROM tok
       |         WHERE word <> '' AND NOT contains(word, '<')
       |           AND NOT contains(word, '>')),
       |ew AS (SELECT DISTINCT word FROM tokg),
       |e0 AS (SELECT word,
       |              '<' || array_to_string([c FOR c IN string_split(word, '')], '><')
       |                  || '>' AS s
       |       FROM ew),
       |$encRounds,
       |v AS (SELECT word,
       |             CAST(len(string_split(trim(s, '<>'), '><')) AS BIGINT) AS nsym
       |      FROM e$nMerges),
       |alpha AS (SELECT DISTINCT unnest([c FOR c IN string_split(word, '')]) AS ch
       |          FROM w0),
       |wch AS (SELECT DISTINCT word, unnest([c FOR c IN string_split(word, '')]) AS ch
       |        FROM ew),
       |wo AS (SELECT wch.word,
       |              CAST(MAX(CASE WHEN a.ch IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
       |       FROM wch LEFT JOIN alpha a USING (ch) GROUP BY 1)""".stripMargin
  }

  def encodeOracleSql(nMerges: Int, trainWhere: String,
                      tokCte: String): String = {
    val tail =
      """j AS (SELECT t.doc_id, t.word, v.nsym, wo.oov
        |      FROM tokg t JOIN v USING (word) JOIN wo USING (word))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(len(word)) AS BIGINT) AS n_chars,
        |       CAST(SUM(nsym) AS BIGINT) AS n_bpe,
        |       CAST(SUM(oov) AS BIGINT) AS n_oov,
        |       ROUND(CAST(SUM(len(word)) AS DOUBLE) / SUM(nsym), 4)
        |         AS compression
        |FROM j GROUP BY 1""".stripMargin
    s"WITH ${roundsCte(nMerges, trainWhere)},\n" +
      s"${encodeCtes(nMerges, tokCte)},\n$tail"
  }

  /** The DuckDB replay of [[encodeSegments]]: the final `e<nMerges>.s`
    * column IS the engine's bracketed segmentation, symbol for symbol.
    */
  def segmentOracleSql(nMerges: Int, trainWhere: String,
                       tokCte: String): String = {
    val tail =
      s"""SELECT e.word, v.nsym AS n_sym, wo.oov, e.s AS segmented
         |FROM e$nMerges e JOIN v USING (word) JOIN wo USING (word)""".stripMargin
    s"WITH ${roundsCte(nMerges, trainWhere)},\n" +
      s"${encodeCtes(nMerges, tokCte)}\n$tail"
  }

  /** The token-id vocabulary CTEs shared by [[vocabOracleSql]] and
    * [[idsOracleSql]]: alphabet ids 1..|A| in binary order, merge
    * results at |A|+rank, the space piece at 0, min-id dedup — the
    * exact [[pieceVocab]] construction. Requires `w0` and `r1..rN`
    * (from [[roundsCte]]) in scope.
    */
  private def vocabCtes(nMerges: Int): String = {
    val ranked = (1 to nMerges)
      .map(r => s"SELECT $r AS rk, pr FROM r$r").mkString("\n  UNION ALL ")
    s"""valpha AS (SELECT DISTINCT unnest([c FOR c IN string_split(word, '')]) AS ch
       |           FROM w0),
       |aid AS (SELECT ch AS piece,
       |               CAST(ROW_NUMBER() OVER (ORDER BY ch) AS INT) AS id
       |        FROM valpha),
       |na AS (SELECT CAST(COUNT(*) AS INT) AS n FROM aid),
       |mid AS (SELECT split_part(pr, ' ', 1) || split_part(pr, ' ', 2) AS piece,
       |               CAST(rk + na.n AS INT) AS id
       |        FROM ($ranked), na),
       |voc AS (SELECT piece, CAST(MIN(id) AS INT) AS token_id
       |        FROM (SELECT ' ' AS piece, 0 AS id
       |              UNION ALL SELECT piece, id FROM aid
       |              UNION ALL SELECT piece, id FROM mid)
       |        GROUP BY 1)""".stripMargin
  }

  /** The DuckDB replay of [[pieceVocab]] over a `trainWhere`-sliced
    * training corpus.
    */
  def vocabOracleSql(nMerges: Int, trainWhere: String): String =
    s"WITH ${roundsCte(nMerges, trainWhere)},\n${vocabCtes(nMerges)}\n" +
      "SELECT piece, token_id FROM voc"

  /** The DuckDB replay of [[encodeIds]]'s per-document economics plus
    * the decode-roundtrip prediction: `tokPosCte` must produce
    * `(doc_id, wpos, word)` with `wpos` any ordering key that matches
    * the engine's word order (positions are compacted per doc on both
    * sides). Emits `(doc_id, n_bpe, n_oov, ids_fp, roundtrip_ok)`
    * where `ids_fp = Σ id·pos` over the flat 1-based stream (space
    * tokens contribute 0 — id 0 — so the word-offset algebra closes)
    * and `roundtrip_ok` is the PROOF-side prediction `n_oov = 0`
    * (the Spark side computes it honestly from [[decodeIds]] output;
    * a divergence in id assignment, piece order, or whitespace
    * interleaving flips the row red).
    */
  def idsOracleSql(nMerges: Int, trainWhere: String,
                   tokPosCte: String): String = {
    val tail =
      """fp AS (SELECT doc_id, oov, nsym,
        |              list_sum(list_transform(range(1, len(ids) + 1),
        |                j -> CAST(ids[j] AS BIGINT) * (prev + k - 1 + j))) AS contrib
        |       FROM ds)
        |SELECT doc_id,
        |       CAST(SUM(nsym) + COUNT(*) - 1 AS BIGINT) AS n_bpe,
        |       CAST(SUM(oov) AS BIGINT) AS n_oov,
        |       CAST(SUM(contrib) AS BIGINT) AS ids_fp,
        |       CAST(CASE WHEN SUM(oov) = 0 THEN 1 ELSE 0 END AS INT) AS roundtrip_ok
        |FROM fp GROUP BY 1""".stripMargin
    s"WITH ${roundsCte(nMerges, trainWhere)},\n${vocabCtes(nMerges)},\n" +
      s"${idsChainCtes(nMerges, tokPosCte)},\n$tail"
  }

  /** The per-word-id chain shared by [[idsOracleSql]] and
    * [[docIdsSelect]]: eval token stream with positions → distinct
    * words → sequential merge replay → per-word ordered id lists
    * (`wids`), per-word unseen-char flags (`wo`) and the per-doc
    * word stream `ds` with compacted word rank `k` and the
    * cumulative-symbol offset `prev`. Requires [[roundsCte]] +
    * [[vocabCtes]] in scope.
    */
  private def idsChainCtes(nMerges: Int, tokPosCte: String): String = {
    val encRounds = (1 to nMerges).map { r =>
      s"""e$r AS (SELECT word, replace(s,
         |          '<' || split_part(pr, ' ', 1) || '><' || split_part(pr, ' ', 2) || '>',
         |          '<' || split_part(pr, ' ', 1) || split_part(pr, ' ', 2) || '>') AS s
         |        FROM e${r - 1}, r$r)""".stripMargin
    }.mkString(",\n")
    s"""tokp AS ($tokPosCte),
       |tokg AS (SELECT doc_id, wpos, word FROM tokp
       |         WHERE word <> '' AND NOT contains(word, '<')
       |           AND NOT contains(word, '>')),
       |ew AS (SELECT DISTINCT word FROM tokg),
       |e0 AS (SELECT word,
       |              '<' || array_to_string([c FOR c IN string_split(word, '')], '><')
       |                  || '>' AS s
       |       FROM ew),
       |$encRounds,
       |wp AS (SELECT word, unnest(list_transform(range(1, len(t) + 1),
       |              i -> struct_pack(spos := i, piece := t[i]))) AS u
       |       FROM (SELECT word, string_split(trim(s, '<>'), '><') AS t
       |             FROM e$nMerges)),
       |wps AS (SELECT word, u.spos AS spos, u.piece AS piece FROM wp),
       |wid AS (SELECT word, spos, COALESCE(token_id, -1) AS id
       |        FROM wps LEFT JOIN voc USING (piece)),
       |wids AS (SELECT word, list(id ORDER BY spos) AS ids,
       |                CAST(COUNT(*) AS BIGINT) AS nsym
       |         FROM wid GROUP BY 1),
       |wch AS (SELECT DISTINCT word,
       |               unnest([c FOR c IN string_split(word, '')]) AS ch
       |        FROM ew),
       |wo AS (SELECT wch.word,
       |              CAST(MAX(CASE WHEN a.ch IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
       |       FROM wch LEFT JOIN valpha a USING (ch) GROUP BY 1),
       |ds AS (SELECT t.doc_id, t.wpos, w.ids, w.nsym, wo.oov,
       |              ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY t.wpos) AS k,
       |              COALESCE(SUM(w.nsym) OVER (PARTITION BY t.doc_id ORDER BY t.wpos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
       |       FROM tokg t JOIN wids w USING (word) JOIN wo USING (word))""".stripMargin
  }

  /** A nestable full SELECT producing `(doc_id, n_bpe, dids)` — each
    * document's FLAT id list with the space token joined between
    * words, the SQL twin of [[encodeIds]]' `ids` column. Composition
    * oracles (pack materialization) wrap it as a CTE.
    */
  def docIdsSelect(nMerges: Int, trainWhere: String,
                   tokPosCte: String): String = {
    val tail =
      """SELECT doc_id,
        |       CAST(SUM(nsym) + COUNT(*) - 1 AS BIGINT) AS n_bpe,
        |       flatten(list(CASE WHEN k = 1 THEN ids
        |                         ELSE list_prepend(0, ids) END ORDER BY wpos)) AS dids
        |FROM ds GROUP BY doc_id""".stripMargin
    s"WITH ${roundsCte(nMerges, trainWhere)},\n${vocabCtes(nMerges)},\n" +
      s"${idsChainCtes(nMerges, tokPosCte)}\n$tail"
  }

  // ──────────────────────── byte-level BPE ────────────────────────
  //
  // The production GPT-2/Llama tokenizer shape: the base alphabet is
  // the 256 BYTES of each word's UTF-8 encoding, so any unicode input
  // — non-Latin scripts, emoji, mojibake — segments with n_oov
  // STRUCTURALLY zero (the char-level stack above marks a
  // training-unseen character −1 instead; that is its documented
  // byte-fallback seam). Symbols ride as 2-char uppercase hex codes
  // inside the SAME bracketed representation ("hé" → "<68><C3><A9>"),
  // which buys three things at once:
  //
  //  - the whole merge machinery is reused VERBATIM — in-memory
  //    trainer, distributed trainer, and the SQL oracle's replace
  //    chain never look inside a symbol;
  //  - no sentinel guard: hex symbols cannot contain '<'/'>', so the
  //    byte path accepts the words the char path must discard (they
  //    just become bytes 3C/3E);
  //  - any engine replays the segmentation — Spark's
  //    hex(encode(word,'UTF-8')) and DuckDB's hex(encode(word)) emit
  //    the identical uppercase hex string, split into pairs by the
  //    same '..' regex.
  //
  // The whitespace token needs no reserved id: space IS byte 0x20
  // (id 32 by construction), so decode(encode(d)) is byte-exact on
  // any clean text.

  /** Byte-path word guard: only empty words drop (no sentinel
    * exclusion — see the section note). Exposed like [[wordOk]] so
    * roundtrip gates recompose the exact word stream.
    */
  private[graft] def byteWordOk = col("word") =!= ""

  /** The bracketed byte segmentation of the `word` column. */
  private val byteSegExpr =
    "regexp_extract_all(hex(encode(word, 'UTF-8')), '..', 0)"

  private def trainBytes(docs: DataFrame, textCol: String, nMerges: Int,
                         maxDriverWords: Int): (Seq[Row], DataFrame) = {
    require(nMerges >= 1, "nMerges must be positive")
    // one corpus pass → vocabulary-sized (word, freq), bytes as hex
    val words0 = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(byteWordOk)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(col("word"), concat(lit("<"),
        concat_ws("><", expr(byteSegExpr)), lit(">")).as("s"), col("n"))
      .localCheckpoint()
    if (words0.count() <= maxDriverWords) trainInMemory(words0, nMerges)
    else trainDistributed(words0, nMerges)
  }

  /** Byte-level [[trainShared]]: same hybrid merge loop, byte
    * segmentation, no sentinel guard. Same scale economics — one
    * corpus pass, everything after is vocabulary-sized.
    */
  def trainSharedBytes(docs: DataFrame, textCol: String, nMerges: Int,
                       maxDriverWords: Int = DefaultMaxDriverWords)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val (rules, words) = trainBytes(docs, textCol, nMerges, maxDriverWords)
    val rulesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rules, 1), rulesSchema)
    (rulesDf, words.localCheckpoint())
  }

  /** Byte-level [[learnMerges]]. */
  def learnMergesBytes(docs: DataFrame, textCol: String, nMerges: Int,
                       maxDriverWords: Int = DefaultMaxDriverWords): DataFrame =
    trainSharedBytes(docs, textCol, nMerges, maxDriverWords)._1

  /** Byte-level token-id table `(piece, token_id)`: ids 0..255 ARE the
    * byte values — fixed 256-entry base regardless of what the
    * training corpus contained (the GPT-2 move that makes every input
    * encodable), no window needed (fixed-width uppercase hex sorts in
    * numeric order; the id is just the byte). Merge results follow at
    * 255 + rank; min-id dedup covers merge paths that reproduce the
    * same piece string (base pieces are 2 chars, merges ≥ 4 — those
    * families can never collide).
    */
  def byteVocab(rules: DataFrame): DataFrame = {
    val spark = rules.sparkSession
    import spark.implicits._
    (0 until 256).map(b => (f"$b%02X", b)).toDF("piece", "id")
      .unionByName(rules.select(
        concat(col("lhs"), col("rhs")).as("piece"),
        (col("rank") + lit(255)).cast("int").as("id")))
      .groupBy(col("piece"))
      .agg(min(col("id")).cast("int").as("token_id"))
  }

  /** Encoded DISTINCT-word vocabulary of `docs`' word stream under the
    * byte-level rules: `(word, _nsym, _syms)`. [[encodeSyms]] applies
    * unchanged — min-rank-first over hex symbols is the same provably-
    * sequential replay, so the SQL oracle replays it rank by rank. No
    * alphabet membership check: every base symbol is one of the 256
    * bytes by construction.
    */
  private def encodedVocabBytes(docs: DataFrame, textCol: String,
                                rules: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ranks: Map[(String, String), Int] = rules
      .select(col("rank"), col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val bcRanks = spark.sparkContext.broadcast(ranks)
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(byteWordOk)
      .distinct()
      .withColumn("_bytes", expr(byteSegExpr))
      .as[(String, Seq[String])]
      .mapPartitions { it =>
        val rk = bcRanks.value
        it.map { case (w, bytes) =>
          val syms = encodeSyms(bytes.toArray, rk)
          (w, syms.length.toLong, syms.toSeq)
        }
      }.toDF("word", "_nsym", "_syms")
  }

  /** Byte-level [[encodeTokenCountsWith]]:
    * `(doc_id, n_words, n_bytes, n_bpe, n_oov, compression)` — the
    * denominator is BYTES (what a byte-level tokenizer compresses) and
    * `n_oov` is emitted as the structural 0 the byte alphabet
    * guarantees, kept in the schema so gates PIN the guarantee rather
    * than assume it. Same join economics as the char face (encode once
    * per distinct word, SHUFFLE_HASH on the vocab side — the
    * Generate-fan-out estimation trap).
    */
  def encodeTokenCountsBytes(docs: DataFrame, idCol: String,
                             textCol: String, rules: DataFrame): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(byteWordOk)
    val encoded = encodedVocabBytes(docs, textCol, rules)
      .select(col("word"), col("_nsym"))
    tok.join(encoded.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("octet_length(word)")).as("n_bytes"),
        sum(col("_nsym")).as("n_bpe"))
      .withColumn("n_oov", lit(0L))
      .withColumn("compression",
        round(col("n_bytes").cast("double") / col("n_bpe"), 4))
  }

  /** Byte-level [[encodeIds]]: `(doc_id, ids, n_oov, n_bpe)` with byte
    * id 32 (space) interleaved between words. `n_oov` is computed
    * HONESTLY from the vocab join (a null id would surface as −1 and
    * count), so the structural-zero claim is verified per run, not
    * asserted. Same shape: per-distinct-word encode, broadcast vocab,
    * one keyed aggregation with in-row sorts.
    */
  def encodeIdsBytes(docs: DataFrame, idCol: String, textCol: String,
                     rules: DataFrame): DataFrame = {
    val vocab = byteVocab(rules)
    val wordIds = encodedVocabBytes(docs, textCol, rules)
      .select(col("word"), posexplode(col("_syms")).as(Seq("_spos", "piece")))
      .join(broadcast(vocab), Seq("piece"), "left")
      .groupBy(col("word"))
      .agg(max(col("token_id").isNull.cast("long")).as("_oov"),
        sort_array(collect_list(struct(col("_spos"),
          coalesce(col("token_id"), lit(-1)).as("id")))).as("_ps"))
      .select(col("word"), col("_oov"),
        expr("transform(_ps, p -> p.id)").as("_wids"))
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("_wpos", "word")))
      .filter(byteWordOk)
      .join(wordIds.hint("shuffle_hash"), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        collect_list(struct(col("_wpos"), col("_wids"))).as("_ws"),
        sum(col("_oov")).as("n_oov"))
      // native assembly — see [[graft.functions.FlattenWordIds]]
      .select(col("doc_id"),
        graft.functions.TokenExprs.flattenWordIds(col("_ws"), 32).as("ids"),
        col("n_oov"))
      .withColumn("n_bpe", size(col("ids")).cast("long"))
  }

  /** Inverse of [[encodeIdsBytes]]: pieces are hex strings, so a
    * document decodes by joining its pieces in order into ONE hex
    * string (the space token contributes "20") and converting bytes →
    * UTF-8 once per row. An unknown id decodes to U+FFFD's bytes.
    */
  def decodeIdsBytes(encoded: DataFrame, idCol: String, idsCol: String,
                     rules: DataFrame): DataFrame = {
    val vocab = byteVocab(rules)
    encoded.select(col(idCol).as("doc_id"),
        posexplode(col(idsCol)).as(Seq("_pos", "token_id")))
      .join(broadcast(vocab), Seq("token_id"), "left")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("_pos"),
        coalesce(col("piece"), lit("EFBFBD")).as("p"))).as("_ps"))
      // native assembly — see [[graft.functions.ConcatSortedPieces]]
      .select(col("doc_id"),
        decode(unhex(
          graft.functions.TokenExprs.concatSortedPieces(col("_ps"))),
          "UTF-8").as("text_decoded"))
  }

  /** Byte-level [[exportArtifacts]]: merges.txt keeps the exact GPT-2
    * line shape (rank-ordered `lhs rhs`; symbols are hex strings, so
    * still space-free), the vocab parquet is [[byteVocab]].
    * [[importMerges]] reads it back unchanged. For a merges.txt a REAL
    * GPT-2 loader consumes (symbols in the bytes_to_unicode alphabet,
    * not hex), use [[exportMergesGpt2]].
    */
  def exportArtifactsBytes(rules: DataFrame, path: String): Unit = {
    rules.orderBy(col("rank"))
      .select(concat_ws(" ", col("lhs"), col("rhs")).as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$path/merges")
    byteVocab(rules).write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** GPT-2's `bytes_to_unicode` table (public: openai/gpt-2
    * encoder.py): the 188 "printable" bytes (33–126, 161–172,
    * 174–255) keep their own codepoint; the other 68 (controls,
    * space, DEL, 127–160, 173) shift to 256+n in byte order — which
    * is why a real merges.txt shows `Ġ` (U+0120 = 256+32) for the
    * space byte and `Ċ` for newline. A BIJECTION byte ↔ char, so the
    * hex↔GPT-2 renderings convert losslessly both ways.
    */
  private[graft] val Gpt2Alphabet: Array[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) new String(Character.toChars(b))
      else { val c = new String(Character.toChars(256 + n)); n += 1; c }
    }.toArray
  }
  private val gpt2Inverse: Map[Char, String] =
    Gpt2Alphabet.zipWithIndex
      .map { case (c, b) => c.charAt(0) -> f"$b%02X" }.toMap

  private def hexToGpt2(hex: String): String =
    hex.grouped(2).map(h => Gpt2Alphabet(Integer.parseInt(h, 16))).mkString

  /** Export the byte-level merge table as a merges.txt a REAL GPT-2
    * tokenizer loader consumes: each hex symbol rendered through
    * [[Gpt2Alphabet]] (so `é`'s UTF-8 bytes C3 A9 appear as `Ã©`,
    * exactly like the published GPT-2 artifact). The rule table is
    * vocabulary-sized by contract, so the driver-side rendering and
    * the single-file write are bounded (the [[exportArtifacts]]
    * `coalesce(1)` contract).
    */
  def exportMergesGpt2(rules: DataFrame, path: String): Unit = {
    val spark = rules.sparkSession
    val lines = rules.orderBy(col("rank"))
      .select(col("lhs"), col("rhs")).collect()
      .map(r => s"${hexToGpt2(r.getString(0))} ${hexToGpt2(r.getString(1))}")
    import spark.implicits._
    // the published artifact convention leads with a version header;
    // openai/gpt-2's encoder.py drops line 1 UNCONDITIONALLY
    // (split('\n')[1:-1]), so omitting it would silently lose the
    // rank-1 merge in the reference loader
    spark.sparkContext
      .parallelize("#version: 0.2" +: lines.toSeq, 1).toDF("value")
      .write.mode("overwrite").text(s"$path/merges")
  }

  /** Inverse of [[exportMergesGpt2]]: a GPT-2-alphabet merges.txt back
    * to the hex-symbol rule table `(rank, lhs, rhs, merged)` —
    * [[importMerges]]' format/rank contract, plus the per-character
    * alphabet inversion (fails loudly on a character outside the
    * bytes_to_unicode range — not a GPT-2 merges file). A leading
    * `#version:` header line is skipped (the published convention;
    * it must NOT reach the alphabet inversion — every header char is
    * inside `bytes_to_unicode`, so it would silently convert as a
    * bogus rank-1 rule and shift every real rank by one).
    */
  def importMergesGpt2(spark: SparkSession, path: String): DataFrame = {
    val imported = importMerges(spark, path, skipVersionHeader = true)
    val inv = spark.sparkContext.broadcast(gpt2Inverse)
    import spark.implicits._
    imported.select(col("rank"), col("lhs"), col("rhs"))
      .as[(Int, String, String)]
      .map { case (rank, l, r) =>
        val m = inv.value
        def conv(s: String) = s.map(c => m.getOrElse(c,
          throw new IllegalArgumentException(
            f"not a GPT-2 alphabet character: '$c' (U+${c.toInt}%04X)")))
          .mkString
        (rank, conv(l), conv(r))
      }
      .toDF("rank", "lhs", "rhs")
      .withColumn("merged", concat(col("lhs"), col("rhs")))
  }

  // ─────────────── byte-level DuckDB oracle builders ───────────────

  /** Byte-level `w0` + the SHARED merge rounds: segmentation =
    * uppercase hex of the UTF-8 blob split into pairs (verified equal
    * to Spark's hex(encode(...))), guard = non-empty only.
    */
  private def byteRoundsCte(nMerges: Int, trainWhere: String = "",
                            textSql: String = "text"): String = {
    val src =
      if (trainWhere.isEmpty) "FROM documents"
      else s"FROM documents WHERE $trainWhere"
    val w0 =
      s"""w0 AS (
        |  SELECT word,
        |         '<' || array_to_string(regexp_extract_all(hex(encode(word)), '..'), '><')
        |             || '>' AS s, n
        |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM (SELECT unnest(string_split($textSql, ' ')) AS word $src)
        |        WHERE word <> '' GROUP BY 1))""".stripMargin
    s"$w0,\n${mergeRounds(nMerges)}"
  }

  /** The `(rank, lhs, rhs, merged, n)` projection over `r1..rN` —
    * shared tail of [[oracleSql]] and [[byteOracleSql]].
    */
  private def rulesSelect(nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(r => s"SELECT $r AS rk, pr, cnt FROM r$r").mkString("\n  UNION ALL ")
    s"""SELECT CAST(rk AS INT) AS rank,
       |       split_part(pr, ' ', 1) AS lhs,
       |       split_part(pr, ' ', 2) AS rhs,
       |       split_part(pr, ' ', 1) || split_part(pr, ' ', 2) AS merged,
       |       CAST(cnt AS BIGINT) AS n
       |FROM ($union)""".stripMargin
  }

  /** The DuckDB replay of [[learnMergesBytes]]. */
  def byteOracleSql(nMerges: Int, trainWhere: String = "",
                    textSql: String = "text"): String =
    s"WITH ${byteRoundsCte(nMerges, trainWhere, textSql)}\n" +
      rulesSelect(nMerges)

  /** Sequential rank-order merge application `e1..eN` over an
    * `e0(word, s)` base — the encode half of both char and byte id
    * chains.
    */
  private def encRoundsCte(nMerges: Int): String =
    (1 to nMerges).map { r =>
      s"""e$r AS (SELECT word, replace(s,
         |          '<' || split_part(pr, ' ', 1) || '><' || split_part(pr, ' ', 2) || '>',
         |          '<' || split_part(pr, ' ', 1) || split_part(pr, ' ', 2) || '>') AS s
         |        FROM e${r - 1}, r$r)""".stripMargin
    }.mkString(",\n")

  /** The DuckDB replay of [[encodeTokenCountsBytes]]: train on the
    * `trainWhere` slice, byte-segment the eval stream's distinct
    * words, apply the merges sequentially, aggregate per doc. `n_oov`
    * is the structural 0 — the oracle PREDICTS it; the Spark side's
    * honest vocab-join count must agree.
    */
  def byteEncodeOracleSql(nMerges: Int, trainWhere: String,
                          tokCte: String,
                          textSql: String = "text"): String = {
    val ctes =
      s"""tok AS ($tokCte),
         |tokg AS (SELECT doc_id, word FROM tok WHERE word <> ''),
         |ew AS (SELECT DISTINCT word FROM tokg),
         |e0 AS (SELECT word,
         |              '<' || array_to_string(regexp_extract_all(hex(encode(word)), '..'), '><')
         |                  || '>' AS s
         |       FROM ew),
         |${encRoundsCte(nMerges)},
         |v AS (SELECT word,
         |             CAST(len(string_split(trim(s, '<>'), '><')) AS BIGINT) AS nsym
         |      FROM e$nMerges)""".stripMargin
    val tail =
      """j AS (SELECT t.doc_id, t.word, v.nsym
        |      FROM tokg t JOIN v USING (word))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(strlen(word)) AS BIGINT) AS n_bytes,
        |       CAST(SUM(nsym) AS BIGINT) AS n_bpe,
        |       CAST(0 AS BIGINT) AS n_oov,
        |       ROUND(CAST(SUM(strlen(word)) AS DOUBLE) / SUM(nsym), 4)
        |         AS compression
        |FROM j GROUP BY 1""".stripMargin
    s"WITH ${byteRoundsCte(nMerges, trainWhere, textSql)},\n$ctes,\n$tail"
  }

  /** The byte-level token-id vocabulary CTE `bvoc` (requires
    * `r1..rN`): the fixed 256-byte base + merges at 255 + rank,
    * min-id dedup — the exact [[byteVocab]] construction.
    */
  private def byteVocabCte(nMerges: Int): String = {
    val ranked = (1 to nMerges)
      .map(r => s"SELECT $r AS rk, pr FROM r$r").mkString("\n  UNION ALL ")
    s"""bvoc AS (SELECT piece, CAST(MIN(id) AS INT) AS token_id FROM (
       |  SELECT upper(lpad(to_hex(i), 2, '0')) AS piece, CAST(i AS INT) AS id
       |  FROM range(256) t(i)
       |  UNION ALL
       |  SELECT split_part(pr, ' ', 1) || split_part(pr, ' ', 2) AS piece,
       |         CAST(rk + 255 AS INT) AS id
       |  FROM ($ranked))
       |GROUP BY 1)""".stripMargin
  }

  /** The DuckDB replay of [[byteVocab]] over a `trainWhere`-sliced
    * training corpus.
    */
  def byteVocabOracleSql(nMerges: Int, trainWhere: String,
                         textSql: String = "text"): String =
    s"WITH ${byteRoundsCte(nMerges, trainWhere, textSql)},\n" +
      s"${byteVocabCte(nMerges)}\nSELECT piece, token_id FROM bvoc"

  /** The DuckDB replay of the byte artifact roundtrip: the trained
    * rules (rank order = merges.txt line order) joined with their
    * vocab ids — a drop, reorder, or id drift anywhere in the
    * export/import path flips the row red.
    */
  def byteArtifactsOracleSql(nMerges: Int, trainWhere: String,
                             textSql: String = "text"): String =
    s"WITH ${byteRoundsCte(nMerges, trainWhere, textSql)},\n" +
      s"${byteVocabCte(nMerges)},\nrl AS (\n${rulesSelect(nMerges)}\n)\n" +
      """SELECT rl.rank, rl.lhs, rl.rhs, rl.merged, b.token_id
        |FROM rl JOIN bvoc b ON rl.merged = b.piece""".stripMargin

  /** The DuckDB replay of [[encodeIdsBytes]]' per-document economics +
    * the roundtrip prediction — the byte twin of [[idsOracleSql]].
    * `ids_fp = Σ id·pos` over the flat 1-based stream; the space token
    * is id 32 here (byte 0x20), so its positions contribute
    * explicitly: the space before word k (k ≥ 2) sits at flat position
    * `prev + k − 1`. `n_oov` and `roundtrip_ok` are the structural
    * predictions (0 and 1); the Spark side computes both honestly.
    */
  def byteIdsOracleSql(nMerges: Int, trainWhere: String,
                       tokPosCte: String,
                       textSql: String = "text"): String = {
    val ctes =
      s"""tokp AS ($tokPosCte),
         |tokg AS (SELECT doc_id, wpos, word FROM tokp WHERE word <> ''),
         |ew AS (SELECT DISTINCT word FROM tokg),
         |e0 AS (SELECT word,
         |              '<' || array_to_string(regexp_extract_all(hex(encode(word)), '..'), '><')
         |                  || '>' AS s
         |       FROM ew),
         |${encRoundsCte(nMerges)},
         |wp AS (SELECT word, unnest(list_transform(range(1, len(t) + 1),
         |              i -> struct_pack(spos := i, piece := t[i]))) AS u
         |       FROM (SELECT word, string_split(trim(s, '<>'), '><') AS t
         |             FROM e$nMerges)),
         |wps AS (SELECT word, u.spos AS spos, u.piece AS piece FROM wp),
         |wid AS (SELECT word, spos, COALESCE(token_id, -1) AS id
         |        FROM wps LEFT JOIN bvoc USING (piece)),
         |wids AS (SELECT word, list(id ORDER BY spos) AS ids,
         |                CAST(COUNT(*) AS BIGINT) AS nsym
         |         FROM wid GROUP BY 1),
         |ds AS (SELECT t.doc_id, t.wpos, w.ids, w.nsym,
         |              ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY t.wpos) AS k,
         |              COALESCE(SUM(w.nsym) OVER (PARTITION BY t.doc_id ORDER BY t.wpos
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
         |       FROM tokg t JOIN wids w USING (word))""".stripMargin
    val tail =
      """fp AS (SELECT doc_id, nsym,
        |              list_sum(list_transform(range(1, len(ids) + 1),
        |                j -> CAST(ids[j] AS BIGINT) * (prev + k - 1 + j)))
        |              + CASE WHEN k > 1
        |                     THEN 32 * CAST(prev + k - 1 AS BIGINT)
        |                     ELSE 0 END AS contrib
        |       FROM ds)
        |SELECT doc_id,
        |       CAST(SUM(nsym) + COUNT(*) - 1 AS BIGINT) AS n_bpe,
        |       CAST(0 AS BIGINT) AS n_oov,
        |       CAST(SUM(contrib) AS BIGINT) AS ids_fp,
        |       CAST(1 AS INT) AS roundtrip_ok
        |FROM fp GROUP BY 1""".stripMargin
    s"WITH ${byteRoundsCte(nMerges, trainWhere, textSql)},\n" +
      s"${byteVocabCte(nMerges)},\n$ctes,\n$tail"
  }
}
