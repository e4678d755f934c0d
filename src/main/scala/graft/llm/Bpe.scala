package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
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
  * raw text. Each round is (a) one vocabulary-sized aggregation to
  * count adjacent symbol pairs, (b) a `LIMIT 1` argmax
  * (TakeOrderedAndProject — no global sort), (c) a narrow codegen'd
  * string-replace projection applying the winning merge. The driver
  * holds only the `nMerges` winning rules — one 1-row collect per
  * round, never a vocabulary. Tokenizing the corpus afterwards is
  * the same economics: per-word symbol counts come off the trained
  * word table, and the corpus word stream just equi-joins it.
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

  /** The guard both sides apply to the raw word stream. */
  private def wordOk = col("word") =!= "" &&
    !col("word").contains("<") && !col("word").contains(">")

  private val rulesSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** Run the training loop: one corpus pass to the word-frequency
    * table, then `nMerges` rounds. Returns the winning rules and the
    * final `(word, s, n)` table with every merge applied.
    */
  private def train(docs: DataFrame, textCol: String,
                    nMerges: Int): (Seq[Row], DataFrame) = {
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

  /** Train once, share twice: the merge-rule table AND the fully-
    * merged `(word, s, n)` vocabulary as DataFrames (the words frame
    * localCheckpointed so both consumers — and a memoizing caller —
    * reuse the materialized result instead of re-training).
    */
  def trainShared(docs: DataFrame, textCol: String,
                  nMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val (rules, words) = train(docs, textCol, nMerges)
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
  def learnMerges(docs: DataFrame, textCol: String,
                  nMerges: Int): DataFrame =
    trainShared(docs, textCol, nMerges)._1

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

  /** Shared CTE chain `w0 … w<nMerges>` (each `(word, s, n)`) with the
    * per-round pair-count / argmax / replace, in lockstep with the
    * Scala loop.
    */
  private def roundsCte(nMerges: Int): String = {
    val w0 =
      """w0 AS (
        |  SELECT word,
        |         '<' || array_to_string([c FOR c IN string_split(word, '')], '><')
        |             || '>' AS s, n
        |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |        WHERE word <> '' AND NOT contains(word, '<')
        |          AND NOT contains(word, '>') GROUP BY 1))""".stripMargin
    val rounds = (1 to nMerges).map { r =>
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
    s"$w0,\n$rounds"
  }

  /** The DuckDB replay of [[learnMerges]]. Assumes the corpus yields
    * at least `nMerges` mergeable pairs (true for any real text
    * corpus; the Scala side stops early instead).
    */
  def oracleSql(nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(r => s"SELECT $r AS rk, pr, cnt FROM r$r").mkString("\n  UNION ALL ")
    // NOTE: the CTE chain is already margin-stripped — a stripMargin
    // over the assembled string would re-strip its `|| '>'`
    // continuation lines (blanks + `|` prefix) and corrupt the SQL,
    // so only the literal tail goes through stripMargin
    val tail =
      s"""SELECT CAST(rk AS INT) AS rank,
         |       split_part(pr, ' ', 1) AS lhs,
         |       split_part(pr, ' ', 2) AS rhs,
         |       split_part(pr, ' ', 1) || split_part(pr, ' ', 2) AS merged,
         |       CAST(cnt AS BIGINT) AS n
         |FROM ($union)""".stripMargin
    s"WITH ${roundsCte(nMerges)}\n$tail"
  }

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
}
