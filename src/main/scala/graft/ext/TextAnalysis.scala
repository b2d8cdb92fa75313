package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: normalization,
  * language ID (stopword heuristic), quality scoring, token counting and
  * document fingerprinting.
  *
  * Everything here is pure Catalyst expression composition (built-ins plus
  * the one-pass codegen'd kernels in [[graft.functions]], zero UDFs) —
  * per-document, embarrassingly parallel, no shuffle: at 100 TB these run
  * at scan speed and the only exchange is whatever aggregation the caller
  * adds downstream.
  *
  * Determinism matters doubly: each operator is mirrored by a DuckDB oracle
  * (ExtQueries), so all arithmetic is integer/string-based or explicit
  * double division — identical bit-for-bit across engines.
  */
object TextAnalysis {

  /** Whitespace-collapsed, lower-cased, trimmed text — the canonical form
    * used by dedup and fingerprinting.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Stopword-list hit count for one language — one codegen'd pass
    * ([[graft.functions.StopwordCount]]; the `size(filter(isin))` HOF chain
    * it replaces is interpreter-only and rebuilds the filtered array).
    */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    graft.functions.GraftFunctions.stopwordCount(toks, stopwords)

  /** Tiny deterministic language-ID heuristic: argmax of per-language
    * stopword hits (ties broken in fixed language order). Real lang-ID would
    * use char n-gram profiles; the *shape* (per-doc scoring, no shuffle) is
    * what carries to scale.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est")
  )

  /** Deterministic char-trigram profile for a language: the distinct
    * 3-shingles of its space-joined stopword list (same shingling kernel as
    * the dedup tier, so Spark and the generated oracle share the constants).
    */
  def ngramProfile(words: Seq[String], k: Int = 3): Seq[String] = {
    val joined = words.mkString(" ")
    (0 to joined.length - k).map(i => joined.substring(i, i + k)).distinct
  }

  /** Char-n-gram language ID: per language, how many of the document's
    * distinct trigrams appear in that language's profile — the n-gram
    * heuristic counterpart to the stopword scores, same argmax/`langGuess`
    * downstream. `trigrams` must be the distinct-shingle column
    * ([[graft.ext.Dedup.shinglesOfNorm]] with k=3).
    */
  def ngramLangScores(trigrams: Column): Seq[(String, Column)] =
    LangStopwords.map { case (lang, words) =>
      lang -> graft.functions.GraftFunctions.stopwordCount(trigrams, ngramProfile(words))
    }

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    LangStopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }
  }

  def langGuess(scores: Seq[(String, Column)]): Column = {
    // argmax with first-wins tie-break, as a CASE chain: a language wins if
    // its score is >= every other score.
    val guesses = scores.map { case (lang, s) =>
      val others = scores.collect { case (l2, s2) if l2 != lang => s2 }
      (others.foldLeft(lit(true))((acc, o) => acc && s >= o), lang)
    }
    guesses.foldRight(lit("und")) { case ((cond, lang), els) => when(cond, lang).otherwise(els) }
  }

  /** Quality-score components: token count, mean token length, punctuation
    * ratio, stopword ratio; composite in [0,1]. All divisions are explicit
    * double casts (mirrors the oracle exactly).
    */
  def tokenCount(text: Column): Column = size(tokens(text))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  def qualityScore(nTok: Column, punct: Column, stopHits: Column, nChars: Column): Column = {
    val tokD = nTok.cast("double")
    val lengthScore = least(lit(1.0), tokD / lit(100.0))
    val punctPenalty = lit(1.0) - least(lit(1.0), punct.cast("double") / greatest(tokD, lit(1.0)))
    val stopScore = least(lit(1.0), lit(4.0) * stopHits.cast("double") / greatest(tokD, lit(1.0)))
    round(lit(0.3) * lengthScore + lit(0.4) * punctPenalty + lit(0.3) * stopScore, 4)
  }

  /** "BPE-ish" subword segmentation: runs of letters, runs of digits, or a
    * single other non-space char. Counted per document.
    */
  val BpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit(BpeTokenPattern), lit(0)))

  /** Polynomial rolling hash over an ALREADY-NORMALIZED column's codepoints:
    * `acc = (acc * 31 + code) mod 1e9+7` — integer-exact in any engine, one
    * codegen'd pass ([[graft.functions.PolyRollingHash]]; the per-character
    * `ascii(substr(i,1))` HOF chain it replaces was O(len) interpreted
    * allocations per doc).
    */
  def rollingHashOfNorm(t: Column): Column =
    graft.functions.GraftFunctions.polyRollingHash(t)

  /** Convenience form over raw text — hot paths should project [[normalize]]
    * first and call [[rollingHashOfNorm]] on the column.
    */
  def rollingHash(text: Column): Column = rollingHashOfNorm(normalize(text))

  /** 128-bit content fingerprint (md5 of the normalized text) — the
    * cheap exact-dup key.
    */
  def md5Fingerprint(text: Column): Column = md5(normalize(text))

  // ---------------- PII redaction ----------------

  /** Shared PII patterns, emitted VERBATIM into the DuckDB oracle —
    * restricted to the regex subset where Java's engine and RE2 agree (no
    * lookaround, no backreferences). Deliberately simple: a production
    * scrubber layers more patterns, but each stays a codegen'd
    * `regexp_replace`, so the shape — per-row, scan-speed, zero shuffle —
    * is what carries to 100 TB.
    */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\+[0-9][0-9 -]{7,}[0-9]"
  val Ipv4Re: String = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Typed-token PII scrub: emails → `<EMAIL>`, then `+`-prefixed phone
    * runs → `<PHONE>`, then dotted quads → `<IP>`. Order matters — emails
    * contain dots and digits, so they must leave the text first.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // ---------------- repetition metrics ----------------

  /** Gopher-style intra-document repetition metrics: duplicate-word
    * fraction and the share of the single most frequent word bigram —
    * the filters that catch boilerplate/spam documents whose token counts
    * look normal. Fractions are floor-scaled (×10000) with the division
    * done in double exactly as the oracle writes it.
    *
    * Scale shape: the per-doc word stats are map-side; the top-bigram pass
    * is explode → two partial-aggregated shuffles keyed by (doc, bigram)
    * then doc — never a per-document map in executor memory, so a
    * pathological 1 GB document costs its share of rows, not a hash map.
    * Bigrams come from the multiplicity-preserving codegen'd kernel
    * ([[graft.functions.GraftFunctions.wordNgramsAll]]), not the
    * interpreter-only HOF chain.
    */
  def repetitionStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), tokens(col(textCol)).as("tk"))
    val words = base.select(col(idCol),
      size(col("tk")).as("n_words"),
      size(array_distinct(col("tk"))).as("n_distinct"))
    val top = base
      .select(col(idCol),
        explode(graft.functions.GraftFunctions.wordNgramsAll(col("tk"), 2)).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_bigram_n"))
    words.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("n_distinct"),
        floor((col("n_words") - col("n_distinct")).cast("double")
            / col("n_words") * 10000).cast("long").as("dup_word_frac_4"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        floor(coalesce(col("top_bigram_n"), lit(0L)).cast("double")
            / greatest(col("n_words") - 1, lit(1)) * 10000)
          .cast("long").as("top_bigram_frac_4"))
  }

  // ---------------- TF-IDF keyword extraction ----------------

  /** Per-document top-`k` keyword extraction by TF-IDF.
    *
    * Cross-engine exactness dictates two deviations from the textbook
    * formula, both order-preserving:
    *   - the idf factor is the RATIONAL `n_docs / df` instead of
    *     `log(n_docs / df)` — `log` is libm-dependent and not bit-identical
    *     across engines, while one double division of exact integers is
    *     IEEE-defined on both. The score is floor-scaled (×10000) like every
    *     other fraction in this file;
    *   - the rank itself never touches a double: `(tf desc, df asc, term
    *     asc)` is integer/string-only, so the top-k SET is deterministic
    *     even if two scores are within an ulp.
    *
    * Scale shape: the token stream aggregates on (doc, term) with map-side
    * combine — the one corpus-sized shuffle. Per-doc lengths and the term
    * dictionary are second-level aggregates orders of magnitude smaller
    * (AQE broadcasts them back), and `n_docs` is a 1-row broadcast. The
    * final window repartitions by doc only the (doc, term) aggregate, never
    * raw tokens.
    */
  def tfidfKeywords(
      docs: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf_n"))
    val docLen = tf.groupBy(col(idCol)).agg(sum("tf_n").as("n_tok"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_n"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf_n").desc, col("df_n").asc, col("term").asc)
    tf.join(docLen, idCol).join(docFreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("score_4",
        floor(col("tf_n") * lit(10000.0) * col("n_docs")
            / (col("n_tok") * col("df_n"))).cast("long"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf_n"), col("df_n"),
        col("score_4"), col("rnk"))
  }

  /** Gopher-style hard quality rules (Rae et al. 2021 §A1.1, adapted to the
    * metrics this corpus can express): per-document word count, mean word
    * length, digit fraction and English-stopword hits, plus the composite
    * `keep` flag a curation pipeline filters on. Every metric is
    * integer-exact (`div` rationals — mean word length derives from the
    * normalized length, `len - (n_words - 1)` spaces, no per-token pass),
    * so the flag is engine-exact, not ulp-dependent.
    *
    * Scale shape: per-row, shuffle-free, all codegen'd (regexp_replace +
    * the StopwordCount kernel — no higher-order functions).
    */
  def gopherRules(
      docs: DataFrame,
      minWords: Long = 5L,
      maxWords: Long = 100000L,
      minMeanWl2: Long = 150L,
      maxMeanWl2: Long = 1000L,
      maxDigitFrac4: Long = 2000L,
      minStopHits: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val norm = normalize(col(textCol))
    val enStops = LangStopwords.toMap.apply("en")
    docs
      .select(col(idCol), norm.as("t"), tokens(col(textCol)).as("tk"))
      .select(col(idCol), col("t"), col("tk"),
        size(col("tk")).cast("long").as("n_words"),
        (length(col("t")) - length(regexp_replace(col("t"), "[0-9]", "")))
          .cast("long").as("digits"))
      .select(col(idCol), col("n_words"),
        expr("(100 * (length(t) - (n_words - 1))) div n_words").as("mean_wl_2"),
        expr("(10000 * digits) div greatest(length(t), 1)").as("digit_frac_4"),
        stopwordHits(col("tk"), enStops).cast("long").as("stop_hits"))
      .withColumn("keep",
        (col("n_words").between(minWords, maxWords) &&
          col("mean_wl_2").between(minMeanWl2, maxMeanWl2) &&
          col("digit_frac_4") <= maxDigitFrac4 &&
          col("stop_hits") >= minStopHits).cast("int"))
  }

  /** Per-document token-commonness score — the integer-exact stand-in for a
    * unigram-LM perplexity filter (a doc whose tokens are corpus-rare
    * scores low; boilerplate made of the corpus's most common tokens scores
    * high). For each document: Σ_tokens count(token) over the whole corpus,
    * scaled to parts-per-million of the maximum possible (`n_tok · N`):
    * `score_ppm = (1_000_000 · Σcnt) div (n_tok · N)` — all-BIGINT rational
    * arithmetic, so both engines produce identical integers (a real log-prob
    * would be transcendental and only ulp-comparable). Headroom: the
    * numerator is ≤ 1e6 · n_tok · N; with 64-bit longs that bounds
    * `n_tok · N` at ~9e12 — beyond that, swap the literals for DECIMAL(38)
    * columns (the shape is unchanged).
    *
    * Scale shape: one corpus-sized shuffle on (doc, term) with map-side
    * combine; the term-count dictionary is a vocabulary-sized second
    * aggregate (AQE broadcasts it back); `N` is a 1-row broadcast.
    */
  def commonnessScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf_n"))
    val termCount = tf.groupBy("term").agg(sum("tf_n").as("cnt"))
    val total = termCount.agg(sum("cnt").as("n_total"))
    tf.join(termCount, "term")
      .groupBy(col(idCol))
      .agg(sum("tf_n").as("n_tok"), sum(col("tf_n") * col("cnt")).as("cnt_sum"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tok"),
        expr("(1000000 * cnt_sum) div (n_tok * n_total)").as("score_ppm"))
  }

  /** BM25 relevance of every document against a fixed query-term set — the
    * search-engine scoring kernel (Robertson k1/b form with Lucene's
    * `ln(1 + (N−df+0.5)/(df+0.5))` idf). Published rounded 4 dp; every
    * INPUT to the float formula (tf, df, dl, N, Σdl) is an exact integer
    * on both engines, so the only cross-engine surface is the identical
    * per-row double expression plus a ≤|terms|-element per-doc sum.
    *
    * Scale shape: one corpus-sized exploded aggregation for document
    * lengths (map-side combined), one for the query-term tf rows — the tf
    * relation is |docs|×|terms| at worst and carries the whole rest of the
    * query; df and the (N, Σdl) anchors are model-sized broadcasts. The
    * dl join keys on the id — at 100 TB both sides of that join come from
    * the SAME exploded scan, so a shared bucketing on the id removes its
    * exchange entirely.
    */
  def bm25Score(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val anchors = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(anchors))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("w",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 4).as("bm25"), count(lit(1)).as("n_terms_hit"))
  }

  /** Per-document average bigram conditional commonness — the bigram-LM
    * sibling of [[commonnessScore]], kept integer-exact the same way: each
    * bigram occurrence scores `(10⁶ · c(w₁w₂)) div c(w₁·)` (corpus
    * conditional probability in floor-ppm — the rational stand-in for
    * `−log p(w₂|w₁)` surprisal, monotone in it per bigram), and the doc
    * aggregates the floor-mean. A doc of formulaic adjacent pairs scores
    * high; novel transitions score low.
    *
    * Scale shape: one exploded bigram aggregation for c₂ (map-side
    * combined), a vocabulary-sized rollup for c₁, then the per-doc score
    * joins the doc's bigram stream against the two vocab-sized counts
    * (AQE broadcasts them) and re-aggregates by doc — two corpus-sized
    * shuffles total, both carrying combined partials.
    */
  def bigramCondCommonness(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bi = docs.select(col(idCol),
      explode(graft.functions.GraftFunctions.wordNgramsAll(tokens(col(textCol)), 2)).as("bg"))
    val c2 = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = c2.withColumn("w1", split(col("bg"), " ").getItem(0))
      .groupBy("w1").agg(sum(col("c2")).as("c1"))
    bi.join(c2, "bg")
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(c1, "w1")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("(1000000 * c2) div c1")).as("ppm_sum"))
      .select(col(idCol), col("n_bigrams"),
        expr("ppm_sum div n_bigrams").as("avg_cond_ppm"))
  }

  /** Corpus bigram collocations by LIFT — the rational form of PMI
    * (`lift = P(ab) / (P(a)·P(b))`, PMI = log lift), kept integer-exact:
    * `lift_4 = (10000 · N_bi · c_ab) div (c_a · c_b)` where `c_a`/`c_b` are
    * corpus unigram counts and `N_bi` the total bigram count. Bigrams below
    * `minCount` are noise-filtered (the standard collocation-mining guard —
    * a 2-occurrence pair of rare words otherwise tops any lift ranking).
    * Ordering and tie-break (`lift desc, ngram asc`) are integer/string
    * only. The phrase-mining / tokenizer-merge-candidate shape.
    *
    * Scale shape: two corpus-sized exploded aggregations (unigrams,
    * bigrams) with map-side combine; the joins run on the vocabulary-sized
    * aggregates (AQE broadcast), and the top-N is `TakeOrderedAndProject`,
    * never a full sort.
    */
  def collocations(
      docs: DataFrame,
      minCount: Long = 5L,
      topN: Int = 100,
      textCol: String = "text"): DataFrame = {
    val tk = docs.select(tokens(col(textCol)).as("tk"))
    val uni = tk.select(explode(col("tk")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val bi = tk
      .select(explode(
        graft.functions.GraftFunctions.wordNgramsAll(col("tk"), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("c_ab"))
    val nBi = bi.agg(sum("c_ab").as("n_bi"))
    bi.filter(col("c_ab") >= minCount)
      .withColumn("w1", split(col("ngram"), " ").getItem(0))
      .withColumn("w2", split(col("ngram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(nBi))
      .select(col("ngram"), col("c_ab"), col("c_a"), col("c_b"),
        expr("(10000 * n_bi * c_ab) div (c_a * c_b)").as("lift_4"))
      .orderBy(col("lift_4").desc, col("ngram").asc)
      .limit(topN)
  }

  // ---------------- vocabulary induction ----------------

  /** Corpus-level n-gram vocabulary: the `topN` word n-grams by global
    * count with a deterministic tie-break (`count desc, ngram asc`) — the
    * shape of one BPE merge round / tokenizer-vocab induction over a
    * training corpus.
    *
    * Scale shape: explode → one partial-aggregated shuffle on the n-gram →
    * `TakeOrderedAndProject` (per-partition partial top-N, single-reduce
    * merge) — the global "sort" never shuffles more than `topN` rows per
    * partition. N-grams come from the multiplicity-preserving codegen'd
    * kernel, as in [[repetitionStats]].
    */
  def vocabNgrams(
      docs: DataFrame,
      n: Int = 2,
      topN: Int = 200,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(
        graft.functions.GraftFunctions.wordNgramsAll(tokens(col(textCol)), n))
        .as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(topN)

  /** Per-document n-gram novelty vs the corpus — the boilerplate signal:
    * `shared_ppm` = the ppm fraction of the document's DISTINCT word
    * n-grams whose document frequency is ≥ 2 (i.e. shared with at least
    * one other document). High values mark templated/boilerplate docs a
    * curation pass down-weights; low values mark novel text.
    *
    * Scale shape: distinct n-grams per doc come from the one-pass codegen'd
    * kernel (no intermediate all-grams array); document frequency is a
    * `count over (partition by ngram)` window, NOT a groupBy-plus-self-join
    * — the join formulation scans and explodes the corpus TWICE (once to
    * build the df table, once for the probe side), while the window reads
    * it once and shuffles each occurrence once. One exchange on the n-gram,
    * one on the doc id; nothing quadratic, no corpus-wide broadcast.
    * Documents with fewer than `n` tokens have no n-grams and drop out
    * (the oracle mirrors that).
    */
  def ngramNovelty(
      docs: DataFrame,
      n: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val byNgram = org.apache.spark.sql.expressions.Window.partitionBy("ngram")
    docs.select(col(idCol),
      explode(graft.functions.GraftFunctions.wordNgrams(tokens(col(textCol)), n))
        .as("ngram"))
      .withColumn("df_n", count(lit(1)).over(byNgram))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df_n") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_ppm", expr("1000000 * n_shared div n_ngrams"))
  }

  /** Per-document out-of-vocabulary rate against the corpus' own induced
    * top-`topN` unigram vocabulary (ties broken `count desc, term asc` —
    * the [[vocabNgrams]] contract): `oov_ppm` = ppm of the document's
    * non-empty tokens outside the vocabulary. The tokenizer-coverage
    * check a BPE/vocab-size decision reads.
    *
    * Scale shape: the vocabulary is MODEL-sized (`topN` rows, induced via
    * partial top-N + single-reduce merge) and explicitly `broadcast` into
    * the membership join, so the per-token pass is a scan-speed broadcast
    * hash join — the only data-sized shuffle is the final per-doc
    * aggregation on the id. Documents with zero non-empty tokens drop out.
    */
  def oovRate(
      docs: DataFrame,
      topN: Int = 200,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tk = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val vocab = tk.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(topN)
      .select(col("term"), lit(1).as("__in_vocab"))
    tk.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("1000000 * n_oov div n_tokens"))
  }

  /** Padding-waste report: documents bucketed by CEILING to the next
    * `bucketTokens`-token batch length (the dynamic-batching buckets a
    * trainer pads to); per bucket, the document count, actual token mass,
    * padded token mass (`n_docs × bucket × bucketTokens`) and the integer
    * waste in ppm. One partial-aggregated shuffle on the bucket key;
    * output is model-sized (≤ max_tokens / bucketTokens rows). All
    * arithmetic integer — bit-exact cross-engine.
    */
  def paddingWaste(
      docs: DataFrame,
      textCol: String = "text",
      bucketTokens: Int = 64): DataFrame = {
    require(bucketTokens > 0, "bucketTokens must be positive")
    docs
      .select(tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("bucket", expr(s"(n_tokens + ${bucketTokens - 1}) div $bucketTokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("actual_tokens"))
      .withColumn("padded_tokens", expr(s"n_docs * bucket * $bucketTokens"))
      .withColumn("waste_ppm",
        expr("1000000 * (padded_tokens - actual_tokens) div greatest(padded_tokens, 1)"))
  }

  /** Token-frequency spectrum: distinct-token and occurrence counts per
    * log₂-frequency bucket. The bucket is ⌊log₂ freq⌋ computed as the
    * binary DIGIT COUNT (`length(bin(freq)) − 1`) — pure integer, so a
    * frequency sitting exactly on a power of two cannot be flipped across
    * buckets by a libm `log2` ulp on either engine. Bucket 0 is the hapax
    * legomena (freq 1) — the long tail a tokenizer must absorb; the top
    * buckets show head concentration (the Zipf readout). One
    * vocabulary-sized shuffle with map-side partials; the spectrum itself
    * is ≤ 64 rows.
    */
  def freqSpectrum(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("bucket", (length(bin(col("freq"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_distinct_tokens"), sum("freq").as("occurrences"))

  /** Convenience: full per-document text profile. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val scores = langScores(text)
    docs
      .withColumn("n_tokens", tokenCount(text))
      .withColumn("n_bpe_tokens", bpeTokenCount(text))
      .withColumn("punct", punctCount(text))
      .withColumns(scores.map { case (l, c) => s"${l}_hits" -> c }.toMap)
      .withColumn("lang_guess", langGuess(scores.map { case (l, _) => l -> col(s"${l}_hits") }))
      .withColumn("quality",
        qualityScore(col("n_tokens"), col("punct"), col("en_hits"), col("n_chars")))
      .withColumn("fingerprint", md5Fingerprint(text))
      .withColumn("rolling_hash", rollingHash(text))
  }
}
