package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Caches.Registered
import graft.functions.Hashing

/** Text-analysis operators for LLM-pipeline data curation over the
  * `documents` table: tokenization, quality scoring, language-ID heuristic,
  * and document fingerprinting. All pure Catalyst expressions (codegen'd);
  * the string hash is the native PolyHashExpr.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Language marker words for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** [[tokens]] of the whitespace-TRIMMED text: split(\s+) keeps a
    * phantom "" token per leading/trailing whitespace run, and `trim()`
    * strips SPACES only — a trailing newline (near-universal in web
    * text) survives it — so the trim here is a regexp over \s.
    */
  def trimmedTokens(text: Column): Column =
    tokens(regexp_replace(text, "^\\s+|\\s+$", ""))

  /** BPE-ish subword segment count: alnum runs. */
  def subwordCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+[0-9]*"))

  /** GPT-2-style pre-tokenization count: letter runs, digit runs, and
    * punctuation runs, each with an optional leading space — the regex
    * shape of the BPE pre-tokenizer without the learned merges (an upper
    * bound on merged-BPE token count, the budget number a training
    * pipeline bills by). The three classes are disjoint and space can only
    * be consumed as the optional prefix, so the segmentation is unambiguous
    * — identical under leftmost-first (Java) and RE2 (DuckDB) alternation.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0)))

  def countIn(ws: Column, words: Seq[String]): Column =
    size(filter(ws, w => array_contains(array(words.map(lit): _*), w)))

  /** One-pass native stats (len_sum + stopword/marker hits) — see
    * [[graft.functions.TokenStatsExpr]]. The HOF spellings above re-walk
    * the array once per word list with interpreted lambdas; this stays
    * inside whole-stage codegen, and repeated getField calls on it
    * collapse to one evaluation via subexpression elimination.
    */
  def tokenStats(ws: Column): Column = graft.functions.TokenStatsExpr.column(ws)

  /** Stopword fraction of tokens. */
  def stopwordRatio(ws: Column): Column =
    tokenStats(ws).getField("stop_hits").cast("double") / size(ws)

  /** Mean token length. */
  def avgWordLen(ws: Column): Column =
    tokenStats(ws).getField("len_sum").cast("double") / size(ws)

  /** Composite quality score ∈ [0,1]-ish: stopword mass + length saturation
    * + word-shape. Deterministic, cross-engine arithmetic.
    */
  def qualityScore(ws: Column): Column =
    lit(0.5) * stopwordRatio(ws) +
      lit(0.3) * least(lit(1.0), size(ws).cast("double") / 100.0) +
      lit(0.2) * (avgWordLen(ws) / 10.0)

  /** Gopher-style repetition signals — a narrow map with ZERO shuffle (the
    * per-doc alternative is an explode + two groupBys, which at 100 TB
    * shuffles every token twice).
    * distinct_ratio: |set(ws)| / |ws| (low → repetitive boilerplate);
    * top_share: the most frequent token's share of the doc (catches
    * "batch batch batch" spam). One native O(n) hash-counting pass per row
    * ([[graft.functions.RepetitionStatsExpr]]); the HOF spelling
    * (`array_distinct` + `transform(filter(...))`) is O(distinct·n) with
    * per-element interpreted lambdas — ~10× slower corpus-wide.
    */
  def repStats(ws: Column): Column = graft.functions.RepetitionStatsExpr.column(ws)

  def distinctRatio(ws: Column): Column = repStats(ws).getField("distinct_ratio")

  def topTokenShare(ws: Column): Column = repStats(ws).getField("top_share")

  /** Marker-word hit count for one language. */
  def langHits(ws: Column, lang: String): Column =
    tokenStats(ws).getField(lang)

  /** Deterministic argmax over the four marker scores (ties: en>de>es>fr). */
  def predictedLang(ws: Column): Column = {
    val en = langHits(ws, "en"); val de = langHits(ws, "de")
    val es = langHits(ws, "es"); val fr = langHits(ws, "fr")
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** PII scrubbing for training corpora: emails, IPv4 literals, and
    * NANP-style phone fragments, matched with dialect-portable regexes
    * (identical under Java regex and RE2) and replaced with typed
    * redaction tags. Pure codegen'd string expressions — a narrow map
    * with zero shuffle, the only shape that survives a 100 TB scrub.
    * Replacement order matters: emails first (their local parts can
    * contain dots and digits), then IPv4, then phones; the tags
    * themselves are letters-only so later patterns never re-match them.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}(?:\\.[0-9]{1,3}){3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
        lit(Ipv4Re), lit("[IP]")),
      lit(PhoneRe), lit("[PHONE]"))

  /** Per-kind PII hit counts on the unredacted text (audit trail columns —
    * a scrub that cannot report what it removed is not reviewable).
    */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast("int").as("n_emails"),
    regexp_count(text, lit(Ipv4Re)).cast("int").as("n_ips"),
    regexp_count(text, lit(PhoneRe)).cast("int").as("n_phones"))

  /** MOJIBAKE repair (the ftfy core): the commonest UTF-8-read-as-Latin-1
    * double-encodings, fixed by LITERAL sequential replacement — web
    * corpora are full of `cafÃ©` / `donâ€™t`, and an LM trained on them
    * learns the corruption as vocabulary. The pair list is ordered and
    * applied in order on BOTH engines (patterns don't overlap, but the
    * contract is explicit); every pattern is BMP-only so JVM char counts
    * equal DuckDB codepoint counts in [[mojibakeCount]].
    */
  val MojibakeFixes: Seq[(String, String)] = Seq(
    "â€™" -> "'", "â€œ" -> "\"", "Ã©" -> "é", "Ã¤" -> "ä",
    "Ã±" -> "ñ", "Ã¼" -> "ü")

  def fixMojibake(text: Column): Column =
    MojibakeFixes.foldLeft(text) { case (acc, (m, f)) =>
      regexp_replace(acc, lit("\\Q" + m + "\\E"),
        lit(java.util.regex.Matcher.quoteReplacement(f)))
    }

  /** Repairs that [[fixMojibake]] would apply, counted on the RAW text
    * (the audit column): Σ per-pattern occurrence counts via exact
    * length arithmetic.
    */
  def mojibakeCount(text: Column): Column =
    MojibakeFixes.map { case (m, _) =>
      ((length(text) -
        length(regexp_replace(text, lit("\\Q" + m + "\\E"), lit("")))) /
        lit(m.length)).cast("long")
    }.reduce(_ + _)

  /** Whitespace-normalized lowercase form used for fingerprinting. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whole-document fingerprint: polynomial rolling hash of the normalized
    * text (reference analog: none — LLM-pipeline extension per the brief).
    */
  def fingerprint(text: Column): Column = Hashing.polyHash(normalized(text))

  /** Fixed-token-budget chunking with overlap — the RAG/pretraining
    * chunker: each document explodes into windows of `chunkSize` tokens
    * starting every `stride` tokens (overlap = chunkSize − stride), the
    * final partial window included. Pure generator + slice/concat
    * expressions (no lambda HOFs): the whole thing stays inside the scan's
    * whole-stage codegen and shuffles nothing — at 100 TB chunking is a
    * free map over the corpus scan, and the output order/ids are
    * deterministic (chunk_id = window ordinal).
    */
  def chunkFixed(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    docs.select(col(idCol), tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"),
        posexplode(sequence(lit(1), greatest(size(col("ws")), lit(1)),
          lit(stride))).as(Seq("chunk_id", "start")))
      .select(col(idCol),
        col("chunk_id").cast("int").as("chunk_id"),
        least(lit(chunkSize), size(col("ws")) - col("start") + 1)
          .cast("int").as("n_tokens"),
        concat_ws(" ", slice(col("ws"), col("start"), lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Feature hashing (the "hashing trick"): per-doc term frequencies over
    * a FIXED bucket space (token → polyhash mod nBuckets) — the bounded-
    * vocabulary document vector every at-scale featurizer uses (no
    * vocabulary build pass, no dictionary broadcast, vector width fixed
    * regardless of corpus size). Output per doc: the argmax bucket (ties →
    * lower bucket), its tf, the populated-bucket count, and the vector's
    * L2 norm. Shape: explode + two map-side-partial groupBys — no joins,
    * no windows.
    */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), pmod(Hashing.polyHash(col("w")), lit(nBuckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col(idCol))
      .agg(max(struct(col("tf"), (-col("bucket")).as("nb"), col("bucket"))).as("m"),
        count(lit(1)).as("n_buckets"),
        round(sqrt(sum((col("tf") * col("tf")).cast("double"))), 6).as("l2"))
      .select(col(idCol), col("m.bucket").cast("int").as("top_bucket"),
        col("m.tf").as("top_tf"), col("n_buckets"), col("l2"))
  }

  /** FASTTEXT-STYLE LINEAR QUALITY GATE (the LLaMA/RedPajama/CCNet "keep
    * what a linear classifier scores as reference-like" stage): per doc,
    * logit = Σ_b tf[b] · w[b] over `nBuckets` hashed unigram features,
    * keep when the logit clears zero. The weight table here is a
    * deterministic LCG stand-in for trained weights (the container has no
    * trainer) — the OPERATOR under test is the scoring topology: one
    * exploded-token tf pass, an O(nBuckets)-row broadcast model join, an
    * exact-integer dot product. Swapping real learned weights in changes
    * the table contents, not the plan. Everything is BIGINT arithmetic —
    * no FP in the gate, bit-identical in any engine.
    */
  def linearQualityGate(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, seed: Long): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), pmod(Hashing.polyHash(col("w")), lit(nBuckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("tf"))
    val weights = docs.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"),
        (Hashing.lcg(col("id"), seed, 2001L) - lit(1000L)).as("wgt"))
    tf.join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("wgt")).as("logit"))
      .withColumn("kept", col("logit") > 0)
  }

  /** Word n-gram shingles (space-joined), empty when fewer than n tokens.
    * 1-based element_at; guarded so Spark's sequence() never runs backwards.
    */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))

  /** Gopher-style quality RULE GATE (Rae et al. 2021, Appendix A1) — the
    * hard-threshold document filter that complements t2's continuous
    * quality score and t9's repetition verdict: a doc survives only if it
    * passes EVERY rule, and each rule's flag is emitted so the filter
    * funnel is auditable per doc. Published rule family, thresholds set
    * to this corpus's operating point (word count 25–90 vs Gopher's
    * 50–100k, mean word length 3.5–5.0 vs 3–10, ≥2 stopword hits,
    * distinct-token ratio ≥ 0.35 standing in for the duplicate-line
    * fraction, ≥80% of words containing an alphabetic character).
    *
    * Scale shape: a narrow per-row map — tokenStats/repStats are one-pass
    * native expressions and the alpha-word count is a single regex scan
    * of the text (each whitespace-bounded word with a letter matches
    * exactly once: matches must start at a boundary and cannot cross
    * whitespace), so the whole projection stays in whole-stage codegen —
    * a `filter(ws, _.rlike(…))` HOF here would be an interpreted
    * per-token lambda, the PlanAuditSpec hot-path class. All rule
    * arithmetic is exact
    * integer ratios (int/int double division), so the boolean flags are
    * bit-identical across engines — no FP-boundary pinning needed; the
    * two reported ratios follow the round(…, 6) convention.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // trim BEFORE tokenizing: split(\s+) keeps a phantom "" token for
    // leading/trailing whitespace (a trailing newline is near-universal
    // in web text), which would inflate every per-token ratio's
    // denominator and silently misclassify docs near a threshold.
    val ws = trimmedTokens(col(textCol))
    val f = gopherFlags(col(textCol))
    docs.select(col(idCol), size(ws).as("n_words"),
      round(avgWordLen(ws), 6).as("mean_word_len"),
      tokenStats(ws).getField("stop_hits").as("stop_hits"),
      round(distinctRatio(ws), 6).as("distinct_ratio"),
      f("ok_words").as("ok_words"), f("ok_mwl").as("ok_mwl"),
      f("ok_stop").as("ok_stop"), f("ok_rep").as("ok_rep"),
      f("ok_alpha").as("ok_alpha"), gopherPass(col(textCol)).as("pass"))
  }

  /** The five rule flags of [[gopherRules]], shared with [[gopherPass]]
    * so thresholds live in exactly one place. Tokenizes the TRIMMED
    * text (see [[gopherRules]] — phantom empty tokens from edge
    * whitespace would skew every ratio).
    */
  private def gopherFlags(text: Column): Map[String, Column] = {
    val ws = trimmedTokens(text)
    val n = size(ws)
    val mwl = avgWordLen(ws)
    val alphaRatio = size(regexp_extract_all(lower(text),
      lit("(?:^|\\s)[^\\sa-z]*[a-z]"), lit(0))).cast("double") / n
    Map(
      "ok_words" -> n.between(25, 90),
      "ok_mwl" -> (mwl >= 3.5 && mwl <= 5.0),
      "ok_stop" -> (tokenStats(ws).getField("stop_hits") >= 2),
      "ok_rep" -> (distinctRatio(ws) >= 0.35),
      "ok_alpha" -> (alphaRatio >= 0.8))
  }

  /** The all-rules conjunction of [[gopherRules]] as one Column. */
  def gopherPass(text: Column): Column =
    gopherFlags(text).values.reduce(_ && _)

  /** t17: PER-SOURCE CORPUS REPORT CARD — the health rollup a pipeline
    * publishes per ingest source/snapshot: volume (docs, whitespace +
    * BPE-budget tokens), quality (mean t2 score, Gopher-gate pass
    * count), and exact-dup pressure (distinct normalized fingerprints vs
    * docs). The observability complement of d24's cross-source matrix —
    * d24 says who duplicates whom, this says which sources are worth
    * ingesting at all.
    *
    * Scale shape: one narrow codegen'd projection per row, then ONE
    * groupBy(source) with map-side partials (count-distinct on the
    * 64-bit fingerprint included) — output is |sources| rows. The mean
    * quality averages the per-doc 6-dp-rounded score (identical inputs
    * on both engines) and re-rounds to 6 dp, the t6 discipline.
    */
  def corpusReport(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    // trimmed tokenization, as in gopherRules — edge whitespace must not
    // inflate the volume or deflate the quality numbers.
    val ws = trimmedTokens(col(textCol))
    docs.select(col(srcCol),
        size(ws).as("nw"), bpeTokenCount(col(textCol)).as("nb"),
        round(qualityScore(ws), 6).as("q"),
        fingerprint(col(textCol)).as("fp"),
        gopherPass(col(textCol)).cast("int").as("p"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("nw").as("n_tokens"),
        sum("nb").as("n_bpe_tokens"),
        round(avg("q"), 6).as("mean_quality"),
        countDistinct(col("fp")).as("n_unique_texts"),
        sum("p").as("n_gopher_pass"))
  }

  /** DSIR-style hashed-n-gram importance weights (Xie et al., NeurIPS 2023
    * "Data Selection for Language Models via Importance Resampling"): per
    * document, log w(x) = Σ_b tf_x[b] · (ln θ_target[b] − ln θ_raw[b]) over
    * B hashed unigram buckets, where θ are Laplace-smoothed (+1) bucket
    * unigram distributions of the TARGET slice (`targetPred`, e.g. a
    * high-quality domain) and the RAW corpus. Selecting top-weight (or
    * sampling ∝ w) documents steers a web-scale corpus toward the target
    * distribution — the published cheap alternative to model-based quality
    * scoring; compose the output with o13's token-budget cut or o7's
    * weighted mix for the selection step.
    *
    * Scale shape: ONE pass over the exploded hashed tokens builds both
    * bucket tables (conditional aggregates, map-side partial), the B-row
    * log-ratio table is a broadcast, the per-doc rollup is one keyed
    * groupBy — nothing corpus-sized is broadcast or collected, and the
    * shuffle carries (doc_id, bucket) ints only.
    *
    * FP pinning (COVERAGE.md "Oracle pinning"): the per-bucket log ratio is
    * round(…, 9) — ln agrees across engines to ~1 ulp, so the 9-dp value
    * is stable — and the per-doc dot product rounds to 6 dp like t6's
    * logprob sum.
    */
  /** Bigram-LM cross-entropy per document — the LM-score leg CCNet
    * actually gates on (Wenzek et al. 2020 use a KenLM n-gram model; a
    * corpus-trained add-one bigram model is its Spark-first stand-in, and
    * t19's tertiles consume a score of exactly this shape). Per doc:
    * mean over its bigrams of −ln p(w₂|w₁) with
    * p(w₂|w₁) = (c(w₁,w₂)+1) / (c(w₁)+V), i.e. gibberish and
    * rare-transition text scores high, template/natural text low.
    *
    * Scale shape: the model is built in TWO partial-aggregated groupBys
    * over the (doc, w₁, w₂) tf frame (bigram counts roll up from the
    * SAME tf aggregate the scoring join consumes — the corpus's bigram
    * explosion shuffles once); the vocab size is a one-row broadcast;
    * the per-bigram logprob table joins back KEYED on (w₁, w₂) — the
    * model is |distinct bigrams|, never broadcast. Numerics follow the
    * t15/DSIR discipline exactly: ln is computed ONCE per distinct
    * bigram, 9-dp-rounded, snapped to an e9 BIGINT; per-doc totals are
    * exact integer sums (reassociation-stable at any parallelism) and
    * the mean is one positive floor division.
    */
  def bigramXent(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Persisted: the tokenized corpus feeds TWO consumers (the bigram
    // explode chain and the vocabulary countDistinct) — unpersisted, each
    // re-ran the regex tokenize over every document (guide §1.2).
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("ws")).persistTracked()
    val bg = toks.select(col("doc_id"), explode(expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1)," +
          " (a, b) -> named_struct('w1', a, 'w2', b))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val tf = bg.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("tf"))
      .persistTracked()
    val c2 = tf.groupBy("w1", "w2").agg(sum("tf").as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct("w").as("v"))
    val lp = c2.join(c1, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(round(log((col("c1") + col("v")).cast("double")
            / (col("c2") + 1).cast("double")), 9) * lit(1e9), 0)
          .cast("long").as("lp_e9"))
    tf.join(lp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("lp_e9")).as("_s_e9"),
        sum("tf").as("n_bigrams"))
      // −ln p ≥ 0 always (c₂+1 ≤ c₁+V), so both divisions stay in
      // positive floor territory where Spark div and DuckDB // agree.
      .select(col("doc_id"), col("n_bigrams"),
        expr("(_s_e9 div n_bigrams) div 1000").as("xent_e6"))
  }

  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int): DataFrame = {
    val hashed = docs
      .select(col(idCol), targetPred.as("_tgt"),
        explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), col("_tgt"),
        pmod(Hashing.polyHash(col("w")), lit(nBuckets)).as("bucket"))
      .persistTracked()
    val byBucket = hashed.groupBy("bucket").agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("tn"),
      count(lit(1)).as("rn"))
    val totals = hashed.agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("tt"),
      count(lit(1)).as("rt"))
    val logRatio = byBucket.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(log((col("tn") + 1).cast("double") / (col("tt") + nBuckets).cast("double"))
          - log((col("rn") + 1).cast("double") / (col("rt") + nBuckets).cast("double")),
          9).as("lr"))
    val tf = hashed.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    // REASSOCIATION-STABLE sum (COVERAGE.md "Oracle pinning"): lr is
    // already a 9-dp-rounded double, so lr·1e9 sits within an ulp of an
    // integer — snap it to BIGINT once per bucket and sum tf·lr_e9
    // EXACTLY. A plain double sum's low bits depend on aggregation
    // order, and at 10× gate scale a rounding-tie log_w flipped the
    // t15 hash on a random subset of DuckDB runs (the e13-class flake).
    // One exact integer→double conversion + one round(…, 6) at the end
    // is identical in any engine at any parallelism.
    val lrE9 = logRatio.withColumn("lr_e9",
      round(col("lr") * lit(1e9), 0).cast("long"))
    tf.join(broadcast(lrE9), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("lr_e9")).as("_w_e9"),
        sum("tf").as("n_tokens"))
      // 6-dp HALF-AWAY rounding done IN INTEGERS: `round(x/1e9, 6)` on an
      // exact-tie value (…500 e-9) splits between engines' double-round
      // implementations (observed at 10× gate scale: −0.0323715 rounded
      // −0.032372 in Spark, −0.032371 in DuckDB). abs+500 div 1000 on
      // POSITIVE longs truncates identically everywhere (negative `div`
      // truncates in Spark but floors in DuckDB — never divide a
      // negative); one exact integer→double division at the end.
      .select(col(idCol),
        expr("""CAST(CASE WHEN _w_e9 < 0 THEN -((-_w_e9 + 500) div 1000)
                ELSE (_w_e9 + 500) div 1000 END AS DOUBLE)""")
          .divide(lit(1e6)).as("log_w"),
        col("n_tokens"))
  }
}
