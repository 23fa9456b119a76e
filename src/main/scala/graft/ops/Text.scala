package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for the LLM-training-data
  * pipeline (north star; SURVEY §2.6 extras).
  *
  * Everything is a narrow, map-side column expression except the
  * dedup group-bys — which shuffle on a hash key, the exact pattern
  * that scales: at 100 TB the fingerprint/minhash signature is
  * computed in the scan stage and only (hash, doc_id) pairs shuffle.
  * No UDFs except simhash (pointwise bit-mixing with no builtin
  * equivalent — candidate for a codegen Expression later).
  */
object Text {

  /** Whitespace tokens of trimmed text; empty text → empty array
    * (split of "" would yield [""]).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Exact-duplicate groups: hash-groupBy on md5(text). */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_dups")
      )

  /** Exact dedup keeping the lowest doc_id per identical text —
    * `min_by` aggregation form: map-side partial keeps one row per
    * hash per task and AQE splits skewed hash buckets, vs the window
    * form (`exactDedupWindow`) which sorts whole partitions.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val cols = docs.columns.map(col)
    docs
      .groupBy(md5(col("text").cast("binary")))
      .agg(min_by(struct(cols: _*), col("doc_id")).as("__row"))
      .select(col("__row.*"))
  }

  /** Window-form exact dedup (kept for the defined-under-ties
    * semantics and as the differential-test reference).
    */
  def exactDedupWindow(docs: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(md5(col("text").cast("binary")))
      .orderBy(col("doc_id"))
    docs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Token-level stats: counts are exact integers → oracle-stable. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq_tokens"),
      length(col("text")).as("n_chars_computed"),
      aggregate(toks, lit(0),
        (acc, t) => acc + length(t)).as("sum_token_len")
    )
  }

  private val stopwords =
    Seq("the", "a", "an", "and", "of", "to", "in", "is")

  /** Heuristic quality scoring: length score, stopword ratio,
    * alphabetic ratio, duplication ratio — combined into one score.
    * All ratios are exact-int / exact-int divisions → bitwise
    * deterministic.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks,
      t => array_contains(lit(stopwords.toArray), t)))
    val nUniq = size(array_distinct(toks))
    docs
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        (nStop.cast("double") / greatest(nTok, lit(1)))
          .as("stopword_ratio"),
        (nUniq.cast("double") / greatest(nTok, lit(1)))
          .as("uniq_ratio"),
        least(col("n_chars"), lit(500)).cast("double")./(500.0)
          .as("len_score")
      )
      .withColumn("quality",
        col("stopword_ratio") * 0.25 + col("uniq_ratio") * 0.5 +
          col("len_score") * 0.25)
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "nicht"),
    "es" -> Seq("el", "los", "que", "y"),
    "fr" -> Seq("le", "les", "et", "est")
  )

  /** N-gram-free language ID heuristic: count marker stopwords per
    * language, argmax with fixed tie-break order (en,de,es,fr; 'und'
    * = unknown when no markers hit). Pure column expressions — at
    * scale this runs entirely in the scan stage.
    */
  def langGuess(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val counts = langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks,
        t => array_contains(lit(words.toArray), t)))
    }
    val Seq(en, de, es, fr) = counts.map(_._2)
    val guess =
      when(en + de + es + fr === 0, lit("und"))
        .when(en >= de && en >= es && en >= fr, lit("en"))
        .when(de >= es && de >= fr, lit("de"))
        .when(es >= fr, lit("es"))
        .otherwise(lit("fr"))
    docs.select(
      col("doc_id"),
      col("lang").as("lang_label"),
      counts(0)._2.as("c_en"), counts(1)._2.as("c_de"),
      counts(2)._2.as("c_es"), counts(3)._2.as("c_fr"),
      guess.as("lang_guess")
    )
  }

  /** Content fingerprint: md5 over alnum-normalized lowercase text —
    * whitespace/punctuation-insensitive near-exact dedup key.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "[^a-z0-9]+", "")
        .cast("binary")).as("fp"),
      substring(
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]+", "")
          .cast("binary")), 1, 8).as("fp_prefix")
    )

  // --- MinHash + LSH near-dup (no SQL oracle; spec-tested) ----------

  val MinhashPerms = 32
  val LshBands     = 8
  val LshRows: Int = MinhashPerms / LshBands

  /** Token 3-shingles as strings (docs shorter than 3 tokens get their
    * full token string as a single shingle).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles from an already-materialized token array column.
    *
    * Callers that feed the result into many downstream expressions
    * (e.g. the 32 minhash permutations) MUST stage `toks`/`sh` as
    * their own projections: lambda-bearing HOFs are excluded from
    * Spark's subexpression elimination, so an inlined shingle tree
    * would be re-evaluated once per consumer — measured 30× slowdown
    * on the near-dup queries.
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ",
            slice(toks, i + 1, lit(n)))
        ))
      )

  /** doc_id + shingle arrays via the one-pass native expression
    * (`graft.functions.TokenShingles` — bit-compatible with the
    * declarative `shinglesFromTokens(tokens(text))` chain, which
    * interprets per window position).
    */
  def docShingles(docs: DataFrame): DataFrame =
    docs
      // small single-file inputs arrive as one split; spread the
      // CPU-heavy shingle/hash work across cores (at scale the input
      // is already split and this shuffle is one narrow hash pass)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        graft.functions.tokenShingles(col("text"), 3).as("sh"))

  /** MinHash signature via the native codegen expression (one string
    * hash + MinhashPerms integer mixes per shingle; the HOF
    * formulation — 32 × array_min(transform(xxhash64)) — re-hashed
    * every shingle per permutation, interpreted).
    */
  def minhashSignature(sh: Column): Column =
    graft.functions.minhash(sh, MinhashPerms)

  /** LSH banding: docs → (band_idx, band_hash, doc_id); same-bucket
    * docs are near-dup candidates. Jaccard estimate from full
    * signatures confirms; only candidate pairs are compared (never
    * n²) — the 100 TB-safe shape.
    */
  def minhashCandidates(
      docs: DataFrame,
      threshold: Double = 0.5
  ): DataFrame = {
    // Signatures are tiny (32 longs/doc, ≪ the text) — persisting them
    // is the right call at any scale, and stops the self-join legs
    // from re-running the shingle+hash pipeline.
    val sigs = graft.Caches.track("text", docShingles(docs)
      .select(col("doc_id"), minhashSignature(col("sh")).as("sig")))
    // Band hash = builtin xxhash64 over the sig slice (codegen'd,
    // hashes the longs directly — no per-band string building).
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 until LshBands).map { b =>
        xxhash64(lit(b), slice(col("sig"), b * LshRows + 1, LshRows))
      }: _*)).as(Seq("band_idx", "band_hash"))
    )
    // identical join legs → the band shuffle is computed once and
    // reused (ReusedExchange); signatures are evaluated in one pass.
    val joined = banded.as("l").join(banded.as("r"),
      col("l.band_idx") === col("r.band_idx") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
    joined
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        (size(filter(zip_with(col("l.sig"), col("r.sig"),
          (a, b) => a === b), x => x))
          .cast("double") / MinhashPerms).as("jaccard_est"))
      .distinct()
      .filter(col("jaccard_est") >= threshold)
  }

  /** Exact n-gram Jaccard verification over candidate pairs. */
  def ngramJaccard(
      docs: DataFrame,
      candidates: DataFrame
  ): DataFrame = {
    val sh = graft.Caches.track("text", docShingles(docs))
    candidates
      .join(sh.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b")), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))))
          .as("jaccard")
      )
  }

  def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.simhash64(tokens(col("text"))).as("simhash"))

  /** BPE-ish pre-tokenizer regex (GPT-2 style word/number/punct
    * splitting, ASCII form): identical semantics under Java regex
    * (Spark) and RE2 (DuckDB), so token counts are oracle-checkable.
    */
  val BpePattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  /** Token counting two ways: whitespace words and BPE-ish segments
    * (the LLM-pipeline "how many tokens is this corpus" estimator).
    */
  def bpeTokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .as("n_bpe_tokens")
    )

  /** Corpus document-frequency stats: token → (docs containing it,
    * total occurrences) — the explode+groupBy shape behind TF-IDF /
    * vocabulary building. One shuffle on the token; at 100 TB add a
    * frequency floor pushdown (HAVING) so the long tail never leaves
    * the reducers, which `minDf` provides.
    */
  def docFrequency(docs: DataFrame, minDf: Long): DataFrame = {
    val total = docs.count()
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(
        countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total"))
      .filter(col("df") >= minDf)
      .withColumn("idf",
        log(lit(total.toDouble) / col("df").cast("double")))
  }

  /** End-to-end curation pipeline — the composed LLM-training-data
    * path: language filter → quality gate → exact dedup (lowest
    * doc_id survives) → per-language token budget accounting. Every
    * stage is one of the individually-oracle-checked operators; this
    * query checks their composition.
    */
  def curationPipeline(docs: DataFrame): DataFrame = {
    val quality = qualityScore(docs)
      .select(col("doc_id"), col("quality"))
    val kept = docs
      .join(quality, "doc_id")
      .filter(col("lang").isin("en", "de") && col("quality") > 0.3)
    val deduped = exactDedup(kept)
    deduped
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text")))).as("n_tokens"),
        // power-of-2 fixed-point sum: quality values are often dyadic
        // rationals (0.40625 = 13/32) that land exactly on decimal
        // rounding boundaries where engines' rounding rules (half-up
        // vs half-even) disagree; floor(x * 2^16) is exact and
        // rule-free on both sides
        sum(floor(col("quality") * 65536).cast("long"))
          .as("sum_quality_q16"))
      .orderBy(col("lang"))
  }

  /** Rolling-hash (Rabin–Karp, 32-byte windows) winnowing fingerprint
    * per document + its duplicate-group size — content-defined
    * near-exact dedup key via the native codegen expression.
    */
  def rollingFingerprint(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"),
      graft.functions.rollingMin(col("text"), 32).as("roll_fp"))
    val groups = fp.groupBy(col("roll_fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
    fp.join(groups, "roll_fp")
      .select(col("doc_id"), col("roll_fp"), col("n_docs"),
        col("keep_doc_id"))
  }
}
