package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline surface
  * (builder prompt: language-ID, quality scoring, token counting, document
  * fingerprinting). Everything here is built from `org.apache.spark.sql
  * .functions` higher-order / regexp / hash built-ins — fully codegen'd,
  * no UDFs — and each has an exact ANSI-SQL twin (DuckDB oracle) in
  * [[graft.queries.DataPrepQueries]].
  *
  * Determinism rules (oracle-exactness): ratios are emitted as
  * `floor(scale * num / den)` BIGINTs, never raw doubles, so value hashes
  * match bit-for-bit across engines.
  */
object TextFunctions {

  /** Whitespace tokens of `c` (empty string → empty array). */
  def wsTokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(wsTokens(c))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric glyphs each count as one token (the shape of a
    * byte-pair pre-tokenizer's word splitter). */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenRe), lit(0)))

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately small and hard-coded so the SQL
    * oracle can carry the identical lists inline. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "per", "non", "sono", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con")
  )

  /** Per-language stopword hit count over lowercase whitespace tokens. */
  def stopwordHits(c: Column, lang: String): Column = {
    val stops = Stopwords.toMap.apply(lang)
    size(filter(wsTokens(lower(c)), t => t.isin(stops.map(lit): _*)))
  }

  /** Language-ID: argmax of stopword hits, ties broken by list order
    * (en > it > fr > de > es); no hits at all → "und" (undetermined). */
  def langId(c: Column): Column = {
    val hits = Stopwords.map { case (l, _) => l -> stopwordHits(c, l) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === best && h > 0, lit(l)).otherwise(acc)
    }
    // foldRight builds en-first precedence: earlier langs override later
    // on equal scores, matching the oracle's CASE chain.
    pick
  }

  /** Quality metrics, all integer-exact:
    *  - `n_chars`, `n_tokens`
    *  - `punct_per_10k`  = floor(1e4 * punct_chars / chars)
    *  - `stop_per_10k`   = floor(1e4 * en-stopword tokens / tokens)
    *  - `mean_tok_len_x100` = floor(100 * letters / tokens)
    */
  def qualityMetrics(c: Column): Seq[(String, Column)] = {
    val chars = length(c)
    val toks = tokenCountWs(c)
    val punct = length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))
    val letters = length(regexp_replace(c, "[^A-Za-z]", ""))
    Seq(
      "n_chars" -> chars.cast("long"),
      "n_tokens" -> toks.cast("long"),
      "punct_per_10k" ->
        when(chars > 0, floor(lit(10000L) * punct / chars)).otherwise(0L).cast("long"),
      "stop_per_10k" ->
        when(toks > 0, floor(lit(10000L) * stopwordHits(c, "en") / toks))
          .otherwise(0L).cast("long"),
      "mean_tok_len_x100" ->
        when(toks > 0, floor(lit(100L) * letters / toks)).otherwise(0L).cast("long")
    )
  }

  /** Canonical normalization for fingerprinting/dedup: lowercase,
    * collapse whitespace, strip punctuation. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[\\p{Punct}]", ""), "\\s+", " "))

  /** Document fingerprint = md5 of the normalized text (md5 is available
    * and bit-identical in Spark and DuckDB, so the oracle can verify it). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token-array column.
    * Callers must bind the tokens in a prior projection
    * (`.withColumn("toks", wsTokens(normalizeText(text)))`) — passing the
    * normalize+split expression directly would re-evaluate it inside every
    * `element_at`, i.e. ~3n times per row (measured 8× slowdown on the
    * shingle pipeline).
    *
    * The distinct SET of shingles, in sorted order. Dedup is sort +
    * adjacent-compare — `array_distinct` on string arrays is O(s²)
    * pairwise (measured 29 s for one sf0.1 partition, ~500–2000 shingles
    * per doc; a 100k-token doc would be ~10¹⁰ comparisons), the sort path
    * is O(s log s). The adjacent compare is `zip_with` against a
    * shifted-by-one copy — zip_with evaluates each argument array ONCE
    * per row, where an index-lambda `element_at(sorted, i)` would re-sort
    * per element. Every consumer treats the result as a set (explode →
    * aggregate, or MinHash min), so the order change is unobservable;
    * SQL oracles compare exploded rows, not list order. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    val grams = transform(sequence(lit(0), count - 1), i =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    val sorted = array_sort(grams)
    val prev = concat(array(lit(null).cast("string")),
      slice(sorted, lit(1), size(sorted) - 1))
    when(count <= 0, array().cast("array<string>")).otherwise(
      filter(zip_with(sorted, prev, (x, p) =>
        when(x <=> p, lit(null).cast("string")).otherwise(x)),
        x => x.isNotNull))
  }

  /** Word n-gram shingles over the normalized text (the MinHash/Jaccard
    * unit). Convenience form for single-use contexts (tests). */
  def wordShingles(c: Column, n: Int): Column =
    shinglesFromTokens(wsTokens(normalizeText(c)), n)

  /** Overlapping fixed-size character chunks — the context-window
    * splitting step of a training pipeline (long doc → chunk rows).
    * Chunk i covers [i·stride, i·stride + size); the last chunk may be
    * short; a doc never produces zero chunks. Returns
    * array<struct<chunk_idx, chunk_start, chunk_text>> for a single
    * `posexplode`-free explode (index is carried in the struct so the
    * expression stays one `transform(sequence(...))`). */
  def charChunks(c: Column, size: Int, stride: Int): Column = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val len = length(c)
    val n = when(len <= size, lit(1)).otherwise(
      floor((len - size + stride - 1) / lit(stride)).cast("int") + 1)
    transform(sequence(lit(0), n - 1), i =>
      struct(
        i.cast("long").as("chunk_idx"),
        (i * stride).cast("long").as("chunk_start"),
        c.substr(lit(1) + i * stride, lit(size)).as("chunk_text")))
  }

  /** Word n-grams WITH multiplicity (no `array_distinct`) — the unit of
    * repetition analysis, where how often a gram repeats is the signal the
    * dedup-oriented [[shinglesFromTokens]] deliberately discards. Same
    * materialized-tokens contract as [[shinglesFromTokens]]. */
  def ngramsAll(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    when(count <= 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), count - 1), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }
}
