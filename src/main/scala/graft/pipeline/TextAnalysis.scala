package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators (language-ID, quality scoring, token
  * counting, fingerprinting) — training-data-pipeline extensions. All pure
  * `Column` expressions: one narrow projection per document, no shuffle,
  * scales linearly with corpus bytes.
  */
object TextAnalysis {

  /** Whitespace tokens. Boundary EMPTY split segments are filtered:
    * `split(" a b ", "\s+")` yields `["", "a", "b"]` under Spark's
    * limit=-1 semantics, and counting that "" as a token inflated
    * every downstream denominator (token counts, mean lengths,
    * stopword ratios, chunk sizes) and made fingerprints
    * trim-sensitive. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word chunks, numbers, punctuation runs —
    * a GPT-2-style pre-tokenizer regex. Upper bound estimate of LLM
    * token usage. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]+|\\s+"), lit(0)))

  /** Markup stripping — the boilerplate-removal step web-crawl curation
    * runs before any text operator sees a document: drop
    * `<script>`/`<style>` subtrees wholesale (their CONTENT is code,
    * not text), flatten remaining tags to spaces (so `a</p><p>b` does
    * not glue into one word), decode the five ubiquitous named entities
    * plus `&#39;`/`&nbsp;`, and collapse whitespace. Entity order
    * matters and is the standard one: `&amp;` decodes LAST so
    * `&amp;lt;` yields the literal `&lt;` instead of double-decoding.
    *
    * Pure Column chain (regexp_replace/replace — codegen'd, one narrow
    * pass, no shuffle); patterns stay inside the shared Java/RE2 regex
    * subset (`(?is)` + lazy `.*?` are in both — case-insensitive, since
    * real HTML spells `<SCRIPT>`/`<Style>` freely and the closing tag
    * may carry whitespace before `>`) so an external oracle
    * reproduces the transform byte-for-byte. NOT a full HTML5 parser —
    * documented contract: tags are `<[^>]*>` runs, which is what
    * crawl-scale strippers (and the reference C4 pipeline) use.
    */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken §4, the MOSS
    * family): hash every word `k`-gram, slide a window of `w`
    * consecutive hashes, and keep each window's RIGHTMOST minimal hash.
    * (The paper's "robust" refinement instead re-picks the previous
    * window's choice on ties to shrink the fingerprint set; the
    * rightmost rule here keeps selection a pure ORDER — position-exact
    * and engine-reproducible — and both variants carry the same
    * guarantee.) Guarantee: any shared substring of at least
    * `k + w − 1` words between two documents shares at least one
    * fingerprint, at ~2/(w+1) selection density. The position-robust
    * complement to [[graft.pipeline.Dedup.simhash]] (which fingerprints
    * whole documents): winnowing survives insertion/reordering around
    * the match.
    *
    * Shape: positioned gram rows → one per-doc window pass (min over a
    * `(hash, −pos)` struct, so the rightmost-tie rule is the ORDER on
    * the struct, not procedural code) → distinct. The partition key is
    * the document — windows never cross documents, so the pass
    * parallelizes per doc and no global sort exists.
    *
    * `hash` maps the gram's space-joined text to its hash column —
    * default `xxhash64` (codegen, 8-byte shuffle rows); pass `md5` when
    * an external engine must reproduce the SELECTION (argmin needs
    * hash-value parity, not just grouping parity).
    *
    * Output: (id, fp_pos, fp_hash), docs shorter than `k + w − 1` words
    * emit nothing (no full window).
    */
  def winnow(df: org.apache.spark.sql.DataFrame, idCol: String,
             textCol: String, k: Int = 3, w: Int = 4,
             hash: Column => Column = org.apache.spark.sql.functions.xxhash64(_))
      : org.apache.spark.sql.DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    import org.apache.spark.sql.expressions.Window
    val gramText = concat_ws(" ", graft.pipeline.Grams.wordCols(k): _*)
    val grams = graft.pipeline.Grams.positioned(df, idCol, textCol, k)
      .select(col("id"), col("pos"), hash(gramText).as("h"))
    val win = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val full = Window.partitionBy(col("id"))
    grams
      .withColumn("m", min(struct(col("h"), (-col("pos")).as("np")))
        .over(win))
      .withColumn("__maxp", max(col("pos")).over(full))
      .filter(col("pos") <= col("__maxp") - (w - 1))
      .select(col("id"), (-col("m.np")).as("fp_pos"),
        col("m.h").as("fp_hash"))
      .distinct()
  }

  private val stopwords = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it",
      "for", "on", "with", "as", "at", "by"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für",
      "auf", "ein", "eine", "zu", "den", "im", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "des", "un", "une",
      "dans", "pour", "sur", "avec", "au", "pas"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "de", "un", "una",
      "en", "por", "para", "con", "del", "no"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit(_)): _*)
    val toks = tokens(lower(text))
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** n-gram-heuristic language ID: CJK characters → zh; otherwise the
    * language whose stopword-ratio is highest; an exact ratio TIE
    * resolves to the lexicographically greatest language code (the
    * order on the (ratio, code) struct — deterministic, engine-
    * reproducible); "und" only when NO list hits at all. */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es")
    val scores = langs.map(l => struct(stopwordRatio(text, l).as("s"),
      lit(l).as("l")))
    val best = greatest(scores: _*)
    when(regexp_like(text, lit("[\\x{4e00}-\\x{9fff}]")), lit("zh"))
      .when(best.getField("s") > 0, best.getField("l"))
      .otherwise(lit("und"))
  }

  /** Unicode-script composition — the crawl-curation step BEFORE
    * language ID (script is cheap and unambiguous; language is a model):
    * per-document fractions of Latin, digit, CJK, Cyrillic, Greek and
    * Arabic codepoints over the non-whitespace length, plus the dominant
    * script. Fractions are integer micros (the library's engine-exact
    * convention); the dominant pick compares those integers with a FIXED
    * priority order on ties (latin, digit, cjk, cyrillic, greek, arabic,
    * then "other"), so any engine reproduces it. Pure Column projection,
    * no shuffle. */
  def scriptProfile(text: Column): Column = {
    def micro(x: Column): Column =
      floor(x * lit(1e6) + lit(0.5)).cast("long")
    // NULL text profiles like the empty document (0 glyphs, dominant
    // "other") — unguarded, the NULL fractions would null every when()
    // condition and fall through to the LAST branch ("arabic")
    val nonWs = regexp_replace(coalesce(text, lit("")), "\\s+", "")
    val n = length(nonWs)
    val safeN = greatest(n, lit(1)).cast("double")
    def frac(keepClass: String): Column =
      micro(length(regexp_replace(nonWs, s"[^$keepClass]", ""))
        .cast("double") / safeN)
    val latin = frac("a-zA-Z")
    val digit = frac("0-9")
    val cjk = frac("\\x{4e00}-\\x{9fff}")
    val cyr = frac("\\x{0400}-\\x{04ff}")
    val greek = frac("\\x{0370}-\\x{03ff}")
    val arabic = frac("\\x{0600}-\\x{06ff}")
    val m = greatest(latin, digit, cjk, cyr, greek, arabic)
    val dominant = when(m === 0, lit("other"))
      .when(latin === m, lit("latin"))
      .when(digit === m, lit("digit"))
      .when(cjk === m, lit("cjk"))
      .when(cyr === m, lit("cyrillic"))
      .when(greek === m, lit("greek"))
      .otherwise(lit("arabic"))
    struct(n.cast("long").as("n_glyphs"),
      latin.as("latin_micro"), digit.as("digit_micro"),
      cjk.as("cjk_micro"), cyr.as("cyrillic_micro"),
      greek.as("greek_micro"), arabic.as("arabic_micro"),
      dominant.as("dominant"))
  }

  /** High-entropy token scan — the credential/secret SIGNAL a code or
    * crawl corpus runs before release (the detect-secrets heuristic
    * family): tokens at least `minLen` chars drawn from the base64/hex
    * charset whose character DIVERSITY (distinct chars / length) is at
    * least `minDiversity` — long diverse single-charset runs are API
    * keys, tokens and hashes; prose words are short or low-diversity.
    * Regex-based [[graft.pipeline.Scrub]] catches formatted PII; this
    * catches the unformatted rest. Returns a struct
    * (n_candidates, candidates) — the flagged tokens in document order
    * (callers redact or reject on n_candidates > 0). Pure Column
    * expression (nested HOFs), no shuffle. Diversity compares in
    * integer micros so the threshold is engine-exact. */
  def secretCandidates(text: Column, minLen: Int = 20,
                       minDiversity: Double = 0.5): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    val charset = "^[A-Za-z0-9+/=_-]+$"
    val cands = filter(toks, t => {
      val chars = split(t, "")
      val diversityMicro = floor(
        size(array_distinct(chars)).cast("double") /
          greatest(size(chars), lit(1)).cast("double") *
          lit(1e6) + lit(0.5)).cast("long")
      length(t) >= minLen && t.rlike(charset) &&
        diversityMicro >= (minDiversity * 1e6).toLong
    })
    struct(size(cands).cast("long").as("n_candidates"),
      cands.as("candidates"))
  }

  /** Quality features: length, token count, mean token length, punctuation
    * ratio, digit ratio, uppercase ratio. Returns a struct. */
  def qualityFeatures(text: Column): Column = {
    val len = length(text).cast("double")
    val safeLen = greatest(len, lit(1.0d))
    struct(
      length(text).as("n_chars"),
      tokenCount(text).as("n_tokens"),
      (len / greatest(tokenCount(text), lit(1)).cast("double"))
        .as("mean_token_len"),
      (length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / safeLen)
        .as("punct_ratio"),
      (length(regexp_replace(text, "[^0-9]", "")).cast("double") / safeLen)
        .as("digit_ratio"),
      (length(regexp_replace(text, "[^A-Z]", "")).cast("double") / safeLen)
        .as("upper_ratio"))
  }

  /** Scalar quality score in [0,1]: penalize very short/long docs, high
    * punctuation and digit density. A simple, deterministic heuristic. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = when(f.getField("n_tokens") < 5, 0.2d)
      .when(f.getField("n_tokens") > 10000, 0.5d).otherwise(1.0d)
    val punctScore = when(f.getField("punct_ratio") > 0.2d, 0.3d)
      .otherwise(1.0d)
    val digitScore = when(f.getField("digit_ratio") > 0.3d, 0.3d)
      .otherwise(1.0d)
    round(lenScore * punctScore * digitScore, 4)
  }

  /** Sliding token-window chunking — the RAG / training-prep splitter:
    * cut a document into chunks of `chunkTokens` whitespace tokens,
    * consecutive chunks overlapping by `overlap` tokens. Returns an
    * array of structs (chunk_idx, n_tokens, chunk); explode it for one
    * row per chunk. Pure per-document Column expression — chunking is
    * embarrassingly parallel, no shuffle.
    *
    * Chunk starts are 0, stride, 2·stride, … (stride = chunkTokens −
    * overlap); a final shorter chunk keeps the tail. Empty/whitespace
    * documents produce a single empty chunk (size-0 slice), which
    * callers typically filter on n_tokens > 0.
    */
  def chunkTokens(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val toks = tokens(text)
    // a start only yields NEW tokens if the previous chunk didn't already
    // reach the end: keep start 0 and starts with start + overlap < n
    // (drops tail chunks fully contained in their predecessor)
    val starts = filter(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      s => s === 0 || s + lit(overlap) < size(toks))
    transform(starts, (start, i) => struct(
      i.as("chunk_idx"),
      least(size(toks) - start, lit(chunkTokens)).as("n_tokens"),
      concat_ws(" ", slice(toks, start + 1, lit(chunkTokens))).as("chunk")))
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * token hashes, modulo 2^53-111 so the accumulator (≤2^53)·31 + 2^32
    * never overflows a long under ANSI arithmetic. */
  def fingerprint(text: Column): Column = {
    val M = (1L << 53) - 111
    aggregate(
      transform(tokens(text), t => xxhash64(t).bitwiseAND(lit(0xFFFFFFFFL))),
      lit(0L), (acc, h) => pmod(acc * 31L + h, lit(M)))
  }
}
