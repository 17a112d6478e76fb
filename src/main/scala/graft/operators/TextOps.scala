package graft.operators

import graft.Tok
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for large-scale document pipelines:
 * tokenization, token counting, shingling, quality signals, and a
 * heuristic language identifier. Everything here composes Spark
 * built-in functions (whole-stage-codegen'd) — no UDFs — so the
 * expressions inline into the scan projection and scale linearly with
 * no shuffle of their own.
 */
object TextOps {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), Tok.WsPlus)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Strict token count: maximal non-whitespace runs (`\S+` matches).
    * Unlike [[tokenCount]] this ignores leading/trailing whitespace of
    * ANY kind — the exact tokenization the native
    * [[graft.functions.Shingles]] / [[graft.functions.ShingleHashes]]
    * expressions use, so ratios built from both stay consistent. */
  def strictTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(graft.Tok.Pattern), lit(0)))

  /** BPE-ish token count: alphanumeric runs and each punctuation mark
    * count as separate tokens (a cheap stand-in for subword tokenizers
    * when budgeting LLM training data). */
  def wordCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit("[A-Za-z0-9]+"), lit(0)))

  /** BPE-ish subword-budget token count, one regex pass: every
    * alphanumeric run of up to 4 chars counts as one token (longer runs
    * count ceil(len/4) — mirroring how subword vocabularies split long
    * words), and every non-space/non-alnum character counts as its own
    * token. A deterministic, codegen-able stand-in for a real BPE
    * tokenizer when budgeting training tokens. */
  def bpeTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9" + Tok.WsChars + "]"), lit(0)))

  /** Distinct word set (for set-semantics similarity). */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** Shannon character entropy in bits — the repetitive-garbage
    * quality signal (near-zero for "aaaa…"/boilerplate, ~4+ for
    * natural language). Computed scan-side with NO explode: sort the
    * character array, then one `aggregate` HOF walks the runs
    * accumulating Σ n_c·ln n_c (the islands trick — O(L log L) for
    * the sort, O(L) for the walk, zero shuffle); entropy falls out as
    * (ln N − Σ n_c·ln n_c / N) / ln 2. `[\s\S]` is the cross-engine
    * any-char class (Java and RE2 agree on the union even where they
    * disagree on `\s` alone — the [[graft.Tok]] note). Empty text
    * maps to 0.0. */
  def charEntropy(text: Column): Column = charEntropyUdf(text)

  /** Round-19 opt (guide §1.2 step 2 / §4): the former expression tree
    * ran a regex match PER CHARACTER, sorted the single-char strings,
    * then walked them with an interpreted `aggregate` fold (HOFs are
    * CodegenFallback) — measured 55 s of summed task time on q224's
    * chunk gate alone. This UDF computes the SAME value bit-for-bit:
    *  - `[\s\S]` matches one code point, and array_sort on single-char
    *    strings is UTF8 binary order == code point order, so sorting
    *    the code-point ints reproduces the run order exactly;
    *  - each run length accumulates 1.0 at a time in the fold = the
    *    exact small-integer double, so `run·ln(run)` terms are
    *    identical, added in the same (sorted) order;
    *  - Spark's `log` is StrictMath.log (the repo's standing note),
    *    used here for every term, the N normalizer and the ln 2 base.
    * Null text → null, empty → 0.0 (the old CaseWhen's exact ends). */
  private val charEntropyUdf = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Double]
    else {
      val cps = s.codePoints().toArray
      val n = cps.length
      if (n == 0) java.lang.Double.valueOf(0.0)
      else {
        java.util.Arrays.sort(cps)
        var acc = 0.0
        var i = 0
        while (i < n) {
          var j = i
          while (j < n && cps(j) == cps(i)) j += 1
          val run = (j - i).toDouble
          acc += run * StrictMath.log(run)
          i = j
        }
        java.lang.Double.valueOf(
          (StrictMath.log(n.toDouble) - acc / n.toDouble) /
            StrictMath.log(2.0))
      }
    }
  }

  /** Word n-gram shingles (distinct), the unit of near-dup detection:
    * shingle i = tokens[i..i+n-1] joined by a single space. */
  def shingles(text: Column, n: Int): Column = {
    val ws = tokens(text)
    // guard: sequence(1, 0) would generate a DESCENDING [1,0], not empty
    when(size(ws) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "les", "et", "une", "est", "pas", "vous", "je", "ne", "ce"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"))

  /** Per-language stopword hit count (distinct stopwords present). */
  def langScore(text: Column, lang: String): Column = {
    val ws = stopwords.toMap.apply(lang)
    size(array_intersect(wordSet(text), array(ws.map(lit): _*)))
  }

  /**
   * Heuristic language ID: the language whose stopword list has the
   * most distinct hits in the document, ties broken by the fixed order
   * en, de, es, fr, zh; no hits at all -> "und" (undetermined).
   * An n-gram-frequency heuristic in the same spirit as public fastText
   * / CLD-style identifiers, reduced to codegen-able set intersections.
   */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    } // foldRight => earlier languages win ties
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  // ---- Gopher-style document-quality rule ingredients (Rae et al.
  // 2021, public filtering recipe). All integer-exact or single-
  // division arithmetic, so oracle SQL reproduces them bit-identically.

  /** Mean word length: non-whitespace chars / `\S+` token count. */
  def meanWordLen(text: Column): Column = {
    val n = strictTokenCount(text).cast("double")
    when(n > 0,
      length(regexp_replace(text, Tok.Ws, "")).cast("double") / n).otherwise(lit(0.0))
  }

  /** Gopher symbol-to-word ratio: occurrences of `#` or `...` per word. */
  def symbolToWordRatio(text: Column): Column = {
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val n = strictTokenCount(text).cast("double")
    when(n > 0, (hashes + ellipses).cast("double") / n).otherwise(lit(0.0))
  }

  /** Fraction of words containing at least one ASCII letter. */
  def alphaWordFrac(text: Column): Column = {
    val ws = call_function("regexp_extract_all", text, lit(graft.Tok.Pattern), lit(0))
    when(size(ws) > 0,
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / size(ws).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Duplicate-line fraction: 1 - distinct lines / lines (Gopher's
    * repetition family at line granularity; [[graft.SparkEntry]] q47
    * covers the 2-gram variant). */
  def dupLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Distinct stopword hits across all known languages — Gopher's
    * "contains stop words" naturalness signal, language-neutral. */
  def stopwordHits(text: Column): Column =
    size(array_intersect(wordSet(text),
      array(stopwords.flatMap(_._2).map(lit): _*)))

  /**
   * Composite quality score in [0,1]: blends token count (longer is
   * better up to 64 tokens), alphanumeric density, and mean word
   * length in a plausible range — the shape of public quality filters
   * (C4/Gopher rules) with deterministic arithmetic.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val alnum = length(regexp_replace(text, "[^A-Za-z0-9]", "")).cast("double")
    val density = when(length(text) > 0, alnum / length(text).cast("double")).otherwise(lit(0.0))
    val meanWl = when(nTok > 0, alnum / nTok).otherwise(lit(0.0))
    val wlScore = when(meanWl >= 3 && meanWl <= 10, lit(1.0)).otherwise(lit(0.5))
    (lenScore * lit(0.4) + density * lit(0.4) + wlScore * lit(0.2))
  }

  /**
   * Canonical text normalization — the pre-dedup cleanup every public
   * web-corpus pipeline runs so that byte-identical dedup actually
   * catches canonically-equivalent text:
   *
   *  1. Unicode NFC (combining sequences -> precomposed; codegen'd
   *     native expression, see [[graft.functions.NfcNormalize]]);
   *  2. strip control characters other than \t\n\r (C0 incl. \x0B\x0C,
   *     plus DEL) — mojibake debris that defeats hashing. \x0B\x0C are
   *     stripped HERE, not collapsed by step 3, because Java's \s
   *     includes them and RE2's (the oracle engine's) does not;
   *  3. collapse all whitespace runs to a single space;
   *  4. trim.
   *
   * Pure scan-side projection: no shuffle, stays in whole-stage
   * codegen. Case is left intact (lowercasing is a *model* choice,
   * not a canonicalization, so it is a separate opt-in).
   */
  def normalizeText(spark: org.apache.spark.sql.SparkSession, text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.NfcNormalize.nfc_normalize(spark, text),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      Tok.WsPlus, " "))

  /**
   * URL canonicalization — the RefinedWeb-style dedup key (Penedo et
   * al. 2023 dedup crawled pages by normalized URL before any content
   * pass). Six deterministic rules, applied in order:
   *
   *   1. drop the fragment (`#…`);
   *   2. lowercase the scheme and authority (path/query case is
   *      SIGNIFICANT and kept);
   *   3. strip a `www.` authority prefix;
   *   4. strip an explicit default port `:80`;
   *   5. drop `utm_*` tracking parameters (prefix match on each
   *      `&`-separated pair), keeping the others in their original
   *      order;
   *   6. strip one trailing slash from the path.
   *
   * Built ENTIRELY from codegen'd string builtins (regexp_extract /
   * regexp_replace / filter / array_join) with RE2-compatible
   * patterns (no lookbehind), so a DuckDB oracle states the identical
   * transformation — and at 100 TB the canonical key is a scan-side
   * projection, no shuffle until the dedup groupBy on the key.
   * Idempotent: canonicalizing a canonical URL is the identity
   * (spec-pinned).
   */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // authority = scheme://host[:port] — everything before the first
    // /, ? or end; lowercase it, keep the rest verbatim
    val auth0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    val rest = substring(noFrag, length(auth0) + 1, lit(1000000))
    val auth = regexp_replace(
      regexp_replace(lower(auth0), "://www\\.", "://"),
      ":80$", "")
    // path = rest before '?', query = after (empty when absent)
    val path0 = regexp_extract(rest, "^[^?]*", 0)
    val query = substring(rest, length(path0) + 2, lit(1000000))
    val path = regexp_replace(path0, "/$", "")
    val kept = filter(split(query, "&"),
      p => !(substring(p, 1, 4) === "utm_"))
    val cleanQ = array_join(kept, "&")
    concat(auth, path,
      when(length(cleanQ) > 0, concat(lit("?"), cleanQ)).otherwise(lit("")))
  }

  /** RAG-ingestion token-window CHUNKING: split each document's token
    * stream into `window`-token chunks advancing by `stride` (overlap
    * = window − stride — the retrieval-ingestion default so no
    * boundary sentence is lost to a hard cut). Chunk count is the
    * standard `1 + ceil((L − window)/stride)` for L > window, else 1;
    * the final chunk may be shorter (it is never dropped — dropping
    * the tail silently loses up to window−1 tokens per doc at corpus
    * scale). One scan-side HOF pass + ONE posexplode — no shuffle at
    * any corpus size; chunk text crosses the oracle gate as an md5
    * fingerprint (the pandas comparator cannot hash long strings
    * cheaply and list cells not at all).
    *
    * Output: (idCol, chunk_idx, n_chunk_tokens, chunk_fp [, chunk_text
    * when `withText` — for downstream per-chunk scoring; fingerprints
    * otherwise, since the oracle gate can't hash long strings
    * cheaply]). Empty docs (no tokens) emit nothing, like the
    * explode-of-empty convention everywhere else in this repo. */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int,
      withText: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1 && stride <= window,
      "stride must be in [1, window] (stride > window would drop tokens)")
    val toks = call_function("regexp_extract_all", col(textCol),
      lit(Tok.Pattern), lit(0))
    val nTok = size(toks)
    // ceil((L - window)/stride) + 1 — Spark's `/` is fractional, so
    // floor() it back; doubles are exact at any realistic L
    val nChunks = when(nTok <= window, lit(1))
      .otherwise(floor((nTok - window + stride - 1) / stride).cast("int") + 1)
    val base = df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .filter(size(col("__toks")) >= 1)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__nc") - 1),
          i => slice(col("__toks"), i * stride + 1, lit(window)))))
    val out = base.select(col(idCol), col("pos").as("chunk_idx"),
      size(col("col")).as("n_chunk_tokens"),
      md5(array_join(col("col"), " ")).as("chunk_fp"),
      array_join(col("col"), " ").as("chunk_text"))
    if (withText) out else out.drop("chunk_text")
  }
}
