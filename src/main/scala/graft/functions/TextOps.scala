package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, token counting, quality scoring, language identification
 * and document fingerprinting. All pure Column expressions — codegen'd,
 * no UDFs, so they stream through whole-stage codegen at 100 TB.
 *
 * These extend the reference's scalar string surface (reference:
 * python-packages/core/src/omigo_core/udfs.py:20-45 get_string_len /
 * uniq_len are the closest analogues) to the document-pipeline ops the
 * reference lacks.
 */
object TextOps {

  /** Expression-level let binding: evaluate `e` ONCE per row and feed the
    * result to `f` as a lambda variable. Catalyst re-evaluates an
    * expression everywhere its tree is referenced (subexpression
    * elimination does not reach into lambda bodies), so an expensive `e`
    * used k times inside a `transform` costs k evaluations — quadratic
    * when k itself scales with the data in `e`. A single-element
    * `transform` materializes `e` once and every reference to the lambda
    * variable is a cheap value read. */
  def letOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap, deterministic proxy for subword
    * tokenizer counts. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct-token ratio — low values signal repetitive/low-quality text. */
  def uniqTokenRatio(text: Column): Column =
    letOnce(tokens(text)) { toks =>
      size(array_distinct(toks)).cast(DoubleType) / size(toks)
    }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast(DoubleType)) / tokenCount(text)

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", "")))
      .cast(DoubleType) / length(text)

  /** Per-language stopword lists for the heuristic language scorer.
    * Deliberately tiny: the point is the distributed scoring shape, not
    * lexicography. */
  val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "les"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"),
  )

  /** Stopword hit count for one language over a token array. */
  def stopwordHits(toks: Column, lang: String): Column = {
    val words = StopWords(lang)
    size(array_intersect(toks, array(words.map(lit): _*))) // distinct-hit count
  }

  /** Stopword ratio against the union of all stopword lists. */
  def stopwordRatio(text: Column): Column = {
    val all = StopWords.values.flatten.toSeq.distinct
    letOnce(tokens(text)) { toks =>
      size(filter(toks, t => t.isin(all: _*))).cast(DoubleType) / size(toks)
    }
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, diverse
    * vocabulary and some stopword mass; penalizes symbol soup. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
    val diversity = uniqTokenRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    // +1e-9 shifts values off round-to-6 knife edges: different engines'
    // FMA/low-bit behavior can otherwise flip x.xxxxxx5 boundaries
    round((lenScore * 0.25 + diversity * 0.35 + stop * 0.2 + punctPenalty * 0.2)
      + 1e-9, 6)
  }

  /** Heuristic language ID: argmax over per-language distinct-stopword
    * hits; deterministic lexicographic tie-break. Returns the language
    * code, "und" when no list scores above zero. */
  def languageId(text: Column): Column =
    letOnce(tokens(text)) { toks =>
      val langs = StopWords.keys.toSeq.sorted
      // struct(score desc via negation, lang asc) -> array_min = winner
      val scored = array(langs.map(l =>
        struct((-stopwordHits(toks, l)).cast(IntegerType).as("neg"), lit(l).as("lang"))): _*)
      val best = array_min(scored)
      when(best.getField("neg") === 0, "und").otherwise(best.getField("lang"))
    }

  /** Strip HTML/XML tags and entities, collapse whitespace — the
    * boilerplate-removal step of a web-corpus pipeline. */
  def stripHtml(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(text,
      "<[^>]*>", " "),
      "&(amp|lt|gt|quot|nbsp|#\\d+);", " "),
      "\\s+", " "))

  /** Mask email addresses and long digit runs (phone/card-shaped) —
    * the PII-scrub step of a training-data pipeline. */
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\d[\\d .-]{7,}\\d", "<NUMBER>")

  /** Duplicate n-gram ratio (Gopher-style repetition signal): fraction
    * of n-gram occurrences that are repeats of an earlier n-gram.
    * 0 = no repetition, -> 1 for degenerate loops. */
  def dupNgramRatio(text: Column, n: Int): Column =
    letOnce(wordShingles(text, n)) { sh =>
      (size(sh) - size(array_distinct(sh))).cast(DoubleType) / size(sh)
    }

  /** Max single-token frequency share — another repetition signal
    * (a single token dominating the doc). Single pass over the SORTED
    * token array tracking the longest equal-run — O(n log n), not the
    * O(n^2) per-distinct-token rescan. */
  def maxTokenShare(text: Column): Column =
    letOnce(tokens(text)) { toks =>
      val state = aggregate(array_sort(toks),
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
        (acc, t) => {
          val run = when(t === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1))
          struct(t.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        })
      state.getField("best").cast(DoubleType) / size(toks)
    }

  /** Word n-gram shingles: ["a b c", "b c d", ...] for n-word windows.
    * Foundation for MinHash/Jaccard dedup. The token array is let-bound
    * so the text is split once per document, not once per window — the
    * naive form re-ran `split` inside the window lambda, O(tokens^2) per
    * doc (measured 10x slower on the documents corpus). */
  def wordShingles(text: Column, n: Int): Column =
    graft.plans.WordShinglesExpression.word_shingles(text, n)

  /** The original higher-order-function formulation; retained as the
    * independent reference for the equivalence law (Round4Spec). */
  private[graft] def wordShinglesHof(text: Column, n: Int): Column =
    letOnce(tokens(text)) { toks =>
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }

  /** Document fingerprint: lexicographic min of md5 over word shingles —
    * a winnowing-style content fingerprint stable under reordering of
    * everything except the minimal shingle. md5-hex keeps it engine-
    * portable (identical in any SQL engine). Native one-pass expression;
    * the HOF form below is the law-spec reference. */
  def fingerprint(text: Column, n: Int = 5): Column =
    graft.plans.FingerprintExpression.doc_fingerprint(text, n)

  private[graft] def fingerprintHof(text: Column, n: Int = 5): Column =
    array_min(transform(wordShinglesHof(text, n), s => md5(s)))

  /** 16-bit SimHash from word-level md5s, as an integer 0..65535.
    * Bit j of the simhash = majority vote of bit j across token hashes.
    * Uses the first 4 hex chars of md5 (16 bits) — portable to any
    * engine with md5 + integer ops. Native Catalyst expression: the
    * lambda form below evaluates interpreted (HOFs never enter
    * whole-stage codegen) and walks the hash array 16 times — it
    * dominated every simhash-family query at sf1. */
  def simhash16(text: Column): Column =
    graft.plans.Simhash16Expression.simhash16(text)

  /** The original higher-order-function formulation; retained as the
    * independent reference for the equivalence law spec (Round4Spec:
    * native == HOF on adversarial whitespace/unicode inputs). */
  private[graft] def simhash16Hof(text: Column): Column =
    // md5 each distinct token ONCE into a 16-bit int; the 16 bit-vote
    // aggregates then run over plain integers. The naive form re-derived
    // toks AND re-hashed every token inside each of the 16 aggregates.
    letOnce(transform(array_distinct(tokens(text)),
        t => conv(substring(md5(t), 1, 4), 16, 10).cast(IntegerType))) { hashes =>
      val nToks = size(hashes)
      val bits = (0 until 16).map { j =>
        val votes = aggregate(hashes, lit(0),
          (acc, h) => acc + shiftright(h, 15 - j) % 2)
        when(votes * 2 > nToks, lit(1 << (15 - j))).otherwise(lit(0))
      }
      bits.reduce(_ + _)
    }
}
