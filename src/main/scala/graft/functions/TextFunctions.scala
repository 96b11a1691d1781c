package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * language-ID heuristic, quality scoring, rolling-hash fingerprinting.
  *
  * All are pure Column expressions built from codegen'd builtins (no UDFs):
  * they stay inside whole-stage codegen and scale linearly with input —
  * the 100 TB path is a plain map over the documents table.
  */
object TextFunctions {

  /** Whitespace tokenization (the BPE-ish baseline: \s+ split of trimmed text). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Count of tokens that appear in a fixed word list. */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t))).cast("long")

  val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht")
  val EsStop = Seq("el", "la", "de", "y", "que", "los")
  val FrStop = Seq("le", "la", "les", "et", "de", "un")

  /** DuckDB list literal of a word list — the ONE rendering every oracle
    * uses, so a list change (or a word needing escaping) updates every
    * oracle in lockstep.
    */
  def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  /** Stopword ratio: fraction of tokens found in the English stopword list. */
  def stopwordRatio(text: Column): Column =
    countIn(tokens(text), EnStop).cast("double") / tokenCount(text).cast("double")

  /** Punctuation ratio over a fixed class (deterministic across engines). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      length(text).cast("double")

  /** Mean token length: non-whitespace chars / token count. */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text).cast("double")

  /** n-gram-heuristic language ID: stopword-hit counts per language, argmax
    * with a fixed preference order (en > de > es > fr > unk) on ties.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val (en, de, es, fr) =
      (countIn(t, EnStop), countIn(t, DeStop), countIn(t, EsStop), countIn(t, FrStop))
    when(en > 0 && en >= de && en >= es && en >= fr, "en")
      .when(de > 0 && de >= es && de >= fr, "de")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("unk")
  }

  /** Composite quality score in [0,1]: length saturation + stopword signal
    * + punctuation penalty. Weights are arbitrary but fixed; the point is a
    * deterministic, engine-portable formula.
    */
  def qualityScore(text: Column): Column =
    round(
      lit(0.5) * least(lit(1.0), tokenCount(text).cast("double") / lit(100.0)) +
        lit(0.3) * stopwordRatio(text) +
        lit(0.2) * (lit(1.0) - punctRatio(text)),
      6)

  /** Polynomial rolling-hash fingerprint of the full text
    * (h = (h*31 + codepoint) mod 1e9+7), single forward pass via the
    * aggregate() higher-order function — codegen-friendly, no UDF.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Word n-gram shingles: sliding windows of `n` tokens joined by spaces.
    * Reference pattern for MinHash/SimHash input.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }
}
