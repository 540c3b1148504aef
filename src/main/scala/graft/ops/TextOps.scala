package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over the
  * `documents` table `(doc_id, text, lang, source, n_chars)`.
  *
  * All per-row computations are narrow projections built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs in the hot path, no shuffle —
  * so they scale linearly with input splits.
  */
object TextOps {

  /** Whitespace token count (integer — stable for oracle hashing). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** A BPE-ish subword count: splits on whitespace AND on transitions
    * between letters/digits/punctuation (regex approximation of a
    * byte-pair-style pre-tokenizer). */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text),
        "\\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9\\s])|(?<=[^a-zA-Z0-9\\s])(?=[a-zA-Z0-9])"))
        .cast("long"))

  /** Integer quality counters (length / punctuation / stopword / uppercase
    * ratios are derivable downstream; integers keep oracle hashes exact). */
  def qualityCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_punct",
        (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("long"))
      .withColumn("n_upper",
        (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("long"))
      .withColumn("n_digits",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long"))
      .withColumn("n_stopwords", stopwordCount(t))
  }

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as")

  def stopwordCount(text: Column): Column = {
    val words = split(lower(text), "[^a-z]+")
    size(filter(words, w => array_contains(
      array(stopwords.map(lit): _*), w))).cast("long")
  }

  /** Heuristic language ID from stopword-family hits (n-gram heuristic;
    * deterministic, distributed, no model). Returns a lang code column. */
  def langId(text: Column): Column = {
    val families: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
      "fr" -> Seq(" le ", " la ", " les ", " et ", " est "),
      "es" -> Seq(" el ", " los ", " las ", " es ", " y "),
      "de" -> Seq(" der ", " die ", " und ", " ist ", " das "))
    val padded = concat(lit(" "), lower(text), lit(" "))
    def score(markers: Seq[String]): Column =
      markers.map(m => when(padded.contains(m),
        (length(padded) - length(regexp_replace(padded,
          java.util.regex.Pattern.quote(m), ""))) / m.length).otherwise(lit(0)))
        .reduce(_ + _)
    val scored = families.map { case (code, ms) => struct(score(ms).cast("long").as("s"), lit(code).as("c")) }
    val best = greatest(scored: _*)
    when(best.getField("s") > 0, best.getField("c")).otherwise(lit("und"))
  }

  /** 64-bit rolling-hash document fingerprint (polynomial hash over
    * normalized tokens) — deterministic content id for lineage/dedup. */
  def fingerprint(text: Column): Column = {
    // xxhash64 of the normalized token stream: cheap, codegen'd, stable
    xxhash64(concat_ws(" ",
      filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)))
  }
}
