package graft.analyze

/** Pluggable text analyzer (tokenizer), the engine-side counterpart of the
  * reference's Lindera morphological tokenizer (reference
  * `src/splitter.py:39-47`, `src/searcher.py:55-73`).
  *
  * Tokenization is a *model* concern, not an engine concern: the reference
  * stores tokens pre-computed in the `tokens` column and builds its FTS index
  * with `stemmer='none', stopwords='none'` (reference `src/db.py:143-150`)
  * precisely so the index is analyzer-agnostic. We keep the same contract:
  * whatever `Analyzer` produced the tokens at index time must also tokenize
  * the query at search time.
  */
trait Analyzer extends Serializable {
  def tokenize(text: String): Seq[String]
}

/** Whitespace tokenizer — exactly `split(text, ' ')` semantics so that a SQL
  * oracle (`string_split(text, ' ')` in DuckDB, `split(text, ' ')` in Spark)
  * produces identical tokens. Used for the synthetic testdata corpus whose
  * `text` is single-space-joined words. */
object WhitespaceAnalyzer extends Analyzer {
  def tokenize(text: String): Seq[String] =
    if (text.isEmpty) Seq.empty
    else text.split(" ", -1).toSeq
}

/** Default Unicode/CJK-aware tokenizer: lower-cases, emits runs of
  * letters/digits as single tokens, and each CJK ideograph as its own token
  * (unigram segmentation — a deterministic, dependency-free stand-in for the
  * reference's Lindera IPADIC segmentation, reference `src/splitter.py:39-47`).
  */
object DefaultAnalyzer extends Analyzer {
  private def isCjk(cp: Int): Boolean = {
    val b = Character.UnicodeBlock.of(cp)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
    b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS ||
    b == Character.UnicodeBlock.HIRAGANA ||
    b == Character.UnicodeBlock.KATAKANA ||
    b == Character.UnicodeBlock.HANGUL_SYLLABLES
  }

  def tokenize(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      if (isCjk(cp)) {
        flush()
        out += new String(Character.toChars(Character.toLowerCase(cp)))
      } else if (Character.isLetterOrDigit(cp)) {
        cur.appendAll(Character.toChars(Character.toLowerCase(cp)))
      } else flush()
      i += n
    }
    flush()
    out.result()
  }
}
