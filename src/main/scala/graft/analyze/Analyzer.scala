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

/** Name ⇄ instance registry so an index can PERSIST which analyzer produced
  * its tokens (`settings.analyzer`) and search can re-resolve the same one —
  * the analyzer-consistency contract the reference keeps implicitly by
  * always running Lindera on both sides (reference `src/splitter.py:39-47`,
  * `src/searcher.py:55-73`). */
object Analyzers {
  val DefaultName = "default"

  def nameOf(a: Analyzer): String = a match {
    case WhitespaceAnalyzer => "whitespace"
    case CjkBigramAnalyzer  => "bigram"
    case DefaultAnalyzer    => DefaultName
    case other => sys.error(
      s"analyzer ${other.getClass.getName} is not registered in Analyzers — " +
        "an unregistered name would persist in settings and make the index " +
        "unsearchable at query time (byName could never resolve it); " +
        "register the analyzer here before indexing with it")
  }

  def byName(name: String): Analyzer = name match {
    case "whitespace" => WhitespaceAnalyzer
    case "bigram"     => CjkBigramAnalyzer
    case DefaultName  => DefaultAnalyzer
    case other => sys.error(
      s"unknown analyzer '$other' (expected default, bigram, or whitespace)")
  }
}

/** Dictionary-free CJK bigram analyzer — one step closer to the reference's
  * Lindera IPADIC segmentation (reference `src/splitter.py:39-47`) without a
  * native dictionary dependency: within a same-script run of CJK characters
  * it emits overlapping character bigrams (the classic Lucene-CJK
  * approximation — most Japanese content words are 2 kanji, so bigrams hit
  * real word boundaries far more often than unigrams and sharpen BM25's df
  * statistics); a lone CJK character still emits its unigram. Runs break at
  * script boundaries (Han→Kana etc.), which in Japanese usually IS a word
  * boundary (content word → particle/inflection). Latin/digit runs tokenize
  * exactly like [[DefaultAnalyzer]].
  *
  * Pluggable, not the default: tokens are data (SURVEY.md §7.4) — an index
  * built with one analyzer must be searched with the same one, and the
  * oracle-checked corpus surface stays on whitespace tokens.
  */
object CjkBigramAnalyzer extends Analyzer {
  private def scriptClass(cp: Int): Int = {
    val b = Character.UnicodeBlock.of(cp)
    if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
      b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
      b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS) 1
    else if (b == Character.UnicodeBlock.HIRAGANA) 2
    else if (b == Character.UnicodeBlock.KATAKANA) 3
    else if (b == Character.UnicodeBlock.HANGUL_SYLLABLES) 4
    else 0
  }

  def tokenize(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val latin = new StringBuilder
    val run = new java.util.ArrayList[String]()
    var runClass = 0
    def flushLatin(): Unit =
      if (latin.nonEmpty) { out += latin.toString; latin.clear() }
    def flushRun(): Unit = {
      val n = run.size()
      if (n == 1) out += run.get(0)
      else if (n > 1) {
        var i = 0
        while (i < n - 1) { out += run.get(i) + run.get(i + 1); i += 1 }
      }
      run.clear(); runClass = 0
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      val sc = scriptClass(cp)
      if (sc != 0) {
        flushLatin()
        if (sc != runClass) flushRun()
        runClass = sc
        run.add(new String(Character.toChars(Character.toLowerCase(cp))))
      } else if (Character.isLetterOrDigit(cp)) {
        flushRun()
        latin.appendAll(Character.toChars(Character.toLowerCase(cp)))
      } else { flushRun(); flushLatin() }
      i += n
    }
    flushRun(); flushLatin()
    out.result()
  }
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
