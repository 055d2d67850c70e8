package graft.movies

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ru_en analyzer pipeline (movies.es.schema.json:4-40): lowercase →
  * tokenize → en+ru stopword removal → en possessive strip → en Porter /
  * ru Snowball-light stemming.
  *
  * Applied identically to documents and queries so matching happens in
  * analyzed-token space (X3). Tokenize/lower/stopwords are pure Column
  * expressions; stemming is the native StemTokens expression over each
  * token (pure Scala, no external deps, codegen'd — the SURVEY §7.2
  * escalation done).
  */
object Analyzer {

  // Trimmed versions of Lucene's english/russian stop sets — enough for
  // analyzer parity tests; extend freely (lists are broadcast literals).
  val EnglishStop: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  val RussianStop: Set[String] = Set(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от",
    "меня", "еще", "нет", "о", "из", "ему", "теперь", "когда", "даже",
    "ну", "ли", "если", "уже", "или", "ни", "быть", "был", "него", "до",
    "вас", "нибудь", "опять", "уж", "вам", "ведь", "там", "потом",
    "себя", "ничего", "ей", "может", "они", "тут", "где", "есть", "надо",
    "ней", "для", "мы", "тебя", "их", "чем", "была", "сам", "чтоб",
    "без", "будто", "чего", "раз", "тоже", "себе", "под", "будет")

  /** Porter stemmer (English), standard algorithm. Pure function. */
  def porterStem(word: String): String = PorterStemmer.stem(word)

  /** Full Russian Snowball stemmer (the published algorithm, implemented
    * from the public spec at snowballstem.org — RV/R1/R2 regions,
    * а/я-conditioned suffix groups, longest-match among semantics).
    * Matches the reference's ES `russian_stemmer` analyzer stage
    * (movies.es.schema.json:27-39).
    */
  def russianStem(word: String): String = RussianStemmer.stem(word)

  /** Stem one token by script: cyrillic → ru, latin → en (with possessive
    * strip), other → unchanged.
    */
  def stemToken(tok: String): String =
    if (tok.isEmpty) tok
    else if (tok.exists(c => c >= 'а' && c <= 'я' || c == 'ё')) russianStem(tok)
    else if (tok.exists(c => c >= 'a' && c <= 'z')) {
      val noPoss =
        if (tok.endsWith("'s")) tok.dropRight(2)
        else if (tok.endsWith("'")) tok.dropRight(1)
        else tok
      porterStem(noPoss)
    } else tok

  /** Lowercase + tokenize on non-letter/digit boundaries (unicode-aware),
    * dropping empties. Pure Column expression.
    */
  def tokenizeCol(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{Nd}']+"), t => length(t) > 0)

  def removeStopwords(toks: Column): Column = {
    val stop = (EnglishStop ++ RussianStop).toSeq.sorted
    filter(toks, t => !t.isin(stop.map(lit): _*))
  }

  /** Full analysis: text → array of analyzed (stemmed, stopped) tokens.
    * Null-safe: null text → []. Hot path: the fused native expression
    * (functions.AnalyzeText); [[analyzeHof]] is the layered Column
    * reference formulation it is equivalence-checked against.
    */
  def analyze(text: Column): Column =
    coalesce(
      graft.functions.GraftColumns.analyzeText(text),
      array().cast("array<string>"))

  /** Layered Column reference formulation (tokenize HOF → stopword
    * isin filter → per-token native stem) — independent layering around
    * the shared stem kernel; keeps the fused expression honest in
    * AnalyzeNativeSpec. The stem stage is the StemTokens expression
    * (was the engine's last scalar UDF — same kernel, no per-row
    * Seq[String] ser/de).
    */
  def analyzeHof(text: Column): Column =
    coalesce(
      graft.functions.GraftColumns.stemTokens(
        removeStopwords(tokenizeCol(text))),
      array().cast("array<string>"))
}

/** Porter 1980, the classic 5-step suffix stripper. Self-contained. */
private[movies] object PorterStemmer {

  private def isVowel(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** measure m = number of VC sequences in the word. */
  private def m(w: String): Int = {
    var count = 0; var i = 0; val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) { count += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    count
  }

  private def hasVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))
  private def doubleC(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) &&
      !isVowel(w, w.length - 1)
  /** cvc with final c not w/x/y — triggers e-restore. */
  private def cvc(w: String): Boolean =
    w.length >= 3 && !isVowel(w, w.length - 3) && isVowel(w, w.length - 2) &&
      !isVowel(w, w.length - 1) && !"wxy".contains(w.last)

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    if (w.endsWith("eed")) {
      if (m(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3)))
          Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w = s
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (doubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
        else if (m(w) == 1 && cvc(w)) w += "e"
      }
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1)))
      w = w.dropRight(1) + "i"

    // step 2
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
      "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach {
      case (suf, rep) =>
        val stemPart = w.dropRight(suf.length)
        if (m(stemPart) > 0) w = stemPart + rep
    }

    // step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach {
      case (suf, rep) =>
        val stemPart = w.dropRight(suf.length)
        if (m(stemPart) > 0) w = stemPart + rep
    }

    // step 4
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(w.endsWith).foreach { suf =>
      val stemPart = w.dropRight(suf.length)
      val ok =
        if (suf == "ion")
          m(stemPart) > 1 && (stemPart.endsWith("s") || stemPart.endsWith("t"))
        else m(stemPart) > 1
      if (ok) w = stemPart
    }
    if (w.endsWith("ion")) {
      val stemPart = w.dropRight(3)
      if (m(stemPart) > 1 &&
        (stemPart.endsWith("s") || stemPart.endsWith("t"))) w = stemPart
    }

    // step 5a
    if (w.endsWith("e")) {
      val stemPart = w.dropRight(1)
      if (m(stemPart) > 1 || (m(stemPart) == 1 && !cvc(stemPart)))
        w = stemPart
    }
    // step 5b
    if (m(w) > 1 && doubleC(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }
}

/** Russian Snowball stemmer — complete implementation of the published
  * algorithm (public spec + reference Snowball script semantics):
  *
  *  - regions: RV = after the first vowel; R1 = after the first
  *    non-vowel following a vowel; R2 = same, computed inside R1.
  *    All matching is confined to RV; DERIVATIONAL additionally
  *    requires R2.
  *  - `among` semantics: the LONGEST suffix that fits inside RV wins;
  *    if that suffix carries the "must directly follow а/я" group-1
  *    condition and the condition fails, the whole among fails — no
  *    backtracking to shorter suffixes (exactly Snowball's among).
  *  - steps: 1) perfective gerund, else [reflexive] + (adjectival |
  *    verb | noun); 2) trailing и; 3) derivational (in R2);
  *    4) tidy-up (superlative / undouble нн / trailing ь).
  */
private[movies] object RussianStemmer {
  private val Vowels = "аеиоуыэюя"
  private def isVowel(c: Char): Boolean = Vowels.indexOf(c) >= 0

  /** A suffix, optionally group-1-conditioned (must follow а/я). */
  private final case class End(s: String, aya: Boolean = false)

  private val PerfGerund = Seq(
    End("в", aya = true), End("вши", aya = true), End("вшись", aya = true),
    End("ив"), End("ивши"), End("ившись"),
    End("ыв"), End("ывши"), End("ывшись"))

  private val Reflexive = Seq(End("ся"), End("сь"))

  private val Adjective = Seq(
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
    .map(End(_))

  private val Participle = Seq(
    End("ем", aya = true), End("нн", aya = true), End("вш", aya = true),
    End("ющ", aya = true), End("щ", aya = true),
    End("ивш"), End("ывш"), End("ующ"))

  private val Verb = Seq(
    End("ла", aya = true), End("на", aya = true), End("ете", aya = true),
    End("йте", aya = true), End("ли", aya = true), End("й", aya = true),
    End("л", aya = true), End("ем", aya = true), End("н", aya = true),
    End("ло", aya = true), End("но", aya = true), End("ет", aya = true),
    End("ют", aya = true), End("ны", aya = true), End("ть", aya = true),
    End("ешь", aya = true), End("нно", aya = true),
    End("ила"), End("ыла"), End("ена"), End("ейте"), End("уйте"),
    End("ите"), End("или"), End("ыли"), End("ей"), End("уй"), End("ил"),
    End("ыл"), End("им"), End("ым"), End("ен"), End("ило"), End("ыло"),
    End("ено"), End("ят"), End("ует"), End("уют"), End("ит"), End("ыт"),
    End("ены"), End("ить"), End("ыть"), End("ишь"), End("ую"), End("ю"))

  private val Noun = Seq(
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я").map(End(_))

  /** RV = region after the first vowel. */
  private def rvStart(w: String): Int = {
    val i = w.indexWhere(isVowel)
    if (i < 0) w.length else i + 1
  }

  /** End index of the first vowel→non-vowel transition at or after
    * `from`; the region after it (R1/R2 depending on `from`).
    */
  private def vcEnd(w: String, from: Int): Int = {
    var i = math.max(from, 0)
    while (i < w.length - 1) {
      if (isVowel(w(i)) && !isVowel(w(i + 1))) return i + 2
      i += 1
    }
    w.length
  }

  /** Snowball `among` over RV: longest suffix fitting in RV wins; a
    * failing group-1 (а/я) condition fails the whole among.
    */
  private def among(w: String, rv: Int, ends: Seq[End]): Option[String] = {
    val cand = ends.filter(e => w.endsWith(e.s) && w.length - e.s.length >= rv)
    if (cand.isEmpty) None
    else {
      val hit = cand.maxBy(_.s.length)
      if (!hit.aya) Some(w.dropRight(hit.s.length))
      else {
        val p = w.length - hit.s.length - 1
        if (p >= rv && (w(p) == 'а' || w(p) == 'я'))
          Some(w.dropRight(hit.s.length))
        else None
      }
    }
  }

  def stem(word: String): String = {
    val w0 = word.replace('ё', 'е')
    if (w0.isEmpty) return w0
    val rv = rvStart(w0)
    val r2 = vcEnd(w0, vcEnd(w0, 0))
    var w = w0

    // Step 1: perfective gerund | ([reflexive] adjectival|verb|noun)
    among(w, rv, PerfGerund) match {
      case Some(s) => w = s
      case None =>
        among(w, rv, Reflexive).foreach(s => w = s)
        among(w, rv, Adjective) match {
          case Some(s) =>
            w = s
            among(w, rv, Participle).foreach(s2 => w = s2)
          case None =>
            among(w, rv, Verb) match {
              case Some(s) => w = s
              case None => among(w, rv, Noun).foreach(s => w = s)
            }
        }
    }

    // Step 2: trailing и
    if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)

    // Step 3: derivational, must lie in R2
    Seq("ость", "ост")
      .find(s => w.endsWith(s) && w.length - s.length >= math.max(r2, rv))
      .foreach(s => w = w.dropRight(s.length))

    // Step 4: tidy-up — longest of {ейше, ейш, н, ь} in RV
    val tidy = Seq("ейше", "ейш", "н", "ь")
      .filter(s => w.endsWith(s) && w.length - s.length >= rv)
    if (tidy.nonEmpty) {
      tidy.maxBy(_.length) match {
        case sup @ ("ейше" | "ейш") =>
          w = w.dropRight(sup.length)
          if (w.endsWith("нн") && w.length - 2 >= rv) w = w.dropRight(1)
        case "н" =>
          if (w.length >= 2 && w(w.length - 2) == 'н' && w.length - 2 >= rv)
            w = w.dropRight(1)
        case "ь" => w = w.dropRight(1)
        case _ => ()
      }
    }
    w
  }
}
