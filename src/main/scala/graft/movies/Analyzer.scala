package graft.movies

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ru_en analyzer pipeline (movies.es.schema.json:4-40): lowercase →
  * tokenize → en+ru stopword removal → en possessive strip → en Porter /
  * ru Snowball-light stemming.
  *
  * Applied identically to documents and queries so matching happens in
  * analyzed-token space (X3). Tokenize/lower/stopwords are pure Column
  * expressions; stemming is a scalar UDF over each token (pure Scala,
  * no external deps — SURVEY §7.2 allows UDF here, with a Catalyst
  * Expression as later polish if profiling demands).
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

  /** Snowball-light Russian stemmer: strips the standard ending classes
    * (perfective gerund, adjective, participle, reflexive, verb, noun,
    * superlative, derivational) from the RV region. Covers the forms the
    * search tests exercise; full Snowball ru is a drop-in upgrade.
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

  private val stemUdf = udf((toks: Seq[String]) =>
    if (toks == null) Seq.empty[String] else toks.map(stemToken))

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
    * Null-safe: null text → [].
    */
  def analyze(text: Column): Column =
    coalesce(
      stemUdf(removeStopwords(tokenizeCol(text))),
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

/** Light Russian Snowball: ending-class stripping inside RV. */
private[movies] object RussianStemmer {
  private val Vowels = "аеиоуыэюя"

  private val PerfGerund = Seq(
    "ившись", "ывшись", "вшись", "ивши", "ывши", "вши", "ив", "ыв", "в")
  private val Reflexive = Seq("ся", "сь")
  private val Adjective = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею")
  private val Participle = Seq("ивш", "ывш", "ующ", "ем", "нн", "вш", "ющ", "щ")
  private val Verb = Seq(
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят", "ует", "уют",
    "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю", "ла", "на", "ете",
    "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет", "ют", "ны", "ть",
    "ешь", "нно")
  private val Noun = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ьи", "ье",
    "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях",
    "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")
  private val Superlative = Seq("ейше", "ейш")
  private val Derivational = Seq("ость", "ост")

  /** RV = region after the first vowel. */
  private def rvStart(w: String): Int = {
    val i = w.indexWhere(c => Vowels.contains(c))
    if (i < 0) w.length else i + 1
  }

  private def stripOne(w: String, rv: Int, sufs: Seq[String]): Option[String] = {
    val hit = sufs.sortBy(-_.length)
      .find(s => w.endsWith(s) && w.length - s.length >= rv)
    hit.map(s => w.dropRight(s.length))
  }

  def stem(word: String): String = {
    var w = word.replace('ё', 'е')
    if (w.length <= 2) return w
    val rv = rvStart(w)

    // step 1: perfective gerund, else (reflexive?) adj/participle/verb/noun
    stripOne(w, rv, PerfGerund) match {
      case Some(s) => w = s
      case None =>
        stripOne(w, rv, Reflexive).foreach(s => w = s)
        stripOne(w, rv, Adjective) match {
          case Some(s) =>
            w = s
            stripOne(w, rv, Participle).foreach(s2 => w = s2)
          case None =>
            stripOne(w, rv, Verb) match {
              case Some(s) => w = s
              case None => stripOne(w, rv, Noun).foreach(s => w = s)
            }
        }
    }
    // step 2: trailing и
    if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)
    // step 3: derivational (approximated within RV)
    stripOne(w, rv, Derivational).foreach(s => w = s)
    // step 4: superlative, double н, trailing ь
    stripOne(w, rv, Superlative).foreach(s => w = s)
    if (w.endsWith("нн")) w = w.dropRight(1)
    if (w.endsWith("ь") && w.length - 1 >= rv) w = w.dropRight(1)
    w
  }
}
