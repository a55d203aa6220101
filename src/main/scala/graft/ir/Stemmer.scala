package graft.ir

/**
 * P6: optional stemming, OFF by default (the reference exposes `stem=<lang>`
 * in its analyzer config and delegates to NLTK's SnowballStemmer,
 * `IR_server/IR_python/modulos/LexAnalyser.py:56-57,112-117`; its own query
 * side ships with it off). Re-implemented from the published algorithm
 * descriptions (no NLTK offline): Porter (1980) for English, the Snowball
 * Spanish algorithm for Spanish. Pure (String => String), deterministic, no
 * locale dependence — safe inside distributed UDFs at any parallelism, and
 * shared verbatim between index build and query normalization so stemmed
 * indexes keep index/query symmetry.
 */
object Stemmer extends Serializable {

  /** Language codes accepted by AnalyzerConfig.stem. */
  def apply(lang: String): String => String = lang.toLowerCase match {
    case "en" | "english" => english
    case "es" | "spanish" => spanish
    case other => throw new IllegalArgumentException(
      s"unsupported stem language '$other' (en|es)")
  }

  // ------------------------------------------------------------- English

  private def isVowelEn(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelEn(w, i - 1)
    case _ => false
  }

  /** Porter's measure m: number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowelEn(w, i)) i += 1 // skip initial C*
    while (i < n) {
      while (i < n && isVowelEn(w, i)) i += 1 // V+
      if (i < n) { m += 1; while (i < n && !isVowelEn(w, i)) i += 1 } // C+
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowelEn(w, _))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.last == w.charAt(w.length - 2) && !isVowelEn(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 && !isVowelEn(w, w.length - 3) && isVowelEn(w, w.length - 2) &&
      !isVowelEn(w, w.length - 1) && !"wxy".contains(w.last)

  /** Porter (1980) — the classic 5-step suffix stripper. */
  val english: String => String = { word =>
    if (word.length <= 2) word
    else {
      var w = word
      // step 1a
      if (w.endsWith("sses")) w = w.dropRight(2)
      else if (w.endsWith("ies")) w = w.dropRight(2)
      else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)
      // step 1b
      if (w.endsWith("eed")) {
        if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
      } else {
        val hit =
          if (w.endsWith("ed") && containsVowel(w.dropRight(2))) { w = w.dropRight(2); true }
          else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) { w = w.dropRight(3); true }
          else false
        if (hit) {
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
          else if (measure(w) == 1 && endsCvc(w)) w += "e"
        }
      }
      // step 1c
      if (w.endsWith("y") && containsVowel(w.dropRight(1)))
        w = w.dropRight(1) + "i"
      // step 2 (m > 0)
      val step2 = Seq(
        "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
        "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
        "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
        "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
        "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
      step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
        val stem = w.dropRight(s.length)
        if (measure(stem) > 0) w = stem + r
      }
      // step 3 (m > 0)
      val step3 = Seq(
        "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
        "ical" -> "ic", "ful" -> "", "ness" -> "")
      step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
        val stem = w.dropRight(s.length)
        if (measure(stem) > 0) w = stem + r
      }
      // step 4 (m > 1)
      val step4 = Seq(
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
      step4.find(w.endsWith).foreach { s =>
        val stem = w.dropRight(s.length)
        val ok = s != "ion" || (stem.nonEmpty && "st".contains(stem.last))
        if (ok && measure(stem) > 1) w = stem
      }
      // step 5a
      if (w.endsWith("e")) {
        val stem = w.dropRight(1)
        val m = measure(stem)
        if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
      }
      // step 5b
      if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w = w.dropRight(1)
      w
    }
  }

  // ------------------------------------------------------------- Spanish

  private val VowelsEs = "aeiouáéíóúü"

  private def isVowelEs(c: Char): Boolean = VowelsEs.indexOf(c) >= 0

  /** Standard snowball regions. R1: after the first non-vowel following a
    * vowel; R2: R1's rule applied inside R1; RV: see the Spanish spec. */
  private def r1r2rv(w: String): (Int, Int, Int) = {
    val n = w.length
    def regionAfter(from: Int): Int = {
      var i = from
      while (i < n && !isVowelEs(w.charAt(i))) i += 1 // to first vowel
      while (i < n && isVowelEs(w.charAt(i))) i += 1  // through vowels
      if (i < n) i + 1 else n                          // past the non-vowel
    }
    // r1 starts after first vowel-then-nonvowel
    var i = 0
    while (i < n && !isVowelEs(w.charAt(i))) i += 1
    while (i < n && isVowelEs(w.charAt(i))) i += 1
    val r1 = if (i < n) i + 1 else n
    var j = r1
    while (j < n && !isVowelEs(w.charAt(j))) j += 1
    while (j < n && isVowelEs(w.charAt(j))) j += 1
    val r2 = if (j < n) j + 1 else n
    val rv =
      if (n < 3) n
      else if (!isVowelEs(w.charAt(1))) { // X C → after next vowel
        var k = 2
        while (k < n && !isVowelEs(w.charAt(k))) k += 1
        if (k < n) k + 1 else n
      } else if (isVowelEs(w.charAt(0)) && isVowelEs(w.charAt(1))) { // V V → after next consonant
        var k = 2
        while (k < n && isVowelEs(w.charAt(k))) k += 1
        if (k < n) k + 1 else n
      } else 3 // C V → after third letter
    (math.min(r1, n), math.min(r2, n), math.min(rv, n))
  }

  private def deaccent(c: Char): Char = c match {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case other => other
  }

  /** Snowball Spanish (snowballstem.org algorithm). */
  val spanish: String => String = { word =>
    var w = word
    def inR1(pos: Int) = pos >= r1r2rv(w)._1
    def inR2(pos: Int) = pos >= r1r2rv(w)._2
    def inRV(pos: Int) = pos >= r1r2rv(w)._3
    def suffixInRV(s: String): Boolean =
      w.endsWith(s) && inRV(w.length - s.length)
    def suffixInR1(s: String): Boolean =
      w.endsWith(s) && inR1(w.length - s.length)
    def suffixInR2(s: String): Boolean =
      w.endsWith(s) && inR2(w.length - s.length)

    // step 0: attached pronouns after a gerund/infinitive ending in RV
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les", "los",
      "nos", "me", "se", "la", "le", "lo")
    val preAccented = Seq("ándo", "iéndo", "ár", "ér", "ír")
    val prePlain = Seq("ando", "iendo", "ar", "er", "ir")
    pronouns.find(w.endsWith).foreach { p =>
      val base = w.dropRight(p.length)
      preAccented.find(base.endsWith) match {
        case Some(pre) if inRV(base.length - pre.length) =>
          w = base.map(deaccent) // remove pronoun, deaccent the ending
        case _ =>
          prePlain.find(base.endsWith) match {
            case Some(pre) if inRV(base.length - pre.length) => w = base
            case _ =>
              if (base.endsWith("yendo") &&
                base.length > 5 && base.charAt(base.length - 6) == 'u' &&
                inRV(base.length - 5)) w = base
          }
      }
    }

    val beforeStd = w
    // step 1: standard suffixes (longest match)
    val del2 = Seq("amientos", "imientos", "amiento", "imiento", "anzas",
      "ismos", "ables", "ibles", "istas", "anza", "icos", "icas", "ismo",
      "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
    val adorLike = Seq("adoras", "adores", "aciones", "adora", "ación",
      "antes", "ancias", "ador", "ante", "ancia")
    var done = false
    if (!done) del2.find(suffixInR2).foreach { s =>
      w = w.dropRight(s.length); done = true
    }
    if (!done) adorLike.find(suffixInR2).foreach { s =>
      w = w.dropRight(s.length)
      if (suffixInR2("ic")) w = w.dropRight(2)
      done = true
    }
    if (!done && (suffixInR2("logías") || suffixInR2("logía"))) {
      w = w.dropRight(if (w.endsWith("logías")) 6 else 5) + "log"; done = true
    }
    if (!done && (suffixInR2("uciones") || suffixInR2("ución"))) {
      w = w.dropRight(if (w.endsWith("uciones")) 7 else 5) + "u"; done = true
    }
    if (!done && (suffixInR2("encias") || suffixInR2("encia"))) {
      w = w.dropRight(if (w.endsWith("encias")) 6 else 5) + "ente"; done = true
    }
    if (!done && suffixInR1("amente")) {
      w = w.dropRight(6)
      if (suffixInR2("iv")) { w = w.dropRight(2); if (suffixInR2("at")) w = w.dropRight(2) }
      else Seq("os", "ic", "ad").find(suffixInR2).foreach(s => w = w.dropRight(s.length))
      done = true
    }
    if (!done && suffixInR2("mente")) {
      w = w.dropRight(5)
      Seq("ante", "able", "ible").find(suffixInR2).foreach(s => w = w.dropRight(s.length))
      done = true
    }
    if (!done && (suffixInR2("idades") || suffixInR2("idad"))) {
      w = w.dropRight(if (w.endsWith("idades")) 6 else 4)
      Seq("abil", "ic", "iv").find(suffixInR2).foreach(s => w = w.dropRight(s.length))
      done = true
    }
    if (!done && Seq("ivas", "ivos", "iva", "ivo").exists(suffixInR2)) {
      val s = Seq("ivas", "ivos", "iva", "ivo").find(suffixInR2).get
      w = w.dropRight(s.length)
      if (suffixInR2("at")) w = w.dropRight(2)
      done = true
    }

    // step 2 (verb suffixes) only if step 1 removed nothing
    if (w == beforeStd) {
      // 2a: -y* endings preceded by u, in RV
      val ySuf = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
        "yes", "ya", "ye", "yo", "yó")
      val hit2a = ySuf.find(s => suffixInRV(s) &&
        w.length > s.length && w.charAt(w.length - s.length - 1) == 'u')
      hit2a match {
        case Some(s) => w = w.dropRight(s.length)
        case None =>
          // 2b: other verb suffixes in RV; longest-match via length sort.
          // The 'gu' group additionally drops the u of a preceding 'gu'.
          val gu = Seq("emos", "éis", "en", "es")
          val plain = Seq(
            "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
            "aríais", "aseis", "eríais", "iríais", "ierais", "ieseis",
            "asteis", "isteis", "ábamos", "áramos", "ásemos",
            "arían", "arías", "aréis", "erían", "erías", "eréis",
            "irían", "irías", "iréis", "ieran", "iesen", "ieron", "iendo",
            "ieras", "ieses", "abais", "arais", "íamos",
            "arán", "arás", "aría", "erán", "erás", "ería",
            "irán", "irás", "iría", "iera", "iese", "aste", "iste",
            "aban", "aran", "asen", "aron", "ando", "abas", "adas",
            "idas", "aras", "ases", "íais", "ados", "idos", "amos", "imos",
            "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
            "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
            "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
            "ís", "ás", "é", "ó").sortBy(-_.length)
          val guHit = gu.filter(suffixInRV).sortBy(-_.length).headOption
          val plainHit = plain.find(suffixInRV)
          (guHit, plainHit) match {
            case (Some(g), Some(p)) if p.length > g.length =>
              w = w.dropRight(p.length)
            case (Some(g), _) =>
              w = w.dropRight(g.length)
              if (w.endsWith("gu")) w = w.dropRight(1)
            case (None, Some(p)) => w = w.dropRight(p.length)
            case _ =>
          }
      }
    }

    // step 3: residual suffix
    val resid1 = Seq("os", "a", "o", "á", "í", "ó")
    resid1.find(suffixInRV) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        if (suffixInRV("e") || suffixInRV("é")) {
          w = w.dropRight(1)
          if (w.endsWith("gu") && inRV(w.length - 1)) w = w.dropRight(1)
        }
    }
    w.map(deaccent)
  }
}
