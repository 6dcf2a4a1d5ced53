package graft.operators

/** Hand-rolled linear scanners for the extract/encoding hot path (r21,
  * the r20 verdict's #1 item: the c117/c119 regex chain was the suite's
  * largest honest compute residue at ~9 task-cpu-s).
  *
  * Each function replicates ONE of the regex passes of the r20
  * [[Extract]] chain with exact pass-by-pass fidelity — the passes stay
  * SEQUENTIAL (comment scrub feeds script scrub feeds style scrub, block
  * tags before generic tags, entity replaces in their fixed order with
  * `&amp;` last) because the pass boundaries are semantically load-
  * bearing on adversarial inputs: a single-pass leftmost alternation of
  * the three scrub patterns decides `<script><!--</script>x-->`
  * differently than comment-scrub-then-script-scrub does (exactly the
  * leftmost-match hazard the r20 checklist refused to ship unverified).
  * What changes is the ENGINE: each pass is a linear indexOf/char scan
  * instead of a java.util.regex Matcher — no per-position NFA stepping,
  * no Matcher/StringBuffer machinery, ASCII-only case folding identical
  * to the (?i) flag's. Equivalence to the retired regex chain is pinned
  * by ExtractScanSpec's adversarial corpus + seeded fuzz differential
  * against [[Extract.htmlExtractOnRegex]] /
  * [[Extract.encodingFlagOnRegex]] (the r20 chain, kept as the spec
  * reference implementation). */
object ExtractScan {

  // Java regex \s (ASCII, no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  // Java regex \b's word class is NOT \w's ASCII class: Pattern.Bound
  // (without UNICODE_CHARACTER_CLASS) tests `ch == '_' ||
  // Character.isLetterOrDigit(ch)` over CODE POINTS — a Unicode letter
  // after "script" (e.g. U+0130) suppresses the boundary. Caught by the
  // adversarial differential; mirrored exactly here.
  @inline private def isBoundWordAt(s: String, i: Int): Boolean = {
    val cp = s.codePointAt(i)
    cp == '_'.toInt || Character.isLetterOrDigit(cp)
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  // ASCII-only case fold — (?i) without UNICODE_CASE folds ASCII letters
  // only (a Unicode-aware toLowerCase would e.g. match U+0130 against
  // 'i', which the regex chain never did)
  @inline private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** indexOf of an ASCII-lowercase needle, ASCII-case-insensitively. */
  private def indexOfIc(s: String, needle: String, from: Int): Int = {
    val n = needle.length
    val last = s.length - n
    var i = if (from < 0) 0 else from
    while (i <= last) {
      var j = 0
      while (j < n && asciiLower(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Does the ASCII-lowercase needle match at exactly position i? */
  @inline private def matchesIc(s: String, i: Int, needle: String): Boolean = {
    val n = needle.length
    if (i + n > s.length) return false
    var j = 0
    while (j < n && asciiLower(s.charAt(i + j)) == needle.charAt(j)) j += 1
    j == n
  }

  /** Pass 1 — `(?s)<!--.*?-->` → " ": each comment open pairs with the
    * FIRST "-->" at or after open+4 (non-greedy); an unpaired open
    * stays (no "-->" remains for any later open either). */
  private[operators] def scrubComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var pos = 0
    var go = true
    while (go && i >= 0) {
      val close = s.indexOf("-->", i + 4)
      if (close < 0) go = false // no close anywhere: no further match
      else {
        b.append(s, pos, i).append(' ')
        pos = close + 3
        i = s.indexOf("<!--", pos)
      }
    }
    b.append(s, pos, s.length).toString
  }

  /** Passes 2/3 — `(?is)<name\b[^>]*>.*?</name\s*>` → " ". `name` must
    * be ASCII lowercase. Open = "<name" with a non-word char next (the
    * \b), then the first '>'; close = the first "</name" + \s* + '>'
    * after the open's '>'; an open with no valid close is skipped (the
    * regex engine advances and tries the next open). */
  private[operators] def scrubTagBlock(s: String, name: String): String = {
    val open = "<" + name
    var i = indexOfIc(s, open, 0)
    if (i < 0) return s
    val close = "</" + name
    var b: java.lang.StringBuilder = null
    var pos = 0
    while (i >= 0) {
      val after = i + open.length
      var matched = false
      // \b after the name: next char non-word; end-of-input satisfies \b
      // but then [^>]*> cannot match (no '>')
      if (after >= s.length || !isBoundWordAt(s, after)) {
        val gt = s.indexOf('>', after)
        if (gt >= 0) {
          var closeEnd = -1
          var j = indexOfIc(s, close, gt + 1)
          while (closeEnd < 0 && j >= 0) {
            var k = j + close.length
            while (k < s.length && isSpace(s.charAt(k))) k += 1
            if (k < s.length && s.charAt(k) == '>') closeEnd = k + 1
            else j = indexOfIc(s, close, j + 1)
          }
          if (closeEnd >= 0) {
            if (b == null) b = new java.lang.StringBuilder(s.length)
            b.append(s, pos, i).append(' ')
            pos = closeEnd
            matched = true
            i = indexOfIc(s, open, closeEnd)
          }
        }
      }
      if (!matched) i = indexOfIc(s, open, i + 1)
    }
    if (b == null) s else b.append(s, pos, s.length).toString
  }

  /** The well-formedness/truncation marker — the first index matching
    * `(?is)<script\b|<style\b|<!--`, or -1. \b here is a pure
    * lookahead: end-of-input satisfies it (unlike the scrub pass, no
    * '>' is required after). */
  private[operators] def firstMarker(s: String): Int = {
    var i = s.indexOf('<')
    while (i >= 0) {
      if (s.startsWith("!--", i + 1)) return i
      if (matchesIc(s, i, "<script")) {
        if (i + 7 >= s.length || !isBoundWordAt(s, i + 7)) return i
      } else if (matchesIc(s, i, "<style")) {
        if (i + 6 >= s.length || !isBoundWordAt(s, i + 6)) return i
      }
      i = s.indexOf('<', i + 1)
    }
    -1
  }

  private val BlockNames: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    Seq("p", "div", "nav", "footer", "header", "section", "article",
      "aside", "main", "title", "head", "body", "html", "h1", "h2", "h3",
      "h4", "h5", "h6", "hr", "br", "li", "ul", "ol", "tr", "td", "thead",
      "tbody", "tfoot", "th", "table", "blockquote", "pre", "form")
      .foreach(h.add)
    h
  }

  /** Pass 5 — BlockTagRe → "\n": `</?` + a block name + `(?=[\s/>])` +
    * `[^>]*>`. The ordered alternation over block names is equivalent
    * to "maximal alphanumeric name ∈ set": the lookahead class [\s/>]
    * is disjoint from the name alphabet, so an alternative can only
    * match where the maximal name ends. A '<' failing any condition
    * stays literal (the generic-tag pass may still consume it). */
  private[operators] def blockTagsToNewlines(s: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      var j = i + 1
      if (j < s.length && s.charAt(j) == '/') j += 1
      val nameStart = j
      while (j < s.length && isAlnum(s.charAt(j))) j += 1
      var replaced = false
      if (j > nameStart && j < s.length) {
        val nc = s.charAt(j)
        if (isSpace(nc) || nc == '/' || nc == '>') {
          val nb = new java.lang.StringBuilder(j - nameStart)
          var k = nameStart
          while (k < j) { nb.append(asciiLower(s.charAt(k))); k += 1 }
          if (BlockNames.contains(nb.toString)) {
            val gt = s.indexOf('>', j)
            if (gt >= 0) {
              b.append(s, pos, i).append('\n')
              pos = gt + 1
              i = s.indexOf('<', pos)
              replaced = true
            }
          }
        }
      }
      if (!replaced) i = s.indexOf('<', i + 1)
    }
    b.append(s, pos, s.length).toString
  }

  /** Pass 6 — `<[^>]*>` → " ": every '<' pairs with the first '>' after
    * it (other '<'s in between ride inside the match); with no '>'
    * left, nothing later can match either. */
  private[operators] def genericTagsToSpaces(s: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var pos = 0
    var go = true
    while (go && i >= 0) {
      val gt = s.indexOf('>', i + 1)
      if (gt < 0) go = false
      else {
        b.append(s, pos, i).append(' ')
        pos = gt + 1
        i = s.indexOf('<', pos)
      }
    }
    b.append(s, pos, s.length).toString
  }

  private val EntityPairs: Array[(String, String)] = Array(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&copy;" -> "©", "&amp;" -> "&")

  /** Pass 7 — the entity decode: the same eight literal replaces in the
    * same order (`&amp;` last — never double-decode), each a plain
    * substring scan that no-ops when the key is absent. */
  private[operators] def decodeEntities(s0: String): String = {
    var s = s0
    var p = 0
    while (p < EntityPairs.length) {
      val k = EntityPairs(p)._1
      val v = EntityPairs(p)._2
      var i = s.indexOf(k)
      if (i >= 0) {
        val b = new java.lang.StringBuilder(s.length)
        var pos = 0
        while (i >= 0) {
          b.append(s, pos, i).append(v)
          pos = i + k.length
          i = s.indexOf(k, pos)
        }
        s = b.append(s, pos, s.length).toString
      }
      p += 1
    }
    s
  }

  /** Pass 8 — per line (split on '\n'): collapse \s+ runs to one space,
    * trim, keep lines with >= minWords space-separated words. "Tokens
    * joined by single spaces" IS the collapsed+trimmed form, and the
    * token count IS size(split(line, " ")) of that form. */
  private[operators] def keptLines(decoded: String,
                                   minWords: Int): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val n = decoded.length
    var ls = 0
    while (ls <= n) {
      var le = decoded.indexOf('\n', ls)
      if (le < 0) le = n
      val sb = new java.lang.StringBuilder(le - ls)
      var words = 0
      var i = ls
      while (i < le) {
        if (isSpace(decoded.charAt(i))) i += 1
        else {
          val ws = i
          while (i < le && !isSpace(decoded.charAt(i))) i += 1
          if (words > 0) sb.append(' ')
          sb.append(decoded, ws, i)
          words += 1
        }
      }
      if (words >= minWords) out += sb.toString
      ls = le + 1
    }
    out.toArray
  }

  /** The fused extract: the full c117 chain over one markup string.
    * Returns (well_formed, kept lines). */
  def extract(markup: String, minWords: Int): (Boolean, Array[String]) = {
    val x1 = scrubComments(markup)
    val x2 = scrubTagBlock(x1, "script")
    val x3 = scrubTagBlock(x2, "style")
    val m = firstMarker(x3)
    val wellFormed = m < 0
    val x4 = if (m < 0) x3 else x3.substring(0, m) + " "
    val decoded = decodeEntities(genericTagsToSpaces(blockTagsToNewlines(x4)))
    (wellFormed, keptLines(decoded, minWords))
  }

  // ------------------------------------------------------------- c118

  // CtrlClass: [\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x80-\x9F] — C0 minus
  // \t\n\r, DEL, and the C1 range
  @inline private def isCtrl(c: Char): Boolean =
    c <= '\u0008' || c == '\u000B' || c == '\u000C' ||
      (c >= '\u000E' && c <= '\u001F') || c == '\u007F' ||
      (c >= '\u0080' && c <= '\u009F')

  // MojiCont: [\x80-\xBF] ∪ the 26 cp1252-mapped chars (Extract.MojiCont)
  @inline private def isMojiCont(c: Char): Boolean =
    (c >= '\u0080' && c <= '\u00BF') || (c match {
      case '€' | '‚' | 'ƒ' | '„' | '…' |
           '†' | '‡' | 'ˆ' | '‰' | 'Š' |
           '‹' | 'Œ' | 'Ž' | '‘' | '’' |
           '“' | '”' | '•' | '–' | '—' |
           '˜' | '™' | 'š' | '›' | 'œ' |
           'Ÿ' => true
      case _ => false
    })

  /** The fused c118 pass: one scan computing n_fffd and n_ctrl (every
    * matching char, including those inside mojibake digraphs — the
    * independent regexp_count semantics), n_moji (leftmost
    * non-overlapping matches of `[ÂÃ]M|âMM`), and `repaired` (the
    * `(moji)|fffd|ctrl → $1` leftmost alternation: mojibake survives
    * byte-for-byte, bare replacement chars and controls scrub). */
  def encFlag(t: String): (Long, Long, Long, String) = {
    val n = t.length
    var fffd = 0L
    var ctrl = 0L
    var moji = 0L
    var b: java.lang.StringBuilder = null // lazily created on first scrub
    var pos = 0 // start of the pending verbatim region
    var i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (c == '\uFFFD') fffd += 1 else if (isCtrl(c)) ctrl += 1
      if ((c == '\u00C2' || c == '\u00C3') && i + 1 < n &&
          isMojiCont(t.charAt(i + 1))) {
        moji += 1
        val c1 = t.charAt(i + 1)
        if (c1 == '\uFFFD') fffd += 1 else if (isCtrl(c1)) ctrl += 1
        i += 2 // kept verbatim: the $1 self-replacement
      } else if (c == '\u00E2' && i + 2 < n && isMojiCont(t.charAt(i + 1)) &&
          isMojiCont(t.charAt(i + 2))) {
        moji += 1
        val c1 = t.charAt(i + 1)
        val c2 = t.charAt(i + 2)
        if (c1 == '\uFFFD') fffd += 1 else if (isCtrl(c1)) ctrl += 1
        if (c2 == '\uFFFD') fffd += 1 else if (isCtrl(c2)) ctrl += 1
        i += 3
      } else if (c == '\uFFFD' || isCtrl(c)) {
        if (b == null) b = new java.lang.StringBuilder(n)
        b.append(t, pos, i)
        pos = i + 1 // scrubbed
        i += 1
      } else i += 1
    }
    val repaired = if (b == null) t else b.append(t, pos, n).toString
    (fffd, ctrl, moji, repaired)
  }
}
