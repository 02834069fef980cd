package graft.edn

/** Minimal EDN value model, parser, and printer (pure Scala, no deps).
  *
  * Covers the subset the reference corpus uses (see
  * `/root/reference/subsets/`): nil, booleans, longs, doubles, strings,
  * keywords, symbols, lists/vectors/maps/sets, `#uuid` tagged literals,
  * namespaced-map syntax `#:ns{...}`, comments, and `#_` discard.
  *
  * Maps preserve insertion order (like Clojure's array-maps for the
  * file sizes involved) — load-bearing for golden-file parity, because
  * the reference's dictionary pipelines iterate maps in file order
  * (`src/datomic/mbrainz/importer.clj:190-201`). Equality is
  * order-insensitive (map semantics).
  */
sealed trait Edn
object Edn {
  case object ENil extends Edn
  final case class EBool(value: Boolean) extends Edn
  final case class ELong(value: Long) extends Edn
  final case class EDouble(value: Double) extends Edn
  final case class EStr(value: String) extends Edn
  /** `ns` is empty for unqualified keywords. */
  final case class EKw(ns: String, name: String) extends Edn {
    def qualified: String = if (ns.isEmpty) name else s"$ns/$name"
  }
  final case class ESym(ns: String, name: String) extends Edn {
    def qualified: String = if (ns.isEmpty) name else s"$ns/$name"
  }
  /** Canonical lowercase UUID text (SURVEY.md §1.2: Spark has no UUID type). */
  final case class EUuid(value: String) extends Edn
  final case class EVec(items: Vector[Edn]) extends Edn
  final case class EList(items: Vector[Edn]) extends Edn
  final case class ESet(items: Vector[Edn]) extends Edn {
    override def equals(o: Any): Boolean = o match {
      case ESet(other) => items.toSet == other.toSet
      case _ => false
    }
    override def hashCode: Int = items.toSet.hashCode
  }
  /** Insertion-ordered; equality/hash by unordered map semantics. */
  final class EMap(val entries: Vector[(Edn, Edn)]) extends Edn {
    lazy val toMap: Map[Edn, Edn] = entries.toMap
    def get(k: Edn): Option[Edn] = toMap.get(k)
    def getKw(name: String): Option[Edn] = {
      val i = name.indexOf('/')
      val kw = if (i < 0) EKw("", name) else EKw(name.substring(0, i), name.substring(i + 1))
      toMap.get(kw)
    }
    override def equals(o: Any): Boolean = o match {
      case m: EMap => toMap == m.toMap
      case _ => false
    }
    override def hashCode: Int = toMap.hashCode
    override def toString: String = Edn.print(this)
  }
  object EMap {
    def apply(entries: (Edn, Edn)*): EMap = new EMap(entries.toVector)
    def apply(entries: Vector[(Edn, Edn)]): EMap = new EMap(entries)
  }
  final case class ETagged(tag: String, value: Edn) extends Edn

  def kw(qualified: String): EKw = {
    val i = qualified.indexOf('/')
    if (i < 0) EKw("", qualified) else EKw(qualified.substring(0, i), qualified.substring(i + 1))
  }

  // ── Parser ─────────────────────────────────────────────────────────
  final class ParseException(msg: String, val pos: Int) extends RuntimeException(s"$msg at offset $pos")

  /** Parse every top-level form in `s`. */
  def parseAll(s: String): Vector[Edn] = {
    val p = new Parser(s)
    val out = Vector.newBuilder[Edn]
    var form = p.nextForm()
    while (form.isDefined) { out += form.get; form = p.nextForm() }
    out.result()
  }

  def parse(s: String): Edn =
    new Parser(s).nextForm().getOrElse(throw new ParseException("no form", 0))

  /** Streaming form-at-a-time parser (the reference reads one form at a
    * time, `src/cognitect/xform/async_edn.clj:39-48`; callers iterate
    * without materializing the whole file's forms). */
  final class Parser(s: String) {
    private var i = 0
    private def err(msg: String) = throw new ParseException(msg, i)

    def nextForm(): Option[Edn] = {
      skipWs()
      if (i >= s.length) None else Some(readForm())
    }

    private def skipWs(): Unit = {
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',') i += 1
        else if (c == ';') { while (i < s.length && s.charAt(i) != '\n') i += 1 }
        else go = false
      }
    }

    private def readForm(): Edn = {
      skipWs()
      if (i >= s.length) err("unexpected EOF")
      s.charAt(i) match {
        case '(' => i += 1; EList(readSeq(')'))
        case '[' => i += 1; EVec(readSeq(']'))
        case '{' => i += 1; readMap("")
        case '"' => EStr(readString())
        case ':' => i += 1; readKeyword()
        case '#' => readDispatch()
        case '\\' => readCharLit()
        case c if c == '-' || c == '+' || (c >= '0' && c <= '9') => readNumberOrSym()
        case _ => readSymbolish()
      }
    }

    private def readSeq(close: Char): Vector[Edn] = {
      val out = Vector.newBuilder[Edn]
      skipWs()
      while (i < s.length && s.charAt(i) != close) {
        out += readForm()
        skipWs()
      }
      if (i >= s.length) err(s"unterminated sequence, expected '$close'")
      i += 1
      out.result()
    }

    private def readMap(defaultNs: String): EMap = {
      val items = readSeq('}')
      if (items.size % 2 != 0) err("map with odd number of forms")
      val entries = items.grouped(2).map { pair =>
        val k = pair(0) match {
          case EKw("", n) if defaultNs.nonEmpty => EKw(defaultNs, n)
          case EKw("_", n) if defaultNs.nonEmpty => EKw("", n) // #:ns{:_/k} opts out
          case other => other
        }
        (k, pair(1))
      }.toVector
      EMap(entries)
    }

    private def readString(): String = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err("unterminated escape")
          s.charAt(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              if (i + 4 >= s.length) err("bad unicode escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => err(s"unknown escape \\$other")
          }
          i += 1
        } else { sb += c; i += 1 }
      }
      if (i >= s.length) err("unterminated string")
      i += 1
      sb.toString
    }

    private def isTerminator(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',' ||
      c == '(' || c == ')' || c == '[' || c == ']' || c == '{' || c == '}' ||
      c == '"' || c == ';'

    private def readToken(): String = {
      val start = i
      while (i < s.length && !isTerminator(s.charAt(i))) i += 1
      s.substring(start, i)
    }

    private def splitNs(tok: String): (String, String) = {
      val j = tok.indexOf('/')
      if (j <= 0 || j == tok.length - 1) ("", tok) else (tok.substring(0, j), tok.substring(j + 1))
    }

    private def readKeyword(): EKw = {
      val tok = readToken()
      if (tok.isEmpty) err("empty keyword")
      val (ns, name) = splitNs(tok)
      EKw(ns, name)
    }

    private def readCharLit(): Edn = {
      i += 1
      val tok = readToken()
      val ch = tok match {
        case "newline" => '\n'
        case "space" => ' '
        case "tab" => '\t'
        case "return" => '\r'
        case "backslash" => '\\'
        case t if t.length == 1 => t.charAt(0)
        case t if t.startsWith("u") && t.length == 5 => Integer.parseInt(t.substring(1), 16).toChar
        case _ => err(s"unsupported char literal \\$tok")
      }
      EStr(ch.toString)
    }

    private def readNumberOrSym(): Edn = {
      val tok = readToken()
      if (tok == "-" || tok == "+") { val (ns, n) = splitNs(tok); return ESym(ns, n) }
      parseNumber(tok)
    }

    private def parseNumber(tok: String): Edn = {
      val t = if (tok.endsWith("N") || tok.endsWith("M")) tok.dropRight(1) else tok
      if (t.exists(c => c == '.' || c == 'e' || c == 'E') &&
          !(t.startsWith("0x") || t.startsWith("-0x")))
        EDouble(java.lang.Double.parseDouble(t))
      else ELong(java.lang.Long.parseLong(t))
    }

    private def readSymbolish(): Edn = {
      val tok = readToken()
      tok match {
        case "nil" => ENil
        case "true" => EBool(true)
        case "false" => EBool(false)
        case _ => val (ns, n) = splitNs(tok); ESym(ns, n)
      }
    }

    private def readDispatch(): Edn = {
      i += 1 // '#'
      if (i >= s.length) err("unexpected EOF after #")
      s.charAt(i) match {
        case '{' => i += 1; ESet(readSeq('}'))
        case '_' => i += 1; readForm(); readForm() // discard next form
        case ':' => // namespaced map #:ns{...}
          i += 1
          val nsTok = new StringBuilder
          while (i < s.length && s.charAt(i) != '{' && !isTerminator(s.charAt(i))) {
            nsTok += s.charAt(i); i += 1
          }
          skipWs()
          if (i >= s.length || s.charAt(i) != '{') err("expected { after #:ns")
          i += 1
          readMap(nsTok.toString)
        case _ =>
          val tag = readToken()
          val v = readForm()
          tag match {
            case "uuid" => v match {
              case EStr(u) => EUuid(u.toLowerCase)
              case _ => err("#uuid expects a string")
            }
            case "inst" => v match {
              case EStr(ts) => ETagged("inst", EStr(ts))
              case _ => err("#inst expects a string")
            }
            case other => ETagged(other, v)
          }
      }
    }
  }

  // ── Printer ────────────────────────────────────────────────────────
  def escape(raw: String): String = {
    val sb = new StringBuilder
    raw.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c => sb += c
    }
    sb.toString
  }

  def print(e: Edn): String = e match {
    case ENil => "nil"
    case EBool(b) => b.toString
    case ELong(l) => l.toString
    case EDouble(d) => d.toString
    case EStr(v) => "\"" + escape(v) + "\""
    case k: EKw => ":" + k.qualified
    case s: ESym => s.qualified
    case EUuid(u) => "#uuid \"" + u + "\""
    case EVec(items) => items.map(print).mkString("[", " ", "]")
    case EList(items) => items.map(print).mkString("(", " ", ")")
    case ESet(items) => items.map(print).mkString("#{", " ", "}")
    case m: EMap =>
      m.entries.map { case (k, v) => print(k) + " " + print(v) }.mkString("{", ", ", "}")
    case ETagged(tag, v) => "#" + tag + " " + print(v)
  }
}
