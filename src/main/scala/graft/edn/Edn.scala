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

  /** Character supply for the parser: a fast in-memory String cursor
    * and a bounded-memory Reader cursor (the reference parses one form
    * at a time from a Reader and never slurps the file,
    * `src/cognitect/xform/async_edn.clj:39-48`). */
  sealed trait CharCursor {
    def peek(): Int
    def peek2(): Int
    def read(): Int
    def pos: Int
  }
  final class StringCursor(s: String) extends CharCursor {
    private var i = 0
    def peek(): Int = if (i < s.length) s.charAt(i) else -1
    def peek2(): Int = if (i + 1 < s.length) s.charAt(i + 1) else -1
    def read(): Int = { val c = peek(); if (c >= 0) i += 1; c }
    def pos: Int = i
  }
  final class ReaderCursor(rd: java.io.Reader) extends CharCursor {
    private val in = new java.io.PushbackReader(rd, 2)
    private var i = 0
    def peek(): Int = { val c = in.read(); if (c >= 0) in.unread(c); c }
    def peek2(): Int = {
      val c1 = in.read()
      if (c1 < 0) return -1
      val c2 = in.read()
      if (c2 >= 0) in.unread(c2)
      in.unread(c1)
      c2
    }
    def read(): Int = { val c = in.read(); if (c >= 0) i += 1; c }
    def pos: Int = i
  }

  /** Streaming form-at-a-time parser. `#_` discards are consumed at the
    * form-sequence level (nextForm / readSeq), never returned as
    * values — `[1 2 #_3]` is a 2-vector and a trailing top-level
    * `#_x` is legal EDN, not an EOF error. */
  final class Parser(cur: CharCursor) {
    def this(s: String) = this(new StringCursor(s))
    def this(rd: java.io.Reader) = this(new ReaderCursor(rd))

    private def err(msg: String) = throw new ParseException(msg, cur.pos)

    def nextForm(): Option[Edn] = {
      skipWsAndDiscards()
      if (cur.peek() < 0) None else Some(readForm())
    }

    private def skipWs(): Unit = {
      var go = true
      while (go) {
        val c = cur.peek()
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',') cur.read()
        else if (c == ';') {
          var d = cur.read()
          while (d >= 0 && d != '\n') d = cur.read()
        }
        else go = false
      }
    }

    /** Whitespace, comments, and any number of `#_form` discards. */
    private def skipWsAndDiscards(): Unit = {
      var go = true
      while (go) {
        skipWs()
        if (cur.peek() == '#' && cur.peek2() == '_') {
          cur.read(); cur.read()
          readForm() // the discarded form (readForm skips nested discards)
        } else go = false
      }
    }

    private def readForm(): Edn = {
      skipWsAndDiscards()
      val c = cur.peek()
      if (c < 0) err("unexpected EOF")
      c.toChar match {
        case '(' => cur.read(); EList(readSeq(')'))
        case '[' => cur.read(); EVec(readSeq(']'))
        case '{' => cur.read(); readMap("")
        case '"' => EStr(readString())
        case ':' => cur.read(); readKeyword()
        case '#' => readDispatch()
        case '\\' => readCharLit()
        case ch if ch == '-' || ch == '+' || (ch >= '0' && ch <= '9') => readNumberOrSym()
        case _ => readSymbolish()
      }
    }

    private def readSeq(close: Char): Vector[Edn] = {
      val out = Vector.newBuilder[Edn]
      skipWsAndDiscards()
      while (cur.peek() >= 0 && cur.peek() != close) {
        out += readForm()
        skipWsAndDiscards()
      }
      if (cur.peek() < 0) err(s"unterminated sequence, expected '$close'")
      cur.read()
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
      cur.read() // opening quote
      val sb = new StringBuilder
      var c = cur.read()
      while (c >= 0 && c != '"') {
        if (c == '\\') {
          val esc = cur.read()
          if (esc < 0) err("unterminated escape")
          esc.toChar match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              val hex = new Array[Char](4)
              var k = 0
              while (k < 4) {
                val h = cur.read()
                if (h < 0) err("bad unicode escape")
                hex(k) = h.toChar; k += 1
              }
              sb += Integer.parseInt(new String(hex), 16).toChar
            case other => err(s"unknown escape \\$other")
          }
        } else sb += c.toChar
        c = cur.read()
      }
      if (c < 0) err("unterminated string")
      sb.toString
    }

    private def isTerminator(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',' ||
      c == '(' || c == ')' || c == '[' || c == ']' || c == '{' || c == '}' ||
      c == '"' || c == ';'

    private def readToken(): String = {
      val sb = new StringBuilder
      var c = cur.peek()
      while (c >= 0 && !isTerminator(c.toChar)) {
        sb += cur.read().toChar
        c = cur.peek()
      }
      sb.toString
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
      cur.read() // '\'
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
        case "" => err(s"unexpected character '${cur.peek().toChar}'")
        case "nil" => ENil
        case "true" => EBool(true)
        case "false" => EBool(false)
        case _ => val (ns, n) = splitNs(tok); ESym(ns, n)
      }
    }

    private def readDispatch(): Edn = {
      cur.read() // '#'
      val c = cur.peek()
      if (c < 0) err("unexpected EOF after #")
      c.toChar match {
        case '{' => cur.read(); ESet(readSeq('}'))
        case ':' => // namespaced map #:ns{...}
          cur.read()
          val nsTok = new StringBuilder
          var n = cur.peek()
          while (n >= 0 && n != '{' && !isTerminator(n.toChar)) {
            nsTok += cur.read().toChar; n = cur.peek()
          }
          skipWs()
          if (cur.peek() != '{') err("expected { after #:ns")
          cur.read()
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
