package graft.json

/** Hand-rolled strict RFC 8259 recursive-descent parser into the graft ADT.
  *
  * Rationale: the engine parses millions of SMALL JSON-LD fragments
  * (~100-300 chars per span). Jackson's per-parse setup (parser object,
  * IOContext, 4 KiB char buffers) dominated the parse cost at that size and
  * was the single largest CPU+allocation frame in JFR. This parser walks the
  * String directly: zero setup, substring fast path for escape-free strings.
  *
  * Jackson stays as the serializer (JsonWriter) and as the parse ORACLE:
  * PropertySpec cross-checks both parsers tree-for-tree on every vendored
  * fixture and on generated documents. Semantics match Jackson's strict
  * defaults: no trailing commas/comments/NaN; numbers as f64
  * (Double.parseDouble ≡ Jackson getDoubleValue); duplicate keys last-wins
  * in first-insertion position.
  */
object FastJson {

  def parse(s: String): JsonValue = {
    val p = new Cursor(s)
    p.skipWs()
    if (p.i >= s.length) throw new IllegalArgumentException("empty JSON input")
    val v = p.value()
    p.skipWs()
    if (p.i != s.length) throw new IllegalArgumentException("trailing content after JSON value")
    v
  }

  // Object keys repeat endlessly across a corpus ("@context", "@id",
  // "name", ...): intern them per thread so each distinct key is ONE String
  // — kills a substring per key and makes JObj's reference-equality lookup
  // fast path hit. Bounded; values are never interned (they are unique).
  private val keyIntern = ThreadLocal.withInitial[java.util.HashMap[String, String]](
    () => new java.util.HashMap[String, String](256))

  private def internKey(k: String): String = {
    if (k.length > 32) return k
    val m = keyIntern.get()
    val hit = m.get(k)
    if (hit != null) hit
    else {
      // JVM-intern so parsed keys are the SAME instance as the engine's
      // string literals ("@id", "@value", ...) — JObj.indexOf's reference-
      // equality fast path then hits on every keyword lookup. intern() cost
      // is paid once per distinct key per thread.
      val canonical = k.intern()
      if (m.size >= 4096) m.clear()
      m.put(canonical, canonical)
      canonical
    }
  }

  /** Nesting cap: one hostile deeply-nested span must become a per-document
    * error-channel row, not a StackOverflowError that kills the executor
    * task (SOE is an Error — the pipeline's Exception handler never sees
    * it). 512 ≫ any real document; parse/expand/toRdf recursion are all
    * bounded by the parsed tree depth, so this one cap protects the whole
    * per-span path. (Deliberate divergence from the Jackson oracle, whose
    * default cap is 1000 — oracle cross-checks stay under both.)
    */
  final val MaxDepth = 512

  private final class Cursor(val s: String) {
    var i = 0
    var depth = 0
    private val n = s.length

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $i")

    def skipWs(): Unit = {
      while (i < n && { val c = s.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1
    }

    def value(): JsonValue = {
      if (i >= n) fail("unexpected end of input")
      (s.charAt(i): @annotation.switch) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' =>
          if (s.startsWith("true", i)) { i += 4; JBool.True } else fail("invalid literal")
        case 'f' =>
          if (s.startsWith("false", i)) { i += 5; JBool.False } else fail("invalid literal")
        case 'n' =>
          if (s.startsWith("null", i)) { i += 4; JNull } else fail("invalid literal")
        case c if c == '-' || (c >= '0' && c <= '9') => number()
        case _ => fail("unexpected character")
      }
    }

    private def obj(): JObj = {
      i += 1 // '{'
      depth += 1
      if (depth > MaxDepth) fail("nesting too deep")
      val o = new JObj()
      skipWs()
      if (i < n && s.charAt(i) == '}') { i += 1; depth -= 1; return o }
      while (true) {
        skipWs()
        if (i >= n || s.charAt(i) != '"') fail("expected object key")
        val k = internKey(string())
        skipWs()
        if (i >= n || s.charAt(i) != ':') fail("expected ':'")
        i += 1
        skipWs()
        o.put(k, value())
        skipWs()
        if (i >= n) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; depth -= 1; return o
          case _ => fail("expected ',' or '}'")
        }
      }
      o // unreachable
    }

    private def arr(): JArr = {
      i += 1 // '['
      depth += 1
      if (depth > MaxDepth) fail("nesting too deep")
      val a = new JArr()
      skipWs()
      if (i < n && s.charAt(i) == ']') { i += 1; depth -= 1; return a }
      while (true) {
        skipWs()
        a.push(value())
        skipWs()
        if (i >= n) fail("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; depth -= 1; return a
          case _ => fail("expected ',' or ']'")
        }
      }
      a // unreachable
    }

    private def string(): String = {
      i += 1 // opening quote
      val start = i
      // fast path: scan to the closing quote; bail to the slow path on escapes
      var j = i
      while (j < n) {
        val c = s.charAt(j)
        if (c == '"') { i = j + 1; return s.substring(start, j) }
        if (c == '\\') return stringSlow(start, j)
        if (c < ' ') fail("raw control character in string")
        j += 1
      }
      fail("unterminated string")
    }

    private def stringSlow(start: Int, firstEscape: Int): String = {
      val sb = new java.lang.StringBuilder(32)
      sb.append(s, start, firstEscape)
      var j = firstEscape
      while (j < n) {
        val c = s.charAt(j)
        if (c == '"') { i = j + 1; return sb.toString }
        else if (c == '\\') {
          if (j + 1 >= n) fail("unterminated escape")
          j += 1
          (s.charAt(j): @annotation.switch) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (j + 4 >= n) fail("truncated \\u escape")
              var cp = 0
              var k = 1
              while (k <= 4) {
                val h = s.charAt(j + k)
                val d =
                  if (h >= '0' && h <= '9') h - '0'
                  else if (h >= 'a' && h <= 'f') h - 'a' + 10
                  else if (h >= 'A' && h <= 'F') h - 'A' + 10
                  else fail("invalid \\u escape")
                cp = (cp << 4) | d
                k += 1
              }
              j += 4
              sb.append(cp.toChar)
            case _ => fail("invalid escape")
          }
          j += 1
        } else if (c < ' ') fail("raw control character in string")
        else { sb.append(c); j += 1 }
      }
      fail("unterminated string")
    }

    private def number(): JNum = {
      val start = i
      if (s.charAt(i) == '-') i += 1
      if (i >= n) fail("truncated number")
      // int part: 0 | [1-9][0-9]*
      s.charAt(i) match {
        case '0' => i += 1
        case c if c >= '1' && c <= '9' =>
          i += 1
          while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
        case _ => fail("invalid number")
      }
      if (i < n && s.charAt(i) == '.') {
        i += 1
        val fs = i
        while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
        if (i == fs) fail("invalid number fraction")
      }
      if (i < n && { val e = s.charAt(i); e == 'e' || e == 'E' }) {
        i += 1
        if (i < n && { val sg = s.charAt(i); sg == '+' || sg == '-' }) i += 1
        val es = i
        while (i < n && { val d = s.charAt(i); d >= '0' && d <= '9' }) i += 1
        if (i == es) fail("invalid number exponent")
      }
      JNum(java.lang.Double.parseDouble(s.substring(start, i)))
    }
  }
}
