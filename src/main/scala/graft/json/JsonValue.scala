package graft.json

import scala.collection.mutable

/** Minimal JSON tree for the JSON-LD engine.
  *
  * Design notes (vs the reference, /root/reference/src/lib.rs:13 — generic
  * over a `json-trait` abstraction, instantiated with serde_json + preserve_order):
  *  - Numbers are doubles end-to-end (reference compares numbers as f64,
  *    /root/reference/tests/util/mod.rs:36; version check via as_number()==1.1,
  *    /root/reference/src/context.rs:138).
  *  - Objects preserve insertion order (serde_json `preserve_order` feature,
  *    /root/reference/Cargo.toml) but compare order-insensitively (IndexMap
  *    PartialEq semantics, relied on by the protected-term structural equality
  *    check at /root/reference/src/context.rs:550-569).
  *  - JObj / JArr are mutable: the expansion/compaction algorithms build
  *    results incrementally (`add_value`, /root/reference/src/util.rs:66-91).
  */
sealed trait JsonValue {
  def isNull: Boolean = this eq JNull
  def asString: Option[String] = this match { case JStr(s) => Some(s); case _ => None }
  def asBool: Option[Boolean] = this match { case JBool(b) => Some(b); case _ => None }
  def asNumber: Option[Double] = this match { case JNum(n) => Some(n); case _ => None }
  def asObj: Option[JObj] = this match { case o: JObj => Some(o); case _ => None }
  def asArr: Option[JArr] = this match { case a: JArr => Some(a); case _ => None }
  /** Deep structural copy (JObj/JArr are mutable). */
  def deepCopy: JsonValue = this match {
    case o: JObj =>
      val c = new JObj()
      o.foreachEntry((k, v) => c.put(k, v.deepCopy))
      c
    case a: JArr =>
      val c = new JArr()
      a.foreach(v => c.push(v.deepCopy))
      c
    case v => v
  }
}

case object JNull extends JsonValue
final case class JBool(value: Boolean) extends JsonValue
final case class JNum(value: Double) extends JsonValue
final case class JStr(value: String) extends JsonValue

object JBool {
  val True = JBool(true)
  val False = JBool(false)
}

/** Mutable JSON array. */
final class JArr(private val buf: mutable.ArrayBuffer[JsonValue]) extends JsonValue {
  def this() = this(mutable.ArrayBuffer.empty[JsonValue])
  def push(v: JsonValue): Unit = buf += v
  def size: Int = buf.size
  def isEmpty: Boolean = buf.isEmpty
  def nonEmpty: Boolean = buf.nonEmpty
  def apply(i: Int): JsonValue = buf(i)
  def remove(i: Int): JsonValue = buf.remove(i)
  def iterator: Iterator[JsonValue] = buf.iterator
  def foreach(f: JsonValue => Unit): Unit = buf.foreach(f)
  def toVector: Vector[JsonValue] = buf.toVector
  def appendAll(other: JArr): Unit = buf ++= other.buf

  override def equals(that: Any): Boolean = that match {
    case a: JArr => a.buf.length == buf.length && buf.iterator.zip(a.buf.iterator).forall { case (x, y) => x == y }
    case _ => false
  }
  override def hashCode: Int = buf.foldLeft(17)((h, v) => h * 31 + v.hashCode)
  override def toString: String = JsonWriter.write(this)
}

object JArr {
  def apply(items: JsonValue*): JArr = { val a = new JArr(); items.foreach(a.push); a }
  def from(items: IterableOnce[JsonValue]): JArr = { val a = new JArr(); items.iterator.foreach(a.push); a }
}

/** Mutable insertion-ordered JSON object.
  *
  * Backed by flat parallel key/value arrays with linear-scan lookup up to
  * [[JObj.Spill]] entries, spilling to a LinkedHashMap beyond that. Most
  * JSON-LD objects carry 1–4 keys, where a LinkedHashMap's Entry-per-put and
  * Node[] table were the two largest allocation sites in the whole engine
  * (JFR); a linear scan over ≤8 keys also beats hashing on lookup.
  * Insertion-order semantics are identical to LinkedHashMap: put on an
  * existing key replaces in place, remove shifts, iteration follows
  * first-insertion order.
  */
final class JObj extends JsonValue {
  private[this] var ks: Array[String] = null // null until first put, and while spilled
  private[this] var vs: Array[JsonValue] = null
  private[this] var n: Int = 0
  private[this] var big: java.util.LinkedHashMap[String, JsonValue] = null

  @inline private def indexOf(k: String): Int = {
    var i = 0
    while (i < n) {
      val ki = ks(i)
      if ((ki eq k) || ki == k) return i
      i += 1
    }
    -1
  }

  def put(k: String, v: JsonValue): Unit = {
    if (big != null) { big.put(k, v); return }
    val i = indexOf(k)
    if (i >= 0) { vs(i) = v; return }
    if (ks == null) {
      ks = new Array[String](4); vs = new Array[JsonValue](4)
    } else if (n == ks.length) {
      if (n >= JObj.Spill) {
        big = new java.util.LinkedHashMap[String, JsonValue](n * 2)
        var j = 0
        while (j < n) { big.put(ks(j), vs(j)); j += 1 }
        ks = null; vs = null; n = 0
        big.put(k, v)
        return
      }
      ks = java.util.Arrays.copyOf(ks, n * 2)
      vs = java.util.Arrays.copyOf(vs, n * 2)
    }
    ks(n) = k; vs(n) = v; n += 1
  }

  def get(k: String): Option[JsonValue] = {
    if (big != null) return Option(big.get(k))
    val i = indexOf(k)
    if (i >= 0) Some(vs(i)) else None
  }
  /** `get` without the Option wrapper (hot paths). */
  def getOrNull(k: String): JsonValue = {
    if (big != null) return big.get(k)
    val i = indexOf(k)
    if (i >= 0) vs(i) else null
  }
  def contains(k: String): Boolean =
    if (big != null) big.containsKey(k) else indexOf(k) >= 0

  /** Remove and return (reference `Object::remove`). */
  def removeKey(k: String): Option[JsonValue] = {
    if (big != null) return Option(big.remove(k))
    val i = indexOf(k)
    if (i < 0) return None
    val v = vs(i)
    System.arraycopy(ks, i + 1, ks, i, n - i - 1)
    System.arraycopy(vs, i + 1, vs, i, n - i - 1)
    n -= 1
    ks(n) = null; vs(n) = null
    Some(v)
  }

  def size: Int = if (big != null) big.size else n
  def isEmpty: Boolean = size == 0
  def nonEmpty: Boolean = size != 0

  /** Iterate without allocating tuples (the Tuple2-per-entry of `iterator`
    * was a top JFR site — prefer this in engine code).
    */
  def foreachEntry(f: (String, JsonValue) => Unit): Unit = {
    if (big != null) {
      val it = big.entrySet.iterator
      while (it.hasNext) { val e = it.next(); f(e.getKey, e.getValue) }
    } else {
      var i = 0
      while (i < n) { f(ks(i), vs(i)); i += 1 } // f may not mutate this JObj
    }
  }

  /** Keys in insertion order as a fresh array (safe against mutation). */
  def keyArray: Array[String] = {
    if (big != null) big.keySet.toArray(new Array[String](big.size))
    else if (ks == null) JObj.NoKeys
    else java.util.Arrays.copyOfRange(ks, 0, n).asInstanceOf[Array[String]]
  }

  /** Keys sorted lexicographically (reference collects into BTreeMap). */
  def sortedKeyArray: Array[String] = {
    val a = keyArray
    java.util.Arrays.sort(a, java.util.Comparator.naturalOrder[String]())
    a
  }

  def keys: Iterator[String] = keyArray.iterator
  def iterator: Iterator[(String, JsonValue)] = {
    if (big != null) {
      import scala.jdk.CollectionConverters._
      big.entrySet.iterator.asScala.map(e => (e.getKey, e.getValue))
    } else if (n == 0) Iterator.empty
    else {
      // eager snapshot: a removeKey during iteration shifts the shared backing
      // arrays under a lazy view and silently yields wrong pairs (the old
      // LinkedHashMap at least failed fast with CME)
      val kk = java.util.Arrays.copyOfRange(ks.asInstanceOf[Array[AnyRef]], 0, n)
      val vv = java.util.Arrays.copyOfRange(vs.asInstanceOf[Array[AnyRef]], 0, n)
      Iterator.tabulate(n)(i => (kk(i).asInstanceOf[String], vv(i).asInstanceOf[JsonValue]))
    }
  }
  def foreach(f: ((String, JsonValue)) => Unit): Unit = foreachEntry((k, v) => f((k, v)))
  /** Entries sorted lexicographically by key (reference collects into BTreeMap). */
  def sortedEntries: Vector[(String, JsonValue)] =
    sortedKeyArray.iterator.map(k => (k, getOrNull(k))).toVector
  /** Sorted-key iteration without tuple/Vector allocation (hot paths). */
  def foreachSorted(f: (String, JsonValue) => Unit): Unit = {
    val a = sortedKeyArray
    var i = 0
    while (i < a.length) { f(a(i), getOrNull(a(i))); i += 1 }
  }

  // Order-insensitive equality (serde_json IndexMap PartialEq; relied on at
  // /root/reference/src/context.rs:550-569).
  override def equals(that: Any): Boolean = that match {
    case o: JObj =>
      if (o.size != size) return false
      var ok = true
      foreachEntry((k, v) => if (ok && o.getOrNull(k) != v) ok = false)
      ok
    case _ => false
  }
  override def hashCode: Int = {
    var h = 0
    foreachEntry((k, v) => h += k.hashCode ^ v.hashCode)
    h
  }
  override def toString: String = JsonWriter.write(this)
}

object JObj {
  /** Entry count beyond which the flat arrays spill to a LinkedHashMap. */
  final val Spill = 8
  private[json] val NoKeys = new Array[String](0)
  def apply(entries: (String, JsonValue)*): JObj = { val o = new JObj(); entries.foreach { case (k, v) => o.put(k, v) }; o }
}

object JsonEq {
  /** Port of the reference test comparator `json_ld_eq`
    * (/root/reference/tests/util/mod.rs:6-41): order-insensitive deep
    * equality except `@list` arrays compare ordered; numbers as f64.
    */
  def jsonLdEq(a: JsonValue, b: JsonValue, ordered: Boolean = false): Boolean = (a, b) match {
    case (a: JObj, b: JObj) =>
      if (ordered)
        a.size == b.size && a.iterator.zip(b.iterator).forall { case ((k, av), (l, bv)) => k == l && jsonLdEq(av, bv, true) }
      else
        a.size == b.size && a.iterator.forall { case (key, av) =>
          b.get(key).exists { bv =>
            if (key == "@list") (av, bv) match {
              case (aa: JArr, ba: JArr) =>
                aa.size == ba.size && aa.iterator.zip(ba.iterator).forall { case (x, y) => jsonLdEq(x, y, false) }
              case _ => jsonLdEq(av, bv, false)
            }
            else jsonLdEq(av, bv, false)
          }
        }
    case (a: JArr, b: JArr) =>
      if (ordered)
        a.size == b.size && a.iterator.zip(b.iterator).forall { case (x, y) => jsonLdEq(x, y, true) }
      else {
        // NOTE: reference uses "every a has SOME equal b" (multiset-ish given equal lengths)
        a.size == b.size && a.iterator.forall(x => b.iterator.exists(y => jsonLdEq(x, y, false)))
      }
    case (JNum(x), JNum(y)) => x == y
    case (JStr(x), JStr(y)) => x == y
    case (JNull, JNull) => true
    case (JBool(x), JBool(y)) => x == y
    case _ => false
  }
}
