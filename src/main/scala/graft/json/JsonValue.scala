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
      o.foreach { case (k, v) => c.put(k, v.deepCopy) }
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

/** Mutable insertion-ordered JSON object (LinkedHashMap-backed). */
final class JObj(private val map: java.util.LinkedHashMap[String, JsonValue]) extends JsonValue {
  // most JSON-LD objects carry 1–4 keys; the default 16-slot table was a
  // top Node[]-allocation site in JFR
  def this() = this(new java.util.LinkedHashMap[String, JsonValue](4))
  def put(k: String, v: JsonValue): Unit = map.put(k, v)
  def get(k: String): Option[JsonValue] = Option(map.get(k))
  def contains(k: String): Boolean = map.containsKey(k)
  /** Remove and return (reference `Object::remove`). */
  def removeKey(k: String): Option[JsonValue] = Option(map.remove(k))
  def size: Int = map.size
  def isEmpty: Boolean = map.isEmpty
  def nonEmpty: Boolean = !map.isEmpty
  def keys: Iterator[String] = { import scala.jdk.CollectionConverters._; map.keySet.iterator.asScala }
  def iterator: Iterator[(String, JsonValue)] = {
    import scala.jdk.CollectionConverters._
    map.entrySet.iterator.asScala.map(e => (e.getKey, e.getValue))
  }
  def foreach(f: ((String, JsonValue)) => Unit): Unit = iterator.foreach(f)
  /** Entries sorted lexicographically by key (reference collects into BTreeMap). */
  def sortedEntries: Vector[(String, JsonValue)] = iterator.toVector.sortBy(_._1)

  // Order-insensitive equality (serde_json IndexMap PartialEq; relied on at
  // /root/reference/src/context.rs:550-569).
  override def equals(that: Any): Boolean = that match {
    case o: JObj =>
      o.size == size && iterator.forall { case (k, v) => o.get(k).contains(v) }
    case _ => false
  }
  override def hashCode: Int = iterator.foldLeft(0) { case (h, (k, v)) => h + (k.hashCode ^ v.hashCode) }
  override def toString: String = JsonWriter.write(this)
}

object JObj {
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
