package graft.core

import graft.json._
import ErrorCode._

object Util {
  /** /root/reference/src/util.rs:48-59 — language lowercased; lang_dir keying table. */
  def makeLangDir(language: Option[String], direction: Option[String]): String = {
    val lang = language.map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
    val dir = direction.getOrElse("")
    (lang, dir) match {
      case (_, "") => lang
      case ("", "@none") => "@none"
      case (_, "@none") => lang
      case ("@null" | "@none", _) => "_" + dir
      case _ => lang + "_" + dir
    }
  }

  /** /root/reference/src/util.rs:61-64 — `@graph` plus only `@id`/`@index` extras. */
  def isGraphObject(value: JObj): Boolean = {
    val nonOptional = value.keys.filter(k => k != "@id" && k != "@index").toList
    nonOptional == List("@graph")
  }

  /** /root/reference/src/util.rs:66-91 — multi-valued property merge. */
  def addValue(obj: JObj, key: String, value: JsonValue, asArray: Boolean): Unit = {
    if (asArray && obj.get(key).forall(_.asArr.isEmpty)) {
      val array = new JArr()
      obj.removeKey(key).foreach(array.push)
      obj.put(key, array)
    }
    value match {
      case arr: JArr =>
        arr.foreach(v => addValue(obj, key, v, asArray = false))
      case v =>
        obj.get(key) match {
          case Some(a: JArr) => a.push(v)
          case Some(orig) =>
            obj.removeKey(key)
            obj.put(key, JArr(orig, v))
          case None => obj.put(key, v)
        }
    }
  }

  /** ContextJson normalization (/root/reference/src/util.rs:93-175):
    * context value (null/string/object/array-of-those) → Vector[Option[JsonOrRef]].
    * `allowNull=false` reproduces the JsonLdContext impl (null → error).
    */
  def contextsFromJson(ctx: JsonValue, allowNull: Boolean = true): Vector[Option[JsonOrRef]] = {
    def item(v: JsonValue): Option[JsonOrRef] = v match {
      case o: JObj => Some(JsonOrRef.Obj(o))
      case JStr(s) => Some(JsonOrRef.Ref(s))
      case JNull if allowNull => None
      case _ => throw JsonLdError(InvalidLocalContext)
    }
    ctx match {
      case a: JArr => a.iterator.map(item).toVector // one level of recursion only
      case v => Vector(item(v))
    }
  }

  def sortedStringSet(items: Iterable[String]): Vector[String] =
    items.toVector.distinct.sorted // BTreeSet lexicographic order
}
