package graft.core

import graft.json._
import ErrorCode._
import scala.collection.mutable

/** Serialize RDF as JSON-LD (W3C JSON-LD 1.1 API §8.2 + RDF-to-Object
  * conversion), the inverse of [[ToRdf]] — fills the `from_rdf` stub the
  * reference sketches (/root/reference/src/lib.rs:483-489; its harness
  * recognizes FromRDF tests at /root/reference/tests/util/type_state.rs:33
  * but skips them). Implemented from the public W3C algorithm.
  *
  * Output node order: sorted by subject always (the spec sorts only when
  * `ordered` — see the note on [[Flatten]]).
  */
object FromRdf {
  import ToRdf._

  private val I18N = "https://www.w3.org/ns/i18n#"

  /** One (node, property, value) reference, tracked for list reconstruction
    * and compound-literal rewriting. `value` is the exact instance stored in
    * the node's property array — rewritten in place when a well-formed
    * rdf:first/rdf:rest chain is recognized.
    */
  private final case class Usage(node: JObj, property: String, value: JObj)

  def fromRdf(dataset: Vector[Triple], options: JsonLdOptions): JArr = {
    val defaultGraph = mutable.LinkedHashMap[String, JObj]()
    val graphMap = mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, JObj]]("@default" -> defaultGraph)
    // Some(usage) = blank node referenced exactly once WITHIN a graph; None =
    // more than once. Keyed (graph name, bnode id): node maps — and therefore
    // list/compound-literal reconstruction — are per graph (§8.2 step 3), so
    // a reference in the default graph must never consume rdf:first/rdf:rest
    // chains that live in a named graph.
    val referencedOnce = mutable.Map[(String, String), Option[Usage]]()
    val compoundLiteralSubjects = mutable.Map[String, mutable.LinkedHashSet[String]]()
    val nilUsages = mutable.Map[String, mutable.ArrayBuffer[Usage]]()

    val byGraph = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Triple]]()
    byGraph.getOrElseUpdate("@default", mutable.ArrayBuffer())
    for (t <- dataset)
      byGraph.getOrElseUpdate(if (t.graph.isEmpty) "@default" else t.graph, mutable.ArrayBuffer()) += t

    for ((name, triples) <- byGraph) {
      val nodeMap = graphMap.getOrElseUpdate(name, mutable.LinkedHashMap())
      val compound = compoundLiteralSubjects.getOrElseUpdate(name, mutable.LinkedHashSet())
      if (name != "@default" && !defaultGraph.contains(name))
        defaultGraph.put(name, JObj("@id" -> JStr(name)))
      for (t <- triples) {
        if (options.rdfDirection.contains("compound-literal") && t.pred == RDF + "direction")
          compound += t.subj
        val node = nodeMap.getOrElseUpdate(t.subj, JObj("@id" -> JStr(t.subj)))
        val objIsNode = t.objKind != "literal"
        if (objIsNode) nodeMap.getOrElseUpdate(t.objValue, JObj("@id" -> JStr(t.objValue)))
        if (t.pred == RdfType && !options.useRdfType && objIsNode) {
          val types = node.get("@type") match {
            case Some(a: JArr) => a
            case _ => val a = new JArr(); node.put("@type", a); a
          }
          if (!types.iterator.contains(JStr(t.objValue))) types.push(JStr(t.objValue))
        } else {
          val value = rdfToObject(t, options)
          // add to node[pred], unique by deep equality; track the instance
          // actually stored so list rewriting mutates the live element
          val stored: JObj = node.get(t.pred) match {
            case Some(a: JArr) =>
              a.iterator.collectFirst { case o: JObj if JsonEq.jsonLdEq(o, value) => o } match {
                case Some(existing) => existing
                case None => a.push(value); value
              }
            case _ => node.put(t.pred, JArr(value)); value
          }
          if (objIsNode) {
            if (t.objValue == RdfNil)
              nilUsages.getOrElseUpdate(name, mutable.ArrayBuffer()) += Usage(node, t.pred, stored)
            else if (referencedOnce.contains((name, t.objValue)))
              referencedOnce((name, t.objValue)) = None
            else if (t.objValue.startsWith("_:"))
              referencedOnce((name, t.objValue)) = Some(Usage(node, t.pred, stored))
          }
        }
      }
    }

    for ((name, graphObject) <- graphMap) {
      // compound rdf:direction literals → @value/@language/@direction in place
      for (cl <- compoundLiteralSubjects.getOrElse(name, mutable.LinkedHashSet())) {
        referencedOnce.getOrElse((name, cl), None).foreach { entry =>
          graphObject.remove(cl).foreach { clNode =>
            def first(pred: String): Option[JsonValue] =
              clNode.get(pred).flatMap(_.asArr).filter(_.nonEmpty).map(_(0))
                .flatMap(_.asObj).flatMap(_.get("@value"))
            entry.node.get(entry.property).flatMap(_.asArr).foreach { arr =>
              arr.iterator.foreach {
                case ref: JObj if ref.get("@id").flatMap(_.asString).contains(cl) =>
                  ref.removeKey("@id")
                  ref.put("@value", first(RDF + "value").getOrElse(JNull))
                  first(RDF + "language").flatMap(_.asString).foreach { lang =>
                    if (!lang.forall(c => c.isLetterOrDigit || c == '-'))
                      throw JsonLdError(InvalidLanguageTaggedString, s"ill-formed language $lang")
                    ref.put("@language", JStr(lang))
                  }
                  first(RDF + "direction").flatMap(_.asString).foreach(d => ref.put("@direction", JStr(d)))
                case _ =>
              }
            }
          }
        }
      }
      // rdf:first/rdf:rest chains ending in rdf:nil → @list (spec §8.2 step 5.3)
      for (usages <- nilUsages.get(name); usage0 <- usages) {
        var node = usage0.node
        var property = usage0.property
        var head = usage0.value
        val list = mutable.ArrayBuffer[JsonValue]()
        val listNodes = mutable.ArrayBuffer[String]()
        var continueWalk = true
        while (continueWalk && property == RdfRest && isWellFormedListNode(node) &&
            node.get("@id").flatMap(_.asString).exists(id =>
              id.startsWith("_:") && referencedOnce.getOrElse((name, id), None).isDefined)) {
          val id = node.get("@id").flatMap(_.asString).get
          list += node.get(RdfFirst).flatMap(_.asArr).map(_(0)).get
          listNodes += id
          val next = referencedOnce((name, id)).get
          node = next.node; property = next.property; head = next.value
          if (node.get("@id").flatMap(_.asString).exists(!_.startsWith("_:"))) continueWalk = false
        }
        head.removeKey("@id")
        head.put("@list", JArr.from(list.reverseIterator))
        listNodes.foreach(graphObject.remove)
      }
    }

    val result = new JArr()
    for ((subject, node) <- defaultGraph.toVector.sortBy(_._1)) {
      graphMap.get(subject).foreach { graph =>
        val garr = new JArr()
        node.put("@graph", garr)
        for ((_, n) <- graph.toVector.sortBy(_._1))
          if (!(n.size == 1 && n.contains("@id"))) garr.push(n)
      }
      if (!(node.size == 1 && node.contains("@id"))) result.push(node)
    }
    result
  }

  /** node has only @id, rdf:first (1 value), rdf:rest (1 value), and
    * optionally @type == [rdf:List].
    */
  private def isWellFormedListNode(node: JObj): Boolean = {
    var keys = 3
    if (node.contains("@type")) {
      val t = node.get("@type")
      if (!t.flatMap(_.asArr).exists(a => a.size == 1 && a(0) == JStr(RDF + "List"))) return false
      keys = 4
    }
    node.size == keys && node.contains("@id") &&
      node.get(RdfFirst).flatMap(_.asArr).exists(_.size == 1) &&
      node.get(RdfRest).flatMap(_.asArr).exists(_.size == 1)
  }

  /** RDF to Object Conversion (W3C JSON-LD 1.1 API §8.3-adjacent). */
  private def rdfToObject(t: Triple, options: JsonLdOptions): JObj = {
    if (t.objKind != "literal") return JObj("@id" -> JStr(t.objValue))
    val result = new JObj()
    var converted: JsonValue = JStr(t.objValue)
    var tpe: Option[String] = None
    val dt = if (t.objDatatype.isEmpty) XsdString else t.objDatatype
    if (options.processingMode == ProcessingMode.JsonLd11 && dt == RdfJson) {
      converted =
        try JsonParser.parse(t.objValue)
        catch { case _: Exception => throw JsonLdError(InvalidJsonLiteral, t.objValue) }
      tpe = Some("@json")
    } else if (options.rdfDirection.contains("i18n-datatype") && dt.startsWith(I18N)) {
      val langDir = dt.substring(I18N.length)
      val us = langDir.indexOf('_')
      val (lang, dir) = if (us >= 0) (langDir.substring(0, us), langDir.substring(us + 1)) else (langDir, "")
      if (lang.nonEmpty) result.put("@language", JStr(lang))
      if (dir.nonEmpty) result.put("@direction", JStr(dir))
    } else if (t.objLang.nonEmpty) {
      result.put("@language", JStr(t.objLang))
    } else if (options.useNativeTypes) {
      dt match {
        case XsdString => // plain string
        case XsdBoolean =>
          if (t.objValue == "true") converted = JBool(true)
          else if (t.objValue == "false") converted = JBool(false)
          else tpe = Some(dt)
        case XsdInteger | XsdDouble =>
          parseNumeric(t.objValue, dt) match {
            case Some(n) => converted = JNum(n)
            case None => tpe = Some(dt)
          }
        case other => tpe = Some(other)
      }
    } else if (dt != XsdString) {
      tpe = Some(dt)
    }
    result.put("@value", converted)
    tpe.foreach(x => result.put("@type", JStr(x)))
    result
  }

  /** INF/-INF/NaN are VALID xsd:double lexicals but have no JSON-number
    * representation — converting them produced an infinite JNum that no
    * JSON writer can serialize (a job-killer on hostile-but-valid RDF at
    * corpus scale). Like the JS/Ruby processors, such literals stay typed
    * strings; every finite valid lexical converts (rf0034 pins both sides).
    */
  private def parseNumeric(lexical: String, dt: String): Option[Double] = {
    val valid =
      if (dt == XsdInteger) lexical.matches("[+-]?[0-9]+")
      else lexical.matches("""[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""")
    if (!valid) None
    else
      try Some(lexical.toDouble).filter(d => !d.isInfinite && !d.isNaN)
      catch { case _: NumberFormatException => None }
  }
}
