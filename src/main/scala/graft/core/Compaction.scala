package graft.core

import graft.json._
import ErrorCode._
import Util._
import scala.collection.mutable

/** Compaction Algorithms — port of /root/reference/src/compact.rs (762 LoC).
  * Like the reference, assumes input already passed through expansion
  * (/root/reference/src/compact.rs:10-12). `compactInternal` may consume
  * (mutate) its element.
  */
object Compaction {
  import IriExpansion.{expandIri, Normal}

  private def defOf(ctx: Context, prop: Option[String]): Option[TermDefinition] =
    prop.flatMap(ctx.termDefinitions.get)

  /** /root/reference/src/compact.rs:39-131 */
  def compactInternal(activeContext0: Context, activeProperty: Option[String], element: JsonValue, state: ApiState): JsonValue = {
    val options = state.options
    element match {
      case array: JArr =>
        val result = new JArr()
        array.foreach { item =>
          val compacted = compactInternal(activeContext0, activeProperty, item, state)
          if (!compacted.isNull) result.push(compacted)
        }
        if (result.size != 1 || !options.compactArrays) return result
        activeProperty match {
          case Some(ap) =>
            if (ap == "@graph" || ap == "@set") return result
            val container = activeContext0.termDefinitions.get(ap).map(_.containerMapping)
            container match {
              case Some(Container.ListC) => return result
              case Some(c) if c.isSet => return result
              case _ =>
            }
          case None =>
        }
        result.remove(0)
      case obj: JObj =>
        val typeScopedContext = activeContext0
        val reverted = activeContext0.previousContext match {
          case Some(previous) if !obj.contains("@value") && !(obj.size == 1 && obj.contains("@id")) => previous
          case _ => activeContext0
        }
        var activeContext = defOf(reverted, activeProperty) match {
          case Some(td) if td.context.nonEmpty =>
            // PROPERTY-scoped contexts PROPAGATE by default (the spec's
            // propagate parameter defaults true; only TYPE-scoped contexts
            // — the @type loop below — default false). Passing false here
            // made a property-scoped context (e.g. "@context": null)
            // evaporate at the next nested node object via the
            // previousContext reversion, so nested keys compacted against
            // the OUTER context and re-expanded differently (cross-product
            // sweep 2, in=expand/t0069 ctx=c0065 — bug #10).
            ContextProcessor.processContext(reverted, td.context, td.baseUrl, state, mutable.Set(),
              overrideProtected = true, propagate0 = true, validateScoped0 = true)
          case _ => reverted
        }
        if (obj.contains("@value") || (obj.contains("@id") && obj.size == 1))
          return compactValue(activeContext, activeProperty, obj, options)
        // reference if_chain (/root/reference/src/compact.rs:94-99): remove
        // @list ONLY when the active term has a @list container. The
        // previous formulation removed it unconditionally and discarded the
        // value on the non-matching path — NESTED lists under a term
        // without a list container compacted to {} (silent list-content
        // loss; found by the cross-product sweep, in=c0040 ctx=c0001 —
        // engine bug #8).
        if (obj.contains("@list") &&
            defOf(activeContext, activeProperty).map(_.containerMapping).contains(Container.ListC))
          return compactInternal(activeContext, activeProperty, obj.removeKey("@list").get, state)
        obj.get("@type").foreach { expandedTypes =>
          // BTreeSet collect → lexicographic order (/root/reference/src/compact.rs:101-110)
          val compactedTypes = sortedStringSet(
            expandedTypes.asArr.get.iterator.map(t =>
              compactIri(activeContext, t.asString.get, options, None, vocab = true, reverse = false)).toVector)
          for (term <- compactedTypes)
            typeScopedContext.termDefinitions.get(term).foreach { td =>
              if (td.context.nonEmpty)
                activeContext = ContextProcessor.processContext(activeContext, td.context, td.baseUrl,
                  state, mutable.Set(), overrideProtected = false, propagate0 = false, validateScoped0 = true)
            }
        }
        val entries = if (options.ordered) obj.sortedEntries else obj.iterator.toVector
        compactMap(activeContext, typeScopedContext, activeProperty, entries, state)
      case other => other
    }
  }

  /** /root/reference/src/compact.rs:133-237 (spec 12.*) */
  private def compactMap(
      activeContext: Context,
      typeScopedContext: Context,
      activeProperty: Option[String],
      expandedMap: Vector[(String, JsonValue)],
      state: ApiState
  ): JObj = {
    val options = state.options
    val result = new JObj()
    for ((expandedProperty, expandedValue) <- expandedMap) expandedProperty match {
      case "@id" =>
        val compactedValue: JsonValue = expandedValue.asString match {
          case Some(s) => JStr(compactIri(activeContext, s, options, None, vocab = false, reverse = false))
          case None => JNull
        }
        val alias = compactIri(activeContext, "@id", options, None, vocab = true, reverse = false)
        result.put(alias, compactedValue)
      case "@type" =>
        // SPEC ASYMMETRY (generative sweep wave I, bug #21): the spec
        // compacts @type values against the type-scoped context captured
        // BEFORE the property-scoped context applies (compaction step 1 vs
        // 5.2), but expansion resolves @type values AFTER applying it
        // (expansion steps 9 → 11). A term SHADOWED by a property-scoped
        // context therefore flips meaning ({"t1": {"@context": {"u":
        // "http://p/2"}}, "u": "http://b/x"} — "@type": "u" written as b/x
        // re-reads as p/2). Documented data-preserving deviation: keep the
        // spec's candidate only if it re-expands to the same IRI under the
        // context re-expansion will use; otherwise retry against that
        // context, falling back to the raw IRI.
        def compactTypeValue(t: String): String = {
          def survives(c: String): Boolean =
            expandIri(activeContext, c, documentRelative = false, vocab = true).contains(t)
          val cand = compactIri(typeScopedContext, t, options, None, vocab = true, reverse = false)
          if (survives(cand)) cand
          else {
            val cand2 = compactIri(activeContext, t, options, None, vocab = true, reverse = false)
            if (survives(cand2)) cand2 else t
          }
        }
        val compactedValue: JsonValue = expandedValue match {
          case JStr(t) => JStr(compactTypeValue(t))
          case arr: JArr =>
            JArr.from(arr.iterator.map(t =>
              JStr(compactTypeValue(t.asString.get)): JsonValue))
          case _ => throw new IllegalStateException("bad @type")
        }
        val alias = compactIri(activeContext, "@type", options, None, vocab = true, reverse = false)
        val asArray = (options.processingMode == ProcessingMode.JsonLd11 &&
          activeContext.termDefinitions.get(alias).exists(_.containerMapping.isSet)) || !options.compactArrays
        addValue(result, alias, compactedValue, asArray)
      case "@reverse" =>
        val compactedValue = compactInternal(activeContext, Some("@reverse"), expandedValue, state).asObj.get
        val keys = compactedValue.keys.toVector
        for (property <- keys)
          activeContext.termDefinitions.get(property).foreach { td =>
            if (td.reverseProperty) {
              // Compaction 12.2.2.1.1, with a map-container carve-out the
              // literal spec text lacks: a reverse term with an @index
              // container compacts to a MAP — array-wrapping it (under
              // compactArrays=false) makes re-expansion read the map as a
              // node object and silently drop every entry (engine bug #18,
              // generative-sweep wave F). Only array-shaped values wrap.
              val asArray = !td.containerMapping.isIndex &&
                (td.containerMapping.isSet || !options.compactArrays)
              addValue(result, property, compactedValue.removeKey(property).get, asArray)
            }
          }
        if (compactedValue.nonEmpty) {
          val alias = compactIri(activeContext, "@reverse", options, None, vocab = true, reverse = false)
          result.put(alias, compactedValue)
        }
      case "@preserve" =>
        val compactedValue = compactInternal(activeContext, activeProperty, expandedValue, state)
        if (compactedValue.asArr.forall(_.nonEmpty)) result.put("@preserve", compactedValue)
      case "@index" if defOf(activeContext, activeProperty).exists(_.containerMapping.isIndex) =>
      // elided under an index container
      case "@direction" | "@index" | "@language" | "@value" =>
        val alias = compactIri(activeContext, expandedProperty, options, None, vocab = true, reverse = false)
        result.put(alias, expandedValue)
      case _ =>
        val expandedValueArray = expandedValue.asArr.get
        // @nest routing is suppressed INSIDE a @reverse map (engine bug #19,
        // generative sweep wave G): a nest-decorated term selected for a
        // reverse-positioned property would put an "@nest" key inside the
        // reverse map, which re-expansion rejects as `invalid reverse
        // property map` — the literal spec text (12.7.2/12.8.1) does not
        // carve this out, but a reverse map admits only property keys.
        val inReverseMap = activeProperty.contains("@reverse")
        if (expandedValueArray.isEmpty) {
          val itemActiveProperty = compactIri(activeContext, expandedProperty, options,
            Some(expandedValueArray), vocab = true, reverse = inReverseMap)
          val nestResult =
            if (inReverseMap) result
            else getNestResult(activeContext, itemActiveProperty, result)
          addValue(nestResult, itemActiveProperty, expandedValueArray, asArray = true)
        } else {
          expandedValueArray.foreach { expandedItem =>
            val itemActiveProperty = compactIri(activeContext, expandedProperty, options,
              Some(expandedItem), vocab = true, reverse = inReverseMap)
            val nestResult =
              if (inReverseMap) result
              else getNestResult(activeContext, itemActiveProperty, result)
            compactItem(activeContext, itemActiveProperty, nestResult, expandedItem, state)
          }
        }
    }
    result
  }

  /** /root/reference/src/compact.rs:239-349 (spec 12.8) */
  private def compactItem(
      activeContext: Context,
      itemActiveProperty: String,
      nestResult: JObj,
      expandedItem: JsonValue,
      state: ApiState
  ): Unit = {
    val options = state.options
    val container = activeContext.termDefinitions.get(itemActiveProperty)
      .map(_.containerMapping).getOrElse(Container.none)
    val asArray = container.isSet || itemActiveProperty == "@graph" || itemActiveProperty == "@list" ||
      !options.compactArrays
    def mapObjectFor(key: String): JObj = nestResult.get(key) match {
      case Some(o: JObj) => o
      case _ => val o = new JObj(); nestResult.put(key, o); o
    }
    // Fallback-shaped items (a wrapped {@list} or {@graph,@id} map) must NOT
    // ride a term whose MAP container (index/language/type/id map) would make
    // expansion re-read the map as container entries — or collide with the
    // real container map under the same key (a wrapped list merged INTO the
    // index map, found by the cross-product sweep in=c0067 ctx=c0053).
    // Documented data-preserving deviation: emit such items under the
    // property's FULL IRI, a key with no term definition.
    val mapContainer = container.isIndex || container.isLanguage || container.isType ||
      (container.isId && !container.isGraph)
    // a @json-typed term literalizes its ENTIRE raw value on re-expansion
    // (Expansion's @json short-circuit runs before list/node/value
    // handling), so only a lone raw JSON literal may ride the term key —
    // everything else must take the full-IRI fallback below (bug #12)
    val jsonType = activeContext.termDefinitions.get(itemActiveProperty)
      .flatMap(_.typeMapping).contains("@json")
    val fallbackProperty =
      if (mapContainer || jsonType)
        activeContext.termDefinitions.get(itemActiveProperty).flatMap(_.iri)
          .getOrElse(itemActiveProperty)
      else itemActiveProperty
    expandedItem match {
      case itemObj: JObj =>
        itemObj.removeKey("@list") match {
          case Some(list) =>
            // list CONTENT is compacted against the property that will
            // CARRY it: items routed to the full-IRI fallback re-expand
            // WITHOUT the term's type/container semantics, so term-specific
            // shaping must not apply there (generative sweep: a list item's
            // JSON literal unwrapped raw under a @json term, then re-read
            // as a nested list under the full IRI)
            // a @json-typed term may NEVER carry a list as its bare array:
            // re-expansion's @json short-circuit literalizes the term's
            // whole raw value, turning {"@list":[...]} → "[...]"^^rdf:JSON
            // (empty lists included — generative sweep wave I, bug #20).
            // Such lists take the full-IRI fallback below, like second
            // lists and lists under map containers.
            val firstListOnTerm =
              container == Container.ListC && !jsonType && !nestResult.contains(itemActiveProperty)
            val carrier =
              if (container == Container.ListC) {
                if (firstListOnTerm) itemActiveProperty
                else activeContext.termDefinitions.get(itemActiveProperty)
                  .flatMap(_.iri).getOrElse(itemActiveProperty)
              } else fallbackProperty
            val compacted0 = compactInternal(activeContext, Some(carrier), list, state)
            val compactedItem = compacted0 match {
              case a: JArr => a
              case other => JArr(other)
            }
            if (firstListOnTerm) nestResult.put(itemActiveProperty, compactedItem)
            else {
              // a @list-container term key IS one list: a SECOND list on
              // the same property cannot ride it (the old put() silently
              // overwrote the first list — data loss; bug #13). Documented
              // data-preserving deviation: subsequent lists (and lists
              // under map-container/@json terms) emit under the property's
              // full IRI as explicit {@list} objects.
              val obj = new JObj()
              obj.put(compactIri(activeContext, "@list", options, None, vocab = true, reverse = false), compactedItem)
              itemObj.removeKey("@index").foreach { idx =>
                obj.put(compactIri(activeContext, "@index", options, None, vocab = true, reverse = false), idx)
              }
              addValue(nestResult, carrier, obj, asArray)
            }
          case None if isGraphObject(itemObj) =>
            // same carrier rule as the @list branch: the {@graph, @id}
            // wrapper path below may emit under the full IRI, where the
            // term's scoped-context/type semantics do not re-apply
            val usesWrapper = !(container.isGraph && (container.isId || !itemObj.contains("@id")))
            val graphCarrier = if (usesWrapper) fallbackProperty else itemActiveProperty
            val compactedItem = compactInternal(activeContext, Some(graphCarrier),
              itemObj.removeKey("@graph").get, state)
            // a graph with MULTIPLE nodes cannot ride a map entry (or a
            // simple container value) as a bare array: re-expansion wraps
            // each array item in ITS OWN graph object, silently splitting
            // one graph into n (cross-product sweep, in=c0017
            // ctx=@graph+@id). Group them under @included — one (empty,
            // RDF-invisible) wrapper node whose @included children stay in
            // the SAME graph — exactly the shape the simple-@graph branch
            // below has always produced (official-style fixture c0017).
            def groupIncluded(ci: JsonValue): JsonValue = ci match {
              case a: JArr if a.size > 1 => JObj("@included" -> a)
              case other => other
            }
            if (container.isGraph && container.isId) {
              val mapObject = mapObjectFor(itemActiveProperty)
              val id = itemObj.get("@id").map(_.asString.get)
              val mapKey = compactIri(activeContext, id.getOrElse("@none"), options, None,
                vocab = id.isEmpty, reverse = false)
              addValue(mapObject, mapKey, groupIncluded(compactedItem), asArray)
            } else if (container.isGraph && !itemObj.contains("@id")) {
              if (container.isIndex) {
                val mapObject = mapObjectFor(itemActiveProperty)
                val mapKey = itemObj.get("@index").map(_.asString.get).getOrElse("@none")
                addValue(mapObject, mapKey, groupIncluded(compactedItem), asArray)
              } else {
                addValue(nestResult, itemActiveProperty, groupIncluded(compactedItem), asArray)
              }
            } else {
              val obj = new JObj()
              obj.put(compactIri(activeContext, "@graph", options, None, vocab = true, reverse = false), compactedItem)
              itemObj.get("@id").map(_.asString.get).foreach { id =>
                obj.put(compactIri(activeContext, "@id", options, None, vocab = true, reverse = false),
                  JStr(compactIri(activeContext, id, options, None, vocab = false, reverse = false)))
              }
              itemObj.removeKey("@index").foreach { idx =>
                obj.put(compactIri(activeContext, "@index", options, None, vocab = true, reverse = false), idx)
              }
              // A graph object that fell through to this {@graph, @id} map
              // form must NOT ride a term whose MAP container would make
              // expansion re-read the map as an index/language/type/id map —
              // that silently splits a named graph into garbage index
              // entries (found by the cross-product sweep: named graph under
              // a ["@graph","@index"] term). The spec's own output for this
              // corner is ambiguous and does not round-trip; documented
              // data-preserving deviation: emit such items under the
              // property's FULL IRI (a key with no term definition), which
              // re-expands as a plain named-graph object.
              addValue(nestResult, fallbackProperty, obj, asArray)
            }
          case None =>
            if (jsonType) {
              val isJsonLiteral = itemObj.contains("@value") && (itemObj.get("@type") match {
                case Some(JStr(s)) => s == "@json"
                case Some(a: JArr) => a.size == 1 && a(0) == JStr("@json")
                case _ => false
              })
              if (isJsonLiteral && !nestResult.contains(itemActiveProperty)) {
                // the one safe shape: a lone raw JSON literal, placed
                // directly — addValue's array splice and the
                // compactArrays=false wrap both CHANGE the literal, since
                // re-expansion reads the term's whole raw value as one
                // literal (array-valued and empty-array literals included)
                nestResult.put(itemActiveProperty,
                  compactInternal(activeContext, Some(itemActiveProperty), itemObj.deepCopy, state))
              } else {
                // second literal on the key, or a node object: the term key
                // would literalize it — emit under the property's full IRI
                // (no term definition there); literals keep an explicit
                // {@value, @type: @json} form so the type survives
                val item =
                  if (isJsonLiteral)
                    JObj("@value" -> itemObj.get("@value").get.deepCopy, "@type" -> JStr("@json"))
                  else // carrier rule: compact node content against the full IRI
                    compactInternal(activeContext, Some(fallbackProperty), itemObj.deepCopy, state)
                addValue(nestResult, fallbackProperty, item, asArray)
              }
            } else {
              val compactedItem = compactInternal(activeContext, Some(itemActiveProperty), itemObj.deepCopy, state)
              compactNodeOrSet(activeContext, itemActiveProperty, nestResult, itemObj, compactedItem,
                container, state, asArray)
            }
        }
      case other =>
        if (jsonType)
          // a bare scalar under a @json-typed term would re-expand as a
          // JSON literal instead of a plain value — full-IRI fallback
          addValue(nestResult, fallbackProperty,
            compactInternal(activeContext, Some(fallbackProperty), other, state), asArray)
        else {
          val compactedItem = compactInternal(activeContext, Some(itemActiveProperty), other, state)
          compactNodeOrSet(activeContext, itemActiveProperty, nestResult, other, compactedItem,
            container, state, asArray)
        }
    }
  }

  /** /root/reference/src/compact.rs:351-446 (spec 12.8.9-12.8.10) */
  private def compactNodeOrSet(
      activeContext: Context,
      itemActiveProperty: String,
      nestResult: JObj,
      expandedItem: JsonValue,
      compactedItem0: JsonValue,
      container: Container,
      state: ApiState,
      asArray: Boolean
  ): Unit = {
    val options = state.options
    var compactedItem = compactedItem0
    val isMapContainer = container match {
      case Container.Unordered(_, Container.GraphKind(false, Some(_))) => true
      case Container.Unordered(_, Container.LanguageKind) => true
      case Container.Unordered(_, Container.TypeKind) => true
      case _ => false
    }
    if (isMapContainer) {
      // map-entry compatibility gate: a language map may only carry plain
      // STRING values (expansion rejects everything else — a boolean
      // compacted into {"@none": false} is un-expandable output, bug #14,
      // generative sweep), and @id/@type maps may only carry NODE objects
      // (a value object re-reads as garbage there). Incompatible items
      // take the property's full IRI — the established data-preserving
      // fallback. Index maps accept any item shape.
      val mapCompatible =
        if (container.isLanguage)
          expandedItem.asObj.exists { eo =>
            eo.get("@value").exists(_.isInstanceOf[JStr]) &&
            eo.keys.forall(k => k == "@value" || k == "@language" || k == "@index")
          }
        else if ((container.isId && !container.isGraph) || container.isType)
          expandedItem.asObj.exists(eo => !eo.contains("@value") && !eo.contains("@list"))
        else true
      if (!mapCompatible) {
        val fullIri = activeContext.termDefinitions.get(itemActiveProperty)
          .flatMap(_.iri).getOrElse(itemActiveProperty)
        // carrier rule: re-compact against the full IRI, where the term's
        // type/language/scoped-context semantics do not re-apply
        addValue(nestResult, fullIri,
          compactInternal(activeContext, Some(fullIri), expandedItem.deepCopy, state), asArray)
        return
      }
      val mapObject = nestResult.get(itemActiveProperty) match {
        case Some(o: JObj) => o
        case _ => val o = new JObj(); nestResult.put(itemActiveProperty, o); o
      }
      val containerKey = compactIri(activeContext, container.kindStr.get, options, None, vocab = true, reverse = false)
      val mapKeyOpt: Option[String] =
        if (container.isLanguage) {
          expandedItem.asObj.flatMap { eo =>
            eo.removeKey("@value").map { v =>
              compactedItem = v
              eo.removeKey("@language").map(_.asString.get)
            }
          }.flatten
        } else if (container.isIndex) {
          activeContext.termDefinitions.get(itemActiveProperty).flatMap(_.indexMapping) match {
            case Some(indexKey) =>
              // property-based index: the FIRST STRING value of the (re-
              // compacted) index property becomes the map key and is removed;
              // remaining values are re-added. A non-string first value
              // cannot be a map key: the entry goes under @none and the
              // property stays UNTOUCHED (removing it would silently lose
              // data — the compact→expand roundtrip must be lossless; c0054/
              // c0055 pin this, matching the JS/Ruby processors; the old
              // formulation dropped a lone non-string value and crashed on
              // asString.get for a non-string array head)
              val ck = compactIri(activeContext, indexKey, options, None, vocab = true, reverse = false)
              compactedItem.asObj.flatMap { co =>
                co.get(ck) match {
                  case Some(idx: JArr) if idx.iterator.hasNext && idx.iterator.next().asString.isDefined =>
                    co.removeKey(ck)
                    val it = idx.iterator.toVector
                    it.drop(1).foreach(v => addValue(co, ck, v, asArray = false))
                    it.head.asString
                  case Some(JStr(s)) =>
                    co.removeKey(ck)
                    Some(s)
                  case _ => None
                }
              }
            case None =>
              compactedItem.asObj.foreach(_.removeKey(containerKey))
              expandedItem.asObj.flatMap(_.removeKey("@index")).map(_.asString.get)
          }
        } else if (container.isId) {
          compactedItem.asObj.flatMap(_.removeKey(containerKey)).map(_.asString.get)
        } else { // type container
          val mapKey = compactedItem.asObj.flatMap { co =>
            co.removeKey(containerKey).flatMap {
              case ty: JArr =>
                val it = ty.iterator.toVector
                val ret = it.headOption.map(_.asString.get)
                it.drop(1).foreach(v => addValue(co, containerKey, v, asArray = false))
                ret
              case JStr(s) => Some(s)
              case _ => None
            }
          }
          val singleIdKey = compactedItem.asObj.exists(co =>
            co.size == 1 && expandIri(activeContext, co.keys.next(), documentRelative = false, vocab = true)
              .contains("@id"))
          if (singleIdKey) {
            val element = JObj("@id" -> expandedItem.asObj.flatMap(_.removeKey("@id")).getOrElse(JNull))
            compactedItem = compactInternal(activeContext, Some(itemActiveProperty), element,
              state.withOptions(options.copy(compactArrays = false, ordered = false)))
          }
          mapKey
        }
      val mapKey = mapKeyOpt.getOrElse(
        compactIri(activeContext, "@none", options, None, vocab = true, reverse = false))
      addValue(mapObject, mapKey, compactedItem, asArray)
    } else {
      addValue(nestResult, itemActiveProperty, compactedItem, asArray)
    }
  }

  /** /root/reference/src/compact.rs:448-467 */
  private def getNestResult(activeContext: Context, itemActiveProperty: String, result: JObj): JObj = {
    activeContext.termDefinitions.get(itemActiveProperty).flatMap(_.nestValue) match {
      case Some(nestTerm) =>
        if (nestTerm != "@nest" &&
            !expandIri(activeContext, nestTerm, documentRelative = false, vocab = true).contains("@nest"))
          throw JsonLdError(InvalidNestValue)
        result.get(nestTerm) match {
          case Some(o: JObj) => o
          case _ => val o = new JObj(); result.put(nestTerm, o); o
        }
      case None => result
    }
  }

  /** IRI Compaction — /root/reference/src/compact.rs:469-706. */
  def compactIri(
      activeContext: Context,
      variable: String,
      options: JsonLdOptions,
      value0: Option[JsonValue],
      vocab: Boolean,
      reverse: Boolean
  ): String = {
    var value = value0
    val inverse = activeContext.inverseContext
    if (vocab && inverse.contains(variable)) {
      val defaultLanguage = makeLangDir(
        activeContext.defaultLanguage.orElse(Some("@none")),
        activeContext.defaultBaseDirection.map(_.str))
      value.flatMap(_.asObj).flatMap(_.get("@preserve")).foreach { preserve =>
        value = Some(preserve.asArr.map(_(0)).getOrElse(preserve))
      }
      val containers = mutable.ArrayBuffer[Container]()
      var typeLanguage: TypeOrLanguage = TypeOrLanguage.Language
      var typeLanguageValue = "@null"

      value.flatMap(_.asObj).foreach { vo =>
        if (vo.contains("@index") && !isGraphObject(vo))
          containers ++= Seq(Container.index, Container.indexes)
      }
      def setDefault(): Unit = {
        typeLanguage = TypeOrLanguage.Type
        typeLanguageValue = "@id"
        containers ++= Seq(Container.id, Container.ids, Container.typ, Container.types)
      }
      if (reverse) {
        typeLanguage = TypeOrLanguage.Type
        typeLanguageValue = "@reverse"
        containers += Container.set
      } else value match {
        case Some(v) =>
          v.asObj match {
            case Some(vo) =>
              vo.get("@list") match {
                case Some(listV) =>
                  val list = listV.asArr.get
                  if (!vo.contains("@index")) containers += Container.list
                  var commonType: Option[String] = None
                  var commonLanguage: Option[String] = if (list.isEmpty) Some(defaultLanguage) else None
                  var break = false
                  for (item <- list.iterator if !break) {
                    var itemLanguage = "@none"
                    var itemType = "@none"
                    item.asObj match {
                      case Some(io) =>
                        if (io.contains("@value")) {
                          val langDir = makeLangDir(
                            io.get("@language").map(_.asString.get),
                            io.get("@direction").map(_.asString.get))
                          if (langDir != "") itemLanguage = langDir
                          else io.get("@type") match {
                            case Some(ty) => itemType = ty.asString.get
                            case None => itemLanguage = "@null"
                          }
                        } else itemType = "@id"
                      case None =>
                    }
                    if (commonLanguage.isEmpty) commonLanguage = Some(itemLanguage)
                    else if (!commonLanguage.contains(itemLanguage) && item.asObj.exists(_.contains("@value")))
                      commonLanguage = Some("@none")
                    if (commonType.isEmpty) commonType = Some(itemType)
                    else if (!commonType.contains(itemType)) commonType = Some("@none")
                    if (commonLanguage.contains("@none") && commonType.contains("@none")) break = true
                  }
                  val cl = commonLanguage.getOrElse("@none")
                  val ct = commonType.getOrElse("@none")
                  if (ct != "@none") { typeLanguage = TypeOrLanguage.Type; typeLanguageValue = ct }
                  else typeLanguageValue = cl
                case None if isGraphObject(vo) =>
                  if (vo.contains("@index")) containers ++= Seq(Container.indexGraph, Container.indexesGraph)
                  if (vo.contains("@id")) containers ++= Seq(Container.idGraph, Container.idsGraph)
                  containers ++= Seq(Container.graph, Container.setGraph, Container.set)
                  if (!vo.contains("@index")) containers ++= Seq(Container.indexGraph, Container.indexesGraph)
                  if (!vo.contains("@id")) containers ++= Seq(Container.idGraph, Container.idsGraph)
                  containers ++= Seq(Container.index, Container.indexes)
                  typeLanguage = TypeOrLanguage.Type
                  typeLanguageValue = "@id"
                case None =>
                  if (vo.contains("@value")) {
                    val langDir =
                      if (!vo.contains("@index"))
                        makeLangDir(vo.get("@language").map(_.asString.get), vo.get("@direction").map(_.asString.get))
                      else ""
                    if (!vo.contains("@index") && langDir != "") {
                      typeLanguageValue = langDir
                      containers ++= Seq(Container.language, Container.languages)
                    } else vo.get("@type").foreach { ty =>
                      typeLanguageValue = ty.asString.get
                      typeLanguage = TypeOrLanguage.Type
                    }
                  } else setDefault()
                  containers += Container.set
              }
            case None =>
              setDefault()
              containers += Container.set
          }
        case None =>
          setDefault()
          containers += Container.set
      }
      containers += Container.none
      if (options.processingMode != ProcessingMode.JsonLd10) {
        value.flatMap(_.asObj) match {
          case Some(vo) =>
            if (!vo.contains("@index")) containers ++= Seq(Container.index, Container.indexes)
            if (vo.size == 1 && vo.contains("@value")) containers ++= Seq(Container.language, Container.languages)
          case None => containers ++= Seq(Container.index, Container.indexes)
        }
      }
      val preferredValues = mutable.ArrayBuffer[String]()
      if (typeLanguageValue == "@reverse") preferredValues += "@reverse"
      val idOpt =
        if (typeLanguageValue == "@id" || typeLanguageValue == "@reverse")
          value.flatMap(_.asObj).flatMap(_.get("@id")).map(_.asString.get)
        else None
      idOpt match {
        case Some(id) =>
          val result = compactIri(activeContext, id, options, None, vocab = true, reverse = false)
          val termMatches = activeContext.termDefinitions.get(result).exists(_.iri.contains(id))
          if (termMatches) { preferredValues += "@vocab"; preferredValues += "@id" }
          else { preferredValues += "@id"; preferredValues += "@vocab" }
        case None => preferredValues += typeLanguageValue
      }
      preferredValues += "@none"
      if (value.flatMap(_.asObj).flatMap(_.get("@list")).flatMap(_.asArr).exists(_.isEmpty))
        typeLanguage = TypeOrLanguage.Any
      preferredValues += "@any"
      val n = preferredValues.length
      for (i <- 0 until n) {
        val v = preferredValues(i)
        val idx = v.indexOf('_')
        if (idx >= 0) preferredValues += v.substring(idx)
      }
      ContextProcessor.selectTerm(activeContext, variable, containers.toSeq, typeLanguage, preferredValues.toSeq) match {
        case Some(term) => return term
        case None =>
      }
    }
    if (vocab) activeContext.vocabularyMapping match {
      case Some(vm) if variable.startsWith(vm) =>
        val suffix = variable.substring(vm.length)
        if (!activeContext.termDefinitions.contains(suffix)) return suffix
      case _ =>
    }
    // lexicographically-least prefix:suffix candidate (/root/reference/src/compact.rs:663-681)
    var candidateResult: Option[String] = None
    for ((key, definition) <- activeContext.termDefinitions) {
      definition.iri match {
        case Some(iri) if iri != variable && variable.startsWith(iri) && definition.prefix =>
          val candidate = key + ":" + variable.substring(iri.length)
          val better = candidateResult.forall(c => candidate.compareTo(c) < 0)
          val ok = activeContext.termDefinitions.get(candidate)
            .forall(d => d.iri.contains(variable) && value.isEmpty)
          if (better && ok) candidateResult = Some(candidate)
        case _ =>
      }
    }
    candidateResult.foreach(c => return c)
    // IRIConfusedWithPrefix guard (/root/reference/src/compact.rs:682-689)
    val schemeIdx = variable.indexOf(':')
    if (schemeIdx >= 0) {
      val after = variable.substring(schemeIdx + 1, math.min(schemeIdx + 3, variable.length))
      if (after != "//" && activeContext.termDefinitions.get(variable.substring(0, schemeIdx)).exists(_.prefix))
        throw JsonLdError(IRIConfusedWithPrefix)
    }
    if (!vocab) activeContext.baseIri match {
      case Some(baseIri) =>
        val resolved = Url.resolve(variable, Some(baseIri)).getOrElse(return variable)
        // when the IRI cannot be made base-relative (different scheme or
        // authority), return it VERBATIM — the parse-reserialize fallback
        // normalized it (e.g. authority-only "http://a" gained a "/" path),
        // silently renaming the RDF resource (cross-product sweep 2 caught
        // it; RDF compares IRIs codepoint-wise, so http://a != http://a/)
        if (baseIri == resolved)
          return baseIri.withDirPath.makeRelative(resolved).getOrElse(variable)
        return baseIri.makeRelative(resolved).getOrElse(variable)
      case None =>
    }
    variable
  }

  /** /root/reference/src/compact.rs:708-762 — includes the documented spec
    * deviation: the @id IRI is compacted regardless of the type
    * (/root/reference/src/compact.rs:718).
    */
  private def compactValue(activeContext: Context, activeProperty: Option[String], value: JObj, options: JsonLdOptions): JsonValue = {
    val termDefinition = defOf(activeContext, activeProperty)
    val typeMapping = termDefinition.flatMap(_.typeMapping)
    val inner: JsonValue = {
      var out: JsonValue = null
      if (value.size == (if (value.contains("@index")) 2 else 1)) {
        value.removeKey("@id").map(_.asString.get) match {
          case Some(id) =>
            out = typeMapping match {
              case Some("@id") => JStr(compactIri(activeContext, id, options, None, vocab = false, reverse = false))
              case Some("@vocab") => JStr(compactIri(activeContext, id, options, None, vocab = true, reverse = false))
              case _ =>
                value.put("@id", JStr(compactIri(activeContext, id, options, None, vocab = false, reverse = false)))
                value
            }
          case None =>
        }
      }
      if (out == null) {
        value.removeKey("@type").map(_.asString.get) match {
          case Some(ty) =>
            if (typeMapping.contains(ty)) out = value.removeKey("@value").get
            else value.put("@type", JStr(compactIri(activeContext, ty, options, None, vocab = true, reverse = false)))
          case None =>
            // under a @json-typed term the ENTIRE raw term value re-expands
            // as one JSON literal (Expansion.scala @json short-circuit), so
            // a plain value must KEEP its explicit {"@value": ...} form —
            // compactItem routes it off the term key (bug #12 family,
            // caught by the compactArrays=false sweep leg)
            if (!typeMapping.contains("@none") && !typeMapping.contains("@json") &&
                (!value.contains("@index") || termDefinition.exists(_.containerMapping.isIndex))) {
              val language = termDefinition.flatMap(_.languageMapping).getOrElse(activeContext.defaultLanguage)
              val direction = termDefinition.flatMap(_.directionMapping)
                .getOrElse(activeContext.defaultBaseDirection.getOrElse(Direction.NoneDir))
              val valueIsString = value.get("@value").exists(_.asString.isDefined)
              if (!valueIsString ||
                  (value.get("@language").map(_.asString.get) == language &&
                    value.get("@direction").map(_.asString.get).getOrElse("@none") == direction.str))
                out = value.removeKey("@value").get
            }
        }
        if (out == null) out = value
      }
      out
    }
    inner match {
      case o: JObj =>
        val rekeyed = new JObj()
        o.foreach { case (k, v) =>
          rekeyed.put(compactIri(activeContext, k, options, None, vocab = true, reverse = false), v)
        }
        rekeyed
      case other => other
    }
  }
}
