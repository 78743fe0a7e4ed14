package graft.core

import graft.json._
import ErrorCode._
import Util._
import scala.collection.mutable

/** IRI/term expansion (port of /root/reference/src/expand.rs:873-959). */
object IriExpansion {
  sealed trait Args { def activeContext: Context }
  /** Normal mode — read-only context lookup. */
  final case class Normal(ctx: Context) extends Args { def activeContext: Context = ctx }
  /** DefineTerms mode — on-demand term definition creation during context
    * processing (mutates ctx).
    */
  final case class DefineTerms(
      ctx: Context, localContext: JObj,
      defined: mutable.Map[String, Boolean], options: JsonLdOptions
  ) extends Args { def activeContext: Context = ctx }

  def expandIri(args: Args, value: String, documentRelative: Boolean, vocab: Boolean): Option[String] =
    args match {
      case Normal(ctx) => expandIriIn(ctx, null, value, documentRelative, vocab)
      case dt: DefineTerms => expandIriIn(dt.ctx, dt, value, documentRelative, vocab)
    }

  /** Read-only overload — the `Normal(ctx)` wrapper per call was a measured
    * JFR allocation site (expansion calls this once per object key).
    */
  def expandIri(ctx: Context, value: String, documentRelative: Boolean, vocab: Boolean): Option[String] =
    expandIriIn(ctx, null, value, documentRelative, vocab)

  private def expandIriIn(
      activeContext: Context, dt: DefineTerms,
      value: String, documentRelative: Boolean, vocab: Boolean): Option[String] = {
    if (Iri.isKeyword(value)) return Some(value)
    if (Iri.looksLikeKeyword(value)) return None // keyword-lookalike → dropped
    if (dt != null) {
      dt.localContext.get(value).foreach { valueDefinition =>
        if (dt.defined.get(value).contains(false))
          ContextProcessor.createTermDefinition(dt.ctx, dt.localContext, value, valueDefinition, dt.defined,
            dt.options, None, protectedFlag = false, overrideProtected = false)
      }
    }
    activeContext.termDefinitions.get(value) match {
      case Some(definition) if vocab || definition.iri.exists(Iri.isKeyword) =>
        return definition.iri
      case _ =>
    }
    // compact-IRI split (util.rs:36-41) inlined on indexes — the
    // Option[(String,String)] + suffix substring per call was a JFR site
    val ci = if (value.isEmpty) -1 else value.indexOf(':', 1)
    if (ci >= 0) {
      if ((ci == 1 && value.charAt(0) == '_') || value.startsWith("//", ci + 1))
        return Some(value) // bnode / absolute-ish passthrough
      val prefix = value.substring(0, ci)
      if (dt != null) {
        dt.localContext.get(prefix).foreach { prefixDefinition =>
          if (!dt.defined.get(prefix).contains(true))
            ContextProcessor.createTermDefinition(dt.ctx, dt.localContext, prefix, prefixDefinition, dt.defined,
              dt.options, None, protectedFlag = false, overrideProtected = false)
        }
      }
      activeContext.termDefinitions.get(prefix) match {
        case Some(definition) if definition.prefix && definition.iri.isDefined =>
          return Some(definition.iri.get + value.substring(ci + 1))
        case _ =>
      }
      if (Iri.isIri(value)) return Some(value)
    }
    if (vocab) activeContext.vocabularyMapping match {
      case Some(vm) => return Some(vm + value)
      case None =>
    }
    if (documentRelative) activeContext.baseIri match {
      case Some(base) =>
        return Some(Url.resolve(value, Some(base)).getOrElse(
          throw JsonLdError(InvalidBaseIRI, s"cannot resolve $value")).serialize)
      case None =>
    }
    Some(value)
  }
}

/** The Expansion Algorithm — port of /root/reference/src/expand.rs:39-871.
  * Pure JVM recursion over one document; partition-local in the pipeline.
  */
object Expansion {
  import IriExpansion.{expandIri, Normal}

  private def defOf(ctx: Context, prop: Option[String]): Option[TermDefinition] =
    prop.flatMap(ctx.termDefinitions.get)

  /** /root/reference/src/expand.rs:39-118 */
  def expandInternal(
      activeContext: Context,
      activeProperty: Option[String],
      element: JsonValue,
      baseUrl: Option[Url],
      state: ApiState,
      fromMap: Boolean
  ): JsonValue = element match {
    case JNull => JNull
    case array: JArr =>
      val frameExpansion = state.options.frameExpansion && !activeProperty.contains("@default")
      val itemState =
        if (frameExpansion == state.options.frameExpansion) state
        else state.withOptions(state.options.copy(frameExpansion = frameExpansion))
      val definition = defOf(activeContext, activeProperty)
      val result = new JArr()
      array.foreach { item =>
        expandInternal(activeContext, activeProperty, item, baseUrl, itemState, fromMap) match {
          case arr: JArr =>
            if (definition.exists(_.containerMapping == Container.ListC)) result.push(JObj("@list" -> arr))
            else result.appendAll(arr)
          case JNull =>
          case other => result.push(other)
        }
      }
      result
    case obj: JObj => expandObject(activeContext, activeProperty, obj, baseUrl, state, fromMap)
    case scalar =>
      if (activeProperty.isEmpty || activeProperty.contains("@graph")) return JNull // free-floating scalar
      val definition = defOf(activeContext, activeProperty)
      val propertyScoped = definition.map(_.context).getOrElse(Vector.empty)
      if (propertyScoped.nonEmpty)
        expandValue(
          ContextProcessor.processContext(activeContext, propertyScoped, definition.get.baseUrl,
            state, mutable.Set(), overrideProtected = false, propagate0 = true, validateScoped0 = true),
          definition, scalar)
      else expandValue(activeContext, definition, scalar)
  }

  /** /root/reference/src/expand.rs:120-295 */
  def expandObject(
      activeContext0: Context,
      activeProperty: Option[String],
      obj: JObj,
      baseUrl: Option[Url],
      state: ApiState,
      fromMap: Boolean
  ): JsonValue = {
    val definition = defOf(activeContext0, activeProperty)
    val propertyScoped = definition.map(_.context).getOrElse(Vector.empty)
    // previous-context revert (/root/reference/src/expand.rs:135-147)
    var activeContext = activeContext0.previousContext match {
      case Some(previous) if !fromMap &&
          (if (obj.size == 1)
             expandIri(activeContext0, obj.keys.next(), documentRelative = false, vocab = true) match {
               case Some("@value") | Some("@id") => false
               case _ => true
             }
           else !obj.keys.exists(k =>
             expandIri(activeContext0, k, documentRelative = false, vocab = true).contains("@value"))) =>
        previous
      case _ => activeContext0
    }
    if (propertyScoped.nonEmpty)
      activeContext = ContextProcessor.processContext(activeContext, propertyScoped, definition.get.baseUrl,
        state, mutable.Set(), overrideProtected = true, propagate0 = true, validateScoped0 = true)
    // Keys iterated in lexicographic order UNCONDITIONALLY — a deliberate
    // divergence from the reference's insertion-order loop (expand.rs:181,
    // :234). Like the reference, we accumulate reverse-property values
    // directly into result["@reverse"] (expand.rs:414-438) instead of the
    // spec's end-attached local reverse map; under insertion order a
    // reverse TERM processed before a literal "@reverse" key then trips the
    // colliding-keywords guard (expand.rs:725 fires for any keyword already
    // present). Sorted keys put "@"-keywords first and keep the spec
    // outcome (fixture t0012 pins this).
    val entries = obj.sortedEntries
    entries.find(_._1 == "@context").foreach { case (_, context) =>
      activeContext = ContextProcessor.processContext(activeContext, contextsFromJson(context), baseUrl,
        state, mutable.Set(), overrideProtected = false, propagate0 = true, validateScoped0 = true)
    }
    val typeScopedContext = activeContext
    var inputType: Option[String] = None
    // type-scoped contexts in lexicographic term order (expand.rs:181-232)
    for ((key, value) <- entries) {
      if (expandIri(activeContext, key, documentRelative = false, vocab = true).contains("@type")) {
        value match {
          case arr: JArr =>
            val terms = sortedStringSet(arr.iterator.flatMap(_.asString).toVector)
            val withDefs = terms.map { term =>
              inputType = expandIri(activeContext, term, documentRelative = false, vocab = true)
              term
            }.flatMap(term => typeScopedContext.termDefinitions.get(term).map(d => (term, d)))
            for ((term, defn) <- withDefs)
              activeContext = ContextProcessor.processContext(activeContext, defn.context,
                defn.baseUrl, state, mutable.Set(), overrideProtected = false,
                propagate0 = false, validateScoped0 = true)
          case JStr(term) =>
            inputType = expandIri(activeContext, term, documentRelative = false, vocab = true)
            typeScopedContext.termDefinitions.get(term).foreach { defn =>
              activeContext = ContextProcessor.processContext(activeContext, defn.context,
                defn.baseUrl, state, mutable.Set(), overrideProtected = false,
                propagate0 = false, validateScoped0 = true)
            }
          case _ =>
        }
      }
    }

    var result = new JObj()
    expandObjectProperties(result, activeContext, typeScopedContext, activeProperty, entries, baseUrl, inputType, state)

    // value-object validation (expand.rs:235-273)
    result.get("@value") match {
      case Some(value) =>
        var count = 1
        var literal = false
        var invalidTypedValue = false
        result.get("@type") match {
          case Some(ty) =>
            count += 1
            if (result.contains("@language") || result.contains("@direction")) throw JsonLdError(InvalidValueObject)
            if (ty.asString.contains("@json")) literal = true
            else invalidTypedValue = !ty.asString.exists(Iri.isIri)
          case None =>
            if (result.contains("@language")) count += 1
            if (result.contains("@direction")) count += 1
        }
        if (result.contains("@index")) count += 1
        if (result.size != count) throw JsonLdError(InvalidValueObject)
        // frame patterns: under frameExpansion @value may be {} (wildcard)
        // or an array of scalars (match set) — exempt from value validation
        val framePattern = state.options.frameExpansion &&
          (value.asObj.exists(_.isEmpty) || value.asArr.isDefined)
        if (!literal && !framePattern) {
          if (value.isNull || value.asArr.exists(_.isEmpty)) return JNull
          if (value.asString.isEmpty && result.contains("@language")) throw JsonLdError(InvalidLanguageTaggedValue)
          if (invalidTypedValue) throw JsonLdError(InvalidTypedValue)
        }
      case None =>
        if (result.get("@type").exists(_.asArr.isEmpty)) {
          val ty = result.removeKey("@type").get
          result.put("@type", JArr(ty))
        } else result.removeKey("@set") match {
          case Some(set) =>
            if (result.size != (if (result.contains("@index")) 1 else 0)) throw JsonLdError(InvalidSetOrListObject)
            set match {
              case o: JObj => result = o
              case other => return other
            }
          case None =>
            if (result.contains("@list") && result.size != (if (result.contains("@index")) 2 else 1))
              throw JsonLdError(InvalidSetOrListObject)
        }
    }
    // null-elision of vacuous results (expand.rs:288-293)
    if ((result.size == 1 && result.contains("@language")) ||
        (activeProperty.isEmpty || activeProperty.contains("@graph")) &&
        (result.isEmpty || result.contains("@value") || result.contains("@list") ||
          (!state.options.frameExpansion && result.size == 1 && result.contains("@id"))))
      return JNull
    result
  }

  /** /root/reference/src/expand.rs:297-459 (spec 13~14) */
  private def expandObjectProperties(
      result: JObj,
      activeContext: Context,
      typeScopedContext: Context,
      activeProperty: Option[String],
      element: Iterable[(String, JsonValue)],
      baseUrl: Option[Url],
      inputType: Option[String],
      state: ApiState
  ): Unit = {
    val nests = mutable.TreeMap[String, JsonValue]()
    // literal keyword keys seen in THIS object: the colliding-keywords check
    // must fire when two KEYS expand to the same keyword ("rev" and
    // "@reverse"), NOT when result["@reverse"] already exists because a
    // reverse TERM accumulated values there — spec-compliant compaction
    // emits a reverse term next to a residual aliased @reverse block
    // (compact fixture c0052 round-trip caught the over-eager guard)
    val literalKeywords = mutable.Set[String]()
    for ((key, value) <- element) {
      expandIri(activeContext, key, documentRelative = false, vocab = true) match {
        case None => // drop keys that could not be expanded
        case Some(expandedProperty) if !(expandedProperty.contains(':') || Iri.isKeyword(expandedProperty)) => // drop
        case Some(expandedProperty) =>
          if (Iri.isKeyword(expandedProperty)) {
            expandKeyword(result, nests, activeContext, typeScopedContext, activeProperty, key,
              expandedProperty, value, baseUrl, inputType, state, literalKeywords)
          } else {
            val definition = activeContext.termDefinitions.get(key)
            val containerMapping = definition.map(_.containerMapping).getOrElse(Container.none)
            var expandedValue: JsonValue =
              if (definition.flatMap(_.typeMapping).contains("@json"))
                JObj("@value" -> value.deepCopy, "@type" -> JStr("@json"))
              else value match {
                case vobj: JObj if containerMapping.isLanguage =>
                  val direction = definition.flatMap(_.directionMapping).orElse(activeContext.defaultBaseDirection)
                  val mapEntries = if (state.options.ordered) vobj.sortedEntries else vobj.iterator.toVector
                  expandLanguageMap(activeContext, mapEntries, direction)
                case vobj: JObj if containerMapping.isIndex || containerMapping.isType || containerMapping.isId =>
                  val indexKey =
                    if (containerMapping.isIndex) definition.flatMap(_.indexMapping).getOrElse("@index")
                    else if (containerMapping.isType) "@type"
                    else "@id"
                  val mapContext =
                    if (containerMapping.isIndex) activeContext
                    else activeContext.previousContext.getOrElse(activeContext)
                  val asGraph = containerMapping.isGraph
                  val propertyIndex = indexKey != "@index" && containerMapping.isIndex
                  val mapEntries = if (state.options.ordered) vobj.sortedEntries else vobj.iterator.toVector
                  expandIndexMap(mapContext, key, mapEntries, indexKey, asGraph, propertyIndex, baseUrl, state)
                case vobj: JObj =>
                  expandObject(activeContext, Some(key), vobj, baseUrl, state, fromMap = false)
                case other =>
                  expandInternal(activeContext, Some(key), other, baseUrl, state, fromMap = false)
              }
            if (expandedValue != JNull) {
              if (containerMapping == Container.ListC) {
                val isListObj = expandedValue match {
                  case o: JObj => o.contains("@list")
                  case _ => false
                }
                if (!isListObj) expandedValue = JObj("@list" -> (expandedValue match {
                  case a: JArr => a
                  case other => JArr(other)
                }))
              }
              if (containerMapping.isGraph && !containerMapping.isId && !containerMapping.isIndex) {
                // wrap only values that are NOT already graph objects (spec
                // 13.8 "if ev is not a graph object") — the same guard the
                // @graph+@index map path below has always had. Re-wrapping
                // an explicit (possibly NAMED) graph object buried it inside
                // a fresh anonymous graph, so compaction's named-graph-
                // under-simple-@graph-container output did not round-trip
                // (found by the cross-product sweep, in=c0016 ctx=c0017).
                def intoGraphObject(ev: JsonValue): JsonValue = ev match {
                  case o: JObj if isGraphObject(o) => o
                  case _ => JObj("@graph" -> (ev match { case a: JArr => a; case o => JArr(o) }))
                }
                expandedValue = expandedValue match {
                  case arr: JArr => JArr.from(arr.iterator.map(intoGraphObject))
                  case other => intoGraphObject(other)
                }
              }
              if (definition.exists(_.reverseProperty)) {
                val reverseMap = result.get("@reverse") match {
                  case Some(o: JObj) => o
                  case _ => val o = new JObj(); result.put("@reverse", o); o
                }
                val items = expandedValue match {
                  case a: JArr => a
                  case other => JArr(other)
                }
                items.foreach { item =>
                  if (item.asObj.exists(o => o.contains("@value") || o.contains("@list")))
                    throw JsonLdError(InvalidReversePropertyValue)
                  if (!reverseMap.contains(expandedProperty)) reverseMap.put(expandedProperty, new JArr())
                  addValue(reverseMap, expandedProperty, item, asArray = true)
                }
              } else addValue(result, expandedProperty, expandedValue, asArray = true)
            }
          }
      }
    }
    for ((_, nestedValues) <- nests) nestedValues match {
      case arr: JArr =>
        arr.foreach {
          case nested: JObj =>
            expandNestedValue(result, nested, activeContext, typeScopedContext, activeProperty, baseUrl, inputType, state)
          case _ => throw JsonLdError(InvalidNestValue)
        }
      case nested: JObj =>
        expandNestedValue(result, nested, activeContext, typeScopedContext, activeProperty, baseUrl, inputType, state)
      case _ => throw JsonLdError(InvalidNestValue)
    }
  }

  /** /root/reference/src/expand.rs:461-501 (spec 13.7) */
  private def expandLanguageMap(
      activeContext: Context,
      languageMap: Iterable[(String, JsonValue)],
      direction: Option[Direction]
  ): JArr = {
    val result = new JArr()
    for ((language0, languageValue) <- languageMap) {
      val language =
        if (language0 != "@none" &&
            !expandIri(activeContext, language0, documentRelative = false, vocab = true).contains("@none"))
          Some(language0)
        else None
      languageValue match {
        case arr: JArr =>
          arr.foreach(item => expandLanguageValue(language, item, direction).foreach(result.push))
        case other =>
          expandLanguageValue(language, other, direction).foreach(result.push)
      }
    }
    result
  }

  private def expandLanguageValue(language: Option[String], languageValue: JsonValue, direction: Option[Direction]): Option[JObj] =
    languageValue match {
      case JNull => None
      case JStr(s) =>
        val v = JObj("@value" -> JStr(s))
        language.foreach(l => v.put("@language", JStr(l)))
        direction.foreach(d => if (d != Direction.NoneDir) v.put("@direction", JStr(d.str)))
        Some(v)
      case _ => throw JsonLdError(InvalidLanguageMapValue)
    }

  /** /root/reference/src/expand.rs:503-556 (spec 13.8) */
  private def expandIndexMap(
      mapContext0: Context,
      key: String,
      indexMap: Iterable[(String, JsonValue)],
      indexKey: String,
      asGraph: Boolean,
      propertyIndex: Boolean,
      baseUrl: Option[Url],
      state: ApiState
  ): JArr = {
    val result = new JArr()
    for ((index, indexValue0) <- indexMap) {
      val mapContext = (if (indexKey == "@type") mapContext0.termDefinitions.get(index) else None) match {
        case Some(defn) if defn.context.nonEmpty =>
          ContextProcessor.processContext(mapContext0, defn.context, defn.baseUrl, state, mutable.Set(),
            overrideProtected = false, propagate0 = true, validateScoped0 = true)
        case _ => mapContext0
      }
      val expandedIndex = expandIri(mapContext, index,
        documentRelative = indexKey == "@id", vocab = indexKey != "@id")
      expandInternal(mapContext, Some(key), indexValue0, baseUrl, state, fromMap = true) match {
        case arr: JArr =>
          arr.foreach(item =>
            result.push(expandIndexValue(mapContext, index, expandedIndex, item, indexKey, asGraph, propertyIndex)))
        case other =>
          result.push(expandIndexValue(mapContext, index, expandedIndex, other, indexKey, asGraph, propertyIndex))
      }
    }
    result
  }

  /** /root/reference/src/expand.rs:558-613 (spec 13.8.3.7) */
  private def expandIndexValue(
      mapContext: Context,
      index: String,
      expandedIndex: Option[String],
      indexValue0: JsonValue,
      indexKey: String,
      asGraph: Boolean,
      propertyIndex: Boolean
  ): JObj = {
    var indexValue = indexValue0.asObj.getOrElse(throw JsonLdError(InvalidValueObject))
    if (asGraph && !isGraphObject(indexValue)) indexValue = JObj("@graph" -> JArr(indexValue))
    expandedIndex match {
      case Some(ei) if ei != "@none" =>
        if (propertyIndex) {
          // spec 13.8.3.7.2: a property-based index cannot be attached to a
          // value object (adding a property IRI key to it would make it an
          // object that is both value and node). Deliberate deviation from
          // the reference (expand.rs:577-585 omits the check and silently
          // emits the malformed object) — same policy as the compact.rs:718
          // deviation: follow the spec, document the difference.
          if (indexValue.contains("@value")) throw JsonLdError(InvalidValueObject)
          val reexpandedIndex = expandValue(mapContext, mapContext.termDefinitions.get(indexKey), JStr(index))
          expandIri(mapContext, indexKey, documentRelative = false, vocab = true).foreach { expandedIndexKey =>
            val array = JArr(reexpandedIndex)
            indexValue.removeKey(expandedIndexKey).foreach {
              case a: JArr => array.appendAll(a)
              case v => array.push(v)
            }
            indexValue.put(expandedIndexKey, array)
          }
        } else indexKey match {
          case "@index" if !indexValue.contains("@index") => indexValue.put(indexKey, JStr(index))
          case "@id" if !indexValue.contains("@id") => indexValue.put(indexKey, JStr(ei))
          case "@type" =>
            val array = JArr(JStr(ei))
            indexValue.removeKey("@type").foreach {
              case a: JArr => array.appendAll(a)
              case v => array.push(v)
            }
            indexValue.put("@type", array)
          case _ =>
        }
      case _ =>
    }
    indexValue
  }

  /** /root/reference/src/expand.rs:615-645 (spec 14.1) */
  private def expandNestedValue(
      result: JObj,
      nestedValue: JObj,
      activeContext: Context,
      typeScopedContext: Context,
      activeProperty: Option[String],
      baseUrl: Option[Url],
      inputType: Option[String],
      state: ApiState
  ): Unit = {
    for ((key, _) <- nestedValue.iterator)
      if (expandIri(activeContext, key, documentRelative = false, vocab = true).contains("@value"))
        throw JsonLdError(InvalidNestValue)
    expandObjectProperties(result, activeContext, typeScopedContext, activeProperty,
      nestedValue.iterator.toVector, baseUrl, inputType, state)
  }

  /** /root/reference/src/expand.rs:647-871 (spec 13.4) */
  private def expandKeyword(
      result: JObj,
      nests: mutable.TreeMap[String, JsonValue],
      activeContext: Context,
      typeScopedContext: Context,
      activeProperty: Option[String],
      key: String,
      expandedProperty: String,
      value: JsonValue,
      baseUrl: Option[Url],
      inputType: Option[String],
      state: ApiState,
      literalKeywords: mutable.Set[String]
  ): Unit = {
    val options = state.options
    val is10 = options.processingMode == ProcessingMode.JsonLd10
    if (activeProperty.contains("@reverse")) throw JsonLdError(InvalidReversePropertyMap)
    // false when ANOTHER literal key already expanded to this keyword
    val repeatedLiteral = !literalKeywords.add(expandedProperty)
    expandedProperty match {
      case "@type" =>
        if (is10 && result.contains(key)) throw JsonLdError(CollidingKeywords)
        value match {
          case JStr(iri) =>
            val expanded = expandIri(typeScopedContext, iri, documentRelative = true, vocab = true)
              .map[JsonValue](JStr.apply).getOrElse(JNull)
            addValue(result, expandedProperty, expanded, asArray = false)
          case arr: JArr =>
            // under frame expansion an empty @type array is preserved, not
            // dropped — framing relies on [] as the "match no type" pattern
            // (Framing §2.1). Normal mode drops it, matching the reference
            // (expand.rs:677-685, whose per-item loop adds nothing for []).
            if (arr.isEmpty && options.frameExpansion && !result.contains(expandedProperty))
              result.put(expandedProperty, new JArr())
            else arr.foreach { item =>
              val iri = item.asString.getOrElse(throw JsonLdError(InvalidTypeValue))
              val expanded = expandIri(typeScopedContext, iri, documentRelative = true, vocab = true)
                .map[JsonValue](JStr.apply).getOrElse(JNull)
              addValue(result, expandedProperty, expanded, asArray = false)
            }
          case o: JObj if options.frameExpansion =>
            result.put(expandedProperty,
              if (o.isEmpty) new JObj()
              else o.get("@default").flatMap(_.asString) match {
                case Some(default) =>
                  JObj("@default" -> expandIri(typeScopedContext, default, documentRelative = true, vocab = true)
                    .map[JsonValue](JStr.apply).getOrElse(JNull))
                case None => throw JsonLdError(InvalidTypeValue)
              })
          case _ => throw JsonLdError(InvalidTypeValue)
        }
      case "@included" if !is10 =>
        expandInternal(activeContext, None, value, baseUrl, state, fromMap = false) match {
          case arr: JArr =>
            arr.foreach { v =>
              v.asObj match {
                case Some(o) =>
                  if (o.contains("@value") || o.contains("@list") || o.contains("@set") || o.contains("@graph"))
                    throw JsonLdError(InvalidIncludedValue)
                case None => throw JsonLdError(InvalidIncludedValue)
              }
            }
            addValue(result, expandedProperty, arr, asArray = true)
          case o: JObj =>
            if (o.contains("@value") || o.contains("@list") || o.contains("@set") || o.contains("@graph"))
              throw JsonLdError(InvalidIncludedValue)
            addValue(result, expandedProperty, o, asArray = true)
          case _ => throw JsonLdError(InvalidIncludedValue)
        }
      case "@reverse" if repeatedLiteral => throw JsonLdError(CollidingKeywords)
      case _ if expandedProperty != "@reverse" && result.contains(expandedProperty) =>
        throw JsonLdError(CollidingKeywords)
      case "@id" =>
        result.put(expandedProperty, value match {
          case JStr(iri) =>
            expandIri(activeContext, iri, documentRelative = true, vocab = false)
              .map[JsonValue](JStr.apply).getOrElse(JNull)
          case arr: JArr if options.frameExpansion =>
            JArr.from(arr.iterator.map { item =>
              val iri = item.asString.getOrElse(throw JsonLdError(InvalidIdValue))
              expandIri(activeContext, iri, documentRelative = true, vocab = false)
                .map[JsonValue](JStr.apply).getOrElse(JNull)
            })
          case o: JObj if options.frameExpansion && o.isEmpty => new JObj()
          case _ => throw JsonLdError(InvalidIdValue)
        })
      case "@graph" =>
        val expanded = expandInternal(activeContext, Some("@graph"), value, baseUrl, state, fromMap = false)
        result.put(expandedProperty, expanded match {
          case a: JArr => a
          case other => JArr(other)
        })
      case "@value" =>
        result.put(expandedProperty,
          if (inputType.contains("@json")) {
            if (is10) throw JsonLdError(InvalidValueObjectValue)
            value.deepCopy
          } else value match {
            case arr: JArr if options.frameExpansion =>
              JArr.from(arr.iterator.map(i =>
                JStr(i.asString.getOrElse(throw JsonLdError(InvalidValueObjectValue))): JsonValue))
            case o: JObj if options.frameExpansion && o.isEmpty => value.deepCopy
            case _: JArr | _: JObj => throw JsonLdError(InvalidValueObjectValue)
            case _ => value.deepCopy
          })
      case "@language" =>
        result.put(expandedProperty, value match {
          case JStr(lang) => JStr(lang)
          case arr: JArr if options.frameExpansion =>
            JArr.from(arr.iterator.map(i =>
              JStr(i.asString.getOrElse(throw JsonLdError(InvalidLanguageTaggedString))): JsonValue))
          case o: JObj if options.frameExpansion && o.isEmpty => new JObj()
          case _ => throw JsonLdError(InvalidLanguageTaggedString)
        })
      case "@direction" =>
        result.put(expandedProperty, value match {
          case JStr(dir) =>
            if (dir != "ltr" && dir != "rtl") throw JsonLdError(InvalidBaseDirection)
            JStr(dir)
          case arr: JArr if options.frameExpansion =>
            JArr.from(arr.iterator.map { i =>
              val dir = i.asString.getOrElse(throw JsonLdError(InvalidBaseDirection))
              if (dir != "ltr" && dir != "rtl") throw JsonLdError(InvalidBaseDirection)
              JStr(dir): JsonValue
            })
          case o: JObj if options.frameExpansion && o.isEmpty => new JObj()
          case _ => throw JsonLdError(InvalidBaseDirection)
        })
      case "@index" =>
        value match {
          case JStr(s) => result.put(expandedProperty, JStr(s))
          case _ => throw JsonLdError(InvalidIndexValue)
        }
      case "@list" =>
        activeProperty match {
          case None | Some("@graph") => // free-floating list dropped
          case _ =>
            addValue(result, expandedProperty,
              expandInternal(activeContext, activeProperty, value, baseUrl, state, fromMap = false), asArray = true)
        }
      case "@set" =>
        result.put(expandedProperty, expandInternal(activeContext, activeProperty, value, baseUrl, state, fromMap = false))
      case "@reverse" =>
        value match {
          case _: JObj =>
            expandInternal(activeContext, Some("@reverse"), value, baseUrl, state, fromMap = false) match {
              case expandedValue: JObj =>
                expandedValue.removeKey("@reverse").foreach { rev =>
                  rev.asObj.get.foreach { case (property, item) =>
                    addValue(result, property, item, asArray = true)
                  }
                }
                if (expandedValue.nonEmpty) {
                  val reverseMap = result.get("@reverse") match {
                    case Some(o: JObj) => o
                    case _ => val o = new JObj(); result.put("@reverse", o); o
                  }
                  expandedValue.foreach { case (property, items) =>
                    items.asArr.get.foreach { item =>
                      item.asObj.foreach { o =>
                        if (o.contains("@value") || o.contains("@list"))
                          throw JsonLdError(InvalidReversePropertyValue)
                      }
                      addValue(reverseMap, property, item, asArray = true)
                    }
                  }
                }
              case _ =>
            }
          case _ => throw JsonLdError(InvalidReverseValue)
        }
      case "@nest" =>
        nests.put(key, value.deepCopy)
      case "@default" | "@embed" | "@explicit" | "@omitDefault" | "@requireAll"
          if options.frameExpansion =>
        // W3C Expansion step 13.4.16: framing keywords expand recursively
        // with frameExpansion off (functionality beyond the reference — its
        // frame API is stubbed at /root/reference/src/lib.rs:479-481)
        val expanded = Expansion.expandInternal(activeContext, Some(expandedProperty), value.deepCopy,
          baseUrl, state.withOptions(options.copy(frameExpansion = false)), fromMap = false)
        result.put(expandedProperty, expanded)
      case _ => // unknown @-keywords ignored
    }
  }

  /** /root/reference/src/expand.rs:961-996 — value coercion. */
  def expandValue(activeContext: Context, definition: Option[TermDefinition], value: JsonValue): JObj = {
    val typeMapping = definition.flatMap(_.typeMapping)
    (typeMapping, value) match {
      case (Some(tm @ ("@id" | "@vocab")), JStr(s)) =>
        return JObj("@id" -> expandIri(activeContext, s, documentRelative = true, vocab = tm == "@vocab")
          .map[JsonValue](JStr.apply).getOrElse(JNull))
      case _ =>
    }
    val result = new JObj()
    typeMapping match {
      case Some(tm) =>
        if (tm != "@id" && tm != "@vocab" && tm != "@none") result.put("@type", JStr(tm))
      case None =>
        if (value.isInstanceOf[JStr]) {
          definition.flatMap(_.languageMapping).getOrElse(activeContext.defaultLanguage) match {
            case Some(language) => result.put("@language", JStr(language))
            case None =>
          }
          definition.flatMap(_.directionMapping).orElse(activeContext.defaultBaseDirection).foreach { d =>
            if (d != Direction.NoneDir) result.put("@direction", JStr(d.str))
          }
        }
    }
    result.put("@value", value match {
      case n: JNum => n
      case s: JStr => s
      case JNull => JNull
      case b: JBool => b
      case _ => throw new IllegalStateException("a compound value was passed into expandValue")
    })
    result
  }
}
