package graft.core

import graft.json._
import ErrorCode._
import Util._
import scala.collection.mutable

/** Context Processing + Create Term Definition + inverse context.
  * Port of /root/reference/src/context.rs (204 + 311 + 47 + 19 LoC), with the
  * reference's deliberate deviation kept: scoped-context validation is hoisted
  * out of Create Term Definition into process_context
  * (/root/reference/src/context.rs:231-245).
  */
object ContextProcessor {

  /** /root/reference/src/context.rs:32 — self-described placeholder value. */
  val MaxContexts = 25

  private[core] def processLanguage(value: JsonValue): Option[String] = value match {
    case JStr(lang) => Some(lang)
    case JNull => None
    case _ => throw JsonLdError(InvalidLanguageMapping)
  }

  private[core] def processDirection(value: JsonValue, nullify: Boolean): Option[Direction] = value match {
    case JStr("ltr") => Some(Direction.LTR)
    case JStr("rtl") => Some(Direction.RTL)
    case JStr(_) => throw JsonLdError(InvalidBaseDirection)
    case JNull => if (nullify) None else Some(Direction.NoneDir)
    case _ => throw JsonLdError(InvalidBaseDirection)
  }

  /** /root/reference/src/context.rs:60-263. Sequential left-fold over the
    * context array (order-dependent). Remote contexts resolve through
    * `state.loader` (broadcast map in the pipeline) with cycle set + overflow
    * guard + shared loaded-context cache.
    */
  def processContext(
      activeContext: Context,
      localContext: Vector[Option[JsonOrRef]],
      baseUrl: Option[Url],
      state: ApiState,
      remoteContexts: mutable.Set[String],
      overrideProtected: Boolean,
      propagate0: Boolean,
      validateScoped0: Boolean
  ): Context = {
    // processed-context cache: only for pristine active contexts (top-level
    // document/span contexts) where the result is a pure function of
    // (context value, base url, initial base fields)
    // only reference-valued contexts are cached: their key is the IRI itself
    // (inline objects would need value serialization, which costs about as
    // much as processing the typically-small object directly)
    val cacheable = !overrideProtected && propagate0 && validateScoped0 &&
      remoteContexts.isEmpty && activeContext.termDefinitions.isEmpty &&
      activeContext.previousContext.isEmpty && activeContext.vocabularyMapping.isEmpty &&
      activeContext.defaultLanguage.isEmpty && activeContext.defaultBaseDirection.isEmpty &&
      localContext.forall(_.exists(_.isInstanceOf[JsonOrRef.Ref]))
    if (cacheable) {
      val key = {
        val sb = new StringBuilder
        localContext.foreach {
          case Some(JsonOrRef.Ref(r)) => sb.append('R').append(r)
          case _ =>
        }
        sb.append('\u0000').append(baseUrl.fold("")(_.serialize))
        sb.append('\u0000').append(activeContext.baseIri.fold("")(_.serialize))
        sb.append('\u0000').append(activeContext.originalBaseUrl.fold("")(_.serialize))
        sb.toString
      }
      val hit = state.processedContexts.get(key)
      if (hit != null) return hit.cloneCtx()
      val computed = processContextUncached(activeContext, localContext, baseUrl, state,
        remoteContexts, overrideProtected, propagate0, validateScoped0)
      state.processedContexts.put(key, computed)
      return computed.cloneCtx()
    }
    processContextUncached(activeContext, localContext, baseUrl, state,
      remoteContexts, overrideProtected, propagate0, validateScoped0)
  }

  private def processContextUncached(
      activeContext: Context,
      localContext: Vector[Option[JsonOrRef]],
      baseUrl: Option[Url],
      state: ApiState,
      remoteContexts: mutable.Set[String],
      overrideProtected: Boolean,
      propagate0: Boolean,
      validateScoped0: Boolean
  ): Context = {
    var propagate = propagate0
    var result = activeContext.cloneCtx()
    if (localContext.size == 1) localContext.head match {
      case Some(JsonOrRef.Obj(ctx)) =>
        ctx.get("@propagate").foreach { v =>
          propagate = v.asBool.getOrElse(throw JsonLdError(InvalidPropagateValue))
        }
      case _ =>
    }
    if (!propagate && result.previousContext.isEmpty)
      result.previousContext = Some(activeContext.cloneCtx())

    for (contextEntry <- localContext) {
      // resolve the entry to (contextJson, entryBase) or skip (cycle) or null-reset
      val resolved: Option[Option[(JObj, Option[Url])]] = contextEntry match {
        case Some(JsonOrRef.Ref(iri0)) =>
          var iri = iri0
          var validateScoped = validateScoped0
          var out: Option[Option[(JObj, Option[Url])]] = null
          while (out == null) {
            val contextUrl = Url.resolve(iri, baseUrl).getOrElse(
              throw JsonLdError(LoadingDocumentFailed, s"cannot resolve context IRI $iri"))
            val key = contextUrl.serialize
            if (!validateScoped && remoteContexts.contains(key)) out = Some(None) // skip entry
            else {
              if (remoteContexts.size > MaxContexts) throw JsonLdError(ContextOverflow)
              remoteContexts += key
              val cached = state.loadedContexts.get(key)
              if (cached != null) out = Some(Some((cached.context, Some(cached.baseUrl))))
              else {
                val doc =
                  try state.loader.load(key)
                  catch { case e: JsonLdError => throw JsonLdError.cause(LoadingRemoteContextFailed, e) }
                val docBase = Url.parse(doc.documentUrl).getOrElse(
                  throw JsonLdError(LoadingRemoteContextFailed, s"bad document url ${doc.documentUrl}"))
                doc.document.asObj.flatMap(_.removeKey("@context")) match {
                  case Some(ctx: JObj) =>
                    val loaded = LoadedContext(ctx, docBase)
                    state.loadedContexts.put(key, loaded)
                    out = Some(Some((loaded.context, Some(loaded.baseUrl))))
                  case Some(JStr(redirect)) =>
                    iri = redirect
                    validateScoped = false
                  case _ => throw JsonLdError(InvalidRemoteContext)
                }
              }
            }
          }
          out
        case Some(JsonOrRef.Obj(json)) => Some(Some((json, None)))
        case None => Some(None) // handled below as null-reset? no — None means null entry
      }

      // reference: filter_map drops the cycle-skip (Ok(None)); null entries flow as Some(None)
      contextEntry match {
        case Some(JsonOrRef.Ref(_)) if resolved.contains(None) => // cycle: skip this entry
        case None =>
          // null context → reset (/root/reference/src/context.rs:250-260)
          if (!overrideProtected && activeContext.termDefinitions.values.exists(_.protectedTerm))
            throw JsonLdError(InvalidContextNullification)
          val reset = new Context(
            baseIri = activeContext.originalBaseUrl,
            originalBaseUrl = activeContext.originalBaseUrl,
            previousContext = if (!propagate) Some(result) else None)
          result = reset
        case _ =>
          val (json0, entryBase) = resolved.get.get
          result = applyContextObject(result, json0, entryBase.orElse(baseUrl), state,
            remoteContexts, overrideProtected, activeContext)
      }
    }
    result
  }

  /** One context-object application (the try_fold body,
    * /root/reference/src/context.rs:134-249).
    */
  private def applyContextObject(
      result0: Context,
      json0: JObj,
      baseUrl: Option[Url],
      state: ApiState,
      remoteContexts: mutable.Set[String],
      overrideProtected: Boolean,
      activeContext: Context
  ): Context = {
    val result = result0
    val options = state.options
    var json = json0

    json.get("@version").foreach { version =>
      if (!version.asNumber.contains(1.1)) throw JsonLdError(InvalidVersionValue)
      if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(ProcessingModeConflict)
    }
    json.get("@import").foreach { importUrl =>
      if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidContextEntry)
      importUrl.asString match {
        case Some(u) =>
          val importIri = Url.resolve(u, baseUrl).getOrElse(
            throw JsonLdError(LoadingDocumentFailed, s"cannot resolve @import $u"))
          val imported =
            try state.loader.load(importIri.serialize)
            catch {
              case e: JsonLdError if e.code == LoadingDocumentFailed =>
                throw e.copy(code = LoadingRemoteContextFailed)
              case e: JsonLdError => throw e
            }
          val importContext = imported.document.asObj.flatMap(_.get("@context")).flatMap(_.asObj)
            .getOrElse(throw JsonLdError(InvalidRemoteContext))
          if (importContext.contains("@import")) throw JsonLdError(InvalidContextEntry)
          // copy-on-write: never mutate a (possibly cached) context object
          val merged = new JObj()
          json.foreach { case (k, v) => merged.put(k, v) }
          importContext.foreach { case (k, v) => if (!merged.contains(k)) merged.put(k, v.deepCopy) }
          json = merged
        case None => throw JsonLdError(InvalidImportValue)
      }
    }
    json.get("@base").foreach { value =>
      if (remoteContexts.isEmpty) value match {
        case JStr(iri) =>
          result.baseIri = Some(Url.resolve(iri, result.baseIri).getOrElse(
            throw JsonLdError(InvalidBaseIRI, s"cannot resolve @base $iri")))
        case JNull => result.baseIri = None
        case _ => throw JsonLdError(InvalidBaseIRI, "not string or null")
      }
    }
    json.get("@vocab").foreach { value =>
      result.vocabularyMapping = value match {
        case JStr(iri) =>
          try IriExpansion.expandIri(IriExpansion.Normal(result), iri, documentRelative = true, vocab = true)
          catch { case e: JsonLdError => throw JsonLdError.cause(InvalidVocabMapping, e) }
        case JNull => None
        case _ => throw JsonLdError(InvalidVocabMapping, "not string or null")
      }
    }
    json.get("@language").foreach { value =>
      result.defaultLanguage =
        try processLanguage(value)
        catch { case _: JsonLdError => throw JsonLdError(InvalidDefaultLanguage) }
    }
    json.get("@direction").foreach { value =>
      // spec 4.1.2 step 5.10.1: @direction under json-ld-1.0 is INVALID
      // CONTEXT ENTRY (only @version raises processing mode conflict); the
      // reference deviates here (context.rs:202) but never runs 1.0 tests,
      // so the spec wins
      if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidContextEntry)
      result.defaultBaseDirection = processDirection(value, nullify = true)
    }
    if (json.contains("@propagate") && options.processingMode == ProcessingMode.JsonLd10)
      throw JsonLdError(InvalidContextEntry)

    val defined = mutable.Map[String, Boolean]()
    val protectedFlag = json.get("@protected")
      .map(_.asBool.getOrElse(throw JsonLdError(InvalidProtectedValue)))
      .getOrElse(false)
    for ((key, value) <- json.iterator) key match {
      case "@base" | "@direction" | "@import" | "@language" | "@propagate" | "@protected" | "@version" | "@vocab" =>
      case _ =>
        createTermDefinition(result, json, key, value, defined, options, baseUrl, protectedFlag, overrideProtected)
        // Hoisted scoped-context validation (/root/reference/src/context.rs:231-245)
        if (value.asObj.exists(_.get("@context").isDefined)) {
          result.termDefinitions.get(key).foreach { defn =>
            try processContext(result, defn.context, baseUrl, state, remoteContexts,
              overrideProtected = true, propagate0 = true, validateScoped0 = false)
            catch { case e: JsonLdError => throw JsonLdError.cause(InvalidScopedContext, e) }
          }
        }
    }
    result
  }

  /** /root/reference/src/context.rs:265-575 */
  def createTermDefinition(
      activeContext: Context,
      localContext: JObj,
      term: String,
      value: JsonValue,
      defined: mutable.Map[String, Boolean],
      options: JsonLdOptions,
      baseUrl: Option[Url],
      protectedFlag: Boolean,
      overrideProtected: Boolean
  ): Unit = {
    defined.get(term) match {
      case Some(true) => return
      case Some(false) => throw JsonLdError(CyclicIRIMapping)
      case None =>
    }
    if (term == "") throw JsonLdError(InvalidTermDefinition)
    defined(term) = false
    if (term == "@type") {
      if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(KeywordRedefinition)
      value match {
        case o: JObj if o.nonEmpty =>
          o.foreach {
            case ("@container", v) if v.asString.contains("@set") =>
            case ("@protected", _) =>
            case _ => throw JsonLdError(KeywordRedefinition)
          }
        case _ => throw JsonLdError(KeywordRedefinition)
      }
    } else {
      if (Iri.isKeyword(term)) throw JsonLdError(KeywordRedefinition)
      if (Iri.looksLikeKeyword(term)) return
    }

    val previousDefinition = activeContext.termDefinitions.get(term)
    activeContext.termDefinitions = activeContext.termDefinitions - term

    // mutable local mirror of the reference's `definition`
    var dIri: Option[String] = None
    var dPrefix = false
    var dProtected = protectedFlag
    var dReverse = false
    var dBaseUrl: Option[Url] = None
    var dContext: Vector[Option[JsonOrRef]] = Vector.empty
    var dContainer: Container = Container.none
    var dDirection: Option[Direction] = None
    var dIndex: Option[String] = None
    var dLanguage: Option[Option[String]] = None
    var dNest: Option[String] = None
    var dType: Option[String] = None

    def ctxIri(v: String): Option[String] =
      IriExpansion.expandIri(
        IriExpansion.DefineTerms(activeContext, localContext, defined, options), v,
        documentRelative = false, vocab = true)

    /** returns true = Break (caller must return early). /root/reference/src/context.rs:335-384 */
    def processId(id: Option[String], simpleTerm: Boolean): Boolean = {
      id match {
        case Some(idv) if idv != term =>
          if (!Iri.isKeyword(idv) && Iri.looksLikeKeyword(idv)) return true
          dIri = ctxIri(idv)
          if (dIri.contains("@context")) throw JsonLdError(InvalidKeywordAlias)
          if ((term.length > 2 && term.substring(1, term.length - 1).contains(':')) || term.contains('/')) {
            defined(term) = true
            if (dIri != ctxIri(term)) throw JsonLdError(InvalidIRIMapping)
          }
          dIri.foreach { iri =>
            if (!(term.contains(':') || term.contains('/')) && simpleTerm &&
                (iri.startsWith("_") || ":/?#[]@".contains(iri.charAt(iri.length - 1))))
              dPrefix = true
          }
          return false
        case _ =>
      }
      Iri.asCompactIri(term) match {
        case Some((prefix, suffix)) =>
          localContext.get(prefix).foreach { prefixDefinition =>
            createTermDefinition(activeContext, localContext, prefix, prefixDefinition, defined, options,
              None, protectedFlag = false, overrideProtected = false)
          }
          activeContext.termDefinitions.get(prefix) match {
            case Some(prefixDefinition) => dIri = Some(prefixDefinition.iri.get + suffix)
            case None => dIri = Some(term)
          }
        case None if term.contains('/') =>
          dIri = IriExpansion.expandIri(IriExpansion.Normal(activeContext), term, documentRelative = false, vocab = true)
          if (!dIri.exists(Iri.isIri)) throw JsonLdError(InvalidIRIMapping)
        case None if term == "@type" =>
          dIri = Some("@type")
        case None =>
          activeContext.vocabularyMapping match {
            case Some(vm) => dIri = Some(vm + term)
            case None => throw JsonLdError(InvalidIRIMapping)
          }
      }
      false
    }

    value match {
      case JStr(id) =>
        if (processId(Some(id), simpleTerm = true)) return
      case JNull =>
      case obj: JObj =>
        if (obj.get("@reverse").isEmpty) {
          obj.get("@id") match {
            case Some(JStr(id)) => if (processId(Some(id), simpleTerm = false)) return
            case Some(JNull) =>
            case Some(_) => throw JsonLdError(InvalidIRIMapping)
            case None => processId(None, simpleTerm = false)
          }
        }
        obj.get("@protected").foreach { p =>
          if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidTermDefinition)
          dProtected = p.asBool.getOrElse(throw JsonLdError(InvalidProtectedValue))
        }
        obj.get("@type").foreach { tyv =>
          val tyStr = tyv.asString.getOrElse(throw JsonLdError(InvalidTypeMapping))
          val ty = ctxIri(tyStr)
          ty.foreach {
            case "@json" | "@none" =>
              if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidTypeMapping)
            case "@id" | "@vocab" =>
            case other => if (!Iri.isIri(other)) throw JsonLdError(InvalidTypeMapping)
          }
          dType = ty
        }
        obj.get("@reverse") match {
          case Some(reverseV) =>
            if (obj.contains("@id") || obj.contains("@nest")) throw JsonLdError(InvalidReverseProperty)
            val reverse = reverseV.asString.getOrElse(throw JsonLdError(InvalidIRIMapping))
            if (Iri.looksLikeKeyword(reverse)) return
            dIri = ctxIri(reverse)
            if (!dIri.exists(Iri.isIri)) throw JsonLdError(InvalidIRIMapping)
            obj.get("@container").foreach {
              case JStr(c @ ("@set" | "@index")) => dContainer = Container.parse(Seq(c))
              case JStr(_) => throw JsonLdError(InvalidReverseProperty)
              case JNull =>
              case _ => throw JsonLdError(InvalidReverseProperty)
            }
            dReverse = true
            activeContext.termDefinitions += term -> TermDefinition(dIri, dPrefix, dProtected, dReverse,
              dBaseUrl, dContext, dContainer, dDirection, dIndex, dLanguage, dNest, dType)
            defined(term) = true
            return
          case None =>
        }
        obj.get("@container").foreach { containerV =>
          dContainer = containerV match {
            case arr: JArr if options.processingMode != ProcessingMode.JsonLd10 =>
              Container.parse(arr.iterator.map(_.asString.getOrElse(throw JsonLdError(InvalidContainerMapping))).toVector)
            case JStr(c) =>
              if (options.processingMode == ProcessingMode.JsonLd10 && (c == "@graph" || c == "@id" || c == "@type"))
                throw JsonLdError(InvalidContainerMapping)
              Container.parse(Seq(c))
            case _ => throw JsonLdError(InvalidContainerMapping)
          }
          if (dContainer.isType) dType match {
            case None => dType = Some("@id")
            case Some("@id") | Some("@vocab") =>
            case _ => throw JsonLdError(InvalidTypeMapping)
          }
        }
        obj.get("@index").foreach { indexV =>
          if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidTermDefinition)
          if (!dContainer.isIndex) throw JsonLdError(InvalidTermDefinition)
          val index = indexV.asString.getOrElse(throw JsonLdError(InvalidTermDefinition))
          if (!ctxIri(index).exists(Iri.isIri)) throw JsonLdError(InvalidTermDefinition)
          dIndex = Some(index)
        }
        obj.get("@context").foreach { contextV =>
          if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidTermDefinition)
          val ctx =
            try contextsFromJson(contextV.deepCopy)
            catch { case e: JsonLdError => throw JsonLdError.cause(InvalidScopedContext, e) }
          dContext = ctx
          dBaseUrl = baseUrl
        }
        if (!obj.contains("@type")) {
          obj.get("@language").foreach(lang => dLanguage = Some(processLanguage(lang)))
          obj.get("@direction").foreach(dir => dDirection = processDirection(dir, nullify = false))
        }
        obj.get("@nest").foreach { nestV =>
          if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidTermDefinition)
          val nest = nestV.asString.getOrElse(throw JsonLdError(InvalidNestValue))
          if (Iri.isKeyword(nest) && nest != "@nest") throw JsonLdError(InvalidNestValue)
          dNest = Some(nest)
        }
        obj.get("@prefix").foreach { prefixV =>
          if (options.processingMode == ProcessingMode.JsonLd10) throw JsonLdError(InvalidTermDefinition)
          if (term.contains(':') || term.contains('/')) throw JsonLdError(InvalidTermDefinition)
          dPrefix = prefixV.asBool.getOrElse(throw JsonLdError(InvalidPrefixValue))
          if (dPrefix && dIri.exists(Iri.isKeyword)) throw JsonLdError(InvalidTermDefinition)
        }
        obj.keys.foreach {
          case "@id" | "@reverse" | "@container" | "@context" | "@direction" | "@index" | "@language" |
               "@nest" | "@prefix" | "@protected" | "@type" =>
          case _ => throw JsonLdError(InvalidTermDefinition)
        }
      case _ => throw JsonLdError(InvalidTermDefinition)
    }

    var definition = TermDefinition(dIri, dPrefix, dProtected, dReverse, dBaseUrl, dContext,
      dContainer, dDirection, dIndex, dLanguage, dNest, dType)
    previousDefinition.foreach { prev =>
      if (!overrideProtected && prev.protectedTerm) {
        if (!definition.sameExceptProtected(prev)) throw JsonLdError(ProtectedTermRedefinition)
        definition = prev
      }
    }
    activeContext.termDefinitions += term -> definition
    defined(term) = true
  }

  type InverseContext = mutable.Map[String, mutable.Map[Container, mutable.Map[TypeOrLanguage, mutable.Map[String, String]]]]

  /** /root/reference/src/context.rs:577-623 */
  def createInverseContext(activeContext: Context): InverseContext = {
    val result: InverseContext = mutable.Map()
    for ((key, value) <- activeContext.termDefinitions) { // shortest-first order
      value.iri match {
        case None =>
        case Some(iri) =>
          val containerMap = result.getOrElseUpdate(iri, mutable.Map())
          val typeLanguageMap = containerMap.getOrElseUpdate(value.containerMapping, {
            mutable.Map[TypeOrLanguage, mutable.Map[String, String]](
              TypeOrLanguage.Language -> mutable.Map(),
              TypeOrLanguage.Type -> mutable.Map(),
              TypeOrLanguage.Any -> mutable.Map())
          })
          def insert(tl: TypeOrLanguage, entry: String): Unit = {
            val m = typeLanguageMap(tl)
            if (!m.contains(entry)) m(entry) = key
          }
          // the spec's step-3 if-chain is EXCLUSIVE: a reverse property
          // registers ONLY under Type/@reverse. Falling through also put it
          // under Type/@none and Language/@none, so term selection for a
          // FORWARD property with only a reverse term picked the reverse
          // term and silently FLIPPED THE EDGE DIRECTION on re-expansion
          // (cross-product sweep 2, in=expand/t0067 ctx=c0052 — bug #9).
          // The same exclusivity applies to the Any bucket (the spec seeds
          // it unconditionally with the first term): an EMPTY LIST selects
          // via TypeOrLanguage.Any, and a reverse term seeded there
          // compacted `{"@list": []}` onto the reverse term — un-expandable
          // output (generative sweep, reverse-term probe context).
          if (value.reverseProperty) insert(TypeOrLanguage.Type, "@reverse")
          else {
          insert(TypeOrLanguage.Any, "@none")
          value.typeMapping match {
            case Some("@none") =>
              insert(TypeOrLanguage.Language, "@any")
              insert(TypeOrLanguage.Type, "@any")
            case Some(tm) => insert(TypeOrLanguage.Type, tm)
            case None =>
              var langDir = makeLangDir(
                value.languageMapping.map(_.getOrElse("@null")),
                value.directionMapping.map(_.str))
              if (langDir == "") {
                langDir = makeLangDir(activeContext.defaultLanguage, activeContext.defaultBaseDirection.map(_.str))
                insert(TypeOrLanguage.Language, "@none")
                insert(TypeOrLanguage.Type, "@none")
              }
              insert(TypeOrLanguage.Language, langDir)
          }
          }
      }
    }
    result
  }

  /** /root/reference/src/context.rs:625-643 */
  def selectTerm(
      activeContext: Context,
      variable: String,
      containers: Seq[Container],
      typeLanguage: TypeOrLanguage,
      preferredValues: Seq[String]
  ): Option[String] = {
    val containerMap = activeContext.inverseContext(variable)
    containers.iterator
      .flatMap(c => containerMap.get(c))
      .map(tlm => tlm(typeLanguage))
      .flatMap(valueMap => preferredValues.iterator.flatMap(p => valueMap.get(p)).take(1))
      .nextOption()
  }
}
