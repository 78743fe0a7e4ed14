package graft.core

/** Spec error codes with the exact rendered strings the reference produces
  * (/root/reference/src/error.rs:14-117); negative tests compare these
  * strings (/root/reference/tests/test.rs:289-297).
  */
object ErrorCode extends Enumeration {
  protected case class Code(rendered: String) extends super.Val(rendered)
  import scala.language.implicitConversions
  implicit def valueToCode(v: Value): Code = v.asInstanceOf[Code]

  val CollidingKeywords = Code("colliding keywords")
  val ContextOverflow = Code("context overflow")
  val CyclicIRIMapping = Code("cyclic IRI mapping")
  val InvalidBaseDirection = Code("invalid base direction")
  val InvalidBaseIRI = Code("invalid base IRI")
  val InvalidContainerMapping = Code("invalid container mapping")
  val InvalidContextEntry = Code("invalid context entry")
  val InvalidContextNullification = Code("invalid context nullification")
  val InvalidDefaultLanguage = Code("invalid default language")
  val InvalidIdValue = Code("invalid @id value")
  val InvalidImportValue = Code("invalid @import value")
  val InvalidIncludedValue = Code("invalid @included value")
  val InvalidIndexValue = Code("invalid @index value")
  val InvalidIRIMapping = Code("invalid IRI mapping")
  val InvalidKeywordAlias = Code("invalid keyword alias")
  val InvalidJsonLiteral = Code("invalid JSON literal")
  val InvalidLanguageMapping = Code("invalid language mapping")
  val InvalidLanguageMapValue = Code("invalid language map value")
  val InvalidLanguageTaggedString = Code("invalid language-tagged string")
  val InvalidLanguageTaggedValue = Code("invalid language-tagged value")
  val InvalidLocalContext = Code("invalid local context")
  val InvalidNestValue = Code("invalid @nest value")
  val InvalidPrefixValue = Code("invalid @prefix value")
  val InvalidPropagateValue = Code("invalid @propagate value")
  val InvalidProtectedValue = Code("invalid @protected value")
  val InvalidRemoteContext = Code("invalid remote context")
  val InvalidReverseProperty = Code("invalid reverse property")
  val InvalidReversePropertyMap = Code("invalid reverse property map")
  val InvalidReversePropertyValue = Code("invalid reverse property value")
  val InvalidReverseValue = Code("invalid @reverse value")
  val InvalidScopedContext = Code("invalid scoped context")
  val InvalidScriptElement = Code("invalid script element")
  val InvalidSetOrListObject = Code("invalid set or list object")
  val InvalidTermDefinition = Code("invalid term definition")
  val InvalidTypedValue = Code("invalid typed value")
  val InvalidTypeMapping = Code("invalid type mapping")
  val InvalidTypeValue = Code("invalid type value")
  val InvalidValueObject = Code("invalid value object")
  val InvalidValueObjectValue = Code("invalid value object value")
  val InvalidVersionValue = Code("invalid @version value")
  val InvalidVocabMapping = Code("invalid vocab mapping")
  // W3C JSON-LD 1.1 Framing spec error (JsonLdFramingError) — the reference
  // defines no framing codes (framing is its commented-out stub); rendered
  // in the same style as the API codes above
  val InvalidEmbedValue = Code("invalid @embed value")
  val IRIConfusedWithPrefix = Code("IRI confused with prefix")
  val KeywordRedefinition = Code("keyword redefinition")
  val LoadingDocumentFailed = Code("loading document failed")
  val LoadingRemoteContextFailed = Code("loading remote context failed")
  val MultipleContextLinkHeaders = Code("multiple context link headers")
  val ProcessingModeConflict = Code("processing mode conflict")
  val ProtectedTermRedefinition = Code("protected term redefinition")
}

/** Thrown by the engine; `render` matches the reference's Display impl
  * (/root/reference/src/error.rs:119-130).
  */
final case class JsonLdError(
    code: ErrorCode.Value,
    description: Option[String] = None,
    causeErr: Option[Throwable] = None
) extends RuntimeException(null, causeErr.orNull, false, false) {
  def render: String = {
    val sb = new StringBuilder(code.rendered)
    description.foreach(d => sb.append(": ").append(d))
    causeErr.foreach {
      case e: JsonLdError => sb.append("\ncaused by: ").append(e.render)
      case e => sb.append("\ncaused by: ").append(e.getMessage)
    }
    sb.toString
  }
  override def getMessage: String = render
}

object JsonLdError {
  def apply(code: ErrorCode.Value, desc: String): JsonLdError = JsonLdError(code, Some(desc), None)
  def cause(code: ErrorCode.Value, e: Throwable): JsonLdError = JsonLdError(code, None, Some(e))
}
