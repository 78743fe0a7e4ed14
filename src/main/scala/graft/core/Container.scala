package graft.core

import ErrorCode._

/** Container algebra — port of /root/reference/src/container.rs:4-99 and the
  * 20 named constructions in /root/reference/src/macros.rs:69-139.
  */
sealed trait Container {
  import Container._
  def isGraph: Boolean = this match {
    case Unordered(_, GraphKind(g, _)) => g
    case _ => false
  }
  def isId: Boolean = this match {
    case Unordered(_, GraphKind(_, Some(GraphContainerKind.Id))) => true
    case _ => false
  }
  def isIndex: Boolean = this match {
    case Unordered(_, GraphKind(_, Some(GraphContainerKind.Index))) => true
    case _ => false
  }
  def isSet: Boolean = this match {
    case Unordered(true, _) => true
    case _ => false
  }
  def isLanguage: Boolean = this match {
    case Unordered(_, LanguageKind) => true
    case _ => false
  }
  def isType: Boolean = this match {
    case Unordered(_, TypeKind) => true
    case _ => false
  }
  def kindStr: Option[String] = this match {
    case Unordered(_, GraphKind(_, Some(k))) => Some(k.str)
    case Unordered(_, LanguageKind) => Some("@language")
    case Unordered(_, TypeKind) => Some("@type")
    case _ => None
  }
}

object Container {
  case object ListC extends Container
  final case class Unordered(isSetFlag: Boolean, kind: ContainerKind) extends Container

  sealed trait ContainerKind
  final case class GraphKind(isGraphFlag: Boolean, graphKind: Option[GraphContainerKind]) extends ContainerKind
  case object LanguageKind extends ContainerKind
  case object TypeKind extends ContainerKind

  sealed abstract class GraphContainerKind(val str: String)
  object GraphContainerKind {
    case object Id extends GraphContainerKind("@id")
    case object Index extends GraphContainerKind("@index")
  }

  // the named constructions (/root/reference/src/macros.rs:88-139)
  val none: Container = Unordered(false, GraphKind(false, None))
  val list: Container = ListC
  val set: Container = Unordered(true, GraphKind(false, None))
  val graph: Container = Unordered(false, GraphKind(true, None))
  val setGraph: Container = Unordered(true, GraphKind(true, None))
  val id: Container = Unordered(false, GraphKind(false, Some(GraphContainerKind.Id)))
  val index: Container = Unordered(false, GraphKind(false, Some(GraphContainerKind.Index)))
  val ids: Container = Unordered(true, GraphKind(false, Some(GraphContainerKind.Id)))
  val indexes: Container = Unordered(true, GraphKind(false, Some(GraphContainerKind.Index)))
  val idGraph: Container = Unordered(false, GraphKind(true, Some(GraphContainerKind.Id)))
  val indexGraph: Container = Unordered(false, GraphKind(true, Some(GraphContainerKind.Index)))
  val idsGraph: Container = Unordered(true, GraphKind(true, Some(GraphContainerKind.Id)))
  val indexesGraph: Container = Unordered(true, GraphKind(true, Some(GraphContainerKind.Index)))
  val language: Container = Unordered(false, LanguageKind)
  val typ: Container = Unordered(false, TypeKind)
  val languages: Container = Unordered(true, LanguageKind)
  val types: Container = Unordered(true, TypeKind)

  /** /root/reference/src/container.rs:101-142 */
  def parse(containers: Iterable[String]): Container = {
    var isSet = false
    var isGraph = false
    var containerType: Option[String] = None
    for (c <- containers) c match {
      case "@set" if isSet => throw JsonLdError(InvalidContainerMapping, "found multiple @set values")
      case "@set" => isSet = true
      case "@graph" if isGraph => throw JsonLdError(InvalidContainerMapping, "found multiple @graph values")
      case "@graph" => isGraph = true
      case _ if containerType.isDefined => throw JsonLdError(InvalidContainerMapping, "found multiple non-@set/@graph values")
      case c2 => containerType = Some(c2)
    }
    containerType match {
      case Some("@list") if isSet || isGraph =>
        throw JsonLdError(InvalidContainerMapping, "@list container can't be composed with other container types")
      case Some("@list") => ListC
      case None if !(isSet || isGraph) => throw JsonLdError(InvalidContainerMapping, "@container cannot be an empty array")
      case _ =>
        Unordered(isSet, containerType match {
          case Some("@language") | Some("@type") if isGraph =>
            throw JsonLdError(InvalidContainerMapping, "@graph container can't be composed with container types other than @id, @index, and @set")
          case Some("@language") => LanguageKind
          case Some("@type") => TypeKind
          case other =>
            GraphKind(isGraph, other match {
              case Some("@id") => Some(GraphContainerKind.Id)
              case Some("@index") => Some(GraphContainerKind.Index)
              case None => None
              case _ => throw JsonLdError(InvalidContainerMapping, "found unknown container type")
            })
        })
    }
  }
}
