package graft.core

import graft.json._
import scala.collection.mutable

/** Flattening Algorithm (W3C JSON-LD 1.1 API §7.1), filling the API surface
  * the reference declares but comments out
  * (/root/reference/src/lib.rs:470-477). Reuses the same Node Map Generation
  * pass as ToRdf (the spec shares it between flatten and toRdf).
  *
  * Output node order: the spec sorts only when `ordered` is set; we sort
  * always — flatten output is compared order-insensitively (json_ld_eq), and
  * deterministic order keeps the distributed pipeline reproducible.
  */
object Flatten {

  /** Flatten an already-expanded document. Returns the flattened expanded
    * array (default-graph nodes, named graphs nested under `@graph`).
    */
  def flattenExpanded(expanded: JArr): JArr = {
    val gen = new ToRdf.BnodeGenerator
    val nodeMap = mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, JObj]]()
    nodeMap.getOrElseUpdate("@default", mutable.LinkedHashMap())
    ToRdf.generateNodeMap(expanded, nodeMap, gen, "@default", None, None, None)

    val defaultGraph = nodeMap("@default")
    for (graphName <- nodeMap.keysIterator.filter(_ != "@default").toVector.sorted) {
      val entry = defaultGraph.getOrElseUpdate(graphName, JObj("@id" -> JStr(graphName)))
      val graphArr = new JArr()
      entry.put("@graph", graphArr)
      for ((_, node) <- nodeMap(graphName).toVector.sortBy(_._1))
        if (!onlyId(node)) graphArr.push(node)
    }
    val flattened = new JArr()
    for ((_, node) <- defaultGraph.toVector.sortBy(_._1))
      if (!onlyId(node)) flattened.push(node)
    flattened
  }

  private def onlyId(node: JObj): Boolean = node.size == 1 && node.contains("@id")
}
