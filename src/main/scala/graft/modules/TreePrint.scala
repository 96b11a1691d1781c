package graft.modules

import org.apache.spark.sql.DataFrame

/** ASCII rendering of a tree snapshot (R10, gruptree.py:290-365 /
  * rft.py:279-323) — display-only, so it runs over collected edge rows
  * (snapshots are human-scale by definition).
  */
object TreePrint {

  /** Render one DATE's tree from (CHILD, PARENT) rows; roots have null
    * PARENT.
    */
  def render(edges: DataFrame): String = {
    val rows = edges.select("CHILD", "PARENT").distinct().collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    val children = rows.collect { case (c, Some(p)) => (p, c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val allChildren = rows.collect { case (c, Some(_)) => c }.toSet
    // root candidates include nodes appearing only as PARENT: the
    // reference accepts edge lists without dummy root rows
    // (test_gruptree.py::test_multiple_roots, edges_noroots)
    val nodes = (rows.map(_._1) ++ rows.flatMap(_._2)).distinct
    val roots = nodes.filterNot(allChildren.contains).sorted
    val sb = new StringBuilder
    def walk(node: String, prefix: String, isLast: Boolean, isRoot: Boolean): Unit = {
      if (isRoot) sb.append(node).append('\n')
      else sb.append(prefix).append(if (isLast) "└── " else "├── ").append(node).append('\n')
      val kids = children.getOrElse(node, Nil)
      val childPrefix = if (isRoot) "" else prefix + (if (isLast) "    " else "│   ")
      kids.zipWithIndex.foreach { case (k, i) =>
        walk(k, childPrefix, i == kids.size - 1, isRoot = false)
      }
    }
    roots.foreach(r => walk(r, "", isLast = true, isRoot = true))
    sb.toString
  }
}
