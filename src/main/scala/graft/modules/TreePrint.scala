package graft.modules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** ASCII rendering of a tree snapshot (R10, gruptree.py:290-365 /
  * rft.py:279-323). [[render]] is the reference-parity display form
  * (one collected snapshot — human-scale by definition);
  * [[renderLines]] is the corpus form: one task per tree, rendered
  * lines as rows, no driver collect.
  */
object TreePrint {

  /** The walk shared by both forms: (child, optional parent) pairs →
    * rendered text. Roots include nodes appearing only as PARENT (the
    * reference accepts edge lists without dummy root rows,
    * test_gruptree.py::test_multiple_roots, edges_noroots).
    */
  private[graft] def renderPairs(rows: Seq[(String, Option[String])]): String = {
    val children = rows.collect { case (c, Some(p)) => (p, c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val allChildren = rows.collect { case (c, Some(_)) => c }.toSet
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

  /** Render one DATE's tree from (CHILD, PARENT) rows; roots have null
    * PARENT. Driver-side display form.
    */
  def render(edges: DataFrame): String = {
    val rows = edges.select("CHILD", "PARENT").distinct().collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    renderPairs(rows.toSeq)
  }

  /** Corpus form: render EVERY tree in a keyed edge frame in one
    * distributed plan — one task per key (a snapshot tree is small by
    * nature; a corpus of them distributes across the key space), output
    * one row per rendered line with its 1-based DFS ordinal. This is
    * the same scale shape as the per-deck WLIST fold: `render` is the
    * one-group degenerate case.
    */
  def renderLines(edges: DataFrame, keyCol: String): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col(keyCol).cast("string").as("k"), col("CHILD"), col("PARENT"))
      .distinct()
      .as[(String, String, Option[String])]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val text = renderPairs(it.map(t => (t._2, t._3)).toSeq)
        // filter BEFORE numbering so ordinals stay dense even if a
        // degenerate empty node name renders an empty line
        text.split("\n").iterator
          .filter(_.nonEmpty)
          .zipWithIndex
          .map { case (l, i) => (k, i.toLong + 1, l) }
      }
      .toDF(keyCol, "line_no", "line")
  }
}
