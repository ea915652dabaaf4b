package graft.extract

/** PDF page-layout analysis — the north-star's "PDF layout parsing
  * (page-block segmentation, reading-order reconstruction, header/footer
  * removal)" component.
  *
  * The reference extracts PDF text linearly (PyPDF2/fitz/pdfplumber,
  * `/root/reference/src/extractor.py:68-144`) and never sees geometry; the
  * north rule asks for real layout handling, so this module implements the
  * classic public algorithms over positioned text blocks:
  *
  *   - reading order: recursive XY-cut (Nagy & Seth, "Hierarchical
  *     representation of optically scanned documents", ICPR 1984) — split
  *     the page at the widest whitespace valley, horizontal or vertical,
  *     recurse; horizontal splits read top-to-bottom, vertical splits
  *     left-to-right. Falls back to (y, x) sort when no valley exists
  *     (overlapping blocks).
  *   - page segmentation: blank-line grouping of raw lines into blocks.
  *
  * Header/footer removal is relational (repetition across pages) and lives
  * in [[graft.pipeline.LayoutJob]] — it is a groupBy, not per-page logic.
  */
object PageLayout {

  /** A positioned text block on one page. */
  final case class Blk(x: Double, y: Double, w: Double, h: Double, idx: Int)

  /** Reading order of a page's blocks by recursive XY-cut: returns the
    * block `idx`s in reading order. `minGap` is the smallest whitespace
    * valley worth cutting at (in page units). Pure and total: any input
    * terminates (every cut strictly shrinks both sides). */
  def xyCut(blocks: IndexedSeq[Blk], minGap: Double = 5.0): Seq[Int] = {
    if (blocks.isEmpty) return Nil
    if (blocks.length == 1) return Seq(blocks.head.idx)

    // widest internal gap of the merged 1-D intervals, as (gapCenter, width)
    def widestGap(ivs: Seq[(Double, Double)]): (Double, Double) = {
      val sorted = ivs.sortBy(_._1)
      var coveredTo = sorted.head._2
      var bestW = 0.0
      var bestC = 0.0
      sorted.tail.foreach { case (s, e) =>
        if (s > coveredTo) {
          val w = s - coveredTo
          if (w > bestW) { bestW = w; bestC = (coveredTo + s) / 2 }
        }
        if (e > coveredTo) coveredTo = e
      }
      (bestC, bestW)
    }

    val (hCenter, hGap) = widestGap(blocks.map(b => (b.y, b.y + b.h)))
    val (vCenter, vGap) = widestGap(blocks.map(b => (b.x, b.x + b.w)))

    if (hGap >= minGap && hGap >= vGap) {
      val (top, bottom) = blocks.partition(b => b.y + b.h / 2 < hCenter)
      if (top.isEmpty || bottom.isEmpty) fallback(blocks)
      else xyCut(top, minGap) ++ xyCut(bottom, minGap)
    } else if (vGap >= minGap) {
      val (left, right) = blocks.partition(b => b.x + b.w / 2 < vCenter)
      if (left.isEmpty || right.isEmpty) fallback(blocks)
      else xyCut(left, minGap) ++ xyCut(right, minGap)
    } else fallback(blocks)
  }

  private def fallback(blocks: IndexedSeq[Blk]): Seq[Int] =
    blocks.sortBy(b => (b.y, b.x, b.idx)).map(_.idx)

  /** Page segmentation: group a page's raw lines into blocks at blank
    * lines (the text-PDF analogue of connected-component block building).
    * Returns the non-empty blocks, lines joined with "\n". */
  def segmentLines(lines: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = {
      if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    }
    lines.foreach { ln =>
      if (ln == null || ln.trim.isEmpty) flush()
      else {
        if (cur.length > 0) cur.append('\n')
        cur.append(ln)
      }
    }
    flush()
    out.result()
  }

  /** Furniture normalization: lowercase, digit runs → '#', whitespace
    * collapsed — "Page 3" and "Page 12" both become "page #" so per-page
    * variable furniture still counts as repeated.
    *
    * Whitespace class is the ASCII regex `\s` set, NOT
    * `Character.isWhitespace`, so this function is bit-equal to the
    * codegen'd expression form used by [[graft.pipeline.LayoutJob
    * .removeFurniture]] (`regexp_replace(..., "\\s+", " ")`) — LayoutSpec
    * asserts the equivalence. */
  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def normalizeFurniture(text: String): String = {
    if (text == null) return ""
    val sb = new java.lang.StringBuilder(text.length)
    var pendingSpace = false
    var pendingHash = false
    def emit(c: Char): Unit = {
      if (pendingSpace && sb.length > 0) sb.append(' ')
      pendingSpace = false
      sb.append(c)
    }
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') pendingHash = true
      else if (isAsciiWs(c)) {
        if (pendingHash) { emit('#'); pendingHash = false }
        pendingSpace = true
      } else {
        if (pendingHash) { emit('#'); pendingHash = false }
        emit(Character.toLowerCase(c))
      }
      i += 1
    }
    if (pendingHash) emit('#')
    sb.toString
  }
}
