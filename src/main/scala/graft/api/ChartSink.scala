package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, RenderingHints}
import java.nio.file.{Files, Paths}

/** PNG chart sink — the reference's QuickChart render of a price
  * series (chart.js:33-58: 800×400 line chart, blue series, last 60
  * points, written to `charts/<symbol>_<start>_<end>.png`), drawn
  * with JDK-only java.awt raster graphics (headless-safe).
  *
  * Scale posture: a chart is bounded at `maxPoints` BY CONSTRUCTION
  * (the reference slices to 60 for the same reason), so the collect
  * here is O(maxPoints) at any corpus size — the query that produces
  * the series stays fully distributed; only the bounded tail is
  * rasterized driver-side. */
object ChartSink {

  /** Render (x, y) rows as a line chart, keeping the LAST `maxPoints`
    * by `x` (the reference's `slice(-MAX_POINTS)` — but pushed into
    * the engine as desc-sort + limit, the O5 tail-k pattern, so the
    * collect is bounded instead of fetching the full series). `x`
    * must order chronologically as a string (ISO dates do); it is
    * rendered as evenly spaced categorical labels, matching the
    * reference's date-label axis. Returns the written path. */
  def linePng(series: DataFrame, x: String, y: String, label: String,
              path: String, width: Int = 800, height: Int = 400,
              maxPoints: Int = 60): String = {
    // null points are skipped (Schemas allows nullable closes; the
    // reference's renderer draws them as gaps)
    val rows = series.select(col(x).cast("string"), col(y).cast("double"))
      .filter(col(x).isNotNull && col(y).isNotNull)
      .orderBy(col(x).cast("string").desc).limit(maxPoints)
      .collect().sortBy(_.getString(0))
    require(rows.nonEmpty, "no rows to chart")
    val labels = rows.map(_.getString(0))
    val values = rows.map(_.getDouble(1))

    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)

      val (l, r, t, b) = (60, 20, 30, 40) // margins
      val (pw, ph) = (width - l - r, height - t - b)
      val (lo0, hi0) = (values.min, values.max)
      val pad = if (hi0 == lo0) math.max(math.abs(hi0) * 0.05, 1.0)
                else (hi0 - lo0) * 0.05
      val (lo, hi) = (lo0 - pad, hi0 + pad)
      def px(i: Int): Int =
        if (values.length == 1) l + pw / 2
        else l + (i.toDouble * pw / (values.length - 1)).round.toInt
      def py(v: Double): Int = t + ((hi - v) / (hi - lo) * ph).round.toInt

      // axes + y ticks
      g.setColor(Color.LIGHT_GRAY)
      (0 to 4).foreach { k =>
        val v = lo + (hi - lo) * k / 4
        val yy = py(v)
        g.drawLine(l, yy, width - r, yy)
        g.setColor(Color.DARK_GRAY)
        g.drawString(f"$v%.2f", 4, yy + 4)
        g.setColor(Color.LIGHT_GRAY)
      }
      g.setColor(Color.DARK_GRAY)
      g.drawLine(l, t, l, height - b)
      g.drawLine(l, height - b, width - r, height - b)
      // sparse x labels (first / middle / last)
      Seq(0, labels.length / 2, labels.length - 1).distinct.foreach { i =>
        g.drawString(labels(i), px(i) - 24, height - b + 16)
      }
      // the series, reference-blue
      g.setColor(Color.BLUE)
      g.setStroke(new BasicStroke(2f))
      values.indices.sliding(2).foreach {
        case Seq(i, j) => g.drawLine(px(i), py(values(i)), px(j), py(values(j)))
        case _         => () // single point: dot below
      }
      if (values.length == 1)
        g.fillOval(px(0) - 3, py(values(0)) - 3, 6, 6)
      g.drawString(label, l + 8, t + 14)
    } finally g.dispose()

    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    javax.imageio.ImageIO.write(img, "png", p.toFile)
    path
  }
}
