package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Writes measured ANN recall values into a pinned PLANS.md section so a
  * recall regression is visible in round review (diffable receipt), not
  * only as a spec failure. Idempotent per label: re-runs replace the
  * label's line in place. No-op when PLANS.md isn't at the working dir
  * (tests running outside the repo root). */
object RecallReceipts {
  private val header = "## ANN recall receipts (measured by OperatorsSpec, floors asserted at 0.9)"

  def record(label: String, value: Double): Unit = synchronized {
    val path = Paths.get("PLANS.md")
    if (!Files.exists(path)) return
    val line = f"- $label%s: measured $value%.3f"
    val text = Files.readString(path)
    val updated =
      if (!text.contains(header)) s"${text.stripLineEnd}\n\n$header\n\n$line\n"
      else {
        val lines = text.linesIterator.toVector
        val hi = lines.indexOf(header)
        val sectionEnd = lines.indexWhere(_.startsWith("## "), hi + 1) match {
          case -1 => lines.length
          case i  => i
        }
        val existing = (hi + 1) until sectionEnd
        existing.find(i => lines(i).startsWith(s"- $label:")) match {
          case Some(i) => lines.updated(i, line).mkString("", "\n", "\n")
          case None =>
            // append at the section's last non-blank line
            val insertAt = existing.reverse.find(i => lines(i).nonEmpty).map(_ + 1).getOrElse(sectionEnd)
            (lines.take(insertAt) ++ Vector(line) ++ lines.drop(insertAt)).mkString("", "\n", "\n")
        }
      }
    Files.writeString(path, updated, StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
    ()
  }
}
