package graft.plugins

import java.io.ByteArrayOutputStream
import java.util.concurrent.TimeUnit

import graft.schemas.{Outlink, ParseStatusCodes}

/** One external command binding: argv prefix (the content type is
  * appended as the final argument, matching the reference's
  * `command + " " + contentType`), a kill timeout, and the charset the
  * command's stdout is decoded with. */
final case class ExtCommand(command: Seq[String], timeoutSec: Int = 30,
    charset: String = "UTF-8")

/** parse-ext analog (ExtParser.java:46-130): parse a content type by
  * piping the raw bytes through a configured external command — stdin =
  * payload, stdout = extracted text, nonzero exit or timeout = parse
  * failure. Types without a binding fall through to the wrapped parser
  * (the real HTML tokenizer by default), so one registry parser serves
  * both paths.
  *
  * Scale notes: the process spawn is per record by design (the
  * reference's CommandRunner does the same); run it inside
  * mapPartitions so JVM-side setup amortizes, and bind only the types
  * that need it — the common HTML path never forks. stdin is fed from a
  * separate thread so a command that emits output before draining its
  * input cannot deadlock the pipe. */
final class ExtParser(typeCommands: Map[String, ExtCommand],
    fallback: Extensions.Parser = new Extensions.HtmlTokenizerParser())
  extends Extensions.Parser {

  def parse(url: String, base: String, bytes: Array[Byte],
      contentType: String): (Int, String, String, Seq[Outlink]) =
    typeCommands.get(contentType) match {
      case None => fallback.parse(url, base, bytes, contentType)
      case Some(cmd) => runCommand(cmd, bytes, contentType)
    }

  private def runCommand(cmd: ExtCommand, bytes: Array[Byte],
      contentType: String): (Int, String, String, Seq[Outlink]) = {
    val failed = (ParseStatusCodes.Failed, "", "", Seq.empty[Outlink])
    try {
      val pb = new ProcessBuilder((cmd.command :+ contentType): _*)
      val proc = pb.start()
      val feeder = new Thread(() => {
        try {
          proc.getOutputStream.write(bytes)
          proc.getOutputStream.close()
        } catch { case _: java.io.IOException => () } // cmd closed stdin
      })
      feeder.setDaemon(true)
      feeder.start()
      // stdout drains on its own thread so a command that hangs without
      // closing its pipes still hits the waitFor timeout below
      val out = new ByteArrayOutputStream()
      val reader = new Thread(() => {
        try {
          val buf = new Array[Byte](4096)
          val in = proc.getInputStream
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } catch { case _: java.io.IOException => () }
      })
      reader.setDaemon(true)
      reader.start()
      if (!proc.waitFor(cmd.timeoutSec.toLong, TimeUnit.SECONDS)) {
        proc.destroyForcibly()
        failed
      } else {
        reader.join(1000) // process exited; let the drain finish
        if (proc.exitValue() != 0) failed
        else (ParseStatusCodes.Success, "",
          new String(out.toByteArray, cmd.charset), Seq.empty)
      }
    } catch { case _: Exception => failed }
  }
}
