package graft.ops

import java.util.zip.Inflater

/** First-party PDF text extraction — the parse-tika PDF analog
  * (reference: src/plugin/parse-tika, TestPdfParser.java expects
  * "A VERY SMALL PDF FILE" from both its samples; PdfParseSpec passes
  * BOTH, including the RC4-encrypted one, through this parser).
  *
  * Scope (the classic text-PDF family a crawler mostly sees):
  *   - object scan without trusting xref (robust to truncated or
  *     regenerated tables), object streams (/Type/ObjStm, PDF 1.5+),
  *     indirect /Length, Flate with optional PNG-predictor DecodeParms
  *   - Standard security handler, EMPTY user password, all revisions:
  *     V1/V2 R2/R3 (40..128-bit RC4), V4 R4 crypt filters (/CFM /V2 =
  *     RC4-128, /CFM /AESV2 = AES-128-CBC with the per-object sAlT
  *     key, ISO 32000-1 §7.6.2 Algorithm 1), and V5 R5/R6 (/CFM
  *     /AESV3 = AES-256-CBC under the file key directly; R6 key
  *     derivation is the hardened hash of ISO 32000-2 Algorithm 2.B —
  *     iterated SHA-256/384/512 selected by an AES-CBC feedback).
  *     Every derivation is self-verified against the file's /U entry
  *     before use (Algorithms 6 / 11), so a wrong key reads as
  *     "encrypted, can't parse", never as garbage text. Real (non-
  *     empty) passwords return status Failed (the reference's Tika
  *     does the same without a password). AES primitives are the
  *     JDK's own javax.crypto (java.base).
  *   - page-tree walk (/Type/Page → /Contents, arrays included) with a
  *     BT-scan fallback when no page objects resolve
  *   - content tokenizer: Tj / TJ / ' / " shows, (…) strings with all
  *     escapes, <…> hex strings, inline images (BI…EI) skipped
  *   - PDFBox-flavored text assembly: vertical moves (Td, TD, T-star,
  *     Tm, quote operators) break lines; horizontal moves and TJ
  *     kerning gaps wider than a
  *     quarter of the font size insert a space, smaller ones join —
  *     the rule that reassembles "FIL"+"E" into FILE in the
  *     reference's own sample
  *   - bytes decode as windows-1252 (WinAnsiEncoding's superset);
  *     multi-byte CID text (Type0/Identity-H) is out of scope and
  *     skipped rather than mis-decoded
  */
object PdfParse {

  final case class Result(ok: Boolean, encrypted: Boolean, nPages: Int,
      text: String)

  // ---- tiny crypto primitives (PDF 1.7 §7.6.3; public spec) ----

  /** The standard 32-byte password pad (PDF 1.7 Table 22 preamble). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A)
    .map(_.toByte)

  // getInstance does a provider lookup per call — measurable when the
  // R6 hardened hash (hash2B) runs ~100 rounds × (1 cipher + 1 digest)
  // per encrypted doc. Instances are stateful; one per thread, reused
  // (digest()/doFinal() reset them).
  private val digests = new ThreadLocal[
      java.util.HashMap[String, java.security.MessageDigest]] {
    override def initialValue() =
      new java.util.HashMap[String, java.security.MessageDigest]
  }
  private def digest(alg: String): java.security.MessageDigest = {
    val m = digests.get()
    var d = m.get(alg)
    if (d == null) {
      d = java.security.MessageDigest.getInstance(alg)
      m.put(alg, d)
    }
    d.reset()
    d
  }
  private val ciphers = new ThreadLocal[
      java.util.HashMap[String, javax.crypto.Cipher]] {
    override def initialValue() =
      new java.util.HashMap[String, javax.crypto.Cipher]
  }
  private def cipher(transformation: String): javax.crypto.Cipher = {
    val m = ciphers.get()
    var c = m.get(transformation)
    if (c == null) {
      c = javax.crypto.Cipher.getInstance(transformation)
      m.put(transformation, c)
    }
    c
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = digest("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private[ops] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = digest(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** Raw AES-CBC (no padding — PDF pads explicitly per §7.6.2), via
    * the JDK's javax.crypto. `data.length` must be a block multiple. */
  private[ops] def aesCbc(encrypt: Boolean, key: Array[Byte],
      iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = cipher("AES/CBC/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private[ops] def aesEcb(encrypt: Boolean, key: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = cipher("AES/ECB/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  /** AES-CBC content layout (§7.6.2): 16-byte IV prefix, then the
    * PKCS#5-padded ciphertext. Returns None on a malformed layout —
    * the caller treats that stream as undecodable, never as text. */
  private[ops] def aesDecryptIvPrefixed(key: Array[Byte],
      data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 32 || data.length % 16 != 0) return None
    val pt = aesCbc(encrypt = false, key, data.take(16), data.drop(16))
    val pad = pt.last & 0xff
    if (pad < 1 || pad > 16 || pad > pt.length) None
    else Some(pt.dropRight(pad))
  }

  private[ops] def aesEncryptIvPrefixed(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val pad = 16 - data.length % 16
    val padded = data ++ Array.fill(pad)(pad.toByte)
    iv ++ aesCbc(encrypt = true, key, iv, padded)
  }

  /** File key from the Standard handler dict (Algorithm 2, empty user
    * password; R4 crypt-filter files use the same derivation, with
    * /EncryptMetadata false folding 0xFFFFFFFF into the hash),
    * self-verified against /U (Algorithms 4/5/6). Returns None when
    * the check fails (wrong revision or a real password). */
  private[ops] def fileKey(o: Array[Byte], u: Array[Byte], p: Int, r: Int,
      keyBytes: Int, id0: Array[Byte],
      encryptMetadata: Boolean = true): Option[Array[Byte]] = {
    if (r < 2 || r > 4) return None
    var h =
      if (r >= 4 && !encryptMetadata)
        md5(Pad, o, le32(p), id0, Array.fill(4)(0xff.toByte))
      else md5(Pad, o, le32(p), id0)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(keyBytes)); i += 1 }
    }
    val key = h.take(keyBytes)
    val ok =
      if (r == 2) java.util.Arrays.equals(rc4(key, Pad), u)
      else {
        var x = md5(Pad, id0)
        var i = 0
        while (i < 20) {
          val ki = key.map(b => (b ^ i).toByte)
          x = rc4(ki, x)
          i += 1
        }
        java.util.Arrays.equals(x, u.take(16))
      }
    if (ok) Some(key) else None
  }

  /** The /CFM method of the crypt filter /StmF routes STREAMS through
    * (ISO 32000-1 §7.6.5): /StmF names a filter in /CF (or Identity —
    * also the default when /StmF is absent), and only that filter's
    * method applies to stream data. The /CF sub-dict lookup assumes the
    * flat `<< /CFM ... /Length ... >>` shape every mainstream writer
    * emits (no nested dicts inside a crypt-filter entry). */
  private[ops] def streamCfm(dict: String): Option[String] =
    """/StmF\s*/(\w+)""".r.findFirstMatchIn(dict).map(_.group(1)) match {
      case Some("Identity") => Some("Identity")
      case Some(name) =>
        ("/" + java.util.regex.Pattern.quote(name) + """\s*<<([^>]*)>>""").r
          .findFirstMatchIn(dict)
          .flatMap(m => """/CFM\s*/(\w+)""".r.findFirstMatchIn(m.group(1))
            .map(_.group(1)))
          .map(m => if (m == "None") "Identity" else m)
      case None =>
        // /StmF's spec default is Identity — honored only when the
        // dict actually declares crypt filters; a V4/V5 dict with
        // NEITHER /StmF nor /CF names no method at all (malformed or
        // relabeled) and reads as locked, never as plaintext
        if (dict.contains("/CF")) Some("Identity") else None
    }

  /** Per-object key (Algorithm 1): MD5 of key + object/generation
    * bytes; AESV2 additionally folds in the spec's `sAlT` constant. */
  private[ops] def objectKey(fileKey: Array[Byte], num: Int,
      gen: Int, aes: Boolean = false): Array[Byte] = {
    val ext = fileKey ++ Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte,
      ((gen >> 8) & 0xff).toByte) ++
      (if (aes) Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)
       else Array.emptyByteArray)
    md5(ext).take(math.min(fileKey.length + 5, 16))
  }

  /** ISO 32000-2 Algorithm 2.B — the R6 hardened hash: ≥64 rounds of
    * (repeat the password+K+udata block 64×, AES-128-CBC it under the
    * running hash, pick SHA-256/384/512 by the ciphertext's first-16
    * byte sum mod 3), continuing past round 64 until the ciphertext's
    * last byte ≤ round − 32. Public spec; empty-password crawl use. */
  private[ops] def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    var e: Array[Byte] = Array.emptyByteArray
    var round = 0
    while (round < 64 || (e.last & 0xff) > round - 32) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1)
      (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => k = sha("SHA-256", e)
        case 1 => k = sha("SHA-384", e)
        case _ => k = sha("SHA-512", e)
      }
      round += 1
    }
    k.take(32)
  }

  /** V5 (AESV3) file key from /U + /UE with the empty user password
    * (ISO 32000-2 Algorithms 2.A / 11): validate SHA-256(pass‖vSalt)
    * (R5) or the 2.B hash (R6) against U[0..32), then unwrap /UE under
    * the key-salt hash (AES-256-CBC, zero IV, no padding). */
  private[ops] def fileKeyV5(u: Array[Byte], ue: Array[Byte],
      r: Int): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length < 32 || (r != 5 && r != 6)) return None
    val pw = Array.emptyByteArray
    val hash = u.take(32)
    val vSalt = u.slice(32, 40)
    val kSalt = u.slice(40, 48)
    val computed =
      if (r == 5) sha("SHA-256", pw, vSalt)
      else hash2B(pw, vSalt, Array.emptyByteArray)
    if (!java.util.Arrays.equals(computed, hash)) return None
    val ikey =
      if (r == 5) sha("SHA-256", pw, kSalt)
      else hash2B(pw, kSalt, Array.emptyByteArray)
    Some(aesCbc(encrypt = false, ikey, new Array[Byte](16), ue.take(32)))
  }

  // ---- low-level scanning helpers ----

  private def ascii(bytes: Array[Byte], from: Int, until: Int): String =
    new String(bytes, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private val ObjRe = """(\d+)\s+(\d+)\s+obj""".r
  private val LenRe = """/Length\s+(\d+)(\s+(\d+)\s+R)?""".r
  private val RefRe = """(\d+)\s+(\d+)\s+R""".r

  private final case class RawObj(num: Int, gen: Int, body: Array[Byte])

  /** One parsed object: its dictionary source (up to the stream
    * keyword) and the decoded stream bytes, if any. */
  private final case class Obj(num: Int, dict: String,
      stream: Option[Array[Byte]])

  private def inflate(src: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(src)
      val out = new java.io.ByteArrayOutputStream(src.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) return None
        if (out.size() > (64 << 20)) return None // decompression bomb
      }
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** PNG-predictor DecodeParms post-pass (predictor ≥ 10). */
  private def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    val stride = columns
    val rows = data.length / (stride + 1)
    val out = new Array[Byte](rows * stride)
    var y = 0
    while (y < rows) {
      val ft = data(y * (stride + 1)) & 0xff
      var x = 0
      while (x < stride) {
        val cur = data(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x > 0) out(y * stride + x - 1) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x > 0) out((y - 1) * stride + x - 1) & 0xff
          else 0
        val rec = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + graft.operators.PixelCodec.paeth(left, up, ul)
          case _ => cur
        }
        out(y * stride + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- the parser ----

  /** No-throw entry: a hostile PDF (e.g. `9999999999 0 obj` or
    * `/Length 99999999999` overflowing Int) must degrade to
    * `ok = false`, never crash the parse task. */
  def extract(bytes: Array[Byte]): Result =
    try extractUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) =>
      Result(ok = false, encrypted = false, 0, "")
    }

  private def extractUnsafe(bytes: Array[Byte]): Result = {
    if (bytes == null || bytes.length < 8 ||
      !ascii(bytes, 0, 5).startsWith("%PDF-"))
      return Result(ok = false, encrypted = false, 0, "")
    val whole = ascii(bytes, 0, bytes.length)
    // 1. raw object segmentation (linear, xref-free)
    val raws = scala.collection.mutable.LinkedHashMap.empty[Int, RawObj]
    for (m <- ObjRe.findAllMatchIn(whole)) {
      val end = whole.indexOf("endobj", m.end)
      if (end > 0)
        raws(m.group(1).toInt) = RawObj(m.group(1).toInt, m.group(2).toInt,
          java.util.Arrays.copyOfRange(bytes, m.end, end))
    }
    if (raws.isEmpty) return Result(ok = false, encrypted = false, 0, "")
    def rawDict(o: RawObj): String = {
      val s = ascii(o.body, 0, o.body.length)
      val i = s.indexOf("stream")
      if (i < 0) s else s.substring(0, i)
    }
    // 2. encryption setup (trailer /Encrypt + /ID)
    val trailerAt = whole.lastIndexOf("trailer")
    val trailer =
      if (trailerAt >= 0) whole.substring(trailerAt)
      else whole // xref-stream files keep /Encrypt in a dict we scanned
    val encRef = """/Encrypt\s+(\d+)\s+\d+\s+R""".r
      .findFirstMatchIn(trailer).orElse(
        """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(whole))
    var encrypted = false
    // per-object decryptor: (num, gen, raw) → plaintext, or None when a
    // stream's encrypted layout is malformed (that stream is skipped)
    var decrypt: Option[(Int, Int, Array[Byte]) => Option[Array[Byte]]] = None
    if (encRef.isDefined) {
      encrypted = true
      val dict = raws.get(encRef.get.group(1).toInt).map(rawDict)
        .getOrElse("")
      def hexEntry(name: String): Option[Array[Byte]] =
        (name + """\s*<([0-9A-Fa-f\s]+)>""").r.findFirstMatchIn(dict)
          .map(m => m.group(1).replaceAll("\\s", "").grouped(2)
            .map(Integer.parseInt(_, 16).toByte).toArray)
      // literal-string form of a crypto entry: byte-exact unescape (the
      // windows-1252 text decoder is lossy on undefined code points, so
      // key material never goes through it)
      def litBytes(from: Int): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        var i = from
        var depth = 1
        while (i < dict.length && depth > 0) {
          dict.charAt(i) match {
            case '\\' if i + 1 < dict.length =>
              dict.charAt(i + 1) match {
                case 'n' => out.write('\n'); i += 2
                case 'r' => out.write('\r'); i += 2
                case 't' => out.write('\t'); i += 2
                case 'b' => out.write('\b'); i += 2
                case 'f' => out.write('\f'); i += 2
                // backslash + EOL is a line CONTINUATION: both the
                // backslash and the CR / LF / CRLF are disregarded
                // (§7.3.4.2) — line-length-limited writers wrap /O //U
                // this way, and writing the EOL byte would corrupt the
                // 32-byte key material
                case '\r' =>
                  i += 2
                  if (i < dict.length && dict.charAt(i) == '\n') i += 1
                case '\n' => i += 2
                case d if d >= '0' && d <= '7' =>
                  var v = 0; var k = 0; i += 1
                  while (k < 3 && i < dict.length && dict.charAt(i) >= '0' &&
                    dict.charAt(i) <= '7') {
                    v = v * 8 + (dict.charAt(i) - '0'); i += 1; k += 1
                  }
                  out.write(v & 0xff)
                case c => out.write(c); i += 2
              }
            case '(' => depth += 1; out.write('('); i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) out.write(')')
              i += 1
            // an unescaped EOL inside a literal reads as ONE 0x0A byte
            // regardless of its on-disk CR / LF / CRLF form (§7.3.4.2)
            case '\r' =>
              out.write('\n'); i += 1
              if (i < dict.length && dict.charAt(i) == '\n') i += 1
            case c => out.write(c); i += 1
          }
        }
        out.toByteArray
      }
      def binEntry(name: String): Option[Array[Byte]] =
        hexEntry(name).orElse((name + """\s*\(""").r
          .findFirstMatchIn(dict).map(m => litBytes(m.end)))
      val id0 = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r
        .findFirstMatchIn(whole.substring(math.max(0, trailerAt)))
        .orElse("""/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(whole))
        .map(_.group(1).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      val v = """/V\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
      val r = """/R\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
      val p = """/P\s+(-?\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt)
      val len = """/Length\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(40)
      // /Length is bits in the encrypt dict but some writers put bytes
      // in the crypt-filter sub-dict; ≥40 reads as bits, <40 as bytes
      val keyBytes = if (len >= 40) len / 8 else len
      val standard = dict.contains("/Standard")
      val encMeta =
        """/EncryptMetadata\s+false""".r.findFirstIn(dict).isEmpty
      decrypt =
        if (!standard) None
        else v.getOrElse(0) match {
          case 1 | 2 =>
            for {
              o <- binEntry("/O"); u <- binEntry("/U")
              pv <- p; rv <- r; i0 <- id0
              k <- fileKey(o, u, pv, rv, keyBytes, i0)
            } yield (num: Int, gen: Int, data: Array[Byte]) =>
              Some(rc4(objectKey(k, num, gen), data))
          case 4 =>
            // crypt filters: streams are decrypted by the filter /StmF
            // NAMES (default Identity when absent, §7.6.5 — grabbing
            // the first /CFM anywhere in the dict would AES-"decrypt"
            // plaintext streams of a strings-only-encrypted file into
            // noise); the named filter's method comes from ITS /CF
            // sub-dict. Same Algorithm-2 file key as R3 under the hood.
            streamCfm(dict) match {
              case Some("Identity") =>
                // streams unencrypted (e.g. /StmF /Identity,
                // strings-only encryption): pass-through, no key needed
                Some((_: Int, _: Int, data: Array[Byte]) => Some(data))
              case Some(m @ ("AESV2" | "V2")) =>
                for {
                  o <- binEntry("/O"); u <- binEntry("/U")
                  pv <- p; rv <- r; i0 <- id0
                  k <- fileKey(o, u, pv, rv, keyBytes, i0, encMeta)
                } yield
                  if (m == "AESV2")
                    (num: Int, gen: Int, data: Array[Byte]) =>
                      aesDecryptIvPrefixed(objectKey(k, num, gen,
                        aes = true), data)
                  else
                    (num: Int, gen: Int, data: Array[Byte]) =>
                      Option(rc4(objectKey(k, num, gen), data))
              case _ => None // unknown method
            }
          case 5 =>
            streamCfm(dict) match {
              case Some("Identity") =>
                Some((_: Int, _: Int, data: Array[Byte]) => Some(data))
              case Some("AESV3") =>
                for {
                  u <- binEntry("/U"); ue <- binEntry("/UE"); rv <- r
                  k <- fileKeyV5(u, ue, rv)
                } yield (num: Int, gen: Int, data: Array[Byte]) =>
                  aesDecryptIvPrefixed(k, data)
              case _ => None // unknown method
            }
          case _ => None
        }
      if (decrypt.isEmpty) return Result(ok = false, encrypted = true, 0, "")
    }
    // 3. decode streams (decrypt → inflate → predictor)
    def streamOf(o: RawObj): Option[Array[Byte]] = {
      val s = ascii(o.body, 0, o.body.length)
      val kw = s.indexOf("stream")
      if (kw < 0) return None
      val dict = s.substring(0, kw)
      var dataAt = kw + "stream".length
      if (dataAt < s.length && s.charAt(dataAt) == '\r') dataAt += 1
      if (dataAt < s.length && s.charAt(dataAt) == '\n') dataAt += 1
      val declared = LenRe.findFirstMatchIn(dict).flatMap { m =>
        if (m.group(2) == null) Some(m.group(1).toInt)
        else raws.get(m.group(1).toInt).flatMap(lo =>
          """\d+""".r.findFirstIn(ascii(lo.body, 0, lo.body.length))
            .map(_.toInt))
      }
      val endKw = s.lastIndexOf("endstream")
      val rawEnd = declared match {
        case Some(n) if dataAt + n <= o.body.length => dataAt + n
        case _ => if (endKw > dataAt) endKw else o.body.length
      }
      var data = java.util.Arrays.copyOfRange(o.body, dataAt, rawEnd)
      decrypt match {
        case Some(d) => data = d(o.num, o.gen, data).getOrElse(return None)
        case None => ()
      }
      if (dict.contains("/FlateDecode") || dict.contains("/Fl "))
        data = inflate(data).getOrElse(return None)
      val pred = """/Predictor\s+(\d+)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).getOrElse(1)
      if (pred >= 10) {
        val cols = """/Columns\s+(\d+)""".r.findFirstMatchIn(dict)
          .map(_.group(1).toInt).getOrElse(1)
        data = pngUnpredict(data, cols)
      }
      Some(data)
    }
    val objs = scala.collection.mutable.LinkedHashMap.empty[Int, Obj]
    raws.values.foreach { o =>
      objs(o.num) = Obj(o.num, rawDict(o), streamOf(o))
    }
    // 3b. object streams: objects packed inside a compressed stream
    raws.values.filter(o => rawDict(o).contains("/ObjStm")).foreach { o =>
      for {
        data <- objs(o.num).stream
        n <- """/N\s+(\d+)""".r.findFirstMatchIn(objs(o.num).dict)
          .map(_.group(1).toInt)
        first <- """/First\s+(\d+)""".r.findFirstMatchIn(objs(o.num).dict)
          .map(_.group(1).toInt)
      } {
        val s = ascii(data, 0, data.length)
        val header = s.take(first).trim.split("\\s+").filter(_.nonEmpty)
        var i = 0
        while (i + 1 < header.length && i / 2 < n) {
          val num = header(i).toInt
          val off = header(i + 1).toInt
          val end =
            if (i + 3 < header.length && (i + 2) / 2 < n)
              first + header(i + 3).toInt
            else data.length
          if (first + off <= data.length && end <= data.length)
            objs(num) = Obj(num, s.substring(first + off, end), None)
          i += 2
        }
      }
    }
    // 4. page walk → content streams (fallback: any stream with BT)
    val pages = objs.values.filter(o =>
      o.dict.contains("/Page") && !o.dict.contains("/Pages")).toSeq
    val contentNums = pages.flatMap { p =>
      """/Contents\s+((\d+)\s+\d+\s+R|\[(.*?)\])""".r
        .findFirstMatchIn(p.dict).toSeq.flatMap { m =>
          if (m.group(2) != null) Seq(m.group(2).toInt)
          else RefRe.findAllMatchIn(m.group(3)).map(_.group(1).toInt).toSeq
        }
    }
    val contents: Seq[Array[Byte]] =
      if (contentNums.nonEmpty)
        contentNums.flatMap(n => objs.get(n).flatMap(_.stream))
      else objs.values.flatMap(_.stream)
        .filter(d => ascii(d, 0, math.min(d.length, 1 << 20)).contains("BT"))
        .toSeq
    if (contents.isEmpty)
      return Result(ok = pages.nonEmpty, encrypted, pages.size, "")
    val text = contents.map(c => extractText(ascii(c, 0, c.length)))
      .mkString("\n").trim
    Result(ok = true, encrypted, math.max(pages.size, 1), text)
  }

  // ---- content-stream text assembly ----

  /** Decode a PDF literal string body (escapes, octal, continuations)
    * to windows-1252 text. */
  private[ops] def literal(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2
            if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < s.length && s.charAt(i) >= '0' &&
              s.charAt(i) <= '7') { v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1 }
            out.write(v & 0xff)
          case other => out.write(other); i += 2
        }
      } else { out.write(c); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.Charset.forName("windows-1252"))
  }

  private def hexString(s: String): String = {
    val hex = s.filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    new String(padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      java.nio.charset.Charset.forName("windows-1252"))
  }

  /** Walk one content stream, applying the spacing heuristics. */
  private[ops] def extractText(src: String): String = {
    val out = new StringBuilder
    var i = 0
    var fontSize = 12.0
    val nums = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastStr: String = null // pending string operand (for Tj/'/")
    val tjParts = scala.collection.mutable.ArrayBuffer.empty[Either[String, Double]]
    var inArray = false
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def space(): Unit =
      if (out.nonEmpty && out.last != ' ' && out.last != '\n')
        out.append(' ')
    def readString(): String = { // cursor at '('
      var depth = 0
      val start = i + 1
      var j = i
      var done = -1
      while (done < 0 && j < src.length) {
        src.charAt(j) match {
          case '\\' => j += 1
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) done = j
          case _ => ()
        }
        j += 1
      }
      i = if (done < 0) src.length else done + 1
      literal(src.substring(start, math.max(start, if (done < 0) src.length else done)))
    }
    while (i < src.length) {
      val c = src.charAt(i)
      if (c == '(') {
        val s = readString()
        if (inArray) tjParts += Left(s) else lastStr = s
      } else if (c == '<' && i + 1 < src.length && src.charAt(i + 1) != '<') {
        val end = src.indexOf('>', i)
        val s = hexString(src.substring(i + 1, if (end < 0) src.length else end))
        if (inArray) tjParts += Left(s) else lastStr = s
        i = if (end < 0) src.length else end + 1
      } else if (c == '[') { inArray = true; tjParts.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < src.length && ("0123456789.-".indexOf(src.charAt(i)) >= 0))
          i += 1
        val v = try src.substring(start, i).toDouble catch {
          case _: NumberFormatException => 0.0
        }
        if (inArray) tjParts += Right(v) else nums += v
      } else if (Character.isLetter(c) || c == '\'' || c == '"' || c == '*') {
        val start = i
        i += 1
        while (i < src.length && (Character.isLetterOrDigit(src.charAt(i)) ||
          src.charAt(i) == '*')) i += 1
        val op = src.substring(start, i)
        op match {
          case "BI" => // inline image: skip to EI
            val ei = src.indexOf("EI", i)
            i = if (ei < 0) src.length else ei + 2
          case "Tf" => if (nums.nonEmpty) fontSize = nums.last
          case "Td" | "TD" =>
            if (nums.length >= 2) {
              val dx = nums(nums.length - 2)
              val dy = nums.last
              if (dy != 0) newline()
              else if (math.abs(dx) > fontSize * 0.25) space()
            }
          case "Tm" =>
            // full matrix set: treat as a line break unless it's the
            // first positioning of the stream
            if (nums.length >= 6 && out.nonEmpty) newline()
          case "T*" => newline()
          case "Tj" => if (lastStr != null) { out.append(lastStr); lastStr = null }
          case "'" | "\"" =>
            newline()
            if (lastStr != null) { out.append(lastStr); lastStr = null }
          case "TJ" =>
            tjParts.foreach {
              case Left(s) => out.append(s)
              case Right(adj) => if (adj <= -180) space()
            }
            tjParts.clear()
          case "BT" | "ET" => ()
          case _ => ()
        }
        nums.clear()
      } else i += 1
    }
    out.toString.trim
  }

  // ==== synth: a real PDF writer (oracle + test side) ====

  /** Build a complete, standards-correct PDF: header, catalog, page
    * tree, Helvetica, one Flate-compressed content stream per page
    * (one text line per entry), and a valid xref table. When `encrypt`
    * is set, every stream encrypts under the Standard handler with an
    * empty user password and correctly computed /O and /U (and for V5
    * /OE /UE /Perms) entries so ANY conformant reader opens it.
    * `cipher` selects the family: "rc4" = V1 R3 40-bit (the exact
    * family of the reference's encrypted sample), "rc4-128" = V2 R3,
    * "aes128" = V4 R4 crypt-filter AESV2, "aes256" = V5 R6 AESV3
    * (hardened 2.B hash), "aes256r5" = V5 R5 (the deprecated
    * ExtensionLevel-3 revision). IVs and V5 salts/file key derive
    * deterministically from id0 so builds are byte-reproducible (any
    * IV is conformant; unpredictability is not part of the oracle's
    * threat model). */
  def build(pages: Seq[Seq[String]], encrypt: Boolean = false,
      id0Hex: String = "0123456789abcdef0123456789abcdef",
      cipher: String = "rc4"): Array[Byte] = {
    val id0 = id0Hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val p = -4
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    // Standard handler entries for the MD5/RC4 revisions (Algorithms 3,
    // 2 and 5), empty passwords, parameterized on key size
    def rc4Entries(keyBytes: Int)
        : (Array[Byte], Array[Byte], Array[Byte]) = {
      var oh = md5(Pad)
      var i = 0
      while (i < 50) { oh = md5(oh.take(keyBytes)); i += 1 }
      val oKey = oh.take(keyBytes)
      var o = rc4(oKey, Pad)
      i = 1
      while (i < 20) {
        o = rc4(oKey.map(b => (b ^ i).toByte), o)
        i += 1
      }
      var kh = md5(Pad, o, le32(p), id0)
      i = 0
      while (i < 50) { kh = md5(kh.take(keyBytes)); i += 1 }
      val key = kh.take(keyBytes)
      var u = md5(Pad, id0)
      i = 0
      while (i < 20) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      (key, o, u ++ new Array[Byte](16))
    }
    def objIv(num: Int): Array[Byte] = md5(le32(num), id0).take(16)
    // (per-object encryptor, encrypt-dict body) for the chosen family
    val enc: Option[((Int, Array[Byte]) => Array[Byte], String)] =
      if (!encrypt) None
      else cipher match {
        case "rc4" =>
          val (key, o, u) = rc4Entries(5)
          Some(((num, data) => rc4(objectKey(key, num, 0), data),
            s"/Filter /Standard /V 1 /R 3 /Length 40 /P $p " +
              s"/O <${hex(o)}> /U <${hex(u)}>"))
        case "rc4-128" =>
          val (key, o, u) = rc4Entries(16)
          Some(((num, data) => rc4(objectKey(key, num, 0), data),
            s"/Filter /Standard /V 2 /R 3 /Length 128 /P $p " +
              s"/O <${hex(o)}> /U <${hex(u)}>"))
        case "aes128" =>
          val (key, o, u) = rc4Entries(16)
          Some(((num, data) => aesEncryptIvPrefixed(
            objectKey(key, num, 0, aes = true), objIv(num), data),
            s"/Filter /Standard /V 4 /R 4 /Length 128 /P $p " +
              "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF " +
              s"/O <${hex(o)}> /U <${hex(u)}>"))
        case "aes256" | "aes256r5" =>
          val r6 = cipher == "aes256"
          val pw = Array.emptyByteArray
          val none = Array.emptyByteArray
          def h(salt: Array[Byte], udata: Array[Byte]) =
            if (r6) hash2B(pw, salt, udata)
            else if (udata.isEmpty) sha("SHA-256", pw, salt)
            else sha("SHA-256", pw, salt, udata)
          val fileKey = sha("SHA-256", "graft-filekey".getBytes(ascii), id0)
          val vSalt = sha("SHA-256", "vs".getBytes(ascii), id0).take(8)
          val kSalt = sha("SHA-256", "ks".getBytes(ascii), id0).take(8)
          val u48 = h(vSalt, none) ++ vSalt ++ kSalt
          val ue = aesCbc(encrypt = true, h(kSalt, none),
            new Array[Byte](16), fileKey)
          val oVSalt = sha("SHA-256", "ovs".getBytes(ascii), id0).take(8)
          val oKSalt = sha("SHA-256", "oks".getBytes(ascii), id0).take(8)
          val o48 = h(oVSalt, u48) ++ oVSalt ++ oKSalt
          val oe = aesCbc(encrypt = true, h(oKSalt, u48),
            new Array[Byte](16), fileKey)
          val perms = aesEcb(encrypt = true, fileKey,
            le32(p) ++ Array.fill(4)(0xff.toByte) ++
              "TadbGRFT".getBytes(ascii))
          Some(((num, data) =>
            aesEncryptIvPrefixed(fileKey, objIv(num), data),
            s"/Filter /Standard /V 5 /R ${if (r6) 6 else 5} /Length 256 " +
              s"/P $p /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
              "/StmF /StdCF /StrF /StdCF " +
              s"/O <${hex(o48)}> /U <${hex(u48)}> " +
              s"/OE <${hex(oe)}> /UE <${hex(ue)}> /Perms <${hex(perms)}>"))
        case other =>
          throw new IllegalArgumentException(s"unknown cipher: $other")
      }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      body
    }
    w("%PDF-1.4\n%âãÏÓ\n")
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font, 4..3+n page objects,
    // 4+n..3+2n content streams, last = encrypt dict (if any)
    obj { w(s"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n") }
    obj {
      val kids = (0 until nPages).map(i => s"${4 + i} 0 R").mkString(" ")
      w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $nPages " +
        "/MediaBox [0 0 612 792] >>\nendobj\n")
    }
    obj { w("3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n") }
    for (i <- 0 until nPages) obj {
      w(s"${4 + i} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents ${4 + nPages + i} 0 R >>\nendobj\n")
    }
    for (i <- 0 until nPages) obj {
      val num = 4 + nPages + i
      val body = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
      pages(i).zipWithIndex.foreach { case (line, k) =>
        val esc = line.replace("\\", "\\\\").replace("(", "\\(")
          .replace(")", "\\)")
        if (k > 0) body.append("0 -14 Td\n")
        body.append(s"($esc) Tj\n")
      }
      body.append("ET\n")
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(body.toString
        .getBytes(java.nio.charset.Charset.forName("windows-1252")))
      deflater.finish()
      val zout = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      var data = zout.toByteArray
      enc.foreach { case (f, _) => data = f(num, data) }
      w(s"$num 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\n" +
        "stream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val encNum = 4 + 2 * nPages
    enc.foreach { case (_, dictBody) =>
      obj { w(s"$encNum 0 obj\n<< $dictBody >>\nendobj\n") }
    }
    val xrefAt = out.size()
    val total = offsets.length + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R /ID [<$id0Hex> <$id0Hex>]" +
      (if (encrypt) s" /Encrypt $encNum 0 R" else "") +
      s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
