package graft

/** Shared media test fixtures: JPEG frame rendering and a structurally
  * complete MJPEG-in-AVI muxer (RIFF: hdrl(avih, strl(strh vids/MJPG, strf
  * BITMAPINFOHEADER)) + movi(00dc per JPEG frame)) — the containers the
  * REAL demux path ([[graft.multimodal.Multimodal.demuxAvi]]) walks.
  * Used by ModulesSpec (decode invariants) and StreamingSpec (incremental
  * media near-dup ingest). */
object MediaFixtures {
  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    cc(id) ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(tpe: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(tpe) ++ children)

  def muxAvi(frames: Seq[Array[Byte]], usPerFrame: Int, w: Int,
      h: Int): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(1000000 / usPerFrame) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      cc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = riffList("hdrl",
      chunk("avih", avih) ++ riffList("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = riffList("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length) ++ body
  }

  def jpegFrameF(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", bos))
    bos.toByteArray
  }

  def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] =
    jpegFrameF(w, h, (_, _) => rgb)

  /** A deterministic, pHash-stable structured frame (cosine mixes keyed by
    * `seed`): distinct seeds give pairwise-distant signatures. */
  def structuredFrame(seed: Int, w: Int = 64, h: Int = 48): Array[Byte] =
    jpegFrameF(w, h, (x, y) => {
      val l = 128 + 60 * math.cos(2 * math.Pi * (x * (1 + seed % 3) +
        y * (1 + seed / 3)) / 48.0) + 40 * math.sin(2 * math.Pi * y * (1 + seed % 4) / 32.0)
      val c = math.max(0, math.min(255, l.toInt)); (c << 16) | (c << 8) | c
    })
}
