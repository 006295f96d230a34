package graft.pack

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import graft.kernel.NavecEmbedding

/** Loader/dumper for the navec package's OWN artifact format (public repo
  * natasha/navec, MIT). The reference never parses this format itself — it
  * injects a `Navec` object loaded by the navec package (api.py:29-31 →
  * exec/model.py:544-557, reading `navec.meta.id`, `navec.pq.indexes`,
  * `navec.pq.codes`) — so a user holding the released
  * `navec_news_v1_1B_250K_300d_100q.tar` plus a stripped slovnet pack needs
  * this codec to assemble a working model in this engine.
  *
  * Layout (navec/navec.py load/dump; navec/vocab.py, navec/pq.py):
  * a tar with three members —
  *   - `meta.json`:  {"id": "<navec id>"}
  *   - `vocab.bin`:  uint32 LE byte-length of the words blob, then
  *                   "\n".join(words) utf-8, then uint32 LE counts[vocab]
  *   - `pq.bin`:     4 x uint32 LE header [vectors, dim, qdim, centroids],
  *                   then indexes[vectors, qdim] — u8 when centroids <= 256
  *                   else u16 LE (the navec dtype rule) — then
  *                   codes[qdim, centroids, dim/qdim] float32 LE
  */
object NavecTar {

  final case class NavecArtifact(id: String, words: Array[String],
                                 counts: Array[Long], emb: NavecEmbedding) {
    require(words.length == emb.vocabN,
      s"navec vocab size ${words.length} != pq vectors ${emb.vocabN}")
    require(counts.length == words.length,
      s"navec counts length ${counts.length} != words ${words.length}")
  }

  private def u32(bb: ByteBuffer): Long = bb.getInt() & 0xffffffffL

  def load(file: File): NavecArtifact = {
    val members = Tar.read(file).toMap
    def member(name: String): Array[Byte] =
      members.getOrElse(name, throw new IllegalArgumentException(
        s"navec member missing: $name (have ${members.keys.toSeq.sorted.mkString(", ")})"))

    val meta = new String(member("meta.json"), StandardCharsets.UTF_8)
    val id = """"id"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalArgumentException("navec meta.json has no id"))
      .group(1)

    // vocab.bin
    val vb = ByteBuffer.wrap(member("vocab.bin")).order(ByteOrder.LITTLE_ENDIAN)
    val wordsSize = u32(vb).toInt
    val wordsBytes = new Array[Byte](wordsSize)
    vb.get(wordsBytes)
    val words = new String(wordsBytes, StandardCharsets.UTF_8).split("\n", -1)
    val counts = new Array[Long](words.length)
    require(vb.remaining() == 4 * words.length,
      s"navec vocab.bin: ${vb.remaining()} count bytes for ${words.length} words")
    var i = 0
    while (i < counts.length) { counts(i) = u32(vb); i += 1 }

    // pq.bin
    val pb = ByteBuffer.wrap(member("pq.bin")).order(ByteOrder.LITTLE_ENDIAN)
    val vectors = u32(pb).toInt
    val dim = u32(pb).toInt
    val qdim = u32(pb).toInt
    val centroids = u32(pb).toInt
    require(dim % qdim == 0, s"navec pq: dim=$dim not divisible by qdim=$qdim")
    val chunk = dim / qdim
    require(vectors == words.length,
      s"navec pq vectors=$vectors != vocab size ${words.length}")
    val emb =
      if (centroids <= 256) {
        val idx = new Array[Byte](vectors * qdim)
        pb.get(idx)
        val codes = new Array[Float](qdim * centroids * chunk)
        require(pb.remaining() == codes.length * 4,
          s"navec pq.bin: ${pb.remaining()} code bytes, want ${codes.length * 4}")
        pb.asFloatBuffer().get(codes)
        NavecEmbedding(idx, qdim, codes, centroids, chunk)
      } else {
        val idx = new Array[Short](vectors * qdim)
        pb.asShortBuffer().get(idx)
        pb.position(pb.position() + idx.length * 2)
        val codes = new Array[Float](qdim * centroids * chunk)
        require(pb.remaining() == codes.length * 4,
          s"navec pq.bin: ${pb.remaining()} code bytes, want ${codes.length * 4}")
        pb.asFloatBuffer().get(codes)
        NavecEmbedding(null, qdim, codes, centroids, chunk, idx)
      }
    NavecArtifact(id, words, counts, emb.validateIds())
  }

  def dump(a: NavecArtifact, file: File): Unit = {
    val metaBytes =
      s"""{"id": "${a.id}"}""".getBytes(StandardCharsets.UTF_8)

    val wordsBytes = a.words.mkString("\n").getBytes(StandardCharsets.UTF_8)
    val vb = ByteBuffer.allocate(4 + wordsBytes.length + 4 * a.counts.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    vb.putInt(wordsBytes.length)
    vb.put(wordsBytes)
    a.counts.foreach(c => vb.putInt(c.toInt))

    val e = a.emb
    val idxBytes =
      if (e.indexes16 != null) e.indexes16.length * 2 else e.indexes.length
    val pb = ByteBuffer.allocate(16 + idxBytes + e.codes.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    pb.putInt(e.vocabN); pb.putInt(e.dim); pb.putInt(e.qdim); pb.putInt(e.centroids)
    if (e.indexes16 != null) e.indexes16.foreach(pb.putShort)
    else pb.put(e.indexes)
    e.codes.foreach(pb.putFloat)

    Tar.write(file, Seq(
      "meta.json" -> metaBytes,
      "vocab.bin" -> vb.array(),
      "pq.bin" -> pb.array()))
  }
}
