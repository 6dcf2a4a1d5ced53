package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Portable JSON artifact format for the four trained tokenizers
  * (SURVEY §2 tokenizer family, r19) — the train→SHIP step: the parquet
  * artifacts the `*-train` verbs write are perfect for Spark consumers,
  * but a serving stack or a non-JVM trainer wants ONE self-describing
  * text file (the tokenizers.json convention). Format, versioned:
  *
  * {{{
  * {"format": "graft-tokenizer", "version": 1,
  *  "kind": "bpe" | "byte_bpe" | "unigram" | "wordpiece",
  *  "meta": {"rounds": "40", ...},            // provenance, free-form strings
  *  "merges": [["a","b"], ...],               // bpe kinds: rank-ascending pairs
  *  "pieces": [["low", -152012], ...],        // unigram: [piece, fixed-point
  *                                            //   integer log-prob — exact]
  *  "vocab":  ["a", "##b", ...]}              // wordpiece: greedy-match pieces
  * }}}
  *
  * Unigram scores stay the trainer's FIXED-POINT integers (the repo's
  * engine-exactness rule: a float score would round differently across
  * consumers; the integer is the artifact). Export is attached to the
  * train verbs as `--export PATH`; every `tokenize` verb accepts a
  * `.json` artifact wherever it accepts the parquet one, validating the
  * kind against the requested mode. Round-trip identity (train → export
  * → import ≡ in-memory artifact) is CliSpec-pinned.
  *
  * Jackson (on Spark's classpath) does the escaping both ways — the
  * one place hand-rolled JSON would risk a corner (a piece containing
  * a quote or a control char) round-tripping wrong. */
object TokenizerJson {

  val Format = "graft-tokenizer"
  val Version = 1

  sealed trait Artifact {
    def kind: String
    def meta: Map[String, String]
  }
  /** kind "bpe" (word-level, c52) or "byte_bpe" (byte-staged, c70). */
  final case class BpeArtifact(merges: Seq[(String, String)],
                               byteLevel: Boolean,
                               meta: Map[String, String] = Map.empty)
      extends Artifact {
    def kind: String = if (byteLevel) "byte_bpe" else "bpe"
  }
  /** kind "unigram" (c75): (piece, fixed-point integer score). */
  final case class UnigramArtifact(pieces: Seq[(String, Long)],
                                   meta: Map[String, String] = Map.empty)
      extends Artifact { def kind: String = "unigram" }
  /** kind "wordpiece" (c98): plain + "##"-continuation pieces. */
  final case class WordpieceArtifact(vocab: Seq[String],
                                     meta: Map[String, String] = Map.empty)
      extends Artifact { def kind: String = "wordpiece" }

  private def mapper = new ObjectMapper()

  def write(path: String, art: Artifact): Unit = {
    val m = mapper
    val root = m.createObjectNode()
    root.put("format", Format)
    root.put("version", Version)
    root.put("kind", art.kind)
    val meta = root.putObject("meta")
    art.meta.toSeq.sortBy(_._1).foreach { case (k, v) => meta.put(k, v) }
    art match {
      case BpeArtifact(merges, _, _) =>
        val arr = root.putArray("merges")
        merges.foreach { case (a, b) =>
          val pair = arr.addArray(); pair.add(a); pair.add(b); ()
        }
      case UnigramArtifact(pieces, _) =>
        val arr = root.putArray("pieces")
        pieces.foreach { case (p, s) =>
          val pair = arr.addArray(); pair.add(p); pair.add(s); ()
        }
      case WordpieceArtifact(vocab, _) =>
        val arr = root.putArray("vocab")
        vocab.foreach(arr.add)
    }
    // atomic publish (r20): a serving stack may watch PATH — write the
    // bytes to a sibling temp file and move into place so no reader can
    // observe a half-written artifact (the strict reader would refuse
    // it, but refusing a torn file mid-deploy is still an outage)
    val target = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      (m.writerWithDefaultPrettyPrinter().writeValueAsString(root) + "\n")
        .getBytes("UTF-8"))
    try
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    ()
  }

  /** Strict reader: unknown format/version/kind and shape mismatches
    * fail loudly — a serving stack must never half-load a tokenizer. */
  def read(path: String): Artifact = {
    val root = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"))
    def fail(msg: String): Nothing =
      sys.error(s"tokenizer artifact $path: $msg")
    if (root.path("format").asText("") != Format)
      fail(s"not a $Format file (format=${root.path("format").asText("")})")
    if (root.path("version").asInt(-1) != Version)
      fail(s"unsupported version ${root.path("version").asText("")}")
    val meta: Map[String, String] = root.path("meta") match {
      case o: ObjectNode =>
        val it = o.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
        b.result()
      case _ => Map.empty
    }
    def pairs(field: String): Seq[ArrayNode] = root.path(field) match {
      case a: ArrayNode =>
        (0 until a.size()).map(a.get(_) match {
          case p: ArrayNode if p.size() == 2 => p
          case other => fail(s"$field entries must be 2-element arrays, got $other")
        })
      case other => fail(s"missing/invalid $field array (got $other)")
    }
    root.path("kind").asText("") match {
      case k @ ("bpe" | "byte_bpe") =>
        BpeArtifact(
          pairs("merges").map(p => (p.get(0).asText(), p.get(1).asText())),
          byteLevel = k == "byte_bpe", meta)
      case "unigram" =>
        UnigramArtifact(pairs("pieces").map { p =>
          if (!p.get(1).canConvertToLong)
            fail(s"unigram score must be an integer, got ${p.get(1)}")
          (p.get(0).asText(), p.get(1).asLong())
        }, meta)
      case "wordpiece" =>
        root.path("vocab") match {
          case a: ArrayNode =>
            WordpieceArtifact((0 until a.size()).map(a.get(_).asText()), meta)
          case other => fail(s"missing/invalid vocab array (got $other)")
        }
      case k => fail(s"unknown kind '$k'")
    }
  }
}
