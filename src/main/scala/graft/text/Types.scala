package graft.text

/** Markup record types mirroring the reference's data model
  * (reference: slovnet/token.py:7-8, sent.py:9-10, span.py:5-10,
  * markup.py:35-193). Plain case classes so Spark derives Encoders.
  */
final case class Token(start: Int, stop: Int, text: String)

final case class Sent(start: Int, stop: Int, text: String)

final case class Span(start: Int, stop: Int, tpe: String)

final case class MorphTok(text: String, pos: String, feats: Map[String, String])

/** 1-based id; headId 0 = root (markup.py:162-163, exec/infer.py:82-87). */
final case class SynTok(id: Int, text: String, headId: Int, rel: String)
