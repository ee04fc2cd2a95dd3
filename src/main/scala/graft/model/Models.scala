package graft.model

/** Core row types (SURVEY §1, FIXTURES A.3).
  *
  * `ChunkMeta` is a *fixed* struct rather than the reference's dynamic
  * `Dict[str, Any]` (reference: src/utils.py:19-27) — the key set is
  * closed (7 keys across all five chunkers), and a struct lets Catalyst
  * prune columns where a MAP cannot. `level` is stringified because the
  * reference stores both ints (structure levels 0–3) and strings
  * ("paragraph"/"sentence") under the same key.
  */
case class Document(source_file: String, content: String)

case class ChunkMeta(
    chunk_size: Option[Int] = None,
    sentence_count: Option[Int] = None,
    level: Option[String] = None,
    heading: Option[String] = None,
    is_table: Option[Boolean] = None,
    chunk_type: Option[String] = None,
    merged: Option[Boolean] = None)

case class Chunk(
    chunk_id: String,
    content: String,
    source_file: String,
    chunk_index: Int,
    strategy: String,
    metadata: ChunkMeta)

/** A retrieval hit (FIXTURES A.4). */
case class RetrievalHit(
    query_id: String,
    rank: Int,
    chunk_id: String,
    sim: Double,
    source_file: String,
    content: String)
