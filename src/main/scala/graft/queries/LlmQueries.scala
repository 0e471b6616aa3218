package graft.queries

/**
 * LLM-training-data pipeline operators over `documents`/`embeddings`
 * (SURVEY.md §2.6): dedup families (exact / MinHash-LSH / SimHash / n-gram
 * Jaccard / embedding-cosine), similarity search, text analysis,
 * multimodal-column plumbing. Populated in the graft.llm build phase.
 */
object LlmQueries {
  val all: Vector[Q] = Vector()
}
