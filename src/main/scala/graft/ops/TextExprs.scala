package graft.ops

/** Shared token-shingle SQL expressions.
  *
  * The historical form `transform(sequence(1, size(t) - 1), i -> …)`
  * is a latent crash under Spark 4's default ANSI mode: for a
  * single-token document `sequence(1, 0)` is the DESCENDING [1, 0]
  * and the body then indexes element 0 (or -1), throwing
  * INVALID_ARRAY_INDEX — while DuckDB's `range(1, len(t))` is simply
  * empty. The zip-of-slices form below is empty for size(t) < 2 on
  * both engines (greatest(…, 0) clamps the slice length), produces
  * identical bigrams otherwise, and never indexes out of range.
  */
object TextExprs {

  /** Adjacent-bigram strings ("tok_i tok_i+1") over token-array column
    * `col`; empty array when the document has fewer than 2 tokens.
    */
  def bigrams(col: String): String =
    s"zip_with(slice($col, 1, greatest(size($col) - 1, 0)), " +
      s"slice($col, 2, greatest(size($col) - 1, 0)), " +
      "(a, b) -> concat(a, ' ', b))"

  /** Adjacent-pair structs (w1, w2) over token-array column `col`. */
  def bigramStructs(col: String): String =
    s"zip_with(slice($col, 1, greatest(size($col) - 1, 0)), " +
      s"slice($col, 2, greatest(size($col) - 1, 0)), " +
      "(a, b) -> named_struct('w1', a, 'w2', b))"
}
