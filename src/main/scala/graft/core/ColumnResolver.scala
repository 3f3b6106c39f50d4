package graft.core

/**
 * Column-name algebra: regex-capable column selection and `:`-namespace
 * prefix/suffix handling.
 *
 * Semantics follow the reference resolver (`__get_matching_cols__`,
 * reference: python-packages/core/src/omigo_core/dataframe.py:5101-5170):
 * a `cols` argument is one or more patterns; a pattern containing regex
 * metacharacters is matched (fully anchored) against the header, in header
 * order; a plain name must exist exactly. This is pure driver-side name
 * algebra — it never touches data, so it costs nothing at scale.
 */
object ColumnResolver {

  val ColPrefixSep = ":"

  private val regexMeta = "\\.\\*|\\[|\\]|\\(|\\)|\\{|\\}|\\^|\\$|\\+|\\?|\\|".r

  def isPattern(s: String): Boolean = regexMeta.findFirstIn(s).isDefined

  /** Expand patterns against the header. Preserves header order for regex
    * matches and pattern order for exact names; dedupes. */
  def resolve(patterns: Seq[String], header: Seq[String],
              ignoreIfMissing: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet[String]()
    patterns.foreach { p =>
      if (header.contains(p)) out += p
      else if (isPattern(p)) {
        val re = ("^" + p + "$").r
        val matched = header.filter(h => re.pattern.matcher(h).matches())
        if (matched.isEmpty && !ignoreIfMissing)
          throw new IllegalArgumentException(
            s"column pattern '$p' matched nothing in header ${header.mkString(",")}")
        out ++= matched
      } else if (!ignoreIfMissing) {
        throw new IllegalArgumentException(
          s"column '$p' not found in header ${header.mkString(",")}")
      }
    }
    out.toSeq
  }

  def resolve(pattern: String, header: Seq[String]): Seq[String] =
    resolve(Seq(pattern), header)

  /** Inverse selection (reference `not_select`, DF:164-182). */
  def resolveNot(patterns: Seq[String], header: Seq[String]): Seq[String] = {
    val selected = resolve(patterns, header, ignoreIfMissing = true).toSet
    header.filterNot(selected)
  }

  def withPrefix(col: String, prefix: String): String = s"$prefix$ColPrefixSep$col"
  def withSuffix(col: String, suffix: String): String = s"$col$ColPrefixSep$suffix"

  def hasPrefix(col: String, prefix: String): Boolean =
    col.startsWith(prefix + ColPrefixSep)
  def hasSuffix(col: String, suffix: String): Boolean =
    col.endsWith(ColPrefixSep + suffix)

  def stripPrefix(col: String, prefix: String): String =
    if (hasPrefix(col, prefix)) col.substring(prefix.length + 1) else col
  def stripSuffix(col: String, suffix: String): String =
    if (hasSuffix(col, suffix)) col.substring(0, col.length - suffix.length - 1) else col
}
