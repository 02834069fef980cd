package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding token counting (Sennrich et al. 2016, the
  * GPT-2-family tokenizer shape): every token-budget operator that
  * counts whitespace words under-estimates what a trained BPE
  * tokenizer will actually bill, so the budget operators (d26 source
  * mix, d29 packing, d39 temperature mix) can optionally count in BPE
  * tokens via `bpe_count(text)`.
  *
  * Algorithm: pre-tokenize into `[a-z0-9]+` words of the lowercased
  * text (the engine-wide tokenization); per word, start from single
  * characters and apply the merge table IN RANK ORDER, each merge
  * replacing its pair leftmost-first non-overlapping; the count is
  * the number of surviving symbols.
  *
  * EQUIVALENCE TO GREEDY PRIORITY BPE: real BPE repeatedly merges the
  * lowest-rank pair present anywhere in the word. For a VALID merge
  * table — every merge's two components are base characters or
  * outputs of strictly-earlier merges, which is exactly what BPE
  * training produces — applying each merge once, in rank order, to
  * completion is equivalent: a merge with rank j can only create
  * pairs containing its output symbol, and any merge consuming that
  * symbol must have rank > j, so no earlier-rank opportunity is ever
  * created after its pass. The object initializer ASSERTS table
  * validity, so the equivalence is load-bearing, not hoped-for. The
  * sequential form is what makes the operation oracle-able: DuckDB
  * replays it as a replace() chain over a `<sym>` delimited encoding
  * ([[oracleTokenExpr]]), bit-identical by construction.
  *
  * The table itself is a compact hand-built English-digraph table (a
  * production system would broadcast its learned table through the
  * same expression); table contents change counts, not machinery. */
object Bpe {

  /** Rank-ordered merges (earliest = applied first). VALID by
    * construction: each side is a base char or an earlier output. */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", // th
    "i" -> "n", // in
    "e" -> "r", // er
    "a" -> "n", // an
    "r" -> "e", // re
    "o" -> "n", // on
    "e" -> "s", // es
    "a" -> "t", // at
    "o" -> "r", // or
    "e" -> "n", // en
    "th" -> "e", // the
    "in" -> "g", // ing
    "an" -> "d", // and
    "o" -> "u", // ou
    "i" -> "s", // is
    "i" -> "t", // it
    "a" -> "l", // al
    "a" -> "r", // ar
    "s" -> "t", // st
    "t" -> "o", // to
    "o" -> "f", // of
    "er" -> "s", // ers
    "ing" -> "s", // ings
    "1" -> "0") // 10

  // table validity — the precondition of the rank-order equivalence
  validateTable(Merges)

  private val mergesArr: Array[(String, String, String)] =
    Merges.map { case (x, y) => (x, y, x + y) }.toArray

  /** The validity invariant behind the rank-order equivalence, as a
    * reusable check: every merge's two components must be base chars
    * or outputs of strictly-earlier merges. LEARNED tables (BpeTrain)
    * satisfy it by construction — each round's best pair is made of
    * symbols present in the current states — but [[BpeCountLearned]]
    * re-asserts it at expression build, so an invalid hand-given spec
    * fails loudly instead of silently diverging from priority BPE. */
  def validateTable(merges: Seq[(String, String)]): Unit = {
    val have = scala.collection.mutable.Set[String]() ++
      (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    merges.foreach { case (x, y) =>
      require(have(x) && have(y),
        s"invalid BPE merge table: ($x, $y) uses a symbol no earlier merge produced")
      have += (x + y)
    }
  }

  /** Parse the compact merge-table spec `"x y,x y,…"` (rank order)
    * used by `bpe_count_learned`'s second argument. */
  def parseMergeSpec(spec: String): Array[(String, String, String)] = {
    val merges = spec.split(',').filter(_.nonEmpty).toSeq.map { m =>
      val parts = m.split(' ')
      require(parts.length == 2, s"bad merge spec entry: '$m' (want 'x y')")
      (parts(0), parts(1))
    }
    validateTable(merges)
    merges.map { case (x, y) => (x, y, x + y) }.toArray
  }

  /** BPE token count of `s` under [[Merges]] — one compiled pass. */
  def countTokens(s: UTF8String): Long = countTokensWith(s, mergesArr)

  /** BPE token count under an arbitrary (validated) merge table —
    * the learned-table lane: BpeTrain's output feeds this through
    * `bpe_count_learned`, same mechanics as the static table. */
  def countTokensWith(s: UTF8String,
      merges: Array[(String, String, String)]): Long = {
    val t = s.toLowerCase.toString
    val n = t.length
    var count = 0L
    val word = new java.util.ArrayList[String](32)
    var i = 0
    while (i <= n) {
      val c = if (i < n) t.charAt(i) else '\u0000'
      if (i < n && ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
        word.add(String.valueOf(c))
      else if (!word.isEmpty) {
        count += mergeWord(word, merges)
        word.clear()
      }
      i += 1
    }
    count
  }

  /** Apply the merges in rank order, leftmost-first non-overlapping
    * (after a merge the scan resumes AFTER the merged symbol — the
    * replace() convention the oracle uses). Returns the symbol count. */
  private def mergeWord(word: java.util.ArrayList[String],
      merges: Array[(String, String, String)]): Int = {
    var mi = 0
    while (mi < merges.length) {
      val m = merges(mi)
      var i = 0
      while (i < word.size - 1) {
        if (word.get(i) == m._1 && word.get(i + 1) == m._2) {
          word.set(i, m._3)
          word.remove(i + 1)
        }
        i += 1
      }
      mi += 1
    }
    word.size
  }

  /** The DuckDB replay of [[countTokens]]: the word state renders as
    * `<sym><sym>…` with `|` word separators, each merge is one
    * literal `replace()` in rank order, and the token count is the
    * number of `<` delimiters. Returns (stateExpr, countExprOf) so the
    * caller can CTE the state once instead of inlining it twice. */
  def oracleStateExpr(textCol: String): String =
    oracleStateExpr(textCol, Merges)

  /** Same replay under an arbitrary merge table (the learned-table
    * lane's oracle — BpeTrain feeds its learned merges here). */
  def oracleStateExpr(textCol: String, merges: Seq[(String, String)]): String = {
    val base = "regexp_replace(regexp_replace(lower(" + textCol +
      "), '[^a-z0-9]+', '|', 'g'), '([a-z0-9])', '<\\1>', 'g')"
    merges.foldLeft(base) { case (acc, (x, y)) =>
      s"replace($acc, '<$x><$y>', '<$x$y>')"
    }
  }

  /** Token count from an already-computed state column. */
  def oracleCountExpr(stateCol: String): String =
    s"CAST(length($stateCol) - length(replace($stateCol, '<', '')) AS BIGINT)"
}

/** `bpe_count(text)` — LongType, codegen via the static helper (the
  * HashExprs discipline: no UDF boxing, stays inside whole-stage
  * codegen). */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_count"
}

/** `bpe_count_learned(text, 'x y,x y,…')` — [[BpeCount]] under an
  * arbitrary rank-ordered merge table given as a foldable spec string
  * (the registration parses it ONCE at plan build; codegen carries the
  * parsed table as a reference object, so the hot loop is identical to
  * the static-table path — no per-row parsing, no UDF boxing). This is
  * how a LEARNED table (BpeTrain) is applied to a corpus: train on the
  * vocab, render the merges as a spec literal, tokenize at scan speed. */
case class BpeCountLearned(child: Expression,
    merges: Array[(String, String, String)]) extends UnaryExpression {
  Bpe.validateTable(merges.toSeq.map { case (x, y, _) => (x, y) })
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Bpe.countTokensWith(input.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "scala.Tuple3[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokensWith($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeCountLearned =
    copy(child = newChild)
  override def prettyName: String = "bpe_count_learned"
}
