package graft

import graft.core.GraftError
import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine's codegen'd Catalyst expressions: installs
  * `graft_*` functions into the session so `spark.sql` queries can use
  * the same primitives the DataFrame API composes — the
  * `SparkSessionExtensions` route Spark reserves for library operators
  * (no UDF wrapping, the expressions keep whole-stage codegen).
  *
  * Two installation paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (standard extensions config, survives `newSession()`);
  *  - [[GraftExtensions.register]] on a live session (what
  *    [[GraftSession]] does).
  *
  * Tuning arguments (n, k, w) must be literal integers: they become part
  * of the generated code, exactly like the DataFrame API's Int
  * parameters.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def intArg(fn: String, pos: Int, args: Seq[Expression]): Int =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new GraftError(
        s"$fn: argument ${pos + 1} must be a literal integer, got $other")
    }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new GraftError(s"$fn takes $n arguments, got ${args.length}")

  /** name -> positional builder, shared by both installation paths. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_char_ngrams" -> { args =>
      arity("graft_char_ngrams", 2, args)
      CharNgramsExpr(args(0), intArg("graft_char_ngrams", 1, args),
        distinct = false)
    },
    "graft_char_ngrams_distinct" -> { args =>
      arity("graft_char_ngrams_distinct", 2, args)
      CharNgramsExpr(args(0), intArg("graft_char_ngrams_distinct", 1, args),
        distinct = true)
    },
    "graft_char_ngram_hashes" -> { args =>
      arity("graft_char_ngram_hashes", 2, args)
      CharNgramHashesExpr(args(0), intArg("graft_char_ngram_hashes", 1, args),
        distinct = false)
    },
    "graft_char_ngram_hashes_distinct" -> { args =>
      arity("graft_char_ngram_hashes_distinct", 2, args)
      CharNgramHashesExpr(args(0),
        intArg("graft_char_ngram_hashes_distinct", 1, args), distinct = true)
    },
    "graft_word_shingles" -> { args =>
      arity("graft_word_shingles", 2, args)
      WordShinglesExpr(args(0), intArg("graft_word_shingles", 1, args))
    },
    "graft_minhash" -> { args =>
      arity("graft_minhash", 2, args)
      MinHashSignatureExpr(args(0), intArg("graft_minhash", 1, args))
    },
    "graft_minhash_char_ngrams" -> { args =>
      arity("graft_minhash_char_ngrams", 3, args)
      MinHashCharNgramsExpr(args(0),
        intArg("graft_minhash_char_ngrams", 1, args),
        intArg("graft_minhash_char_ngrams", 2, args))
    },
    "graft_minhash_word_shingles" -> { args =>
      arity("graft_minhash_word_shingles", 3, args)
      MinHashWordShinglesExpr(args(0),
        intArg("graft_minhash_word_shingles", 1, args),
        intArg("graft_minhash_word_shingles", 2, args))
    },
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", 1, args)
      SimHash64Expr(args(0))
    },
    "graft_winnow" -> { args =>
      arity("graft_winnow", 3, args)
      WinnowExpr(args(0), intArg("graft_winnow", 1, args),
        intArg("graft_winnow", 2, args))
    },
    "graft_vec_dot" -> { args =>
      arity("graft_vec_dot", 2, args)
      FloatVecDot(args(0), args(1))
    })

  /** Install on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
