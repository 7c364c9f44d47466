package graft

import org.apache.spark.sql.SparkSession

/** Prints a stable digest of a roster query's executed plan: md5 of
  * the formatted plan with per-run identifiers (expression ids,
  * plan ids, temp paths) stripped. Two runs of the same build print
  * the same digest iff Catalyst picked the same physical plan — the
  * committable evidence that a bench timing drift is shared-JVM
  * jitter, not a plan change (see BENCH_HISTORY.md's notes; e09 was
  * the query that needed this three rounds running).
  *
  * Session settings mirror [[Bench]] (same SPARK_GRAFT_CPUS-driven
  * parallelism and AQE config) so the digested plan is the plan the
  * bench actually executes.
  *
  * Usage:
  *   runMain graft.PlanDigest <query_name> [sfDir]        — one digest
  *   runMain graft.PlanDigest --all [sfDir] [outPath]     — full manifest
  *
  * `--all` digests every roster query into PLAN_DIGESTS.md (committed
  * at round end, like BENCH_HISTORY.md): a bench timing drift whose
  * digest is UNCHANGED in the manifest diff is shared-JVM jitter by
  * construction, and a real plan change shows up as a one-line diff —
  * extending the e09 one-off proof (tools/BENCH_NOTES.md) to all 123
  * queries, so every future drift adjudicates itself.
  */
object PlanDigest {

  /** Strip the per-run identifiers that differ between two executions
    * of the SAME plan, leaving only the plan's structural text:
    * expression/plan ids, temp and file paths, lambda hidden-class
    * addresses and object identity hashes (differ per JVM), and
    * whole-stage-codegen stage numbers (independent subtrees are
    * numbered by execution order, which AQE + subquery scheduling can
    * legally swap run-to-run — the `codegen id` markers and
    * WholeStageCodegen's bare-integer Arguments line). The bare-int
    * Arguments normalization also blanks scalar operator args (e.g. a
    * literal limit) — acceptable: a limit edit alone would still show
    * in the surrounding plan text (TakeOrdered row counts, etc.).
    *
    * Attribute-list lines (Input/Output/Keys/Results/Functions/
    * Arguments/Aggregate Attributes) additionally get their bracketed
    * lists recursively SORTED: multi-count-distinct plans order their
    * Expand projections (and the downstream aggregate's key lists) by
    * expression-id-dependent hashing, which permutes run-to-run in a
    * shared session (RewriteDistinctAggregates; seen on q11/q51/s08/
    * t09/d03/e07 in --all runs). Sorting canonicalizes the list
    * CONTENT while operator structure, join strategies, exchanges,
    * scan schemas, and pushed filters all still alter the digest —
    * the things a performance drift needs adjudicated.
    *
    * Two more session-history artifacts of the same rewrite (caught
    * when the r10 manifest regen shifted 3 untouched queries):
    * RewriteDistinctAggregates NUMBERS its distinct groups (`gid`) in
    * exprId-hash order, so the literal gid values in Expand projection
    * rows and `FILTER (WHERE gid = N)` clauses, and the Expand-output
    * attribute order inside `hashpartitioning(...)`, all permute
    * run-to-run; on lines mentioning `gid#x` the gid literals are
    * blanked (sorting then canonicalizes row order) and the
    * hashpartitioning argument list is sorted. And
    * `NamedLambdaVariable` names (`lambda x_1`) draw from a global
    * per-JVM counter, so higher-order-function plans embed the
    * session's query count — the numeric suffix is blanked. */
  def normalize(plan: String): String = {
    val replaced = plan
      .replaceAll("#\\d+L?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("id=#x", "id=x")
      .replaceAll("\\$Lambda\\$\\d+/0x[0-9a-fA-F]+", "\\$Lambda\\$x")
      .replaceAll("@[0-9a-f]{4,16}\\b", "@x")
      .replaceAll("codegen id : \\d+", "codegen id : x")
      .replaceAll("(?m)^Arguments: \\d+$", "Arguments: x")
      .replaceAll("/tmp/\\S+", "/tmp/x")
      .replaceAll("file:\\S+", "file:x")
      // lambda variables are named by their source-side parameter (x,
      // y, z for Column-API lambdas; whatever letter an expr() SQL
      // lambda used), all drawing the same global counter — blank the
      // counter for ANY single-letter lambda name, not just x
      .replaceAll("\\b([a-z])_\\d+#x", "$1_n#x")
      .replaceAll("\\(gid#x = \\d+\\)", "(gid#x = x)")
      // localCheckpoint scans print the JVM-GLOBAL RDD id
      // (`MapPartitionsRDD[1455] at localCheckpoint at ...`); any
      // earlier query spawning one extra RDD (broadcast/AQE timing)
      // shifts it — a session-history artifact, not a plan property
      .replaceAll("RDD\\[\\d+\\]", "RDD[x]")
      // ...and the checkpoint CALL SITE's source line (`at
      // DedupQueries.scala:1012`) — inserting a query above it in the
      // same file shifts every later digest (d21 flipped when d26
      // landed 53 lines earlier in DedupQueries). A source-layout
      // artifact, not a plan property; the file name stays pinned.
      .replaceAll("\\.scala:\\d+", ".scala:x")
      // 6th artifact class (r13): the checkpoint call site's METHOD and
      // FILE — `at localCheckpoint at DedupQueries.scala:x` became `at
      // checkpoint/materialize at Materialize.scala:x` when the
      // conf-dispatched Materialize helper replaced direct calls; which
      // helper frame Spark's CallSite picks (and which mode the session
      // runs) is deployment plumbing, not plan shape. Blank the RDD
      // class and the whole `at <method> at <file>.scala:x` token on
      // checkpoint-scan lines (MapPartitionsRDD in local mode,
      // ReliableCheckpointRDD in reliable mode — same plan).
      .replaceAll("[A-Za-z]*RDD\\[(\\d+|x)\\] at [\\w$.]+ at [\\w$.]+\\.scala:x",
        "RDD[x] at x at x.scala:x")
      // 7th artifact class (r15): query-stage Statistics annotations —
      // `BroadcastQueryStage (23), Statistics(sizeInBytes=64.5 MiB,
      // rowCount=2.00E+4)` prints RUNTIME-MEASURED stats, which depend
      // on session history (d03 flapped 8.5 vs 64.5 MiB across
      // identical same-code sweeps — whether AQE measured the stage or
      // inherited an earlier query's exchange state). Measured bytes
      // are not plan shape; rowCount rides in the same payload.
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
    replaced.linesIterator.map { line =>
      // On distinct-rewrite lines, blank BARE-INTEGER list elements —
      // the gid value each Expand projection row carries (the raw
      // explain puts it last: `[l_returnflag#x, null, null, 0]`).
      // Lookarounds keep ints that are not whole `[...]`-list elements
      // (function args like count(1), hashpartitioning's partition
      // count) untouched.
      val degid =
        if (line.contains("gid#x"))
          canonHashPartitioning(
            line.replaceAll("(?<=\\[|, )\\d+(?=,|\\])", "x"))
        else line
      // Runtime-derived partition COUNTS are not plan shape: the
      // trailing numeric arg of an optimizer-inserted exchange
      // (ENSURE_REQUIREMENTS) or a countless repartition(col)
      // (REPARTITION_BY_COL) reflects SPARK_GRAFT_CPUS and — on
      // localCheckpoint scans — whatever partitioning AQE's coalescing
      // left on the materialized RDD, which depends on SESSION HISTORY
      // (d26's digest flipped between two same-code manifest sweeps
      // because earlier queries shifted the block-manager state the
      // checkpoint inherited). Blank exactly that trailing count; a
      // USER-written repartition(n, …) (REPARTITION_BY_NUM) and any
      // integer inside a key expression (pmod(h, 16), substring args)
      // are genuine plan properties and stay pinned.
      val departs = degid.replaceAll(
        ", \\d+\\), (ENSURE_REQUIREMENTS|REPARTITION_BY_COL)",
        ", n), $1")
      if (ListLinePrefix.findFirstIn(departs.trim).isDefined)
        canonBrackets(departs)
      else departs
    }.mkString("\n") |> canonInstanceDedup
  }

  private implicit class Pipe[A](private val a: A) {
    def |>[B](f: A => B): B = f(a)
  }

  /** 9th artifact class (r18) — KNOWN RESIDUAL, documented rather than
    * normalized: an AQE BroadcastHashJoin between two NEAR-EQUAL tiny
    * query stages can flip BuildLeft/BuildRight run-to-run. The
    * planner picks the smaller measured side, and a stage's measured
    * size is its compressed shuffle/RDD bytes, which jitter by a few
    * bytes with task-order-dependent row order — a near-tie flips.
    * Observed once each on m09 (r18 close sweep) and d13 (a probe
    * sweep) across four full r18 sweeps — d13 then landed minority-side
    * in 3 of 7 total r18 sweeps (a near-fair coin); both are
    * report-tail joins of two census frames where either side
    * broadcasting is equally correct, so the semantic impact is zero.
    * NOT folded by the normalizer: the build side of a broadcast join
    * is usually a real plan property (most roster joins pair a corpus
    * side with a hinted small side), and canonicalizing child order of
    * an indented plan tree would blind the digest to genuine
    * join-order changes.
    *
    * Adjudicated sites instead carry an ACCEPTED-ALTERNATES manifest
    * row (see [[AcceptedAlternates]]): the row lists every adjudicated
    * digest state, any regeneration landing on a member writes the
    * SAME (stable) row, and a third, never-adjudicated value fails the
    * `--all` run loudly — so the round close needs zero manual edits
    * regardless of which state the coin lands on, while a planted or
    * accidental plan change still aborts the close. Protocol when a
    * NEW row flaps with no code motive: re-run (tools/plan_digests.sh —
    * round_close always dumps normalized plans), diff the dumps; a
    * pure BuildLeft/BuildRight mirror of one BHJ subtree is this
    * class — add BOTH values to [[AcceptedAlternates]] with the
    * adjudication reference.
    *
    * Why the sites are deliberately NOT pinned with broadcast() hints:
    * the flapping joins sit between DERIVED frames (checkpointed
    * census/rep tables) that are tiny on the audit corpus but grow
    * with the corpus — d13's rep frame is corpus-sized at 100 TB. A
    * hard hint would force the driver to collect that side at every
    * scale, exactly the broadcast cliff the nearestGrouped scaladoc
    * documents leaving to Catalyst. The residual digest bistability on
    * a handful of near-tie rows is the price of keeping the scale-
    * correct "let AQE choose" posture; the alternates manifest + the
    * always-dumped plans keep it auditable and hands-off. */
  private[graft] val AcceptedAlternates: Map[String, (Set[String], String)] =
    Map(
      // d13's report-tail BHJ near-tie (9th class, BENCH_NOTES r18):
      // canonical pre-r18 state first, the BuildLeft/BuildRight mirror
      // second — 4:3 over seven r18 sweeps, both dump states
      // byte-identical within their class.
      // full minority value captured r19 via SPARK_GRAFT_DIGEST_REPEAT=14
      // (3/14 reps; prefix matches the seven r18 sweeps' `7f49…`)
      "d13_semantic_dedup" -> ((Set(
        "2eed34c4c3c3c276f9ca8b8aca0f7feb",
        "7f4910edff3320a0828dbb3dc3a6741b"),
        "9th-class BHJ near-tie, BENCH_NOTES r18")),
      // m09: the other r18-adjudicated 9th-class site, quantified r19
      // (5:7 over 12 single-query reps — a near-fair coin like d13);
      // the two per-state dumps diff as EXACTLY one
      // `BroadcastHashJoin Inner BuildLeft/BuildRight` line with its
      // two child subtrees swapped (BENCH_NOTES r19).
      "m09_phash_neardup" -> ((Set(
        "bd355fa9c25eb3ef0fbfdecc39694b87",
        "b8ad109ddb4a92cb9feee7ee1e018a6f"),
        "9th-class BHJ near-tie, BENCH_NOTES r19"))
    )

  /** Render one manifest cell: plain digest for ordinary rows; the
    * sorted accepted set (stable regardless of which member this sweep
    * observed) for adjudicated-alternates rows. Returns Left(cell) for
    * a pass, Right(error) when an alternates query lands OUTSIDE its
    * accepted set — the caller fails the run. */
  private[graft] def manifestCell(
      name: String, observed: String): Either[String, String] =
    AcceptedAlternates.get(name) match {
      case None => Left(observed)
      case Some((accepted, note)) =>
        if (accepted.contains(observed))
          Left(s"{${accepted.toSeq.sorted.mkString(", ")}} ($note)")
        else Right(
          s"$name digest $observed is NOT in its accepted-alternates set " +
            s"{${accepted.toSeq.sorted.mkString(", ")}} ($note) — " +
            "a real plan change or an unadjudicated new state; diff the " +
            "SPARK_GRAFT_DIGEST_DUMP plans and adjudicate before closing")
    }

  /** 8th artifact class (r17): formatted explain prints ONE detail
    * block per operator INSTANCE — and whether a plan fragment with
    * several consumers is planned into a shared instance or separate
    * ones varies run-to-run (q54's materialized census printed 40 vs
    * 41 `Scan ExistingRDD` detail blocks across same-code runs,
    * flipping the digest THREE ways under the reuse-off session; the
    * header trees were byte-identical modulo ordinals). Detail-block
    * MULTIPLICITY is runtime object identity, not plan shape, so the
    * canonical form (a) blanks the positional ordinals — the `(N) Op`
    * detail headers, the tree's trailing `(N)` markers, and subquery
    * `Hosting operator id` references, all indices over the very
    * multiplicity that flaps — and (b) keeps each distinct blank-line-
    * separated block ONCE (first occurrence, order preserved). The
    * header tree still carries every operator OCCURRENCE, so a real
    * plan change (an extra scan, a different join) still flips the
    * digest through the tree text; only the duplicated detail prose
    * folds. */
  private[graft] def canonInstanceDedup(s: String): String = {
    val deord = s
      .replaceAll("(?m)^\\(\\d+\\) ", "(x) ")
      .replaceAll("(?m) \\(\\d+\\)$", " (x)")
      .replaceAll("Hosting operator id = \\d+", "Hosting operator id = x")
      // a detail header's `[codegen id : x]` tag rides the same flap:
      // whether the shared instance's block prints with the tag follows
      // which consumer's codegen region planned it (t41's census scan
      // printed tagged in one run, untagged in another — near-twin
      // blocks that dedup could not fold). Codegen-region STRUCTURE
      // stays pinned by the header tree's `*` markers and
      // WholeStageCodegen nodes; only the detail tag is dropped.
      .replaceAll("(?m)^\\(x\\) (.+?) \\[codegen id : x\\]$", "(x) $1")
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    deord.split("\n\n", -1).foreach(seen += _)
    seen.mkString("\n\n")
  }

  /** Sort the top-level argument list of every `hashpartitioning(...)`
    * call in `s` — the clustering KEY SET is the plan property worth
    * pinning; the printed order just mirrors the (permuting) Expand
    * output order on distinct-rewrite lines. Only called for lines
    * mentioning `gid#x`, so ordinary exchanges keep their written key
    * order. */
  private[graft] def canonHashPartitioning(s: String): String = {
    val marker = "hashpartitioning("
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.startsWith(marker, i)) {
        val open = i + marker.length - 1
        var depth = 0
        var j = open
        var close = -1
        while (j < s.length && close < 0) {
          s.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = j
            case _ => ()
          }
          j += 1
        }
        if (close < 0) { sb.append(s.substring(i)); i = s.length }
        else {
          val parts = splitTopLevel(s.substring(open + 1, close)).map(_.trim)
          sb.append(marker).append(parts.sorted.mkString(", ")).append(')')
          i = close + 1
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private val ListLinePrefix =
    "^(Input|Output|Keys|Results|Functions|Aggregate Attributes|Arguments)\\b".r

  /** Recursively sort the top-level comma-separated elements of every
    * `[...]` list in `s` — deterministic canonical form for lines
    * whose list ordering is legally permuted run-to-run. Splitting
    * tracks bracket/paren depth only (a comma inside a string literal
    * would mis-split, but identically on every run — determinism is
    * what the digest needs). */
  private[graft] def canonBrackets(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '[') {
        val j = matchingBracket(s, i)
        val parts = splitTopLevel(s.substring(i + 1, j))
          .map(p => canonBrackets(p.trim))
        sb.append('[').append(parts.sorted.mkString(", ")).append(']')
        i = j + 1
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def matchingBracket(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    s.length - 1
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '[' | '(' => depth += 1
        case ']' | ')' => depth -= 1
        case ',' if depth == 0 =>
          parts += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    parts += s.substring(start)
    parts.toSeq
  }

  def digest(plan: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(normalize(plan).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // THE ONE deliberate divergence from Bench's session: exchange/
      // stage reuse OFF. AQE's stage-reuse cache races its own
      // concurrent materialization, so two identical broadcast
      // subtrees print ReusedExchange on one run and a fresh subtree
      // on another (the d03 1-in-5 manifest flap, r15) — run-to-run
      // nondeterminism that poisons the manifest's purpose. With reuse
      // off the digest is deterministic, and the delta vs the benched
      // plan is EXACTLY the reuse-node class: reuse only dedups
      // identical subtrees, never changes join strategies, exchanges,
      // scans, or pushed filters — the things a perf drift needs
      // adjudicated. (Bench keeps reuse: it is what makes self-joins
      // one-shuffle, e.g. d13's embedding pairwise scan.)
      .config("spark.sql.exchange.reuse", "false")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def digestOf(spark: SparkSession, name: String,
      sfDir: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // materialize so AQE's final (re-optimized) plan is digested
    val normalized = normalize(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(normalized.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // diagnostic: SPARK_GRAFT_DIGEST_DUMP=<dir> keeps every normalized
    // plan for diffing two runs when a digest is unstable. Two files
    // per query: <name>.txt (latest run, the round_close default) and
    // <name>.<digest8>.txt — one per DISTINCT state, so a
    // SPARK_GRAFT_DIGEST_REPEAT loop over a bistable row leaves BOTH
    // plan texts on disk for the 9th-class mirror diff.
    sys.env.get("SPARK_GRAFT_DIGEST_DUMP").foreach { dirPath =>
      val dir = java.nio.file.Paths.get(dirPath)
      if (java.nio.file.Files.isDirectory(dir)) {
        java.nio.file.Files.write(dir.resolve(s"$name.txt"),
          normalized.getBytes("UTF-8"))
        java.nio.file.Files.write(dir.resolve(s"$name.${d.take(8)}.txt"),
          normalized.getBytes("UTF-8"))
      }
    }
    d
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "--all") return allMain(args.drop(1))
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = session()
    // SPARK_GRAFT_DIGEST_DUMP=<existing dir> additionally writes the
    // normalized plan to <dir>/<query>.txt (see digestOf) — for
    // diffing two runs when a digest is unstable
    println(s"""{"query":"$name","plan_digest":"${
      digestOf(spark, name, sfDir)}"}""")
    spark.stop()
  }

  /** Digest every roster query into a committed manifest. Bench's
    * between-query scrub runs here too, so the digested plans are the
    * plans the bench executes (same session tuning, same AQE, same
    * block-manager hygiene). */
  private def allMain(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("PLAN_DIGESTS.md")
    val spark = session()
    // SPARK_GRAFT_DIGEST_ONLY=m06,t14 restricts the roster (Verify's
    // SPARK_GRAFT_ONLY pattern) — for re-running an unstable digest's
    // neighborhood with SPARK_GRAFT_DIGEST_DUMP without paying the
    // full ~4 min sweep. A subset run only prints JSON lines; the
    // manifest file is written exclusively by unfiltered runs so a
    // diagnostic loop can never clobber PLAN_DIGESTS.md.
    val only = sys.env.get("SPARK_GRAFT_DIGEST_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // diagnostic: SPARK_GRAFT_DIGEST_REPEAT=N digests each (subset)
    // query N times in ONE JVM with the bench scrub between — for
    // quantifying a bistable row (the 9th-class protocol) without
    // paying N full sbt launches. Repeat runs never write the manifest.
    val repeat = sys.env.get("SPARK_GRAFT_DIGEST_REPEAT")
      .map(v => scala.util.Try(v.trim.toInt).getOrElse(sys.error(
        s"SPARK_GRAFT_DIGEST_REPEAT must be an integer, got '$v'")))
      .getOrElse(1).max(1)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val rows = names.flatMap { name =>
      (1 to repeat).map { rep =>
        val d =
          try digestOf(spark, name, sfDir)
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[digest] $name FAILED: ${e.getMessage}")
            "FAILED"
          }
        Bench.scrub(spark)
        println(s"""{"query":"$name","plan_digest":"$d"${
          if (repeat > 1) s""","rep":$rep""" else ""}}""")
        (name, d)
      }
    }
    val (cells, violations) = rows.map { case (n, d) =>
      manifestCell(n, d).fold(c => ((n, c), None),
        err => ((n, d), Some(err)))
    }.unzip match { case (cs, vs) => (cs, vs.flatten) }
    val header =
      s"""# Plan digests (${sfDir.split('/').last}, local[${
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}])
         |
         |Normalized physical-plan md5 per roster query (expression ids,
         |plan ids, and temp/file paths stripped — see
         |`graft.PlanDigest.normalize`), regenerated at round end by
         |`tools/plan_digests.sh` alongside BENCH_HISTORY.md. A bench
         |timing drift whose digest is unchanged in this file's diff is
         |shared-JVM jitter by construction; a real plan change is a
         |one-line diff here and adjudicates itself.
         |
         |Since r16 the digest session sets
         |`spark.sql.exchange.reuse=false` — the ONE deliberate
         |divergence from Bench's session (see PlanDigest.session).
         |AQE's stage-reuse cache races its own concurrent
         |materialization, so identical broadcast subtrees printed
         |ReusedExchange on one run and a fresh subtree on another
         |(r15's known-bimodal d03 flap, 1 in 5 sweeps; d02/d04/d13
         |carried the same latent class). With reuse off every sweep
         |prints the expanded subtrees — 5/5 identical d03 digests at
         |the switch — and the delta vs the benched plan is exactly
         |the reuse-node class, which dedups identical subtrees
         |without changing join strategies, exchanges, scans, or
         |pushed filters. Bench keeps reuse ON: it makes self-joins
         |one-shuffle (d13's embedding pairwise scan measured +0.7 s
         |at sf0.1 without it).
         |
         |r17 re-baselines EVERY row (normalizer change — the 8th
         |artifact class): q54_weighted_quantile printed THREE
         |distinct digests across 7 same-code runs under the
         |reuse-off session (53c7341f… 4/7, 2f4f5bb4… 2/7 incl. a
         |full sweep, d55f457c… 1/7 — the r16 manifest value).
         |Dump+diff showed byte-identical header TREES and a ±1
         |`Scan ExistingRDD + Filter` DETAIL-block delta: formatted
         |explain prints one detail block per operator INSTANCE, and
         |instance sharing of a multi-consumer fragment (here the
         |materialized census) is a run-to-run runtime property —
         |object-identity print sharing, not exchange reuse (no
         |Reused* nodes; immune to the reuse=false session).
         |`PlanDigest.canonInstanceDedup` now blanks positional
         |ordinals and keeps each distinct detail block once, so the
         |class is closed BY CONSTRUCTION (q54 stable across repeat
         |runs at the switch); real plan changes still flip the
         |digest through the header tree, which keeps every operator
         |occurrence.
         |
         |r19: rows adjudicated as the 9th artifact class (AQE
         |build-side near-tie — a bistable BuildLeft/BuildRight mirror
         |of ONE near-tie BroadcastHashJoin, see
         |`PlanDigest.AcceptedAlternates`) print their full accepted
         |set `{digestA, digestB} (note)` instead of a single value:
         |any regeneration landing on a member reproduces the SAME row
         |(zero diff, zero manual edits at close), and a third,
         |never-adjudicated value fails the `--all` run with a non-zero
         |exit, aborting round_close. Registered sites: d13_semantic_dedup
         |(4:3 over seven r18 sweeps) and m09_phash_neardup (5:7 over
         |twelve r19 reps); both states' dumps are byte-identical within
         |their class and diff across classes as exactly one
         |BuildLeft/BuildRight mirror (BENCH_NOTES r18/r19).
         |
         || query | plan_digest |
         ||---|---|
         |""".stripMargin
    val body = cells.map { case (n, c) => s"| $n | $c |" }.mkString("\n")
    if (only.isEmpty && repeat == 1) {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (header + body + "\n").getBytes("UTF-8"))
      println(s"[digest] wrote ${cells.size} digests to $outPath" +
        (if (cells.exists(_._2 == "FAILED")) " (WITH FAILURES)" else ""))
    } else println(s"[digest] subset/repeat run (${cells.size} digests) — " +
      "manifest NOT written")
    spark.stop()
    // an alternates violation fails the run AFTER the manifest is
    // written (the bad value is visible in the diff) — sbt runMain
    // propagates the thrown failure as a non-zero exit, which aborts
    // round_close step 2 (set -e)
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[digest] VIOLATION: $v"))
      throw new IllegalStateException(
        s"${violations.size} accepted-alternates violation(s) — see above")
    }
  }
}
