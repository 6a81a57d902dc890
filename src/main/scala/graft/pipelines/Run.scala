package graft.pipelines

import graft.sinks.TableSink
import org.apache.spark.sql.SparkSession

/**
 * Pipeline runner — the reference's CLI surface (reference: run.sh +
 * options/BQETLOptions.java) re-expressed: pick a pipeline variant,
 * point it at an input directory, truncate-and-load the output table.
 *
 *   runMain graft.pipelines.Run \
 *     simple|simple-with-lookups|nested|corpus|ingest|snapshot|mask|branch|merge|log|storage|replicate \
 *     [inDir] [outPath] [--sf=0.001] [--stages=quality,exact,near,decon,sample,pack] \
 *     [--near=minhash|exact] [--table=customer] \
 *     [--policy=c_custkey:keep,c_name:sha256,...] \
 *     [--name=dev] [--from=dev] [--into=prod] [--ref=dev] [--delete=dev]
 *
 * `mask` applies the A28 policy-driven release projection to
 * `$inDir/$table.parquet` (default-deny: unlisted columns dropped)
 * and truncate-loads the masked output.
 *
 * Branch surface (A35–A37, A40): `branch --name=dev [--from=prod]`
 * creates a mergeable branch at the namespace given as inDir; `snapshot
 * --ref=dev` publishes the denorm onto that branch (gated against the
 * branch head, prod untouched); `merge --from=dev [--into=prod]`
 * three-way-merges it back (conflicts → exit 3 with the tables
 * printed); `branch --delete=dev` removes a dead branch and its merge
 * base so vacuum can reclaim the chain it pinned (release names like
 * prod refuse without --force=true); `branch --gc=true
 * --older-than=<ms> [--keep=a,b]` (A42) bulk-sweeps every idle
 * non-release ref by the A37 history timestamps; `log` prints the A37
 * commit history, aborted candidates included.
 *
 * `replicate <srcRoot> <dstRoot>` (A39) copies and checksum-verifies
 * the whole namespace, printing the per-(version, table) report; the
 * replica's manifest flips only after every table verifies, and an
 * already-published destination refuses with exit 3.
 *
 * `snapshot` runs the governed-publish lifecycle: denorm →
 * schema-gated atomic publish under outPath → advance the `prod`
 * tag. Reruns append immutable versions; a breaking schema change
 * refuses (exit 3) with the violations printed.
 *
 * `ingest` drives [[graft.sources.IngestLedger]]: inDir is a
 * directory of line-JSON arrivals, outPath the exactly-once target —
 * rerunning the same command ingests only new files.
 *
 * `corpus` drives the C41 corpus-assembly flagship end-to-end (read
 * documents → assemble → truncate-and-load), the way run.sh drives
 * the reference's denorm pipelines. `--stages` selects a stage
 * subset (canonical order enforced), `--near` the near-dedup
 * variant, `--url-col` the URL provenance column for the C93 `canon`
 * stage (required when `canon` is requested explicitly), `--sf` the
 * testdata scale factor when no explicit inDir is given.
 */
object Run {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    def flag(name: String): Option[String] = flags.collectFirst {
      case f if f.startsWith(s"--$name=") => f.drop(name.length + 3)
    }
    val unknown = flags.filterNot(f =>
      Seq("sf", "stages", "near", "table", "policy", "link", "name", "from",
        "into", "ref", "delete", "force", "gc", "older-than", "keep", "url-col")
        .exists(n => f.startsWith(s"--$n=")))
    if (unknown.nonEmpty) {
      System.err.println(s"unknown flags: ${unknown.mkString(" ")} " +
        "(--sf= --stages= --near= --table= --policy= --link= --name= --from= " +
        "--into= --ref= --delete= --force= --gc= --older-than= --keep=)")
      sys.exit(2)
    }
    val variant = pos.headOption.getOrElse("simple-with-lookups")
    val inDir   = if (pos.length > 1) pos(1)
      else s"/root/testdata/sf${flag("sf").getOrElse("0.001")}"
    val outPath = if (pos.length > 2) pos(2)
      else java.nio.file.Files.createTempDirectory("graft_run").toString + "/out"

    val spark = graft.Sessions.local()

    if (variant == "snapshot") {
      // the governed-publish lifecycle from the command line: denorm →
      // schema-gated atomic publish under outPath → advance the 'prod'
      // tag; rerunning appends immutable versions (A19/A25/A27), and a
      // breaking schema change refuses with the violations printed.
      // `--link` reruns as a ZERO-COPY incremental publish (A32):
      // only the denorm rewrites, everything else the current version
      // serves carries forward by reference.
      val table = Denorm.flatDenorm(spark, inDir, performLookups = true)
      // `--ref=<branch>` publishes onto an A35 branch instead of the
      // head+prod flow: gated against the REF's own head, advances
      // only that ref (burn-in for the CLI pipeline; merge back with
      // the `merge` verb)
      flag("ref") match {
        case Some(ref) =>
          // resolve the ref FIRST: an unknown ref or bad root must fail
          // with its own message, not be mislabeled as a schema-gate
          // refusal by the catch below (ADVICE r16)
          try graft.sinks.Snapshot.tagVersion(spark, outPath, ref): Unit
          catch {
            case e: IllegalArgumentException =>
              System.err.println(s"REF_UNKNOWN ${e.getMessage}")
              spark.stop()
              sys.exit(2)
          }
          try {
            val (v, _) = graft.sinks.Snapshot.publishToRef(
              spark, outPath, ref, Map("denorm" -> table))
            val rows = graft.sinks.Snapshot.readTag(spark, outPath, "denorm", ref).count()
            println(s"RUN_RESULT variant=snapshot ref=$ref version=$v published=true rows=$rows out=$outPath")
            spark.stop()
          } catch {
            case e: IllegalArgumentException =>
              System.err.println(s"SCHEMA_VIOLATION ${e.getMessage}")
              spark.stop()
              sys.exit(3)
          }
          return
        case None => ()
      }
      val (ver, ok, viol) =
        if (flag("link").contains("true") &&
            graft.sinks.Snapshot.currentVersion(spark, outPath) > 0) {
          // the linked fast path runs the SAME A27 gate as the full
          // publish (ADVICE r14: skipping it here let a breaking
          // schema change publish zero-copy and advance prod)
          val viols = graft.sinks.Snapshot.schemaViolations(
            spark, outPath, Map("denorm" -> table))
          if (viols.nonEmpty)
            (graft.sinks.Snapshot.currentVersion(spark, outPath) + 1, false, viols)
          else {
            val (v, _) = graft.sinks.Snapshot.publishLinked(
              spark, outPath, Map("denorm" -> table))
            (v, true, Seq.empty[String])
          }
        } else graft.sinks.Snapshot.publishCompatible(
          spark, outPath, Map("denorm" -> table))
      if (ok) graft.sinks.Snapshot.tag(spark, outPath, "prod", ver)
      viol.foreach(v => System.err.println(s"SCHEMA_VIOLATION $v"))
      val rows =
        if (ok) graft.sinks.Snapshot.readTag(spark, outPath, "denorm", "prod").count()
        else -1L
      println(s"RUN_RESULT variant=snapshot version=$ver published=$ok rows=$rows out=$outPath")
      spark.stop()
      if (!ok) sys.exit(3)
      return
    }

    if (variant == "branch") {
      // A40 from the command line: `branch --delete=<ref>` removes a
      // dead branch (ref + recorded merge base) so the next vacuum can
      // reclaim the versions it alone was pinning; release names
      // (prod, stable, latest, release*) refuse without --force=true
      flag("delete") match {
        case Some(ref) =>
          try {
            graft.sinks.Snapshot.deleteRef(spark, inDir, ref,
              force = flag("force").contains("true"))
            println(s"RUN_RESULT variant=branch deleted=$ref root=$inDir")
            spark.stop()
          } catch {
            case e: IllegalArgumentException =>
              System.err.println(s"DELETE_REFUSED ${e.getMessage}")
              spark.stop()
              sys.exit(3)
          }
          return
        case None => ()
      }
      // A42 from the command line: `branch --gc=true --older-than=<ms>`
      // sweeps every non-release ref whose chain has been idle longer
      // than the cutoff (--keep=a,b exempts names; entries may use
      // '*' globs, e.g. --keep=ci-nightly-*); reclamation
      // is the next vacuum's job
      if (flag("gc").contains("true")) {
        val olderThan = flag("older-than").map(_.toLong).getOrElse {
          System.err.println("branch --gc=true requires --older-than=<ms>")
          spark.stop(); sys.exit(2)
        }
        val keep = flag("keep").toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
        val swept = graft.sinks.Snapshot.gcRefs(spark, inDir, olderThan,
          keep = keep)
        swept.foreach { case (n, v) => println(s"RUN_GC ref=$n version=$v") }
        println(s"RUN_RESULT variant=branch gc_swept=${swept.length} root=$inDir")
        spark.stop()
        return
      }
      // A36 from the command line: create a mergeable branch (ref +
      // recorded merge base) at the head of --from (default prod)
      val name = flag("name").getOrElse {
        System.err.println("branch requires --name=<ref> (or --delete=<ref>)")
        spark.stop(); sys.exit(2)
      }
      val from = flag("from").getOrElse("prod")
      val base = graft.sinks.Snapshot.branch(spark, inDir, name, from)
      println(s"RUN_RESULT variant=branch name=$name from=$from base=$base root=$inDir")
      spark.stop()
      return
    }

    if (variant == "replicate") {
      // A39 from the command line: copy-and-verify the namespace at
      // the first positional root into the second, printing the
      // per-(version, table) checksum report; an already-published
      // destination refuses (exit 3), as does a checksum mismatch —
      // the replica's manifest flips only after every row verifies
      if (pos.length < 3) {
        System.err.println("replicate requires <srcRoot> <dstRoot> positionals")
        spark.stop(); sys.exit(2)
      }
      try {
        val rep = graft.sinks.Snapshot.replicate(spark, inDir, outPath).collect()
        rep.foreach { r =>
          println(s"RUN_REPLICATE version=${r.getLong(0)} table=${r.getString(1)} " +
            s"rows=${r.getLong(2)} checksum_match=${r.getBoolean(3)}")
        }
        println(s"RUN_RESULT variant=replicate tables=${rep.length} " +
          s"from=$inDir to=$outPath")
        spark.stop()
      } catch {
        case e: IllegalArgumentException =>
          System.err.println(s"REPLICATE_REFUSED ${e.getMessage}")
          spark.stop()
          sys.exit(3)
      }
      return
    }

    if (variant == "merge") {
      // A36 three-way merge from the command line: conflicts refuse
      // with exit 3 and the conflicted tables printed — the nightly
      // script's "stop and page someone" path
      val from = flag("from").getOrElse {
        System.err.println("merge requires --from=<branch>")
        spark.stop(); sys.exit(2)
      }
      val into = flag("into").getOrElse("prod")
      try {
        val (v, homes) = graft.sinks.Snapshot.mergeRef(spark, inDir, from, into)
        val hs = homes.toSeq.sorted.map { case (t, h) => s"$t=v$h" }.mkString(",")
        println(s"RUN_RESULT variant=merge from=$from into=$into version=$v homes=$hs")
        spark.stop()
      } catch {
        case e: IllegalArgumentException =>
          System.err.println(s"MERGE_REFUSED ${e.getMessage}")
          spark.stop()
          sys.exit(3)
      }
      return
    }

    if (variant == "log") {
      // A37 from the command line: the namespace's publish history
      graft.sinks.Snapshot.history(spark, inDir).collect().foreach { r =>
        println(s"RUN_LOG version=${r.getLong(0)} op=${r.getString(1)} " +
          s"parent=${r.getLong(2)} written=${r.getString(3)} ref=${r.getString(4)} " +
          s"reachable=${r.getBoolean(5)}")
      }
      println(s"RUN_RESULT variant=log root=$inDir")
      spark.stop()
      return
    }

    if (variant == "storage") {
      // the A33 accounting surface from the command line: one line per
      // version of the snapshot namespace at the positional root
      graft.sinks.Snapshot.storageReport(spark, inDir).collect().foreach { r =>
        println(s"RUN_STORAGE version=${r.getLong(0)} physical=${r.getLong(1)} " +
          s"linked=${r.getLong(2)} logical_rows=${r.getLong(3)} " +
          s"linked_rows=${r.getLong(4)} bytes=${r.getLong(5)}")
      }
      println(s"RUN_RESULT variant=storage root=$inDir")
      spark.stop()
      return
    }

    if (variant == "mask") {
      // the A28 release projection from the command line: apply a
      // policy relation parsed from --policy=col:action[:param],...
      // to $inDir/$table.parquet and truncate-load the masked output
      val table = flag("table").getOrElse("customer")
      val policy = flag("policy").getOrElse {
        System.err.println("mask requires --policy=col:action[:param],...")
        spark.stop()
        sys.exit(2)
      }
      val n = maskTable(spark, inDir, table, policy, outPath)
      println(s"RUN_RESULT variant=mask table=$table rows=$n out=$outPath")
      spark.stop()
      return
    }

    if (variant == "ingest") {
      // the exactly-once sink IS the pipeline here: no truncate-load
      val n = graft.sources.IngestLedger.ingestIncremental(
        spark, inDir, outPath, identity, suffix = ".json")
      val rows = spark.read.parquet(s"$outPath/part_*").count()
      println(s"""RUN_RESULT variant=ingest files=$n rows=$rows out=$outPath""")
      spark.stop()
      return
    }

    val out = variant match {
      case "simple"              => Denorm.flatDenorm(spark, inDir, performLookups = false)
      case "simple-with-lookups" => Denorm.flatDenorm(spark, inDir, performLookups = true)
      case "nested"              => Denorm.nestedDenorm(spark, inDir)
      case "corpus" =>
        val docs = spark.read.parquet(s"$inDir/documents.parquet")
        val near: (org.apache.spark.sql.DataFrame, CorpusAssembly.Config) =>
            org.apache.spark.sql.DataFrame = flag("near") match {
          case Some("exact")           => CorpusAssembly.nearDedupExact
          case None | Some("minhash")  => CorpusAssembly.nearDedupMinhash
          case Some(other) =>
            System.err.println(s"unknown --near '$other' (minhash|exact)")
            sys.exit(2)
        }
        val stages = flag("stages")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(CorpusAssembly.StageNames)
        // `canon` needs URL provenance: an EXPLICIT --stages=canon,...
        // without --url-col must refuse, not silently skip stage 0
        val urlCol = flag("url-col")
        if (urlCol.isEmpty && flag("stages").exists(_.contains("canon"))) {
          System.err.println("corpus --stages=canon requires --url-col=<column>")
          sys.exit(2)
        }
        CorpusAssembly.assembleStaged(docs,
          CorpusAssembly.Config(urlCol = urlCol), near, stages)
      case other =>
        System.err.println(
          s"unknown variant '$other' (simple|simple-with-lookups|nested|corpus|ingest|snapshot|mask|branch|merge|log|storage|replicate)")
        sys.exit(2)
    }
    TableSink.writeTruncate(out, outPath)
    val n = spark.read.parquet(outPath).count()
    println(s"""RUN_RESULT variant=$variant rows=$n out=$outPath""")
    spark.stop()
  }

  /** The `mask` verb's core, separated so specs can drive it on a
   * shared session: parse "col:action[:param],..." into the policy
   * relation, apply it ([[graft.operators.Masking.applyPolicy]] —
   * default-deny, fail-loud), truncate-load, return the row count. */
  def maskTable(spark: SparkSession, inDir: String, table: String,
      policy: String, outPath: String): Long = {
    val rows = policy.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { r =>
      r.split(":").toList match {
        case c :: a :: Nil => (c, a, 0L)
        case c :: a :: p :: Nil => (c, a, p.toLong)
        case _ => throw new IllegalArgumentException(
          s"mask: bad policy entry '$r' (want col:action[:param])")
      }
    }
    import spark.implicits._
    val masked = graft.operators.Masking.applyPolicy(
      spark.read.parquet(s"$inDir/$table.parquet"),
      rows.toDF("column", "action", "param"))
    TableSink.writeTruncate(masked, outPath)
    spark.read.parquet(outPath).count()
  }
}
