"""Staged, resumable KG-construction job.

Each stage writes a parquet checkpoint table (its ``_SUCCESS`` marker is
the commit point) plus per-partition lineage rows to a ``metrics``
table; a re-launched run skips every stage whose checkpoint is already
committed and resumes mid-pipeline (north rule resumability).

Stages (SURVEY.md §3 Spark lifecycle):
    tokenize_tag → link → canonicalize → materialize

Launch (spark-submit compatible)::

    spark-submit --py-files ner_spark.zip -m ner_spark.plans.job ...
    python -m ner_spark.plans.job --output /tmp/kg --fixture-rows 510
"""

from __future__ import annotations

import argparse
import datetime as dt
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.schemas import METRICS_SCHEMA

STAGES = ("tokenize_tag", "link", "canonicalize", "materialize")


def _utcnow() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


class KgJob:
    def __init__(
        self,
        spark: SparkSession,
        output_dir: str,
        mode: str = "hybrid",
        tokenizer_mode: str = "standard",
        run_id: str | None = None,
        force: bool = False,
        cc_max_iter: int = 50,
        fuzzy_canon: bool = False,
        fuzzy_threshold: float = 0.85,
    ) -> None:
        self.spark = spark
        self.out = output_dir.rstrip("/")
        self.mode = mode
        self.tokenizer_mode = tokenizer_mode
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.force = force
        # surfaced so an operator can raise the connected-components
        # iteration cap for deep graphs without code changes
        self.cc_max_iter = cc_max_iter
        # opt-in fuzzy surface merging (canonicalize.fuzzy_surface_edges);
        # manifest-gated: it changes entity identity semantics
        self.fuzzy_canon = fuzzy_canon
        self.fuzzy_threshold = fuzzy_threshold

    def prewarm(self, even_if_committed: bool = False,
                update_id: str | None = None) -> None:
        """Untimed tiny-slice evaluation of the stage-1 plan shape:
        pays the one-time per-process JVM codegen/JIT + Python-worker
        startup (~26 s measured at 8 pinned cores — BENCH/STAGES.md
        round-3 addendum) on 256 fixture rows so a single-shot CLI run
        executes the real tag stage at steady-state throughput.  No-op
        on resume: a committed stage 1 is skipped, so there is nothing
        to warm.  Long-lived cluster executors amortize the warmup
        anyway; this matters for one-shot / benchmark launches."""
        # validate the resume BEFORE paying the warmup slice: a
        # mode/tokenizer mismatch against an existing checkpoint must
        # fail fast, not after ~26 s of JIT and a write under out/
        # (validation only — stamping a manifest into a fresh dir
        # before any stage runs would poison it for later params)
        self._check_manifest(write=False)
        # even_if_committed: an incremental update tags its delta even
        # though the BASE stage 1 is committed, so it still wants the
        # warmup — unless THAT DELTA's tag stage is itself committed
        # (update resume / completed-update no-op)
        if even_if_committed:
            if update_id and self._exists(
                f"{self.out}/updates/{update_id}/tokenize_tag/_SUCCESS"
            ):
                return
        elif not self.force and self._committed("tokenize_tag"):
            return
        from ner_spark.operators.link import disambiguate
        from ner_spark.operators.tag import extract_mentions
        from ner_spark.sources.fixtures import source_table

        tiny = source_table(self.spark, n_rows=256).coalesce(1)
        path = f"{self.out}/_prewarm"
        disambiguate(
            extract_mentions(tiny, mode=self.mode,
                             tokenizer_mode=self.tokenizer_mode)
        ).drop("context_window").write.mode("overwrite").parquet(path)
        self._delete(path)

    # -- checkpoint plumbing -------------------------------------------------

    def _path(self, stage: str) -> str:
        return f"{self.out}/{stage}"

    def _delete(self, path: str) -> None:
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        p.getFileSystem(conf).delete(p, True)

    def _exists(self, path: str) -> bool:
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(conf).exists(p)

    def _rename(self, src: str, dst: str) -> None:
        """FileSystem.rename — atomic directory move on HDFS/local (the
        compaction installer relies on this; S3 emulates rename by
        copy, where an Iceberg/Delta commit replaces the protocol)."""
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        s = jvm.org.apache.hadoop.fs.Path(src)
        d = jvm.org.apache.hadoop.fs.Path(dst)
        if not s.getFileSystem(conf).rename(s, d):
            raise IOError(f"rename {src} -> {dst} failed")

    def _committed(self, stage: str) -> bool:
        return self._exists(self._path(stage) + "/_SUCCESS")

    def _drop_marker(self, stage: str) -> None:
        """Uncommit a stage (delete its _SUCCESS) so _run_stage
        recomputes it; the data stays readable for pinned references."""
        marker = self._path(stage) + "/_SUCCESS"
        if self._exists(marker):
            self._delete(marker)

    def _log_event(self, stage: str, rows_out: int) -> None:
        """One ad-hoc lineage row (partition_id -1) to the metrics
        table — path markers for which maintenance branch ran."""
        started = _utcnow()
        rows = [(self.run_id, stage, -1, -1, rows_out, None,
                 started, _utcnow(), self.out)]
        self.spark.createDataFrame(rows, METRICS_SCHEMA).write.mode(
            "append"
        ).parquet(f"{self.out}/metrics")

    def _check_manifest(self, write: bool = True) -> None:
        """Stage checkpoints are only valid for the parameters that
        produced them: a resume with a different mode/tokenizer_mode
        must not silently reuse them.  The manifest (one parquet row)
        records the parameters of the first run into this output.
        ``write=False`` validates an existing manifest without creating
        one — validation-only callers (prewarm) must not stamp a fresh
        output dir with params before any stage has actually run."""
        import json

        params = {"mode": self.mode, "tokenizer_mode": self.tokenizer_mode,
                  "fuzzy_canon": self.fuzzy_canon,
                  "fuzzy_threshold": self.fuzzy_threshold}
        path = f"{self.out}/manifest"
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            prev = json.loads(self.spark.read.parquet(path).first()["params"])
            # manifests written before a parameter existed carry that
            # parameter's default (pre-fuzzy outputs stay resumable)
            prev = {"fuzzy_canon": False, "fuzzy_threshold": 0.85, **prev}
            if prev == params:
                return
            if not self.force:
                raise ValueError(
                    f"output {self.out} holds checkpoints for {prev}, but this "
                    f"run uses {params}; pass force=True/--force to recompute"
                )
            # force + different params: every existing stage checkpoint
            # is stale for the NEW params.  Committed UPDATE DELTAS are
            # stale too, but dropping their markers would silently drop
            # their documents from all_links() (a forced run() only
            # recomputes the base source) — so refuse instead: mixing a
            # new-params base with old-params deltas, or losing the
            # delta documents, are both silent corruption.  The operator
            # must either delete {out}/updates (accepting the data loss
            # explicitly) or force-rerun over the full union source.
            stale_deltas = self._update_ids(stage="tokenize_tag")
            if stale_deltas:
                raise ValueError(
                    f"output {self.out} holds {len(stale_deltas)} committed "
                    f"update delta(s) {stale_deltas} computed with {prev}; "
                    f"force-recomputing the base with {params} would mix "
                    "outputs from two parameter sets when all_links() unions "
                    f"them.  Delete {self.out}/updates first (their documents "
                    "must then be re-ingested), or fold them into the base "
                    "with compact() and force-rerun over the union source"
                )
            # Invalidate the base markers (delete the _SUCCESS commit
            # markers) BEFORE rewriting the manifest — otherwise a
            # crash/partial run (e.g. last_stage='tokenize_tag') would
            # leave downstream checkpoints from the OLD params committed
            # under a manifest recording the NEW params, and a later
            # resume would silently reuse them.
            for stage in STAGES:
                marker = jvm.org.apache.hadoop.fs.Path(
                    self._path(stage) + "/_SUCCESS"
                )
                if fs.exists(marker):
                    fs.delete(marker, False)
        elif not write:
            return
        self.spark.createDataFrame(
            [(json.dumps(params),)], "params string"
        ).write.mode("overwrite").parquet(path)

    def _log_metrics(
        self, stage: str, df_out: DataFrame, rows_in: int, sha_ok: bool | None,
        started: dt.datetime, skipped: bool = False, path: str | None = None,
    ) -> None:
        path = path or self._path(stage)
        finished = _utcnow()
        if skipped:
            rows = [(self.run_id, stage, -1, rows_in, df_out.count(), sha_ok,
                     started, finished, path)]
        else:
            per_part = (
                df_out.groupBy(F.spark_partition_id().alias("partition_id"))
                .count()
                .collect()
            )
            rows = [
                (self.run_id, stage, int(r.partition_id), rows_in, int(r["count"]),
                 sha_ok, started, finished, path)
                for r in per_part
            ] or [(self.run_id, stage, 0, rows_in, 0, sha_ok, started, finished, path)]
        self.spark.createDataFrame(rows, METRICS_SCHEMA).write.mode("append").parquet(
            f"{self.out}/metrics"
        )

    def _read_committed(self, path: str, partitioned: bool = False) -> DataFrame:
        """Read a committed stage checkpoint.  Partitioned stages read
        with the schema sidecar so (a) the partition column keeps its
        original position — an inferred read appends it last, making
        resumed runs return a different column order than fresh ones —
        and (b) an EMPTY partitioned checkpoint (zero data files,
        inference would fail) still reads.  Non-partitioned: plain
        read; a corrupt checkpoint raises its real error."""
        import json

        from pyspark.sql.types import StructType

        if partitioned and self._exists(path + "_schema/_SUCCESS"):
            sj = self.spark.read.parquet(path + "_schema").first()["schema_json"]
            return self.spark.read.schema(
                StructType.fromJson(json.loads(sj))
            ).parquet(path)
        return self.spark.read.parquet(path)

    def _sidecar_meta(self, path: str) -> dict | None:
        """The meta dict stored in a stage's schema sidecar, or None
        for legacy sidecars written before meta existed."""
        import json

        if not self._exists(path + "_schema/_SUCCESS"):
            return None
        row = self.spark.read.parquet(path + "_schema").first()
        try:
            return json.loads(row["meta_json"])
        except (KeyError, ValueError, TypeError, AttributeError):
            return None

    def _run_stage(
        self, stage: str, rows_in_df: DataFrame, compute: Callable[[], DataFrame],
        partition_by: tuple[str, ...] = (),
        path: str | None = None,
        meta: dict | None = None,
    ) -> DataFrame:
        import json

        path = path or self._path(stage)
        started = _utcnow()
        if not self.force and self._exists(path + "/_SUCCESS"):
            cached = self._read_committed(path, partitioned=bool(partition_by))
            self._log_metrics(stage, cached, rows_in=-1, sha_ok=None,
                              started=started, skipped=True, path=path)
            return cached
        rows_in = rows_in_df.count()
        out = compute()
        # Iceberg-style layout: the checkpoint table is partitioned by
        # its natural query key (predicate for triples), so downstream
        # readers prune partitions.  At deploy time the same spec moves
        # to `.writeTo(tbl).using("iceberg").partitionedBy(...)`.
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if partition_by or meta is not None:
            # partitioned writes of empty data emit no files at all —
            # persist the schema so a resume can still read the table.
            # The sidecar also carries the stage's meta (e.g. which
            # update deltas the triples cover); it is written BEFORE
            # the data, so the data dir's _SUCCESS remains the single
            # commit point — a crash between the two leaves an
            # uncommitted stage, never a committed stage with stale meta
            self.spark.createDataFrame(
                [(out.schema.json(), json.dumps(meta) if meta is not None else None)],
                "schema_json string, meta_json string",
            ).write.mode("overwrite").parquet(path + "_schema")
        writer.parquet(path)
        written = self.spark.read.schema(out.schema).parquet(path)
        sha_ok = None
        if "sha_ok" in written.columns:
            sha_ok = written.where(F.col("sha_ok") == False).isEmpty()  # noqa: E712
        self._log_metrics(stage, written, rows_in, sha_ok, started, path=path)
        return written

    # -- stages ---------------------------------------------------------------

    def _log_source_integrity(self, source: DataFrame) -> None:
        """North-rule per-row invariant over the FULL source (docs with
        zero mentions included): one metrics row
        (rows_in=total, rows_out=#sha-ok, sha_ok=all-ok)."""
        from ner_spark.operators.tag import sha_check

        started = _utcnow()
        agg = sha_check(source).agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("sha_ok"), 1).otherwise(0)).alias("ok"),
        ).collect()[0]
        n, ok = int(agg["n"]), int(agg["ok"] or 0)
        rows = [(self.run_id, "source_integrity", -1, n, ok, ok == n,
                 started, _utcnow(), self.out)]
        self.spark.createDataFrame(rows, METRICS_SCHEMA).write.mode("append").parquet(
            f"{self.out}/metrics"
        )

    def run(self, source: DataFrame, last_stage: str = "materialize") -> DataFrame:
        from ner_spark.operators.canonicalize import canonicalize
        from ner_spark.operators.link import disambiguate, link_mentions
        from ner_spark.operators.materialize import materialize_triples
        from ner_spark.operators.tag import extract_mentions

        self._check_manifest()
        self._maybe_finish_compact()
        # the full-source integrity scan runs once per output, not per
        # relaunch — a resume over a 100 TB source must not pay a
        # corpus scan before the checkpoint-skip logic even starts
        if "content_sha256" in source.columns and not (
            not self.force and self._committed("tokenize_tag")
        ):
            self._log_source_integrity(source)

        # NED (disambiguate) is a pure column expression over the
        # ±3-token context_window, so it runs INSIDE stage 1's output
        # projection and the token-array column is dropped before the
        # checkpoint: the tag stage dominates wall clock and is
        # Arrow/IO-bound at high core counts, and context_window is the
        # fattest mentions column with exactly one consumer (NED).
        mentions = self._run_stage(
            "tokenize_tag", source,
            lambda: disambiguate(
                extract_mentions(source, mode=self.mode,
                                 tokenizer_mode=self.tokenizer_mode)
            ).drop("context_window"),
        )
        if last_stage == "tokenize_tag":
            return mentions

        links = self._run_stage(
            "link", mentions,
            # pre-NED checkpoints (written before this change) still
            # carry context_window and lack resolved_category — apply
            # NED on read so old outputs stay resumable
            lambda: link_mentions(
                mentions if "resolved_category" in mentions.columns
                else disambiguate(mentions).drop("context_window")
            ),
        )
        if last_stage == "link":
            return links

        # committed update deltas must never be dropped by a plain
        # resume (the documented recovery command after a crashed
        # update() is the same run() invocation): the derived stages
        # always cover base ∪ every committed delta
        applied = self._update_ids()
        full_links = self.all_links() if applied else links
        # ... and a committed derived stage must cover EXACTLY that
        # set: stale coverage (an update crashed between its link
        # commit and the derived marker drops, or compaction left a
        # mismatched sidecar) forces the recompute instead of silently
        # serving tables that miss or double-count a delta.  meta-less
        # legacy checkpoints are only trusted when no deltas exist.
        for stage in ("canonicalize", "materialize"):
            if self.force or not self._committed(stage):
                continue
            meta = self._sidecar_meta(self._path(stage))
            covered = (set(meta["applied_updates"])
                       if meta and "applied_updates" in meta else None)
            if (covered != set(applied)) if covered is not None else applied:
                self._drop_marker(stage)

        entities = self._run_stage(
            "canonicalize", full_links,
            lambda: canonicalize(full_links, max_iter=self.cc_max_iter,
                                 fuzzy=self.fuzzy_canon,
                                 fuzzy_threshold=self.fuzzy_threshold),
            meta={"applied_updates": applied},
        )
        if last_stage == "canonicalize":
            return entities

        mat_fresh = self.force or not self._committed("materialize")
        triples = self._run_stage(
            "materialize", full_links,
            lambda: materialize_triples(full_links, entities),
            partition_by=("pred",),
            meta={"applied_updates": applied},
        )
        self._log_truncation(full_links, entities)
        if mat_fresh:
            self._refresh_stats_if_present()
        return triples

    def _log_truncation(self, links: DataFrame, entities: DataFrame) -> None:
        # audit the MENTIONED_WITH entity cap (silent truncation would
        # read as complete co-occurrence evidence)
        from ner_spark.operators.materialize import truncation_stats

        self._log_event(
            "mentioned_with_truncation",
            truncation_stats(links, entities).count(),
        )

    # -- incremental maintenance ---------------------------------------------

    def _update_ids(self, stage: str = "link") -> list[str]:
        """Update ids with a COMMITTED ``stage`` delta under
        {out}/updates.  ``link`` (default) lists the deltas all_links
        folds in; the overlap guard lists ``tokenize_tag`` so even a
        half-finished (crashed) update's mentions are visible to it."""
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(f"{self.out}/updates")
        fs = root.getFileSystem(conf)
        if not fs.exists(root):
            return []
        return sorted(
            s.getPath().getName()
            for s in fs.listStatus(root)
            if s.isDirectory()
            and fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{self.out}/updates/{s.getPath().getName()}/{stage}/_SUCCESS"
            ))
        )

    def _overlap_clash(self, delta_source: DataFrame) -> DataFrame:
        """The append-only overlap guard's probe plan: ≤1 row iff some
        delta (repo, path) key already exists in the base or a prior
        delta's mention table.  Projects to the key columns BEFORE the
        union — the guard only needs (repo, path), a schema-drifted
        delta must not be papered over by allowMissingColumns here only
        to fail later in all_links/_prepare_compact (which union
        strictly), and the projection keeps the scan column-pruned.
        The delta key-set broadcasts (it is delta-sized), so the scan
        of the 100 TB mention table is one shuffle-free semi-join."""
        existing = self.spark.read.parquet(
            self._path("tokenize_tag")
        ).select("repo", "path")
        for prev in self._update_ids(stage="tokenize_tag"):
            existing = existing.unionByName(
                self.spark.read.parquet(
                    f"{self.out}/updates/{prev}/tokenize_tag"
                ).select("repo", "path"),
                allowMissingColumns=False,
            )
        delta_keys = delta_source.select("repo", "path").distinct()
        return (
            existing
            .join(F.broadcast(delta_keys), ["repo", "path"], "left_semi")
            .limit(1)
        )

    def is_applied(self, update_id: str) -> bool:
        """True iff ``update_id``'s delta is already fully folded into
        the committed derived tables — a re-invocation of :meth:`update`
        with this id (and the same documents) would be a pure no-op.
        Covers both completion forms: the id appears in the committed
        materialize sidecar's coverage, or a compaction already folded
        it into the base (ledger).  Used by the streaming ingest to
        count only REAL folds after a crash/replay."""
        if update_id in self._compacted_ids():
            return True
        if not (self._committed("canonicalize") and self._committed("materialize")):
            return False
        meta = self._sidecar_meta(self._path("materialize"))
        return bool(meta and update_id in meta.get("applied_updates", ()))

    def _delta_fingerprint(self, delta_source: DataFrame) -> list:
        """Order-independent fingerprint of a delta's full (repo, path)
        key-set: [distinct count, bit_xor of xxhash64(repo, path)].
        Covers zero-mention documents (which the mention checkpoint
        does not), never overflows, and is layout-invariant."""
        row = (
            delta_source.select("repo", "path").distinct()
            .agg(F.count("*").alias("n"),
                 F.expr("bit_xor(xxhash64(repo, path))").alias("h"))
            .collect()[0]
        )
        return [int(row["n"]), int(row["h"] or 0)]

    def _read_links(self, path: str) -> DataFrame:
        """Read a link checkpoint, upgrading pre-NED outputs on the fly
        (they carry context_window and lack resolved_category)."""
        df = self.spark.read.parquet(path)
        if "resolved_category" not in df.columns:
            from ner_spark.operators.link import disambiguate

            df = disambiguate(df).drop("context_window")
        return df

    def _read_mentions(self, path: str) -> DataFrame:
        """Read a tokenize_tag checkpoint with the same legacy upgrade
        as :meth:`_read_links` (mention tables share the pre-NED
        column drift)."""
        return self._read_links(path)

    def _compacted_ids(self) -> set[str]:
        """Update ids folded into the base by past compactions (from
        the per-compaction ledger subdirs under {out}/compacted)."""
        root = f"{self.out}/compacted"
        if not self._exists(root):
            return set()
        return {
            r["update_id"]
            for r in self.spark.read.parquet(f"{root}/*")
            .select("update_id").distinct().collect()
        }

    def all_links(self, exclude: str | None = None) -> DataFrame:
        """The canonical link table: base run ∪ every committed update
        delta.  This is what canonicalize/materialize derive from once
        updates exist.  ``exclude`` drops one delta — the incremental
        paths use it to split "previous corpus" from "this delta"."""
        links = self._read_links(self._path("link"))
        for uid in self._update_ids():
            if uid == exclude:
                continue
            links = links.unionByName(
                self._read_links(f"{self.out}/updates/{uid}/link"),
                allowMissingColumns=False,
            )
        return links

    def update(
        self,
        delta_source: DataFrame,
        update_id: str | None = None,
        check_overlap: bool = True,
        merge_materialize: bool = True,
        incremental: bool = True,
        differential_threshold: float = 0.5,
    ) -> DataFrame:
        """Incremental maintenance: fold a NEW batch of documents into a
        completed run without re-tagging the existing corpus.

        The expensive stages (tokenize_tag, link — linear in corpus
        size) run over the DELTA ONLY and commit their checkpoints
        under ``{out}/updates/{update_id}/`` (the base checkpoints are
        immutable, so a crashed update resumes idempotently).
        ``update(delta)`` after ``run(base)`` produces exactly the
        triples of a fresh ``run(base ∪ delta)`` (pinned by
        tests/test_job_update.py).

        ``incremental=True`` (default) also makes the derived stages
        delta-proportional: canonicalization folds the delta's edges
        into the committed entity table via
        :func:`~ner_spark.operators.canonicalize.canonicalize_increment`
        (exact — appended documents only add edges, so contracting old
        components preserves connected components), committing the
        per-surface reassignment table under
        ``{out}/updates/{id}/canon_changes`` BEFORE the entity table is
        overwritten, so every crash window resumes.  With
        ``incremental=False`` canonicalize recomputes over base ∪
        deltas (the always-safe global path).

        ``merge_materialize=True`` (default) then picks the cheapest
        correct materialize:

        - no surface changed assignment → the delta's triples merge
          into the committed table by summing evidence counts
          (``materialize_merge`` metrics row);
        - some surfaces were reassigned (components merged / gained a
          smaller canonical surface) → a DIFFERENTIAL rewrite: triples
          of documents touching a reassigned surface are recomputed
          under both old and new assignments and the committed table is
          patched as old + new_affected − old_affected + delta, summed
          per (subj, pred, obj) — exact because all four triple
          branches are per-document additive (``materialize_differential``
          metrics row);
        - coverage mismatch / legacy checkpoints → full recompute.

        ``differential_threshold`` is the cost guard for the second
        path: the patch scans the affected links twice (old + new
        assignments) plus the delta, so it only wins when
        ``2·affected + delta < threshold · (previous + delta)`` link
        rows; above that the full recompute is taken (measured
        crossover in BENCH/UPDATE.md — at small corpora the patch's
        fixed overhead dominates, at 100 TB a small blast radius makes
        it the only affordable option).

        The sidecar meta of each derived checkpoint records which
        deltas it covers (written before the data commit, so a crash
        can never leave committed data with stale coverage); any
        mismatch falls back to the full recompute, which is always
        safe.

        A re-invocation of an update id that :meth:`compact` already
        folded into the base is detected via the compaction ledger:
        with no novel documents it is the same completed-update no-op
        (served through ``run()``, which also repairs any derived
        stage the compaction uncommitted); with novel documents it
        fails loudly — reusing a folded id for new data is ambiguous.

        Delta documents must be NEW ``(repo, path)`` keys — parquet
        checkpoints cannot delete superseded rows, so replacing an
        existing document's content needs an Iceberg/Delta MERGE at
        deploy time.  ``check_overlap`` guards this with one
        column-pruned scan of the mention table (broadcast semi-join
        against the delta keys); documents whose OLD version produced
        zero mentions are invisible to the guard, and harmlessly so —
        they contributed nothing the new version could double-count.
        """
        self._check_manifest()
        self._maybe_finish_compact()
        if self._is_imported():
            raise ValueError(
                f"{self.out} holds an IMPORTED graph (import_ntriples)"
                " — there are no document stages to fold a delta into;"
                " use sparql_update() for edits, or build from"
                " documents with run()")
        if not (self._committed("tokenize_tag") and self._committed("link")):
            raise ValueError(
                f"update() needs a completed base run in {self.out}; "
                "run() first"
            )
        from ner_spark.operators.canonicalize import (
            canonicalize,
            canonicalize_increment,
        )
        from ner_spark.operators.link import disambiguate, link_mentions
        from ner_spark.operators.materialize import materialize_triples
        from ner_spark.operators.tag import extract_mentions

        uid = update_id or self.run_id
        uroot = f"{self.out}/updates/{uid}"
        resumed = self._exists(f"{uroot}/tokenize_tag/_SUCCESS")

        # a resumed id must carry the SAME documents as the committed
        # attempt — otherwise serving the old checkpoint silently drops
        # the new data (the ops mistake this guards: a recreated
        # streaming checkpoint restarts batch_id at 0 and reuses
        # 'stream-00000000' for brand-new files).  The committed mention
        # table cannot back this check (zero-mention documents are
        # invisible there), so the first attempt fingerprints the full
        # delta key-set into the stage sidecar and every resume
        # recomputes + compares it.  One delta-sized scan per update.
        delta_fp = self._delta_fingerprint(delta_source)
        if resumed:
            tmeta = self._sidecar_meta(f"{uroot}/tokenize_tag")
            want = tmeta.get("delta_fingerprint") if tmeta else None
            if want is not None and list(want) != delta_fp:
                raise ValueError(
                    f"update id {uid!r} already committed a different "
                    "document set (delta fingerprint "
                    f"{want} != {delta_fp}).  Reusing an update id for "
                    "new data is ambiguous (a recreated streaming "
                    "checkpoint does this); pass a fresh update_id"
                )

        if not resumed and uid in self._compacted_ids():
            # this id's delta was folded into the base by a compaction.
            # A RETRY of the same completed update (every delta doc
            # already in the base) stays the documented no-op — run()
            # serves or repairs the committed derived state; a NEW
            # delta reusing the id is ambiguous and fails loudly
            # instead of tripping the overlap guard's misleading
            # check_overlap=False advice.
            base_keys = self.spark.read.parquet(
                self._path("tokenize_tag")
            ).select("repo", "path")
            novel = (
                delta_source.select("repo", "path").distinct()
                .join(base_keys, ["repo", "path"], "left_anti")
                .limit(1)
                .count()
            )
            if novel:
                raise ValueError(
                    f"update id {uid!r} was already folded into the base "
                    "by a compaction, but this delta contains documents "
                    "the base does not — reusing a folded update id is "
                    "ambiguous; pass a fresh update_id"
                )
            return self.run(delta_source)

        if check_overlap and not resumed:
            if self._overlap_clash(delta_source).count():
                raise ValueError(
                    "delta contains (repo, path) keys already present in "
                    f"{self.out}; incremental update is append-only — "
                    "replacing documents needs a MERGE-capable table "
                    "format (pass check_overlap=False to override)"
                )

        if "content_sha256" in delta_source.columns and not resumed:
            self._log_source_integrity(delta_source)

        mentions = self._run_stage(
            "tokenize_tag", delta_source,
            lambda: disambiguate(
                extract_mentions(delta_source, mode=self.mode,
                                 tokenizer_mode=self.tokenizer_mode)
            ).drop("context_window"),
            path=f"{uroot}/tokenize_tag",
            meta={"delta_fingerprint": delta_fp},
        )
        self._run_stage(
            "link", mentions, lambda: link_mentions(mentions),
            path=f"{uroot}/link",
        )

        others = set(self._update_ids()) - {uid}
        mat_committed = self._committed("materialize")
        canon_committed = self._committed("canonicalize")
        meta = self._sidecar_meta(self._path("materialize"))
        applied = (set(meta.get("applied_updates", []))
                   if meta and "applied_updates" in meta else None)
        canon_meta = self._sidecar_meta(self._path("canonicalize"))
        canon_applied = (set(canon_meta.get("applied_updates", []))
                         if canon_meta and "applied_updates" in canon_meta
                         else None)

        # a completed re-invocation of this update id is a no-op: its
        # links are already folded into the committed triples
        if (mat_committed and canon_committed and applied is not None
                and uid in applied):
            return self._read_committed(self._path("materialize"),
                                        partitioned=True)

        # the sidecar metas prove what each committed table covers —
        # legacy checkpoints without meta fall back to full recomputes,
        # which write the new-format sidecars
        canon_covers_all = (canon_committed
                            and canon_applied == others | {uid})
        can_incr = (incremental and canon_committed
                    and canon_applied == others)
        triples_cover_prev = (merge_materialize and mat_committed
                              and applied is not None and applied == others)

        old_entities = old_triples = None
        if canon_committed and not canon_covers_all and (
                can_incr or triples_cover_prev):
            # pin the previous table BEFORE its checkpoint is
            # overwritten (a table cannot read itself while being
            # overwritten).  MUST be localCheckpoint, not persist():
            # overwriting a path triggers Spark's recacheByPath, which
            # silently REFRESHES a persisted plan that still reads that
            # path — a stability check would then compare the new
            # entities against themselves and always merge.
            # localCheckpoint truncates the plan to materialized RDD
            # blocks, immune to the refresh; the blocks are released by
            # the ContextCleaner once these references drop at method
            # exit (an Iceberg/Delta snapshot read replaces the pin
            # entirely at deploy time).
            old_entities = self._read_committed(
                self._path("canonicalize")
            ).localCheckpoint(eager=True)
        if triples_cover_prev:
            old_triples = self._read_committed(
                self._path("materialize"), partitioned=True
            ).localCheckpoint(eager=True)

        delta_links = self._read_links(f"{uroot}/link")
        changes = changes_cov = None
        try:
            if canon_covers_all:
                # crash-window resume: this update's canonicalize already
                # committed; its reassignment table (committed first)
                # carries what a differential materialize needs
                entities = self._read_committed(self._path("canonicalize"))
                if self._exists(f"{uroot}/canon_changes/_SUCCESS"):
                    changes = self.spark.read.parquet(f"{uroot}/canon_changes")
                    cmeta = self._sidecar_meta(f"{uroot}/canon_changes")
                    changes_cov = (set(cmeta["base_coverage"])
                                   if cmeta and "base_coverage" in cmeta
                                   else None)
            elif can_incr:
                # a canon_changes table from an earlier crashed attempt
                # is only reusable if it was computed against the same
                # previous-corpus coverage
                cpath = f"{uroot}/canon_changes"
                if self._exists(cpath + "/_SUCCESS"):
                    cmeta = self._sidecar_meta(cpath)
                    if (not cmeta
                            or cmeta.get("base_coverage") != sorted(others)):
                        self._delete(cpath)
                prev_links = self.all_links(exclude=uid)
                new_ents, chg = canonicalize_increment(
                    old_entities, delta_links, prev_links,
                    fuzzy=self.fuzzy_canon,
                    fuzzy_threshold=self.fuzzy_threshold,
                    max_iter=self.cc_max_iter,
                )
                changes = self._run_stage(
                    "canon_changes", delta_links, lambda: chg, path=cpath,
                    meta={"base_coverage": sorted(others)},
                )
                changes_cov = others
                self._drop_marker("canonicalize")
                entities = self._run_stage(
                    "canonicalize", delta_links, lambda: new_ents,
                    meta={"applied_updates": sorted(others | {uid})},
                )
                self._log_event("canonicalize_increment", changes.count())
            else:
                links = self.all_links()
                self._drop_marker("canonicalize")
                entities = self._run_stage(
                    "canonicalize", links,
                    lambda: canonicalize(links, max_iter=self.cc_max_iter,
                                         fuzzy=self.fuzzy_canon,
                                         fuzzy_threshold=self.fuzzy_threshold),
                    meta={"applied_updates": sorted(self._update_ids())},
                )

            self._drop_marker("materialize")

            # all four triple branches are ADDITIVE over documents when
            # no existing surface changed entity: delta docs are new
            # (repo, path) keys, so old evidence counts merge with delta
            # counts by summing on (subj, pred, obj).  A delta CAN
            # reassign existing surfaces (a new KB edge merging two
            # components, or a new component-minimum surface) — then the
            # differential path patches exactly the affected documents.
            usable_changes = (changes is not None and changes_cov is not None
                              and applied is not None
                              and changes_cov == applied)
            stable = None
            if usable_changes:
                stable = changes.isEmpty()
            elif (triples_cover_prev and old_entities is not None
                  and not canon_covers_all):
                # entities were fully recomputed this invocation:
                # detect stability against the pinned old table
                stable = (
                    old_entities.alias("o")
                    .join(entities.alias("n"), "surface")
                    .where(F.col("o.entity_id") != F.col("n.entity_id"))
                    .limit(1)
                    .count()
                ) == 0

            if triples_cover_prev and stable is True:
                new_applied = sorted(applied | {uid})

                def compute_merged() -> DataFrame:
                    delta_triples = materialize_triples(delta_links, entities)
                    return (
                        old_triples.unionByName(delta_triples)
                        .groupBy("subj", "pred", "obj")
                        .agg(F.sum("evidence_count").alias("evidence_count"))
                        .select("subj", "pred", "obj", "evidence_count")
                    )

                triples = self._run_stage(
                    "materialize", delta_links, compute_merged,
                    partition_by=("pred",),
                    meta={"applied_updates": new_applied},
                )
                self._log_event("materialize_merge", len(new_applied))
                # stability means no base doc changed entity sets, so
                # the base truncation audit (already logged by the
                # previous run/update) still holds — audit the DELTA
                # docs only, keeping the fast path delta-proportional
                self._log_truncation(delta_links, entities)
            else:
                triples = None
                if triples_cover_prev and usable_changes:
                    # returns None when the cost guard picks the full
                    # recompute instead
                    triples = self._differential_materialize(
                        uid, delta_links, entities, changes, old_triples,
                        sorted(applied | {uid}), differential_threshold,
                    )
                if triples is None:
                    links = self.all_links()
                    triples = self._run_stage(
                        "materialize", links,
                        lambda: materialize_triples(links, entities),
                        partition_by=("pred",),
                        meta={"applied_updates": sorted(self._update_ids())},
                    )
                    self._log_truncation(links, entities)
        finally:
            # drop the pin references so the ContextCleaner can release
            # the checkpointed blocks — repeated updates in one session
            # must not accumulate copies of the old tables
            old_entities = old_triples = None  # noqa: F841
        self._refresh_stats_if_present()
        return triples

    def _differential_materialize(
        self,
        uid: str,
        delta_links: DataFrame,
        entities: DataFrame,
        changes: DataFrame,
        old_triples: DataFrame,
        new_applied: list[str],
        threshold: float,
    ) -> DataFrame | None:
        """Patch the committed triple table after entity reassignment.

        Only documents mentioning a reassigned surface can change
        triples (each doc's contribution depends solely on its own link
        rows and their entity assignments), so the committed table is
        corrected as ``old + new_affected − old_affected + delta``,
        summed per (subj, pred, obj) — per-document additivity of all
        four predicate branches makes the subtraction exact.  Cost is
        proportional to the reassignment's blast radius, not the
        corpus: the previous-link scans prune by the changed-surface
        and affected-doc sets (partition/bloom metadata at deploy
        scale), and the entity dimension is semi-joined down to the
        surfaces actually touched before the three materialize calls.

        Returns ``None`` (caller recomputes fully) when the blast
        radius fails the cost guard: the patch reads the affected rows
        twice, so past ``2·affected + delta > threshold·(prev + delta)``
        link rows it scans more than the recompute it replaces.
        """
        from ner_spark.operators.materialize import materialize_triples

        prev = self.all_links(exclude=uid)
        affected_docs = (
            prev.join(changes.select("surface"), "surface", "left_semi")
            .select("repo", "path")
            .distinct()
            .localCheckpoint(eager=True)
        )
        affected = prev.join(affected_docs, ["repo", "path"], "left_semi")

        n_prev, n_aff, n_delta = prev.count(), affected.count(), delta_links.count()
        if 2 * n_aff + n_delta > threshold * (n_prev + n_delta):
            self._log_event("differential_guard_full", n_aff)
            return None
        # guard passed ⇒ affected is a bounded fraction of the corpus:
        # pin it so the pos/neg branches and the truncation audit don't
        # each re-scan base ∪ deltas to rebuild the semi-join
        affected = affected.localCheckpoint(eager=True)
        aff_surf = affected.select("surface").distinct()
        ent_new = entities.join(aff_surf, "surface", "left_semi")
        # old assignments of exactly the affected surfaces: the new
        # table overridden by the persisted reassignment rows
        ent_old = (
            ent_new.alias("e")
            .join(changes.select("surface", "old_entity_id"), "surface", "left")
            .select(
                "surface",
                F.coalesce("old_entity_id", F.col("e.entity_id")).alias("entity_id"),
            )
        )
        ent_delta = entities.join(
            delta_links.select("surface").distinct(), "surface", "left_semi"
        )

        def compute() -> DataFrame:
            pos = materialize_triples(affected, ent_new)
            neg = materialize_triples(affected, ent_old).withColumn(
                "evidence_count", -F.col("evidence_count")
            )
            delta_triples = materialize_triples(delta_links, ent_delta)
            patched = (
                old_triples.unionByName(pos)
                .unionByName(neg)
                .unionByName(delta_triples)
                .groupBy("subj", "pred", "obj")
                .agg(F.sum("evidence_count").alias("evidence_count"))
                .where(F.col("evidence_count") != 0)
                .select("subj", "pred", "obj", "evidence_count")
                .localCheckpoint(eager=True)
            )
            # additivity invariant, checked BEFORE the stage commits: a
            # negative sum means the checkpoint state was inconsistent
            # with the reassignment table — raising here means _run_stage
            # never writes the table, so no crash window can leave a
            # known-corrupt committed checkpoint behind
            if not patched.where(F.col("evidence_count") < 0).isEmpty():
                raise RuntimeError(
                    "differential materialize produced negative evidence "
                    "counts; checkpoint state is inconsistent — re-run with "
                    "force=True/--force for a full recompute"
                )
            return patched

        triples = self._run_stage(
            "materialize", delta_links, compute, partition_by=("pred",),
            meta={"applied_updates": new_applied},
        )
        self._log_event("materialize_differential", affected_docs.count())
        self._log_truncation(affected.unionByName(delta_links), entities)
        return triples

    # -- delta compaction ------------------------------------------------------

    def compact(self) -> int:
        """Fold every COMPLETED update delta back into the base
        tokenize_tag / link checkpoints, bounding the union fan-in.

        Each :meth:`update` leaves its stage-1/2 tables under
        ``{out}/updates/{id}/``; :meth:`all_links` and the overlap
        guard union base + N deltas, so after a long stream of updates
        (a daily-crawl pipeline) every derived recompute, resume, and
        guard scan pays N+1 table reads and the listing metadata grows
        unboundedly.  ``compact()`` is the LSM-style major compaction
        bounding that: it rewrites base ∪ deltas as the new base and
        deletes the folded ``updates/`` dirs.  Output-identical — the
        union is exactly what every reader already computed.

        Cost is one full rewrite of the mention and link tables (the
        point: paid once per compaction cadence instead of amortized
        into every subsequent operation), so schedule it like any
        major compaction — when ``len(_update_ids())`` or the delta:
        base size ratio crosses a threshold.

        Crash-safe with the same single-driver resume model as the
        stages: phase 1 PREPARES the folded tables under
        ``{out}/_compact/`` (base untouched; a crash discards the tmp
        dir), writing a ``_COMMIT`` table (folded ids + the planned
        derived-sidecar rewrites) as the commit point; phase 2 INSTALLS
        by sidecar rewrite + atomic renames + delta deletion, every
        step idempotent, rolled forward by the next ``compact()`` /
        ``run()`` / ``update()`` if interrupted (``_COMMIT`` present ⇒
        install completes before anything reads the tables).

        Committed derived stages whose sidecar coverage equals the
        folded set get their coverage rewritten to ``[]`` (they now
        cover exactly the new base), so a follow-up ``update()`` still
        takes the incremental paths.  Coverage that mismatches the
        folded set gets its stage UNCOMMITTED instead — stale coverage
        would name deleted update ids, which a later update reusing
        such an id could falsely match — and the next run/update
        recomputes it.  Folded ids are recorded in a per-compaction
        ledger (``{out}/compacted/``) so a retried ``update(id)`` of a
        folded delta stays the documented no-op.

        Half-finished updates (tagged but not linked — a crashed
        ``update()``) are NOT folded; their dirs survive untouched and
        their resume semantics are unchanged.

        Returns the number of deltas folded (0 = nothing to do).
        """
        self._maybe_finish_compact()
        folded = self._update_ids()
        if not folded:
            return 0
        if not (self._committed("tokenize_tag") and self._committed("link")):
            raise ValueError(
                f"compact() needs a completed base run in {self.out}"
            )
        self._prepare_compact(folded)
        self._install_compact()
        self._log_event("compact", len(folded))
        return len(folded)

    def _compact_commit_path(self) -> str:
        return f"{self.out}/_compact/_COMMIT"

    def _maybe_finish_compact(self) -> None:
        """Roll a crashed compaction forward (committed ⇒ install) or
        back (uncommitted ⇒ discard tmp).  Runs before any read path."""
        tmp = f"{self.out}/_compact"
        if self._exists(self._compact_commit_path() + "/_SUCCESS"):
            self._install_compact()
        elif self._exists(tmp):
            self._delete(tmp)

    def _prepare_compact(self, folded: list[str]) -> None:
        """Phase 1: write the folded tables + the _COMMIT record under
        ``{out}/_compact/`` without touching the base."""
        import json

        tmp = f"{self.out}/_compact"
        if self._exists(tmp):
            self._delete(tmp)

        mentions = self._read_mentions(self._path("tokenize_tag"))
        for uid in folded:
            mentions = mentions.unionByName(
                self._read_mentions(f"{self.out}/updates/{uid}/tokenize_tag"),
                allowMissingColumns=False,
            )
        mentions.write.mode("overwrite").parquet(f"{tmp}/tokenize_tag")

        links = self._read_links(self._path("link"))
        for uid in folded:
            links = links.unionByName(
                self._read_links(f"{self.out}/updates/{uid}/link"),
                allowMissingColumns=False,
            )
        links.write.mode("overwrite").parquet(f"{tmp}/link")

        # derived stages covering exactly the folded set get their
        # coverage rewritten to [] at install; committed stages whose
        # coverage MISMATCHES the folded set are uncommitted instead —
        # their stale coverage would otherwise name deleted update ids,
        # and a later update reusing such an id would falsely match it
        # (serving pre-compaction triples).  The planned rewrites live
        # in the _COMMIT record so a crashed install can replay them
        # without re-reading a half-rewritten sidecar.
        sidecars, uncommit = [], []
        for stage in ("canonicalize", "materialize"):
            if not self._committed(stage):
                continue
            meta = self._sidecar_meta(self._path(stage))
            if meta is None or set(meta.get("applied_updates", ())) != set(folded):
                uncommit.append(stage)
                continue
            row = self.spark.read.parquet(self._path(stage) + "_schema").first()
            sidecars.append(
                [stage, row["schema_json"],
                 json.dumps({**meta, "applied_updates": []})]
            )
        self.spark.createDataFrame(
            [(json.dumps(folded), json.dumps(sidecars), json.dumps(uncommit))],
            "folded_json string, sidecars_json string, uncommit_json string",
        ).write.mode("overwrite").parquet(self._compact_commit_path())

    def _install_compact(self) -> None:
        """Phase 2 (idempotent): sidecar rewrites → atomic renames →
        delta deletion → tmp cleanup, in an order where every crash
        window resumes by re-running this method."""
        import json

        tmp = f"{self.out}/_compact"
        row = self.spark.read.parquet(self._compact_commit_path()).first()
        folded = json.loads(row["folded_json"])
        try:
            uncommit = json.loads(row["uncommit_json"])
        except (KeyError, ValueError, TypeError):
            uncommit = []
        for stage in uncommit:
            self._drop_marker(stage)
        for stage, schema_json, meta_json in json.loads(row["sidecars_json"]):
            self.spark.createDataFrame(
                [(schema_json, meta_json)],
                "schema_json string, meta_json string",
            ).write.mode("overwrite").parquet(self._path(stage) + "_schema")
        for stage in ("tokenize_tag", "link"):
            src = f"{tmp}/{stage}"
            # a missing tmp table means this rename already happened
            if self._exists(src + "/_SUCCESS"):
                if self._exists(self._path(stage)):
                    self._delete(self._path(stage))
                self._rename(src, self._path(stage))
        # folded-id ledger: a later update() reusing one of these ids
        # must be recognized as already-folded, not as a key clash.
        # One subdir per compaction (keyed by its first folded id, which
        # can never repeat — folded dirs are deleted) keeps the write
        # an idempotent overwrite under roll-forward, never an append.
        self.spark.createDataFrame(
            [(u,) for u in folded], "update_id string"
        ).write.mode("overwrite").parquet(
            f"{self.out}/compacted/{folded[0]}"
        )
        for uid in folded:
            self._delete(f"{self.out}/updates/{uid}")
        self._delete(tmp)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.out}/metrics")

    # -- Iceberg publication -----------------------------------------------

    def analytics(self, pagerank_iterations: int = 3) -> dict[str, int]:
        """Materialize the graph-analytics layer over the committed
        triple table: per-node degree/evidence stats, undirected
        connected components with sizes, fixed-iteration PageRank,
        co-mention PMI with per-node top-k related entities, triangle
        counts, label-propagation communities, and hop distance from
        the ``repo:`` vertices (:mod:`ner_spark.plans.kg_analytics`).

        These are *derived views* of the materialize checkpoint, so
        unlike the pipeline stages they carry no resume marker — every
        invocation recomputes them from the current triples (an update
        or compaction between invocations would otherwise leave them
        silently stale).  Each table installs crash-safely: written to
        ``<dst>.tmp`` first, then renamed over the previous version, so
        a killed run leaves either the old table or the new one, never
        a torn directory.

        Returns {table_name: row_count}; one lineage row per table
        lands in the metrics table (stage ``analytics_<name>``).
        """
        from ner_spark.plans.kg_analytics import (
            bfs_distances,
            comention_pmi,
            entity_degree,
            graph_components,
            hits,
            label_propagation,
            link_prediction,
            pagerank,
            related_topk,
            triangles,
        )

        triples = self.triples()
        tables = {
            "entity_degree": lambda: entity_degree(triples),
            "components": lambda: graph_components(triples),
            "pagerank": lambda: pagerank(
                triples, iterations=pagerank_iterations),
            "comention_pmi": lambda: comention_pmi(triples),
            "related_topk": lambda: related_topk(triples),
            "triangles": lambda: triangles(triples),
            "communities": lambda: label_propagation(triples),
            "repo_distances": lambda: bfs_distances(triples),
            "hits": lambda: hits(triples),
            "link_prediction": lambda: link_prediction(triples),
        }
        counts: dict[str, int] = {}
        for name, compute in tables.items():
            dst = f"{self.out}/analytics/{name}"
            tmp = dst + ".tmp"
            if self._exists(tmp):
                self._delete(tmp)
            compute().write.mode("overwrite").parquet(tmp)
            n = self.spark.read.parquet(tmp).count()
            if self._exists(dst):
                self._delete(dst)
            self._rename(tmp, dst)
            counts[name] = n
            self._log_event(f"analytics_{name}", n)
        return counts

    def entailment(self, onto: "DataFrame" = None,
                   shapes_df: "DataFrame" = None,
                   incremental: bool = True) -> dict[str, int]:
        """Materialize the RDFS-lite closure of the committed triple
        table plus its SHACL-lite validation report as derived views
        (:mod:`ner_spark.plans.kg_infer` /
        :mod:`ner_spark.plans.kg_validate`):

        - ``<out>/entailment/triples``    — (subj, pred, obj, inferred)
        - ``<out>/entailment/violations`` — (shape_id, focus,
          constraint, value); empty = the entailed graph conforms

        ``onto`` / ``shapes_df`` default to the committed demo
        ontology and shapes; production passes its own relations, or
        (``onto`` only) a PATH to an N-Triples schema file — adopted
        through the interchange parser, so any RDF tooling's export
        works.  The ontology used persists as a third view
        (``entailment/ontology``) so :meth:`entailed_triples`'s
        staleness fallback recomputes with the SAME schema the views
        were built from, never silently reverting to the demo one.
        Like :meth:`analytics` these carry no resume marker — always
        recomputed from the current triples when invoked — and install
        as ONE atomic generation: all three views plus the state token
        are written under ``entailment.tmp`` and swapped in by a
        single directory rename, so no crash window can pair an old
        closure with a new ontology view.  A state token (materialize
        sidecar meta + folded edit ids + triple count) is committed
        alongside so :meth:`entailed_triples` can detect that an
        update/compact/edit landed AFTER the views and fall back to
        on-the-fly computation instead of serving a stale closure.
        Returns {view: row_count} and logs one lineage row per view.

        ``incremental=True`` (default) folds a PURELY-ADDITIVE change
        into the previously committed closure via
        :func:`~ner_spark.plans.kg_infer.entail_increment` — the
        delta (new base triples since the views were built) seeds a
        semi-naive loop against the broadcast schema, so the
        committed closure is never re-derived; any RETRACTION (a
        delete edit, a force re-run) or an ontology change falls back
        to the full recompute automatically (RDFS is monotone, so
        only additions are incrementally foldable — the same
        additive-vs-full decision the materialize maintenance path
        makes).  Either path writes identical views
        (``tests/test_job_entail.py`` pins equality).
        """
        from ner_spark.plans.kg_infer import (entail, entail_increment,
                                              ontology)
        from ner_spark.plans.kg_validate import shapes, validate

        if isinstance(onto, str):
            # a path: an N-Triples file/directory of schema triples
            # (subClassOf / subPropertyOf / domain / range), adopted
            # through the interchange parser — bring-your-own ontology
            from ner_spark.plans.kg_export import ntriples_parse

            onto = ntriples_parse(
                self.spark.read.text(onto), strict=False
            ).select("subj", "pred", "obj")
        if onto is None:
            onto = ontology(self.spark)
        if shapes_df is None:
            shapes_df = shapes(self.spark)
        token = self._kg_state_token()
        ent = None
        if incremental:
            ent = self._entail_incremental(onto)
        if ent is None:
            ent = entail(self.triples(), onto)
        ent = ent.localCheckpoint(eager=True)
        tables = {
            # the ontology persists FIRST so the staleness fallback in
            # entailed_triples always recomputes with the same schema
            # the views were built from (a custom --entail-ontology
            # must not silently fall back to the demo one)
            "ontology": lambda: onto.select("subj", "pred", "obj"),
            "triples": lambda: ent,
            "violations": lambda: validate(ent, shapes_df),
        }
        # ONE directory-level install for all three views + the state
        # token: per-view renames left a crash window where a NEW
        # ontology view sat next to OLD triples while the previous
        # token still matched the (unchanged) triple state — a later
        # incremental entailment would then validate against the new
        # ontology view but fold onto the old-ontology closure.  With
        # the whole generation swapped atomically the committed views
        # are always mutually consistent; the only crash windows are
        # "old generation intact" (token matches it) and "no views at
        # all" (entailed_triples falls back on the fly) — never a
        # mixed answer.
        root = f"{self.out}/entailment"
        tmp = root + ".tmp"
        if self._exists(tmp):
            self._delete(tmp)
        counts: dict[str, int] = {}
        for name, compute in tables.items():
            compute().write.mode("overwrite").parquet(f"{tmp}/{name}")
            counts[name] = self.spark.read.parquet(f"{tmp}/{name}").count()
        self.spark.createDataFrame(
            [(token,)], "state_json string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/state")
        if self._exists(root):
            self._delete(root)
        self._rename(tmp, root)  # commit point for the generation
        for name in tables:
            self._log_event(f"entailment_{name}", counts[name])
        return counts

    def _entail_incremental(self, onto: "DataFrame"):
        """The additive fast path for :meth:`entailment`: returns the
        new full entailed relation (same contract as ``entail()``) or
        None when the increment does not apply — no committed views,
        a different ontology, or a non-additive change (a retraction
        means derived triples may need to go away, which only the
        full monotone recompute handles)."""
        from ner_spark.plans.kg_infer import entail_increment

        path = f"{self.out}/entailment/triples"
        opath = f"{self.out}/entailment/ontology"
        if not (self._exists(path) and self._exists(opath)):
            return None
        old_onto = {tuple(r) for r in
                    self.spark.read.parquet(opath).collect()}
        new_onto = {tuple(r) for r in
                    onto.select("subj", "pred", "obj").collect()}
        if old_onto != new_onto:
            return None
        F_ = F
        old = self.spark.read.parquet(path)
        old_closure = old.select("subj", "pred", "obj")                          .localCheckpoint(eager=True)
        old_base = old.where(~F_.col("inferred"))                       .select("subj", "pred", "obj")
        cur_base = self.triples().select("subj", "pred", "obj")             .unionByName(onto.select("subj", "pred", "obj")).distinct()             .localCheckpoint(eager=True)
        removed = old_base.join(cur_base, ["subj", "pred", "obj"],
                                "left_anti")
        if removed.limit(1).count() > 0:
            return None  # retraction: full recompute
        delta = cur_base.join(old_base, ["subj", "pred", "obj"],
                              "left_anti").localCheckpoint(eager=True)
        if delta.limit(1).count() == 0:
            new_full = old_closure
        else:
            inc = entail_increment(old_closure, delta, onto)
            new_full = old_closure.unionByName(
                inc.select("subj", "pred", "obj"))
        marked = new_full.join(
            cur_base.withColumn("__base", F_.lit(True)),
            ["subj", "pred", "obj"], "left")
        return marked.select(
            "subj", "pred", "obj",
            (~F_.coalesce(F_.col("__base"), F_.lit(False)))
            .alias("inferred"))

    def _kg_state_token(self) -> str:
        """A value identifying the current committed triple state:
        the materialize sidecar meta (update coverage), the folded
        edit ids, and the folded triple count.  Cheap to compute (one
        metadata read + one count over the pred-partitioned
        checkpoint) and changes whenever update/compact/edits/force
        change what :meth:`triples` returns."""
        import json

        meta = self._sidecar_meta(self._path("materialize"))
        return json.dumps(
            {"meta": meta, "edits": list(self.edit_ids()),
             "n": self.triples().count()},
            sort_keys=True)

    def rules_view(self, rules: list) -> dict[str, int]:
        """Materialize the fixpoint of CONSTRUCT rules over the
        committed triple table as a derived view
        ``<out>/rules/triples`` — (subj, pred, obj, inferred), the
        same crash-safe install and always-recompute contract as
        :meth:`entailment` (:mod:`ner_spark.plans.kg_rules`)."""
        from ner_spark.plans.kg_rules import materialize_rules

        out = materialize_rules(self.triples(), rules)
        dst = f"{self.out}/rules/triples"
        tmp = dst + ".tmp"
        if self._exists(tmp):
            self._delete(tmp)
        out.write.mode("overwrite").parquet(tmp)
        n = self.spark.read.parquet(tmp).count()
        if self._exists(dst):
            self._delete(dst)
        self._rename(tmp, dst)
        self._log_event("rules_triples", n)
        return {"triples": n}

    def entailed_triples(self) -> "DataFrame":
        """The entailed graph as a (subj, pred, obj) relation for
        querying under the RDFS entailment regime: reads the
        materialized ``entailment/triples`` view when committed AND
        its state token still matches the current triple state
        (:meth:`_kg_state_token`); else computes the closure on the
        fly from the committed triples + the demo ontology."""
        path = f"{self.out}/entailment/triples"
        state = f"{self.out}/entailment/state"
        if self._exists(path) and self._exists(state):
            row = self.spark.read.parquet(state).first()
            if row is not None and row["state_json"] == self._kg_state_token():
                return self.spark.read.parquet(path).select(
                    "subj", "pred", "obj")
        from ner_spark.plans.kg_infer import entail, ontology

        opath = f"{self.out}/entailment/ontology"
        onto = (self.spark.read.parquet(opath)
                if self._exists(opath) else ontology(self.spark))
        return entail(self.triples(), onto).select(
            "subj", "pred", "obj")

    def query(
        self,
        pattern: list[tuple[str, str, str]],
        optional: list[tuple[str, str, str]] = (),
        filters: list = (),
        negation: list = (),
        values: tuple | None = None,
        path_max_hops: int | None = None,
        group_by: list[str] = (),
        aggregates: list = (),
        having: list = (),
        select: list[str] | None = None,
        distinct: bool = False,
        order_by: list = (),
        offset: int | None = None,
        limit: int | None = None,
        plan: str | None = "static",
    ) -> "DataFrame":
        """Basic-graph-pattern query over the committed triple table
        (:func:`ner_spark.plans.kg_query.match_pattern`) — the "now
        ask the KG something" surface of a finished run.  The solution
        modifiers (``group_by``/``aggregates``/``select``/``distinct``
        /``order_by``/``limit``) layer on via
        :func:`~ner_spark.plans.kg_query.solutions`, which degenerates
        to the plain binding set when none are given.

        Reads the partitioned materialize checkpoint, so an element
        with a constant predicate prunes the ``pred`` partitions
        before anything joins (the same PartitionFilters shape the
        stage_triples_pruned audit check pins) — including the edge
        scan under a property-path element (``P+``/``P*``), whose
        closure iterates over one pred partition only.  ``negation``
        groups anti-join (FILTER NOT EXISTS); see
        :func:`~ner_spark.plans.kg_query.match_pattern`.

        ``plan`` picks the BGP join order (``"static"`` / ``"stats"``
        / ``None``, see :func:`~ner_spark.plans.kg_query.
        match_pattern`); the committed table is exactly where
        ``"stats"``'s one costing scan is cheapest (pruned parquet,
        no recompute), so long patterns may want it.
        ``plan="catalog"`` plans from the PERSISTED per-predicate
        statistics (:meth:`stats` — built once, no per-query scan at
        all), the triple-store answer at 10^12 edges.
        """
        from ner_spark.plans.kg_query import solutions

        if plan == "catalog":
            plan = self.pattern_costs(pattern)

        return solutions(self.triples(), pattern, optional=optional,
                         filters=filters, negation=negation,
                         values=values,
                         path_max_hops=path_max_hops,
                         group_by=group_by, aggregates=aggregates,
                         having=having, select=select,
                         distinct=distinct, order_by=order_by,
                         offset=offset, limit=limit, plan=plan)

    def sparql(self, text: str,
               plan: str | None = "static",
               entailed: bool = False,
               provenance: bool = False) -> "DataFrame":
        """Run a SPARQL SELECT / ASK / CONSTRUCT string over the
        committed triple table — the text twin of :meth:`query`; see
        :mod:`ner_spark.plans.sparql` for the supported subset.  Same
        partitioned-checkpoint read, so constant predicates still
        prune ``pred`` partitions under the parsed plan.

        ``entailed=True`` queries under the RDFS entailment regime:
        the pattern matches against :meth:`entailed_triples` (the
        materialized closure view when committed — itself
        pred-partition-prunable once written — else computed on the
        fly), so ``?e INSTANCE_OF class:Agent`` finds the inferred
        members too.

        ``provenance=True`` queries the provenance QUADS
        (:meth:`quads`): GRAPH blocks bind/filter the origin of each
        triple (``base`` / ``edit:NNNNNN``); plain patterns match the
        union default graph as usual.

        ``plan="catalog"`` plans the query's top-level BGP from the
        persisted per-predicate statistics (:meth:`stats`) — the text
        parse yields the pattern, so the text surface gets the same
        scan-free planning as :meth:`query`.  Forms without a
        top-level BGP (DESCRIBE, UNION queries) fall back to the
        static rank; under ``entailed``/``provenance`` the statistics
        describe the base view, so estimates lean stale — order-only,
        never correctness (the fuzz-pinned invariance)."""
        from ner_spark.plans.sparql import parse_sparql
        from ner_spark.plans.sparql import sparql as run_sparql

        if entailed and provenance:
            raise ValueError(
                "entailed and provenance are mutually exclusive "
                "regimes (the closure view carries no provenance)")
        if plan == "catalog":
            pattern = parse_sparql(text).get("pattern")
            plan = self.pattern_costs(pattern) if pattern else "static"
        rel = (self.entailed_triples() if entailed
               else self.quads() if provenance
               else self.triples())
        return run_sparql(rel, text, plan=plan)

    def stats(self, refresh: bool = False) -> dict:
        """The per-predicate statistics catalog:
        ``{pred: (edges, distinct_subjects, distinct_objects)}``,
        persisted under ``{out}/stats`` — computed ONCE (one
        pred-partitioned aggregate over the committed table,
        HLL-sketched distincts) and read back as a handful of rows on
        every later call, so query planning never rescans the data.
        ``refresh=True`` recomputes; the maintenance entry points
        (run/update/edit submit/edit clear/import) also call
        :meth:`_refresh_stats_if_present` when they change the triple
        view, so an EXISTING catalog never plans on stale counts.
        Stale stats only degrade plan QUALITY, never results, so a
        torn refresh (no ``_SUCCESS``) simply recomputes on the next
        read."""
        path = f"{self.out}/stats"
        if refresh or not self._exists(path + "/_SUCCESS"):
            t = self.triples()
            (t.groupBy("pred").agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct("subj").alias("n_subj"),
                F.approx_count_distinct("obj").alias("n_obj"))
             .coalesce(1)
             .write.mode("overwrite").parquet(path))
        return {
            r["pred"]: (int(r["n"]), int(r["n_subj"]), int(r["n_obj"]))
            for r in self.spark.read.parquet(path).collect()
        }

    def _refresh_stats_if_present(self) -> None:
        """Re-materialize the statistics catalog after an operation
        that changed the triple view — but ONLY if a catalog already
        exists (its presence means someone opted into catalog
        planning; a pipeline that never calls :meth:`stats` pays
        nothing).  One small pred-partitioned aggregate per
        maintenance op, amortized against every later scan-free
        planning call."""
        if self._exists(f"{self.out}/stats/_SUCCESS"):
            self.stats(refresh=True)

    def pattern_costs(self, pattern) -> list:
        """Per-element cost estimates for a BGP from the persisted
        :meth:`stats` catalog (no data scan) — pass to
        :meth:`query`'s ``plan=`` for catalog-planned join order; see
        :func:`ner_spark.plans.kg_query.pattern_catalog_costs`."""
        from ner_spark.plans.kg_query import pattern_catalog_costs

        stats = self.stats()
        total = sum(n for n, _, _ in stats.values())
        return pattern_catalog_costs(pattern, stats, total)

    def export_ntriples(self, path: str, base: str | None = None,
                        evidence: bool = False,
                        single_file: bool = False) -> None:
        """Serialize the committed triple table (SPARQL-Update edits
        folded in, like every read) as N-Triples text under ``path``
        — the hand-the-graph-to-any-RDF-store surface; see
        :mod:`ner_spark.plans.kg_export` for the term-encoding
        contract.  A pure per-row projection over the partitioned
        checkpoint: no shuffle unless ``single_file`` asks for the
        sorted one-file form."""
        from ner_spark.plans.kg_export import (DEFAULT_BASE,
                                               ntriples_save)

        ntriples_save(self.triples(), path,
                      base=base if base is not None else DEFAULT_BASE,
                      evidence=evidence, single_file=single_file)

    def export_nquads(self, path: str, base: str | None = None,
                      evidence: bool = False,
                      single_file: bool = False) -> None:
        """Serialize the PROVENANCE QUADS (:meth:`quads`) as W3C
        N-Quads text under ``path`` — the named-graph interchange
        surface: each current triple exports with its origin graph
        (base / edit:NNNNNN) as the fourth term, loadable by any
        quad store.  Same scale shape as :meth:`export_ntriples`."""
        from ner_spark.plans.kg_export import DEFAULT_BASE, nquads_save

        nquads_save(self.quads(), path,
                    base=base if base is not None else DEFAULT_BASE,
                    evidence=evidence, single_file=single_file)

    def import_ntriples(self, source, base: str | None = None,
                        strict: bool = True) -> DataFrame:
        """Adopt an external N-Triples graph as this output's
        committed triple table — the inverse of
        :meth:`export_ntriples`, and the "bring your own graph" door
        into the whole query stack: after an import, :meth:`sparql` /
        :meth:`query` / :meth:`analytics` / :meth:`sparql_update` /
        :meth:`export_ntriples` all work exactly as over a built KG.

        ``source`` is a text path (a ``ntriples_save`` directory or
        any ``.nt`` file) or a one-string-column DataFrame.  Parsing
        is :func:`ner_spark.plans.kg_export.ntriples_parse`
        (``strict`` semantics included); duplicate data lines then
        collapse by RDF set semantics — one groupBy on the triple key
        keeping the max evidence count (duplicate lines of a
        well-formed export carry identical counts; max is the
        deterministic pick for hand-edited files).

        The result commits as a normal pred-partitioned materialize
        checkpoint whose sidecar carries ``imported: True`` — the
        document-stage flows (:meth:`update` / :meth:`compact`)
        refuse on it (there are no tokenize/link stages to fold
        into), while the SPARQL-Update edit ledger still applies.
        Refuses to overwrite an existing committed table unless
        ``force=True`` was set on the job.
        """
        from ner_spark.plans.kg_export import (DEFAULT_BASE,
                                               ntriples_parse)

        if self._committed("materialize") and not self.force:
            raise ValueError(
                f"{self.out} already holds a committed triple table; "
                "import into a fresh output dir or pass force=True")
        lines = (self.spark.read.text(source)
                 if isinstance(source, str) else source)
        parsed = ntriples_parse(
            lines, base=base if base is not None else DEFAULT_BASE,
            strict=strict)
        triples = (parsed.groupBy("subj", "pred", "obj")
                   .agg(F.max("evidence_count").alias("evidence_count")))
        self._check_manifest()
        fresh = self.force or not self._committed("materialize")
        out = self._run_stage(
            "materialize", lines, lambda: triples,
            partition_by=("pred",),
            meta={"applied_updates": [], "imported": True},
        )
        if fresh:
            self._refresh_stats_if_present()
        return out

    def _is_imported(self) -> bool:
        meta = self._sidecar_meta(self._path("materialize"))
        return bool(meta and meta.get("imported"))

    # -- SPARQL Update edit ledger -----------------------------------------

    def edit_ids(self) -> list[int]:
        """Committed SPARQL-Update edit sequence numbers under
        ``{out}/edits``, in application order.  An edit is committed
        iff its ``meta/_SUCCESS`` marker exists (the last thing
        :meth:`sparql_update` writes), so a crashed submit is simply
        invisible."""
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(f"{self.out}/edits")
        fs = root.getFileSystem(conf)
        if not fs.exists(root):
            return []
        out = []
        for s in fs.listStatus(root):
            name = s.getPath().getName()
            if s.isDirectory() and name.isdigit() and fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    f"{self.out}/edits/{name}/meta/_SUCCESS")):
                out.append(int(name))
        return sorted(out)

    def edits(self) -> list[dict]:
        """The committed edit ledger — ``[{"seq", "text", "del_rows",
        "ins_rows"}, ...]`` in application order."""
        import json

        out = []
        for seq in self.edit_ids():
            row = self.spark.read.parquet(
                f"{self.out}/edits/{seq:06d}/meta").first()
            out.append(json.loads(row["meta_json"]))
        return out

    def sparql_update(self, text: str,
                      path_max_hops: int | None = None) -> int:
        """Apply a SPARQL 1.1 Update request to the committed KG —
        ``INSERT DATA`` / ``DELETE DATA`` / ``DELETE WHERE`` /
        ``DELETE {} INSERT {} WHERE {}``, chained with ``;``
        (:mod:`ner_spark.plans.kg_update`) — and return the LAST
        operation's edit sequence number (one frozen edit per
        operation).

        The store stays LSM-shaped: the update's WHERE evaluates ONCE
        against the current view (base materialize + earlier edits,
        SPARQL's pre-update-store rule) and the resulting delete/insert
        sets are FROZEN as parquet under ``{out}/edits/{seq}`` — an
        edit is a value, not a replayed query, so later document
        updates or compactions (which re-derive the base from the
        mention/link checkpoints) cannot change what an already-applied
        edit did.  Every triple read (:meth:`triples`, and through it
        :meth:`query` / :meth:`sparql` / :meth:`analytics` /
        :meth:`publish_iceberg`) folds the committed edits in order:
        one hash anti-join on the frozen delete set plus one anti-joined
        union of the frozen insert set per edit — delta-proportional,
        never a store rewrite.  That per-read plan grows linearly with
        ledger length; :meth:`compact_edits` collapses the ledger into
        ONE equivalent frozen edit (exact for every base, attribution
        preserved) so long edit histories stay one fold per read.

        Crash safety: the delete/insert sets write first, the one-row
        ``meta`` table last — its ``_SUCCESS`` is the commit point, so
        a killed submit leaves no visible edit and the next submit
        overwrites the torn directory (the sequence number is
        max(committed) + 1).

        Interplay with document maintenance: a frozen delete set acts
        as a persistent TOMBSTONE — if a later :meth:`update` or
        :meth:`compact` re-derives one of its (subj, pred, obj) rows
        from new evidence, the fold suppresses it again (the edit
        recorded "this triple shall not be in the store", and the
        mention/link checkpoints it was derived from are still there).
        :meth:`clear_edits` drops the whole ledger when the operator
        decides the base derivation should stand unedited;
        :meth:`compact_edits` keeps it (semantics intact, tombstones
        intact) while bounding its length at one.
        """
        import json

        from ner_spark.plans.kg_update import build_delta, \
            parse_update_request

        ops = parse_update_request(text)  # grammar errors before IO
        if not self._committed("materialize"):
            raise ValueError(
                f"no committed materialize stage in {self.out}; run() first"
            )
        self._maybe_finish_edit_compact()
        spark = self.spark
        seq = -1
        for parsed in ops:
            # each chained operation evaluates over the view INCLUDING
            # the edits frozen for its predecessors (triples() re-reads
            # the ledger), per the spec's sequential request semantics;
            # a crash mid-request leaves a committed prefix — each
            # operation is individually atomic, the request is not
            del_df, ins_df = build_delta(self.triples(), parsed,
                                         path_max_hops=path_max_hops)
            ids = self.edit_ids()
            seq = (ids[-1] + 1) if ids else 1
            base = f"{self.out}/edits/{seq:06d}"
            if self._exists(base):
                self._delete(base)  # torn earlier attempt at this seq
            if del_df is None:
                del_df = spark.createDataFrame(
                    [], "subj string, pred string, obj string")
            if ins_df is None:
                ins_df = spark.createDataFrame(
                    [], "subj string, pred string, obj string, "
                        "evidence_count bigint")
            del_df.write.mode("overwrite").parquet(f"{base}/del")
            ins_df.write.mode("overwrite").parquet(f"{base}/ins")
            meta = {
                "seq": seq,
                "text": text,
                "op": parsed["form"],
                "del_rows": self._read_edit_side(base, "del").count(),
                "ins_rows": self._read_edit_side(base, "ins").count(),
            }
            spark.createDataFrame(
                [(json.dumps(meta),)], "meta_json string"
            ).write.mode("overwrite").parquet(f"{base}/meta")
            self._log_event("sparql_update", meta["del_rows"]
                            + meta["ins_rows"])
        self._refresh_stats_if_present()
        return seq

    def clear_edits(self) -> int:
        """Drop the whole SPARQL-Update edit ledger (the base
        derivation stands unedited again); returns how many committed
        edits were removed.  One recursive delete — an interrupted
        clear leaves only uncommitted (invisible) remnants."""
        n = len(self.edit_ids())
        if self._exists(f"{self.out}/edits"):
            self._delete(f"{self.out}/edits")
        self._log_event("clear_edits", n)
        if n:
            self._refresh_stats_if_present()
        return n

    def _read_edit_side(self, base: str, side: str) -> DataFrame:
        # explicit schemas: an empty frozen side has zero part files,
        # where inference would fail
        schema = ("subj string, pred string, obj string"
                  + (", evidence_count bigint" if side == "ins" else ""))
        return self.spark.read.schema(schema).parquet(f"{base}/{side}")

    def _read_edit_ins_attr(self, base: str, seq: int) -> DataFrame:
        """The frozen insert side WITH per-row edit attribution.  A
        plain edit's parquet has no ``graph`` column (read as null by
        the explicit schema, name-based evolution) and attributes
        wholly to ``edit:{seq}``; a COMPACTED edit persists the
        original attribution per row, which the coalesce passes
        through unchanged."""
        schema = ("subj string, pred string, obj string, "
                  "evidence_count bigint, graph string")
        return (
            self.spark.read.schema(schema).parquet(f"{base}/ins")
            .withColumn(
                "graph",
                F.coalesce(F.col("graph"), F.lit(f"edit:{seq:06d}")))
        )

    def compact_edits(self) -> int:
        """Collapse the committed SPARQL-Update edit ledger into ONE
        equivalent frozen edit, bounding the per-read fold at a single
        anti-join + insert union no matter how many edits were ever
        applied (:meth:`triples` otherwise replays the ledger —
        delta-proportional per edit, but linear PLAN growth forever).

        Why not fold the edits into the materialize checkpoint
        itself?  Two reasons, both architectural: (a) document
        maintenance (:meth:`compact` / :meth:`update`) re-derives the
        base tables from the mention/link checkpoints, so anything
        folded into ``materialize`` would be silently clobbered by
        the next document compaction; (b) the frozen delete sets are
        documented persistent TOMBSTONES — they must keep suppressing
        triples a later document update re-derives, which a one-time
        base rewrite cannot do.  The ledger-collapse form keeps both
        guarantees and still caps the plan.

        The collapse is exact for EVERY base, not just the current
        one — sequential fold composition closes over single deltas::

            fold(fold(B, d1, i1), d2, i2)
              = (B \\ (d1 ∪ d2)) ∪ ((i1 \\ d2) ∪ i2)

        so inductively the whole ledger is one pair: ``d* = ∪ dᵢ``
        (tombstone union) and ``i*`` built by replaying each edit's
        delete-then-insert against the accumulated insert set (an
        insert of a key already live in ``i*`` keeps the earlier row,
        mirroring fold_delta's already-present anti-join; a delete
        removes it so a later reinsert wins).  Each surviving ``i*``
        row carries a ``graph`` attribution column naming its origin
        edit, so :meth:`quads` provenance survives compaction
        (re-compacting preserves prior attributions via the coalesce
        in :meth:`_read_edit_ins_attr`).

        Crash safety: the compacted edit is fully written under
        ``edits/_compact_tmp`` (invisible — not a digit dir), then
        atomically renamed to ``edits/{max+1}``, then the folded dirs
        are deleted.  The rename is the commit point, and every crash
        window is CORRECT, not just recoverable: applying any suffix
        of the old edits followed by the compacted edit equals
        applying the full ledger (the compacted edit re-applies the
        whole history idempotently), so a reader between rename and
        cleanup sees the right triples.  The folded seq list rides in
        the compacted edit's meta; :meth:`_maybe_finish_edit_compact`
        deletes leftovers on the next maintenance call.

        Returns the number of edits folded (0 = ledger already ≤ 1).
        """
        import json

        self._maybe_finish_edit_compact()
        ids = self.edit_ids()
        if len(ids) <= 1:
            return 0
        spark = self.spark
        keys = ["subj", "pred", "obj"]
        dstar = None
        istar = None
        for seq in ids:
            base = f"{self.out}/edits/{seq:06d}"
            dels = self._read_edit_side(base, "del").select(*keys)
            ins = self._read_edit_ins_attr(base, seq)
            dstar = dels if dstar is None else dstar.unionByName(dels)
            if istar is None:
                istar = ins
            else:
                kept = istar.join(dels, keys, "left_anti")
                new = ins.join(kept.select(*keys), keys, "left_anti")
                istar = kept.unionByName(new)
                # bounded ledger sizes, but the iterative build's
                # lineage is O(#edits) — truncate it as the CC loop does
                istar = istar.localCheckpoint(eager=True)
        dstar = dstar.distinct()
        tmp = f"{self.out}/edits/_compact_tmp"
        if self._exists(tmp):
            self._delete(tmp)
        dstar.write.mode("overwrite").parquet(f"{tmp}/del")
        istar.write.mode("overwrite").parquet(f"{tmp}/ins")
        newseq = ids[-1] + 1
        meta = {
            "seq": newseq,
            "text": f"# compacted from edits {ids}",
            "op": "compact_edits",
            "folded": ids,
            "del_rows": self.spark.read.parquet(f"{tmp}/del").count(),
            "ins_rows": self.spark.read.parquet(f"{tmp}/ins").count(),
        }
        spark.createDataFrame(
            [(json.dumps(meta),)], "meta_json string"
        ).write.mode("overwrite").parquet(f"{tmp}/meta")
        self._rename(tmp, f"{self.out}/edits/{newseq:06d}")  # commit
        for seq in ids:
            self._delete(f"{self.out}/edits/{seq:06d}")
        self._log_event("compact_edits", len(ids))
        return len(ids)

    def _maybe_finish_edit_compact(self) -> None:
        """Roll a crashed edit compaction forward: drop an uncommitted
        tmp dir, and delete any committed edit dirs an already-renamed
        compacted edit records as folded.  Safe to skip entirely — the
        leftover states are replay-correct (see :meth:`compact_edits`)
        — so this runs only from maintenance entry points, never from
        the read path."""
        import json

        tmp = f"{self.out}/edits/_compact_tmp"
        if self._exists(tmp):
            self._delete(tmp)
        ids = set(self.edit_ids())
        for seq in sorted(ids):
            row = self.spark.read.parquet(
                f"{self.out}/edits/{seq:06d}/meta").first()
            folded = json.loads(row["meta_json"]).get("folded") or []
            for old in folded:
                if old in ids:
                    self._delete(f"{self.out}/edits/{old:06d}")
                    ids.discard(old)

    def triples(self) -> DataFrame:
        """The KG's current triple view: the committed materialize
        checkpoint with every committed SPARQL-Update edit folded in
        order (:func:`ner_spark.plans.kg_update.fold_delta`).  With no
        edits this is exactly the partitioned checkpoint read — the
        pred-partition-pruning plan shape the staged audit pins."""
        from ner_spark.plans.kg_update import fold_delta

        if not self._committed("materialize"):
            raise ValueError(
                f"no committed materialize stage in {self.out}; run() first"
            )
        out = self._read_committed(self._path("materialize"),
                                   partitioned=True)
        for seq in self.edit_ids():
            base = f"{self.out}/edits/{seq:06d}"
            out = fold_delta(out,
                             self._read_edit_side(base, "del"),
                             self._read_edit_side(base, "ins"))
        return out

    def quads(self) -> DataFrame:
        """The committed KG as PROVENANCE QUADS — (graph, subj, pred,
        obj, evidence_count) where ``graph`` names the origin of each
        CURRENT triple: ``base`` for the materialize checkpoint,
        ``edit:NNNNNN`` for a triple a SPARQL-Update edit introduced.
        The view replays the edit ledger with :func:`fold_delta`'s
        exact semantics, tagging instead of just folding — so
        ``quads().drop("graph")`` equals :meth:`triples` row-for-row
        (a deleted-then-reinserted triple attributes to the
        reinserting edit; an insert of an already-present triple
        leaves the earlier attribution standing, like the fold's
        already-present anti-join).  Feed it to
        :func:`ner_spark.plans.sparql.sparql` for GRAPH queries
        ("which edit asserted this?") — or :meth:`sparql` with
        ``provenance=True``."""
        if not self._committed("materialize"):
            raise ValueError(
                f"no committed materialize stage in {self.out}; run() first"
            )
        base = self._read_committed(self._path("materialize"),
                                    partitioned=True)
        ec = (F.col("evidence_count").cast("bigint")
              if "evidence_count" in base.columns else F.lit(1))
        keys = ["subj", "pred", "obj"]
        out = base.select(*keys, ec.alias("evidence_count")).withColumn(
            "graph", F.lit("base"))
        for seq in self.edit_ids():
            eb = f"{self.out}/edits/{seq:06d}"
            dels = self._read_edit_side(eb, "del")
            # per-row attribution: a compacted edit carries each
            # surviving insert's ORIGIN edit in its persisted graph
            # column (so provenance survives compact_edits); a plain
            # edit attributes wholly to its own seq via the coalesce
            ins = self._read_edit_ins_attr(eb, seq)
            out = out.join(dels.select(*keys), keys, "left_anti")
            new = ins.join(out.select(*keys), keys, "left_anti")
            out = out.unionByName(
                new.select(*keys,
                           F.col("evidence_count").cast("bigint")
                           .alias("evidence_count"),
                           "graph"))
        return out.select("graph", *keys, "evidence_count")

    def publish_iceberg(self, table: str,
                        metrics_table: str | None = None) -> None:
        """Publish the committed triple table to an Iceberg table — the
        deploy-time replacement for this repo's parquet + ``_SUCCESS``
        sidecar protocol at the OUTPUT boundary.

        The internal protocol (atomic renames, sidecar coverage,
        prepare/_COMMIT/install compaction) is correct for a single
        writer on a rename-atomic filesystem (HDFS/local); with S3
        object storage or concurrent readers/writers the answer is a
        table format whose snapshot commit is the atomicity primitive.
        This method is that bridge: ``writeTo(table).using("iceberg")``
        with the same ``pred`` partition spec the checkpoint uses, so
        readers get partition pruning plus snapshot isolation, and each
        publish is one atomic ``createOrReplace`` commit (a crashed
        publish leaves the previous snapshot readable — no torn table).

        Requires an Iceberg-enabled session (runtime jars + a configured
        catalog); this container has neither, so the method probes first
        and raises with the deployment recipe instead of a
        ClassNotFoundException twenty stages deep.  ``table`` is a
        catalog identifier like ``iceberg.kg.triples``.
        """
        if not iceberg_available(self.spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath.  Deploy with\n"
                "  spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13:<version> \\\n"
                "    --conf spark.sql.catalog.iceberg="
                "org.apache.iceberg.spark.SparkCatalog \\\n"
                "    --conf spark.sql.catalog.iceberg.type=hive|hadoop "
                "--conf spark.sql.catalog.iceberg.warehouse=<path>\n"
                "then re-run with --publish-iceberg <catalog.db.table>"
            )
        triples = self.triples()
        (triples.writeTo(table).using("iceberg")
         .partitionedBy(F.col("pred")).createOrReplace())
        if metrics_table:
            self.metrics().writeTo(metrics_table).using(
                "iceberg").createOrReplace()
        self._log_event("publish_iceberg", triples.count())


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath.
    Class probe only — catalog configuration is still the deployer's
    job; this gates the publish path (and lets its tests skip cleanly
    in jar-less environments)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.Transaction")
        return True
    except Exception:
        return False


def _print_query_result(out: "DataFrame", args, stage: str) -> None:
    """Shared result printer for the --match / --sparql CLI branches:
    header, the first --match-limit rows (∅ = null), and the stage
    line with the full count.  The head read is bounded (limit +
    collect of control rows, not the solution set)."""
    head = out.limit(args.match_limit).collect()
    print("\t".join(out.columns))
    for r in head:
        print("\t".join("∅" if v is None else str(v) for v in r))
    print(f"stage={stage} rows={out.count()} vars={len(out.columns)} "
          f"output={args.output}")


def main() -> None:
    parser = argparse.ArgumentParser(description="NER-Spark KG construction job")
    parser.add_argument("--input", help="parquet source table (repo,path,commit,lang,content)")
    parser.add_argument("--fixture-rows", type=int, default=0,
                        help="synthesize a fixture source table with N rows instead of --input")
    parser.add_argument("--output", required=True)
    parser.add_argument("--mode", default="hybrid")
    parser.add_argument("--tokenizer-mode", default="standard")
    parser.add_argument("--stage", default="materialize", choices=list(STAGES))
    parser.add_argument("--force", action="store_true", help="recompute committed stages")
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--cc-max-iter", type=int, default=50,
                        help="connected-components iteration cap (raise for "
                             "very deep entity graphs)")
    parser.add_argument("--no-prewarm", action="store_true",
                        help="skip the untimed JVM/worker warmup slice "
                             "before stage 1")
    parser.add_argument("--update", action="store_true",
                        help="treat --input/--fixture-rows as a DELTA of "
                             "new documents folded into a completed run: "
                             "tag/link the delta only, recompute the "
                             "derived canonicalize/materialize stages")
    parser.add_argument("--fuzzy-canon", action="store_true",
                        help="also merge near-identical surfaces "
                             "(char-3-gram Jaccard, MinHashLSH-blocked) "
                             "during canonicalization")
    parser.add_argument("--fuzzy-threshold", type=float, default=0.85,
                        help="Jaccard similarity cutoff for --fuzzy-canon")
    parser.add_argument("--differential-threshold", type=float, default=0.5,
                        help="with --update: take the differential "
                             "materialize patch only while 2·affected + "
                             "delta link rows stay under this fraction "
                             "of a full recompute's scan volume")
    parser.add_argument("--no-incremental", action="store_true",
                        help="with --update: recompute the derived "
                             "canonicalize/materialize stages over "
                             "base ∪ deltas instead of the "
                             "delta-proportional incremental paths")
    parser.add_argument("--compact", action="store_true",
                        help="fold every completed update delta back into "
                             "the base tokenize_tag/link checkpoints "
                             "(LSM-style major compaction; output-identical, "
                             "bounds the per-update union fan-in)")
    parser.add_argument("--compact-edits", action="store_true",
                        help="collapse the committed SPARQL-Update edit "
                             "ledger into ONE equivalent frozen edit "
                             "(view-identical, tombstones and quad "
                             "attribution preserved; bounds the per-read "
                             "fold at a single anti-join)")
    parser.add_argument("--publish-iceberg", default=None, metavar="TABLE",
                        help="after the run/update completes, publish the "
                             "committed triple table to this Iceberg "
                             "identifier (catalog.db.table) as one atomic "
                             "snapshot commit — needs the Iceberg runtime "
                             "jars + a configured catalog (see README)")
    parser.add_argument("--analytics", action="store_true",
                        help="after the run (or standalone over an "
                             "already-committed output, or after a "
                             "--stream-input drain that folded "
                             "anything), materialize the "
                             "graph-analytics tables — degree, "
                             "components, pagerank, co-mention PMI, "
                             "related top-k — under "
                             "<output>/analytics/")
    parser.add_argument("--pagerank-iterations", type=int, default=3,
                        help="--analytics: PageRank iteration count")
    parser.add_argument("--rule", action="append", default=[],
                        metavar="CONSTRUCT",
                        help="a CONSTRUCT query used as a forward-"
                             "chaining rule, repeatable; the rules' "
                             "fixpoint over the committed KG "
                             "materializes under <output>/rules/ "
                             "(standalone, like --entail)")
    parser.add_argument("--entail-ontology", default=None,
                        metavar="PATH",
                        help="with --entail: use the N-Triples "
                             "schema at PATH (subClassOf / "
                             "subPropertyOf / domain / range triples) "
                             "instead of the built-in demo ontology")
    parser.add_argument("--entail", action="store_true",
                        help="after the run (or standalone over an "
                             "already-committed output), materialize "
                             "the RDFS-lite closure + SHACL-lite "
                             "validation report under "
                             "<output>/entailment/ (views: triples "
                             "with an inferred flag, violations)")
    parser.add_argument("--sparql-provenance", action="store_true",
                        help="with --sparql: query the provenance "
                             "QUADS view — GRAPH blocks bind each "
                             "triple's origin (base / edit:NNNNNN)")
    parser.add_argument("--sparql-entailed", action="store_true",
                        help="with --sparql: query under the RDFS "
                             "entailment regime (the materialized "
                             "closure view when fresh, else computed "
                             "on the fly)")
    parser.add_argument("--sparql", default=None, metavar="QUERY",
                        help="query the committed KG with a SPARQL "
                             "SELECT/ASK/CONSTRUCT string (see "
                             "ner_spark.plans.sparql for the supported "
                             "subset) — e.g. \"SELECT ?r (COUNT(?e) AS "
                             "?n) WHERE { ?r DECLARES ?e } GROUP BY ?r "
                             "ORDER BY DESC(?n) LIMIT 5\" (standalone, "
                             "like --match; prints the first "
                             "--match-limit rows + the count)")
    parser.add_argument("--sparql-update", default=None, metavar="UPDATE",
                        help="edit the committed KG with a SPARQL 1.1 "
                             "Update string — INSERT DATA / DELETE DATA "
                             "/ DELETE WHERE / DELETE {} INSERT {} "
                             "WHERE {} (see ner_spark.plans.kg_update) "
                             "— frozen as one crash-safe edit under "
                             "<output>/edits/ that every later query "
                             "folds in (standalone, like --sparql)")
    parser.add_argument("--match", default=None, metavar="PATTERN",
                        help="query the committed KG with a basic graph "
                             "pattern: dot-separated triples of "
                             "whitespace-separated terms, ?-prefixed "
                             "terms are variables — e.g. "
                             "'?repo DECLARES ?e . ?e MENTIONED_WITH ?x' "
                             "(standalone, like --analytics; prints the "
                             "first --match-limit bindings + the count)")
    parser.add_argument("--match-optional", default=None, metavar="PATTERN",
                        help="with --match: OPTIONAL (left-join) pattern "
                             "elements in the same syntax — unmatched "
                             "bindings survive with nulls")
    parser.add_argument("--match-filter", action="append", default=[],
                        metavar="EXPR",
                        help="with --match: FILTER expression over bound "
                             "variables, repeatable — '?e != ?x', "
                             "'?kb = \"kb:Q42\"', "
                             "'regex(?kb, \"[02468]$\")', "
                             "strstarts/strends/contains(?v, \"lit\")")
    parser.add_argument("--match-negation", action="append", default=[],
                        metavar="PATTERN",
                        help="with --match: FILTER NOT EXISTS group in "
                             "the same pattern syntax, repeatable — a "
                             "binding survives only if the group "
                             "matches nothing (e.g. '?e LINKED_TO ?kb' "
                             "keeps entities with NO KB link)")
    parser.add_argument("--match-values", default=None, metavar="DATA",
                        help="with --match: SPARQL VALUES inline data "
                             "'?v1 ?v2 = t1 t2 | t3 UNDEF' — variables, "
                             "'=', then |-separated rows (UNDEF = "
                             "unbound); joins into the bindings with "
                             "compatibility semantics")
    parser.add_argument("--path-max-hops", type=int, default=None,
                        help="with --match: bound property-path "
                             "(PRED+/PRED*) closures to this many hops "
                             "(default: iterate to the fixpoint)")
    parser.add_argument("--match-group-by", default=None, metavar="VARS",
                        help="with --match: GROUP BY these "
                             "whitespace-separated ?variables (with no "
                             "--match-agg this is DISTINCT over the keys)")
    parser.add_argument("--match-agg", action="append", default=[],
                        metavar="AGG",
                        help="with --match: aggregate 'fn(?var) AS alias' "
                             "with fn in (count, count_distinct, min, "
                             "max, group_concat) or 'count(*) AS alias', "
                             "repeatable; with no --match-group-by the "
                             "whole binding set is one group")
    parser.add_argument("--match-having", action="append", default=[],
                        metavar="TERM",
                        help="with --match: group filter 'alias op INT' "
                             "over a COUNT aggregate alias, repeatable "
                             "(e.g. 'n >= 2')")
    parser.add_argument("--match-offset", type=int, default=None,
                        help="with --match: skip the first N ordered "
                             "solutions (requires --match-order-by)")
    parser.add_argument("--match-select", default=None, metavar="VARS",
                        help="with --match: project to these "
                             "whitespace-separated ?variables / "
                             "aggregate aliases")
    parser.add_argument("--match-distinct", action="store_true",
                        help="with --match: SELECT DISTINCT over the "
                             "projected columns")
    parser.add_argument("--match-order-by", action="append", default=[],
                        metavar="TERM",
                        help="with --match: ORDER BY term "
                             "'?var|alias [ASC|DESC]', repeatable")
    parser.add_argument("--match-top", type=int, default=None,
                        help="with --match: LIMIT the solution sequence "
                             "itself (TakeOrderedAndProject under "
                             "--match-order-by); distinct from "
                             "--match-limit, which only bounds printing")
    parser.add_argument("--match-limit", type=int, default=20,
                        help="--match: how many bindings to print")
    parser.add_argument("--import-ntriples", default=None, metavar="PATH",
                        help="adopt an external N-Triples file/dir as "
                             "the committed triple table of --output "
                             "(then --sparql/--match/--analytics/"
                             "--export-ntriples all work over it); "
                             "--force overwrites an existing table")
    parser.add_argument("--import-lenient", action="store_true",
                        help="with --import-ntriples: drop unparseable/"
                             "foreign lines instead of raising "
                             "(strict=False)")
    parser.add_argument("--export-nquads", default=None, metavar="PATH",
                        help="serialize the committed KG's PROVENANCE "
                             "QUADS (graph = base/edit:NNNNNN origin) "
                             "as W3C N-Quads text under PATH "
                             "(standalone, like --export-ntriples; "
                             "honors --export-evidence / "
                             "--export-single-file)")
    parser.add_argument("--export-ntriples", default=None, metavar="PATH",
                        help="serialize the committed KG as N-Triples "
                             "text under PATH (pure projection, no "
                             "shuffle) and exit")
    parser.add_argument("--export-evidence", action="store_true",
                        help="with --export-ntriples: add one "
                             "xsd:integer evidence_count line per edge "
                             "(reified edge-id subject)")
    parser.add_argument("--export-single-file", action="store_true",
                        help="with --export-ntriples: sort + coalesce "
                             "to one byte-stable part file (small "
                             "graphs only — the sort is a global "
                             "shuffle)")
    parser.add_argument("--match-plan", default="static",
                        choices=["static", "stats", "catalog",
                                 "written"],
                        help="with --match/--sparql: BGP join-order "
                             "mode — 'static' selectivity rank "
                             "(default), 'stats' one measured costing "
                             "scan of the committed table, 'catalog' "
                             "the persisted per-predicate statistics "
                             "(built on first use; forms without a "
                             "top-level BGP fall back to static), "
                             "'written' the author's order")
    parser.add_argument("--update-id", default=None,
                        help="stable id for this delta under "
                             "{output}/updates/ (pass the same id to "
                             "resume a crashed update; default: run id)")
    parser.add_argument("--stream-input", default=None,
                        help="continuous ingest: watch this directory "
                             "for new source parquet files and fold each "
                             "micro-batch via the incremental update "
                             "path (needs a completed base run in "
                             "--output).  Drains the backlog and exits "
                             "(availableNow); relaunch to pick up later "
                             "landings")
    parser.add_argument("--stream-checkpoint", default=None,
                        help="streaming offset checkpoint dir (default: "
                             "{output}/_stream_checkpoint)")
    parser.add_argument("--compact-every", type=int, default=None,
                        help="with --stream-input: after the backlog "
                             "drains (stream stopped), run the LSM "
                             "compaction if N+ completed deltas have "
                             "accumulated — maintenance stays off the "
                             "trigger path so fold latency is flat")
    parser.add_argument("--max-files-per-trigger", type=int, default=64,
                        help="with --stream-input: micro-batch "
                             "granularity (files per trigger) — one "
                             "update delta per batch)")
    args = parser.parse_args()

    from ner_spark.session import get_spark

    spark = get_spark("ner-spark-kg-job")
    if args.compact:
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id,
                    fuzzy_canon=args.fuzzy_canon,
                    fuzzy_threshold=args.fuzzy_threshold)
        n = job.compact()
        print(f"stage=compact folded={n} output={args.output}")
        if args.compact_edits:
            n = job.compact_edits()
            print(f"stage=compact_edits folded={n} output={args.output}")
        return
    if args.compact_edits:
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        n = job.compact_edits()
        print(f"stage=compact_edits folded={n} output={args.output}")
        return
    if args.stream_input:
        from ner_spark.streaming.ingest import drain_kg_updates

        if args.input or args.fixture_rows:
            parser.error("--stream-input reads its own landing zone; "
                         "--input/--fixture-rows do not apply")
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id,
                    force=args.force, cc_max_iter=args.cc_max_iter,
                    fuzzy_canon=args.fuzzy_canon,
                    fuzzy_threshold=args.fuzzy_threshold)
        chk = args.stream_checkpoint or f"{args.output}/_stream_checkpoint"
        stats = drain_kg_updates(
            spark, args.stream_input, job, chk,
            max_files_per_trigger=args.max_files_per_trigger,
            compact_every=args.compact_every,
            refresh_analytics=args.analytics,
            update_kwargs={
                "incremental": not args.no_incremental,
                "differential_threshold": args.differential_threshold,
            },
        )
        print(f"stage=stream folded={stats.get('folded', 0)} "
              f"compactions={stats.get('compactions', 0)} "
              f"pending_deltas={len(job._update_ids())} "
              f"output={args.output}")
        return
    if args.fixture_rows:
        from ner_spark.sources.fixtures import source_table

        source = source_table(spark, n_rows=args.fixture_rows)
    elif args.input:
        source = spark.read.parquet(args.input)
    elif args.sparql:
        # standalone SPARQL query over an already-committed output
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        plan = None if args.match_plan == "written" else args.match_plan
        _print_query_result(job.sparql(
            args.sparql, plan=plan, entailed=args.sparql_entailed,
            provenance=args.sparql_provenance), args, "sparql")
        return
    elif args.import_ntriples:
        # adopt an external graph as the committed table
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode,
                    run_id=args.run_id, force=args.force)
        out = job.import_ntriples(args.import_ntriples,
                                  strict=not args.import_lenient)
        print(f"stage=import_ntriples triples={out.count()} "
              f"output={args.output}/materialize")
        return
    elif args.export_ntriples:
        # standalone export of an already-committed output
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        job.export_ntriples(args.export_ntriples,
                            evidence=args.export_evidence,
                            single_file=args.export_single_file)
        n = spark.read.text(args.export_ntriples).count()
        print(f"stage=export_ntriples lines={n} "
              f"output={args.export_ntriples}")
        return
    elif args.export_nquads:
        # standalone provenance-quads export
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        job.export_nquads(args.export_nquads,
                          evidence=args.export_evidence,
                          single_file=args.export_single_file)
        n = spark.read.text(args.export_nquads).count()
        print(f"stage=export_nquads lines={n} "
              f"output={args.export_nquads}")
        return
    elif args.sparql_update:
        # standalone edit of an already-committed output
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        seq = job.sparql_update(args.sparql_update,
                                path_max_hops=args.path_max_hops)
        meta = job.edits()[-1]
        print(f"stage=sparql_update seq={seq} "
              f"deleted={meta['del_rows']} inserted={meta['ins_rows']} "
              f"output={args.output}/edits")
        return
    elif args.match:
        # standalone query over an already-committed output
        from ner_spark.plans.kg_query import parse_pattern, parse_values

        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        out = job.query(
            parse_pattern(args.match),
            optional=(parse_pattern(args.match_optional)
                      if args.match_optional else ()),
            filters=args.match_filter,
            negation=[parse_pattern(g) for g in args.match_negation],
            values=(parse_values(args.match_values)
                    if args.match_values else None),
            path_max_hops=args.path_max_hops,
            group_by=(args.match_group_by.split()
                      if args.match_group_by else ()),
            aggregates=args.match_agg,
            having=args.match_having,
            select=(args.match_select.split()
                    if args.match_select else None),
            distinct=args.match_distinct,
            order_by=args.match_order_by,
            offset=args.match_offset,
            limit=args.match_top,
            plan=(None if args.match_plan == "written"
                  else args.match_plan),
        )
        _print_query_result(out, args, "query")
        return
    elif args.rule:
        # standalone rule materialization over a committed output
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id)
        counts = job.rules_view(args.rule)
        print("stage=rules "
              + " ".join(f"{k}={v}" for k, v in counts.items())
              + f" output={args.output}/rules")
        return
    elif args.analytics or args.entail:
        # standalone derived views over an already-committed output
        job = KgJob(spark, args.output, mode=args.mode,
                    tokenizer_mode=args.tokenizer_mode, run_id=args.run_id,
                    fuzzy_canon=args.fuzzy_canon,
                    fuzzy_threshold=args.fuzzy_threshold)
        if args.analytics:
            counts = job.analytics(
                pagerank_iterations=args.pagerank_iterations)
            print("stage=analytics "
                  + " ".join(f"{k}={v}" for k, v in counts.items())
                  + f" output={args.output}/analytics")
        if args.entail:
            counts = job.entailment(onto=args.entail_ontology)
            print("stage=entailment "
                  + " ".join(f"{k}={v}" for k, v in counts.items())
                  + f" output={args.output}/entailment")
        return
    else:
        parser.error("one of --input / --fixture-rows is required")

    job = KgJob(spark, args.output, mode=args.mode,
                tokenizer_mode=args.tokenizer_mode, run_id=args.run_id,
                force=args.force, cc_max_iter=args.cc_max_iter,
                fuzzy_canon=args.fuzzy_canon,
                fuzzy_threshold=args.fuzzy_threshold)
    if not args.no_prewarm:
        job.prewarm(even_if_committed=args.update, update_id=args.update_id)
    if args.update:
        out = job.update(source, update_id=args.update_id,
                         incremental=not args.no_incremental,
                         differential_threshold=args.differential_threshold)
        print(f"stage=update rows={out.count()} output={job._path('materialize')}")
    else:
        out = job.run(source, last_stage=args.stage)
        print(f"stage={args.stage} rows={out.count()} output={job._path(args.stage)}")
    if args.analytics:
        counts = job.analytics(pagerank_iterations=args.pagerank_iterations)
        print("stage=analytics "
              + " ".join(f"{k}={v}" for k, v in counts.items())
              + f" output={args.output}/analytics")
    if args.entail:
        counts = job.entailment(onto=args.entail_ontology)
        print("stage=entailment "
              + " ".join(f"{k}={v}" for k, v in counts.items())
              + f" output={args.output}/entailment")
    if args.rule:
        # --rule combined with a source run: materialize the rules
        # view over the just-committed KG, same as the standalone
        # branch (previously this combination was silently ignored)
        counts = job.rules_view(args.rule)
        print("stage=rules "
              + " ".join(f"{k}={v}" for k, v in counts.items())
              + f" output={args.output}/rules")
    if args.publish_iceberg:
        job.publish_iceberg(args.publish_iceberg)
        print(f"published={args.publish_iceberg}")


if __name__ == "__main__":
    main()
