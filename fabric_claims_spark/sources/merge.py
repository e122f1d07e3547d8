"""Merge-capable table storage: Delta when importable, otherwise a
versioned-parquet fallback with the same MERGE semantics.

The reference upserts through two engines — Delta MERGE in notebooks
(NBclaims_bronze.Notebook/notebook-content.py:234-240) and a T-SQL
stored procedure with null-safe change detection
(sp_upsert_claims.sql:12-103). This module gives both behaviors one
interface:

* ``merge`` = whenMatchedUpdateAll (optionally only when a non-key
  column actually differs, null-safely — the SP's
  ``ISNULL(t.c,'') <> ISNULL(s.c,'')`` gate) + whenNotMatchedInsertAll.
* Writes are atomic: a new version directory is written first, then a
  one-line ``_CURRENT`` pointer file is swapped with ``os.replace``.
  Readers of the old version are never disturbed (same contract as
  Delta's log-pointer commit).

At 100 TB this class is constructed with ``prefer_delta=True`` on a
cluster with delta-spark installed and every call maps 1:1 onto Delta
APIs; the parquet fallback exists so the engine is runnable anywhere.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only where delta-spark is installed
    from delta.tables import DeltaTable  # type: ignore

    _HAS_DELTA = True
except ImportError:
    DeltaTable = None
    _HAS_DELTA = False

_CURRENT = "_CURRENT"
_KEEP_VERSIONS = 3


@dataclass
class MergeStats:
    """Parity with the SP's @@ROWCOUNT accounting (sp_upsert_claims.sql:105-113)."""

    inserted: int
    updated: int

    @property
    def written(self) -> int:
        return self.inserted + self.updated


class TableStore:
    """A warehouse root holding named tables with atomic overwrite,
    append, and MERGE."""

    def __init__(self, spark: SparkSession, root: str, prefer_delta: bool = False):
        self.spark = spark
        self.root = root
        self.use_delta = prefer_delta and _HAS_DELTA
        os.makedirs(root, exist_ok=True)

    # -- path helpers -----------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._dir(name), _CURRENT)

    def _current_version(self, name: str) -> str | None:
        try:
            with open(self._pointer(name)) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    # -- public API -------------------------------------------------------
    def exists(self, name: str) -> bool:
        """Guarded-create check (spark.catalog.tableExists analog,
        NB_BRONZE:234)."""
        if self.use_delta:
            return DeltaTable.isDeltaTable(self.spark, self._dir(name))
        return self._current_version(name) is not None

    def read(self, name: str) -> DataFrame:
        if self.use_delta:
            return self.spark.read.format("delta").load(self._dir(name))
        version = self._current_version(name)
        if version is None:
            raise FileNotFoundError(f"table {name} does not exist under {self.root}")
        return self.spark.read.parquet(os.path.join(self._dir(name), version))

    def versions(self, name: str) -> list[str]:
        """Retained version ids, oldest → newest (current last) — the
        time-travel index. Parquet mode orders the ``_vacuum``-retained
        version dirs by the nanosecond commit stamp embedded in each
        id (mtime fallback for legacy random-hex ids); Delta mode
        lists the commit history.
        """
        if self.use_delta:
            hist = (
                DeltaTable.forPath(self.spark, self._dir(name))
                .history()
                .select("version")
                .collect()
            )
            return [str(r["version"]) for r in sorted(hist, key=lambda r: r["version"])]
        table_dir = self._dir(name)
        if self._current_version(name) is None:
            raise FileNotFoundError(f"table {name} does not exist under {self.root}")

        def _order(d: str) -> tuple[float, str]:
            # primary: the nanosecond commit stamp embedded in the id
            # (exact, monotonic); legacy random-hex ids fall back to
            # mtime, tie-broken by name for determinism
            part = d.split("_")[1] if "_" in d else ""
            if part.isdigit():
                return (float(part), d)
            try:
                return (os.stat(os.path.join(table_dir, d)).st_mtime * 1e9, d)
            except OSError:
                return (0.0, d)

        return sorted(
            (d for d in os.listdir(table_dir) if d.startswith("v_")),
            key=_order,
        )

    def read_version(self, name: str, version: str) -> DataFrame:
        """Time-travel read of a retained version (Delta ``versionAsOf``
        analog). Raises if the version was vacuumed."""
        if self.use_delta:
            return (
                self.spark.read.format("delta")
                .option("versionAsOf", version)
                .load(self._dir(name))
            )
        path = os.path.join(self._dir(name), version)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"version {version} of table {name} is not retained"
            )
        return self.spark.read.parquet(path)

    def overwrite(self, name: str, df: DataFrame) -> None:
        """S9 — overwrite sink incl. schema change (NB_BRONZE:243-248)."""
        if self.use_delta:
            (
                df.write.format("delta")
                .mode("overwrite")
                .option("overwriteSchema", "true")
                .save(self._dir(name))
            )
            return
        self._commit_version(name, df)

    # -- driver-side metadata I/O (parquet fallback only) -----------------
    #
    # Commit/watermark tables are BOUNDED metadata (one row per batch).
    # Reading or rewriting them through a Spark job pays full job
    # scheduling for a few hundred bytes; Delta itself keeps this class
    # of state in driver-written log files for the same reason. These
    # two methods move such tables through pyarrow on the driver under
    # the identical version-dir + pointer-swap commit, so readers (and
    # Spark, which reads the same parquet) observe nothing different.
    # Callers own the "this table is bounded" claim — data tables keep
    # going through Spark.

    def read_local(self, name: str):
        """Current version of a small table as one pyarrow Table —
        no Spark job. Raises on Delta (callers fall back to Spark)."""
        if self.use_delta:
            raise NotImplementedError("read_local: parquet fallback only")
        import pyarrow as pa
        import pyarrow.parquet as pq

        version = self._current_version(name)
        if version is None:
            raise FileNotFoundError(
                f"table {name} does not exist under {self.root}"
            )
        vdir = os.path.join(self._dir(name), version)
        parts = [
            pq.read_table(os.path.join(vdir, f))
            for f in sorted(os.listdir(vdir))
            if f.endswith(".parquet")
            and not f.startswith(("_", "."))
            and os.path.isfile(os.path.join(vdir, f))
        ]
        if not parts:
            raise FileNotFoundError(
                f"table {name} version {version} holds no data files"
            )
        return pa.concat_tables(parts, promote_options="default")

    def overwrite_local(self, name: str, table) -> None:
        """Atomic overwrite of a small table from a pyarrow Table —
        one data file, no Spark job, same pointer-swap commit and
        vacuum as every Spark write. Parquet fallback only."""
        if self.use_delta:
            raise NotImplementedError(
                "overwrite_local: parquet fallback only"
            )
        import pyarrow.parquet as pq

        table_dir = self._dir(name)
        os.makedirs(table_dir, exist_ok=True)
        version = f"v_{time.time_ns():020d}_{uuid.uuid4().hex[:6]}"
        new_dir = os.path.join(table_dir, version)
        os.makedirs(new_dir)
        pq.write_table(
            table, os.path.join(new_dir, "part-00000-local.parquet")
        )
        self._swap_current(name, version)

    def count_rows(self, name: str) -> int:
        """Exact row count of the CURRENT version from parquet footer
        metadata — driver-side, no Spark job (round 13, guide §1.2/§5:
        a count() action on a just-written table pays full job
        scheduling for a number the files' footers already hold).
        Delta stores take the Spark path (their files aren't ours to
        enumerate)."""
        if self.use_delta:
            return self.read(name).count()
        import pyarrow.parquet as pq

        version = self._current_version(name)
        if version is None:
            raise FileNotFoundError(
                f"table {name} does not exist under {self.root}"
            )
        total = 0
        for dirpath, _dirs, files in os.walk(
            os.path.join(self._dir(name), version)
        ):
            for fname in files:
                # only what the writer emits (ADVICE r13): a stray
                # temp/partial file from an interrupted write must not
                # fail the maintenance action — read() ignores it too
                if fname.startswith(("_", ".")) or not fname.endswith(
                    ".parquet"
                ):
                    continue
                total += pq.ParquetFile(
                    os.path.join(dirpath, fname)
                ).metadata.num_rows
        return total

    def prune_files_by_value(
        self, name: str, column: str, keep_values: set[str]
    ) -> int | None:
        """File-level prune (round 14, guide §1.2/§6): drop every data
        file whose ``column`` is a single constant NOT in
        ``keep_values``, by hardlinking only the kept files into a new
        version — driver-side, zero Spark jobs. Exact because append
        files carry one commit token each (the writer stamps a
        constant per append), so the parquet footer's min==max
        statistics decide a whole file.

        Returns the number of rows removed (0 = nothing to drop, no
        version churn). Returns ``None`` when the decision is not
        safely file-level — Delta store, partitioned layout, a file
        with multiple values / missing stats / nulls in ``column``, or
        every file dropping (an empty version needs a schema-carrying
        write) — and the caller falls back to the row-level path."""
        if self.use_delta or not self.exists(name):
            return None
        import pyarrow.parquet as pq

        version = self._current_version(name)
        vdir = os.path.join(self._dir(name), version)
        entries = sorted(os.listdir(vdir))
        if any(os.path.isdir(os.path.join(vdir, e)) for e in entries):
            return None  # partitioned layout: not flat-file decidable
        files = [
            e
            for e in entries
            if e.endswith(".parquet") and not e.startswith(("_", "."))
        ]
        kept: list[str] = []
        removed = 0
        for fname in files:
            meta = pq.ParquetFile(os.path.join(vdir, fname)).metadata
            try:
                idx = meta.schema.to_arrow_schema().names.index(column)
            except ValueError:
                return None
            values: set[str] = set()
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(idx).statistics
                if (
                    st is None
                    or not st.has_min_max
                    or st.null_count is None
                    or st.null_count > 0
                    or st.min != st.max
                ):
                    return None
                values.add(st.min)
            if len(values) != 1:
                return None
            if next(iter(values)) in keep_values:
                kept.append(fname)
            else:
                removed += meta.num_rows
        if removed == 0:
            return 0
        if not kept:
            return None  # empty result needs a schema-carrying write
        new_version = f"v_{time.time_ns():020d}_{uuid.uuid4().hex[:6]}"
        new_dir = os.path.join(self._dir(name), new_version)
        os.makedirs(new_dir)
        for fname in kept:
            os.link(
                os.path.join(vdir, fname), os.path.join(new_dir, fname)
            )
        self._swap_current(name, new_version)
        return removed

    def append(self, name: str, df: DataFrame) -> None:
        """S8 — append sink (NB_BRONZE:221-223). Delta appends are
        O(batch). The parquet fallback is ALSO O(batch) when the batch
        schema matches the stored schema (the steady-state case): only
        the batch's rows are written into the new version directory,
        and the current version's data files are hardlinked in beside
        them — same atomic pointer-swap commit, no read or rewrite of
        existing data. Schema-evolving appends (new/missing/retyped
        columns) take the read+union+commit path, which is O(table) —
        rare by construction (a schema change is a migration event)."""
        if self.use_delta:
            df.write.format("delta").mode("append").save(self._dir(name))
            return
        if self.exists(name):
            current = self.read(name)
            # Parquet reads surface every field nullable, so nullability
            # is not part of the compatibility check; ORDER matters only
            # for the write (all files in a version carry one layout),
            # so a column-permuted batch is realigned, not slow-pathed.
            cur_fields = [(f.name, f.dataType) for f in current.schema.fields]
            new_fields = {(f.name, f.dataType) for f in df.schema.fields}
            cur_dir = os.path.join(
                self._dir(name), self._current_version(name) or ""
            )
            flat = all(
                os.path.isfile(os.path.join(cur_dir, e))
                for e in os.listdir(cur_dir)
            )
            if (
                flat
                and len(df.schema.fields) == len(cur_fields)
                and set(cur_fields) == new_fields
            ):
                self._commit_version(
                    name,
                    df.select([n for n, _ in cur_fields]),
                    link_from=cur_dir,
                )
                return
            df = current.unionByName(df, allowMissingColumns=True)
        self._commit_version(name, df)

    def delete(self, name: str, condition: Column) -> int:
        """DELETE WHERE ``condition`` — the erasure sink (GDPR/CCPA
        right-to-be-forgotten, retention enforcement). Returns the
        number of rows removed.

        Delta: a native metadata DELETE (file-level rewrite of only
        the touched files). Fallback: anti-filter + version commit —
        atomic via the same pointer swap as every other write, and
        the pre-delete version remains readable through
        ``read_version`` until vacuumed (the audit trail an erasure
        workflow needs: provable before/after).
        """
        if not self.exists(name):
            return 0
        if self.use_delta:
            from delta.tables import DeltaTable

            t = DeltaTable.forPath(self.spark, self._dir(name))
            try:
                v0 = t.history(1).select("version").first()[0]
            except Exception:  # odd/empty history: no pre-version pin
                v0 = None
            t.delete(condition)
            # Pin OUR DELETE commit: the EARLIEST DELETE commit newer
            # than the pre-delete version observed above. Both
            # history(1) and max(version) race concurrent writers —
            # in particular a concurrent DELETE committed after ours
            # wins max(version), and versionAsOf dv-1 would then read
            # a post-our-delete snapshot and silently mis-count the
            # erasure. min(version > v0) identifies ours as tightly as
            # the history API allows without a transaction id.
            hist = t.history().where(F.col("operation") == "DELETE")
            if v0 is not None:
                hist = hist.where(F.col("version") > F.lit(int(v0)))
            ours = (
                hist.orderBy("version")
                .select("version", "operationMetrics")
                .first()
            )
            if ours is None:
                raise RuntimeError(
                    f"cannot pin DELETE commit for {name!r}: no DELETE "
                    f"newer than version {v0} in history"
                )
            metrics = ours["operationMetrics"] or {}
            if "numDeletedRows" in metrics:
                # the commit records the count — a metadata read, not
                # two full-table scans
                return int(metrics["numDeletedRows"])
            # metrics shape varies across Delta versions — recount the
            # predicate against the snapshot immediately before OUR
            # pinned commit via time travel. Never surface a negative
            # flag value: erasure audit rows consume this verbatim.
            dv = int(ours["version"])
            if dv < 1:
                raise RuntimeError(
                    f"cannot pin pre-delete snapshot for {name!r}: "
                    f"DELETE commit {dv} has no predecessor"
                )
            prev = (
                self.spark.read.format("delta")
                .option("versionAsOf", dv - 1)
                .load(self._dir(name))
            )
            return prev.where(condition.eqNullSafe(F.lit(True))).count()
        current = self.read(name)
        # SQL DELETE semantics: remove rows where the condition is
        # TRUE; NULL-condition rows are KEPT (three-valued logic —
        # plain ~condition would silently drop them AND exclude them
        # from the returned count, diverging from the Delta branch).
        is_hit = condition.eqNullSafe(F.lit(True))
        hits = current.where(is_hit).count()
        if hits == 0:
            return 0
        self._commit_version(name, current.where(~is_hit))
        return hits

    def merge(
        self,
        name: str,
        source: DataFrame,
        keys: list[str],
        update_only_changed: bool = True,
        compare_cols: list[str] | None = None,
        partition_col: str | None = None,
    ) -> MergeStats:
        """S10/J2/J3/P10 — MERGE upsert keyed on ``keys``.

        ``update_only_changed`` reproduces the SP's no-op-update
        elimination: a matched row is rewritten only when some non-key
        column differs null-safely (sp_upsert_claims.sql:19-20).
        ``compare_cols`` restricts that diff to business columns so
        run-metadata stamps (ModifiedDate, ProcessBatchID) don't force
        rewrites of semantically-unchanged rows.

        ``partition_col`` enables partition-pruned merges: the table
        is laid out hive-style on that column, the target side of the
        join reads ONLY partitions present in the source batch, and
        untouched partitions carry into the new version as hardlinks
        (no data movement). This is the 100 TB path — a daily batch
        touching 3 of 3,000 date partitions rewrites ~0.1% of the
        table. Requires the merge key to imply the partition (a key
        never moves partitions), which holds for date-keyed facts.
        """
        if not self.exists(name):
            if partition_col:
                self._commit_version(name, source, partition_by=partition_col)
            else:
                self._write_new(name, source)
            # inserted == rows just written: read it from the new
            # version's parquet footers instead of re-running the
            # source plan for a count (round 14, guide §1.2 — for a
            # DISTINCT-shaped staging source that count re-paid the
            # whole aggregate). Delta keeps the source count.
            n = source.count() if self.use_delta else self.count_rows(name)
            return MergeStats(inserted=n, updated=0)

        if partition_col and not self.use_delta:
            return self._merge_partitioned(
                name, source, keys, update_only_changed, compare_cols, partition_col
            )

        target = self.read(name)
        non_keys = [
            c
            for c in (compare_cols if compare_cols is not None else source.columns)
            if c not in keys
        ]

        if self.use_delta:
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
            dt = DeltaTable.forPath(self.spark, self._dir(name))
            builder = dt.alias("t").merge(source.alias("s"), cond)
            if update_only_changed and non_keys:
                changed = " OR ".join(f"NOT (t.{c} <=> s.{c})" for c in non_keys)
                builder = builder.whenMatchedUpdateAll(condition=changed)
            else:
                builder = builder.whenMatchedUpdateAll()
            builder.whenNotMatchedInsertAll().execute()
            # Delta returns operation metrics via history(); fallback
            # computes them directly — keep one accounting path:
            hist = dt.history(1).select("operationMetrics").first()[0]
            return MergeStats(
                inserted=int(hist.get("numTargetRowsInserted", 0)),
                updated=int(hist.get("numTargetRowsUpdated", 0)),
            )

        # --- parquet fallback: ONE full-outer join resolves the merge ----
        # (what Delta's MERGE does physically): target-only rows pass
        # through, matched-but-unchanged keep the target version
        # (preserves CreatedDate-style stamps), matched-and-changed and
        # source-only rows take the source version. Counts come from
        # the same cached join — no extra count-joins.
        t = target.withColumn("_t", F.lit(True)).alias("t")
        s = source.withColumn("_s", F.lit(True)).alias("s")
        key_cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
        j = t.join(s, key_cond, "full_outer").cache()

        t_present = F.col("t._t").isNotNull()
        s_present = F.col("s._s").isNotNull()
        if update_only_changed and non_keys:
            diff = F.lit(False)
            for c in non_keys:
                diff = diff | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
        else:
            diff = F.lit(True)

        counts = j.agg(
            F.sum((s_present & ~t_present).cast("long")).alias("ins"),
            F.sum((s_present & t_present & diff).cast("long")).alias("upd"),
        ).first()
        inserted, updated = int(counts["ins"] or 0), int(counts["upd"] or 0)

        take_source = s_present & (~t_present | diff)
        out_cols = [
            F.when(take_source, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            if c not in keys
            else F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
            for c in source.columns
        ]
        merged = j.select(out_cols)
        self._commit_version(name, merged)
        j.unpersist()
        return MergeStats(inserted=inserted, updated=updated)

    def _merge_partitioned(
        self,
        name: str,
        source: DataFrame,
        keys: list[str],
        update_only_changed: bool,
        compare_cols: list[str] | None,
        partition_col: str,
    ) -> MergeStats:
        """Partition-pruned merge: join only affected partitions,
        hardlink the rest into the new version (see ``merge``)."""
        affected = [
            r[0] for r in source.select(partition_col).distinct().collect()
        ]
        # isin() is null-unsafe: a null partition value in the source
        # would slice out NO target rows (null never matches isin) yet
        # Spark writes its data under __HIVE_DEFAULT_PARTITION__ — the
        # old null partition must be read-merged, not hardlinked.
        non_null = [v for v in affected if v is not None]
        slice_cond = F.col(partition_col).isin(non_null)
        if len(non_null) < len(affected):
            slice_cond = slice_cond | F.col(partition_col).isNull()
        target_slice = self.read(name).where(slice_cond)

        # same full-outer resolution as the unpartitioned path
        t = target_slice.withColumn("_t", F.lit(True)).alias("t")
        s = source.withColumn("_s", F.lit(True)).alias("s")
        key_cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
        j = t.join(s, key_cond, "full_outer").cache()
        t_present = F.col("t._t").isNotNull()
        s_present = F.col("s._s").isNotNull()
        non_keys = [
            c
            for c in (compare_cols if compare_cols is not None else source.columns)
            if c not in keys
        ]
        if update_only_changed and non_keys:
            diff = F.lit(False)
            for c in non_keys:
                diff = diff | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
        else:
            diff = F.lit(True)
        counts = j.agg(
            F.sum((s_present & ~t_present).cast("long")).alias("ins"),
            F.sum((s_present & t_present & diff).cast("long")).alias("upd"),
        ).first()
        take_source = s_present & (~t_present | diff)
        out_cols = [
            F.when(take_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            if c not in keys
            else F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
            for c in source.columns
        ]
        merged_slice = j.select(out_cols)

        # new version: Spark writes the affected partitions; untouched
        # partition dirs hardlink over from the current version.
        table_dir = self._dir(name)
        cur_version = self._current_version(name)
        new_version = f"v_{uuid.uuid4().hex[:12]}"
        new_dir = os.path.join(table_dir, new_version)
        merged_slice.write.mode("overwrite").partitionBy(partition_col).parquet(new_dir)
        # Untouched = not rewritten by Spark just now. Deriving the
        # affected dir names from the values would have to reproduce
        # Spark's hive escaping (%XX special chars, nulls →
        # __HIVE_DEFAULT_PARTITION__); instead, whatever Spark DID
        # write is by definition the affected set — hardlink only
        # partition dirs absent from the new version.
        written_dirs = {
            entry
            for entry in os.listdir(new_dir)
            if entry.startswith(f"{partition_col}=")
        }
        cur_dir = os.path.join(table_dir, cur_version)
        for entry in os.listdir(cur_dir):
            if entry.startswith(f"{partition_col}=") and entry not in written_dirs:
                src_part = os.path.join(cur_dir, entry)
                dst_part = os.path.join(new_dir, entry)
                os.makedirs(dst_part, exist_ok=True)
                for fname in os.listdir(src_part):
                    if not fname.startswith("_"):
                        os.link(
                            os.path.join(src_part, fname),
                            os.path.join(dst_part, fname),
                        )
        tmp_ptr = os.path.join(table_dir, f".{_CURRENT}.{uuid.uuid4().hex[:6]}")
        with open(tmp_ptr, "w") as f:
            f.write(new_version)
        os.replace(tmp_ptr, self._pointer(name))
        self._vacuum(name, keep=new_version)
        j.unpersist()
        return MergeStats(
            inserted=int(counts["ins"] or 0), updated=int(counts["upd"] or 0)
        )

    def compact(self, name: str, target_partitions: int | None = None) -> int:
        """OPTIMIZE analog: rewrite the table into few large files
        (append-heavy tables accrete small files; scans then pay
        per-file open cost). Returns the resulting partition count.
        With Delta this maps to OPTIMIZE/auto-compaction."""
        df = self.read(name)
        if target_partitions is None:
            # ~128 MB files: estimate from current size via the scan's
            # input files (cheap metadata)
            n_files = len(df.inputFiles()) or 1
            target_partitions = max(1, n_files // 8)
        self._commit_version(name, df.coalesce(target_partitions))
        return target_partitions

    # -- internals ----------------------------------------------------------
    def _write_new(self, name: str, df: DataFrame) -> None:
        self._commit_version(name, df)

    def _commit_version(
        self,
        name: str,
        df: DataFrame,
        partition_by: str | None = None,
        link_from: str | None = None,
    ) -> None:
        table_dir = self._dir(name)
        os.makedirs(table_dir, exist_ok=True)
        # nanosecond-prefixed ids sort lexicographically in commit
        # order: mtime alone ties on coarse-granularity filesystems,
        # which would let versions() return old/new in arbitrary
        # order and invert a CDC diff built on versions()[-2:]
        version = f"v_{time.time_ns():020d}_{uuid.uuid4().hex[:6]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        new_dir = os.path.join(table_dir, version)
        # label the write job with its table (guide §1.5) so store
        # writes are attributable in the UI/REST without guessing
        sc = self.spark.sparkContext
        prev = sc.getLocalProperty("spark.job.description")
        sc.setJobDescription(f"tablestore write: {name}")
        try:
            writer.parquet(new_dir)
        finally:
            sc.setJobDescription(prev)
        if link_from is not None:
            # O(batch) append: carry the previous version's data files
            # into the new version by hardlink (no data movement; part
            # filenames embed a per-write-job UUID, so names from
            # different commits can never collide)
            for fname in os.listdir(link_from):
                if not fname.startswith(("_", ".")):
                    os.link(
                        os.path.join(link_from, fname),
                        os.path.join(new_dir, fname),
                    )
        self._swap_current(name, version)

    def _swap_current(self, name: str, version: str) -> None:
        table_dir = self._dir(name)
        tmp_ptr = os.path.join(table_dir, f".{_CURRENT}.{uuid.uuid4().hex[:6]}"
                               )
        with open(tmp_ptr, "w") as f:
            f.write(version)
        os.replace(tmp_ptr, self._pointer(name))  # atomic commit
        self._vacuum(name, keep=version)

    def _vacuum(self, name: str, keep: str) -> None:
        """Prune old version dirs, keeping the newest few for readers
        mid-scan (Delta vacuum analog, drastically simplified).
        "Newest" by directory mtime — version names are random hex, so
        a lexicographic sort would retain arbitrary versions and could
        delete the one a reader just opened."""
        table_dir = self._dir(name)

        def _mtime(d: str) -> float:
            try:
                return os.stat(os.path.join(table_dir, d)).st_mtime
            except OSError:
                return 0.0

        versions = sorted(
            (
                d
                for d in os.listdir(table_dir)
                if d.startswith("v_") and d != keep
            ),
            key=_mtime,
        )
        for stale in versions[:-_KEEP_VERSIONS]:
            shutil.rmtree(os.path.join(table_dir, stale), ignore_errors=True)
