"""Collection schema system: declared fields, indexes, functions, partitions.

Re-expresses the reference's schema spec semantics
(``milvus-bricks/milvus_client/common/schema.py:13-62``) on Spark types:

* ``FieldSpec`` — name, dtype, primary, auto_id, nullable, is_partition_key,
  dim, max_length, element_type, max_capacity, enable_analyzer (schema.py:13-27)
* ``IndexSpec`` — field, index_type, metric_type, params (schema.py:29-34)
* ``FunctionSpec`` — BM25 input/output fields (schema.py:37-43)
* ``SchemaSpec`` — fields + indexes + functions + enable_dynamic_field +
  num_partitions/partitions + checksum_fields (schema.py:47-62)

Validation rules ported from schema.py:175-243:
  - exactly one primary-key field
  - auto_id only on the PK
  - at most one partition key, INT64 or VARCHAR only
  - partition key XOR explicit partition list
  - vector fields require dim (except sparse)
  - ARRAY fields require element_type

Type mapping (SURVEY.md §1.4): precision vector variants (FLOAT16/BFLOAT16/
INT8) compute in float32 — ArrayType(FloatType); BINARY_VECTOR packs to
BinaryType; SPARSE_FLOAT_VECTOR is MapType(int→float); GEOMETRY is WKT text;
dynamic fields land in a MapType(string→string) catch-all column.

Index specs are *physical hints* here: Catalyst has no scalar secondary
indexes, so BITMAP/INVERTED/STL_SORT/TRIE/NGRAM map to layout advice
(sort/bucket on write) and vector index types map to the IVF builder
(operators/ann_index.py). They are validated and carried as metadata so
catalog round-trips preserve them (reference C8 validation,
validate_index_compatibility.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

# ------------------------------------------------------------------- dtypes

SCALAR_DTYPES: dict[str, T.DataType] = {
    "BOOL": T.BooleanType(),
    "INT8": T.ByteType(),
    "INT16": T.ShortType(),
    "INT32": T.IntegerType(),
    "INT64": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "JSON": T.StringType(),           # JSON text + JSON-path accessors
    "GEOMETRY": T.StringType(),       # WKT ("POINT (x y)")
    "TIMESTAMPTZ": T.TimestampType(),  # UTC
}

VECTOR_DTYPES: dict[str, T.DataType] = {
    "FLOAT_VECTOR": T.ArrayType(T.FloatType()),
    "FLOAT16_VECTOR": T.ArrayType(T.FloatType()),   # compute in fp32
    "BFLOAT16_VECTOR": T.ArrayType(T.FloatType()),  # compute in fp32
    "INT8_VECTOR": T.ArrayType(T.FloatType()),      # compute in fp32
    "BINARY_VECTOR": T.BinaryType(),                # packed bits
    "SPARSE_FLOAT_VECTOR": T.MapType(T.IntegerType(), T.FloatType()),
}

VECTOR_INDEX_TYPES = {
    "HNSW", "FLAT", "IVF_FLAT", "IVF_SQ8", "IVF_RABITQ", "DISKANN",
    "AUTOINDEX", "BIN_IVF_FLAT", "SPARSE_INVERTED_INDEX",
}
SCALAR_INDEX_TYPES = {"BITMAP", "INVERTED", "STL_SORT", "TRIE", "NGRAM",
                      "RTREE", "AUTOINDEX"}
METRIC_TYPES = {"L2", "IP", "COSINE", "HAMMING", "BM25"}

PARTITION_KEY_DTYPES = {"INT64", "VARCHAR"}

DYNAMIC_FIELD_COL = "_dynamic"  # MapType(string→string) catch-all


class SchemaError(ValueError):
    """Raised for spec violations (reference schema.py:175-243 rules)."""


# -------------------------------------------------------------------- specs

@dataclass
class FieldSpec:
    name: str
    dtype: str
    primary: bool = False
    auto_id: bool = False
    nullable: bool = False
    is_partition_key: bool = False
    dim: int | None = None
    max_length: int | None = None
    element_type: str | None = None
    max_capacity: int | None = None
    enable_analyzer: bool = False
    analyzer_params: dict | None = None
    # 3.0-roadmap STRUCT_ARRAY (feature-inventory doc §1): an array of
    # structs whose subfields are declared like top-level fields —
    # scalars, ARRAYs, or vector dtypes (the "embedding list" case is a
    # FLOAT_VECTOR subfield). One nesting level, matching the roadmap.
    subfields: "list[FieldSpec] | None" = None

    @property
    def is_vector(self) -> bool:
        return self.dtype in VECTOR_DTYPES

    def spark_type(self) -> T.DataType:
        if self.dtype in VECTOR_DTYPES:
            return VECTOR_DTYPES[self.dtype]
        if self.dtype == "ARRAY":
            if self.element_type not in SCALAR_DTYPES:
                raise SchemaError(
                    f"field {self.name}: ARRAY element_type "
                    f"{self.element_type!r} is not a scalar dtype")
            return T.ArrayType(SCALAR_DTYPES[self.element_type])
        if self.dtype == "STRUCT_ARRAY":
            if not self.subfields:
                raise SchemaError(
                    f"field {self.name}: STRUCT_ARRAY needs subfields")
            return T.ArrayType(T.StructType([
                T.StructField(sf.name, sf.spark_type(), sf.nullable)
                for sf in self.subfields]))
        if self.dtype in SCALAR_DTYPES:
            return SCALAR_DTYPES[self.dtype]
        raise SchemaError(f"field {self.name}: unknown dtype {self.dtype!r}")


@dataclass
class IndexSpec:
    field: str
    index_type: str
    metric_type: str | None = None
    params: dict = dc_field(default_factory=dict)


@dataclass
class FunctionSpec:
    """Server-computed field function — BM25 text→sparse (schema.py:37-43),
    plus the 3.0-roadmap TEXT_EMBEDDING family (feature-inventory doc §6
    "Function / Model Provider"): text → SPARSE_FLOAT_VECTOR via the
    built-in deterministic hashing featurizer; ``params`` carries
    provider knobs (n_buckets)."""
    name: str
    function_type: str  # "BM25" | "TEXT_EMBEDDING"
    input_field: str
    output_field: str
    params: dict | None = None


@dataclass
class SchemaSpec:
    name: str
    fields: list[FieldSpec]
    indexes: list[IndexSpec] = dc_field(default_factory=list)
    functions: list[FunctionSpec] = dc_field(default_factory=list)
    enable_dynamic_field: bool = False
    num_partitions: int | None = None
    partitions: list[str] | None = None
    checksum_fields: list[str] | None = None
    # collection TTL (reference 2.6/common.py:1050-1053): rows expire
    # ttl_seconds after ingest; 0/None disables (Milvus convention).
    # Spark mapping: ingest-timestamp stamp + read-time filter.
    ttl_seconds: int | None = None
    # entity-level TTL (3.0-roadmap, feature-inventory doc §4): names an
    # integer field holding a PER-ROW ttl-seconds override; NULL in a
    # row falls back to ttl_seconds (or never expires when that is also
    # unset). Same ingest-stamp + read-filter mapping as ttl_seconds.
    ttl_field: str | None = None
    # shards_num (reference 2.6/common.py:1054-1055): write-path hash
    # distribution of the PK across shards. Spark mapping: repartition by
    # hash(pk) into shards_num tasks before the write, so every insert
    # lands shards_num parquet files per partition — write parallelism and
    # file sizing at scale. None → leave incoming partitioning alone.
    shards_num: int | None = None

    # -- accessors ---------------------------------------------------------
    @property
    def pk(self) -> FieldSpec:
        return next(f for f in self.fields if f.primary)

    @property
    def partition_key(self) -> FieldSpec | None:
        return next((f for f in self.fields if f.is_partition_key), None)

    @property
    def vector_fields(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.is_vector]

    def field(self, name: str) -> FieldSpec:
        return next(f for f in self.fields if f.name == name)

    # -- validation (schema.py:175-243) ------------------------------------
    def validate(self) -> "SchemaSpec":
        names = [f.name for f in self.fields]
        if len(names) != len(set(names)):
            raise SchemaError(f"{self.name}: duplicate field names")

        pks = [f for f in self.fields if f.primary]
        if len(pks) != 1:
            raise SchemaError(
                f"{self.name}: exactly one primary field required, got {len(pks)}")
        pk = pks[0]
        if pk.dtype not in ("INT64", "VARCHAR"):
            raise SchemaError(f"{self.name}: PK must be INT64 or VARCHAR")
        if pk.nullable:
            raise SchemaError(f"{self.name}: PK cannot be nullable")

        for f in self.fields:
            if f.auto_id and not f.primary:
                raise SchemaError(
                    f"{self.name}: auto_id only allowed on the primary field")

        pkeys = [f for f in self.fields if f.is_partition_key]
        if len(pkeys) > 1:
            raise SchemaError(f"{self.name}: at most one partition key")
        if pkeys and pkeys[0].dtype not in PARTITION_KEY_DTYPES:
            raise SchemaError(
                f"{self.name}: partition key must be INT64 or VARCHAR")
        if pkeys and pkeys[0].primary:
            raise SchemaError(f"{self.name}: PK cannot be the partition key")
        if pkeys and self.partitions:
            raise SchemaError(
                f"{self.name}: partition key and explicit partitions are "
                f"mutually exclusive")

        for f in self.fields:
            if f.is_vector and f.dtype != "SPARSE_FLOAT_VECTOR" \
                    and f.dtype != "BINARY_VECTOR" and not f.dim:
                raise SchemaError(f"{self.name}: vector field {f.name} needs dim")
            if f.dtype == "STRUCT_ARRAY":
                subs = f.subfields or []
                if not subs:
                    raise SchemaError(
                        f"{self.name}: STRUCT_ARRAY {f.name} needs subfields")
                if len({s.name for s in subs}) != len(subs):
                    raise SchemaError(
                        f"{self.name}: duplicate subfield names in {f.name}")
                for s in subs:
                    if s.dtype == "STRUCT_ARRAY":
                        raise SchemaError(
                            f"{self.name}: {f.name}.{s.name}: one nesting "
                            f"level only (roadmap §1)")
                    if s.primary or s.is_partition_key or s.auto_id:
                        raise SchemaError(
                            f"{self.name}: subfield {f.name}.{s.name} "
                            f"cannot be PK/partition key/auto_id")
                    if s.is_vector and s.dtype not in (
                            "SPARSE_FLOAT_VECTOR", "BINARY_VECTOR") \
                            and not s.dim:
                        raise SchemaError(
                            f"{self.name}: vector subfield "
                            f"{f.name}.{s.name} needs dim")
                    if s.dtype == "ARRAY" and not s.element_type:
                        raise SchemaError(
                            f"{self.name}: ARRAY subfield "
                            f"{f.name}.{s.name} needs element_type")
                    if s.dtype == "VARCHAR" and s.max_length is not None \
                            and s.max_length <= 0:
                        raise SchemaError(
                            f"{self.name}: VARCHAR {f.name}.{s.name} "
                            f"max_length must be > 0")
                    # surface any remaining dtype problem at validate
                    # time, not at the first insert's spark_type() call
                    s.spark_type()
            if f.dtype == "BINARY_VECTOR" and not f.dim:
                raise SchemaError(f"{self.name}: binary vector {f.name} needs dim")
            if f.dtype == "ARRAY" and not f.element_type:
                raise SchemaError(
                    f"{self.name}: ARRAY field {f.name} needs element_type")
            if f.dtype == "VARCHAR" and f.max_length is not None \
                    and f.max_length <= 0:
                raise SchemaError(
                    f"{self.name}: VARCHAR {f.name} max_length must be > 0")

        fields_by_name = {f.name for f in self.fields}
        for ix in self.indexes:
            if ix.field not in fields_by_name:
                raise SchemaError(
                    f"{self.name}: index on unknown field {ix.field}")
            if ix.index_type not in VECTOR_INDEX_TYPES | SCALAR_INDEX_TYPES:
                raise SchemaError(
                    f"{self.name}: unknown index type {ix.index_type}")
            if ix.metric_type is not None and ix.metric_type not in METRIC_TYPES:
                raise SchemaError(
                    f"{self.name}: unknown metric {ix.metric_type}")
        for fn in self.functions:
            if fn.input_field not in fields_by_name \
                    or fn.output_field not in fields_by_name:
                raise SchemaError(
                    f"{self.name}: function {fn.name} references unknown fields")
            if fn.function_type not in ("BM25", "TEXT_EMBEDDING"):
                raise SchemaError(
                    f"{self.name}: unknown function type {fn.function_type}")
            out_dtype = next(f.dtype for f in self.fields
                             if f.name == fn.output_field)
            if fn.function_type == "TEXT_EMBEDDING":
                # built-in hashing featurizer emits SPARSE_FLOAT_VECTOR;
                # a registered external provider (roadmap §6, pluggable
                # seam in functions/providers.py) declares its own output
                # shape — dense FLOAT_VECTOR for typical model endpoints
                provider = (fn.params or {}).get("provider")
                if provider in (None, "hashing"):
                    want = ("SPARSE_FLOAT_VECTOR",)
                else:
                    # a registered provider declares its output shape —
                    # check the exact dtype HERE so a dense provider
                    # wired to a sparse field fails at create time with
                    # a SchemaError, not at the first insert with an
                    # opaque Spark analysis error. An unregistered name
                    # can't be checked yet (providers register
                    # process-globally, possibly after create): keep the
                    # permissive either-vector check; the insert raises
                    # unknown-provider before anything is written.
                    from vectordb_testbricks_spark.functions.providers \
                        import EMBEDDING_PROVIDERS
                    p = EMBEDDING_PROVIDERS.get(provider)
                    if p is not None:
                        want = ("FLOAT_VECTOR",) \
                            if p.output_type.startswith("array") \
                            else ("SPARSE_FLOAT_VECTOR",)
                    else:
                        want = ("SPARSE_FLOAT_VECTOR", "FLOAT_VECTOR")
                if out_dtype not in want:
                    raise SchemaError(
                        f"{self.name}: TEXT_EMBEDDING output field "
                        f"{fn.output_field!r} must be "
                        f"{' or '.join(want)}"
                        + (f" (provider {provider!r} emits "
                           f"{p.output_type})"
                           if provider not in (None, "hashing")
                           and p is not None else ""))
                if (provider not in (None, "hashing")
                        and p is not None and out_dtype == "FLOAT_VECTOR"):
                    # dense width check at CREATE time (r08 ADVICE): a
                    # dim-16 field fed by a provider emitting 8-wide
                    # vectors would otherwise store mis-shaped rows
                    # silently — params["dim"] overrides the provider's
                    # declared default width
                    out_field = next(f for f in self.fields
                                     if f.name == fn.output_field)
                    fn_dim = (fn.params or {}).get("dim", p.default_dim)
                    if (out_field.dim is not None and fn_dim is not None
                            and int(fn_dim) != int(out_field.dim)):
                        raise SchemaError(
                            f"{self.name}: TEXT_EMBEDDING provider "
                            f"{provider!r} emits dim={fn_dim} vectors but "
                            f"output field {fn.output_field!r} declares "
                            f"dim={out_field.dim}; set params['dim'] or "
                            f"fix the field dim")
        if self.ttl_field is not None:
            fld = next((f for f in self.fields
                        if f.name == self.ttl_field), None)
            if fld is None or fld.dtype not in ("INT8", "INT16", "INT32",
                                                "INT64"):
                raise SchemaError(
                    f"{self.name}: ttl_field {self.ttl_field!r} must name "
                    f"an integer field")
        return self

    # -- Spark mapping ------------------------------------------------------
    def to_struct_type(self) -> T.StructType:
        out = [T.StructField(f.name, f.spark_type(), f.nullable)
               for f in self.fields]
        if self.enable_dynamic_field:
            out.append(T.StructField(
                DYNAMIC_FIELD_COL, T.MapType(T.StringType(), T.StringType()),
                True))
        return T.StructType(out)
