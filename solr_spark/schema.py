"""Schema system: explicit + dynamic fields, copyField, uniqueKey,
schemaless type inference, Schema-API JSON roundtrip.

Reference:

- ``schema/IndexSchema.java:137-146`` — dynamicField glob resolution:
  patterns sorted by length (longest wins), first match; per-name LRU.
- ``schema/CopyField.java`` + ``update/DocumentBuilder.java:183-203`` —
  copyField fans source values into dest fields at index time
  (globs allowed on the source side).
- ``IndexSchema.java:330-341`` — uniqueKey: required, single-valued.
- ``update/processor/AddSchemaFieldsUpdateProcessorFactory.java`` +
  ``Parse{Long,Double,Boolean,Date}FieldUpdateProcessorFactory`` —
  schemaless mode: parse-probe unknown string fields, mutate the
  managed schema with the narrowest type every value fits.
- Schema API GET shape (``handler/SchemaHandler.java``):
  ``{"schema": {"name", "uniqueKey", "fields", "dynamicFields",
  "copyFields"}}``.

Spark restatement: resolution/copyField/inference are all DRIVER-side
schema decisions compiled into one ``select()`` of pure column
expressions — the data path stays JVM-side and map-only. Schemaless
inference is one aggregation over the batch (count parse-failures per
candidate type), the set-oriented equivalent of the reference's
per-document probe-and-mutate loop.
"""

from __future__ import annotations

import fnmatch
import functools
import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Solr fieldType name → Spark SQL cast target for this engine's needs
TYPE_CASTS = {
    "string": "string",
    "text_general": "string",
    "plong": "long",
    "pint": "int",
    "pdouble": "double",
    "pfloat": "float",
    "boolean": "boolean",
    "pdate": "timestamp",
}


@dataclass
class FieldSpec:
    name: str
    type: str
    required: bool = False
    multi_valued: bool = False


@dataclass
class SchemaRegistry:
    """IndexSchema analog: explicit fields + dynamic globs + copyFields."""

    name: str = "managed"
    unique_key: str | None = None
    fields: dict[str, FieldSpec] = field(default_factory=dict)
    dynamic: list[tuple[str, str]] = field(default_factory=list)  # (glob, type)
    copy_fields: list[tuple[str, str]] = field(default_factory=list)  # (src glob, dest)

    def __post_init__(self):
        # longest-pattern-wins, stable within equal lengths — the
        # IndexSchema.java ordering contract
        self._dyn_sorted = sorted(
            enumerate(self.dynamic), key=lambda t: (-len(t[1][0]), t[0])
        )
        self._resolve_cached = functools.lru_cache(maxsize=1024)(self._resolve)

    # -- resolution ---------------------------------------------------------

    def _resolve(self, name: str) -> FieldSpec | None:
        if name in self.fields:
            return self.fields[name]
        for _, (pat, typ) in self._dyn_sorted:
            if fnmatch.fnmatchcase(name, pat):
                return FieldSpec(name, typ)
        return None

    def resolve(self, name: str) -> FieldSpec | None:
        """Explicit field, else the LONGEST matching dynamic pattern
        (LRU-cached per name, like IndexSchema's dynamicFieldCache)."""
        return self._resolve_cached(name)

    # -- application --------------------------------------------------------

    def apply(self, df: DataFrame) -> DataFrame:
        """Compile the schema against a batch: resolve every column
        (unresolvable names raise, matching Solr's "unknown field"), cast
        to the resolved type, apply copyFields (source globs fan into
        dest via concat_ws for text dests), and enforce uniqueKey
        presence. One select — map-only."""
        cols = []
        for c in df.columns:
            spec = self.resolve(c)
            if spec is None:
                raise ValueError(f"unknown field '{c}' (no explicit or dynamic match)")
            cast = TYPE_CASTS.get(spec.type, "string")
            cols.append(F.col(c).cast(cast).alias(c))
        out = df.select(*cols)
        # group rules by dest: ALL matching sources fan into one value
        # (DocumentBuilder appends each copyField's value; order =
        # declaration order, sources expanded in column order per glob)
        by_dest: dict[str, list[str]] = {}
        for src_glob, dest in self.copy_fields:
            for c in df.columns:
                if fnmatch.fnmatchcase(c, src_glob):
                    by_dest.setdefault(dest, []).append(c)
        for dest, srcs in by_dest.items():
            out = out.withColumn(
                dest, F.concat_ws(" ", *[F.col(s).cast("string") for s in srcs])
            )
        if self.unique_key:
            if self.unique_key not in out.columns:
                raise ValueError(f"uniqueKey field '{self.unique_key}' missing")
            out = out.where(F.col(self.unique_key).isNotNull())
        return out

    # -- Schema API JSON roundtrip -------------------------------------------

    def to_managed_json(self) -> str:
        return json.dumps({
            "schema": {
                "name": self.name,
                "uniqueKey": self.unique_key,
                "fields": [
                    {"name": s.name, "type": s.type, "required": s.required,
                     "multiValued": s.multi_valued}
                    for s in self.fields.values()
                ],
                "dynamicFields": [
                    {"name": pat, "type": typ} for pat, typ in self.dynamic
                ],
                "copyFields": [
                    {"source": src, "dest": dest} for src, dest in self.copy_fields
                ],
            }
        })

    @classmethod
    def from_managed_json(cls, payload: str) -> "SchemaRegistry":
        s = json.loads(payload)["schema"]
        return cls(
            name=s.get("name", "managed"),
            unique_key=s.get("uniqueKey"),
            fields={
                f["name"]: FieldSpec(
                    f["name"], f["type"], f.get("required", False),
                    f.get("multiValued", False),
                )
                for f in s.get("fields", [])
            },
            dynamic=[(d["name"], d["type"]) for d in s.get("dynamicFields", [])],
            copy_fields=[(c["source"], c["dest"]) for c in s.get("copyFields", [])],
        )


# ---------------------------------------------------------------------------
# schemaless inference (AddSchemaFieldsUpdateProcessor, batch form)
# ---------------------------------------------------------------------------

#: probe order = the reference's processor chain order, narrowest first
_PROBE_ORDER = ("plong", "pdouble", "boolean", "pdate")
_PROBE_CAST = {"plong": "long", "pdouble": "double", "boolean": "boolean",
               "pdate": "timestamp"}


def infer_schemaless_types(df: DataFrame, columns: list[str] | None = None) -> dict[str, str]:
    """Infer the narrowest type every non-null value of each string
    column parses as — ONE aggregation over the batch (the set-oriented
    ``Parse*FieldUpdateProcessor`` chain: the reference probes each
    document and mutates the managed schema; the batch equivalent counts
    parse failures per candidate type and picks the first with zero).

    Returns {column: fieldType} with 'string' as the fallthrough.
    """
    columns = columns or [c for c, t in df.dtypes if t == "string"]
    aggs = []
    for c in columns:
        nn = F.count(F.col(c))
        aggs.append(nn.alias(f"{c}__nn"))
        for t in _PROBE_ORDER:
            # try_cast: probe must yield NULL on parse failure (ANSI mode
            # makes plain cast throw)
            probe = F.col(c).try_cast(_PROBE_CAST[t])
            if t == "boolean":
                # Spark casts 'yes'/'t'/'1' etc.; the reference's
                # ParseBoolean accepts only true/false — match that
                probe = F.when(F.lower(F.col(c)).isin("true", "false"),
                               F.lit(True)).otherwise(F.lit(None))
            aggs.append(F.count(probe).alias(f"{c}__{t}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in columns:
        nn = row[f"{c}__nn"]
        chosen = "string"
        if nn:
            for t in _PROBE_ORDER:
                if row[f"{c}__{t}"] == nn:
                    chosen = t
                    break
        out[c] = chosen
    return out


def apply_inferred_types(df: DataFrame, inferred: dict[str, str]) -> DataFrame:
    """Cast columns to their inferred types (map-only select)."""
    cols = []
    for c in df.columns:
        t = inferred.get(c)
        cols.append(F.col(c).cast(_PROBE_CAST[t]).alias(c) if t and t != "string"
                    else F.col(c))
    return df.select(*cols)
