"""Spec-driven feature pipeline: a declarative JSON feature spec applied
as Column expressions — the Spark rendering of the reference's
``DataSpec`` (``docs/tutorial/ranking/data.py:39-146``: per-feature
``{name, dtype, type, default, norm, log, embedding{size, dimension}}``,
numeric transform at ``:148-165``, categorical at ``:166-199``).

Numeric features: sentinel imputation (``x >= 0`` validity) -> optional
``log1p`` -> optional ``x / norm`` — all whole-stage-codegen expressions.
Categorical features: imputation -> ``id % embedding_size`` bucketing;
the embedding join itself is :func:`~hybridbackend_spark.operators.joins.
lookup_join` (scalar ids) or :func:`~...joins.pooled_lookup` (list ids) —
the spec records the embedding geometry, the join operators do the work.

At scale this is config, not code: the same JSON spec that drives the
reference's TF pipeline drives this one, and every transform stays
JVM-side.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .feature import impute, log1p_feature, mod_bucket, normalize

__all__ = ["EmbeddingSpec", "FeatureSpec", "DataSpec", "CorpusSpec"]


@dataclass(frozen=True)
class EmbeddingSpec:
    """Embedding geometry for a categorical feature (reference
    ``data.py:26-36``)."""

    size: int
    dimension: int


@dataclass(frozen=True)
class FeatureSpec:
    """One feature's declarative transform recipe (reference
    ``data.py:96-103``). ``type`` is ``"scalar"`` or ``"list"``."""

    name: str
    dtype: str
    type: str = "scalar"
    default: Any = None
    norm: float | None = None
    log: bool | None = None
    embedding: EmbeddingSpec | None = None

    @property
    def is_categorical(self) -> bool:
        return self.embedding is not None


class DataSpec:
    """Reads the reference's JSON spec format and applies it to a
    DataFrame declaratively (reference ``DataSpec.read``,
    ``data.py:46-66``)."""

    def __init__(
        self,
        items: Sequence[dict],
        disable_imputation: bool = False,
        disable_transform: bool = False,
        override_embedding_size: int | None = None,
    ):
        if not isinstance(items, (list, tuple)):
            raise ValueError("items must be a list")
        self.disable_imputation = disable_imputation
        self.disable_transform = disable_transform
        specs = []
        for item in items:
            emb = None
            if "embedding" in item:
                emb = EmbeddingSpec(
                    item["embedding"]["size"]
                    if override_embedding_size is None
                    else override_embedding_size,
                    item["embedding"]["dimension"],
                )
            specs.append(
                FeatureSpec(
                    item["name"],
                    item["dtype"],
                    item.get("type", "scalar"),
                    item.get("default"),
                    item.get("norm"),
                    item.get("log"),
                    emb,
                )
            )
        self.feature_specs: list[FeatureSpec] = specs

    @classmethod
    def read(cls, path: str, **kwargs) -> "DataSpec":
        with open(path, encoding="utf8") as f:
            return cls(json.load(f), **kwargs)

    def __iter__(self):
        return iter(self.feature_specs)

    @property
    def defaults(self) -> dict[str, Any]:
        return {s.name: s.default for s in self.feature_specs}

    @property
    def norms(self) -> dict[str, float | None]:
        return {s.name: s.norm for s in self.feature_specs}

    @property
    def logs(self) -> dict[str, bool | None]:
        return {s.name: s.log for s in self.feature_specs}

    @property
    def embedding_sizes(self) -> dict[str, int | None]:
        return {
            s.name: s.embedding.size if s.embedding else None
            for s in self.feature_specs
        }

    @property
    def embedding_dims(self) -> dict[str, int | None]:
        return {
            s.name: s.embedding.dimension if s.embedding else None
            for s in self.feature_specs
        }

    def numeric_column(self, spec: FeatureSpec) -> Column:
        """Impute -> log1p -> normalize, per the spec flags (reference
        ``transform_numeric``, ``data.py:148-165``)."""
        c: Column = F.col(spec.name)
        if not self.disable_imputation and spec.default is not None:
            c = impute(c, spec.default)
        c = c.cast("double")
        if not self.disable_transform and spec.log:
            c = log1p_feature(c)
        if not self.disable_transform and spec.norm is not None:
            c = normalize(c, spec.norm)
        return c

    def categorical_id_column(self, spec: FeatureSpec) -> Column:
        """Impute -> ``id % embedding_size`` (reference
        ``transform_categorical``, ``data.py:166-183``). For list-type
        features the modulo maps over the array elements."""
        assert spec.embedding is not None
        size = spec.embedding.size
        if spec.type == "list":
            ids = F.col(spec.name)
            if not self.disable_imputation and spec.default is not None:
                ids = F.transform(ids, lambda x: impute(x, spec.default))
            return F.transform(ids, lambda x: mod_bucket(x, size))
        c: Column = F.col(spec.name)
        if not self.disable_imputation and spec.default is not None:
            c = impute(c, spec.default)
        return mod_bucket(c, size)

    def apply(self, df: DataFrame) -> DataFrame:
        """Apply every spec whose feature exists in ``df``: numeric
        features become transformed doubles, categorical features become
        bucketed embedding ids (ready for ``lookup_join`` /
        ``pooled_lookup``). Unlisted columns pass through untouched."""
        out = df
        for spec in self.feature_specs:
            if spec.name not in df.columns:
                continue
            col = (
                self.categorical_id_column(spec)
                if spec.is_categorical
                else self.numeric_column(spec)
            )
            out = out.withColumn(spec.name, col)
        return out


class CorpusSpec:
    """Config-as-code for the corpus-curation side: a JSON stage list
    drives the text-pipeline operators the way :class:`DataSpec` drives
    feature transforms — the same declarative philosophy the reference
    applies to its data pipelines, extended to curation.

    Stages (applied in order):
    - ``{"op": "quality_filter", "min_score": 0.5}`` — keep docs at or
      above the heuristic quality score;
    - ``{"op": "length_filter", "min_tokens": n, "max_tokens": m}``;
    - ``{"op": "exact_dedup"}`` — normalized-text exact dedup (min id
      survives);
    - ``{"op": "minhash_dedup", "threshold": 0.8, "keep": "longest"}``;
    - ``{"op": "boilerplate_prune", "max_df": 2}`` (rewrites text);
    - ``{"op": "hash_split", "weights": {"train": 0.98, ...}}`` —
      appends the split column;
    - ``{"op": "sample", "fraction": 0.5}`` — deterministic hash-rate
      sample.

    Every stage resolves to the existing oracled operators, so a spec
    run is exactly the composition a hand-written pipeline would be
    (tested equal in tests/test_windows_features.py).
    """

    def __init__(self, stages: Sequence[dict]):
        self.stages = list(stages)

    @classmethod
    def read(cls, text: str) -> "CorpusSpec":
        return cls(json.loads(text))

    def apply(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        from ..operators.corpus import boilerplate_prune, hash_split, hash_bucket
        from ..operators.dedup import exact_dedup, minhash_lsh_dedup
        from ..operators.text import quality_score, token_count

        out = df
        for st in self.stages:
            op = st["op"]
            if op == "quality_filter":
                out = out.filter(
                    quality_score(F.col(text_col)) >= st["min_score"]
                )
            elif op == "length_filter":
                n = token_count(F.col(text_col))
                if "min_tokens" in st:
                    out = out.filter(n >= st["min_tokens"])
                if "max_tokens" in st:
                    out = out.filter(n <= st["max_tokens"])
            elif op == "exact_dedup":
                keep = exact_dedup(out, text_col, id_col).select(id_col)
                out = out.join(keep, id_col, "left_semi")
            elif op == "minhash_dedup":
                keep = minhash_lsh_dedup(
                    out, text_col, id_col,
                    threshold=st.get("threshold", 0.8),
                    keep=st.get("keep", "min_id"),
                )
                out = out.join(keep, id_col, "left_semi")
            elif op == "boilerplate_prune":
                pruned = boilerplate_prune(
                    out, id_col, text_col, max_df=st.get("max_df", 2)
                ).select(id_col, F.col("pruned_text").alias(text_col))
                out = out.drop(text_col).join(pruned, id_col)
            elif op == "hash_split":
                out = hash_split(
                    out, F.col(id_col), weights=st.get("weights"),
                    seed=st.get("seed", 0),
                )
            elif op == "sample":
                frac = float(st["fraction"])
                bucket = hash_bucket(
                    F.col(id_col), n_buckets=1_000_000,
                    seed=st.get("seed", 0),
                )
                out = out.filter(bucket < int(frac * 1_000_000))
            else:
                raise ValueError(f"unknown corpus stage op: {op!r}")
        return out
