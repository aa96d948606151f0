"""Learning-to-Rank rerank: Solr's LTR contrib re-expressed for this engine.

Solr's LTR module (public reference guide, "Learning To Rank") rescores
the top ``reRankDocs`` of a query with a trained model over named
FEATURES, requested as ``rq={!ltr model=myModel reRankDocs=100
efi.userQuery='...'}``, with the extracted vector available through the
``fl=[features]`` doc transformer. This module implements the documented
feature classes and the two documented model classes over the engine's
rerank window:

Features (the upstream class names, minus the java packaging):

- ``original_score(name)`` — OriginalScoreFeature: the main query's BM25
  score for the doc.
- ``field_value(name, field)`` — FieldValueFeature: a stored numeric
  field's value (missing/null -> 0.0, the upstream default).
- ``solr_query(name, q)`` — SolrFeature with a ``q``: the BM25 score of
  another query against this index (no match -> 0.0). ``${key}``
  placeholders substitute from the request's ``efi.key`` params
  (external feature information), exactly the upstream templating.
- ``value(name, v)`` — ValueFeature: a constant, or ``"${key}"`` resolved
  from efi at request time.

Normalizers (per feature, like the upstream MinMaxNormalizer /
StandardNormalizer): ``("minmax", lo, hi)`` -> (x-lo)/(hi-lo),
``("standard", mean, std)`` -> (x-mean)/std.

Models:

- :class:`LinearModel` — score = sum_i w_i * norm_i(x_i).
- :class:`TreesModel` — MultipleAdditiveTreesModel: a weighted ensemble
  of binary decision trees; at each node ``feature <= threshold`` goes
  left, else right (the upstream split rule); tree outputs sum weighted.

Scale shape: feature extraction touches ONLY the rerank window (<=
reRankDocs ids, a driver-side list): field values come from one
isin-pruned stored fetch, each solrQuery feature is one pruned postings
pass cut to the window ids BEFORE collect. Model evaluation is numpy
over an (window x n_features) matrix — thousands of rows, never the
corpus. The window-then-tail page rule matches the engine's
:meth:`~..query.engine.BM25Index.search_reranked` (Lucene rescorer
convention: the rescored window precedes the untouched tail).

Reference provenance: the reference talks to stock Solr 9 (pom.xml
solr-core), whose LTR contrib exposes exactly this request surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Mapping

import numpy as np

__all__ = [
    "Feature",
    "original_score",
    "field_value",
    "solr_query",
    "value",
    "LinearModel",
    "TreesModel",
    "register_ltr_model",
    "model_from_json",
    "model_to_json",
]


@dataclass(frozen=True)
class Feature:
    name: str
    kind: str  # originalScore | fieldValue | solrQuery | value
    param: Any = None


def original_score(name: str = "originalScore") -> Feature:
    return Feature(name, "originalScore")


def field_value(name: str, field: str) -> Feature:
    return Feature(name, "fieldValue", field)


def solr_query(name: str, q: str) -> Feature:
    return Feature(name, "solrQuery", q)


def value(name: str, v: float | str) -> Feature:
    return Feature(name, "value", v)


def _check_norm(n) -> None:
    if n is None:
        return
    kind = n[0]
    if kind == "minmax":
        _, lo, hi = n
        if hi <= lo:
            raise ValueError(f"minmax normalizer needs hi > lo, got {n}")
    elif kind == "standard":
        _, _mean, std = n
        if std <= 0:
            raise ValueError(f"standard normalizer needs std > 0, got {n}")
    else:
        raise ValueError(f"unknown normalizer {kind!r} (minmax|standard)")


def _apply_norm(n, x: np.ndarray) -> np.ndarray:
    if n is None:
        return x
    if n[0] == "minmax":
        return (x - n[1]) / (n[2] - n[1])
    return (x - n[1]) / n[2]


def _validate_features(features) -> tuple[Feature, ...]:
    feats = tuple(features)
    if not feats:
        raise ValueError("ltr model needs at least one feature")
    names = [f.name for f in feats]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate feature names in {names}")
    for f in feats:
        if f.kind not in ("originalScore", "fieldValue", "solrQuery", "value"):
            raise ValueError(f"unknown feature kind {f.kind!r}")
    return feats


@dataclass(frozen=True)
class LinearModel:
    """Solr LinearModel: weighted sum of (normalized) features."""

    name: str
    features: tuple[Feature, ...]
    weights: Mapping[str, float]
    norms: Mapping[str, tuple] = dc_field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "features", _validate_features(self.features))
        fnames = {f.name for f in self.features}
        missing = fnames - set(self.weights)
        if missing:
            raise ValueError(f"model {self.name!r}: no weight for {sorted(missing)}")
        extra = set(self.weights) - fnames
        if extra:
            raise ValueError(f"model {self.name!r}: weights for unknown "
                             f"features {sorted(extra)}")
        for n in self.norms.values():
            _check_norm(n)

    def score(self, X: Mapping[str, np.ndarray]) -> np.ndarray:
        out = None
        for f in self.features:
            x = _apply_norm(self.norms.get(f.name), X[f.name])
            term = self.weights[f.name] * x
            out = term if out is None else out + term
        return out

    def explain(self, X: Mapping[str, np.ndarray]) -> list:
        """Per-feature contribution arrays ``[(feature_name, terms)...]``
        whose in-order sum reproduces :meth:`score` bit-exactly (same
        fold, same operands) -- the debugQuery breakdown."""
        return [
            (f.name,
             self.weights[f.name]
             * _apply_norm(self.norms.get(f.name), X[f.name]))
            for f in self.features
        ]


def _eval_tree(node: Mapping, X: Mapping[str, np.ndarray], n: int) -> np.ndarray:
    if "value" in node:
        return np.full(n, float(node["value"]))
    f, t = node["feature"], float(node["threshold"])
    left = _eval_tree(node["left"], X, n)
    right = _eval_tree(node["right"], X, n)
    return np.where(X[f] <= t, left, right)


def _tree_features(node: Mapping) -> set:
    if "value" in node:
        return set()
    return ({node["feature"]}
            | _tree_features(node["left"]) | _tree_features(node["right"]))


@dataclass(frozen=True)
class TreesModel:
    """Solr MultipleAdditiveTreesModel: sum over trees of
    weight * tree(features); node rule ``feature <= threshold`` -> left."""

    name: str
    features: tuple[Feature, ...]
    trees: tuple[Mapping, ...]  # each {"weight": w, "root": node}
    norms: Mapping[str, tuple] = dc_field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "features", _validate_features(self.features))
        object.__setattr__(self, "trees", tuple(self.trees))
        fnames = {f.name for f in self.features}
        for i, t in enumerate(self.trees):
            if "weight" not in t or "root" not in t:
                raise ValueError(f"model {self.name!r}: tree {i} needs "
                                 "'weight' and 'root'")
            used = _tree_features(t["root"])
            unknown = used - fnames
            if unknown:
                raise ValueError(f"model {self.name!r}: tree {i} references "
                                 f"unknown features {sorted(unknown)}")
        for n in self.norms.values():
            _check_norm(n)

    def score(self, X: Mapping[str, np.ndarray]) -> np.ndarray:
        n = len(next(iter(X.values()))) if X else 0
        Xn = {f.name: _apply_norm(self.norms.get(f.name), X[f.name])
              for f in self.features}
        out = np.zeros(n)
        for t in self.trees:
            out = out + float(t["weight"]) * _eval_tree(t["root"], Xn, n)
        return out

    def explain(self, X: Mapping[str, np.ndarray]) -> list:
        """Per-TREE contribution arrays ``[(label, weight*tree(X))...]``
        whose in-order sum (from 0.0) reproduces :meth:`score`
        bit-exactly -- Solr's MultipleAdditiveTrees explain is per-tree
        too (a path-split attribution is not well-defined)."""
        n = len(next(iter(X.values()))) if X else 0
        Xn = {f.name: _apply_norm(self.norms.get(f.name), X[f.name])
              for f in self.features}
        return [
            (f"tree[{i}] weight={float(t['weight']):g}",
             float(t["weight"]) * _eval_tree(t["root"], Xn, n))
            for i, t in enumerate(self.trees)
        ]


def register_ltr_model(idx, model) -> None:
    """Put a model in the index's LTR model store (the upstream
    model-store PUT). ``rq={!ltr model=<name>}`` resolves here."""
    if not hasattr(idx, "ltr_models"):
        idx.ltr_models = {}
    idx.ltr_models[model.name] = model


# -- model-store JSON interop ------------------------------------------------
# the upstream LTR contrib stores features and models as JSON documents
# (PUT /schema/feature-store, /schema/model-store — public wire format).
# These translators accept/emit that format so an existing Solr LTR model
# file loads here unchanged.

_FEATURE_CLASSES = {
    "org.apache.solr.ltr.feature.OriginalScoreFeature": "originalScore",
    "org.apache.solr.ltr.feature.FieldValueFeature": "fieldValue",
    "org.apache.solr.ltr.feature.SolrFeature": "solrQuery",
    "org.apache.solr.ltr.feature.ValueFeature": "value",
}
_FEATURE_CLASS_OF = {v: k for k, v in _FEATURE_CLASSES.items()}
_MODEL_CLASSES = {
    "org.apache.solr.ltr.model.LinearModel": "linear",
    "org.apache.solr.ltr.model.MultipleAdditiveTreesModel": "trees",
}
_NORM_CLASSES = {
    "org.apache.solr.ltr.norm.MinMaxNormalizer": "minmax",
    "org.apache.solr.ltr.norm.StandardNormalizer": "standard",
}
_NORM_CLASS_OF = {v: k for k, v in _NORM_CLASSES.items()}


def _feature_from_json(f: Mapping) -> Feature:
    cls = f.get("class")
    if cls not in _FEATURE_CLASSES:
        raise ValueError(f"ltr: unsupported feature class {cls!r}")
    kind = _FEATURE_CLASSES[cls]
    p = f.get("params") or {}
    if kind == "originalScore":
        return original_score(f["name"])
    if kind == "fieldValue":
        return field_value(f["name"], str(p["field"]))
    if kind == "solrQuery":
        if "q" not in p:
            raise ValueError(
                f"ltr: SolrFeature {f['name']!r} needs params.q "
                "(fq-only SolrFeatures are not supported)"
            )
        return solr_query(f["name"], str(p["q"]))
    return value(f["name"], p["value"])


def _norm_from_json(n: Mapping | None):
    if n is None:
        return None
    cls = n.get("class")
    if cls not in _NORM_CLASSES:
        raise ValueError(f"ltr: unsupported normalizer class {cls!r}")
    p = n.get("params") or {}
    if _NORM_CLASSES[cls] == "minmax":
        return ("minmax", float(p["min"]), float(p["max"]))
    return ("standard", float(p["avg"]), float(p["std"]))


def _tree_from_json(node: Mapping) -> dict:
    if "value" in node:
        return {"value": float(node["value"])}
    return {
        "feature": node["feature"],
        "threshold": float(node["threshold"]),
        "left": _tree_from_json(node["left"]),
        "right": _tree_from_json(node["right"]),
    }


def model_from_json(
    model: Mapping | str, feature_store: list | str | None = None
):
    """Build a model from the upstream model-store JSON (and, when the
    model's feature list carries only names, the matching feature-store
    JSON). Accepts dicts or JSON strings."""
    import json as _json

    if isinstance(model, str):
        model = _json.loads(model)
    if isinstance(feature_store, str):
        feature_store = _json.loads(feature_store)
    store = {f["name"]: f for f in (feature_store or [])}

    cls = model.get("class")
    if cls not in _MODEL_CLASSES:
        raise ValueError(f"ltr: unsupported model class {cls!r}")
    feats, norms = [], {}
    for f in model.get("features", []):
        spec = f if "class" in f else store.get(f["name"])
        if spec is None:
            raise ValueError(
                f"ltr: model references feature {f['name']!r} absent from "
                "the feature store"
            )
        feats.append(_feature_from_json(spec))
        n = _norm_from_json(f.get("norm"))
        if n is not None:
            norms[f["name"]] = n
    params = model.get("params") or {}
    if _MODEL_CLASSES[cls] == "linear":
        return LinearModel(
            name=model["name"], features=tuple(feats),
            weights={k: float(v) for k, v in params["weights"].items()},
            norms=norms,
        )
    trees = tuple(
        {"weight": float(t["weight"]), "root": _tree_from_json(t["root"])}
        for t in params["trees"]
    )
    return TreesModel(name=model["name"], features=tuple(feats),
                      trees=trees, norms=norms)


def _feature_to_json(f: Feature) -> dict:
    p: dict = {}
    if f.kind == "fieldValue":
        p = {"field": f.param}
    elif f.kind == "solrQuery":
        p = {"q": f.param}
    elif f.kind == "value":
        p = {"value": f.param}
    return {"name": f.name, "class": _FEATURE_CLASS_OF[f.kind], "params": p}


def _norm_to_json(n) -> dict:
    if n[0] == "minmax":
        return {"class": _NORM_CLASS_OF["minmax"],
                "params": {"min": str(n[1]), "max": str(n[2])}}
    return {"class": _NORM_CLASS_OF["standard"],
            "params": {"avg": str(n[1]), "std": str(n[2])}}


def _tree_to_json(node: Mapping) -> dict:
    if "value" in node:
        return {"value": str(node["value"])}
    return {
        "feature": node["feature"], "threshold": str(node["threshold"]),
        "left": _tree_to_json(node["left"]),
        "right": _tree_to_json(node["right"]),
    }


def model_to_json(model) -> tuple[dict, list]:
    """(model-store JSON, feature-store JSON) for a model — the documents
    the upstream PUT endpoints accept."""
    fstore = [_feature_to_json(f) for f in model.features]
    mfeats = []
    for f in model.features:
        e: dict = {"name": f.name}
        n = model.norms.get(f.name)
        if n is not None:
            e["norm"] = _norm_to_json(n)
        mfeats.append(e)
    if isinstance(model, LinearModel):
        return {
            "class": _MODEL_CLASS_OF_LINEAR,
            "name": model.name,
            "features": mfeats,
            "params": {"weights": dict(model.weights)},
        }, fstore
    return {
        "class": _MODEL_CLASS_OF_TREES,
        "name": model.name,
        "features": mfeats,
        "params": {"trees": [
            {"weight": str(t["weight"]), "root": _tree_to_json(t["root"])}
            for t in model.trees
        ]},
    }, fstore


_MODEL_CLASS_OF_LINEAR = "org.apache.solr.ltr.model.LinearModel"
_MODEL_CLASS_OF_TREES = "org.apache.solr.ltr.model.MultipleAdditiveTreesModel"


def resolve_efi(template: str, efi: Mapping[str, str]) -> str:
    """Substitute ``${key}`` placeholders from efi params; a missing key
    fails loud (the upstream raises for unresolved efi too)."""
    import re

    def sub(m):
        k = m.group(1)
        if k not in efi:
            raise ValueError(f"ltr: feature references missing efi.{k}")
        return str(efi[k])

    return re.sub(r"\$\{(\w+)\}", sub, template)
