"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input-hint shape: ``(repo:string, path:string, commit:string, lang:string,
content:string)``. Generation is seeded PER DOC INDEX, so the corpus is
bit-identical at any parallelism / partition count — the property the
two-cluster-size scaling runs and the resume tests rely on.

Mirrors the reference's fixture style (Solr example docs,
``solr/example/exampledocs/``) but scaled and skewed for the engine:
Zipf-drawn identifiers from a fixed vocabulary, hot keywords (``import``,
``def``, ``return``) in a supermajority of python docs to exercise
hot-term salting, camelCase + snake_case identifier forms to exercise the
word-delimiter analysis chain.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42

LANGS = ["python", "java", "go", "javascript", "rust"]
LANG_WEIGHTS = np.array([0.40, 0.25, 0.15, 0.12, 0.08])
LANG_EXT = {"python": "py", "java": "java", "go": "go", "javascript": "js", "rust": "rs"}

KEYWORDS = {
    "python": ["import", "def", "return", "class", "self", "for", "if", "else", "while", "from"],
    "java": ["public", "class", "static", "void", "return", "import", "new", "private", "int"],
    "go": ["func", "return", "package", "import", "var", "type", "struct", "range"],
    "javascript": ["function", "return", "const", "let", "var", "import", "export", "class"],
    "rust": ["fn", "let", "mut", "impl", "struct", "return", "pub", "use", "match"],
}

# identifier word-part vocabulary: a head of real-ish parts plus a long
# deterministic synthetic tail, Zipf(1.2)-selected → the corpus exhibits
# both hot tokens (df ≈ n_docs) and rare terms (df ≤ 3), per FIXTURES.md.
_HEAD_PARTS = [
    "get", "set", "user", "name", "data", "parse", "json", "http", "server", "client",
    "config", "value", "index", "query", "result", "count", "list", "node", "item", "key",
    "map", "hash", "file", "path", "read", "write", "buffer", "stream", "token", "term",
    "doc", "score", "rank", "merge", "split", "block", "cache", "store", "load", "save",
    "util", "helper", "handler", "worker", "task", "job", "run", "exec", "init", "close",
    "open", "send", "recv", "proc", "batch", "row", "col", "field", "type", "meta",
]


def _make_vocab() -> list[str]:
    syll = [
        "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
        "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
        "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
        "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    ]
    tail = []
    for i in range(5000):
        a, b, c = syll[i % 40], syll[(i // 40) % 40], syll[(i // 1600) % 40]
        tail.append(a + b + c if i >= 1600 else a + b)
    return _HEAD_PARTS + tail


_WORD_PARTS = _make_vocab()


def _doc_rng(doc_index: int) -> np.random.Generator:
    """Per-doc RNG — identical for a given (SEED, doc_index) everywhere."""
    return np.random.default_rng([SEED, int(doc_index)])


def _make_identifier(rng: np.random.Generator) -> str:
    n = int(rng.integers(1, 4))
    # Zipf(1.2) part choice over the fixed vocabulary (clipped heavy tail)
    idx = np.minimum(rng.zipf(1.2, size=n) - 1, len(_WORD_PARTS) - 1)
    parts = [_WORD_PARTS[i] for i in idx]
    if rng.random() < 0.5:  # snake_case
        return "_".join(parts)
    return parts[0] + "".join(p.capitalize() for p in parts[1:])  # camelCase


def gen_doc(doc_index: int) -> dict:
    """Generate one synthetic source file, deterministic in doc_index."""
    rng = _doc_rng(doc_index)
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]
    kws = KEYWORDS[lang]
    n_lines = int(rng.integers(20, 120))
    lines: list[str] = []
    # hot tokens in >60% of python docs (FIXTURES: skew/salting exercise)
    if lang == "python" and rng.random() < 0.7:
        lines.append("import os")
        lines.append("import sys")
    for _ in range(n_lines):
        shape = rng.random()
        ident = _make_identifier(rng)
        ident2 = _make_identifier(rng)
        kw = kws[int(rng.integers(0, len(kws)))]
        if shape < 0.15:
            lines.append(f"# {ident} handles the {ident2} case")
        elif shape < 0.45:
            lines.append(f"{kw} {ident}({ident2}):" if lang == "python" else f"{kw} {ident}({ident2});")
        elif shape < 0.75:
            lines.append(f"    {ident} = {ident2}.{_make_identifier(rng)}({int(rng.integers(0, 100))})")
        elif shape < 0.9:
            lines.append(f'    {kw} "{ident}_{ident2}"')
        else:
            lines.append(f"    return {ident}")
    content = "\n".join(lines)
    repo = f"org{doc_index // 1000}/repo{doc_index % 97}"
    pkg = int(rng.integers(0, 50))
    path = f"src/pkg{pkg}/module_{doc_index}.{LANG_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}|{path}|{SEED}".encode()).hexdigest()
    return {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def synth_corpus(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` synthetic files.

    ``spark.range`` provides the doc indices; generation happens inside
    ``mapInPandas`` so it scales out, and is per-index seeded so the
    result is partitioning-invariant.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            rows = [gen_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def synth_corpus_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side corpus (for the numpy oracle / small tests)."""
    return pd.DataFrame([gen_doc(i) for i in range(n_docs)])
