"""Shared fixtures: one small SparkSession per test session, the
driver's smallest testdata dir, and helpers for planting synthetic
documents/embeddings tables (written as parquet into a tmpdir shaped
like a driver sf_dir, so registry queries run on them unchanged)."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"

WORDS = [
    "spark", "table", "scan", "join", "hash", "sort", "merge", "shuffle",
    "window", "stream", "batch", "key", "order", "part", "dup", "fast",
    "small", "the", "a", "of", "row", "column", "filter", "agg", "map",
]


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("finance_pipeline_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def random_doc(rng: random.Random, n_tokens: int = 60) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n_tokens))


def perturb_doc(rng: random.Random, text: str, n_edits: int = 2) -> str:
    """Near-duplicate: replace n_edits tokens — Jaccard stays high."""
    toks = text.split(" ")
    for _ in range(n_edits):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


def write_documents(tmp_path, rows: list[tuple[int, str]]) -> str:
    """rows = [(doc_id, text)] → parquet dir usable as sf_dir."""
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["test"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def write_embeddings(tmp_path, ids: list[int], mat: np.ndarray, labels=None) -> str:
    pdf = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [row.astype(np.float32).tolist() for row in mat],
            "label": labels if labels is not None else [0] * len(ids),
        }
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)
